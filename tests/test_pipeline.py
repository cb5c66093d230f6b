"""End-to-end golden tests: pipeline output vs the pandas oracle
(stand-in for the reference's Turtle until /root/reference is populated)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logset_spark.operators import metrics
from logset_spark.pipeline import build_graph
from logset_spark.sources import synth
from logset_spark.sources.tableio import TableIO

from . import oracle


def _run(spark, tmp_path, n_convs, **synth_kw):
    tpdf = synth.transcripts_pdf(n_convs=n_convs, **synth_kw)
    dpdf = synth.entity_dictionary_pdf()
    tdf = spark.createDataFrame(tpdf, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(dpdf, schema=synth.DICT_SCHEMA)
    io = TableIO(str(tmp_path / "wh"), n_buckets=4)
    res = build_graph(spark, tdf, ddf, io, run_id="t1")
    emitted = io.read(spark, "triples")
    golden = spark.createDataFrame(oracle.golden_triples(tpdf, dpdf))
    return res, emitted, golden


def test_toy_exact_match(spark, tmp_path):
    """No alias noise -> pipeline must reproduce the golden graph exactly
    (P=R=1.0), mirroring the reference's deterministic Turtle output."""
    res, emitted, golden = _run(
        spark, tmp_path, n_convs=3, alias_noise_rate=0.0, hot_rate=0.05
    )
    assert res["triples"] > 0
    pr = metrics.precision_recall(emitted, golden)
    assert pr["precision"] == 1.0, pr
    assert pr["recall"] == 1.0, pr


def test_noisy_pr_at_least_095(spark, tmp_path):
    """With typo aliases at 15%, fuzzy linking must keep P/R >= 0.95
    (BASELINE.json:2)."""
    res, emitted, golden = _run(spark, tmp_path, n_convs=40)
    pr = metrics.precision_recall(emitted, golden)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_per_turn_invariant(spark, tmp_path):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — the pipeline must not perturb the
    transcript table it reads."""
    tpdf = synth.transcripts_pdf(n_convs=5)
    tdf = spark.createDataFrame(tpdf, schema=synth.TRANSCRIPT_SCHEMA)
    back = (
        tdf.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    exp = tpdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back, exp[["conv_id", "turn_idx", "text"]].astype(back.dtypes.to_dict())
    )


def test_resume_idempotent(spark, tmp_path):
    """Re-running the same run_id over the same input is a no-op (manifest
    marks all partitions done) and leaves the triple table unchanged."""
    tpdf = synth.transcripts_pdf(n_convs=5)
    dpdf = synth.entity_dictionary_pdf()
    tdf = spark.createDataFrame(tpdf, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(dpdf, schema=synth.DICT_SCHEMA)
    io = TableIO(str(tmp_path / "wh"), n_buckets=4)

    r1 = build_graph(spark, tdf, ddf, io, run_id="rr")
    fp1 = spark.read.parquet(io.path("triples")).select(
        F.xxhash64("subj", "pred", "obj").cast("decimal(38,0)").alias("h")
    ).agg(F.sum("h"), F.count("*")).first()

    r2 = build_graph(spark, tdf, ddf, io, run_id="rr")
    assert r2["skipped"] is True
    fp2 = spark.read.parquet(io.path("triples")).select(
        F.xxhash64("subj", "pred", "obj").cast("decimal(38,0)").alias("h")
    ).agg(F.sum("h"), F.count("*")).first()
    assert fp1 == fp2
    assert r1["triples"] > 0
