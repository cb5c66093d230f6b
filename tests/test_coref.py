"""Conversation-scoped anaphora resolution (operators/coref.py + the
pipeline's opt-in stage 3.5).

The reference's file-at-a-time emitters never recover cross-line
references (SURVEY §0: pointer unverifiable, reference dir empty); the
heuristic under test is this engine's own documented recency rule, so
the oracle here is an independent pandas replay of that rule — unit
cases pin the window semantics (strict precedence, conversation
isolation, unresolved openers), and the e2e case cross-checks the
pipeline's refersTo rows against its OWN emitted mentions triples run
through the pandas replay."""

import pandas as pd
from pyspark.sql import functions as F

from logset_spark.operators import coref
from logset_spark.pipeline import build_graph
from logset_spark.sources import synth
from logset_spark.sources.tableio import TableIO
from logset_spark import vocab as V


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ent string, is_anaphor boolean"
    )


def test_resolve_anaphora_window_semantics(spark):
    rows = [
        # conv a: opener anaphor (no antecedent), then entity, then anaphor
        ("a", 0, None, True),
        ("a", 1, "ent:x", False),
        ("a", 2, None, True),
        # a turn that BOTH names an entity and is anaphoric resolves to
        # the PRIOR entity (strictly-earlier frame), never itself
        ("a", 3, "ent:y", True),
        ("a", 4, None, True),
        # conv b: isolation — conv a's entities must not leak in
        ("b", 0, None, True),
        ("b", 1, "ent:z", False),
    ]
    got = {
        (r.conv_id, r.turn_idx): r.antecedent
        for r in coref.resolve_anaphora(_turns(spark, rows)).collect()
    }
    assert got == {
        ("a", 0): None,
        ("a", 2): "ent:x",
        ("a", 3): "ent:x",
        ("a", 4): "ent:y",
        ("b", 0): None,
    }
    # non-anaphoric rows are dropped entirely
    assert ("a", 1) not in got and ("b", 1) not in got


def test_anaphor_rlike_token_boundaries(spark):
    df = spark.createDataFrame(
        [
            ("restart it now", True),
            ("item 4 submitted", False),      # 'it' inside a word
            ("this", True),                    # whole text = anaphor
            ("that's odd", True),              # boundary = apostrophe
            ("the commit failed", False),      # 'it' inside 'commit'
            ("they", True),
            ("alpha responded", False),
        ],
        "text string, want boolean",
    )
    bad = df.where(
        F.lower("text").rlike(coref.anaphor_rlike()) != F.col("want")
    ).collect()
    assert bad == [], bad


def _expected_refers_to(tpdf: pd.DataFrame, mentions: pd.DataFrame) -> set:
    """Pandas replay of the recency rule over the pipeline's own emitted
    mentions triples: per-turn min linked entity, last non-null strictly
    earlier, on turns whose TEXT matches the anaphor pattern."""
    m = mentions[mentions.obj.str.startswith(V.NS_ENT)]
    ent = (
        m.groupby(["conv_id", "turn_idx"])["obj"]
        .min()
        .rename("ent")
        .reset_index()
    )
    t = tpdf[["conv_id", "turn_idx", "text"]].merge(
        ent, on=["conv_id", "turn_idx"], how="left"
    )
    t["is_anaphor"] = (
        t.text.str.lower().str.contains(coref.anaphor_rlike(), regex=True)
    )
    t = t.sort_values(["conv_id", "turn_idx"])
    t["antecedent"] = t.groupby("conv_id").ent.transform(
        lambda s: s.ffill().shift(1)
    )
    hits = t[t.is_anaphor & t.antecedent.notna()]
    return {
        (f"{V.NS_TURN}{c}/{i}", a)
        for c, i, a in zip(hits.conv_id, hits.turn_idx, hits.antecedent)
    }


def test_pipeline_coref_e2e(spark, tmp_path):
    """build_graph(coref=True) emits exactly the refersTo set the pandas
    replay predicts from the SAME build's mentions triples — the coref
    stage takes an independent path through the checkpoint (its own
    pruned scan + broadcast rewrite + window), so agreement here checks
    that path end to end, including the fuzzy-link rewrite of
    antecedent candidates."""
    tpdf = synth.transcripts_pdf(n_convs=12)
    tdf = spark.createDataFrame(tpdf, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(
        synth.entity_dictionary_pdf(), schema=synth.DICT_SCHEMA
    )
    io = TableIO(str(tmp_path / "wh"), n_buckets=4)
    build_graph(spark, tdf, ddf, io, run_id="coref1", coref=True)
    out = io.read(spark, "triples")
    refers = {
        (r.subj, r.obj)
        for r in out.where(F.col("pred") == V.REFERS_TO)
        .select("subj", "obj")
        .collect()
    }
    mentions = (
        out.where(F.col("pred") == V.MENTIONS)
        .select("conv_id", "turn_idx", "obj")
        .toPandas()
    )
    want = _expected_refers_to(tpdf, mentions)
    assert refers == want
    assert len(refers) > 0
    # refersTo rows carry the documented mid confidence and prune like
    # any other triple (non-null ts -> real ts_day partitions)
    confs = (
        out.where(F.col("pred") == V.REFERS_TO)
        .select("conf", "ts")
        .distinct()
        .collect()
    )
    assert all(abs(r.conf - coref.COREF_CONF) < 1e-9 for r in confs)
    assert all(r.ts is not None for r in confs)


def test_pipeline_coref_off_by_default(spark, tmp_path):
    tpdf = synth.transcripts_pdf(n_convs=3)
    tdf = spark.createDataFrame(tpdf, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(
        synth.entity_dictionary_pdf(), schema=synth.DICT_SCHEMA
    )
    io = TableIO(str(tmp_path / "wh"), n_buckets=4)
    build_graph(spark, tdf, ddf, io, run_id="coref0")
    n = (
        io.read(spark, "triples")
        .where(F.col("pred") == V.REFERS_TO)
        .count()
    )
    assert n == 0
