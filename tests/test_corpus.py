"""Invariants of the composed training-corpus pipeline (corpus.py).

Each constituent operator is DuckDB-oracle-checked individually
(queries.py); these tests pin the COMPOSITION: monotone stage counts,
packing-tape arithmetic, determinism, and the keep-one guarantee of
near-dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from logset_spark.corpus import (
    near_dedup, pack_sequences, prepare_corpus, quality_gate, sample_hash,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_prepare_corpus_stats_monotone_and_deterministic(spark, tmp_path):
    docs = _docs(spark)
    _packed, stats = prepare_corpus(docs, out_path=str(tmp_path / "c1"))
    order = ["input", "quality", "exact_dedup", "near_dedup", "sample"]
    counts = [stats[k] for k in order]
    assert counts == sorted(counts, reverse=True), stats
    assert stats["packed"] == stats["sample"]
    assert stats["input"] == 500
    # content-keyed: a rerun reproduces the identical selection
    _p2, stats2 = prepare_corpus(docs, out_path=str(tmp_path / "c2"))
    assert {k: stats2[k] for k in order} == {k: stats[k] for k in order}


def test_packing_tape_arithmetic(spark):
    docs = sample_hash(quality_gate(_docs(spark)))
    packed = pack_sequences(docs, budget=512).orderBy("doc_id").collect()
    tape = 0
    for r in packed:
        assert r["start_off"] == tape  # contiguous tape, doc_id order
        assert r["first_bin"] == tape // 512
        assert r["offset_in_bin"] == tape % 512
        tape += r["n_tokens"]


def test_near_dedup_keeps_cluster_minimum(spark):
    docs = _docs(spark).select("doc_id", "text")
    kept = {r["doc_id"] for r in near_dedup(docs, threshold=0.5).collect()}
    from logset_spark.operators.dedup import minhash_pairs

    pairs = minhash_pairs(docs, threshold=0.5).collect()
    assert pairs, "fixture should contain near-dups"
    for r in pairs:
        # at most one side of any verified near-dup pair survives
        assert not (r["doc_a"] in kept and r["doc_b"] in kept)
    # and every doc in no pair survives the dedup untouched
    in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    singletons = {
        r["doc_id"] for r in docs.collect() if r["doc_id"] not in in_pairs
    }
    assert singletons <= kept
