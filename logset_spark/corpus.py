"""End-to-end training-corpus preparation — the composition the
training-data operator suite exists for.

    documents
      -> quality gate        (token-count band + Gopher-style repetition)
      -> exact dedup         (md5 content hash, keep min doc_id)
      -> near-dup dedup      (MinHash-LSH block -> Jaccard verify ->
                              connected components -> keep the cluster's
                              min doc_id)
      -> deterministic sample (content-keyed md5 nibble — stable across
                              runs/engines/cluster sizes, resumable)
      -> sequence packing    (global token tape via the distributed
                              prefix sum; GPT-style concat-then-chunk)
      -> partitioned write   (bin_group dirs so a trainer shard-reads)

Every stage is one of the already-oracle-checked operators (queries.py /
operators/*); this module only composes them, so its correctness story is
the per-operator DuckDB gate plus the invariants in tests/test_corpus.py.

Scale shape: quality + sampling are map-side native exprs; exact dedup is
one shuffle on the content hash; near-dup touches only LSH-banded
candidates (never all pairs) and CC runs on the candidate-pair domain —
orders of magnitude smaller than the corpus; packing is two balanced
shuffles (global_running_total).  Nothing quadratic, no driver-side data.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.cc import connected_components
from .operators.dedup import exact_dedup, minhash_pairs
from .operators.ordering import global_running_total

BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_dup_2gram: float = 0.2,
) -> DataFrame:
    """Token-count band + within-doc repetition threshold (the
    q_doc_quality / q_rep_filter formulas), all native column math."""
    toks = F.split(F.lower("text"), " ")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup = F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(F.lit(0.0))
    n = F.size(toks)
    return docs.where(
        (n >= min_tokens) & (n <= max_tokens) & (dup <= max_dup_2gram)
    )


def near_dedup(
    docs: DataFrame, threshold: float = 0.5, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash-LSH candidates -> exact-Jaccard verify -> CC clusters ->
    keep each cluster's min id (plus every unclustered doc).  Ids ride
    zero-padded through CC so its lexicographic min label is the numeric
    min."""
    pairs = minhash_pairs(docs, threshold=threshold, id_col=id_col)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    comp = connected_components(
        pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    )
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").cast("bigint").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def sample_hash(docs: DataFrame, keep_nibbles: str = "01234567") -> DataFrame:
    """Content-keyed deterministic sampling: md5 first hex nibble in
    `keep_nibbles` (default 8/16 = 1/2).  No rand(), no seed drift — the
    selection is a pure function of the data."""
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.where(nib.isin(*list(keep_nibbles)))


def pack_sequences(docs: DataFrame, budget: int = 2048) -> DataFrame:
    """Concat-then-chunk packing on a global token tape (see q_seq_pack):
    adds n_tokens, start_off, first_bin, offset_in_bin."""
    toks = F.regexp_extract_all("text", F.lit(BPE_PAT), 0)
    t = docs.withColumn("n_tokens", F.size(toks).cast("long"))
    c = global_running_total(t, ["doc_id"], "n_tokens", total_col="_cum")
    return (
        c.withColumn("start_off", F.col("_cum") - F.col("n_tokens"))
        .withColumn("first_bin", F.expr(f"start_off div {budget}"))
        .withColumn("offset_in_bin", F.col("start_off") % budget)
        .drop("_cum")
    )


def prepare_corpus(
    docs: DataFrame,
    out_path: str | None = None,
    budget: int = 2048,
    near_dup_threshold: float = 0.5,
    sample_nibbles: str = "01234567",
    bins_per_dir: int = 1024,
) -> tuple[DataFrame, dict]:
    """Run the full preparation; returns (packed corpus DataFrame, stats).

    Stats carry per-stage surviving-row counts — the numbers a data-card
    reports.  When `out_path` is given the packed corpus lands as parquet
    partitioned by bin_group (= first_bin div bins_per_dir) so a trainer
    reads one directory per contiguous shard of bins."""
    stats: dict = {}
    t0 = time.time()

    def gate(name: str, df: DataFrame) -> DataFrame:
        stats[name] = df.count()
        return df

    docs = gate("input", docs)
    docs = gate("quality", quality_gate(docs))
    docs = gate("exact_dedup", exact_dedup(docs))
    # localCheckpoint: three downstream consumers (minhash banding twice
    # via self-join branches is already handled inside minhash_pairs, but
    # the anti-join + packing would otherwise replay the dedup shuffle)
    docs = docs.localCheckpoint(eager=True)
    docs = gate("near_dedup", near_dedup(docs, threshold=near_dup_threshold))
    docs = gate("sample", sample_hash(docs, keep_nibbles=sample_nibbles))
    packed = pack_sequences(docs, budget=budget)
    if out_path is not None:
        (
            packed.withColumn(
                "bin_group", F.expr(f"first_bin div {bins_per_dir}")
            )
            .repartition("bin_group")
            .write.mode("overwrite")
            .partitionBy("bin_group")
            .parquet(out_path)
        )
        packed = packed.sparkSession.read.parquet(out_path).drop("bin_group")
    stats["packed"] = packed.count()
    stats["total_tokens"] = packed.agg(
        F.sum("n_tokens").alias("s")
    ).collect()[0]["s"]
    stats["n_bins"] = (stats["total_tokens"] + budget - 1) // budget
    stats["wall_s"] = round(time.time() - t0, 2)
    return packed, stats
