"""Stage 4 — materialize: dedup, partitioned write, manifests, lineage,
idempotent resume.

The reference serializes the whole in-memory graph to one Turtle file
(PK:src/graph.py); a 10^12-turn graph must instead land as partitioned
tables written *per partition, idempotently*:

* dedup: rdflib Graph is a set — here `groupBy(s,p,o).max(conf)` keeps the
  best-scored witness per triple (map-side partial agg; no row explosion).
* write: TableIO (conv-bucketed, ts-day partitioned) with dynamic
  partition overwrite, so re-running a partition replaces exactly itself.
* manifest: one row per (run_id, stage, ts_day, conv_bucket) marked done.
  Resume = planned-partitions LEFT ANTI manifest -> only pending partitions
  flow through the pipeline again (SURVEY §2 S4/J6).
* lineage: per-stage row counts captured via Observation (same action as
  the write — no second pass over the data).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tableio import TableIO, with_layout

MANIFEST = "manifest"
LINEAGE = "lineage"
TRIPLES = "triples"


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Set semantics with best-conf witness: one row per (subj,pred,obj),
    keeping max conf and min (conv_id, turn_idx, ts) provenance for
    determinism."""
    return triples.groupBy("subj", "pred", "obj").agg(
        F.max("conf").alias("conf"),
        F.min(F.struct("conv_id", "turn_idx", "ts")).alias("_prov"),
    ).select(
        "subj", "pred", "obj",
        F.col("_prov.conv_id").alias("conv_id"),
        F.col("_prov.turn_idx").alias("turn_idx"),
        F.col("_prov.ts").alias("ts"),
        "conf",
    )


def planned_partitions(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    return with_layout(transcripts, n_buckets).select("ts_day", "conv_bucket").distinct()


def completed_partitions(spark: SparkSession, io: TableIO, run_id: str) -> DataFrame:
    try:
        m = io.read(spark, MANIFEST)
    except Exception:
        return spark.createDataFrame([], "ts_day date, conv_bucket int")
    return (
        m.where((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("ts_day", "conv_bucket")
        .distinct()
    )


def pending_partitions(
    spark: SparkSession, io: TableIO, run_id: str, transcripts: DataFrame
) -> DataFrame:
    planned = planned_partitions(transcripts, io.n_buckets)
    done = completed_partitions(spark, io, run_id)
    return planned.join(done, ["ts_day", "conv_bucket"], "left_anti")


def filter_to_pending(
    transcripts: DataFrame, pending: DataFrame, n_buckets: int
) -> DataFrame:
    """Restrict input to not-yet-done partitions. The pending set is tiny
    (bounded by days x buckets) so it broadcasts: a semi join that costs
    no shuffle on the fact side."""
    return (
        with_layout(transcripts, n_buckets)
        .join(F.broadcast(pending), ["ts_day", "conv_bucket"], "left_semi")
        .drop("ts_day", "conv_bucket")
    )


def write_triples(io: TableIO, triples: DataFrame) -> None:
    io.write(triples, TRIPLES, mode="overwrite")


def mark_done(
    spark: SparkSession, io: TableIO, run_id: str, stage: str, parts: DataFrame
) -> None:
    rows = parts.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        "ts_day",
        "conv_bucket",
        F.lit("done").alias("status"),
    )
    rows.coalesce(1).write.mode("append").parquet(io.path(MANIFEST))


def append_lineage(
    spark: SparkSession,
    io: TableIO,
    run_id: str,
    stage: str,
    rows_in: int,
    rows_out: int,
    wall_ms: int,
    input_fp: str = "",
) -> None:
    pdf = [(run_id, stage, rows_in, rows_out, wall_ms, input_fp, int(time.time() * 1000))]
    df = spark.createDataFrame(
        pdf,
        "run_id string, stage string, rows_in long, rows_out long, "
        "wall_ms long, input_fp string, wall_clock_ms long",
    )
    df.coalesce(1).write.mode("append").parquet(io.path(LINEAGE))


def input_fingerprint(df: DataFrame, cols: list[str]) -> str:
    """Order-insensitive content hash: xor/sum of per-row xxhash64 over the
    key columns — one aggregate, no sort, no collect of data."""
    # decimal(38) sum: overflow-proof under ANSI mode (Spark 4 default)
    h = df.select(F.xxhash64(*cols).cast("decimal(38,0)").alias("h")).agg(
        F.sum("h").alias("s"), F.count("*").alias("n")
    ).first()
    return f"{h['s']}:{h['n']}"
