"""Streaming-shaped capabilities (SURVEY.md §2.10).

The north rule requires *resumable batch* (manifest-driven, see
operators/materialize.py); the reference itself is strictly batch — a
crawl-then-serialize CLI (PK:logset `create`, SURVEY §3.1).  This module
maps the same incremental-ingest semantics onto Structured Streaming for
deployments that prefer a streaming runtime:

* `stream_transcripts`   — file-source readStream over the transcript
  directory with `trigger(availableNow=True)`: processes exactly the
  not-yet-seen files recorded in the stream checkpoint, then stops — the
  streaming twin of the manifest left-anti join (X1).
* `structural_triples_stream` — the SAME extraction plan as batch Stage 1
  minus cross-turn edges: followedBy/lag needs unbounded per-conv state,
  which batch handles with a window (W3) and a true streaming deployment
  would handle with applyInPandasWithState; kept out of the streaming
  slice deliberately.
* `windowed_tool_counts` — watermarked sliding/tumbling windowed agg (X2/
  X4): late turns beyond the watermark are dropped, state is bounded.
* `session_counts`       — session_window gap sessionization (X3).
* `streaming_dedup`      — dropDuplicatesWithinWatermark on triple keys
  (X5), the streaming twin of batch A2 dedup.

Everything is expressed on the *streaming* DataFrame API so the identical
plan runs on a socket/kafka source in production; tests drive it with the
file source + availableNow and assert parity against the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.synth import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Incremental file-source ingest of transcript parquet.  Schema is
    pinned (streaming sources don't infer); maxFilesPerTrigger bounds a
    micro-batch so one bad burst can't OOM an executor."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def structural_triples_stream(transcripts: DataFrame) -> DataFrame:
    """Per-turn structural triples on a streaming DataFrame — identical
    URI minting to batch extract.structural_triples, minus the followedBy
    edge (cross-row state; see module docstring)."""
    from .. import vocab as V

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        V.conv_uri("conv_id").alias("conv_u"),
        V.turn_uri("conv_id", "turn_idx").alias("turn_u"),
        V.role_uri("role").alias("role_u"),
        V.iso_ts("ts").alias("iso"),
        V.tool_uri("tool").alias("tool_u"),
    )

    def e(subj, pred, obj):
        return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"))

    entries = F.array(
        e(F.col("conv_u"), V.HAS_TURN, F.col("turn_u")),
        e(F.col("turn_u"), V.PART_OF, F.col("conv_u")),
        e(F.col("turn_u"), V.HAS_ROLE, F.col("role_u")),
        e(F.col("turn_u"), V.AT_TIME, F.col("iso")),
        e(F.col("turn_u"), V.USED_TOOL, F.col("tool_u")),
    )
    return t.select(
        "conv_id", "turn_idx", "ts",
        F.explode(F.filter(entries, lambda x: x["obj"].isNotNull())).alias("tr"),
    ).select(
        F.col("tr.subj").alias("subj"),
        F.col("tr.pred").alias("pred"),
        F.col("tr.obj").alias("obj"),
        "conv_id", "turn_idx", "ts",
    )


def windowed_tool_counts(
    transcripts: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window tool-usage counts with a watermark bound on state:
    turns later than `watermark` behind the max seen ts are dropped."""
    return (
        transcripts.withWatermark("ts", watermark)
        .where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "tool")
        .agg(F.count("*").alias("n_calls"))
        .select(F.col("w.start").alias("win_start"), "tool", "n_calls")
    )


def session_counts(
    transcripts: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization via session_window — the streaming twin of
    the batch lag/cumsum idiom (queries.q_session)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_turns",
        )
    )


def streaming_dedup(triples: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """At-least-once sources re-deliver rows; dropDuplicatesWithinWatermark
    keeps (subj,pred,obj) state only inside the watermark horizon so state
    size is bounded (the streaming twin of batch dedup_triples)."""
    return triples.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["subj", "pred", "obj"]
    )


def run_available_now(
    stream_df: DataFrame, checkpoint: str, out_path: str, mode: str = "append"
) -> None:
    """Drain everything currently available, then stop — the streaming
    equivalent of one idempotent batch run: re-invoking with the same
    checkpoint processes only files not yet recorded there."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
