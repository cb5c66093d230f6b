"""End-to-end KG build: transcripts -> triples table, resumable.

Orchestrates SURVEY §3.2 lifecycle 1/2.  Each stage is a DataFrame plan;
row counts for lineage ride the same actions via Observation (no second
pass).  The whole build does exactly these wide operations:

  1 shuffle  mentions explode is narrow; followedBy window shuffles by conv_id
  0 shuffle  exact link (broadcast)
  k small    fuzzy link on *distinct unlinked forms* only (tiny by design)
  r rounds   CC self-joins on the alias graph (distinct forms, not turns)
  1 shuffle  final dedup groupBy(s,p,o)
  write      repartition(ts_day, conv_bucket) -> dynamic-overwrite parquet

At 10^12 turns the expensive paths (detector UDF, dedup, write) are linear
scans + one hash shuffle each; everything quadratic-ish (fuzzy, CC) runs
on the distinct-surface-form domain, which is orders of magnitude smaller.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import vocab as V
from .operators import cc, extract, link, materialize
from .sources.tableio import TableIO


def _same_as_from_links(spark, linked: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Stage 3: alias graph over linked forms — every (form -> canon) pair
    is an edge; CC merges transitive aliases into ent->ent sameAs triples.
    The canonical representative must be an ent: URI, never a surface form:
    a sort-marker prefix makes ent: URIs win the min-label election."""
    pairs = (
        linked.where(F.col("canon_uri").isNotNull())
        .select(
            link.normalize_form(F.col("form")).alias("src"),
            F.col("canon_uri").alias("dst"),
        )
        .union(
            dictionary.select(
                F.col("surface").alias("src"), F.col("canon_uri").alias("dst")
            )
        )
        .distinct()
    )
    marked = pairs.select(
        F.concat(F.lit("1#"), "src").alias("src"),
        F.concat(F.lit("0#"), "dst").alias("dst"),
    )
    comps = cc.connected_components(marked)
    return (
        cc.same_as_triples(comps)
        .where(F.col("subj").startswith("0#"))  # ent->ent merges only
        .select(
            F.expr("substring(subj, 3)").alias("subj"),
            F.lit(V.SAME_AS).alias("pred"),
            F.expr("substring(obj, 3)").alias("obj"),
        )
        .withColumn("conv_id", F.lit(None).cast("string"))
        .withColumn("turn_idx", F.lit(None).cast("int"))
        .withColumn("ts", F.lit(None).cast("timestamp"))
        .withColumn("conf", F.lit(1.0))
    )


def build_graph(
    spark: SparkSession,
    transcripts: DataFrame,
    dictionary: DataFrame,
    io: TableIO,
    run_id: str | None = None,
    fuzzy_threshold: float = 0.55,
    with_lineage: bool = True,
    fuzzy: bool = True,
    canonicalize: bool = True,
    timings: dict | None = None,
) -> dict:
    """Run the full pipeline; returns {run_id, rows_in, triples, wall_ms}.

    Idempotent per (run_id, partition): partitions already marked done in
    the manifest are skipped; the triple write is a dynamic partition
    overwrite so re-runs replace rather than duplicate.  `fuzzy` /
    `canonicalize` toggle stages 2b/3 (profiling + degraded modes);
    `timings` (optional dict) collects per-stage wall seconds.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.monotonic()
    marks: list[tuple[str, float]] = []

    def _mark(stage: str) -> None:
        marks.append((stage, time.monotonic()))
        if timings is not None:
            prev = marks[-2][1] if len(marks) > 1 else t0
            timings[stage] = round(marks[-1][1] - prev, 2)

    # Fresh run (no manifest yet): every partition is pending, so skip the
    # planned-vs-done reconciliation entirely — it costs a full input scan
    # + distinct before any real work.  Resume runs (manifest present) pay
    # for it because they need the anti-join.
    if materialize.manifest_exists(io):
        pending = materialize.pending_partitions(spark, io, run_id, transcripts)
        pending.persist()
        n_pending = pending.count()
        if n_pending == 0:
            return {"run_id": run_id, "rows_in": 0, "triples": 0, "wall_ms": 0,
                    "skipped": True}
        todo = materialize.filter_to_pending(transcripts, pending, io.n_buckets)
    else:
        pending = None
        todo = transcripts
    _mark("plan_pending")

    obs_in = Observation("rows_in")
    todo = todo.observe(obs_in, F.count(F.lit(1)).alias("n"))

    # Stage 1: structural + mentions (single Arrow pass over text; kinds:
    # entity=dictionary hit, unknown=fuzzy candidate, ts=timestamp literal)
    structural = extract.structural_triples(todo)
    surfaces = {r["surface"] for r in dictionary.select("surface").distinct().collect()}
    detector = extract.make_mention_detector(spark, surfaces, include_unknown=True)
    cand_m = extract.mentions(todo, detector)
    _mark("extract_plan")

    # Stage 2: link.  `linked` fans out to BOTH the mention triples and the
    # canonicalization alias graph — materialize it exactly once (persist +
    # count) so neither branch re-runs the detector UDF / fuzzy stage.
    if fuzzy:
        linked = link.link_mentions(
            spark, cand_m, dictionary, fuzzy_threshold, timings=timings
        )
    else:
        linked = link.exact_link(cand_m, dictionary).withColumnRenamed(
            "weight", "score"
        )
    linked = linked.persist()
    linked.count()
    mention_tri = extract.mention_triples(linked)
    _mark("link")

    # Stage 3: canonicalize (the only eager stage before the write: CC
    # iterates with per-round checkpoints)
    if canonicalize:
        same_as = _same_as_from_links(spark, linked, dictionary)
    else:
        same_as = spark.createDataFrame(
            [],
            "subj string, pred string, obj string, conv_id string, "
            "turn_idx int, ts timestamp, conf double",
        )
    _mark("canonicalize")

    # Stage 4: dedup + write + manifest
    obs_out = Observation("rows_out")
    all_triples = structural.unionByName(mention_tri).unionByName(same_as)
    final = materialize.dedup_triples(all_triples).observe(
        obs_out, F.count(F.lit(1)).alias("n")
    )
    materialize.write_triples(io, final)
    _mark("materialize")
    materialize.mark_done(spark, io, run_id, "materialize", pending)
    _mark("mark_done")

    wall_ms = int((time.monotonic() - t0) * 1000)
    rows_in = obs_in.get["n"]
    rows_out = obs_out.get["n"]
    if with_lineage:
        materialize.append_lineage(
            spark, io, run_id, "build_graph", rows_in, rows_out, wall_ms
        )
    _mark("finalize")
    linked.unpersist()
    if pending is not None:
        pending.unpersist()
    return {
        "run_id": run_id,
        "rows_in": rows_in,
        "triples": rows_out,
        "wall_ms": wall_ms,
        "skipped": False,
    }
