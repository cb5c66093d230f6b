"""O1 — distributed global sort with a contiguous index.

The reference serializes its graph in one globally-sorted pass (rdflib's
in-memory sort; SURVEY §2.6 O1).  A single-partition ``row_number() OVER
(ORDER BY ...)`` window reproduces that on Spark but funnels every row
through one task — dead at 10^12 rows.  ``global_sorted_index`` is the
scalable shape (DataFrame equivalent of RDD ``zipWithIndex``):

1. ``repartitionByRange`` on the sort keys — parallel range shuffle; range
   partition ids are ascending in key order, so partition-local ranks can
   be made global with per-partition offsets.
2. a tiny driver job counts rows per partition (K rows for K partitions —
   the ONLY thing collected) and prefix-sums them into offsets.
3. partition-local ``row_number`` + the offset literal indexed by
   ``spark_partition_id``.

Two balanced shuffles of the data, never a single-task stage.  The input
is locally checkpointed between the count job and the main job so both
see the same range boundaries (range partitioning samples its bounds;
recomputation could re-sample differently — see the note in the
function body).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gsi_pid"


def global_sorted_index(
    df: DataFrame, cols: list[str], index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a contiguous 1-based global rank under ORDER BY *cols*.

    *cols* must form a total order (include a unique tie-breaker) or ranks
    within ties are partition-dependent.  Returns the input columns plus
    ``index_col``; output is NOT delivered range-partitioned (the local
    rank window re-clusters by partition id) — follow with ``orderBy`` if
    a sorted layout is needed downstream.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint, NOT persist: both downstream jobs (the offset count
    # and the final pass) must see the SAME range boundaries (range
    # partitioning samples its bounds; recomputation could re-sample).
    # A persist() only *hints* that — under memory pressure an evicted
    # block is silently recomputed with fresh samples, desynchronizing
    # the offsets with no error — and a DataFrame persist is pinned in
    # the cache manager for the session unless explicitly unpersisted.
    # localCheckpoint truncates lineage: a lost block fails the job
    # loudly instead of corrupting ranks, and its blocks are released by
    # the ContextCleaner when this DataFrame goes out of scope.  (On a
    # cluster where executor loss must be survivable, swap for a
    # reliable checkpoint() against the checkpoint dir.)
    part = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {r[_PID]: r["n"] for r in
              part.groupBy(_PID).agg(F.count("*").alias("n")).collect()}
    offsets, acc = [], 0
    for pid in range(max(counts, default=-1) + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    # K-element literal rides the plan; map-side lookup, no join.  At
    # extreme partition counts swap for a broadcast join on pid.
    off = F.array(*[F.lit(o) for o in offsets]) if offsets else F.array()
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
    return part.withColumn(
        index_col,
        (F.element_at(off, F.col(_PID) + 1) + local).cast("long"),
    ).drop(_PID)


def global_running_total(
    df: DataFrame, cols: list[str], value_col: str,
    total_col: str = "running_total", num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global prefix sum: ``sum(value_col) OVER (ORDER BY
    *cols* ROWS UNBOUNDED PRECEDING)`` — inclusive of the current row —
    without the single-task global window.  Same two-shuffle shape as
    ``global_sorted_index`` (range partition -> per-partition TOTALS
    collected, K scalars -> prefix offsets -> partition-local cumsum +
    offset).  The backbone of sequence packing: token budgets need the
    running token count across the whole corpus in a stable order.

    *cols* must form a total order.  value_col must be integral (exact
    prefix sums; float cumsums are order-sensitive).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # same localCheckpoint rationale as global_sorted_index: both jobs
    # must see identical sampled range bounds, and a lost block must fail
    # loudly rather than silently re-sample.
    part = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {r[_PID]: r["s"] or 0 for r in
            part.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()}
    offsets, acc = [], 0
    for pid in range(max(sums, default=-1) + 1):
        offsets.append(acc)
        acc += sums.get(pid, 0)
    off = F.array(*[F.lit(int(o)) for o in offsets]) if offsets else F.array()
    local = F.sum(value_col).over(
        Window.partitionBy(_PID).orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return part.withColumn(
        total_col,
        (F.element_at(off, F.col(_PID) + 1) + local).cast("long"),
    ).drop(_PID)
