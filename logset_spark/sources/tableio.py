"""TableIO — the Iceberg/parquet seam (SURVEY.md §1.3).

The north rule materializes triples as Iceberg tables bucketed by conv_id
and partitioned by days(ts).  This sandbox has no Iceberg runtime jar, so
the parquet path emulates the identical *logical* layout with derived
columns:

    ts_day      = date_trunc('day', ts)          -- days(ts) partition
    conv_bucket = pmod(xxhash64(conv_id), N)     -- bucket(N, conv_id)

Everything downstream (partition pruning, resume manifests, lineage keys,
dynamic partition overwrite) keys on (ts_day, conv_bucket), so swapping in
`writeTo(tbl).partitionedBy(bucket(N, conv_id), days(ts))` on a real
cluster changes only this module.  The reference's equivalent surface is
Turtle file load/serialize (PK:src/graph.py Graph.parse/serialize).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def with_layout(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Attach the partition/bucket columns. Cheap native exprs; codegen'd."""
    return df.withColumn("ts_day", F.to_date(F.date_trunc("day", F.col("ts")))) \
             .withColumn(
                 "conv_bucket",
                 F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int"),
             )


@dataclass
class TableIO:
    """Read/write triple-shaped tables with the bucketed+day layout."""

    root: str
    n_buckets: int = DEFAULT_BUCKETS
    catalog: str = "parquet"  # "iceberg" on a real cluster (needs runtime jar)
    # >1 spreads each (ts_day, conv_bucket) output partition over this many
    # writer tasks (extra repartition salt on subj) — the skew valve for a
    # hot day/bucket at cluster scale.  Costs n_write_salts files per
    # partition dir, so keep 1 unless a partition outgrows one task.
    n_write_salts: int = 1

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              finisher=None, pre_sort=None) -> None:
        """Partitioned write. `mode=overwrite` + dynamic partitionOverwriteMode
        (set in session.py) means only the partitions present in `df` are
        replaced — the idempotent-resume primitive (SURVEY §2 S4).

        `pre_sort(df) -> df` runs AFTER the layout repartition and BEFORE
        the local sort: a groupBy keyed on a superset of (ts_day,
        conv_bucket) placed here reuses the layout exchange (Catalyst's
        subset rule for ClusteredDistribution) — partition-local dedup
        with no shuffle of its own.

        `finisher(df) -> df` runs AFTER the layout repartition AND the
        local sort: reconstruction of wide derived columns (subject URIs,
        predicate strings, the packed-row 6x structural explode) goes
        there so only the slim/packed representation crosses the shuffle
        *and* the sort.  Ordering survives the finisher — GenerateExec and
        Project preserve child output ordering for pass-through columns —
        so FileFormatWriter sees its required partition-column ordering
        already satisfied and inserts no second sort (asserted in
        tests/test_plans.py::test_write_sorts_packed_rows_once)."""
        if self.catalog == "iceberg":  # pragma: no cover - needs runtime jar
            out = with_layout(df, self.n_buckets)
            out = finisher(out) if finisher else out
            (out.writeTo(self.path(name)).using("iceberg")
             .partitionedBy(F.bucket(self.n_buckets, "conv_id"), F.days("ts"))
             .createOrReplace())
            return
        keys = [F.col("ts_day"), F.col("conv_bucket")]
        if self.n_write_salts > 1:
            keys.append(F.pmod(F.xxhash64("conv_id", "turn_idx"),
                               F.lit(self.n_write_salts)))
        out = with_layout(df, self.n_buckets).repartition(*keys)
        if pre_sort:
            out = pre_sort(out)
        # prefix the partition cols so FileFormatWriter's required
        # ordering is already satisfied — ONE local sort instead of
        # ours + the writer's hidden partition-col sort; sorting the
        # PACKED rows (pre-finisher) moves ~3x fewer bytes than
        # sorting the exploded triples would
        out = out.sortWithinPartitions(
            "ts_day", "conv_bucket", "conv_id", "turn_idx"
        )
        if finisher:
            out = finisher(out)
        (
            out
            .write.mode(mode)
            .partitionBy("ts_day", "conv_bucket")
            .parquet(self.path(name))
        )

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.catalog == "iceberg":  # pragma: no cover
            return spark.table(self.path(name))
        return spark.read.parquet(self.path(name))

    def write_small(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        """Unpartitioned sink for tiny control tables (manifest, lineage)."""
        df.coalesce(1).write.mode(mode).parquet(self.path(name))
