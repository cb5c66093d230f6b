"""Incrementally-maintained aggregate materialized views over the
snapshot store.

The lakehouse pattern this implements: a 100 TB base table gets a small
aggregate view (counts + exact sums per group) that downstream consumers
read instead of rescanning the base.  On refresh, the view is advanced
from base snapshot N to M using the row-level changelog
(`SnapshotTableIO.diff`) — count/sum are distributive, so the textbook
incremental-view-maintenance rule applies: signed partial aggregates of
the +/- changelog are merged into the stored groups, and groups whose
count reaches zero are dropped.  Refresh cost is proportional to the
DELTA plus the touched view buckets, never to the base table or the full
view.

Storage mirrors the snapshot store's discipline at view scale: the view
is hash-bucketed on its group key (`mv_bucket = pmod(xxhash64(keys), B)`),
every refresh writes only the buckets containing changed groups as a new
immutable `commit=K` directory, and a single JSON meta file — replaced
atomically via os.replace — maps each bucket to the commit that last
rewrote it and records the base version the view reflects.  A crash
mid-refresh leaves orphan files, never a wrong or half-advanced view:
readers follow the old meta until the atomic publish.

The maintained view is bit-for-bit the full recomputation at the same
base version — asserted by `tests/test_matview.py` over randomized
append/overwrite/delete commit sequences, and oracle-checked end-to-end
by `q_mv_incremental` (DuckDB replays the final base state declaratively;
the incrementally-maintained aggregate must hash-match it).
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import SnapshotTableIO


class IncrementalAggView:
    """count(*) + exact sums per group, incrementally maintained.

    `group_cols` are the view's grouping keys; `sum_cols` must be exact
    numeric columns (integer or decimal — float sums are aggregation-
    order-dependent and would break the maintained == recomputed
    invariant; callers stage doubles through decimal first, the same
    rule the oracle queries use).
    """

    def __init__(self, root: str, group_cols: list[str],
                 sum_cols: list[str] = (), n_buckets: int = 16):
        if not group_cols:
            raise ValueError("group_cols must be non-empty")
        self.root = root
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.n_buckets = int(n_buckets)
        os.makedirs(self._data, exist_ok=True)

    # ---- layout --------------------------------------------------------

    @property
    def _data(self) -> str:
        return os.path.join(self.root, "data")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "view.json")

    def _load_meta(self) -> dict | None:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _publish(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)  # atomic: readers see old or new

    def base_version(self) -> int | None:
        meta = self._load_meta()
        return None if meta is None else meta["base_version"]

    # ---- expressions -----------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(*self.group_cols),
                      F.lit(self.n_buckets)).cast("int")

    @property
    def _agg_cols(self) -> list[str]:
        return ["n_rows"] + [f"sum_{c}" for c in self.sum_cols]

    def _full_agg(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(c).alias(f"sum_{c}") for c in self.sum_cols
        ]
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _signed_agg(self, delta: DataFrame) -> DataFrame:
        """Partial aggregates of the +/- changelog: one map-side-combined
        shuffle over the delta only."""
        sign = F.when(F.col("op") == "+", F.lit(1)).otherwise(F.lit(-1))
        aggs = [F.sum(sign).alias("n_rows")] + [
            F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in self.sum_cols
        ]
        return delta.groupBy(*self.group_cols).agg(*aggs)

    # ---- refresh ---------------------------------------------------------

    def refresh(self, spark: SparkSession, base: SnapshotTableIO,
                to_version: int | None = None) -> dict:
        """Advance the view to base snapshot `to_version` (default: the
        base's current version).  First refresh is a full build; later
        refreshes are changelog-driven.  Returns a summary dict."""
        to_v = base.current_version() if to_version is None else to_version
        meta = self._load_meta()
        if meta is None:
            agg = self._full_agg(base.read(spark, to_v))
            mapping = self._write_buckets(agg, commit=1, buckets=None)
            self._publish({"version": 1, "base_version": to_v,
                           "mapping": mapping,
                           "group_cols": self.group_cols,
                           "sum_cols": self.sum_cols,
                           "n_buckets": self.n_buckets})
            return {"mode": "full", "base_version": to_v,
                    "buckets_rewritten": len(mapping)}

        # the view definition is part of the stored state: merging with a
        # different key set or bucket count would corrupt groups silently
        stored = (meta.get("group_cols"), meta.get("sum_cols"),
                  meta.get("n_buckets"))
        mine = (self.group_cols, self.sum_cols, self.n_buckets)
        if stored != (None, None, None) and stored != mine:
            raise ValueError(
                f"view definition mismatch: stored {stored}, got {mine}")

        from_v = meta["base_version"]
        if to_v == from_v:
            return {"mode": "noop", "base_version": to_v,
                    "buckets_rewritten": 0}
        if to_v < from_v:
            raise ValueError(
                f"view reflects base v{from_v}; cannot refresh backwards "
                f"to v{to_v} (rebuild instead)")

        delta = base.diff(spark, from_v, to_v)
        signed = (
            self._signed_agg(delta)
            .withColumn("mv_bucket", self._bucket_expr())
            # read twice below (bucket list + merge); the delta agg is
            # group-cardinality-of-the-delta sized, safe to pin
            .localCheckpoint(eager=True)
        )
        # bounded driver list: at most n_buckets values
        buckets = sorted(
            r["mv_bucket"]
            for r in signed.select("mv_bucket").distinct().collect()
        )
        if not buckets:
            self._publish({**meta, "base_version": to_v})
            return {"mode": "incremental", "base_version": to_v,
                    "buckets_rewritten": 0}

        d = signed.select(
            *self.group_cols,
            *[F.col(a).alias(f"d_{a}") for a in self._agg_cols],
        )
        current = self._read_buckets(spark, meta["mapping"], buckets, d)
        # NULL-SAFE join on the group keys: a plain USING join never
        # matches NULL = NULL, so a NULL-keyed group in both the stored
        # view and the delta would surface as two rows (or a spurious
        # negative-count error) instead of merging — breaking the
        # maintained == recomputed invariant for nullable group columns
        cond = None
        for g in self.group_cols:
            eq = current[g].eqNullSafe(d[g])
            cond = eq if cond is None else cond & eq
        merged = current.join(d, cond, "full").select(
            *[
                F.coalesce(current[g], d[g]).alias(g)
                for g in self.group_cols
            ],
            *[
                (F.coalesce(F.col(f"cur_{a}"), F.lit(0))
                 + F.coalesce(F.col(f"d_{a}"), F.lit(0))).alias(a)
                for a in self._agg_cols
            ],
        ).localCheckpoint(eager=True)  # guard + write: evaluate ONCE
        if merged.filter(F.col("n_rows") < 0).limit(1).count():
            raise ValueError(
                "changelog removed rows the view never counted — the view "
                "no longer reflects an ancestor of the target snapshot")
        merged = merged.filter(F.col("n_rows") > 0)
        commit = meta["version"] + 1
        written = self._write_buckets(merged, commit, buckets)
        mapping = {
            b: c for b, c in meta["mapping"].items() if int(b) not in buckets
        }
        mapping.update(written)
        self._publish({**meta, "version": commit, "base_version": to_v,
                       "mapping": mapping})
        return {"mode": "incremental", "base_version": to_v,
                "buckets_rewritten": len(buckets)}

    def _read_buckets(self, spark: SparkSession, mapping: dict,
                      buckets: list[int], like: DataFrame) -> DataFrame:
        """Current view rows for `buckets` only (partition-pruned paths),
        aggregate columns renamed cur_*.  Buckets the view has never
        written (all-new groups) contribute an empty frame shaped like
        the delta side."""
        paths = [
            os.path.join(self._data, f"commit={mapping[str(b)]}",
                         f"mv_bucket={b}")
            for b in buckets if str(b) in mapping
        ]
        if not paths:
            return like.limit(0).select(
                *self.group_cols,
                *[F.col(f"d_{a}").alias(f"cur_{a}") for a in self._agg_cols],
            )
        return (
            spark.read.option("basePath", self._data).parquet(*paths)
            .select(
                *self.group_cols,
                *[F.col(a).alias(f"cur_{a}") for a in self._agg_cols],
            )
        )

    def _write_buckets(self, df: DataFrame, commit: int,
                       buckets: list[int] | None) -> dict:
        """Write `df` partitioned by mv_bucket under an immutable commit
        dir; return {bucket: commit} for buckets that produced rows.
        `buckets` (when given) bounds which dirs may appear."""
        out = df
        if "mv_bucket" not in out.columns:
            out = out.withColumn("mv_bucket", self._bucket_expr())
        commit_dir = os.path.join(self._data, f"commit={commit}")
        (out.repartition("mv_bucket")
            .write.partitionBy("mv_bucket").mode("overwrite")
            .parquet(commit_dir))
        written = {}
        for name in os.listdir(commit_dir):
            if name.startswith("mv_bucket="):
                b = int(name.split("=", 1)[1])
                if buckets is not None and b not in buckets:
                    raise AssertionError(
                        f"bucket {b} written outside the changed set")
                written[str(b)] = commit
        return written

    # ---- read ------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        meta = self._load_meta()
        if meta is None:
            raise ValueError(f"view at {self.root} was never refreshed")
        if not meta["mapping"]:
            # every group deleted: serve an empty frame shaped by any
            # prior commit's files (commit dirs are immutable, still there)
            import glob
            prior = sorted(glob.glob(
                os.path.join(self._data, "commit=*", "mv_bucket=*")))
            if not prior:
                raise ValueError("view is empty with no retained schema")
            return (
                spark.read.option("basePath", self._data).parquet(prior[0])
                .drop("commit", "mv_bucket").limit(0)
            )
        paths = [
            os.path.join(self._data, f"commit={c}", f"mv_bucket={b}")
            for b, c in sorted(meta["mapping"].items())
        ]
        return (
            spark.read.option("basePath", self._data).parquet(*paths)
            .drop("commit", "mv_bucket")
        )
