"""SnapshotTableIO — Iceberg-style snapshot isolation over the TableIO
parquet layout (SURVEY.md §1.3 / §2 S3-S5).

The north rule lands the graph in *Iceberg* triple tables; Iceberg's
defining behaviors beyond a partitioned parquet dir are (a) immutable
data files tracked by snapshot manifests, (b) time-travel reads at any
retained snapshot, (c) atomic commits (readers never see a half-written
table), and (d) rollback as a new snapshot, never a destructive edit.
No Iceberg runtime jar exists in this sandbox (documented in SURVEY
§1.3), so this module emulates exactly those semantics on the filesystem
the same way Iceberg's own metadata layer does — file-set bookkeeping,
not data rewriting:

    <root>/data/commit=<c>/ts_day=<d>/conv_bucket=<b>/part-*.parquet
    <root>/_meta/v<NNNNNN>.json   snapshot: version, operation, parent,
                                  mapping {"<ts_day>|<bucket>": [commits]}
    <root>/_meta/current          version-hint pointer (atomic os.replace)

Every commit writes its files under a fresh `commit=<c>` prefix — data
files are IMMUTABLE, so older snapshots stay readable until explicitly
expired (Iceberg's `expireSnapshots`).  A snapshot's manifest maps each
logical partition (ts_day, conv_bucket) to the list of commits whose
files constitute it; dynamic partition-overwrite repoints only the keys
present in the incoming frame, append extends their commit lists, and
rollback copies an older mapping forward as a NEW snapshot.

Scale notes (100 TB): the manifest is partition-level, not file-level —
its size is O(days x buckets), thousands of entries, driver-trivial, and
`read()` hands Spark a list of partition *directories* so file listing
stays distributed.  Commit atomicity is last-writer-wins via the
`current` pointer (os.replace); real Iceberg adds optimistic-concurrency
CAS on the catalog — single-writer pipelines (ours: one driver per run,
resume via manifests) never race it.  Swapping in a real catalog changes
this module only: `commit` -> writeTo().overwritePartitions(), `read(v)`
-> VERSION AS OF, `rollback` -> rollback_to_snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import DEFAULT_BUCKETS, with_layout


def _key(day: str, bucket: str) -> str:
    return f"{day}|{bucket}"


@dataclass
class SnapshotTableIO:
    """Versioned (snapshot-isolated) single-table store."""

    root: str
    n_buckets: int = DEFAULT_BUCKETS

    # ---- metadata plumbing -------------------------------------------------

    @property
    def _meta(self) -> str:
        return os.path.join(self.root, "_meta")

    @property
    def _data(self) -> str:
        return os.path.join(self.root, "data")

    def current_version(self) -> int:
        """Latest committed version; 0 = empty table."""
        hint = os.path.join(self._meta, "current")
        if not os.path.exists(hint):
            return 0
        with open(hint) as f:
            return int(f.read().strip())

    def _snap_path(self, version: int) -> str:
        return os.path.join(self._meta, f"v{version:06d}.json")

    def _load_snapshot(self, version: int) -> dict:
        path = self._snap_path(version)
        if not os.path.exists(path):
            raise ValueError(
                f"snapshot v{version} does not exist or was expired "
                f"(current={self.current_version()})"
            )
        with open(path) as f:
            return json.load(f)

    def _publish(self, snap: dict) -> None:
        """Write the snapshot file, then atomically advance the pointer.
        A reader that races the commit sees either the old or the new
        version — never a torn state — because data files for the new
        commit are fully written before the pointer moves."""
        os.makedirs(self._meta, exist_ok=True)
        with open(self._snap_path(snap["version"]), "w") as f:
            json.dump(snap, f, sort_keys=True)
        fd, tmp = tempfile.mkstemp(dir=self._meta)
        with os.fdopen(fd, "w") as f:
            f.write(str(snap["version"]))
        os.replace(tmp, os.path.join(self._meta, "current"))

    # ---- write path --------------------------------------------------------

    def _written_partitions(self, commit: int) -> list[tuple[str, str]]:
        """(ts_day, conv_bucket) dirs the commit created.  Directory-level
        listing: O(days x buckets) entries, never per-file."""
        base = os.path.join(self._data, f"commit={commit}")
        out = []
        for day_dir in sorted(os.listdir(base)):
            if not day_dir.startswith("ts_day="):
                continue
            day = day_dir.split("=", 1)[1]
            for b_dir in sorted(os.listdir(os.path.join(base, day_dir))):
                if b_dir.startswith("conv_bucket="):
                    out.append((day, b_dir.split("=", 1)[1]))
        return out

    def commit(self, df: DataFrame, mode: str = "overwrite_partitions") -> int:
        """Write `df` as a new immutable commit and publish the snapshot.

        mode="overwrite_partitions": Iceberg dynamic overwrite — partitions
            present in `df` are repointed to this commit; absent partitions
            keep their prior files (the idempotent-resume primitive, S4).
        mode="append": this commit's files are ADDED to each partition's
            file set (Iceberg fast-append).

        Returns the new version number."""
        if mode not in ("overwrite_partitions", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        parent = self.current_version()
        version = parent + 1
        (
            with_layout(df, self.n_buckets)
            .repartition(F.col("ts_day"), F.col("conv_bucket"))
            .sortWithinPartitions("ts_day", "conv_bucket", "conv_id", "turn_idx")
            .write.mode("errorifexists")
            .partitionBy("ts_day", "conv_bucket")
            .parquet(os.path.join(self._data, f"commit={version}"))
        )
        mapping: dict[str, list[int]] = (
            dict(self._load_snapshot(parent)["mapping"]) if parent else {}
        )
        for day, bucket in self._written_partitions(version):
            k = _key(day, bucket)
            if mode == "append" and k in mapping:
                mapping[k] = mapping[k] + [version]
            else:
                mapping[k] = [version]
        self._publish({
            "version": version,
            "parent": parent,
            "operation": mode,
            "mapping": mapping,
        })
        return version

    def rollback(self, to_version: int) -> int:
        """Publish a NEW snapshot whose file set equals `to_version`'s.
        Nothing is deleted — the rolled-back-over versions stay readable
        (Iceberg rollback semantics)."""
        old = self._load_snapshot(to_version)
        version = self.current_version() + 1
        self._publish({
            "version": version,
            "parent": self.current_version(),
            "operation": f"rollback_to_{to_version}",
            "mapping": old["mapping"],
        })
        return version

    # ---- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the table as of `version` (default: latest).  Hands Spark
        the snapshot's partition directories with a shared basePath so
        ts_day/conv_bucket come back as partition columns and partition
        pruning still works; the transient commit= level is dropped."""
        v = self.current_version() if version is None else version
        snap = self._load_snapshot(v)
        paths = [
            os.path.join(self._data, f"commit={c}",
                         f"ts_day={day}", f"conv_bucket={bucket}")
            for k, commits in sorted(snap["mapping"].items())
            for c in commits
            for day, bucket in [k.split("|", 1)]
        ]
        if not paths:
            raise ValueError(f"snapshot v{v} is empty")
        return (
            spark.read.option("basePath", self._data)
            .parquet(*paths)
            .drop("commit")
        )

    def history(self, spark: SparkSession) -> DataFrame:
        """One row per retained snapshot: version, parent, operation,
        n_partitions — the `table.history()` metadata surface."""
        rows = []
        for fname in sorted(os.listdir(self._meta)):
            if fname.startswith("v") and fname.endswith(".json"):
                with open(os.path.join(self._meta, fname)) as f:
                    s = json.load(f)
                rows.append((s["version"], s["parent"], s["operation"],
                             len(s["mapping"])))
        return spark.createDataFrame(
            rows, "version int, parent int, operation string, n_partitions int"
        )

    # ---- maintenance -------------------------------------------------------

    def expire_snapshots(self, keep_from: int) -> list[int]:
        """Drop snapshot metadata older than `keep_from` and GC commit
        directories no retained snapshot references (Iceberg
        expireSnapshots + orphan-file cleanup).  Returns removed commits."""
        current = self.current_version()
        keep_from = min(keep_from, current)
        retained_commits: set[int] = set()
        for fname in list(os.listdir(self._meta)):
            if not (fname.startswith("v") and fname.endswith(".json")):
                continue
            v = int(fname[1:-5])
            if v < keep_from:
                os.remove(os.path.join(self._meta, fname))
                continue
            snap = self._load_snapshot(v)
            for commits in snap["mapping"].values():
                retained_commits.update(commits)
        removed = []
        if os.path.isdir(self._data):
            for d in sorted(os.listdir(self._data)):
                if not d.startswith("commit="):
                    continue
                c = int(d.split("=", 1)[1])
                if c not in retained_commits:
                    shutil.rmtree(os.path.join(self._data, d))
                    removed.append(c)
        return removed
