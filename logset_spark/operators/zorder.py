"""Z-order (Morton-curve) clustering + file-level min/max skipping.

The multi-column data-skipping layout (Delta/Iceberg's OPTIMIZE ZORDER
BY): a table queried by rectangle predicates on two dimensions cannot be
range-sorted to serve both — sorting by (a, b) makes min/max file stats
selective on `a` and useless on `b`.  Interleaving the bits of the two
rank-normalized keys (the Morton code) keeps rows that are close in BOTH
dimensions close on the curve, so a file holding a contiguous z-range
covers a small rectangle of (a, b) space and a predicate on EITHER
column (or both) skips most files from metadata alone.

Everything here is native column arithmetic (no Python in the row path)
and integer-exact, so the layout decision itself is oracle-checkable:

- `z_expr(a, b, bits)` — scale each key to [0, 2^bits) with integer
  math from a broadcast 1-row min/max aggregate, then interleave bits
  via shift/AND/OR expression trees (whole-stage codegen fuses them).
- `ZOrderedTable.write` — one range exchange on z (Spark samples range
  bounds, so file z-ranges are equi-populated), per-file [min, max] of
  the clustered columns collected as ONE small aggregate and stored in
  a JSON manifest next to the data.
- `ZOrderedTable.read_pruned(lo_a, hi_a, lo_b, hi_b)` — drops whole
  files whose stat-box misses the query rectangle, driver-side at
  manifest (file-count) scale, before Spark lists anything.  Pruning
  is pure IO elision: callers still apply the real predicate; skipped
  files are files the predicate could never select.

At 100 TB the manifest is the Iceberg per-file stats map and `write`
is a table-service rewrite; the emulation keeps identical logic at
file-count scale.  `tests/test_zorder.py` pins correctness (pruned+
filtered == plain filter), pruning effectiveness vs a 1-column-sorted
layout, and the integer-exactness of the z code; `q_zorder` replays an
end-to-end write→prune→read rectangle against the declarative filter.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def scale_expr(
    col: Column, mn: Column, mx: Column, bits: int, shift: int = 0
) -> Column:
    """Rank-normalize `col` into [0, 2^bits) with EXACT integer math:
    floor(((col - mn) >> shift) * (2^bits - 1) / ((mx - mn) >> shift)).

    `shift` is the overflow/precision guard the CALLER bakes in from the
    numeric span (write() computes it driver-side from the same stats
    that supply mn/mx): shifting keeps the shifted span under 2^36, so
    the product with top (< 2^16) stays under 2^52 — inside the double
    mantissa, where floor-of-division is exact — and can never wrap
    int64.  Without it, a wide-range column (epoch microseconds over
    years) silently overflows the multiply with ANSI off.  Discarding
    `shift` low bits is free precision-wise: the output has only 2^bits
    buckets, far coarser than what was dropped."""
    top = F.lit((1 << bits) - 1).cast("long")
    d = F.shiftright((col.cast("long") - mn.cast("long")), shift)
    span = F.greatest(
        F.shiftright((mx - mn).cast("long"), shift), F.lit(1).cast("long")
    )
    return F.floor((d * top) / span).cast("long")


def span_shift(span: int, bits: int = 16) -> int:
    """The right-shift scale_expr needs so (span >> shift) * (2^bits - 1)
    stays exactly representable in a double (< 2^52)."""
    return max(0, int(span).bit_length() + bits - 52)


def interleave_expr(x: Column, y: Column, bits: int) -> Column:
    """Morton code: bit i of x lands at position 2i, bit i of y at
    2i+1.  A flat OR-tree of shift/AND terms — pure codegen-friendly
    integer ops, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z.bitwiseOR(xb).bitwiseOR(yb)
    return z


class ZOrderedTable:
    """A parquet table laid out in Morton order over two integer-valued
    columns, with a per-file stats manifest used for rectangle pruning."""

    def __init__(self, root: str, col_a: str, col_b: str, bits: int = 16):
        self.root = root
        self.col_a = col_a
        self.col_b = col_b
        self.bits = bits

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "zorder_manifest.json")

    def _load_manifest(self) -> dict:
        with open(self._manifest) as f:
            return json.load(f)

    def _data_dir(self, manifest: dict | None = None) -> str:
        m = manifest if manifest is not None else self._load_manifest()
        return os.path.join(self.root, m.get("data_dir", "data"))

    def write(self, df: DataFrame, n_files: int = 32) -> dict:
        """Cluster `df` on the z-curve and write `n_files` files plus the
        stats manifest.  Plan: one 4-value stats aggregate (broadcast
        back as literals), one range exchange on z, a per-file min/max
        aggregate at file-count scale, one write.

        Atomicity: the data lands in a FRESH versioned directory and the
        manifest (which names it) is published LAST via os.replace — a
        crash anywhere mid-write leaves the previous manifest still
        pointing at the previous, untouched data.  An in-place overwrite
        would instead leave a stale manifest describing new files, and
        pruning would silently drop rows forever after."""
        import shutil

        version = 1
        if os.path.exists(self._manifest):
            version = self._load_manifest().get("version", 0) + 1
        data_dir = f"data-v{version:04d}"
        target = os.path.join(self.root, data_dir)
        if os.path.isdir(target):  # crashed earlier attempt, unreferenced
            shutil.rmtree(target)

        a, b = F.col(self.col_a), F.col(self.col_b)
        stats = df.agg(
            F.min(a.cast("long")).alias("mna"),
            F.max(a.cast("long")).alias("mxa"),
            F.min(b.cast("long")).alias("mnb"),
            F.max(b.cast("long")).alias("mxb"),
        ).first()

        def _scaled(col, mn, mx):
            span = int(mx - mn) if mx is not None and mn is not None else 0
            return scale_expr(
                col, F.lit(mn), F.lit(mx), self.bits,
                shift=span_shift(span, self.bits),
            )

        z = interleave_expr(
            _scaled(a, stats["mna"], stats["mxa"]),
            _scaled(b, stats["mnb"], stats["mxb"]),
            self.bits,
        )
        laid = (
            df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .withColumn("_fid", F.spark_partition_id())
            # the exchange is consumed twice (stats + write): pin it so
            # range bounds aren't re-sampled between the two actions
            .localCheckpoint(eager=True)
        )
        file_stats = laid.groupBy("_fid").agg(
            F.min(a).alias("min_a"), F.max(a).alias("max_a"),
            F.min(b).alias("min_b"), F.max(b).alias("max_b"),
            F.count(F.lit(1)).alias("rows"),
        ).collect()  # file-count scale — bounded by n_files
        (laid.drop("_z")
             .write.partitionBy("_fid").mode("errorifexists")
             .parquet(target))
        manifest = {
            "version": version, "data_dir": data_dir,
            "col_a": self.col_a, "col_b": self.col_b, "bits": self.bits,
            "files": {
                str(r["_fid"]): {
                    "min_a": r["min_a"], "max_a": r["max_a"],
                    "min_b": r["min_b"], "max_b": r["max_b"],
                    "rows": r["rows"],
                }
                for r in file_stats
            },
        }
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest)
        # the superseded data dir is now unreferenced: reclaim it
        for d in os.listdir(self.root):
            full = os.path.join(self.root, d)
            if (d.startswith("data") and d != data_dir
                    and os.path.isdir(full)):
                shutil.rmtree(full)
        return manifest

    def prune(self, lo_a=None, hi_a=None, lo_b=None, hi_b=None) -> list[str]:
        """File ids whose stat-box overlaps the query rectangle (an
        unbounded side matches everything).  Driver-side metadata only.
        A None stat (the column was all-NULL in that file — NULL z sorts
        first, so NULL-heavy data clusters into one file) is UNKNOWN and
        conservatively included, never compared."""
        manifest = self._load_manifest()

        def miss(mn, mx, lo, hi) -> bool:
            if mn is None or mx is None:
                return False  # unknown stats cannot exclude the file
            return (lo is not None and mx < lo) or \
                   (hi is not None and mn > hi)

        def hits(s) -> bool:
            return not (
                miss(s["min_a"], s["max_a"], lo_a, hi_a)
                or miss(s["min_b"], s["max_b"], lo_b, hi_b)
            )

        return sorted(
            (fid for fid, s in manifest["files"].items() if hits(s)),
            key=int,
        )

    def read_pruned(self, spark: SparkSession, lo_a=None, hi_a=None,
                    lo_b=None, hi_b=None) -> DataFrame:
        """Rows of the files surviving rectangle pruning.  Callers apply
        the actual predicate on top — pruning only elides IO."""
        fids = self.prune(lo_a, hi_a, lo_b, hi_b)
        data = self._data_dir()
        if not fids:
            return spark.read.parquet(data).limit(0).drop("_fid")
        paths = [os.path.join(data, f"_fid={fid}") for fid in fids]
        return (
            spark.read.option("basePath", data).parquet(*paths)
            .drop("_fid")
        )

    def n_files(self) -> int:
        return len(self._load_manifest()["files"])
