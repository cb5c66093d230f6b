"""Z-order layout — pruning correctness, effectiveness vs linear sort,
integer-exact Morton codes."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.zorder import (
    ZOrderedTable, interleave_expr, scale_expr,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="logset_zorder_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _grid(spark, n=64):
    """n x n integer grid — the adversarial case for linear sort: every
    x-slice spans all of y and vice versa."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("int").alias("x"),
            (F.col("id") / n).cast("int").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_morton_code_matches_python(spark):
    """The interleave expression equals a bit-level python replay."""
    df = spark.range(200).select(
        (F.col("id") * 37 % 1021).cast("long").alias("x"),
        (F.col("id") * 91 % 997).cast("long").alias("y"),
    )
    bits = 10
    got = df.withColumn(
        "z", interleave_expr(F.col("x"), F.col("y"), bits)
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in got:
        assert r["z"] == morton(r["x"], r["y"])


def test_scale_is_integer_exact(spark):
    df = spark.range(100).select((F.col("id") * 13 + 7).alias("v"))
    bits = 8
    got = df.select(
        "v",
        scale_expr(F.col("v"), F.lit(7), F.lit(99 * 13 + 7), bits).alias("s"),
    ).collect()
    top, span = (1 << bits) - 1, 99 * 13
    for r in got:
        assert r["s"] == ((r["v"] - 7) * top) // span
        assert 0 <= r["s"] <= top


def test_pruned_read_equals_full_filter(spark, root):
    t = ZOrderedTable(root, "x", "y", bits=8)
    df = _grid(spark)
    t.write(df, n_files=16)
    lo_a, hi_a, lo_b, hi_b = 10, 20, 30, 45
    pred = (
        (F.col("x") >= lo_a) & (F.col("x") <= hi_a)
        & (F.col("y") >= lo_b) & (F.col("y") <= hi_b)
    )
    got = sorted(
        tuple(r)
        for r in t.read_pruned(spark, lo_a, hi_a, lo_b, hi_b)
                  .filter(pred).collect()
    )
    want = sorted(tuple(r) for r in df.filter(pred).collect())
    assert got == want and len(want) == 11 * 16


def test_zorder_prunes_both_dimensions(spark, root):
    """On a z-ordered grid, a small rectangle on EITHER axis (or both)
    skips most files; on an x-sorted layout the y-only predicate reads
    everything.  This asymmetry is the whole point of the curve."""
    df = _grid(spark)
    zt = ZOrderedTable(root + "/z", "x", "y", bits=8)
    zt.write(df, n_files=16)

    # 1-column-sorted baseline: a plain x-range layout with true per-file
    # stats written in the same manifest format
    import json
    import os

    st2 = ZOrderedTable(root + "/s", "x", "y", bits=8)
    os.makedirs(root + "/s", exist_ok=True)
    lin2 = (df.repartitionByRange(16, "x")
              .withColumn("_fid", F.spark_partition_id()).localCheckpoint())
    stats = lin2.groupBy("_fid").agg(
        F.min("x").alias("min_a"), F.max("x").alias("max_a"),
        F.min("y").alias("min_b"), F.max("y").alias("max_b"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()
    lin2.write.partitionBy("_fid").mode("overwrite").parquet(
        root + "/s/data")
    with open(root + "/s/zorder_manifest.json", "w") as f:
        json.dump({"col_a": "x", "col_b": "y", "bits": 8, "files": {
            str(r["_fid"]): {k: r[k] for k in
                             ("min_a", "max_a", "min_b", "max_b", "rows")}
            for r in stats}}, f)

    total = zt.n_files()
    assert total == 16 and st2.n_files() == 16

    # rectangle on both axes: z-order reads a small corner
    z_both = len(zt.prune(0, 15, 0, 15))
    assert z_both <= 4

    # y-only band: z-order still prunes; x-sorted layout reads ALL files
    z_y = len(zt.prune(None, None, 0, 15))
    s_y = len(st2.prune(None, None, 0, 15))
    assert s_y == 16
    assert z_y <= total // 2

    # x-only band: both layouts prune (sorted is better here — that's fine)
    z_x = len(zt.prune(0, 15, None, None))
    assert z_x <= total // 2


def test_empty_rectangle_reads_nothing(spark, root):
    t = ZOrderedTable(root, "x", "y", bits=8)
    t.write(_grid(spark, n=16), n_files=4)
    out = t.read_pruned(spark, 1000, 2000, None, None)
    assert out.count() == 0
