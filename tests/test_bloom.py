"""Bloom-filter semi-join pruning (operators/bloom.py).

The contract that matters at 100 TB: the filter is a pure physical
rewrite (zero false negatives, false positives killed by the real
join), it merges associatively so per-partition builds compose, and
the probe lives in the fact-side scan filter — not in a join or a
Python UDF.
"""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.bloom import (
    bloom_build,
    bloom_collect,
    bloom_merge,
    bloom_might_contain,
    bloom_prune,
    bloom_word_rows,
)

N_BITS = 2**14


@pytest.fixture(scope="module")
def dim(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey")
    )


def test_no_false_negatives(spark, dim):
    """Every key that went into the build passes the probe."""
    words = bloom_build(dim, "o_orderkey", n_bits=N_BITS)
    n = dim.count()
    n_pass = dim.where(
        bloom_might_contain(F.col("o_orderkey"), words, N_BITS)
    ).count()
    assert n_pass == n


def test_false_positive_rate_bounded(spark, dim):
    """Keys shifted out of the dim's key space mostly fail the probe.
    Geometry: ~214 keys at sf0.001 into 2^14 bits, k=5 -> FPR well
    under 1%; assert a loose 5% so the test never flakes."""
    words = bloom_build(dim, "o_orderkey", n_bits=N_BITS)
    absent = dim.select((F.col("o_orderkey") + 10**12).alias("k"))
    n = absent.count()
    n_fp = absent.where(bloom_might_contain(F.col("k"), words, N_BITS)).count()
    assert n_fp / n < 0.05


def test_merge_equals_whole_build(spark, dim):
    """OR-merge of two half builds == one whole build (the mergeable-
    sketch property that makes per-partition/per-day builds compose)."""
    h1 = dim.where(F.col("o_orderkey") % 2 == 0)
    h2 = dim.where(F.col("o_orderkey") % 2 == 1)
    whole = bloom_build(dim, "o_orderkey", n_bits=N_BITS)
    merged = bloom_merge(
        bloom_build(h1, "o_orderkey", n_bits=N_BITS),
        bloom_build(h2, "o_orderkey", n_bits=N_BITS),
    )
    assert merged == whole


def test_prune_is_transparent_to_join(spark, sf_dir, dim):
    """bloom_prune(fact) |><| dim == fact |><| dim, row for row."""
    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    words = bloom_build(dim, "o_orderkey", n_bits=N_BITS)
    plain = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
    pruned = bloom_prune(fact, "l_orderkey", words, n_bits=N_BITS).join(
        dim, F.col("l_orderkey") == dim["o_orderkey"]
    )
    assert pruned.count() == plain.count()
    # and the filter actually removed fact rows before the join
    assert (
        bloom_prune(fact, "l_orderkey", words, n_bits=N_BITS).count()
        < fact.count()
    )


def test_word_rows_bounded_by_geometry(spark, dim):
    """The collected artifact is capped by n_bits/64 regardless of the
    input row count — the bounded-collect rule."""
    rows = bloom_word_rows(dim, "o_orderkey", n_bits=N_BITS)
    assert rows.count() <= N_BITS // 64
    words = bloom_collect(rows, N_BITS)
    assert len(words) == N_BITS // 64


def test_probe_is_scan_side_filter(spark, sf_dir, dim):
    """The probe compiles to a Filter in the fact branch (xxhash64 in
    the filter condition) — not a join, not a Python eval."""
    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    words = bloom_build(dim, "o_orderkey", n_bits=N_BITS)
    plan = (
        bloom_prune(fact, "l_orderkey", words, n_bits=N_BITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "Filter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geometry_validation():
    with pytest.raises(ValueError):
        bloom_merge([0] * 4, [0] * 8)
    with pytest.raises(ValueError):
        bloom_might_contain(F.lit(1), [0] * 2, 2**23 * 8)  # over literal cap
    with pytest.raises(ValueError):
        bloom_might_contain(F.lit(1), [0] * 2, N_BITS)  # wrong word count
