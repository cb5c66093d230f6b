"""IncrementalAggView — maintained == recomputed, delta-proportional
rewrites, crash-atomic publish."""

import json
import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.matview import IncrementalAggView
from logset_spark.sources.snapshots import SnapshotTableIO


@pytest.fixture()
def roots():
    base = tempfile.mkdtemp(prefix="logset_mv_base_")
    view = tempfile.mkdtemp(prefix="logset_mv_view_")
    yield base, view
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, etype string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _rows(n, day_mod=2, etypes=("a", "b", "c")):
    return [
        (f"c{i % 7}", i, f"2024-03-0{1 + i % day_mod} 01:00:00",
         etypes[i % len(etypes)])
        for i in range(n)
    ]


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _recomputed(spark, store, view):
    full = store.read(spark).groupBy(*view.group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in view.sum_cols],
    )
    return _sorted(full)


def test_full_then_incremental_matches_recompute(spark, roots):
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    view = IncrementalAggView(view_root, group_cols=["etype"],
                              sum_cols=["turn_idx"], n_buckets=4)
    store.commit(_frame(spark, _rows(30)))
    r = view.refresh(spark, store)
    assert r["mode"] == "full"
    assert _sorted(view.read(spark)) == _recomputed(spark, store, view)

    # append new rows (new groups too), then overwrite one day
    store.commit(
        _frame(spark, [(f"x{i}", 1000 + i, "2024-03-01 02:00:00", "d")
                       for i in range(5)]),
        mode="append",
    )
    upd = store.read(spark).filter(
        F.to_date("ts") == F.lit("2024-03-02")
    ).withColumn("etype", F.lit("edited"))
    store.commit(upd.select("conv_id", "turn_idx", "ts", "etype"))
    r = view.refresh(spark, store)
    assert r["mode"] == "incremental" and r["buckets_rewritten"] >= 1
    assert _sorted(view.read(spark)) == _recomputed(spark, store, view)


def test_noop_and_delete_to_empty_group(spark, roots):
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    view = IncrementalAggView(view_root, group_cols=["etype"],
                              sum_cols=[], n_buckets=2)
    store.commit(_frame(spark, _rows(12)))
    view.refresh(spark, store)
    # no new base version -> noop, nothing rewritten
    assert view.refresh(spark, store)["mode"] == "noop"
    # delete every row of one group -> the group must VANISH from the view
    store.delete_where(spark, F.col("etype") == "a")
    view.refresh(spark, store)
    got = _sorted(view.read(spark))
    assert got == _recomputed(spark, store, view)
    assert all(r[0] != "a" for r in got)


def test_untouched_buckets_keep_their_commit(spark, roots):
    """Delta-proportional: a refresh whose delta touches one group must
    not rewrite the other groups' buckets (their mapping entry — hence
    their files — stays on the old commit)."""
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    # many groups spread over many buckets
    view = IncrementalAggView(view_root, group_cols=["conv_id"],
                              sum_cols=["turn_idx"], n_buckets=8)
    store.commit(_frame(spark, _rows(70)))
    view.refresh(spark, store)
    before = json.load(open(os.path.join(view_root, "view.json")))["mapping"]
    # append rows for ONE conv only
    store.commit(_frame(spark, [("c1", 9999, "2024-03-01 03:00:00", "z")]),
                 mode="append")
    r = view.refresh(spark, store)
    after = json.load(open(os.path.join(view_root, "view.json")))["mapping"]
    assert r["buckets_rewritten"] == 1
    changed = {b for b in after if after[b] != before.get(b)}
    assert len(changed) == 1
    for b in after:
        if b not in changed:
            assert after[b] == before[b]
    assert _sorted(view.read(spark)) == _recomputed(spark, store, view)


def test_randomized_commit_sequence_parity(spark, roots):
    """Randomized append/overwrite/delete sequence; after every refresh
    the maintained view equals the full recomputation."""
    base_root, view_root = roots
    rng = random.Random(41)
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    view = IncrementalAggView(view_root, group_cols=["etype"],
                              sum_cols=["turn_idx"], n_buckets=4)
    store.commit(_frame(spark, _rows(40, day_mod=2)))
    view.refresh(spark, store)
    next_id = 10_000
    for step in range(5):
        op = rng.choice(["append", "overwrite", "delete"])
        if op == "append":
            rows = [(f"c{rng.randrange(9)}", next_id + i,
                     f"2024-03-0{rng.randrange(1, 3)} 05:00:00",
                     rng.choice("abcz"))
                    for i in range(rng.randrange(1, 6))]
            next_id += 10
            store.commit(_frame(spark, rows), mode="append")
        elif op == "overwrite":
            day = f"2024-03-0{rng.randrange(1, 3)}"
            upd = store.read(spark).filter(
                F.to_date("ts") == F.lit(day)
            ).withColumn("etype", F.lit(rng.choice("abcz")))
            sel = upd.select("conv_id", "turn_idx", "ts", "etype")
            if sel.limit(1).count():
                store.commit(sel)
        else:
            store.delete_where(
                spark, F.col("turn_idx") % rng.randrange(3, 7) == 0)
        view.refresh(spark, store)
        assert _sorted(view.read(spark)) == _recomputed(spark, store, view), \
            f"divergence after step {step} ({op})"


def test_definition_mismatch_rejected(spark, roots):
    """Refreshing an existing view with different keys/buckets would
    corrupt the merge silently — it must raise instead."""
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    store.commit(_frame(spark, _rows(10)))
    IncrementalAggView(view_root, group_cols=["etype"],
                       n_buckets=4).refresh(spark, store)
    store.commit(_frame(spark, [("c9", 500, "2024-03-01 07:00:00", "a")]),
                 mode="append")
    with pytest.raises(ValueError, match="definition mismatch"):
        IncrementalAggView(view_root, group_cols=["conv_id"],
                           n_buckets=4).refresh(spark, store)
    with pytest.raises(ValueError, match="definition mismatch"):
        IncrementalAggView(view_root, group_cols=["etype"],
                           n_buckets=8).refresh(spark, store)


def test_unpublished_refresh_is_invisible_and_rerunnable(spark, roots):
    """Crash-atomicity: a refresh that wrote its commit dir but never
    published the meta (simulated by restoring the old view.json) leaves
    readers on the old view; re-running the refresh converges."""
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    view = IncrementalAggView(view_root, group_cols=["etype"],
                              sum_cols=["turn_idx"], n_buckets=2)
    store.commit(_frame(spark, _rows(20)))
    view.refresh(spark, store)
    meta_path = os.path.join(view_root, "view.json")
    old_meta = open(meta_path).read()
    old_view = _sorted(view.read(spark))

    store.commit(_frame(spark, [("c0", 777, "2024-03-01 06:00:00", "zz")]),
                 mode="append")
    view.refresh(spark, store)
    # simulate crash-before-publish: the data files exist, meta does not
    with open(meta_path, "w") as f:
        f.write(old_meta)
    assert _sorted(view.read(spark)) == old_view  # reader unaffected
    view.refresh(spark, store)  # re-run converges
    assert _sorted(view.read(spark)) == _recomputed(spark, store, view)


def test_null_group_keys_merge_correctly(spark, roots):
    """Regression: the stored-view/delta merge joined group keys with
    null-UNSAFE equality, so a NULL-keyed group could never match its
    own stored row — deletes raised the spurious negative-count error
    and inserts split the group into duplicate rows."""
    base_root, view_root = roots
    store = SnapshotTableIO(root=base_root, n_buckets=4)
    view = IncrementalAggView(view_root, group_cols=["etype"],
                              sum_cols=["turn_idx"], n_buckets=4)
    def _s(df):  # None-safe sort for rows with NULL group keys
        return sorted((tuple(r) for r in df.collect()),
                      key=lambda t: tuple((v is None, v) for v in t))

    rows = _frame(spark, _rows(12)).withColumn(
        "etype",
        F.when(F.col("etype") == "a", F.lit(None).cast("string"))
        .otherwise(F.col("etype")),
    )
    store.commit(rows)
    view.refresh(spark, store)
    assert _s(view.read(spark)) == _s(
        store.read(spark).groupBy("etype").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("turn_idx").alias("sum_turn_idx")))

    # delete SOME null-group rows -> the NULL group must merge, not error
    store.delete_where(spark, "etype IS NULL AND turn_idx < 5")
    r = view.refresh(spark, store)
    assert r["mode"] == "incremental"
    assert _s(view.read(spark)) == _s(
        store.read(spark).groupBy("etype").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("turn_idx").alias("sum_turn_idx")))

    # add more null-group rows -> still ONE null-key row in the view
    store.commit(
        _frame(spark, [("cz", 99, "2024-03-01 03:00:00", "zz")])
        .withColumn("etype", F.lit(None).cast("string")),
        mode="append",
    )
    view.refresh(spark, store)
    out = view.read(spark)
    assert out.where(F.col("etype").isNull()).count() == 1
    assert _s(out) == _s(
        store.read(spark).groupBy("etype").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("turn_idx").alias("sum_turn_idx")))
