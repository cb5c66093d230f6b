"""operators/quality.py: profiler and expectation checks on fixtures
with KNOWN violations (the sf tables are clean, so the oracle rows there
only prove the zero case — these prove the counting)."""

from __future__ import annotations

from logset_spark.operators.quality import (
    expect_complete,
    expect_references,
    expect_unique,
    profile,
    run_expectations,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "k int, s string"
    )
    got = {(r["column"], r["metric"]): r["value"] for r in
           profile(df).collect()}
    assert got[("k", "count")] == "4" and got[("k", "nulls")] == "0"
    assert got[("k", "distinct")] == "3"
    assert got[("k", "min")] == "1" and got[("k", "max")] == "3"
    assert got[("s", "count")] == "3" and got[("s", "nulls")] == "1"
    assert got[("s", "distinct")] == "2"
    assert got[("s", "min")] == "a" and got[("s", "max")] == "b"


def test_expectations_count_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 99), (3, None)], "pk int, fk int"
    )
    parent = spark.createDataFrame([(10,), (30,)], "id int")
    rep = {r["check"]: (r["violations"], r["total"]) for r in run_expectations([
        expect_unique(child, ["pk"]),
        expect_references(child, "fk", parent, "id"),
        expect_complete(child, "fk"),
    ]).collect()}
    # pk=1 occurs twice -> both rows count as violations
    assert rep["unique(pk)"] == (2, 4)
    # fk=99 has no parent; the NULL fk is not an orphan (SQL FK semantics)
    assert rep["references(fk->id)"] == (1, 4)
    assert rep["complete(fk)"] == (1, 4)


def test_expectations_clean_table_zero_violations(spark):
    child = spark.createDataFrame([(1, 10), (2, 30)], "pk int, fk int")
    parent = spark.createDataFrame([(10,), (30,)], "id int")
    rep = run_expectations([
        expect_unique(child, ["pk"]),
        expect_references(child, "fk", parent, "id"),
    ]).collect()
    assert all(r["violations"] == 0 and r["total"] == 2 for r in rep)


def test_characteristic_sets(spark):
    from logset_spark.operators.quality import characteristic_sets

    g = spark.createDataFrame(
        [("a", "p", "1"), ("a", "q", "2"), ("a", "q", "3"),
         ("b", "p", "1"), ("b", "q", "4"),
         ("c", "p", "9")],
        "subj string, pred string, obj string")
    got = {r["cs"]: (r["n_subjects"], r["n_triples"])
           for r in characteristic_sets(g).collect()}
    # a and b share shape {p,q} (a holds 3 triples, b holds 2); c is {p}
    assert got == {"p;q": (2, 5), "p": (1, 1)}


def test_count_min_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from logset_spark.operators.quality import (
        cm_estimate, cm_merge, count_min_sketch,
    )

    rows = [(f"k{i % 7}",) for i in range(100)] + [("hot",)] * 40
    df = spark.createDataFrame(rows, "key string")
    exact = {r.key: r.n for r in
             df.groupBy("key").agg(F.count("*").alias("n")).collect()}

    sk = count_min_sketch(df, "key", width=64, depth=3)
    probes = df.distinct()
    est = {r.key: r.est for r in
           cm_estimate(sk, probes, "key", width=64, depth=3).collect()}
    # the count-min guarantee: never under, and collisions bounded
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
        assert est[k] <= n + len(rows) // 64 * 3 + 5, (k, est[k], n)

    # mergeability: sketch(A) + sketch(B) == sketch(A union B), cellwise
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    merged = cm_merge(
        count_min_sketch(a, "key", width=64, depth=3),
        count_min_sketch(b, "key", width=64, depth=3),
    )
    whole = count_min_sketch(df, "key", width=64, depth=3)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_void_statistics_exact_and_approx(spark):
    from logset_spark.operators.quality import void_statistics

    t = spark.createDataFrame(
        [("s1", "p", "o1"), ("s1", "p", "o2"), ("s2", "p", "o1"),
         ("s1", "q", "o1")],
        "subj string, pred string, obj string",
    )
    exact = {r["pred"]: r for r in void_statistics(t).collect()}
    assert (exact["p"]["n_triples"], exact["p"]["n_subjects"],
            exact["p"]["n_objects"]) == (3, 2, 2)
    assert (exact["q"]["n_triples"], exact["q"]["n_subjects"],
            exact["q"]["n_objects"]) == (1, 1, 1)
    approx = {r["pred"]: r for r in
              void_statistics(t, exact=False).collect()}
    # HLL at rsd=0.02 is exact at this cardinality
    assert approx["p"]["n_subjects"] == 2 and approx["p"]["n_objects"] == 2


def test_drift_report_statuses_and_exact_boundary(spark):
    from logset_spark.operators.quality import drift_report

    old = spark.createDataFrame(
        [("a", 10), ("b", 5), ("c", 8), ("d", 10), ("e", 7)],
        "pred string, n_triples long",
    )
    new = spark.createDataFrame(
        [("a", 20), ("b", 11), ("d", 4), ("e", 3), ("f", 2)],
        "pred string, n_triples long",
    )
    got = {r["pred"]: r["status"]
           for r in drift_report(old, new).collect()}
    assert got == {
        "a": "stable",    # exactly 2x is the boundary, NOT drift
        "b": "grew",      # 5 -> 11 > 2x
        "c": "vanished",
        "d": "shrank",    # 10 -> 4 < half
        "e": "shrank",    # 7 -> 3
        "f": "appeared",
    }
