"""Blank-node skolemization via WL color refinement (operators/skolem.py).

Contracts: reload-dedup (the reason the operator exists), structural
separation of non-identical bnodes, rdflib-parity unique mode, and
label-independence (the anon counter must not leak into the output).
"""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.skolem import skolemize, wl_colors


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _rows(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


TTL = (
    "@prefix ex: <http://example.org/> .\n"
    "ex:sys ex:hasNode [ ex:rack 'r1' ; ex:slot '3' ] .\n"
    "ex:sys ex:hasNode [ ex:rack 'r2' ; ex:slot '4' ] .\n"
    "ex:sys ex:order ( ex:a ex:b ) .\n"
)


def test_reload_union_dedups_to_single_load(spark):
    """Two parses of the same catalog mint different _:anon labels; after
    skolemization the union's distinct() equals one load's distinct()."""
    from logset_spark.sources.turtle import from_turtle

    p1 = from_turtle(TTL)
    # second parse: shift the anon labels as a fresh parser instance would
    p2 = p1.copy()
    for c in ("subj", "obj"):
        p2[c] = p2[c].str.replace("_:anon-", "_:anon-99", regex=False)
    one = spark.createDataFrame(p1, "subj string, pred string, obj string")
    both = one.unionByName(
        spark.createDataFrame(p2, "subj string, pred string, obj string")
    )
    sk_one = _rows(skolemize(one, dedup=True).distinct())
    sk_both = _rows(skolemize(both, dedup=True).distinct())
    assert sk_both == sk_one
    assert len(sk_one) == one.count()  # nothing conflated within one load


def test_structural_separation(spark):
    """Bnodes with different neighborhoods keep different skolem IRIs."""
    t = _t(spark, [
        ("s", "p", "_:x"), ("_:x", "rack", "r1"),
        ("s", "p", "_:y"), ("_:y", "rack", "r2"),
    ])
    out = skolemize(t, dedup=True)
    objs = {r["obj"] for r in out.where(out["pred"] == "p").collect()}
    assert len(objs) == 2
    assert all(o.startswith("sk:") for o in objs)


def test_identical_structures_collapse(spark):
    t = _t(spark, [
        ("s1", "p", "_:x"), ("_:x", "rack", "r1"),
        ("s1", "p", "_:y"), ("_:y", "rack", "r1"),
    ])
    out = skolemize(t, dedup=True)
    objs = {r["obj"] for r in out.where(out["pred"] == "p").collect()}
    assert len(objs) == 1  # same parent, same props -> one canonical node


def test_unique_mode_never_collapses(spark):
    t = _t(spark, [
        ("s1", "p", "_:x"), ("_:x", "rack", "r1"),
        ("s1", "p", "_:y"), ("_:y", "rack", "r1"),
    ])
    out = skolemize(t, dedup=False)
    objs = {r["obj"] for r in out.where(out["pred"] == "p").collect()}
    assert len(objs) == 2


def test_default_is_rdflib_parity(spark):
    """The DEFAULT mode is rdflib Graph.skolemize parity: it never
    merges, so a single load's triple count is unchanged — two identical
    anonymous structures under one subject stay two (ADVICE r03)."""
    t = _t(spark, [
        ("s1", "p", "_:x"), ("_:x", "rack", "r1"),
        ("s1", "p", "_:y"), ("_:y", "rack", "r1"),
    ])
    out = skolemize(t)
    assert out.count() == t.count()
    assert out.distinct().count() == t.count()
    objs = {r["obj"] for r in out.where(out["pred"] == "p").collect()}
    assert len(objs) == 2 and all(o.startswith("sk:") for o in objs)


def test_labels_do_not_leak(spark):
    """Renaming every bnode label leaves the dedup-mode output
    byte-identical (the whole point: labels are graph-local noise)."""
    rows = [("s", "p", "_:a"), ("_:a", "q", "_:b"), ("_:b", "r", "v")]
    ren = [(s.replace("_:a", "_:zz").replace("_:b", "_:qq"),
            p,
            o.replace("_:a", "_:zz").replace("_:b", "_:qq"))
           for s, p, o in rows]
    assert _rows(skolemize(_t(spark, rows), dedup=True)) == _rows(
        skolemize(_t(spark, ren), dedup=True))


def test_nested_depth_needs_rounds(spark):
    """Two 2-deep chains differing only at the far end: 1 round cannot
    separate the near bnodes, 2 rounds can — pinning the k-hop rule."""
    t = _t(spark, [
        ("s", "p", "_:n1"), ("_:n1", "q", "_:d1"), ("_:d1", "leaf", "A"),
        ("s", "p", "_:n2"), ("_:n2", "q", "_:d2"), ("_:d2", "leaf", "B"),
    ])
    near1 = wl_colors(t, rounds=1)
    got1 = {r["color"] for r in near1.where(
        F.col("node").isin("_:n1", "_:n2")).collect()}
    assert len(got1) == 1
    near2 = wl_colors(t, rounds=2)
    got2 = {r["color"] for r in near2.where(
        F.col("node").isin("_:n1", "_:n2")).collect()}
    assert len(got2) == 2


def test_non_bnodes_untouched_and_rounds_validated(spark):
    t = _t(spark, [("s", "p", "o")])
    assert _rows(skolemize(t)) == {("s", "p", "o")}
    with pytest.raises(ValueError):
        wl_colors(t, rounds=0)


class TestSummarize:
    def test_roles_split_by_structure_not_name(self, spark):
        from logset_spark.operators.skolem import summarize_graph

        g = _t(spark, [
            ("o1", "by", "c1"), ("o2", "by", "c1"),   # c1: 2 inbound
            ("o3", "by", "c2"),                        # c2: 1 inbound
            ("c1", "nat", "n1"), ("c2", "nat", "n1"),
        ])
        rows = summarize_graph(g, rounds=1).collect()
        by_pred = {}
        for r in rows:
            by_pred.setdefault(r["pred"], []).append(r)
        # all order nodes share one role: one summary edge for 'by' per
        # customer role (c1 and c2 differ by inbound count)
        assert len(by_pred["by"]) == 2
        assert {r["n_edges"] for r in by_pred["by"]} == {1, 2}
        # both customers point at the same nation role but are two roles
        # themselves -> two 'nat' summary edges
        assert len(by_pred["nat"]) == 2
        src_roles = {r["src_color"] for r in by_pred["nat"]}
        assert len(src_roles) == 2

    def test_summary_is_name_invariant(self, spark):
        from logset_spark.operators.skolem import summarize_graph

        g1 = _t(spark, [("a", "p", "b"), ("b", "q", "c")])
        g2 = _t(spark, [("x", "p", "y"), ("y", "q", "z")])
        s1 = {(r["src_color"], r["pred"], r["dst_color"], r["n_edges"])
              for r in summarize_graph(g1, rounds=2).collect()}
        s2 = {(r["src_color"], r["pred"], r["dst_color"], r["n_edges"])
              for r in summarize_graph(g2, rounds=2).collect()}
        assert s1 == s2
