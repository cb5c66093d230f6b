"""Motif finding (operators/motif.py): pattern parse, join lowering,
unification, negation, and the guard rails.

The reference answered these structural questions by in-memory rdflib
traversal; here every motif is a Catalyst join chain, so the tests pin
the SEMANTICS (GraphFrames-documented behavior) on a small directed
graph with known morphism counts.
"""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.motif import _parse_pattern, find_motifs


@pytest.fixture(scope="module")
def edges(spark):
    #   a -> b -> c -> a   (3-cycle)
    #   a -> c             (chord)
    #   d -> d             (self loop)
    #   e                  (isolated: appears only as src of e->b)
    #   e -> b
    rows = [
        ("a", "b", "x"),
        ("b", "c", "y"),
        ("c", "a", "x"),
        ("a", "c", "z"),
        ("d", "d", "x"),
        ("e", "b", "y"),
    ]
    return spark.createDataFrame(rows, "src string, dst string, pred string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- parse


def test_parse_basic():
    t = _parse_pattern("(a)-[e]->(b); (b)-[]->(c)")
    assert t == [(False, "a", "e", "b"), (False, "b", None, "c")]


def test_parse_anonymous_vertex_gets_fresh_name():
    t = _parse_pattern("(a)-[]->(); (a)-[]->()")
    assert t[0][3] != t[1][3]  # distinct existentials
    assert t[0][3].startswith("__")


def test_parse_rejects_garbage_and_duplicates():
    with pytest.raises(ValueError, match="unparseable"):
        _parse_pattern("(a)->[e]->(b)")
    with pytest.raises(ValueError, match="duplicate edge names"):
        _parse_pattern("(a)-[e]->(b); (b)-[e]->(c)")
    with pytest.raises(ValueError, match="negated edge cannot be named"):
        _parse_pattern("!(a)-[e]->(b)")
    with pytest.raises(ValueError, match="reserved"):
        _parse_pattern("(__v1)-[]->(b)")
    with pytest.raises(ValueError, match="empty motif"):
        _parse_pattern("  ;  ")


# -------------------------------------------------------------- matching


def test_single_edge_projects_named_edge_columns(edges):
    out = find_motifs(edges, "(u)-[e]->(v)")
    assert out.columns == ["u", "v", "e_pred"]
    assert out.count() == 6


def test_two_hop_chain(edges):
    out = find_motifs(edges, "(a)-[]->(b); (b)-[]->(c)")
    # chains: a>b>c, b>c>a, c>a>b, c>a>c, a>c>a, e>b>c, d>d>d — count them
    got = rows(out)
    assert ("a", "b", "c") in got
    assert ("d", "d", "d") in got  # self-loop chains through itself
    assert len(got) == 7


def test_triangle_by_unification(edges):
    out = find_motifs(edges, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    got = rows(out)
    # the 3-cycle in each rotation + the self-loop degenerate triangle
    assert ("a", "b", "c") in got and ("b", "c", "a") in got
    assert ("d", "d", "d") in got


def test_self_loop_pattern(edges):
    out = find_motifs(edges, "(a)-[e]->(a)")
    assert rows(out) == [("d", "x")]


def test_mutual_pairs(edges):
    out = find_motifs(edges, "(a)-[]->(b); (b)-[]->(a)").where(
        F.col("a") != F.col("b")
    )
    assert rows(out) == [("a", "c"), ("c", "a")]


def test_negation_filters(edges):
    # a->b->c where NO chord a->c: kills (a,b,c) [chord a->c exists]
    # and (d,d,d) [self loop a->c IS d->d]; keeps the other 5 chains.
    out = find_motifs(edges, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = rows(out)
    assert ("a", "b", "c") not in got
    assert ("b", "c", "a") in got
    assert len(got) == 5


def test_negated_self_loop(edges):
    out = find_motifs(edges, "(a)-[]->(b); !(a)-[]->(a)")
    # drops rows where a==d (d has a self loop); a->b rows from d: (d,d)
    assert all(r[0] != "d" for r in rows(out))
    assert out.count() == 5


def test_anonymous_vertex_is_existential(edges):
    out = find_motifs(edges, "(a)-[]->()")
    # one row per EDGE (bag semantics over morphisms), projected to a
    assert out.columns == ["a"]
    assert out.count() == 6


def test_negation_needs_bound_endpoints(edges):
    with pytest.raises(ValueError, match="not bound"):
        find_motifs(edges, "(a)-[]->(b); !(a)-[]->(c)")


def test_disconnected_rejected_unless_opted_in(edges):
    with pytest.raises(ValueError, match="cross join"):
        find_motifs(edges, "(a)-[]->(b); (c)-[]->(d)")
    n = find_motifs(
        edges, "(a)-[]->(b); (c)-[]->(d)", allow_cartesian=True
    ).count()
    assert n == 36


def test_needs_src_dst(spark):
    df = spark.createDataFrame([("a", "b")], "u string, v string")
    with pytest.raises(ValueError, match="src/dst"):
        find_motifs(df, "(a)-[]->(b)")


def test_oracle_query_matches_duckdb(spark, sf_dir):
    """q_motif vs its SQL oracle at sf0.001 — same gate the driver runs."""
    import duckdb

    from logset_spark.queries import SQL_MOTIF, q_motif

    got = rows(q_motif(spark, sf_dir))
    con = duckdb.connect()
    for t in ("supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(tuple(r) for r in con.execute(SQL_MOTIF).fetchall())
    assert got == want and len(got) > 0
