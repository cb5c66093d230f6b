"""SPARQL 1.1 Update (operators/sparql_update.py): functional semantics
against hand-checked graphs, parse-rejection discipline, and the
snapshot-store copy-on-write path (atomic single-commit, time travel,
partition granularity)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.sparql_update import (
    apply_update,
    parse_sparql_update,
    sparql_update,
)

G = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "age", "5"),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(G, "subj string, pred string, obj string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# functional form
# ---------------------------------------------------------------------------


def test_insert_data(g):
    out = sparql_update(g, "INSERT DATA { d knows e . e age '7' }")
    assert _rows(out) == sorted(G + [("d", "knows", "e"), ("e", "age", "7")])


def test_insert_existing_is_noop(g):
    out = sparql_update(g, "INSERT DATA { a knows b }")
    assert _rows(out) == sorted(G)


def test_delete_data(g):
    out = sparql_update(g, "DELETE DATA { a knows b }")
    assert _rows(out) == [("a", "age", "5"), ("b", "knows", "c")]
    # deleting an absent triple is a no-op
    out = sparql_update(g, "DELETE DATA { zz zz zz }")
    assert _rows(out) == sorted(G)


def test_delete_where_pattern(g):
    out = sparql_update(g, "DELETE WHERE { ?s knows ?o }")
    assert _rows(out) == [("a", "age", "5")]


def test_modify_with_filter(g):
    out = sparql_update(
        g, "DELETE { ?s knows ?o } INSERT { ?s knew ?o } "
           "WHERE { ?s knows ?o . FILTER(?s = 'a') }")
    assert _rows(out) == [("a", "age", "5"), ("a", "knew", "b"),
                          ("b", "knows", "c")]


def test_insert_sees_original_graph(g):
    # both D and I evaluate against the ORIGINAL graph — the inverse
    # edges come from rows the same request deletes
    out = sparql_update(
        g, "DELETE { ?s knows ?o } INSERT { ?o knownBy ?s } "
           "WHERE { ?s knows ?o }")
    assert _rows(out) == [("a", "age", "5"), ("b", "knownBy", "a"),
                          ("c", "knownBy", "b")]


def test_extra_columns_survive_and_inserts_get_null(spark):
    g2 = spark.createDataFrame(
        [("a", "knows", "b", 0.9)],
        "subj string, pred string, obj string, conf double")
    out = sparql_update(g2, "INSERT DATA { x y z }")
    got = {tuple(r) for r in out.collect()}
    assert got == {("a", "knows", "b", 0.9), ("x", "y", "z", None)}


def test_prefix_expansion(g, spark):
    g3 = spark.createDataFrame(
        [("http://ex.org/a", "knows", "b")],
        "subj string, pred string, obj string")
    out = sparql_update(
        g3, "PREFIX ex: <http://ex.org/> DELETE WHERE { ex:a knows ?o }")
    assert out.count() == 0


def test_insert_unbound_optional_var_instantiates_nothing(g):
    # CONSTRUCT rule inherited: solutions where the template var is
    # unbound (OPTIONAL miss) stamp no triple
    out = sparql_update(
        g, "INSERT { ?s aged ?v } WHERE { ?s knows ?o . "
           "OPTIONAL { ?s age ?v } }")
    assert sorted(_rows(out)) == sorted(G + [("a", "aged", "5")])


def test_parse_rejections(g):
    for bad, why in [
        ("INSERT DATA { ?s knows b }", "variable in DATA"),
        ("DELETE DATA { a knows+ b }", "path in template"),
        ("DELETE WHERE { ?s knows ?o . FILTER(?s = 'a') }",
         "keyword in DELETE WHERE"),
        ("INSERT { ?x foo ?y } WHERE { ?s knows ?o }",
         "unbound template var"),
        ("DELETE { ?s !knows ?o } WHERE { ?s ?p ?o }",
         "negated set in template"),
        ("SELECT ?s WHERE { ?s ?p ?o }", "not an update"),
        ("INSERT DATA { }", "empty"),
    ]:
        with pytest.raises(ValueError):
            parse_sparql_update(bad), why


# ---------------------------------------------------------------------------
# snapshot-store copy-on-write path
# ---------------------------------------------------------------------------


@pytest.fixture()
def store(spark, tmp_path):
    from logset_spark.sources.snapshots import SnapshotTableIO

    st = SnapshotTableIO(root=str(tmp_path / "triples"), n_buckets=4)
    rows = [
        (f"conv:c{i}", "hasTurn", f"turn:c{i}/0", f"c{i}", 0,
         f"2025-01-0{1 + i % 3} 00:00:00", 1.0)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, conv_id string, "
              "turn_idx int, ts string, conf double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    st.commit(df)
    return st


def _mapping(st):
    return st._load_snapshot(st.current_version())["mapping"]


def test_store_modify_is_one_atomic_commit(spark, store):
    v, n_del, n_ins = apply_update(
        store, spark,
        "DELETE { ?c hasTurn ?t } INSERT { ?c hadTurn ?t } "
        "WHERE { ?c hasTurn ?t . FILTER(regex(?c, 'conv:c1$')) }")
    assert (v, n_del, n_ins) == (2, 1, 1)
    cur = store.read(spark)
    got = {(r["pred"], r["count"])
           for r in cur.groupBy("pred").count().collect()}
    assert got == {("hasTurn", 11), ("hadTurn", 1)}
    # time travel: v1 still answers with the pre-update graph
    v1 = store.read(spark, version=1)
    assert v1.where(F.col("pred") == "hadTurn").count() == 0
    assert v1.count() == 12


def test_store_untouched_partitions_keep_their_commit(spark, store):
    before = _mapping(store)
    apply_update(
        store, spark,
        "DELETE WHERE { conv:c1 hasTurn ?t }")
    after = _mapping(store)
    changed = {k for k in before if after.get(k) != before[k]}
    # conv:c1 lives in exactly one (day, bucket) partition — only that
    # mapping entry may move to the new commit
    assert len(changed) == 1
    kept = {k for k in before if after.get(k) == before[k]}
    assert kept == set(before) - changed


def test_store_insert_only_appends_new_partition(spark, store):
    v, n_del, n_ins = apply_update(
        store, spark, "INSERT DATA { conv:zz hasTag 'gold' }",
        insert_ts="2025-02-01 00:00:00")
    assert (n_del, n_ins) == (0, 1)
    cur = store.read(spark)
    assert cur.count() == 13
    row = cur.where(F.col("pred") == "hasTag").collect()[0]
    assert (row["subj"], row["obj"], row["conv_id"]) == \
        ("conv:zz", "gold", "zz")


def test_store_insert_into_existing_partition_keeps_rows(spark, store):
    # the inserted triple lands in an EXISTING partition (same conv/ts
    # as conv:c0's rows): the CoW rewrite must carry that partition's
    # current rows along, not repoint it to only the new file
    day0 = store.read(spark).where(F.col("conv_id") == "c0") \
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")) \
        .collect()[0][0]
    v, _, n_ins = apply_update(
        store, spark, "INSERT DATA { conv:c0 hasTag 'gold' }",
        insert_conv=F.lit("c0"), insert_ts=day0)
    assert n_ins == 1
    cur = store.read(spark)
    assert cur.count() == 13
    assert cur.where(F.col("conv_id") == "c0").count() == 2


def test_store_noop_keeps_version(spark, store):
    v0 = store.current_version()
    v, n_del, n_ins = apply_update(
        store, spark, "DELETE DATA { nosuch p q }")
    assert (v, n_del, n_ins) == (v0, 0, 0)


def test_store_delete_can_empty_a_partition(spark, store):
    # delete EVERYTHING — every partition empties; reads must show none
    v, n_del, _ = apply_update(store, spark, "DELETE WHERE { ?s ?p ?o }")
    assert n_del == 12
    # the fully-emptied partitions are DROPPED from the mapping (the
    # replaced_partitions contract) — and an empty table is a VALID
    # state: read() serves a 0-row frame with the ancestor's schema
    assert _mapping(store) == {}
    out = store.read(spark)
    assert out.count() == 0
    assert "subj" in out.columns


def test_cow_update_empty_table_rejected(spark, tmp_path):
    from logset_spark.sources.snapshots import SnapshotTableIO

    st = SnapshotTableIO(root=str(tmp_path / "t2"), n_buckets=2)
    with pytest.raises(ValueError):
        st.cow_update(spark, deletes=None, inserts=None)


# ---------------------------------------------------------------------------
# graph management (CLEAR/DROP/CREATE/COPY/MOVE/ADD/LOAD)
# ---------------------------------------------------------------------------

QG = [
    ("s1", "p", "o1", "g1"),
    ("s2", "p", "o2", "g2"),
    ("s3", "p", "o3", "g2"),
    ("d1", "p", "od", None),  # default graph = NULL rows
]


@pytest.fixture()
def quads(spark):
    return spark.createDataFrame(
        QG, "subj string, pred string, obj string, graph string")


def _q(df):
    return sorted(((r["subj"], r["graph"]) for r in df.collect()),
                  key=lambda t: (t[0], t[1] or ""))


def test_clear_and_drop_targets(quads):
    from logset_spark.operators.sparql_update import graph_update

    assert _q(graph_update(quads, "CLEAR GRAPH g2")) == [
        ("d1", None), ("s1", "g1")]
    assert _q(graph_update(quads, "DROP g1")) == [
        ("d1", None), ("s2", "g2"), ("s3", "g2")]
    assert _q(graph_update(quads, "CLEAR DEFAULT")) == [
        ("s1", "g1"), ("s2", "g2"), ("s3", "g2")]
    assert _q(graph_update(quads, "CLEAR NAMED")) == [("d1", None)]
    assert graph_update(quads, "CLEAR ALL").count() == 0
    # absent graph: loud without SILENT, no-op with
    with pytest.raises(ValueError, match="no rows"):
        graph_update(quads, "CLEAR GRAPH nope")
    assert _q(graph_update(quads, "CLEAR SILENT GRAPH nope")) == _q(quads)


def test_copy_move_add_semantics(quads):
    from logset_spark.operators.sparql_update import graph_update

    # COPY replaces the destination and keeps the source
    got = graph_update(quads, "COPY GRAPH g2 TO GRAPH g1")
    assert _q(got) == [("d1", None), ("s2", "g1"), ("s2", "g2"),
                       ("s3", "g1"), ("s3", "g2")]
    # MOVE replaces the destination and drops the source
    got = graph_update(quads, "MOVE g2 TO g1")
    assert _q(got) == [("d1", None), ("s2", "g1"), ("s3", "g1")]
    # ADD merges (set semantics) without touching the destination's rows
    got = graph_update(quads, "ADD GRAPH g1 TO GRAPH g2")
    assert _q(got) == [("d1", None), ("s1", "g1"), ("s1", "g2"),
                       ("s2", "g2"), ("s3", "g2")]
    # DEFAULT as operand; same-graph ops are no-ops
    got = graph_update(quads, "COPY DEFAULT TO GRAPH gx")
    assert ("d1", "gx") in _q(got) and ("d1", None) in _q(got)
    assert _q(graph_update(quads, "MOVE g1 TO g1")) == _q(quads)
    # ADD is idempotent: re-adding already-present triples changes nothing
    once = graph_update(quads, "ADD g1 TO g2")
    twice = graph_update(once, "ADD g1 TO g2")
    assert _q(once) == _q(twice)


def test_create_and_rejections(quads):
    from logset_spark.operators.sparql_update import graph_update

    assert _q(graph_update(quads, "CREATE GRAPH gnew")) == _q(quads)
    with pytest.raises(ValueError, match="exists"):
        graph_update(quads, "CREATE GRAPH g1")
    assert _q(graph_update(quads, "CREATE SILENT GRAPH g1")) == _q(quads)
    with pytest.raises(ValueError, match="trailing"):
        graph_update(quads, "CLEAR GRAPH g1 junk")
    with pytest.raises(ValueError, match="TO"):
        graph_update(quads, "COPY g1 g2")
    with pytest.raises(ValueError, match="quads frame"):
        graph_update(quads.drop("graph"), "CLEAR ALL")
    with pytest.raises(ValueError, match="unknown graph-management"):
        graph_update(quads, "FROB g1")


def test_load_turtle_into_graph(quads, tmp_path):
    from logset_spark.operators.sparql_update import (
        graph_update, is_graph_management)

    ttl = tmp_path / "in.ttl"
    ttl.write_text("@prefix ex: <http://x.org/> .\n"
                   "ex:n1 ex:p ex:n2 ; ex:q ex:n3 .\n")
    got = graph_update(quads, f"LOAD <file://{ttl}> INTO GRAPH gload")
    loaded = got.filter(F.col("graph") == "gload")
    assert loaded.count() == 2
    assert got.count() == quads.count() + 2
    # into the default graph when INTO is omitted
    got = graph_update(quads, f"LOAD <file://{ttl}>")
    assert got.filter(F.col("graph").isNull()).count() == 3  # d1 + 2
    # missing file: loud unless SILENT
    with pytest.raises(Exception):
        graph_update(quads, "LOAD <file:///nope/missing.ttl>")
    assert graph_update(
        quads, "LOAD SILENT <file:///nope/missing.ttl>"
    ).count() == quads.count()
    assert is_graph_management("CLEAR ALL")
    assert not is_graph_management("INSERT DATA { a b c }")


def test_load_trig_preserves_graph_attribution(quads, tmp_path):
    from logset_spark.operators.sparql_update import graph_update

    f = tmp_path / "in.trig"
    f.write_text('n1 p n2 .\nGRAPH gt { n3 p n4 . }\n')
    got = graph_update(quads, f"LOAD <file://{f}>")
    rows = {(r["subj"], r["graph"]) for r in got.collect()}
    assert ("n1", None) in rows and ("n3", "gt") in rows
    # INTO GRAPH overrides the source's own attribution
    got = graph_update(quads, f"LOAD <file://{f}> INTO GRAPH gx")
    rows = {(r["subj"], r["graph"]) for r in got.collect()}
    assert ("n1", "gx") in rows and ("n3", "gx") in rows and ("n3", "gt") not in rows


def test_update_comments_stripped():
    from logset_spark.operators.sparql_update import parse_sparql_update

    pu = parse_sparql_update(
        """# retire the old tool edge
        DELETE WHERE { ?t usedTool tool:x }  # shorthand form"""
    )
    assert pu.delete_tmpl == [("?t", "usedTool", "tool:x")]


def test_load_ntriples_and_nquads(quads, tmp_path):
    from logset_spark.operators.sparql_update import graph_update

    nt = tmp_path / "in.nt"
    nt.write_text("<http://x.org/n1> <http://x.org/p> <http://x.org/n2> .\n"
                  '<http://x.org/n1> <http://x.org/q> "v" .\n')
    got = graph_update(quads, f"LOAD <file://{nt}> INTO GRAPH gnt")
    assert got.filter(F.col("graph") == "gnt").count() == 2

    nq = tmp_path / "in.nq"
    nq.write_text("<http://x.org/a> <http://x.org/p> <http://x.org/b> "
                  "<http://x.org/gq> .\n"
                  '<http://x.org/a> <http://x.org/p> "dg" .\n')
    before_default = quads.filter(F.col("graph").isNull()).count()
    got = graph_update(quads, f"LOAD <file://{nq}>")
    # quads source carries its own graph attribution
    assert got.filter(F.col("graph") == "http://x.org/gq").count() == 1
    # a default-graph .nq statement must land in the store's default
    # graph (graph IS NULL), never a phantom ''-named graph
    assert got.filter(F.col("graph").isNull()).count() == before_default + 1
    assert got.filter(F.col("graph") == "").count() == 0

    # malformed line -> strict LOAD fails loudly, SILENT swallows
    badf = tmp_path / "bad.nt"
    badf.write_text("<http://x.org/n1> <http://x.org/p> missing-type .\n")
    with pytest.raises(Exception, match="malformed"):
        graph_update(quads, f"LOAD <file://{badf}>")
    assert graph_update(
        quads, f"LOAD SILENT <file://{badf}>"
    ).count() == quads.count()


def test_semicolon_sequence_applies_left_to_right(spark):
    """SPARQL 1.1 request = ';'-sequence of operations, each seeing the
    previous one's output; leading PREFIX headers stay in effect for
    the whole request (round-4 sweep: used to reject cryptically)."""
    from logset_spark.operators.sparql_update import sparql_update

    g = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")],
        "subj string, pred string, obj string")
    out = sparql_update(
        g,
        "PREFIX ex: <http://x.org/> "
        "INSERT DATA { ex:n1 ex:p ex:n2 } ; "
        "DELETE DATA { <a> <p> <b> } ; "
        "DELETE { ?s <p> ?o } INSERT { ?s ex:p2 ?o } WHERE { ?s <p> ?o }")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("b", "http://x.org/p2", "c"),
        ("http://x.org/n1", "http://x.org/p", "http://x.org/n2"),
    ]


def test_semicolon_inside_literal_and_body_never_splits(spark):
    from logset_spark.operators.sparql_update import sparql_update

    g = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string")
    out = sparql_update(
        g, "INSERT DATA { <n> <p> 'x;y' . <n> <q> <m> }")
    got = sorted(tuple(r) for r in out.collect())
    assert ("n", "p", "x;y") in got and ("n", "q", "m") in got


def test_snapshot_store_rejects_sequences_loudly(spark, tmp_path):
    import pytest

    from logset_spark.operators.sparql_update import apply_update
    from logset_spark.sources.snapshots import SnapshotTableIO

    store = SnapshotTableIO(root=str(tmp_path / "st"), n_buckets=2)
    with pytest.raises(ValueError, match="separate apply_update"):
        apply_update(store, spark,
                     "INSERT DATA { <a> <p> <b> } ; CLEAR ALL")


def test_insert_delete_data_a_keyword_is_rdf_type(spark):
    """`a` in verb position means rdf:type in DATA forms too (round-4
    sweep: INSERT DATA stored the literal predicate 'a')."""
    from logset_spark.operators.sparql_update import sparql_update

    g = spark.createDataFrame(
        [("dog", "rdf:type", "Dog")], "subj string, pred string, obj string")
    out = sparql_update(g, "INSERT DATA { cat a Cat }")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("cat", "rdf:type", "Cat"), ("dog", "rdf:type", "Dog")]
    out2 = sparql_update(out, "DELETE DATA { dog a Dog }")
    assert sorted(tuple(r) for r in out2.collect()) == [
        ("cat", "rdf:type", "Cat")]


def test_prefix_declared_mid_sequence_persists(spark):
    """ADVICE r04 / SPARQL 1.1: a PREFIX declared by a LATER operation
    of a ';'-sequence stays in effect for subsequent operations, and a
    re-declaration overrides the earlier binding from that point on."""
    from logset_spark.operators.sparql_update import sparql_update

    g = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string")
    out = sparql_update(
        g,
        "PREFIX a: <http://one/> INSERT DATA { a:x <p> 'v1' } ; "
        "PREFIX b: <http://two/> INSERT DATA { b:y <p> 'v2' } ; "
        "INSERT DATA { a:z <p> 'v3' . b:w <p> 'v4' } ; "
        "PREFIX a: <http://redefined/> INSERT DATA { a:q <p> 'v5' }",
    )
    subs = {r["subj"] for r in out.collect()}
    assert "http://one/x" in subs          # first header works
    assert "http://two/y" in subs          # later header works
    assert "http://one/z" in subs          # first header persists to op 3
    assert "http://two/w" in subs          # later header persists to op 3
    assert "http://redefined/q" in subs    # re-declaration overrides
