"""RDF-star: Turtle-star parse/emit, the wide annotation frame, and the
reify/unreify lowerings (operators/star.py).

The engine's rule: quoted triples NEVER become encoded string terms —
annotations are wide rows, star syntax exists only at the serialization
edges.  These tests pin the parser subset (both annotation forms, loud
rejections outside it), the distributed sink/loader round-trip, and the
columnar reify/unreify algebra."""

import pandas as pd
import pytest

from logset_spark.operators.star import (
    annotate_confidence,
    reify,
    stmt_node,
    unreify,
)
from logset_spark.sources.turtle import (
    from_turtle_star,
    load_turtle_star_dir,
    parse_trig,
    parse_turtle,
    parse_turtle_star,
    save_turtle_star,
    to_turtle_star,
)

KG = "http://example.org/kg#"


# ------------------------------------------------------------- parsing


def test_annotation_block_asserts_and_annotates():
    trips, anns, _ = parse_turtle_star(
        '<s:1> <p:x> "v" {| <conf> "0.9" ; <src> <t:1>, <t:2> ; |} .'
    )
    assert trips == [("s:1", "p:x", "v")]
    assert sorted(anns) == [
        ("s:1", "p:x", "v", "conf", "0.9"),
        ("s:1", "p:x", "v", "src", "t:1"),
        ("s:1", "p:x", "v", "src", "t:2"),
    ]


def test_subject_position_quoted_triple_is_unasserted():
    trips, anns, _ = parse_turtle_star(
        '<< <s:1> <p:x> "v" >> <conf> "0.4" ; <who> "alice" .'
    )
    assert trips == []
    assert sorted(anns) == [
        ("s:1", "p:x", "v", "conf", "0.4"),
        ("s:1", "p:x", "v", "who", "alice"),
    ]


def test_prefixes_expand_inside_star_forms():
    trips, anns, _ = parse_turtle_star(
        "@prefix kg: <http://example.org/kg#> .\n"
        '<< kg:s kg:p "v" >> kg:conf "1" .\n'
        'kg:a kg:b "w" {| kg:conf "2" |} .'
    )
    assert trips == [(f"{KG}a", f"{KG}b", "w")]
    assert (f"{KG}s", f"{KG}p", "v", f"{KG}conf", "1") in anns
    assert (f"{KG}a", f"{KG}b", "w", f"{KG}conf", "2") in anns


def test_annotation_on_object_list_member_only():
    # the {| |} binds to the immediately preceding object, not the list
    trips, anns, _ = parse_turtle_star(
        '<s> <p> "a", "b" {| <conf> "1" |}, "c" .'
    )
    assert len(trips) == 3
    assert anns == [("s", "p", "b", "conf", "1")]


@pytest.mark.parametrize(
    "doc,msg",
    [
        ('<s> <p> << <a> <b> <c> >> .', "subject position"),
        ('<< << <a> <b> <c> >> <p> "v" >> <conf> "1" .', "not allowed"),
        ('<< [ <p> "v" ] <p> "v" >> <conf> "1" .', "not allowed"),
        ('<< ( <a> ) <p> "v" >> <conf> "1" .', "not allowed"),
    ],
)
def test_outside_subset_rejected(doc, msg):
    with pytest.raises(ValueError, match=msg):
        parse_turtle_star(doc)


def test_plain_parsers_reject_star_documents():
    with pytest.raises(ValueError, match="parse_turtle_star"):
        parse_turtle('<s> <p> "v" {| <conf> "1" |} .')
    with pytest.raises(ValueError, match="TriG"):
        parse_trig('GRAPH <g> { <s> <p> "v" {| <conf> "1" |} . }')


# ------------------------------------------------- pandas emit round-trip


def test_to_from_turtle_star_roundtrip():
    trips = pd.DataFrame(
        [("conv:1", "kg:mentions", 'quo"te'), ("conv:2", "kg:tool", "grep")],
        columns=["subj", "pred", "obj"],
    )
    anns = pd.DataFrame(
        [
            ("conv:1", "kg:mentions", 'quo"te', "kg:conf", "0.9"),
            ("conv:9", "kg:mentions", "back\\slash", "kg:conf", "0.1"),
        ],
        columns=["subj", "pred", "obj", "a_pred", "a_obj"],
    )
    text = to_turtle_star(trips, anns)
    t2, a2 = from_turtle_star(text)
    assert sorted(map(tuple, t2.values.tolist())) == sorted(
        map(tuple, trips.values.tolist()))
    assert sorted(map(tuple, a2.values.tolist())) == sorted(
        map(tuple, anns.values.tolist()))


# ------------------------------------------------ distributed sink/loader


def test_save_load_turtle_star_distributed(spark, tmp_path):
    trips = spark.createDataFrame(
        [("conv:1", "kg:mentions", 'tricky "lit\twith\\stuff"')],
        "subj string, pred string, obj string",
    )
    anns = spark.createDataFrame(
        [
            ("conv:1", "kg:mentions", 'tricky "lit\twith\\stuff"',
             "kg:conf", "0.9750"),
            ("conv:2", "kg:tool", "plain", "kg:src", "conv:2-t1"),
        ],
        "subj string, pred string, obj string, a_pred string, a_obj string",
    )
    out = str(tmp_path / "star")
    save_turtle_star(trips, anns, out)
    t2, a2 = load_turtle_star_dir(spark, out)
    assert sorted(map(tuple, t2.collect())) == sorted(map(tuple,
                                                          trips.collect()))
    assert sorted(map(tuple, a2.collect())) == sorted(map(tuple,
                                                          anns.collect()))


def test_save_turtle_star_rejects_control_chars(spark, tmp_path):
    anns = spark.createDataFrame(
        [("s", "p", "o\x07bell", "a", "b")],
        "subj string, pred string, obj string, a_pred string, a_obj string",
    )
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="control characters"):
        save_turtle_star(empty, anns, str(tmp_path / "x"))


# -------------------------------------------------------- reify/unreify


@pytest.fixture()
def ann_df(spark):
    return spark.createDataFrame(
        [
            ("c:1", "kg:placed", "o:10", "kg:conf", "0.9"),
            ("c:1", "kg:placed", "o:10", "kg:src", "t:3"),
            ("c:2", "kg:placed", "o:20", "kg:conf", "0.5"),
        ],
        "subj string, pred string, obj string, a_pred string, a_obj string",
    )


def test_reify_shape(ann_df):
    out = reify(ann_df).collect()
    # 2 distinct statements * 4 skeleton legs + 3 annotation rows
    assert len(out) == 11
    nodes = {r.subj for r in out if r.pred == "rdf:subject"}
    assert len(nodes) == 2 and all(n.startswith("_:stmt-") for n in nodes)


def test_reify_is_content_addressed_and_idempotent(spark, ann_df):
    # same triple annotated in two frames -> same statement node
    other = spark.createDataFrame(
        [("c:1", "kg:placed", "o:10", "kg:extra", "x")],
        "subj string, pred string, obj string, a_pred string, a_obj string",
    )
    n1 = {r.subj for r in reify(ann_df).where("pred = 'rdf:subject' AND "
                                              "obj = 'c:1'").collect()}
    n2 = {r.subj for r in reify(other).where("pred = 'rdf:subject'")
          .collect()}
    assert n1 == n2


def test_unreify_inverts_reify(ann_df):
    back = unreify(reify(ann_df))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ann_df.collect()))


def test_unreify_tolerates_missing_type_and_ignores_strays(spark):
    node = "_:stmt-x"
    trips = spark.createDataFrame(
        [
            (node, "rdf:subject", "s"),
            (node, "rdf:predicate", "p"),
            (node, "rdf:object", "o"),
            (node, "kg:conf", "0.7"),
            # a non-statement subject with a random pred: must not leak
            ("other", "kg:conf", "0.1"),
            # incomplete skeleton: ignored entirely
            ("_:stmt-y", "rdf:subject", "s2"),
            ("_:stmt-y", "kg:conf", "0.2"),
        ],
        "subj string, pred string, obj string",
    )
    out = unreify(trips).collect()
    assert [tuple(r) for r in out] == [("s", "p", "o", "kg:conf", "0.7")]


def test_stmt_node_separator_prevents_prefix_collisions(spark):
    df = spark.createDataFrame(
        [("ab", "c", "d"), ("a", "bc", "d")],
        "subj string, pred string, obj string",
    )
    nodes = [r[0] for r in df.select(stmt_node()).collect()]
    assert nodes[0] != nodes[1]


# ------------------------------------------------- confidence annotations


def test_annotate_confidence(spark):
    linked = spark.createDataFrame(
        [
            ("conv:1", "kg:mentions", "ent:grep", 0.975, "conv:1-t3"),
            ("conv:2", "kg:mentions", "ent:sed", None, "conv:2-t1"),
        ],
        "subj string, pred string, obj string, score double, turn string",
    )
    out = annotate_confidence(linked, source_col="turn")
    rows = sorted(map(tuple, out.collect()))
    # null score -> no confidence row; provenance rows for both
    assert ("conv:1", "kg:mentions", "ent:grep", "kg:confidence",
            "0.9750") in rows
    assert ("conv:1", "kg:mentions", "ent:grep", "kg:derivedFrom",
            "conv:1-t3") in rows
    assert ("conv:2", "kg:mentions", "ent:sed", "kg:derivedFrom",
            "conv:2-t1") in rows
    assert len(rows) == 3
    with pytest.raises(ValueError, match="not in"):
        annotate_confidence(linked, score_col="nope")


def test_graph_star_annotations(spark):
    from logset_spark.operators.star import graph_star_annotations
    from logset_spark.vocab import NS_TURN

    graph = spark.createDataFrame(
        [
            ("conv:1/t", "kg:mentions", "ent:grep", "c1", 5, None, 0.975),
            ("conv:1", "kg:hasTurn", "conv:1/0", "c1", 0, None, None),
        ],
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, ts timestamp, conf double",
    )
    rows = sorted(map(tuple, graph_star_annotations(graph).collect()))
    turn5 = f"{NS_TURN}c1/5"
    turn0 = f"{NS_TURN}c1/0"
    assert rows == [
        ("conv:1", "kg:hasTurn", "conv:1/0", "kg:derivedFrom", turn0),
        ("conv:1/t", "kg:mentions", "ent:grep", "kg:confidence", "0.9750"),
        ("conv:1/t", "kg:mentions", "ent:grep", "kg:derivedFrom", turn5),
    ]


# ----------------------------------------------------------- SPARQL-star


def test_rewrite_star_patterns_constant_pred():
    from logset_spark.operators.star import _rewrite_star_patterns

    out = _rewrite_star_patterns(
        "SELECT ?s ?c WHERE { << ?s <kg:p> ?o >> <kg:conf> ?c . }")
    assert "<rdf:subject> ?s" in out and "<rdf:object> ?o" in out
    assert "?__stmt1 <kg:conf> ?c" in out
    assert "FILTER" not in out  # constant pred: no leak possible


def test_rewrite_star_patterns_var_pred_injects_guard():
    from logset_spark.operators.star import _rewrite_star_patterns

    out = _rewrite_star_patterns(
        "SELECT * WHERE { << ?s ?p ?o >> ?ap ?ao . }")
    assert "?ap != <rdf:subject>" in out and "?ap != <rdf:type>" in out


def test_rewrite_star_rejects_other_positions():
    from logset_spark.operators.star import _rewrite_star_patterns

    with pytest.raises(ValueError, match="quoted-triple"):
        _rewrite_star_patterns(
            "SELECT * WHERE { ?x <kg:says> << ?s <p> ?o >> . }")


def test_rewrite_star_protects_literals():
    from logset_spark.operators.star import _rewrite_star_patterns

    out = _rewrite_star_patterns(
        "SELECT ?s WHERE { << ?s <kg:p> '<< not a pattern >>' >> "
        "<kg:conf> ?c . }")
    assert "'<< not a pattern >>'" in out  # literal content untouched


def test_sparql_star_executes(spark, ann_df):
    from logset_spark.operators.star import sparql_star

    asserted = ann_df.select("subj", "pred", "obj").distinct()
    # variable annotation pred: guard must keep rdf:* skeleton out
    out = sparql_star(
        asserted, ann_df,
        "SELECT ?c ?o ?ap ?ao WHERE { "
        "<< ?c <kg:placed> ?o >> ?ap ?ao . }",
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        ("c:1", "o:10", "kg:conf", "0.9"),
        ("c:1", "o:10", "kg:src", "t:3"),
        ("c:2", "o:20", "kg:conf", "0.5"),
    ]
    # constant annotation pred
    out2 = sparql_star(
        asserted, ann_df,
        "SELECT ?c ?conf WHERE { "
        "<< ?c <kg:placed> ?o >> <kg:conf> ?conf . "
        "FILTER (?conf = '0.9') }",
    )
    assert [tuple(r) for r in out2.collect()] == [("c:1", "0.9")]


def test_sparql_star_over_graph_provenance(spark):
    """The `query_graph --star` composition: annotations derived from a
    warehouse-shaped triple table's provenance columns
    (graph_star_annotations) answering quoted-triple patterns
    (sparql_star) — confidence filter and derivedFrom lookup."""
    from logset_spark.operators.star import (
        graph_star_annotations,
        sparql_star,
    )
    from logset_spark.vocab import NS_TURN

    graph = spark.createDataFrame(
        [
            ("turn:c1/5", "kg:mentions", "ent:grep", "c1", 5, None, 0.98),
            ("turn:c1/6", "kg:mentions", "ent:sed", "c1", 6, None, 0.40),
            ("conv:c1", "kg:hasTurn", "turn:c1/5", "c1", 5, None, None),
        ],
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, ts timestamp, conf double",
    )
    anns = graph_star_annotations(graph)
    out = sparql_star(
        graph, anns,
        "SELECT ?s ?o ?c WHERE { << ?s <kg:mentions> ?o >> "
        "<kg:confidence> ?c . FILTER (?c > '0.9') }",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("turn:c1/5", "ent:grep", "0.9800")]
    prov = sparql_star(
        graph, anns,
        "SELECT ?s ?t WHERE { << ?s ?p ?o >> <kg:derivedFrom> ?t . }",
    )
    got = {tuple(r) for r in prov.collect()}
    assert ("turn:c1/5", f"{NS_TURN}c1/5") in got
    assert len(got) == 3


# ------------------------------------------------------- fixture oracle


def test_star_fixture_matches_flat_csv(spark):
    import duckdb

    from logset_spark.queries import SQL_STAR_SOURCE, q_star_source

    got = sorted(map(tuple, q_star_source(spark, "unused").collect()))
    want = sorted(map(tuple, duckdb.sql(SQL_STAR_SOURCE).fetchall()))
    assert got == want and len(got) == 6


def test_sparql_star_predicate_object_list(spark, ann_df):
    """';' predicate-object lists and ',' object lists after a quoted
    triple must compile (review finding: the rewrite previously only
    accepted a single pred-obj pair and rejected valid list syntax with
    a misleading 'subject-position' error)."""
    from logset_spark.operators.star import sparql_star

    asserted = ann_df.select("subj", "pred", "obj").distinct()
    out = sparql_star(
        asserted, ann_df,
        "SELECT ?c ?conf ?src WHERE { "
        "<< ?c <kg:placed> ?o >> <kg:conf> ?conf ; <kg:src> ?src . }",
    )
    assert sorted(map(tuple, out.collect())) == [("c:1", "0.9", "t:3")]
    # ',' object list: both objects must hold for one statement node
    out2 = sparql_star(
        asserted, ann_df,
        "SELECT ?c WHERE { "
        "<< ?c <kg:placed> ?o >> <kg:conf> '0.9', '0.5' . }",
    )
    assert out2.count() == 0  # no statement carries both conf values


def test_annotate_confidence_no_thousands_separator(spark):
    from logset_spark.operators.star import annotate_confidence

    t = spark.createDataFrame(
        [("s", "p", "o", 1234.5)],
        "subj string, pred string, obj string, score double",
    )
    row = annotate_confidence(t).first()
    assert row["a_obj"] == "1234.5000"  # not '1,234.5000'
