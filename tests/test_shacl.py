"""SHACL-subset validator (operators/shacl.py): shapes compiled from
Turtle (anonymous property shapes + sh:in collections through this
engine's own parser), every constraint family exercised against a
hand-checked graph, and the rejection discipline for anything outside
the subset."""

from __future__ import annotations

import pytest

from logset_spark.operators.shacl import (
    NodeShape,
    PropertyShape,
    compile_shapes,
    validate,
)
from logset_spark.sources.turtle import parse_turtle

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:TurnShape a sh:NodeShape ;
  sh:targetClass logset:Turn ;
  sh:property [ sh:path hasRole ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:in ("role:user" "role:assistant" "role:tool") ] ;
  sh:property [ sh:path partOf ; sh:minCount 1 ;
                sh:class logset:Conversation ] .
ex:ConvShape a sh:NodeShape ;
  sh:targetSubjectsOf hasTurn ;
  sh:property [ sh:path hasLabel ; sh:maxCount 1 ;
                sh:pattern "^[a-z-]+$" ] .
"""

G = [
    ("conv:a", "rdf:type", "logset:Conversation"),
    ("conv:a", "hasTurn", "turn:a0"),
    ("conv:a", "hasLabel", "good-label"),
    ("turn:a0", "rdf:type", "logset:Turn"),
    ("turn:a0", "hasRole", "role:user"),
    ("turn:a0", "partOf", "conv:a"),
    # violators
    ("turn:bad1", "rdf:type", "logset:Turn"),      # both minCounts
    ("turn:bad2", "rdf:type", "logset:Turn"),
    ("turn:bad2", "hasRole", "role:user"),
    ("turn:bad2", "hasRole", "role:alien"),        # maxCount + in
    ("turn:bad2", "partOf", "conv:ghost"),         # class (untyped)
    ("conv:b", "hasTurn", "turn:x"),
    ("conv:b", "hasLabel", "BAD LABEL"),           # pattern
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(G, "subj string, pred string, obj string")


def test_all_constraint_families(g):
    trips, _ = parse_turtle(SHAPES_TTL)
    got = sorted(tuple(r) for r in validate(g, trips).collect())
    assert got == [
        ("conv:b", "ex:ConvShape", "hasLabel", "pattern", "BAD LABEL"),
        ("turn:bad1", "ex:TurnShape", "hasRole", "minCount", "0"),
        ("turn:bad1", "ex:TurnShape", "partOf", "minCount", "0"),
        ("turn:bad2", "ex:TurnShape", "hasRole", "in", "role:alien"),
        ("turn:bad2", "ex:TurnShape", "hasRole", "maxCount", "2"),
        ("turn:bad2", "ex:TurnShape", "partOf", "class", "conv:ghost"),
    ]


def test_conformant_graph_is_empty(spark):
    trips, _ = parse_turtle(SHAPES_TTL)
    clean = spark.createDataFrame(
        [r for r in G if "bad" not in r[0] and r[0] != "conv:b"
         and "bad" not in r[2]],
        "subj string, pred string, obj string")
    v = validate(clean, trips)
    assert v.count() == 0
    assert v.columns == ["focus", "shape", "path", "constraint", "value"]


def test_has_value_and_precompiled_shapes(spark):
    shapes = [NodeShape(
        name="s", target_class="logset:Turn",
        properties=[PropertyShape(path="hasRole", has_value="role:user")],
    )]
    g2 = spark.createDataFrame(
        [("t1", "rdf:type", "logset:Turn"),
         ("t1", "hasRole", "role:user"),
         ("t2", "rdf:type", "logset:Turn"),
         ("t2", "hasRole", "role:tool")],
        "subj string, pred string, obj string")
    got = [tuple(r) for r in validate(g2, shapes).collect()]
    assert got == [("t2", "s", "hasRole", "hasValue", "role:user")]


def test_shapes_from_dataframe(spark, g):
    trips, _ = parse_turtle(SHAPES_TTL)
    sdf = spark.createDataFrame(
        trips, "subj string, pred string, obj string")
    assert validate(g, sdf).count() == 6


def test_rejections():
    def shapes_of(ttl):
        trips, _ = parse_turtle(
            "@prefix sh: <http://www.w3.org/ns/shacl#> .\n" + ttl)
        return compile_shapes(trips)

    with pytest.raises(ValueError, match="plain predicate"):
        shapes_of("ex:S a sh:NodeShape ; sh:targetClass C ;"
                  " sh:property [ sh:path p+ ; sh:minCount 1 ] .")
    with pytest.raises(ValueError, match="unsupported SHACL constraint"):
        shapes_of("ex:S a sh:NodeShape ; sh:targetClass C ;"
                  " sh:property [ sh:path p ; sh:datatype sh:integer ] .")
    with pytest.raises(ValueError, match="no target"):
        shapes_of("ex:S a sh:NodeShape ;"
                  " sh:property [ sh:path p ; sh:minCount 1 ] .")
    with pytest.raises(ValueError, match="no sh:path"):
        shapes_of("ex:S a sh:NodeShape ; sh:targetClass C ;"
                  " sh:property [ sh:minCount 1 ] .")
    with pytest.raises(ValueError, match="no sh:NodeShape"):
        shapes_of("ex:S sh:targetClass C .")


def test_focus_scope_narrows_but_counts_stay_global(spark, g):
    """Incremental semantics: scoped validation re-checks ONLY the
    scoped nodes, but each against the FULL graph — turn:bad2's
    maxCount=2 violation needs both its hasRole triples visible, and
    unscoped violators (bad1, conv:b) must not reappear."""
    trips, _ = parse_turtle(SHAPES_TTL)
    scope = spark.createDataFrame([("turn:bad2",)], "subj string")
    got = sorted(tuple(r) for r in validate(g, trips, scope).collect())
    assert got == [
        ("turn:bad2", "ex:TurnShape", "hasRole", "in", "role:alien"),
        ("turn:bad2", "ex:TurnShape", "hasRole", "maxCount", "2"),
        ("turn:bad2", "ex:TurnShape", "partOf", "class", "conv:ghost"),
    ]


def test_focus_scope_equals_full_validation_filtered(spark, g):
    trips, _ = parse_turtle(SHAPES_TTL)
    scope_nodes = ["turn:bad1", "conv:b", "turn:a0"]
    scope = spark.createDataFrame(
        [(n,) for n in scope_nodes], "node string")
    scoped = sorted(tuple(r) for r in validate(g, trips, scope).collect())
    full = sorted(
        tuple(r) for r in validate(g, trips).collect()
        if r["focus"] in scope_nodes)
    assert scoped == full and len(scoped) == 3


def test_focus_scope_rejects_multicolumn(spark):
    g2 = spark.createDataFrame(
        [("x", "p", "y")], "subj string, pred string, obj string")
    scope2 = spark.createDataFrame([("x", "y")], "a string, b string")
    shapes = [NodeShape(
        name="s", target_subjects_of="p",
        properties=[PropertyShape(path="p", min_count=1)])]
    with pytest.raises(ValueError, match="one column"):
        validate(g2, shapes, scope2)


# ---------------------------------------------------------------------------
# SHACL-SPARQL constraint component (sh:sparql / sh:select)
# ---------------------------------------------------------------------------

SPARQL_SHAPE_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:ToolTurnShape a sh:NodeShape ;
  sh:targetClass logset:Turn ;
  sh:sparql [
    sh:select "SELECT ?this WHERE { ?this hasRole 'role:tool' . FILTER NOT EXISTS { ?this usedTool ?t } }" ;
    sh:message "tool-role turn without a usedTool triple"
  ] .
"""

G_SPARQL = [
    ("turn:t1", "rdf:type", "logset:Turn"),
    ("turn:t1", "hasRole", "role:tool"),
    ("turn:t1", "usedTool", "tool:grep"),     # conformant
    ("turn:t2", "rdf:type", "logset:Turn"),
    ("turn:t2", "hasRole", "role:tool"),      # violator: no usedTool
    ("turn:t3", "rdf:type", "logset:Turn"),
    ("turn:t3", "hasRole", "role:user"),      # not a tool turn
    ("x:loose", "hasRole", "role:tool"),      # matches query, NOT a focus
]


def test_sparql_constraint_flags_cross_property_rule(spark):
    g2 = spark.createDataFrame(
        G_SPARQL, "subj string, pred string, obj string")
    trips, _ = parse_turtle(SPARQL_SHAPE_TTL)
    out = validate(g2, trips).collect()
    assert [(r["focus"], r["constraint"], r["value"]) for r in out] == [
        ("turn:t2", "sparql", "tool-role turn without a usedTool triple")]
    # the untyped x:loose matched the SELECT but is outside the shape's
    # focus set -> the semi-join must drop it (asserted by the == above)


def test_sparql_constraint_rejections(spark):
    with pytest.raises(ValueError, match=r"\?this"):
        compile_shapes([
            ("ex:S", "rdf:type", "sh:NodeShape"),
            ("ex:S", "sh:targetClass", "T"),
            ("ex:S", "sh:sparql", "_:q"),
            ("_:q", "sh:select", "SELECT ?x WHERE { ?x p ?o }"),
        ])
    with pytest.raises(ValueError, match="sh:select"):
        compile_shapes([
            ("ex:S", "rdf:type", "sh:NodeShape"),
            ("ex:S", "sh:targetClass", "T"),
            ("ex:S", "sh:sparql", "_:q"),
            ("_:q", "sh:message", "no select"),
        ])
    # $this spelling is normalized; projecting this under another name fails
    g2 = spark.createDataFrame(
        G_SPARQL, "subj string, pred string, obj string")
    shapes = compile_shapes([
        ("ex:S", "rdf:type", "sh:NodeShape"),
        ("ex:S", "sh:targetClass", "logset:Turn"),
        ("ex:S", "sh:sparql", "_:q"),
        ("_:q", "sh:select",
         "SELECT (COUNT(?this) AS ?n) WHERE { ?this hasRole ?r }"),
    ])
    with pytest.raises(ValueError, match="project"):
        validate(g2, shapes).collect()


def test_length_and_nodekind_constraints(spark):
    from logset_spark.operators.shacl import compile_shapes, validate
    from logset_spark.sources.turtle import parse_turtle

    ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ;
      sh:targetSubjectsOf p ;
      sh:property [ sh:path p ; sh:minLength 3 ; sh:maxLength 5 ;
                    sh:nodeKind sh:Literal ] ;
      sh:property [ sh:path q ; sh:nodeKind sh:IRI ] .
    """
    shapes, _ = parse_turtle(ttl)
    g = spark.createDataFrame(
        [
            ("n1", "p", "ok"),          # too short (minLength 3)
            ("n2", "p", "fine"),        # conforms
            ("n3", "p", "toolong"),     # too long (maxLength 5)
            ("n4", "p", "ent:x"),       # IRI where Literal required
            ("n1", "q", "ent:y"),       # conforms (IRI)
            ("n2", "q", "_:b0"),        # blank node where IRI required
            ("n3", "q", "plain"),       # literal where IRI required
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.focus, r.constraint, r.value)
        for r in validate(g, shapes).collect()
    }
    assert got == {
        ("n1", "minLength", "ok"),
        ("n3", "maxLength", "toolong"),
        ("n4", "nodeKind", "ent:x"),
        ("n2", "nodeKind", "_:b0"),
        ("n3", "nodeKind", "plain"),
    }
    # compound node kinds stay outside the subset, loudly
    bad = parse_turtle(
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
        ex:S a sh:NodeShape ; sh:targetSubjectsOf p ;
          sh:property [ sh:path p ; sh:nodeKind sh:IRIOrLiteral ] ."""
    )[0]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="nodeKind"):
        compile_shapes(bad)


class TestPropertyPaths:
    def _g(self, spark, rows):
        return spark.createDataFrame(rows, "subj string, pred string, obj string")

    def _shapes(self, ttl):
        from logset_spark.sources.turtle import parse_turtle

        trips, _ = parse_turtle(ttl)
        return trips

    def test_sequence_path_min_count(self, spark):
        from logset_spark.operators.shacl import validate

        g = self._g(spark, [
            ("o1", "by", "c1"), ("c1", "nat", "n1"),
            ("o2", "by", "c2"),                       # chain breaks at c2
        ])
        shapes = self._shapes("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf by ;
  sh:property [ sh:path ( by nat ) ; sh:minCount 1 ] .
""")
        v = validate(g, shapes).collect()
        assert [(r["focus"], r["path"], r["constraint"]) for r in v] == [
            ("o2", "by/nat", "minCount")
        ]

    def test_sequence_path_dedups_value_nodes(self, spark):
        """Two routes to the same value node count as ONE value."""
        from logset_spark.operators.shacl import validate

        g = self._g(spark, [
            ("o1", "by", "c1"), ("o1", "by", "c2"),
            ("c1", "nat", "n1"), ("c2", "nat", "n1"),
        ])
        shapes = self._shapes("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf by ;
  sh:property [ sh:path ( by nat ) ; sh:maxCount 1 ] .
""")
        assert validate(g, shapes).count() == 0

    def test_inverse_path_max_count(self, spark):
        from logset_spark.operators.shacl import validate

        g = self._g(spark, [
            ("o1", "by", "c1"), ("o2", "by", "c1"), ("o3", "by", "c1"),
            ("c1", "nat", "n1"),
            ("o4", "by", "c2"), ("c2", "nat", "n1"),
        ])
        shapes = self._shapes("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf nat ;
  sh:property [ sh:path [ sh:inversePath by ] ; sh:maxCount 2 ] .
""")
        v = validate(g, shapes).collect()
        assert [(r["focus"], r["path"], r["value"]) for r in v] == [
            ("c1", "^by", "3")
        ]

    def test_unsupported_path_node_rejected(self, spark):
        from logset_spark.operators.shacl import compile_shapes

        import pytest as _pytest

        shapes = self._shapes("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf by ;
  sh:property [ sh:path [ sh:zeroOrMorePath by ] ; sh:minCount 1 ] .
""")
        with _pytest.raises(ValueError, match="sh:path"):
            compile_shapes(shapes)


def test_plain_path_predicate_described_elsewhere_still_plain(spark):
    """A shapes graph that also annotates its vocabulary (the path IRI
    appears as a SUBJECT elsewhere) must still read sh:path as a plain
    predicate — only bnode path objects are path constructs."""
    from logset_spark.operators.shacl import compile_shapes
    from logset_spark.sources.turtle import parse_turtle

    trips, _ = parse_turtle("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf by ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
ex:name rdfs:label 'name' .
""")
    shapes = compile_shapes(trips)
    ps = shapes[0].properties[0]
    assert ps.path_kind == "direct"
    assert ps.path.endswith("name")


def test_full_iri_path_is_a_plain_predicate(spark):
    """Round-4 sweep: `sh:path <http://x.org/p>` was rejected because the
    plain-predicate guard banned '/' anywhere — but SHACL spells sequence
    paths as RDF lists, never with '/', so a scheme-shaped IRI is always
    a plain predicate.  Engine-style operator strings ('p1+') still
    reject, and an unsupported constraint on the same property node is
    attributed to ITSELF, not to sh:path."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from logset_spark.operators import shacl

    data = spark.createDataFrame(
        [("ex:a", "rdf:type", "http://example.org/T"),
         ("ex:a", "http://example.org/p", "v")],
        "subj string, pred string, obj string")
    SH = "http://www.w3.org/ns/shacl#"
    rows = [
        ("http://example.org/S", "rdf:type", SH + "NodeShape"),
        ("http://example.org/S", SH + "targetClass", "http://example.org/T"),
        ("_:anon-1", SH + "path", "http://example.org/p"),
        ("_:anon-1", SH + "minCount", "2"),
        ("http://example.org/S", SH + "property", "_:anon-1"),
    ]
    shapes = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    got = [(r["focus"], r["constraint"])
           for r in shacl.validate(data, shapes).collect()]
    assert got == [("ex:a", "minCount")]

    bad = rows[:3] + [("_:anon-1", SH + "uniqueLang", "true")] + rows[3:]
    with pytest.raises(ValueError, match="uniqueLang"):
        shacl.validate(data, spark.createDataFrame(
            bad, "subj string, pred string, obj string")).count()

    opstring = [rows[0], rows[1],
                ("_:anon-1", SH + "path", "p1+"), rows[3], rows[4]]
    with pytest.raises(ValueError, match="sh:path takes"):
        shacl.validate(data, spark.createDataFrame(
            opstring, "subj string, pred string, obj string")).count()
