"""Dictionary-encoded triple storage (operators/encode.py): deterministic
sorted id assignment, lossless roundtrip, and BGP parity between the
encoded join path and the string-table compiler."""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators import encode
from logset_spark.operators.sparql import bgp

TRIPLES = [
    ("conv:a", "hasTurn", "turn:a/0"),
    ("conv:a", "hasTurn", "turn:a/1"),
    ("conv:b", "hasTurn", "turn:b/0"),
    ("turn:a/0", "usedTool", "tool:grep"),
    ("turn:a/1", "usedTool", "tool:sed"),
    ("turn:b/0", "usedTool", "tool:grep"),
    ("node:x", "linksTo", "node:x"),
    ("node:x", "linksTo", "node:y"),
]


@pytest.fixture(scope="module")
def tri(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    )


def test_dictionary_ids_are_sorted_and_contiguous(tri):
    dic = encode.build_term_dictionary(tri).collect()
    got = {r.term: r.tid for r in dic}
    terms = sorted({t for row in TRIPLES for t in row})
    assert got == {t: i + 1 for i, t in enumerate(terms)}


def test_encode_decode_roundtrip(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    # encoded columns are fixed-width integers, no strings left
    assert set(enc.columns) == {"s_id", "p_id", "o_id"}
    assert all(f.dataType.typeName() == "long" for f in enc.schema.fields)
    back = encode.decode_triples(enc, dic)
    assert sorted(map(tuple, back.collect())) == sorted(TRIPLES)


@pytest.mark.parametrize(
    "patterns,select",
    [
        # 2-hop join
        ([("?c", "hasTurn", "?t"), ("?t", "usedTool", "?x")], ["c", "x"]),
        # constant object
        ([("?t", "usedTool", "tool:grep")], ["t"]),
        # variable predicate
        ([("conv:a", "?p", "?o")], ["p", "o"]),
        # repeated variable (self-loop)
        ([("?n", "linksTo", "?n")], ["n"]),
    ],
)
def test_bgp_encoded_matches_string_bgp(tri, patterns, select):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    got = sorted(
        map(tuple, encode.bgp_encoded(enc, dic, patterns, select).collect())
    )
    want = sorted(
        map(tuple, bgp(tri, patterns, select=select).collect())
    )
    assert got == want


def test_bgp_encoded_unknown_constant_is_empty(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    out = encode.bgp_encoded(
        enc, dic, [("?t", "usedTool", "tool:nosuch")], ["t"]
    )
    assert out.count() == 0


def test_bgp_encoded_existence_gate(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    # all-constant pattern gates the other pattern: present -> passes
    out = encode.bgp_encoded(
        enc, dic,
        [("conv:a", "hasTurn", "turn:a/0"), ("?t", "usedTool", "?x")],
        ["t", "x"],
    )
    assert out.count() == 3
    # absent -> empty
    out2 = encode.bgp_encoded(
        enc, dic,
        [("conv:a", "hasTurn", "turn:b/0"), ("?t", "usedTool", "?x")],
        ["t", "x"],
    )
    assert out2.count() == 0


def test_bgp_encoded_rejects_unbound_selection(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    with pytest.raises(ValueError, match="not bound"):
        encode.bgp_encoded(enc, dic, [("?a", "hasTurn", "?b")], ["zz"])


def test_extend_dictionary_appends_without_renumbering(spark, tri):
    base_rows = [r for r in TRIPLES if r[1] != "linksTo"]
    base = spark.createDataFrame(
        base_rows, "subj string, pred string, obj string"
    )
    dic0 = encode.build_term_dictionary(base)
    old = {r.term: r.tid for r in dic0.collect()}

    new = encode.extend_term_dictionary(dic0, tri).collect()
    got_new = {r.term: r.tid for r in new}
    fresh_terms = sorted(
        {t for row in TRIPLES for t in row} - set(old)
    )
    # only genuinely-new terms, ids continuing from max in sort order
    assert got_new == {
        t: len(old) + i + 1 for i, t in enumerate(fresh_terms)
    }

    # the grown dictionary encodes/decodes the full set losslessly and
    # old ids are untouched
    full = dic0.unionByName(
        spark.createDataFrame(new, dic0.schema)
    )
    back = encode.decode_triples(encode.encode_triples(tri, full), full)
    assert sorted(map(tuple, back.collect())) == sorted(TRIPLES)
    kept = {r.term: r.tid for r in full.collect()}
    assert all(kept[t] == i for t, i in old.items())


def test_extend_dictionary_no_new_terms_is_empty(tri):
    dic = encode.build_term_dictionary(tri)
    assert encode.extend_term_dictionary(dic, tri).count() == 0


def test_sparql_encoded_select_parity(tri):
    from logset_spark.operators.sparql import sparql

    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    q = ("SELECT ?c ?x WHERE { ?c hasTurn ?t . ?t usedTool ?x } "
         "ORDER BY ?c ?x LIMIT 2")
    got = [tuple(r) for r in encode.sparql_encoded(enc, dic, q).collect()]
    want = [tuple(r) for r in sparql(tri, q).collect()]
    assert got == want and len(got) == 2


def test_sparql_encoded_rejects_outside_subset(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    for q in [
        "SELECT ?c WHERE { ?c hasTurn ?t . FILTER(?t != 'x') }",
        # MIN over ids is only order-safe for never-extended dictionaries
        "SELECT ?c (MIN(?t) AS ?m) WHERE { ?c hasTurn ?t }",
        "SELECT ?c WHERE { ?c hasTurn ?t . OPTIONAL { ?t usedTool ?x } }",
        "SELECT ?c WHERE { ?c hasTurn+ ?t }",
        "ASK { ?c hasTurn ?t }",
    ]:
        with pytest.raises(ValueError, match="subset"):
            encode.sparql_encoded(enc, dic, q)


def test_sparql_encoded_rejects_from_clause(tri):
    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    with pytest.raises(ValueError, match="subset"):
        encode.sparql_encoded(
            enc, dic, "SELECT ?s FROM g1 WHERE { ?s hasTurn ?t }"
        )


def test_sparql_encoded_count_aggregates_match_string_path(tri):
    from logset_spark.operators.sparql import sparql

    dic = encode.build_term_dictionary(tri)
    enc = encode.encode_triples(tri, dic)
    for q in [
        "SELECT ?c (COUNT(?t) AS ?n) WHERE { ?c hasTurn ?t }",
        "SELECT (COUNT(*) AS ?n) WHERE { ?t usedTool ?x }",
        "SELECT ?c (COUNT(DISTINCT ?x) AS ?n) "
        "WHERE { ?c hasTurn ?t . ?t usedTool ?x }",
    ]:
        got = sorted(map(tuple, encode.sparql_encoded(enc, dic, q).collect()))
        want = sorted(map(tuple, sparql(tri, q).collect()))
        assert got == want, q


def test_constants_normalize_like_string_evaluator(spark):
    """Round-4 sweep: `<p>` probed the dictionary with brackets on and
    silently matched nothing.  Bracketed IRIs, the `a` keyword, and
    full well-known-namespace spellings must resolve exactly as the
    string evaluator resolves them; GRAPH patterns reject loudly."""
    import pytest

    from logset_spark.operators.encode import (
        build_term_dictionary,
        encode_triples,
        sparql_encoded,
    )

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("dog", "rdf:type", "Dog")],
        "subj string, pred string, obj string")
    d = build_term_dictionary(t)
    enc = encode_triples(t, d)

    def rows(q):
        return sorted(tuple(r) for r in sparql_encoded(enc, d, q).collect())

    assert rows("SELECT ?s ?o WHERE { ?s <p> ?o }") == \
        rows("SELECT ?s ?o WHERE { ?s p ?o }") == [("a", "b"), ("b", "c")]
    assert rows("SELECT ?o WHERE { <a> p ?o }") == [("b",)]
    assert rows("SELECT ?s ?c WHERE { ?s a ?c }") == [("dog", "Dog")]
    assert rows(
        "SELECT ?s ?c WHERE "
        "{ ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?c }"
    ) == [("dog", "Dog")]
    assert rows("SELECT ?o WHERE { <zzz> p ?o }") == []  # unknown: empty
    with pytest.raises(ValueError, match="GRAPH"):
        rows("SELECT ?s WHERE { GRAPH <g> { ?s p ?o } }")
