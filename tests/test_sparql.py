"""SPARQL BGP compiler (operators/sparql.py): parser unit tests, a
semantics cross-check against a naive in-Python BGP evaluator (the
row-at-a-time evaluation rdflib does, reimplemented in ~30 lines so the
distributed plan is checked against an independent implementation of the
same algebra), and a plan test that the constant-pred filter reaches the
parquet scan."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.sparql import bgp, parse_sparql, sparql

TRIPLES = [
    # conv:a has two turns; turn a/0 used grep, a/1 used sed
    ("conv:a", "hasTurn", "turn:a/0"),
    ("conv:a", "hasTurn", "turn:a/1"),
    ("turn:a/0", "usedTool", "tool:grep"),
    ("turn:a/1", "usedTool", "tool:sed"),
    ("turn:a/0", "hasRole", "role:tool"),
    ("turn:a/1", "hasRole", "role:tool"),
    # conv:b has one turn with no tool
    ("conv:b", "hasTurn", "turn:b/0"),
    ("turn:b/0", "hasRole", "role:user"),
    # self-loop-ish row to exercise repeated-variable patterns
    ("node:x", "linksTo", "node:x"),
    ("node:x", "linksTo", "node:y"),
]


def _naive_bgp(triples, patterns, optionals=()):
    """Reference evaluator: enumerate bindings pattern-by-pattern, the
    way an in-memory triple store does."""

    def match(pattern, binding):
        out = []
        for t in triples:
            b = dict(binding)
            ok = True
            for term, val in zip(pattern, t):
                if term.startswith("?"):
                    v = term[1:]
                    if v in b and b[v] != val:
                        ok = False
                        break
                    b[v] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                out.append(b)
        return out

    bindings = [{}]
    for p in patterns:
        bindings = [b2 for b in bindings for b2 in match(p, b)]
    for group in optionals:
        ext = []
        for b in bindings:
            sub = [dict(b)]
            for p in group:
                sub = [b2 for s in sub for b2 in match(p, s)]
            ext.extend(sub if sub else [b])
        bindings = ext
    return bindings


@pytest.fixture(scope="module")
def tri(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_two_hop_matches_naive(tri):
    pats = [("?conv", "hasTurn", "?turn"), ("?turn", "usedTool", "?tool")]
    got = _rows(bgp(tri, pats, select=["conv", "tool"]))
    want = sorted({(b["conv"], b["tool"]) for b in _naive_bgp(TRIPLES, pats)})
    assert got == want == [("conv:a", "tool:grep"), ("conv:a", "tool:sed")]


def test_every_two_pattern_combination_matches_naive(tri):
    """Exhaustive small-space sweep: all ordered pairs of pattern shapes
    over {const, var} positions share variable ?x in subj/obj slots."""
    shapes = [
        ("?x", "hasTurn", "?y"),
        ("?y", "usedTool", "?z"),
        ("?y", "hasRole", "role:tool"),
        ("?x", "linksTo", "?x"),
        ("conv:a", "hasTurn", "?y"),
    ]
    for pats in itertools.permutations(shapes, 2):
        vars_ = []
        for p in pats:
            vars_ += [t[1:] for t in p if t.startswith("?") and t[1:] not in vars_]
        got = _rows(bgp(tri, list(pats), select=vars_))
        want = sorted({tuple(b[v] for v in vars_)
                       for b in _naive_bgp(TRIPLES, list(pats))})
        assert got == want, f"mismatch for {pats}"


def test_repeated_variable_in_pattern(tri):
    got = _rows(bgp(tri, [("?n", "linksTo", "?n")]))
    assert got == [("node:x",)]


def test_optional_keeps_unmatched_left_rows(tri):
    q = """SELECT DISTINCT ?turn ?tool
           WHERE { ?c hasTurn ?turn . OPTIONAL { ?turn usedTool ?tool } }"""
    got = _rows(sparql(tri, q))
    assert got == [
        ("turn:a/0", "tool:grep"),
        ("turn:a/1", "tool:sed"),
        ("turn:b/0", None),
    ]


def test_filter_regex_and_inequality(tri):
    q = """SELECT ?turn ?tool
           WHERE { ?turn usedTool ?tool .
                   FILTER(regex(?tool, 'gr|se') && ?turn != 'turn:a/1') }"""
    assert _rows(sparql(tri, q)) == [("turn:a/0", "tool:grep")]


def test_filter_bound_on_optional(tri):
    q = """SELECT ?turn WHERE { ?c hasTurn ?turn .
           OPTIONAL { ?turn usedTool ?tool } . FILTER(!bound(?tool)) }"""
    assert _rows(sparql(tri, q)) == [("turn:b/0",)]


def test_existence_pattern_gates(tri):
    hit = bgp(tri, [("?c", "hasTurn", "?t"), ("conv:a", "hasTurn", "turn:a/0")])
    miss = bgp(tri, [("?c", "hasTurn", "?t"), ("conv:z", "hasTurn", "turn:z/0")])
    assert hit.count() == 3 and miss.count() == 0


def test_order_by_and_limit(tri):
    q = """SELECT ?tool WHERE { ?t usedTool ?tool } ORDER BY ?tool DESC LIMIT 1"""
    assert [r[0] for r in sparql(tri, q).collect()] == ["tool:sed"]


def test_parser_round_trip_fields():
    pq = parse_sparql(
        """SELECT DISTINCT ?a ?b WHERE { ?a p1 ?b . ?b p2 'lit val' .
           FILTER(?a != 'x') . OPTIONAL { ?b p3 ?c } }
           ORDER BY ?a ?b DESC LIMIT 7"""
    )
    assert pq.distinct and pq.select == ["a", "b"]
    assert pq.patterns == [("?a", "p1", "?b"), ("?b", "p2", "lit val")]
    assert pq.filters == ["?a != 'x'"]
    assert pq.optionals == [([("?b", "p3", "?c")], [])]
    assert pq.order_by == [("a", False), ("b", True)] and pq.limit == 7


def test_parser_rejects_garbage():
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?a WHERE { ?a p }")  # 2-term pattern
    with pytest.raises(ValueError):
        parse_sparql("DESCRIBE ?a WHERE { ?a p ?b }")  # outside the subset


def test_constant_pred_filter_pushes_to_parquet(spark, tri, tmp_path):
    path = str(tmp_path / "tri")
    tri.write.parquet(path)
    stored = spark.read.parquet(path)
    plan = bgp(
        stored, [("?c", "hasTurn", "?t"), ("?t", "usedTool", "?tool")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(pred,hasTurn)" in plan

def test_property_path_one_or_more(spark):
    chain = spark.createDataFrame(
        [("a", "partOf", "b"), ("b", "partOf", "c"), ("c", "partOf", "d"),
         ("a", "isLeaf", "true")],
        "subj string, pred string, obj string",
    )
    got = _rows(sparql(
        chain, "SELECT ?n ?x WHERE { ?n partOf+ ?x . ?n isLeaf true }"
    ))
    assert got == [("a", "b"), ("a", "c"), ("a", "d")]


def test_aggregates_group_and_count(tri):
    q = """SELECT ?conv (COUNT(?turn) AS ?n) WHERE { ?conv hasTurn ?turn }"""
    assert _rows(sparql(tri, q)) == [("conv:a", 2), ("conv:b", 1)]


def test_aggregate_count_star_no_group(tri):
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?t usedTool ?tool }"
    assert _rows(sparql(tri, q)) == [(2,)]


def test_aggregate_counts_multiset_not_distinct(spark):
    """Two turns use the same tool: COUNT must see both solutions even
    though the (tool,) projection would dedup under SELECT DISTINCT."""
    t = spark.createDataFrame(
        [("t1", "usedTool", "grep"), ("t2", "usedTool", "grep")],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?tool (COUNT(?turn) AS ?n) WHERE { ?turn usedTool ?tool }"
    assert _rows(sparql(t, q)) == [("grep", 2)]


def test_aggregate_rejects_sum_star():
    with pytest.raises(ValueError):
        parse_sparql("SELECT (SUM(*) AS ?s) WHERE { ?a p ?b }")


def test_union_aligns_vars_with_nulls(tri):
    q = """SELECT DISTINCT ?t ?tool ?role
           WHERE { { ?t usedTool ?tool } UNION { ?t hasRole ?role } }"""
    got = _rows(sparql(tri, q))
    assert ("turn:a/0", "tool:grep", None) in got
    assert ("turn:b/0", None, "role:user") in got
    assert len(got) == 5


def test_union_same_vars_concatenates(tri):
    q = """SELECT ?x WHERE { { ?x usedTool tool:grep } UNION { ?x usedTool tool:sed } }"""
    assert _rows(sparql(tri, q)) == [("turn:a/0",), ("turn:a/1",)]


def test_construct_emits_template_triples(tri):
    q = """CONSTRUCT { ?t partOf ?c . ?c contains ?t }
           WHERE { ?c hasTurn ?t }"""
    got = _rows(sparql(tri, q))
    assert ("turn:a/0", "partOf", "conv:a") in got
    assert ("conv:a", "contains", "turn:a/0") in got
    assert len(got) == 6  # 3 hasTurn solutions x 2 template patterns


def test_construct_skips_unbound_optional(tri):
    q = """CONSTRUCT { ?t toolUsed ?tool }
           WHERE { ?c hasTurn ?t . OPTIONAL { ?t usedTool ?tool } }"""
    got = _rows(sparql(tri, q))
    # turn:b/0 has no tool -> no triple for it
    assert got == [("turn:a/0", "toolUsed", "tool:grep"),
                   ("turn:a/1", "toolUsed", "tool:sed")]


def test_ask_true_and_false(tri):
    assert sparql(tri, "ASK { ?t usedTool tool:grep }").collect()[0]["ask"] is True
    assert sparql(tri, "ASK { ?t usedTool tool:awk }").collect()[0]["ask"] is False


def test_describe_neighborhood(tri):
    got = _rows(sparql(tri, "DESCRIBE turn:a/0"))
    assert got == [
        ("conv:a", "hasTurn", "turn:a/0"),
        ("turn:a/0", "hasRole", "role:tool"),
        ("turn:a/0", "usedTool", "tool:grep"),
    ]


def test_vertical_layout_prunes_partitions(spark, tri, tmp_path):
    from logset_spark.operators.sparql import read_vertical, write_vertical

    path = str(tmp_path / "vtri")
    write_vertical(tri, path)
    stored = read_vertical(spark, path)
    # same answers as the row layout
    q = "SELECT DISTINCT ?c ?tool WHERE { ?c hasTurn ?t . ?t usedTool ?tool }"
    assert _rows(sparql(stored, q)) == _rows(sparql(tri, q))
    # and the constant-pred scan prunes to the pred's own partition
    one = bgp(stored, [("?t", "usedTool", "?tool")])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "usedTool" in plan


def test_random_graphs_and_patterns_match_naive(spark):
    """Randomized sweep (seeded, no hypothesis shrinking needed at this
    size): random triple sets over small alphabets x random 2-3 pattern
    BGPs with guaranteed variable sharing, checked against the naive
    evaluator.  Catches join/ordering/projection bugs the hand-picked
    cases miss."""
    import random as rnd

    rng = rnd.Random(2024)
    subjects = [f"s{i}" for i in range(6)]
    preds = ["p1", "p2", "p3"]
    for case in range(10):
        triples = sorted({
            (rng.choice(subjects), rng.choice(preds), rng.choice(subjects))
            for _ in range(rng.randint(5, 18))
        })
        df = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        )
        n_pat = rng.randint(2, 3)
        vars_pool = ["a", "b", "c", "d"]
        pats = []
        for pi in range(n_pat):
            # subject: reuse a var from an earlier pattern when possible
            # so the BGP stays connected
            used = [t for p in pats for t in p if t.startswith("?")]
            s = rng.choice(used) if used and rng.random() < 0.8 else (
                "?" + rng.choice(vars_pool))
            p = rng.choice(preds + ["?" + rng.choice(vars_pool)])
            o = ("?" + rng.choice(vars_pool)) if rng.random() < 0.7 else (
                rng.choice(subjects))
            pats.append((s, p, o))
        out_vars = []
        for p in pats:
            out_vars += [t[1:] for t in p
                         if t.startswith("?") and t[1:] not in out_vars]
        got = _rows(bgp(df, pats, select=out_vars))
        want = sorted({tuple(b[v] for v in out_vars)
                       for b in _naive_bgp(triples, pats)})
        assert got == want, f"case {case}: {pats} over {len(triples)} triples"


# ---- round-3 additions: literal protection, BIND/VALUES/NOT EXISTS/ ----
# ---- MINUS, property-path alternation/sequence/star, arm filters    ----

def test_literal_with_operators_is_inert(spark):
    """ADVICE r02: '&&', '||', '!', '.' inside a quoted literal must be
    compared verbatim, not rewritten or split on."""
    t = spark.createDataFrame(
        [("s1", "hasText", "a!b"), ("s2", "hasText", "a NOT b"),
         ("s3", "hasText", "v.1 && v.2")],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?s WHERE { ?s hasText ?x . FILTER(?x = 'a!b') }"
    assert _rows(sparql(t, q)) == [("s1",)]
    # literal containing '.' and '&&' as a pattern TERM (the '.'-split
    # and FILTER-rewrite hazards)
    q2 = "SELECT ?s WHERE { ?s hasText 'v.1 && v.2' }"
    assert _rows(sparql(t, q2)) == [("s3",)]


def test_filter_to_expr_protects_literals():
    from logset_spark.operators.sparql import _filter_to_expr

    e = _filter_to_expr("?x = 'a!b' && regex(?y, 'gr|se') && !bound(?z)")
    assert "'a!b'" in e and "'gr|se'" in e and "RLIKE" in e
    assert "a NOT b" not in e and " OR se" not in e


def test_bind_concat(tri):
    q = """SELECT ?turn ?label
           WHERE { ?turn usedTool ?tool . BIND(CONCAT('used:', ?tool) AS ?label) }"""
    got = _rows(sparql(tri, q))
    assert got == [("turn:a/0", "used:tool:grep"), ("turn:a/1", "used:tool:sed")]


def test_bind_then_filter_on_bound_var(tri):
    q = """SELECT ?turn WHERE { ?turn usedTool ?tool .
           BIND(CONCAT(?tool, '!') AS ?t2) . FILTER(?t2 = 'tool:sed!') }"""
    assert _rows(sparql(tri, q)) == [("turn:a/1",)]


def test_values_single_var_restricts(tri):
    q = """SELECT ?turn ?tool WHERE { ?turn usedTool ?tool .
           VALUES ?tool { tool:grep tool:awk } }"""
    assert _rows(sparql(tri, q)) == [("turn:a/0", "tool:grep")]


def test_values_multi_var(tri):
    q = """SELECT ?turn ?tool ?tag WHERE { ?turn usedTool ?tool .
           VALUES (?tool ?tag) { (tool:grep 'searchy') (tool:sed 'edity') } }"""
    got = _rows(sparql(tri, q))
    assert got == [("turn:a/0", "tool:grep", "searchy"),
                   ("turn:a/1", "tool:sed", "edity")]


def test_filter_not_exists_shared_var(tri):
    # turns with a role but no tool
    q = """SELECT ?turn WHERE { ?c hasTurn ?turn .
           FILTER NOT EXISTS { ?turn usedTool ?tool } }"""
    assert _rows(sparql(tri, q)) == [("turn:b/0",)]


def test_filter_not_exists_disjoint_gates(tri):
    # inner shares no var: any match empties the result
    gate = """SELECT ?c WHERE { ?c hasTurn ?t .
              FILTER NOT EXISTS { ?x usedTool tool:grep } }"""
    assert sparql(tri, gate).count() == 0
    open_ = """SELECT DISTINCT ?c WHERE { ?c hasTurn ?t .
               FILTER NOT EXISTS { ?x usedTool tool:awk } }"""
    assert sparql(tri, open_).count() == 2


def test_minus_shared_and_disjoint(tri):
    q = """SELECT ?turn WHERE { ?c hasTurn ?turn .
           MINUS { ?turn usedTool ?tool } }"""
    assert _rows(sparql(tri, q)) == [("turn:b/0",)]
    # SPARQL: MINUS group sharing no variable removes nothing
    q2 = """SELECT DISTINCT ?c WHERE { ?c hasTurn ?turn .
            MINUS { ?x usedTool tool:grep } }"""
    assert sparql(tri, q2).count() == 2


def test_path_alternation(tri):
    q = "SELECT DISTINCT ?s ?o WHERE { ?s usedTool|hasRole ?o }"
    got = _rows(sparql(tri, q))
    assert ("turn:a/0", "tool:grep") in got and ("turn:b/0", "role:user") in got
    assert len(got) == 5


def test_path_sequence(tri):
    # conv -> turn -> tool in one path expression
    q = "SELECT DISTINCT ?c ?tool WHERE { ?c hasTurn/usedTool ?tool }"
    assert _rows(sparql(tri, q)) == [("conv:a", "tool:grep"),
                                     ("conv:a", "tool:sed")]


def test_path_star_includes_identity(spark):
    chain = spark.createDataFrame(
        [("a", "partOf", "b"), ("b", "partOf", "c")],
        "subj string, pred string, obj string",
    )
    got = _rows(sparql(chain, "SELECT ?n ?x WHERE { ?n partOf* ?x }"))
    # closure pairs + identity for every graph term
    assert ("a", "c") in got and ("a", "a") in got and ("c", "c") in got
    assert len(got) == 6  # a->{a,b,c}, b->{b,c}, c->{c}


def test_path_sequence_with_closure_step(spark):
    chain = spark.createDataFrame(
        [("x", "in", "a"), ("a", "partOf", "b"), ("b", "partOf", "c")],
        "subj string, pred string, obj string",
    )
    got = _rows(sparql(chain, "SELECT ?n ?x WHERE { ?n in/partOf+ ?x }"))
    assert got == [("x", "b"), ("x", "c")]


def test_union_arm_scoped_filter(tri):
    q = """SELECT DISTINCT ?t ?tool ?role
           WHERE { { ?t usedTool ?tool . FILTER(regex(?tool, 'grep')) }
                   UNION { ?t hasRole ?role } }"""
    got = _rows(sparql(tri, q))
    assert ("turn:a/0", "tool:grep", None) in got
    assert ("turn:a/1", "tool:sed", None) not in got  # filtered in arm 1 only
    assert ("turn:b/0", None, "role:user") in got


def test_values_only_where_body(tri):
    q = "SELECT ?x WHERE { VALUES ?x { 'v1' 'v2' } }"
    assert _rows(sparql(tri, q)) == [("v1",), ("v2",)]


def test_filter_exists_semi_join(tri):
    q = """SELECT ?turn WHERE { ?c hasTurn ?turn .
           FILTER EXISTS { ?turn usedTool ?tool } }"""
    assert _rows(sparql(tri, q)) == [("turn:a/0",), ("turn:a/1",)]


def test_filter_exists_disjoint_gate(tri):
    hit = """SELECT DISTINCT ?c WHERE { ?c hasTurn ?t .
             FILTER EXISTS { ?x usedTool tool:grep } }"""
    assert sparql(tri, hit).count() == 2
    miss = """SELECT ?c WHERE { ?c hasTurn ?t .
              FILTER EXISTS { ?x usedTool tool:awk } }"""
    assert sparql(tri, miss).count() == 0


def test_inverse_path(tri):
    # ^hasTurn: turn -> conv (swapped endpoints)
    q = "SELECT ?turn ?c WHERE { ?turn ^hasTurn ?c . ?turn usedTool tool:sed }"
    assert _rows(sparql(tri, q)) == [("turn:a/1", "conv:a")]


def test_inverse_in_sequence(tri):
    # tool -> turn (inverse) -> conv (inverse): which convs used the tool
    q = "SELECT DISTINCT ?tool ?c WHERE { ?tool ^usedTool/^hasTurn ?c }"
    got = _rows(sparql(tri, q))
    assert got == [("tool:grep", "conv:a"), ("tool:sed", "conv:a")]


def test_optional_group_scoped_filter(tri):
    """A FILTER inside OPTIONAL applies BEFORE the left join (SPARQL
    LeftJoin scoping): rows whose optional match fails the filter keep
    the row with NULL, they are not dropped."""
    q = """SELECT ?turn ?tool WHERE { ?c hasTurn ?turn .
           OPTIONAL { ?turn usedTool ?tool . FILTER(regex(?tool, 'grep')) } }"""
    got = _rows(sparql(tri, q))
    assert got == [("turn:a/0", "tool:grep"),
                   ("turn:a/1", None), ("turn:b/0", None)]


def test_offset_and_limit(tri):
    base = "SELECT ?t WHERE { ?c hasTurn ?t } ORDER BY ?t"
    allr = [r[0] for r in sparql(tri, base).collect()]
    assert [r[0] for r in sparql(tri, base + " LIMIT 2 OFFSET 1").collect()] \
        == allr[1:3]
    assert [r[0] for r in sparql(tri, base + " OFFSET 2").collect()] == allr[2:]


def test_string_functions_in_filter_and_bind(tri):
    q = """SELECT ?tool ?up WHERE { ?t usedTool ?tool .
           BIND(UCASE(?tool) AS ?up) .
           FILTER(STRSTARTS(?tool, 'tool:g') && STRLEN(?tool) > 5) }"""
    assert _rows(sparql(tri, q)) == [("tool:grep", "TOOL:GREP")]


def test_string_functions_contains_replace(tri):
    q = """SELECT ?t ?fixed WHERE { ?t usedTool ?tool .
           BIND(REPLACE(?tool, 'tool:', '') AS ?fixed) .
           FILTER(CONTAINS(?tool, 'sed')) }"""
    assert _rows(sparql(tri, q)) == [("turn:a/1", "sed")]


def test_having_filters_groups(tri):
    q = """SELECT ?conv (COUNT(?turn) AS ?n) WHERE { ?conv hasTurn ?turn }
           HAVING(?n > 1)"""
    assert _rows(sparql(tri, q)) == [("conv:a", 2)]


def test_having_rejected_without_aggregates(tri):
    with pytest.raises(ValueError):
        sparql(tri, "SELECT ?a WHERE { ?a hasTurn ?b } HAVING(?a > 1)")


def test_group_concat_sorted_deterministic(tri):
    q = """SELECT ?conv (GROUP_CONCAT(?turn) AS ?turns)
           WHERE { ?conv hasTurn ?turn }"""
    got = _rows(sparql(tri, q))
    assert got == [("conv:a", "turn:a/0;turn:a/1"), ("conv:b", "turn:b/0")]


def test_a_keyword_is_rdf_type(spark):
    t = spark.createDataFrame(
        [("x", "rdf:type", "Widget"), ("y", "rdf:type", "Gadget"),
         ("x", "hasName", "ecks")],
        "subj string, pred string, obj string",
    )
    assert _rows(sparql(t, "SELECT ?s WHERE { ?s a Widget }")) == [("x",)]
    got = _rows(sparql(t, "CONSTRUCT { ?s a Thing } WHERE { ?s a ?t }"))
    assert got == [("x", "rdf:type", "Thing"), ("y", "rdf:type", "Thing")]


def test_count_distinct_aggregate(spark):
    t = spark.createDataFrame(
        [("t1", "usedTool", "grep"), ("t2", "usedTool", "grep"),
         ("t3", "usedTool", "sed")],
        "subj string, pred string, obj string",
    )
    q = """SELECT (COUNT(DISTINCT ?tool) AS ?n) WHERE { ?t usedTool ?tool }"""
    assert _rows(sparql(t, q)) == [(2,)]
    q2 = """SELECT (GROUP_CONCAT(DISTINCT ?tool) AS ?ts)
            WHERE { ?t usedTool ?tool }"""
    assert _rows(sparql(t, q2)) == [("grep;sed",)]


def test_random_filters_and_negation_match_naive(spark):
    """Randomized semantics sweep for the round-3 algebra: random small
    graphs x random (pattern, FILTER, OPTIONAL, NOT EXISTS / MINUS /
    EXISTS) combinations, checked against a naive Python evaluation of
    the same SPARQL algebra.  Catches scoping and NULL-semantics bugs
    the hand-picked cases miss."""
    import random as rnd

    from logset_spark.operators.sparql import bgp

    rng = rnd.Random(77)
    subjects = [f"s{i}" for i in range(5)]
    preds = ["p1", "p2", "p3"]

    def naive(triples, base, opt, neg, neg_kind, flt):
        # base/opt/neg: single patterns; flt: (var, op, const) or None
        def match(pattern, binding):
            out = []
            for t in triples:
                b = dict(binding)
                ok = True
                for term, val in zip(pattern, t):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b and b[v] != val:
                            ok = False
                            break
                        b[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    out.append(b)
            return out

        sols = [b2 for b in [{}] for b2 in match(base, b)]
        if opt is not None:
            ext = []
            for b in sols:
                sub = match(opt, b)
                ext.extend(sub if sub else [b])
            sols = ext
        if neg is not None:
            inner = [b2 for b in [{}] for b2 in match(neg, b)]
            inner_vars = {t[1:] for t in neg if t.startswith("?")}
            kept = []
            for b in sols:
                shared = [v for v in b if v in inner_vars]
                if neg_kind == "minus" and not shared:
                    kept.append(b)  # disjoint MINUS removes nothing
                    continue
                hit = any(all(b.get(v) == i.get(v) for v in shared)
                          for i in inner) if (shared or neg_kind != "minus") \
                    else False
                if not shared and neg_kind in ("not_exists", "exists"):
                    hit = bool(inner)
                if neg_kind == "exists":
                    if hit:
                        kept.append(b)
                elif not hit:
                    kept.append(b)
            sols = kept
        if flt is not None:
            v, op, c = flt
            def keep(b):
                x = b.get(v)
                if x is None:
                    return False  # NULL comparison -> not kept (both engines)
                return (x == c) if op == "=" else (x != c)
            sols = [b for b in sols if keep(b)]
        return sols

    for case in range(12):
        triples = sorted({
            (rng.choice(subjects), rng.choice(preds), rng.choice(subjects))
            for _ in range(rng.randint(6, 16))
        })
        df = spark.createDataFrame(triples, "subj string, pred string, obj string")
        base = ("?a", rng.choice(preds), "?b")
        opt = ("?b", rng.choice(preds), "?c") if rng.random() < 0.6 else None
        neg_kind = rng.choice(["not_exists", "minus", "exists", None])
        neg = ("?b", rng.choice(preds), "?d") if neg_kind else None
        flt = ("b", rng.choice(["=", "!="]), rng.choice(subjects)) \
            if rng.random() < 0.5 else None

        kw = {}
        if opt is not None:
            kw["optionals"] = [[opt]]
        if neg_kind == "not_exists":
            kw["not_exists"] = [[neg]]
        elif neg_kind == "minus":
            kw["minus"] = [[neg]]
        elif neg_kind == "exists":
            kw["exists"] = [[neg]]
        if flt is not None:
            v, op, c = flt
            kw["filters"] = [f"?{v} {'=' if op == '=' else '!='} '{c}'"]
        out_vars = ["a", "b"] + (["c"] if opt is not None else [])
        got = _rows(bgp(df, [base], select=out_vars, **kw))
        want = sorted(
            {tuple(b.get(v) for v in out_vars)
             for b in naive(triples, base, opt, neg, neg_kind, flt)},
            key=lambda t: tuple((v is None, v) for v in t),
        )
        assert got == want, (
            f"case {case}: base={base} opt={opt} neg={neg_kind}:{neg} "
            f"flt={flt}\n got={got}\nwant={want}")


def test_prefix_headers_expand_terms(spark):
    t = spark.createDataFrame(
        [("http://ex.org/s1", "http://ex.org/knows", "http://ex.org/s2"),
         ("http://ex.org/s2", "http://ex.org/knows", "http://ex.org/s3")],
        "subj string, pred string, obj string",
    )
    q = """PREFIX ex: <http://ex.org/>
           SELECT ?a ?b WHERE { ?a ex:knows ?b . VALUES ?a { ex:s1 } }"""
    assert _rows(sparql(t, q)) == [("http://ex.org/s1", "http://ex.org/s2")]
    # property path with prefixed atoms
    q2 = """PREFIX ex: <http://ex.org/>
            SELECT ?a ?c WHERE { ?a ex:knows/ex:knows ?c }"""
    assert _rows(sparql(t, q2)) == [("http://ex.org/s1", "http://ex.org/s3")]
    # closure path
    q3 = """PREFIX ex: <http://ex.org/>
            SELECT ?a ?c WHERE { ?a ex:knows+ ?c . VALUES ?a { ex:s1 } }"""
    assert _rows(sparql(t, q3)) == [
        ("http://ex.org/s1", "http://ex.org/s2"),
        ("http://ex.org/s1", "http://ex.org/s3"),
    ]
    # CONSTRUCT template + DESCRIBE target expansion
    q4 = """PREFIX ex: <http://ex.org/>
            CONSTRUCT { ?a ex:met ?b } WHERE { ?a ex:knows ?b }"""
    got = _rows(sparql(t, q4))
    assert ("http://ex.org/s1", "http://ex.org/met", "http://ex.org/s2") in got
    q5 = "PREFIX ex: <http://ex.org/> DESCRIBE ex:s2"
    assert len(_rows(sparql(t, q5))) == 2
    # unbound prefix stays verbatim (engine-style prefixed strings)
    t2 = spark.createDataFrame(
        [("conv:a", "hasTurn", "turn:a/0")],
        "subj string, pred string, obj string",
    )
    q6 = """PREFIX ex: <http://ex.org/>
            SELECT ?t WHERE { conv:a hasTurn ?t }"""
    assert _rows(sparql(t2, q6)) == [("turn:a/0",)]


def test_prefix_over_loaded_catalog(spark):
    import os

    from logset_spark.sources.turtle import load_catalog

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    df = load_catalog(spark, os.path.join(fix, "catalog_entry.ttl"))
    q = """PREFIX logset: <http://example.org/logset#>
           SELECT ?s WHERE { ?s logset:partOf ?c }"""
    got = sorted(r["s"] for r in sparql(df, q).collect())
    assert got == ["http://example.org/logset#series_console",
                   "http://example.org/logset#series_messages"]


def test_negated_property_set(tri):
    got = _rows(sparql(
        tri, "SELECT DISTINCT ?s ?o WHERE { ?s !(hasTurn|hasRole) ?o }"
    ))
    want = {
        (s, o) for s, p, o in TRIPLES if p not in ("hasTurn", "hasRole")
    }
    assert set(got) == want
    # single-member form, no parens
    got1 = _rows(sparql(tri, "SELECT DISTINCT ?s ?o WHERE { ?s !linksTo ?o }"))
    assert set(got1) == {(s, o) for s, p, o in TRIPLES if p != "linksTo"}


def test_negated_property_set_rejects_inverse_and_paths(tri):
    # rejection happens at LOWERING time (the parser stores pattern
    # terms verbatim) — building the plan must raise, loudly
    for bad in ("!(^p)", "!(p+)", "!(p|?v)", "!()"):
        with pytest.raises(ValueError):
            sparql(tri, f"SELECT * WHERE {{ ?s {bad} ?o }}")


def test_path_zero_or_one(spark):
    rows = [("a", "p", "b"), ("b", "p", "c")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = _rows(sparql(t, "SELECT ?x ?y WHERE { ?x p? ?y }"))
    # one-step pairs plus the identity pair for every term of the graph
    assert set(got) == {("a", "b"), ("b", "c"), ("a", "a"), ("b", "b"), ("c", "c")}


def test_subquery_aggregate_join(tri):
    q = """SELECT DISTINCT ?turn ?tool ?n
           WHERE { ?turn usedTool ?tool .
                   { SELECT ?tool (COUNT(?t) AS ?n)
                     WHERE { ?t usedTool ?tool } } }"""
    got = _rows(sparql(tri, q))
    assert set(got) == {("turn:a/0", "tool:grep", 1), ("turn:a/1", "tool:sed", 1)}


def test_subquery_only_where_body(tri):
    q = """SELECT ?tool ?n
           WHERE { { SELECT ?tool (COUNT(*) AS ?n)
                     WHERE { ?t usedTool ?tool } } }"""
    got = _rows(sparql(tri, q))
    assert set(got) == {("tool:grep", 1), ("tool:sed", 1)}


def test_subquery_limit_inside(tri):
    # inner ORDER BY + LIMIT runs before the outer join (top-1 tool)
    q = """SELECT DISTINCT ?turn ?tool
           WHERE { ?turn usedTool ?tool .
                   { SELECT ?tool (COUNT(?t) AS ?n)
                     WHERE { ?t usedTool ?tool }
                     ORDER BY ?n DESC ?tool LIMIT 1 } }"""
    got = _rows(sparql(tri, q))
    assert set(got) == {("turn:a/0", "tool:grep")}


def test_if_and_coalesce_in_bind_and_filter(tri):
    q = """SELECT DISTINCT ?turn ?flag
           WHERE { ?c hasTurn ?turn . OPTIONAL { ?turn usedTool ?tool } .
                   BIND(IF(COALESCE(?tool, 'none') = 'none',
                           'silent', 'tooluse') AS ?flag) }"""
    got = _rows(sparql(tri, q))
    assert set(got) == {
        ("turn:a/0", "tooluse"), ("turn:a/1", "tooluse"),
        ("turn:b/0", "silent"),
    }
    q2 = """SELECT DISTINCT ?t WHERE { ?t usedTool ?tool .
            FILTER(IF(CONTAINS(?tool, 'grep'), 'k', 'd') = 'k') }"""
    assert set(_rows(sparql(tri, q2))) == {("turn:a/0",)}


def test_if_literal_with_bang_stays_inert(tri):
    # the ADVICE-r02 hazard class applied to the new conditionals: a
    # literal containing '!' inside IF must never meet the NOT rewrite
    q = """SELECT DISTINCT ?turn ?m
           WHERE { ?turn usedTool ?tool .
                   BIND(IF(?tool = 'tool:grep', 'a!b', 'c&&d') AS ?m) }"""
    got = _rows(sparql(tri, q))
    assert set(got) == {("turn:a/0", "a!b"), ("turn:a/1", "c&&d")}


def test_filter_in_and_not_in(tri):
    got = sorted(r["t"] for r in sparql(
        tri, "SELECT ?t WHERE { ?t usedTool ?x . "
             "FILTER(?x IN ('tool:grep', 'tool:nope')) }").collect())
    assert got == ["turn:a/0"]
    got = sorted(r["t"] for r in sparql(
        tri, "SELECT ?t WHERE { ?t usedTool ?x . "
             "FILTER(?x NOT IN ('tool:grep', 'tool:nope')) }").collect())
    assert got == ["turn:a/1"]


def test_sample_aggregate_is_deterministic_min(tri):
    rows = {r["c"]: r["one"] for r in sparql(
        tri, "SELECT ?c (SAMPLE(?t) AS ?one) WHERE { ?c hasTurn ?t }"
    ).collect()}
    assert rows == {"conv:a": "turn:a/0", "conv:b": "turn:b/0"}


def test_construct_where_shorthand(tri):
    got = {tuple(r) for r in sparql(
        tri, "CONSTRUCT WHERE { ?c hasTurn ?t . ?t usedTool ?x }"
    ).collect()}
    assert got == {
        ("conv:a", "hasTurn", "turn:a/0"),
        ("conv:a", "hasTurn", "turn:a/1"),
        ("turn:a/0", "usedTool", "tool:grep"),
        ("turn:a/1", "usedTool", "tool:sed"),
    }
    # the body must be a plain BGP — FILTER inside is rejected loudly
    with pytest.raises(ValueError):
        parse_sparql(
            "CONSTRUCT WHERE { ?c hasTurn ?t . FILTER(?t != 'x') }")


def test_strbefore_strafter_bind(tri):
    rows = {(r["t"], r["kind"], r["name"]) for r in sparql(
        tri, "SELECT ?t ?kind ?name WHERE { ?t usedTool ?x . "
             "BIND(STRBEFORE(?x, ':') AS ?kind) . "
             "BIND(STRAFTER(?x, ':') AS ?name) }").collect()}
    assert rows == {("turn:a/0", "tool", "grep"),
                    ("turn:a/1", "tool", "sed")}
    # absent separator -> '' (the spec behavior substring_index lacks)
    rows = sorted(r["b"] for r in sparql(
        tri, "SELECT ?b WHERE { ?t usedTool ?x . "
             "BIND(STRAFTER(?x, 'zzz') AS ?b) }").collect())
    assert rows == ["", ""]


def test_anonymous_bnode_patterns(tri):
    # object position, multi-predicate; solution per matching turn
    got = sorted(r["c"] for r in sparql(
        tri, "SELECT ?c WHERE { ?c hasTurn "
             "[ usedTool 'tool:grep' ; hasRole 'role:tool' ] }").collect())
    assert got == ["conv:a"]
    # multiset semantics: both of conv:a's turns match hasRole role:tool
    got = sorted(r["c"] for r in sparql(
        tri, "SELECT ?c WHERE { ?c hasTurn [ hasRole 'role:tool' ] }"
    ).collect())
    assert got == ["conv:a", "conv:a"]
    # unbalanced bracket is rejected loudly
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?c WHERE { ?c hasTurn [ hasRole 'x' }")


def test_grouped_property_paths(spark):
    rows = [("a", "p", "b"), ("b", "p", "c"), ("a", "q", "d"),
            ("d", "r", "e"), ("c", "r", "f")]
    tri = spark.createDataFrame(rows, "subj string, pred string, obj string")

    def run(q):
        return sorted(tuple(r) for r in sparql(tri, q).collect())

    # grouped alternation feeding a sequence step
    assert run("SELECT ?x ?y WHERE { ?x (p|q)/r ?y }") == [
        ("a", "e"), ("b", "f")]
    # closure over a composite edge set
    assert run("SELECT ?y WHERE { a (p|q)+ ?y }") == [
        ("b",), ("c",), ("d",)]
    # inverse of a composed relation
    assert run("SELECT ?y WHERE { c ^(p/p) ?y }") == [("a",)]
    # ungrouped forms keep their round-2 semantics
    assert run("SELECT ?y WHERE { a p+ ?y }") == [("b",), ("c",)]
    # unbalanced parens are rejected loudly
    with pytest.raises(ValueError):
        sparql(tri, "SELECT ?y WHERE { a (p|q ?y }").collect()


def test_group_scoped_filters_in_exists_minus(tri):
    # NOT EXISTS whose filter narrows the group: only grep-using turns
    # gate their conv out
    got = sorted(r["c"] for r in sparql(
        tri, "SELECT DISTINCT ?c WHERE { ?c hasTurn ?t . "
             "FILTER NOT EXISTS { ?t usedTool ?x . "
             "FILTER(regex(?x, 'sed')) } }").collect())
    assert got == ["conv:a", "conv:b"]  # only turn:a/1 is gated out
    got = sorted(r["c"] for r in sparql(
        tri, "SELECT DISTINCT ?c WHERE { ?c hasTurn ?t . "
             "FILTER EXISTS { ?t usedTool ?x . "
             "FILTER(?x = 'tool:sed') } }").collect())
    assert got == ["conv:a"]
    got = sorted((r["c"], r["t"]) for r in sparql(
        tri, "SELECT ?c ?t WHERE { ?c hasTurn ?t . "
             "MINUS { ?t usedTool ?x . FILTER(?x != 'tool:sed') } }"
    ).collect())
    assert got == [("conv:a", "turn:a/1"), ("conv:b", "turn:b/0")]
    # a filter on a var the group does not bind is correlated — rejected
    with pytest.raises(ValueError):
        sparql(tri, "SELECT ?c WHERE { ?c hasTurn ?t . "
                    "FILTER NOT EXISTS { ?t usedTool ?x . "
                    "FILTER(?c = 'conv:a') } }").collect()


def test_order_by_function_spellings(tri):
    rows = [r["t"] for r in sparql(
        tri, "SELECT ?t WHERE { ?c hasTurn ?t } ORDER BY DESC(?t)"
    ).collect()]
    assert rows == sorted(rows, reverse=True) and len(rows) == 3
    rows = [r["t"] for r in sparql(
        tri, "SELECT ?t WHERE { ?c hasTurn ?t } ORDER BY ASC(?t)"
    ).collect()]
    assert rows == sorted(rows)
    # mixed keys parse unambiguously: ?c then DESC(?t)
    rows = [(r["c"], r["t"]) for r in sparql(
        tri, "SELECT ?c ?t WHERE { ?c hasTurn ?t } ORDER BY ?c DESC(?t)"
    ).collect()]
    assert rows == sorted(rows, key=lambda x: (x[0],)) and \
        rows[0] == ("conv:a", "turn:a/1")
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?t WHERE { ?c hasTurn ?t } ORDER BY MAX(?t)")


QUADS = [
    ("s1", "p", "o1", "g1"),
    ("s2", "p", "o2", "g2"),
    ("s1", "q", "x", "g1"),
    ("s3", "p", "o3", "g2"),
    ("s1", "p", "o9", "g2"),  # same subj in a second graph
]


@pytest.fixture(scope="module")
def quads(spark):
    return spark.createDataFrame(
        QUADS, "subj string, pred string, obj string, graph string"
    )


def test_graph_constant_prunes_to_one_graph(quads):
    got = _rows(sparql(quads, "SELECT ?s ?o WHERE { GRAPH g1 { ?s p ?o } }"))
    assert got == [("s1", "o1")]


def test_graph_variable_binds_graph_column(quads):
    got = _rows(sparql(
        quads, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s p ?o } }"))
    assert got == [("g1", "s1", "o1"), ("g2", "s1", "o9"),
                   ("g2", "s2", "o2"), ("g2", "s3", "o3")]


def test_graph_group_shares_g_across_patterns(quads):
    # both patterns inside the group carry the same ?g: s1 matches only
    # in g1, where both its p and q quads live — the g2 copy of s1 has
    # no q quad, so ?g=g2 yields nothing
    got = _rows(sparql(
        quads, "SELECT ?g ?o WHERE { GRAPH ?g { s1 p ?o . s1 q ?x } }"))
    assert got == [("g1", "o1")]


def test_graph_mixed_with_default_pattern(quads):
    # the default-graph pattern matches ALL quads (union default graph)
    got = _rows(sparql(
        quads, "SELECT ?s WHERE { ?s q ?x . GRAPH g2 { ?s p ?o } }"))
    assert got == [("s1",)]


def test_graph_group_scoped_filter(quads):
    got = _rows(sparql(
        quads,
        "SELECT ?s WHERE { GRAPH g2 { ?s p ?o . FILTER(?o != 'o2') } }"))
    assert got == [("s1",), ("s3",)]


def test_graph_rejections(quads, tri):
    # a GRAPH pattern against a triples-only frame names the missing column
    with pytest.raises(ValueError, match="graph"):
        sparql(tri, "SELECT ?s WHERE { GRAPH g1 { ?s hasTurn ?o } }").collect()
    # property paths under a VARIABLE graph are outside the subset
    with pytest.raises(ValueError, match="path"):
        sparql(quads, "SELECT ?s WHERE { GRAPH ?g { ?s p+ ?o } }").collect()
    # ... but a constant graph confines the traversal and works
    got = _rows(sparql(
        quads, "SELECT ?o WHERE { GRAPH g1 { s1 p+ ?o } }"))
    assert got == [("o1",)]
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?s WHERE { GRAPH { ?s p ?o } }")


# ---------------------------------------------------------------------------
# FROM / FROM NAMED dataset clause
# ---------------------------------------------------------------------------


def test_from_merges_named_graphs_into_default(quads):
    # default graph = g1 only: g2's rows are invisible to plain patterns
    got = _rows(sparql(
        quads, "SELECT ?s ?o FROM g1 WHERE { ?s p ?o }"))
    assert got == [("s1", "o1")]
    # merge of both graphs
    got = _rows(sparql(
        quads, "SELECT ?s ?o FROM g1 FROM g2 WHERE { ?s p ?o }"))
    assert got == [("s1", "o1"), ("s1", "o9"), ("s2", "o2"), ("s3", "o3")]


def test_from_named_restricts_graph_patterns(quads):
    # GRAPH ?g ranges over FROM NAMED graphs only
    got = _rows(sparql(quads, """
        SELECT ?g ?s FROM NAMED g2 WHERE { GRAPH ?g { ?s p ?o } }"""))
    assert got == [("g2", "s1"), ("g2", "s2"), ("g2", "s3")]
    # a constant GRAPH outside FROM NAMED sees nothing
    assert sparql(quads, """
        SELECT ?s FROM NAMED g2 WHERE { GRAPH g1 { ?s p ?o } }"""
    ).count() == 0
    # FROM NAMED only -> the default graph is EMPTY
    assert sparql(
        quads, "SELECT ?s FROM NAMED g1 WHERE { ?s p ?o }").count() == 0


def test_from_and_from_named_compose(quads):
    # default = g1, named = g2: join a default pattern with a GRAPH one
    got = _rows(sparql(quads, """
        SELECT ?s ?o2 FROM g1 FROM NAMED g2
        WHERE { ?s q x . GRAPH g2 { ?s p ?o2 } }"""))
    assert got == [("s1", "o9")]
    # without the clause, default patterns match ALL quads (the
    # no-dataset union convention is unchanged)
    assert len(_rows(sparql(quads, "SELECT ?s WHERE { ?s p ?o }"))) == 4


def test_from_inside_groups_and_literals_stays_inert(quads):
    # bareword FROM inside braces is a term, not a clause
    pq = parse_sparql("SELECT ?s WHERE { ?s FROM ?o }")
    assert pq.patterns == [("?s", "FROM", "?o")] and not pq.from_graphs
    # dataset applies inside OPTIONAL/EXISTS groups too
    got = _rows(sparql(quads, """
        SELECT ?s ?x FROM g2 WHERE {
          ?s p ?o . OPTIONAL { ?s q ?x } }"""))
    # s1's q-triple lives in g1 -> invisible, OPTIONAL leaves null
    assert got == [("s1", None), ("s2", None), ("s3", None)]


def test_from_needs_quads_and_paths_follow_dataset(spark, quads):
    tri = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="graph"):
        sparql(tri, "SELECT ?s FROM g1 WHERE { ?s p ?o }").collect()
    # property path over the merged default graph: closure confined to g1
    g = spark.createDataFrame(
        [("a", "n", "b", "g1"), ("b", "n", "c", "g2")],
        "subj string, pred string, obj string, graph string")
    got = _rows(sparql(g, "SELECT ?x FROM g1 WHERE { a n+ ?x }"))
    assert got == [("b",)]  # b->c lives in g2, outside the dataset
    got = _rows(sparql(g, "SELECT ?x FROM g1 FROM g2 WHERE { a n+ ?x }"))
    assert got == [("b",), ("c",)]


def test_group_concat_separator(tri, spark):
    g = spark.createDataFrame(
        [("s1", "p", "a"), ("s1", "p", "b"), ("s2", "p", "c"),
         ("s1", "p", "a")],
        "subj string, pred string, obj string")
    got = _rows(sparql(g, """
        SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=', ') AS ?all)
        WHERE { ?s p ?o } ORDER BY ?s"""))
    assert got == [("s1", "a, a, b"), ("s2", "c")]
    got = _rows(sparql(g, """
        SELECT ?s (GROUP_CONCAT(DISTINCT ?o; SEPARATOR='|') AS ?all)
        WHERE { ?s p ?o } ORDER BY ?s"""))
    assert got == [("s1", "a|b"), ("s2", "c")]
    # default separator unchanged
    got = _rows(sparql(g, """
        SELECT ?s (GROUP_CONCAT(?o) AS ?all) WHERE { ?s p ?o }
        ORDER BY ?s"""))
    assert got == [("s1", "a;a;b"), ("s2", "c")]
    with pytest.raises(ValueError, match="SEPARATOR"):
        sparql(g, "SELECT ?s (SUM(?o; SEPARATOR=';') AS ?n) "
                  "WHERE { ?s p ?o }")


def test_service_federation_joins_on_shared_vars(spark, tri):
    remote = spark.createDataFrame(
        [("ext:1", "about", "tool:grep"), ("ext:2", "about", "tool:awk")],
        "subj string, pred string, obj string")
    got = _rows(sparql(
        tri,
        """SELECT ?turn ?doc WHERE {
             ?turn usedTool ?tool .
             SERVICE <svc:docs> { ?doc about ?tool } }""",
        services={"svc:docs": remote}))
    assert got == [("turn:a/0", "ext:1")]


def test_service_silent_absent_is_neutral(tri):
    got = _rows(sparql(
        tri,
        """SELECT ?conv WHERE {
             ?conv hasTurn ?t .
             SERVICE SILENT <svc:gone> { ?conv annotated ?x } }"""))
    assert ("conv:a",) in got and ("conv:b",) in got


def test_service_absent_endpoint_raises(tri):
    with pytest.raises(ValueError, match="not registered"):
        sparql(tri,
               "SELECT ?x WHERE { SERVICE <svc:gone> { ?x p ?y } }"
               ).collect()


def test_service_only_query_and_group_filter(spark, tri):
    remote = spark.createDataFrame(
        [("ext:1", "score", "9"), ("ext:2", "score", "3")],
        "subj string, pred string, obj string")
    got = _rows(sparql(
        tri,
        """SELECT ?d WHERE {
             SERVICE <svc:r> { ?d score ?s . FILTER(?s = '9') } }""",
        services={"svc:r": remote}))
    assert got == [("ext:1",)]


def test_service_prefixed_endpoint_expands(spark, tri):
    remote = spark.createDataFrame(
        [("ext:1", "about", "tool:sed")],
        "subj string, pred string, obj string")
    got = _rows(sparql(
        tri,
        """PREFIX svc: <http://ex.org/svc#>
           SELECT ?doc WHERE {
             SERVICE svc:docs { ?doc about 'tool:sed' } }""",
        services={"http://ex.org/svc#docs": remote}))
    assert got == [("ext:1",)]


def test_service_variable_endpoint_rejected(tri):
    with pytest.raises(ValueError, match="variable SERVICE endpoint"):
        sparql(tri, "SELECT ?x WHERE { SERVICE ?ep { ?x p ?y } }")


def test_stats_ordering_beats_constant_count(spark):
    """ANALYZE stats: two patterns with the SAME constant count, one
    over a huge predicate, one over a 2-row predicate — the stats
    ordering starts from the small one; the heuristic ordering cannot
    tell them apart.  Results are identical either way (ordering is
    physical only)."""
    from logset_spark.operators.sparql import (
        GraphStats, _order_patterns, analyze,
    )

    big = [(f"s{i}", "bigPred", f"o{i % 50}") for i in range(5000)]
    small = [("s1", "smallPred", "x"), ("s7", "smallPred", "x")]
    g = spark.createDataFrame(big + small,
                              "subj string, pred string, obj string")
    stats = analyze(g)
    assert stats.total == 5002
    assert stats.pred_counts["smallPred"] == 2

    pats = [("?s", "bigPred", "?o"), ("?s", "smallPred", "?x")]
    with_stats = _order_patterns(pats, stats)
    assert with_stats[0][1] == "smallPred"
    # heuristic order is constant-count only: first listed wins the tie
    assert _order_patterns(pats)[0][1] == "bigPred"

    q = "SELECT ?s ?o WHERE { ?s bigPred ?o . ?s smallPred ?x }"
    assert _rows(sparql(g, q, stats=stats)) == _rows(sparql(g, q))


def test_stats_estimate_uses_bound_vars(spark):
    """A var already bound counts as selective: among two connected
    candidates the estimator divides by the distinct count on the
    bound side."""
    from logset_spark.operators.sparql import GraphStats, _estimate

    stats = GraphStats(
        total=1000,
        pred_counts={"p": 900, "q": 100},
        pred_subj={"p": 900, "q": 10},
        pred_obj={"p": 3, "q": 100},
    )
    # unbound: |p| = 900 beats |q| = 100
    assert _estimate(("?a", "p", "?b"), stats, set()) == 900.0
    assert _estimate(("?a", "q", "?b"), stats, set()) == 100.0
    # ?a bound: p shrinks by distinct-subj 900 -> 1; q by 10 -> 10
    assert _estimate(("?a", "p", "?b"), stats, {"a"}) == 1.0
    assert _estimate(("?a", "q", "?b"), stats, {"a"}) == 10.0


def test_group_by_explicit_equals_implicit(tri):
    q_imp = "SELECT ?conv (COUNT(?turn) AS ?n) WHERE { ?conv hasTurn ?turn }"
    q_exp = ("SELECT ?conv (COUNT(?turn) AS ?n) "
             "WHERE { ?conv hasTurn ?turn } GROUP BY ?conv")
    assert _rows(sparql(tri, q_exp)) == _rows(sparql(tri, q_imp))


def test_group_by_superset_projection(tri):
    """GROUP BY keys beyond the projected vars: per-(conv, tool) counts
    projected down to ?tool — grep and sed each appear once (one conv
    each here), and duplicates across groups would be KEPT."""
    q = ("SELECT ?tool (COUNT(?turn) AS ?n) "
         "WHERE { ?conv hasTurn ?turn . ?turn usedTool ?tool } "
         "GROUP BY ?conv ?tool")
    assert _rows(sparql(tri, q)) == [("tool:grep", 1), ("tool:sed", 1)]


def test_group_by_no_aggregates_one_row_per_group(tri):
    q = "SELECT ?role WHERE { ?t hasRole ?role } GROUP BY ?role"
    assert _rows(sparql(tri, q)) == [("role:tool",), ("role:user",)]


def test_group_by_having_over_group_key(tri):
    q = ("SELECT ?conv (COUNT(?turn) AS ?n) "
         "WHERE { ?conv hasTurn ?turn } GROUP BY ?conv HAVING(?n > 1)")
    assert _rows(sparql(tri, q)) == [("conv:a", 2)]


def test_group_by_rejects_ungrouped_projection():
    with pytest.raises(ValueError, match="non-grouped"):
        parse_sparql("SELECT ?s ?p WHERE { ?s ?p ?o } GROUP BY ?p")


def test_group_by_rejects_expression():
    with pytest.raises(ValueError):
        parse_sparql(
            "SELECT ?p WHERE { ?s ?p ?o } GROUP BY (STRLEN(?p))")


def test_comments_stripped_outside_literals_and_iris(tri):
    q = """# leading comment
    SELECT ?conv   # trailing comment
    WHERE {
      ?conv hasTurn ?t .   # per-pattern comment
      FILTER(?t != 'x#y')  # hash inside literal survives
    }"""
    assert _rows(sparql(tri, q)) == [("conv:a",), ("conv:a",), ("conv:b",)]


def test_iri_fragment_not_a_comment(tri):
    # <...#...> is an IRI with a fragment, not a comment start
    q = "SELECT ?s WHERE { ?s <http://ex.org/v#hasTurn> ?t }"
    assert _rows(sparql(tri, q)) == []


def test_semicolon_predicate_object_list(tri):
    q = ("SELECT ?t WHERE "
         "{ ?t usedTool tool:grep ; hasRole role:tool }")
    assert _rows(sparql(tri, q)) == [("turn:a/0",)]


def test_comma_object_list(spark):
    t = spark.createDataFrame(
        [("t1", "mentions", "ent:p"), ("t1", "mentions", "ent:q"),
         ("t2", "mentions", "ent:p")],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?t WHERE { ?t mentions ent:p , ent:q }"
    assert _rows(sparql(t, q)) == [("t1",)]


def test_po_list_rejections():
    with pytest.raises(ValueError, match="3 terms"):
        parse_sparql("SELECT ?t WHERE { ?t usedTool ; x }")
    with pytest.raises(ValueError, match="2 terms"):
        parse_sparql("SELECT ?t WHERE { ?t p o ; q }")
    with pytest.raises(ValueError, match="1 term"):
        parse_sparql("SELECT ?t WHERE { ?t mentions ent:p , ent:q r }")


def test_group_by_order_by_non_projected_key(tri):
    """SPARQL algebra: OrderBy runs before Project, so ordering by a
    group key the SELECT list drops is legal."""
    q = ("SELECT ?tool (COUNT(?turn) AS ?n) "
         "WHERE { ?conv hasTurn ?turn . ?turn usedTool ?tool } "
         "GROUP BY ?conv ?tool ORDER BY ?conv ?tool")
    got = [tuple(r) for r in sparql(tri, q).collect()]
    assert got == [("tool:grep", 1), ("tool:sed", 1)]


def test_group_by_distinct_applies_after_projection(spark):
    """Distinct runs AFTER Project: the same tool grouped under two
    conversations projects to two equal rows, which DISTINCT dedups."""
    t = spark.createDataFrame(
        [("c1", "hasTurn", "t1"), ("c2", "hasTurn", "t2"),
         ("t1", "usedTool", "grep"), ("t2", "usedTool", "grep")],
        "subj string, pred string, obj string",
    )
    q_plain = ("SELECT ?tool WHERE "
               "{ ?c hasTurn ?t . ?t usedTool ?tool } GROUP BY ?c ?tool")
    assert _rows(sparql(t, q_plain)) == [("grep",), ("grep",)]
    q_dist = q_plain.replace("SELECT ?tool", "SELECT DISTINCT ?tool")
    assert _rows(sparql(t, q_dist)) == [("grep",)]


def test_stats_save_load_roundtrip_and_same_ordering(spark, tmp_path):
    """save_stats/load_stats: the persisted rows rebuild a GraphStats
    whose estimates (and therefore join orderings) match the fresh
    ANALYZE exactly — total, per-pred counts, distinct estimates."""
    from logset_spark.operators.sparql import analyze, load_stats, save_stats

    t = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "x"), ("a", "q", "y"),
         ("a", "q", "z"), ("c", "r", "x")],
        "subj string, pred string, obj string",
    )
    fresh = analyze(t)
    path = str(tmp_path / "stats")
    save_stats(fresh, spark, path)
    loaded = load_stats(spark, path)
    assert loaded.total == fresh.total == 5
    assert loaded.pred_counts == fresh.pred_counts
    assert loaded.pred_subj == fresh.pred_subj
    assert loaded.pred_obj == fresh.pred_obj


def test_declared_prefix_query_matches_declared_prefix_catalog(spark, tmp_path):
    """Both sides declare the owl/rdfs prefixes: the loader folds the
    data to canonical short vocab and _const_term folds the query's
    expanded <iri> constants the same way, so entailment-flagged
    queries keep matching (regression: canonicalizing only the data
    side silently emptied these results)."""
    from logset_spark.operators.inference import rdfs_materialize
    from logset_spark.operators.sparql import sparql
    from logset_spark.sources.turtle import load_turtle

    ttl = tmp_path / "declared.ttl"
    ttl.write_text(
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:Dog rdfs:subClassOf ex:Animal .\n"
        "ex:rex rdf:type ex:Dog .\n"
    )
    g = rdfs_materialize(load_turtle(spark, str(ttl)))
    q = (
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        "PREFIX ex: <http://example.org/> "
        "SELECT ?s WHERE { ?s rdf:type ex:Animal }"
    )
    rows = sparql(g, q).collect()
    assert [r["s"] for r in rows] == ["http://example.org/rex"]


# ---- round-4 conformance sweep (VERDICT r03 item 6) ------------------------
# The probed forms must either evaluate with spec semantics or reject
# loudly — the sweep found VALUES-UNDEF and {n,m} path bounds silently
# returning empty, fixed here; nested OPTIONAL's reject message made
# explicit; bracketed identity ORDER BY forms accepted.


class TestConformanceSweepR4:
    @staticmethod
    def _chain(spark):
        rows = [
            ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
            ("a", "q", "x"), ("b", "q", "y"),
            ("a", "name", "alice"), ("b", "name", "bob"),
        ]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    def _rows(self, spark, q):
        from logset_spark.operators.sparql import sparql

        return sorted(
            (tuple(r) for r in sparql(self._chain(spark), q).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    def test_values_undef_wildcard(self, spark):
        got = self._rows(
            spark,
            "SELECT ?s ?o WHERE { ?s <p> ?o . "
            "VALUES (?s ?o) { ('a' UNDEF) (UNDEF 'd') } }")
        assert got == [("a", "b"), ("c", "d")]

    def test_values_undef_single_var_matches_all(self, spark):
        got = self._rows(
            spark, "SELECT ?s WHERE { ?s <p> ?o . VALUES ?s { UNDEF } }")
        assert got == [("a",), ("b",), ("c",)]

    def test_values_quoted_undef_is_a_plain_literal(self, spark):
        assert self._rows(
            spark, "SELECT ?s WHERE { ?s <name> 'UNDEF' }") == []

    def test_values_only_body_seeds_undef_as_unbound(self, spark):
        got = self._rows(
            spark, "SELECT ?a ?b WHERE { VALUES (?a ?b) { ('x' UNDEF) } }")
        assert got == [("x", None)]

    def test_values_undef_binds_optional_unbound_var(self, spark):
        # compatible-solutions: an acc var left unbound by OPTIONAL is
        # compatible with a VALUES constant, which then binds it
        got = self._rows(
            spark,
            "SELECT ?s ?n WHERE { ?s <p> ?o . OPTIONAL { ?s <name> ?n } "
            "VALUES ?n { 'anon' UNDEF } }")
        # c has no name: 'anon' binds; every row also matches UNDEF as-is
        assert ("c", "anon") in got and ("a", "alice") in got

    def test_path_exact_bound(self, spark):
        assert self._rows(spark, "SELECT ?s ?o WHERE { ?s <p>{2} ?o }") == [
            ("a", "c"), ("b", "d")]

    def test_path_range_bound(self, spark):
        assert self._rows(
            spark, "SELECT ?s ?o WHERE { ?s <p>{1,2} ?o }") == [
            ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]

    def test_path_open_bound_uses_closure(self, spark):
        assert self._rows(
            spark, "SELECT ?s ?o WHERE { ?s <p>{2,} ?o }") == [
            ("a", "c"), ("a", "d"), ("b", "d")]

    def test_path_bound_composes_in_sequence(self, spark):
        assert self._rows(
            spark, "SELECT ?s ?o WHERE { ?s <p>{1}/<q> ?o }") == [("a", "y")]
        assert self._rows(
            spark, "SELECT ?s ?o WHERE { ?s <p>{2}/<q> ?o }") == []

    def test_path_bound_rejections(self, spark):
        import pytest

        with pytest.raises(ValueError, match="bound above"):
            self._rows(spark, "SELECT ?s ?o WHERE { ?s <p>{1,50} ?o }")
        with pytest.raises(ValueError, match="bad path quantifier"):
            self._rows(spark, "SELECT ?s ?o WHERE { ?s <p>{x} ?o }")
        with pytest.raises(ValueError, match="m < n"):
            self._rows(spark, "SELECT ?s ?o WHERE { ?s <p>{3,2} ?o }")

    def test_order_by_identity_expression_forms(self, spark):
        a = self._rows(spark, "SELECT ?s WHERE { ?s <p> ?o } ORDER BY (?s)")
        b = self._rows(
            spark, "SELECT ?s WHERE { ?s <p> ?o } ORDER BY DESC(STR(?s))")
        assert a == b == [("a",), ("b",), ("c",)]

    def test_order_by_general_expression_rejects(self, spark):
        import pytest

        with pytest.raises(ValueError, match="ORDER BY"):
            self._rows(
                spark,
                "SELECT ?s WHERE { ?s <p> ?o } ORDER BY LCASE(?s)")

    def test_nested_optional_rejects_loudly(self, spark):
        import pytest

        with pytest.raises(ValueError, match="nested OPTIONAL"):
            self._rows(
                spark,
                "SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { ?s <name> ?n "
                "OPTIONAL { ?s <q> ?y } } }")


class TestTermTestsAndPathKeyword:
    """Round-4 sweep batch 2: the `a` keyword inside property paths
    (silently empty before — `?s a/subClassOf* ?c` is the canonical
    instance-of-transitive-class idiom) and the RDF term-test builtins
    over the engine's implicit term shapes."""

    @staticmethod
    def _g(spark):
        rows = [
            ("dog", "rdf:type", "Dog"), ("Dog", "rdfs:subClassOf", "Animal"),
            ("Animal", "rdfs:subClassOf", "Thing"),
            ("x", "name", "Alice"), ("_:b1", "name", "bob"),
            ("x", "knows", "_:b1"), ("x", "mail", "mailto:a@x.org"),
        ]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    def _rows(self, spark, q):
        from logset_spark.operators.sparql import sparql

        return sorted(tuple(r) for r in sparql(self._g(spark), q).collect())

    def test_a_keyword_in_property_path(self, spark):
        got = self._rows(
            spark, "SELECT ?s ?c WHERE { ?s a/<rdfs:subClassOf>* ?c }")
        assert got == [("dog", "Animal"), ("dog", "Dog"), ("dog", "Thing")]

    def test_sameterm_is_lexical_equality(self, spark):
        got = self._rows(
            spark,
            "SELECT ?s WHERE { ?s <name> ?v . FILTER(sameTerm(?v, 'bob')) }")
        assert got == [("_:b1",)]

    def test_isblank_and_negation(self, spark):
        assert self._rows(
            spark,
            "SELECT ?s WHERE { ?s <name> ?v . FILTER(isBlank(?s)) }",
        ) == [("_:b1",)]
        assert self._rows(
            spark,
            "SELECT ?s WHERE { ?s <name> ?v . FILTER(!isBlank(?s)) }",
        ) == [("x",)]

    def test_isiri_and_isliteral_shape_tests(self, spark):
        assert self._rows(
            spark,
            "SELECT ?o WHERE { ?s <mail> ?o . FILTER(isIRI(?o)) }",
        ) == [("mailto:a@x.org",)]
        assert self._rows(
            spark,
            "SELECT ?v WHERE { ?s <name> ?v . FILTER(isLiteral(?v)) }",
        ) == [("Alice",), ("bob",)]


def test_construct_template_rejects_property_path(spark):
    """Round-4 sweep: a path in a CONSTRUCT template used to emit a
    garbage predicate string ('<p>+') silently; now rejects loudly.
    Evaluating the path in WHERE and binding stays supported."""
    import pytest

    from logset_spark.operators.sparql import sparql

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")],
        "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="CONSTRUCT template"):
        sparql(t, "CONSTRUCT { ?s <p>+ ?o } WHERE { ?s <p> ?o }").collect()
    # the supported spelling: path in WHERE, plain pred in template
    got = sorted(
        tuple(r) for r in sparql(
            t, "CONSTRUCT { ?s <reach> ?o } WHERE { ?s <p>+ ?o }"
        ).collect())
    assert got == [("a", "reach", "b"), ("a", "reach", "c"),
                   ("b", "reach", "c")]


def test_select_expression_projection_and_order_by_expr(spark):
    """Round-5 (VERDICT r04 item 6): SELECT (expr AS ?v) lowers onto the
    BIND machinery; ORDER BY accepts a parenthesized general expression
    through the same depth-2 grammar.  The alias is referenceable from
    ORDER BY (extend-before-OrderBy algebra)."""
    from logset_spark.operators.sparql import sparql

    t = spark.createDataFrame(
        [("t:1", "usedTool", "bash"), ("t:2", "usedTool", "webfetch"),
         ("t:3", "usedTool", "grep")],
        "subj string, pred string, obj string")
    got = sparql(
        t,
        """SELECT ?t (STRLEN(?tool) AS ?len) (UCASE(?tool) AS ?up)
           WHERE { ?t usedTool ?tool }
           ORDER BY DESC(?len) (STRLEN(?t))""").collect()
    assert [tuple(r) for r in got] == [
        ("t:2", 8, "WEBFETCH"), ("t:1", 4, "BASH"), ("t:3", 4, "GREP")]
    # ORDER BY referencing the select-expr alias directly
    got2 = sparql(
        t,
        """SELECT (CONCAT(?tool, '!') AS ?x) WHERE { ?t usedTool ?tool }
           ORDER BY (?x) LIMIT 1""").collect()
    assert [tuple(r) for r in got2] == [("bash!",)]


def test_select_expression_rejects(spark):
    """Loud rejects: mixing (expr AS ?v) with aggregates, with *, and an
    alias colliding with a projected var."""
    import pytest

    from logset_spark.operators.sparql import sparql

    t = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="alongside aggregates"):
        sparql(t, "SELECT (COUNT(?o) AS ?n) (STRLEN(?s) AS ?l) "
                  "WHERE { ?s p ?o }")
    with pytest.raises(ValueError, match=r"mix \* with|SELECT list must be"):
        sparql(t, "SELECT * (STRLEN(?s) AS ?l) WHERE { ?s p ?o }")
    with pytest.raises(ValueError, match="collides"):
        sparql(t, "SELECT ?s (STRLEN(?o) AS ?s) WHERE { ?s p ?o }")
    with pytest.raises(ValueError, match="ORDER BY"):
        sparql(t, "SELECT ?s WHERE { ?s p ?o } ORDER BY STRLEN(?o)")


def test_optional_word_as_var_and_pname_not_rejected(spark):
    """ADVICE r04: a variable ?optional or a prefixed name ex:OPTIONAL
    used as ordinary terms must not trip the nested-OPTIONAL reject;
    a stranded brace-less OPTIONAL keyword still rejects loudly."""
    import pytest

    from logset_spark.operators.sparql import sparql

    t = spark.createDataFrame(
        [("s", "ex:OPTIONAL", "v"), ("s", "p", "w")],
        "subj string, pred string, obj string")
    got = sparql(
        t, "SELECT ?optional WHERE { ?s ex:OPTIONAL ?optional }").collect()
    assert [r["optional"] for r in got] == ["v"]
    with pytest.raises(ValueError, match="OPTIONAL"):
        sparql(t, "SELECT ?s WHERE { ?s p ?o . OPTIONAL ?s q ?z }")
