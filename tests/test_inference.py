"""operators/inference.py — RDFS forward chaining checked against a
pure-Python naive fixpoint of the same rules (an independent
formulation; the DuckDB oracle covers it again at sf0.01 via
q_rdfs_infer)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from logset_spark.operators.inference import rdfs_materialize

SCHEMA_PREDS = {
    "rdfs:subClassOf", "rdfs:subPropertyOf", "rdfs:domain", "rdfs:range"
}


def _py_rdfs(triples: list[tuple[str, str, str]]) -> set[tuple[str, str, str]]:
    """Naive rule-at-a-time fixpoint over the same RDFS subset: apply
    rdfs5/7/2/3/9/11 until nothing new, schema slice read-only."""
    out = set(triples)
    sub_prop = {(s, o) for s, p, o in out if p == "rdfs:subPropertyOf"}
    sub_class = {(s, o) for s, p, o in out if p == "rdfs:subClassOf"}
    dom = {(s, o) for s, p, o in out if p == "rdfs:domain"}
    rng = {(s, o) for s, p, o in out if p == "rdfs:range"}
    while True:
        new = set()
        for s, p, o in out:
            if p in SCHEMA_PREDS:
                continue
            for a, b in sub_prop:
                if p == a:
                    new.add((s, b, o))
            for a, c in dom:
                if p == a:
                    new.add((s, "rdf:type", c))
            for a, c in rng:
                if p == a:
                    new.add((o, "rdf:type", c))
            if p == "rdf:type":
                for a, b in sub_class:
                    if o == a:
                        new.add((s, "rdf:type", b))
        if new <= out:
            return out
        out |= new


ONTO = [
    ("usedTool", "rdfs:subPropertyOf", "invoked"),
    ("invoked", "rdfs:domain", "class:Turn"),
    ("usedTool", "rdfs:range", "class:Tool"),
    ("class:Tool", "rdfs:subClassOf", "class:Resource"),
    ("class:Resource", "rdfs:subClassOf", "class:Entity"),
    ("class:Turn", "rdfs:subClassOf", "class:Event"),
]


def _run(spark, rows):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return {tuple(r) for r in rdfs_materialize(df).collect()}


def test_every_rule_fires_and_chains(spark):
    rows = ONTO + [("t1", "usedTool", "grep")]
    got = _run(spark, rows)
    assert got == _py_rdfs(rows)
    # spot-check the chained entailments individually
    assert ("t1", "invoked", "grep") in got          # rdfs7
    assert ("t1", "rdf:type", "class:Turn") in got   # rdfs2 via rdfs7
    assert ("t1", "rdf:type", "class:Event") in got  # rdfs9 on top
    assert ("grep", "rdf:type", "class:Tool") in got      # rdfs3
    assert ("grep", "rdf:type", "class:Entity") in got    # rdfs9/11 2-step
    # nothing invented beyond assertions + entailments
    assert len(got) == len(rows) + 6


def test_untyped_predicates_pass_through(spark):
    rows = [("a", "plainPred", "b")]
    assert _run(spark, rows) == {("a", "plainPred", "b")}


def test_asserted_types_walk_hierarchy(spark):
    rows = [
        ("class:A", "rdfs:subClassOf", "class:B"),
        ("class:B", "rdfs:subClassOf", "class:C"),
        ("x", "rdf:type", "class:A"),
    ]
    got = _run(spark, rows)
    assert ("x", "rdf:type", "class:B") in got
    assert ("x", "rdf:type", "class:C") in got
    assert got == _py_rdfs(rows)


def test_random_graphs_match_python_fixpoint(spark):
    rng = random.Random(5)
    classes = [f"class:C{i}" for i in range(6)]
    props = [f"p{i}" for i in range(5)]
    for trial in range(3):
        rows = set()
        # random DAG-ish schema (upward edges only — acyclic)
        for i in range(1, 6):
            rows.add((classes[i], "rdfs:subClassOf",
                      classes[rng.randrange(i)]))
        for i in range(1, 5):
            rows.add((props[i], "rdfs:subPropertyOf",
                      props[rng.randrange(i)]))
        for p in rng.sample(props, 3):
            rows.add((p, "rdfs:domain", rng.choice(classes)))
        for p in rng.sample(props, 2):
            rows.add((p, "rdfs:range", rng.choice(classes)))
        for i in range(12):
            rows.add((f"n{i}", rng.choice(props), f"n{rng.randrange(12)}"))
        rows.add(("n0", "rdf:type", rng.choice(classes)))
        rows = sorted(rows)
        assert _run(spark, rows) == _py_rdfs(rows), f"trial {trial}"


# ---------------------------------------------------------------------------
# owl_materialize — checked against a pure-Python naive evaluation of the
# same single-pass rule composition (independent formulation: rule-at-a-
# time sets + union-find, vs the DataFrame broadcast-join/closure/CC plan)
# ---------------------------------------------------------------------------

from logset_spark.operators.inference import owl_materialize

PROP_CLASSES = {
    "owl:SymmetricProperty", "owl:TransitiveProperty",
    "owl:FunctionalProperty", "owl:InverseFunctionalProperty",
}


def _py_owl(rows):
    """Naive single-pass OWL-RL-subset evaluation mirroring the
    documented semantics: expand inverse/symmetric, transitive fixpoint,
    FP/IFP + asserted sameAs -> union-find canonical map (min element),
    rewrite every position, star-form membership."""
    import collections

    schema = {
        (s, p, o) for s, p, o in rows
        if p == "owl:inverseOf" or (p == "rdf:type" and o in PROP_CLASSES)
    }
    inst = set(rows) - schema
    inv = {(s, o) for s, p, o in schema if p == "owl:inverseOf"}
    typed = lambda c: {s for s, p, o in schema
                       if p == "rdf:type" and o == c}
    symp, trans, fp, ifp = (
        typed("owl:SymmetricProperty"), typed("owl:TransitiveProperty"),
        typed("owl:FunctionalProperty"),
        typed("owl:InverseFunctionalProperty"),
    )

    full = set(inst)
    for s, p, o in inst:
        for a, b in inv:
            if p == a:
                full.add((o, b, s))
            if p == b:
                full.add((o, a, s))
        if p in symp:
            full.add((o, p, s))
    changed = True
    while changed:
        changed = False
        snapshot = list(full)
        for s, p, o in snapshot:
            if p not in trans:
                continue
            for s2, p2, o2 in snapshot:
                if p2 == p and s2 == o and (s, p, o2) not in full:
                    full.add((s, p, o2))
                    changed = True

    pairs = {(s, o) for s, p, o in full if p == "owl:sameAs"}
    fpg = collections.defaultdict(set)
    ifpg = collections.defaultdict(set)
    for s, p, o in full:
        if p in fp:
            fpg[(p, s)].add(o)
        if p in ifp:
            ifpg[(p, o)].add(s)
    for grp in list(fpg.values()) + list(ifpg.values()):
        m = min(grp)
        pairs |= {(m, x) for x in grp if x != m}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    canon = {x: find(x) for x in parent}
    rw = lambda t: canon.get(t, t)
    out = {(rw(s), rw(p), rw(o)) for s, p, o in full if p != "owl:sameAs"}
    out |= {(x, "owl:sameAs", c) for x, c in canon.items() if x != c}
    return out | schema


OWL_ONTO = [
    ("hasTurn", "owl:inverseOf", "partOf"),
    ("followedBy", "rdf:type", "owl:TransitiveProperty"),
    ("relatedTo", "rdf:type", "owl:SymmetricProperty"),
    ("canonicalKey", "rdf:type", "owl:InverseFunctionalProperty"),
    ("ownedBy", "rdf:type", "owl:FunctionalProperty"),
]


def _run_owl(spark, rows, passes=1):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return {tuple(r) for r in owl_materialize(df, passes=passes).collect()}


def test_owl_every_rule_fires(spark):
    rows = OWL_ONTO + [
        ("conv:1", "hasTurn", "turn:1/0"),
        ("turn:1/1", "partOf", "conv:1"),
        ("turn:1/0", "followedBy", "turn:1/1"),
        ("turn:1/1", "followedBy", "turn:1/2"),
        ("turn:1/2", "followedBy", "turn:1/3"),
        ("conv:1", "relatedTo", "conv:2"),
        ("tool:err", "canonicalKey", "key:1"),
        ("tool:error", "canonicalKey", "key:1"),
        ("doc:a", "ownedBy", "user:1"),
        ("doc:a", "ownedBy", "user:01"),
        ("tool:error", "vendor", "v:acme"),
        ("x:1", "owl:sameAs", "x:2"),
        ("x:2", "owl:sameAs", "x:3"),
    ]
    got = _run_owl(spark, rows)
    assert got == _py_owl(rows)
    # prp-inv, both directions
    assert ("turn:1/0", "partOf", "conv:1") in got
    assert ("conv:1", "hasTurn", "turn:1/1") in got
    # prp-symp
    assert ("conv:2", "relatedTo", "conv:1") in got
    # prp-trp: 3-hop pair
    assert ("turn:1/0", "followedBy", "turn:1/3") in got
    # prp-ifp merge rewrote the vendor triple to the canonical node
    assert ("tool:err", "vendor", "v:acme") in got
    assert ("tool:error", "owl:sameAs", "tool:err") in got
    # prp-fp merge
    assert ("user:1", "owl:sameAs", "user:01") in got
    # eq: asserted chain collapsed in star form to the min element
    assert ("x:2", "owl:sameAs", "x:1") in got
    assert ("x:3", "owl:sameAs", "x:1") in got
    assert ("x:1", "owl:sameAs", "x:2") not in got


def test_owl_single_pass_is_fixpoint_on_fixture(spark):
    rows = OWL_ONTO + [
        ("conv:1", "hasTurn", "turn:1/0"),
        ("turn:1/0", "followedBy", "turn:1/1"),
        ("tool:a", "canonicalKey", "key:1"),
        ("tool:b", "canonicalKey", "key:1"),
        ("tool:b", "vendor", "v:1"),
    ]
    assert _run_owl(spark, rows) == _run_owl(spark, rows, passes=2)


def test_owl_plain_triples_pass_through(spark):
    rows = [("a", "plainPred", "b")]
    assert _run_owl(spark, rows) == {("a", "plainPred", "b")}


def test_owl_random_graphs_match_python(spark):
    rng = random.Random(11)
    preds = [f"p{i}" for i in range(6)]
    nodes = [f"n:{i}" for i in range(10)]
    for trial in range(3):
        rows = set()
        rows.add((preds[0], "owl:inverseOf", preds[1]))
        rows.add((preds[2], "rdf:type", "owl:TransitiveProperty"))
        rows.add((preds[3], "rdf:type", "owl:SymmetricProperty"))
        rows.add((preds[4], "rdf:type", "owl:FunctionalProperty"))
        rows.add((preds[5], "rdf:type", "owl:InverseFunctionalProperty"))
        for _ in range(25):
            rows.add((rng.choice(nodes), rng.choice(preds),
                      rng.choice(nodes)))
        for _ in range(2):
            rows.add((rng.choice(nodes), "owl:sameAs", rng.choice(nodes)))
        rows = sorted(rows)
        assert _run_owl(spark, rows) == _py_owl(rows), f"trial {trial}"


def test_equivalence_chain_entails_both_directions(spark):
    from logset_spark.operators.inference import (
        owl_equivalence_expand,
        rdfs_materialize,
    )

    t = spark.createDataFrame(
        [
            ("cls:a", "owl:equivalentClass", "cls:b"),
            ("cls:b", "owl:equivalentClass", "cls:c"),
            ("x", "rdf:type", "cls:a"),
            ("y", "rdf:type", "cls:c"),
        ],
        "subj string, pred string, obj string",
    )
    out = rdfs_materialize(owl_equivalence_expand(t))
    types = {
        (r["subj"], r["obj"])
        for r in out.where(F.col("pred") == "rdf:type").collect()
    }
    # chain is mutually reachable end-to-end in BOTH directions
    assert {("x", "cls:a"), ("x", "cls:b"), ("x", "cls:c")} <= types
    assert {("y", "cls:a"), ("y", "cls:b"), ("y", "cls:c")} <= types


def test_equivalent_property_generalizes_triples(spark):
    from logset_spark.operators.inference import (
        owl_equivalence_expand,
        rdfs_materialize,
    )

    t = spark.createDataFrame(
        [
            ("p", "owl:equivalentProperty", "q"),
            ("s", "p", "o"),
            ("s2", "q", "o2"),
        ],
        "subj string, pred string, obj string",
    )
    out = rdfs_materialize(owl_equivalence_expand(t))
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert ("s", "q", "o") in got and ("s2", "p", "o2") in got


def test_owl_inconsistencies_report(spark):
    from logset_spark.operators.inference import owl_inconsistencies

    t = spark.createDataFrame(
        [
            # disjointness asserted in BOTH directions -> ONE row
            ("cls:cat", "owl:disjointWith", "cls:dog"),
            ("cls:dog", "owl:disjointWith", "cls:cat"),
            ("x", "rdf:type", "cls:cat"),
            ("x", "rdf:type", "cls:dog"),
            ("ok", "rdf:type", "cls:cat"),
            ("fp", "rdf:type", "owl:FunctionalProperty"),
            ("s", "fp", "v1"),
            ("s", "fp", "v2"),
            ("s", "fp", "v2"),   # duplicate assertion, not a 3rd value
            ("t", "fp", "v1"),   # single value: no violation
            ("t", "np", "v1"),   # non-functional pred: never reported
            ("t", "np", "v2"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {
        (r["kind"], r["node"], r["a"], r["b"])
        for r in owl_inconsistencies(t).collect()
    }
    assert rows == {
        ("disjoint", "x", "cls:cat", "cls:dog"),
        ("functional", "s", "fp", "2"),
    }


class TestPropertyChains:
    def _triples(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def _chain_axiom(self, spark, p, head, members):
        from logset_spark.operators.inference import CHAIN_AXIOM
        from logset_spark.operators.rdflist import list_emit

        m = spark.createDataFrame(
            [(head, i, x) for i, x in enumerate(members)],
            "head string, pos int, member string",
        )
        return self._triples(spark, [(p, CHAIN_AXIOM, head)]).unionByName(
            list_emit(m)
        )

    def test_two_hop_chain(self, spark):
        from logset_spark.operators.inference import property_chains_materialize

        t = self._triples(
            spark,
            [("a", "parent", "b"), ("b", "parent", "c"), ("c", "parent", "d")],
        ).unionByName(self._chain_axiom(spark, "grandparent", "ch:g",
                                        ["parent", "parent"]))
        out = property_chains_materialize(t)
        got = {
            (r["subj"], r["obj"])
            for r in out.where(out["pred"] == "grandparent").collect()
        }
        assert got == {("a", "c"), ("b", "d")}

    def test_length_one_chain_is_subproperty(self, spark):
        from logset_spark.operators.inference import property_chains_materialize

        t = self._triples(spark, [("x", "narrow", "y")]).unionByName(
            self._chain_axiom(spark, "broad", "ch:b", ["narrow"])
        )
        out = property_chains_materialize(t)
        assert out.where(
            (out["pred"] == "broad") & (out["subj"] == "x") & (out["obj"] == "y")
        ).count() == 1

    def test_chain_feeding_chain_needs_second_pass(self, spark):
        """greatgrand = grandparent . parent, where grandparent itself is
        chain-derived: pass 1 derives grandparent, pass 2 the composite —
        pinning the documented fixpoint contract."""
        from logset_spark.operators.inference import property_chains_materialize

        t = (
            self._triples(
                spark,
                [("a", "parent", "b"), ("b", "parent", "c"),
                 ("c", "parent", "d")],
            )
            .unionByName(self._chain_axiom(spark, "grandparent", "ch:g",
                                           ["parent", "parent"]))
            .unionByName(self._chain_axiom(spark, "greatgrand", "ch:gg",
                                           ["grandparent", "parent"]))
        )
        p1 = property_chains_materialize(t, passes=1)
        assert p1.where(p1["pred"] == "greatgrand").count() == 0
        p2 = property_chains_materialize(t, passes=2)
        got = {
            (r["subj"], r["obj"])
            for r in p2.where(p2["pred"] == "greatgrand").collect()
        }
        assert got == {("a", "d")}

    def test_unused_axiom_and_passthrough(self, spark):
        from logset_spark.operators.inference import property_chains_materialize

        t = self._triples(spark, [("a", "p", "b")]).unionByName(
            self._chain_axiom(spark, "q", "ch:q", ["nosuch", "alsonone"])
        )
        out = property_chains_materialize(t)
        assert out.where(out["pred"] == "q").count() == 0
        # asserted rows (incl. the axiom + list plumbing) pass through
        assert out.where(
            (out["pred"] == "p") & (out["subj"] == "a")
        ).count() == 1

    def test_overlong_chain_rejected(self, spark):
        from logset_spark.operators.inference import property_chains_materialize

        t = self._chain_axiom(spark, "p", "ch:long",
                              [f"p{i}" for i in range(20)])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_chain_len"):
            property_chains_materialize(t)


class TestHasKey:
    def _key_axiom(self, spark, cls, head, props):
        from logset_spark.operators.inference import HAS_KEY
        from logset_spark.operators.rdflist import list_emit

        m = spark.createDataFrame(
            [(head, i, p) for i, p in enumerate(props)],
            "head string, pos int, member string",
        )
        ax = spark.createDataFrame(
            [(cls, HAS_KEY, head)], "subj string, pred string, obj string"
        )
        return ax.unionByName(list_emit(m))

    def _t(self, spark, rows):
        return spark.createDataFrame(rows, "subj string, pred string, obj string")

    def test_composite_key_merges_only_full_agreement(self, spark):
        from logset_spark.operators.inference import owl_keys_materialize

        t = self._t(spark, [
            ("a", "rdf:type", "C"), ("b", "rdf:type", "C"),
            ("c", "rdf:type", "C"),
            ("a", "email", "e1"), ("a", "name", "n1"),
            ("b", "email", "e1"), ("b", "name", "n1"),   # full match with a
            ("c", "email", "e1"), ("c", "name", "nX"),   # email only
        ]).unionByName(self._key_axiom(spark, "C", "k:C", ["email", "name"]))
        out = owl_keys_materialize(t)
        same = {(r["subj"], r["obj"])
                for r in out.where(out["pred"] == "owl:sameAs").collect()}
        assert same == {("b", "a")}

    def test_untyped_nodes_never_merge(self, spark):
        from logset_spark.operators.inference import owl_keys_materialize

        t = self._t(spark, [
            ("a", "rdf:type", "C"), ("a", "email", "e1"),
            ("z", "email", "e1"),  # same key value but not typed C
        ]).unionByName(self._key_axiom(spark, "C", "k:C", ["email"]))
        out = owl_keys_materialize(t)
        assert out.where(out["pred"] == "owl:sameAs").count() == 0

    def test_multivalued_any_tuple_matches(self, spark):
        """x has two emails; y shares only the second — still sameAs
        (OWL: some value in common per key property)."""
        from logset_spark.operators.inference import owl_keys_materialize

        t = self._t(spark, [
            ("x", "rdf:type", "C"), ("y", "rdf:type", "C"),
            ("x", "email", "e1"), ("x", "email", "e2"),
            ("y", "email", "e2"),
        ]).unionByName(self._key_axiom(spark, "C", "k:C", ["email"]))
        out = owl_keys_materialize(t)
        same = {(r["subj"], r["obj"])
                for r in out.where(out["pred"] == "owl:sameAs").collect()}
        assert same == {("y", "x")}

    def test_composes_with_owl_materialize_closure(self, spark):
        """Key groups chain through sameAs CC: a~b (email) and b~c
        (phone) close into one class under owl_materialize."""
        from logset_spark.operators.inference import (
            owl_keys_materialize,
            owl_materialize,
        )

        t = self._t(spark, [
            ("a", "rdf:type", "C"), ("b", "rdf:type", "C"),
            ("c", "rdf:type", "C"),
            ("a", "email", "e1"), ("b", "email", "e1"),
            ("b", "phone", "p1"), ("c", "phone", "p1"),
        ])
        t = t.unionByName(self._key_axiom(spark, "C", "k:e", ["email"]))
        # second class'ing of the same nodes with a phone key
        t = t.unionByName(self._t(spark, [
            ("a", "rdf:type", "D"), ("b", "rdf:type", "D"),
            ("c", "rdf:type", "D"),
        ])).unionByName(self._key_axiom(spark, "D", "k:p", ["phone"]))
        closed = owl_materialize(owl_keys_materialize(t))
        same = {(r["subj"], r["obj"])
                for r in closed.where(closed["pred"] == "owl:sameAs").collect()}
        # all three collapse to representative 'a' in star form
        assert ("b", "a") in same and ("c", "a") in same

    def test_overlong_key_rejected(self, spark):
        from logset_spark.operators.inference import owl_keys_materialize

        t = self._key_axiom(spark, "C", "k:long", [f"p{i}" for i in range(9)])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_key_len"):
            owl_keys_materialize(t)


class TestVocabCanonicalization:
    """A catalog that DECLARES @prefix owl:/rdf:/rdfs: delivers the
    ontology as full IRIs; the rule engines must fire on those too
    (vocab_canon at every entry point), never silently no-op."""

    OWL = "http://www.w3.org/2002/07/owl#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"

    def _t(self, spark, rows):
        return spark.createDataFrame(rows, "subj string, pred string, obj string")

    def test_rdfs_full_iri_schema_fires(self, spark):
        from logset_spark.operators.inference import rdfs_materialize

        t = self._t(spark, [
            ("Dog", f"{self.RDFS}subClassOf", "Animal"),
            ("rex", f"{self.RDF}type", "Dog"),
        ])
        out = rdfs_materialize(t)
        assert out.where(
            (out["subj"] == "rex") & (out["pred"] == "rdf:type")
            & (out["obj"] == "Animal")
        ).count() == 1

    def test_owl_full_iri_symmetric_fires(self, spark):
        from logset_spark.operators.inference import owl_materialize

        t = self._t(spark, [
            ("knows", f"{self.RDF}type", f"{self.OWL}SymmetricProperty"),
            ("a", "knows", "b"),
        ])
        out = owl_materialize(t)
        assert out.where(
            (out["subj"] == "b") & (out["pred"] == "knows") & (out["obj"] == "a")
        ).count() == 1

    def test_chain_full_iri_list_fires(self, spark):
        from logset_spark.operators.inference import property_chains_materialize

        t = self._t(spark, [
            ("gp", f"{self.OWL}propertyChainAxiom", "_:l1"),
            ("_:l1", f"{self.RDF}first", "parent"),
            ("_:l1", f"{self.RDF}rest", "_:l2"),
            ("_:l2", f"{self.RDF}first", "parent"),
            ("_:l2", f"{self.RDF}rest", f"{self.RDF}nil"),
            ("a", "parent", "b"), ("b", "parent", "c"),
        ])
        out = property_chains_materialize(t)
        assert out.where(
            (out["subj"] == "a") & (out["pred"] == "gp") & (out["obj"] == "c")
        ).count() == 1

    def test_asserted_vocab_rows_come_out_canonical(self, spark):
        from logset_spark.operators.inference import owl_materialize

        t = self._t(spark, [("x", f"{self.OWL}sameAs", "y")])
        out = owl_materialize(t)
        preds = {r["pred"] for r in out.collect()}
        assert "owl:sameAs" in preds
        assert f"{self.OWL}sameAs" not in preds
