"""operators/inference.py — RDFS forward chaining checked against a
pure-Python naive fixpoint of the same rules (an independent
formulation; the DuckDB oracle covers it again at sf0.01 via
q_rdfs_infer)."""

from __future__ import annotations

import random

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
