"""operators/r2rml.py: the R2RML-lite core — template minting, NULL
skip semantics, RefObjectMap joins, where-filters, error paths (the
DuckDB oracle gate covers the mapping again at sf0.01 via q_r2rml)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.r2rml import (
    Col,
    Const,
    Ref,
    Template,
    TriplesMap,
    r2rml_map,
)


def _triples(df) -> set:
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_basic_maps_and_null_skip(spark):
    src = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "y"), (None, "c", "z")],
        "id int, name string, tag string",
    )
    tm = TriplesMap(
        table="t",
        subject=Template("s:{id}"),
        pos=(
            ("p:name", Col("name")),
            ("p:tag", Template("tag:{tag}")),
            ("rdf:type", Const("T")),
        ),
    )
    got = _triples(r2rml_map({"t": src}, [tm]))
    # NULL name -> no p:name triple for s:2; NULL id -> whole row skipped
    assert got == {
        ("s:1", "p:name", "a"),
        ("s:1", "p:tag", "tag:x"),
        ("s:1", "rdf:type", "T"),
        ("s:2", "p:tag", "tag:y"),
        ("s:2", "rdf:type", "T"),
    }


def test_ref_map_joins_parent_subject_and_where_filters(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "id int, fk int",
    )
    parent = spark.createDataFrame(
        [(10, "p1"), (20, "p2")], "pk int, label string"
    )
    tm = TriplesMap(
        table="c",
        subject=Template("c:{id}"),
        where="id < 4",
        pos=(
            ("p:of", Ref("p", "fk", "pk", Template("par:{pk}"))),
        ),
    )
    got = _triples(r2rml_map({"c": child, "p": parent}, [tm]))
    # id=3 has no matching parent (inner join, per rr:joinCondition);
    # id=4 filtered by where (and NULL fk would skip anyway)
    assert got == {
        ("c:1", "p:of", "par:10"),
        ("c:2", "p:of", "par:20"),
    }


def test_dedup_is_set_semantics(spark):
    src = spark.createDataFrame([(1, "a"), (1, "a")], "id int, v string")
    tm = TriplesMap(
        table="t", subject=Template("s:{id}"), pos=(("p:v", Col("v")),)
    )
    assert r2rml_map({"t": src}, [tm]).count() == 1
    assert r2rml_map({"t": src}, [tm], deduplicate=False).count() == 2


def test_multiple_maps_union(spark):
    a = spark.createDataFrame([(1,)], "id int")
    b = spark.createDataFrame([(2,)], "id int")
    maps = [
        TriplesMap("a", Template("a:{id}"), (("rdf:type", Const("A")),)),
        TriplesMap("b", Template("b:{id}"), (("rdf:type", Const("B")),)),
    ]
    got = _triples(r2rml_map({"a": a, "b": b}, maps))
    assert got == {("a:1", "rdf:type", "A"), ("b:2", "rdf:type", "B")}


def test_errors_loudly(spark):
    src = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="unknown table"):
        r2rml_map({"t": src}, [TriplesMap("x", Template("s:{id}"), ())])
    with pytest.raises(ValueError, match="no TriplesMaps"):
        r2rml_map({"t": src}, [])
    with pytest.raises(ValueError, match="unknown parent"):
        r2rml_map(
            {"t": src},
            [TriplesMap("t", Template("s:{id}"),
                        (("p", Ref("zz", "id", "id", Template("z:{id}"))),))],
        )


def test_no_python_in_row_path(spark):
    """The mapping must compile to native expressions — no
    BatchEvalPython / ArrowEvalPython anywhere in the plan."""
    src = spark.createDataFrame([(1, "a")], "id int, v string")
    tm = TriplesMap(
        table="t", subject=Template("s:{id}"),
        pos=(("p:v", Template("v:{v}")),),
    )
    plan = r2rml_map({"t": src}, [tm])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
