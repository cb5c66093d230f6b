"""Distributed rdf:List expansion/emission (operators/rdflist.py).

Contracts: round-trip identity (emit -> expand recovers order exactly),
logarithmic round count on long chains, termination on malformed
rest-cycles, loud failure on gapped position lists, and agreement with
the Turtle parser's collection expansion (the same chains a real .ttl
catalog carries).
"""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.rdflist import (
    FIRST,
    NIL,
    REST,
    list_emit,
    list_expand,
)


def _members_df(spark, lists: dict[str, list[str]]):
    rows = [
        (head, pos, member)
        for head, ms in lists.items()
        for pos, member in enumerate(ms)
    ]
    return spark.createDataFrame(rows, "head: string, pos: int, member: string")


def _expanded(df):
    return {
        (r["head"], r["pos"], r["member"]) for r in df.collect()
    }


def test_roundtrip_small(spark):
    lists = {
        "l:a": ["m1", "m2", "m3"],
        "l:b": ["x"],
        "l:c": ["p", "q", "r", "s", "t"],
    }
    members = _members_df(spark, lists)
    got = _expanded(list_expand(list_emit(members)))
    exp = {(h, i, m) for h, ms in lists.items() for i, m in enumerate(ms)}
    assert got == exp


def test_long_chain_converges_in_log_rounds(spark):
    """A 600-cell list needs ceil(log2(600))=10 doublings; rounds=10
    must fully recover it (fixed mode, no probe), proving the doubling
    recurrence — a sequential walk would need 599 rounds."""
    lists = {"l:long": [f"m{i:04d}" for i in range(600)]}
    members = _members_df(spark, lists)
    chain = list_emit(members)
    got = _expanded(list_expand(chain, rounds=10))
    assert len(got) == 600
    assert (("l:long", 0, "m0000") in got) and (("l:long", 599, "m0599") in got)
    # one round too few provably misses the tail (strictness check)
    short = _expanded(list_expand(chain, rounds=9))
    assert len(short) == 512


def test_rest_cycle_terminates_and_is_ignored(spark):
    """A rest-cycle has no head; expansion must terminate (probe) and
    emit nothing for it, while a well-formed list alongside survives."""
    rows = [
        ("c1", FIRST, "x"), ("c1", REST, "c2"),
        ("c2", FIRST, "y"), ("c2", REST, "c1"),  # cycle c1 <-> c2
        ("h", FIRST, "a"), ("h", REST, NIL),
    ]
    triples = spark.createDataFrame(rows, "subj: string, pred: string, obj: string")
    got = _expanded(list_expand(triples))
    assert got == {("h", 0, "a")}


def test_gapped_positions_raise(spark):
    members = spark.createDataFrame(
        [("l:g", 0, "a"), ("l:g", 2, "b")], "head: string, pos: int, member: string"
    )
    with pytest.raises(Exception, match="non-dense"):
        list_emit(members).collect()


def test_agrees_with_turtle_parser_collections(spark, tmp_path):
    """from_turtle expands `( ... )` into first/rest chains; list_expand
    must recover the document order of those collections."""
    from logset_spark.sources.turtle import load_turtle

    ttl = (
        "@prefix ex: <http://example.org/> .\n"
        "ex:s ex:order ( ex:first ex:second ex:third ) .\n"
    )
    p = tmp_path / "lists.ttl"
    p.write_text(ttl)
    triples = load_turtle(spark, str(p))
    out = list_expand(triples.select("subj", "pred", "obj"))
    members = [
        r["member"]
        for r in out.orderBy("pos").collect()
    ]
    assert members == [
        "http://example.org/first",
        "http://example.org/second",
        "http://example.org/third",
    ]
