"""Time-valid exact linking (link.temporal_surface_dictionary /
exact_link_temporal, pipeline temporal_dictionary=True): aliases only
link from their valid_from onward, later rows shadow earlier ones via
the election, and fuzzy cannot override validity."""

from __future__ import annotations

import datetime as _dt

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.link import (
    best_surface_dictionary,
    exact_link_temporal,
    temporal_surface_dictionary,
)
from logset_spark.pipeline import build_graph
from logset_spark.sources import synth
from logset_spark.sources.tableio import TableIO

T0 = _dt.datetime(2024, 1, 1)


def _d(days):
    return T0 + _dt.timedelta(days=days)


# "relay" means ent:old until day 10, then a higher-weight row for
# ent:new takes over; "stable_sys" is valid from day 5 only.
TDICT = [
    ("ent:system/old", "relay", "system", 1.0, T0),
    ("ent:system/new", "relay", "system", 2.0, _d(10)),
    ("ent:system/stable", "stable_sys", "system", 1.0, _d(5)),
]
DICT_SCHEMA = synth.DICT_SCHEMA  # canon_uri, surface, kind, weight, valid_from
TDICT_ROWS = [(u, s, k, w, v) for (u, s, k, w, v) in TDICT]


def _dict_df(spark):
    return spark.createDataFrame(TDICT_ROWS, DICT_SCHEMA)


def test_interval_winners(spark):
    dim = {
        (r["surface"], r["valid_from"]): (r["canon_uri"], r["valid_to"])
        for r in temporal_surface_dictionary(_dict_df(spark)).collect()
    }
    # relay: [T0, d10) -> old, [d10, open) -> new (weight 2 shadows)
    assert dim[("relay", T0)] == ("ent:system/old", _d(10))
    assert dim[("relay", _d(10))] == ("ent:system/new", None)
    assert dim[("stable_sys", _d(5))] == ("ent:system/stable", None)
    assert len(dim) == 3


def test_epoch_only_dictionary_equals_untimed_election(spark):
    ddf = spark.createDataFrame(synth.entity_dictionary_pdf(20),
                                schema=DICT_SCHEMA)
    # force every alias valid from the same instant
    ddf0 = ddf.withColumn("valid_from", F.lit(T0))
    timed = temporal_surface_dictionary(ddf0).select(
        "surface", "canon_uri", "score").sort("surface").collect()
    untimed = best_surface_dictionary(ddf0).sort("surface").collect()
    assert [tuple(r) for r in timed] == [tuple(r) for r in untimed]


def test_exact_link_temporal_respects_intervals(spark):
    mentions = spark.createDataFrame(
        [("m1", "relay", _d(3)),     # old era
         ("m2", "relay", _d(10)),    # boundary: new from d10 inclusive
         ("m3", "relay", _d(40)),    # new era
         ("m4", "stable_sys", _d(2)),  # before validity -> unlinked
         ("m5", "stable_sys", _d(6))],
        "mid string, form string, ts timestamp",
    )
    got = {
        r["mid"]: r["canon_uri"]
        for r in exact_link_temporal(mentions, _dict_df(spark)).collect()
    }
    assert got["m1"] == "ent:system/old"
    assert got["m2"] == "ent:system/new"
    assert got["m3"] == "ent:system/new"
    assert got["m4"] is None
    assert got["m5"] == "ent:system/stable"


def test_link_is_one_to_one(spark):
    mentions = spark.createDataFrame(
        [(i, "relay", _d(i)) for i in range(20)],
        "mid int, form string, ts timestamp",
    )
    out = exact_link_temporal(mentions, _dict_df(spark))
    assert out.count() == 20  # disjoint intervals: no fan-out


# --------------------------------------------------------------------------
# pipeline integration
# --------------------------------------------------------------------------

def _turn(conv, idx, text, day):
    return (conv, idx, "user", text, None, _d(day))


_PIPE_TURNS = [
    _turn("convA", 0, "restarting relay now", 3),
    _turn("convA", 1, "stable_sys offline", 2),
    _turn("convB", 0, "relay upgraded", 40),
    _turn("convB", 1, "stable_sys back", 6),
]


def _mentions_of(spark, tmp_path, name, **kw):
    tdf = spark.createDataFrame(_PIPE_TURNS, schema=synth.TRANSCRIPT_SCHEMA)
    io = TableIO(str(tmp_path / name), n_buckets=4)
    build_graph(spark, tdf, _dict_df(spark), io, run_id="t1", **kw)
    rows = (
        io.read(spark, "triples")
        .where(F.col("pred") == "mentions")
        .select("conv_id", "turn_idx", "obj")
        .collect()
    )
    return {(r["conv_id"], r["turn_idx"]): r["obj"] for r in rows}


def test_pipeline_temporal_links_by_mention_time(spark, tmp_path):
    got = _mentions_of(spark, tmp_path, "wh_t", temporal_dictionary=True)
    assert got[("convA", 0)] == "ent:system/old"     # day 3
    assert got[("convB", 0)] == "ent:system/new"     # day 40
    # day 2 predates stable_sys's validity: unlinked m: mention, and the
    # fuzzy fence must NOT have relinked it via the exact-equal surface
    assert got[("convA", 1)] == "m:stable_sys"
    assert got[("convB", 1)] == "ent:system/stable"  # day 6


def test_pipeline_untimed_ignores_validity(spark, tmp_path):
    got = _mentions_of(spark, tmp_path, "wh_u")
    # global election: relay -> ent:system/new (weight 2) everywhere,
    # stable_sys links regardless of date
    assert got[("convA", 0)] == "ent:system/new"
    assert got[("convA", 1)] == "ent:system/stable"


# --------------------------------------------------------------------------
# jobs/eval_graph.py: the drivable P/R surface
# --------------------------------------------------------------------------

def test_eval_graph_job(spark, tmp_path, capsys):
    import json
    import sys

    sys.path.insert(0, "jobs")
    import eval_graph

    tdf = spark.createDataFrame(_PIPE_TURNS, schema=synth.TRANSCRIPT_SCHEMA)
    io = TableIO(str(tmp_path / "wh_ev"), n_buckets=4)
    build_graph(spark, tdf, _dict_df(spark), io, run_id="e1")
    emitted = io.read(spark, "triples").select("subj", "pred", "obj")
    golden_path = str(tmp_path / "golden")
    emitted.write.parquet(golden_path)

    # identical golden -> P = R = 1, ok under any bar
    rc = eval_graph.main(["--warehouse", str(tmp_path / "wh_ev"),
                          "--golden", golden_path,
                          "--min-precision", "0.95",
                          "--min-recall", "0.95"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"]
    assert out["precision"] == 1.0 and out["recall"] == 1.0

    # golden with extra rows the warehouse lacks -> recall < 1, bar missed
    padded = str(tmp_path / "golden_pad")
    extra = spark.createDataFrame(
        [(f"x:{i}", "mentions", f"y:{i}") for i in range(50)],
        "subj string, pred string, obj string",
    )
    emitted.unionByName(extra).write.parquet(padded)
    rc = eval_graph.main(["--warehouse", str(tmp_path / "wh_ev"),
                          "--golden", padded, "--min-recall", "0.99"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not out["ok"]
    assert out["recall"] < 0.99 and out["precision"] == 1.0
