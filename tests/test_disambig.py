"""operators/disambig.py: context-aware disambiguation on crafted
fixtures where the right answer is KNOWN and context flips the winner in
both directions (the sf documents are uniform-random, so the oracle row
there proves engine-equality, not behavior — these prove behavior)."""

from __future__ import annotations

from logset_spark.operators.disambig import (
    context_profiles,
    disambiguate,
    doc_tokens,
    split_dictionary,
)

# Two entities share the surface "mercury": the planet and the element.
# Each has one unambiguous evidence alias ("orbit" -> planet, "toxic" ->
# element).  Context documents establish the profiles; test documents
# mention "mercury" in planet-ish vs chemistry-ish contexts.
DICT_ROWS = [
    ("mercury", "ent:planet/mercury", 1),
    ("mercury", "ent:element/hg", 2),
    ("orbit", "ent:planet/mercury", 1),
    ("toxic", "ent:element/hg", 1),
]
DICT_SCHEMA = "surface string, canon_uri string, weight int"

DOCS = [
    # evidence docs (unambiguous aliases only)
    (1, "orbit sun telescope sky"),
    (2, "orbit moon sky gravity"),
    (3, "toxic lab vapor chemistry"),
    (4, "toxic vapor thermometer"),
    # ambiguous mentions to resolve
    (10, "mercury sky telescope"),          # planet context
    (11, "mercury vapor lab"),              # element context
    (12, "mercury unrelated words only"),   # no context -> prior wins
]
DOC_SCHEMA = "doc_id long, text string"


def _resolve(spark, docs=DOCS):
    d = spark.createDataFrame(docs, DOC_SCHEMA)
    dic = spark.createDataFrame(DICT_ROWS, DICT_SCHEMA)
    return {
        (r["doc_id"], r["surface"]): (r["canon_uri"], r["score"])
        for r in disambiguate(d, dic).collect()
    }


def test_context_flips_the_winner_both_ways(spark):
    got = _resolve(spark)
    # doc 10 shares sky+telescope with planet evidence, nothing with
    # element evidence; doc 11 the reverse via vapor+lab.
    assert got[(10, "mercury")][0] == "ent:planet/mercury"
    assert got[(11, "mercury")][0] == "ent:element/hg"
    # same surface, different winners per document — the thing the
    # global (weight, uri) election in link.py structurally cannot do
    # (it would always pick ent:element/hg on weight 2 > 1).
    assert got[(10, "mercury")][0] != got[(11, "mercury")][0]


def test_no_context_falls_back_to_prior_weight(spark):
    got = _resolve(spark)
    uri, score = got[(12, "mercury")]
    assert score == 0
    assert uri == "ent:element/hg"  # weight 2 beats 1 at score tie


def test_scores_are_exact_evidence_doc_counts(spark):
    got = _resolve(spark)
    # doc 10: sky in 2 planet-evidence docs, telescope in 1 -> 3
    assert got[(10, "mercury")] == ("ent:planet/mercury", 3)
    # doc 11: vapor in 2 element-evidence docs, lab in 1 -> 3
    assert got[(11, "mercury")] == ("ent:element/hg", 3)


def test_every_ambiguous_mention_gets_exactly_one_row(spark):
    got = _resolve(spark)
    assert set(got) == {(10, "mercury"), (11, "mercury"), (12, "mercury")}


def test_split_dictionary_partitions_by_candidate_count(spark):
    dic = spark.createDataFrame(DICT_ROWS, DICT_SCHEMA)
    unamb, amb = split_dictionary(dic)
    assert {r["surface"] for r in unamb.collect()} == {"orbit", "toxic"}
    assert {r["surface"] for r in amb.collect()} == {"mercury"}


def test_profiles_count_distinct_evidence_docs(spark):
    d = spark.createDataFrame(DOCS, DOC_SCHEMA)
    dic = spark.createDataFrame(DICT_ROWS, DICT_SCHEMA)
    unamb, _ = split_dictionary(dic)
    prof = {
        (r["canon_uri"], r["token"]): r["cnt"]
        for r in context_profiles(doc_tokens(d), unamb).collect()
    }
    assert prof[("ent:planet/mercury", "sky")] == 2
    assert prof[("ent:planet/mercury", "orbit")] == 2
    assert prof[("ent:element/hg", "vapor")] == 2
    assert prof[("ent:element/hg", "thermometer")] == 1
    assert ("ent:planet/mercury", "vapor") not in prof


def test_tokenizer_is_set_semantics(spark):
    d = spark.createDataFrame([(1, "A a a b-b")], DOC_SCHEMA)
    got = {r["token"] for r in doc_tokens(d).collect()}
    assert got == {"a", "b"}
    assert doc_tokens(d).count() == 2  # distinct, not 5


def test_deterministic_across_reruns(spark):
    assert _resolve(spark) == _resolve(spark)


# --------------------------------------------------------------------------
# pipeline integration: build_graph(disambiguate=True)
# --------------------------------------------------------------------------

import datetime as _dt

import pytest
from pyspark.sql import functions as F

from logset_spark.pipeline import build_graph
from logset_spark.sources import synth
from logset_spark.sources.tableio import TableIO

_TS = _dt.datetime(2024, 3, 1, 12, 0, 0)


def _turn(conv, idx, text):
    return (conv, idx, "user", text, None, _TS + _dt.timedelta(minutes=idx))


# "shared_tool" is ambiguous between alpha and beta; each conv's OTHER
# mention is an unambiguous alias that should pull the shared surface its
# way.  Global election would always pick beta (weight 0.9 > 0.5).
_PIPE_DICT = [
    ("ent:system/alpha", "alpha_sys", "system", 1.0, _TS),
    ("ent:system/beta", "beta_sys", "system", 1.0, _TS),
    ("ent:system/alpha", "shared_tool", "system", 0.5, _TS),
    ("ent:system/beta", "shared_tool", "system", 0.9, _TS),
]

_PIPE_TURNS = [
    _turn("convA", 0, "we deployed alpha_sys today"),
    _turn("convA", 1, "then shared_tool restarted"),
    _turn("convB", 0, "beta_sys was upgraded"),
    _turn("convB", 1, "and shared_tool caught fire"),
    _turn("convC", 0, "shared_tool with no other context"),
]


def _build(spark, tmp_path, disambiguate, name):
    tdf = spark.createDataFrame(_PIPE_TURNS, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(_PIPE_DICT, schema=synth.DICT_SCHEMA)
    io = TableIO(str(tmp_path / name), n_buckets=4)
    build_graph(spark, tdf, ddf, io, run_id="d1", disambiguate=disambiguate)
    rows = (
        io.read(spark, "triples")
        .where((F.col("pred") == "mentions")
               & F.col("obj").isin("ent:system/alpha", "ent:system/beta"))
        .select("conv_id", "turn_idx", "obj", "conf")
        .collect()
    )
    return {(r["conv_id"], r["turn_idx"]): (r["obj"], r["conf"]) for r in rows}


def test_pipeline_disambiguates_by_conv_context(spark, tmp_path):
    got = _build(spark, tmp_path, True, "wh_dis")
    # unambiguous anchors link as usual
    assert got[("convA", 0)][0] == "ent:system/alpha"
    assert got[("convB", 0)][0] == "ent:system/beta"
    # the shared surface resolves differently per conversation
    assert got[("convA", 1)][0] == "ent:system/alpha"
    assert got[("convB", 1)][0] == "ent:system/beta"
    # no context at all -> prior weight decides, deterministically
    assert got[("convC", 0)][0] == "ent:system/beta"
    # conf carries the winning dictionary row's weight
    assert got[("convA", 1)][1] == pytest.approx(0.5)
    assert got[("convB", 1)][1] == pytest.approx(0.9)


def test_pipeline_default_is_global_election(spark, tmp_path):
    got = _build(spark, tmp_path, False, "wh_nodis")
    # weight 0.9 wins everywhere — same winner in every conversation
    assert got[("convA", 1)][0] == "ent:system/beta"
    assert got[("convB", 1)][0] == "ent:system/beta"
    assert got[("convC", 0)][0] == "ent:system/beta"


def test_disambiguate_flag_noop_on_unambiguous_dict(spark, tmp_path):
    """disambiguate=True with a clean dictionary must not change the
    output (the ambiguity probe finds nothing, normal path runs)."""
    tdf = spark.createDataFrame(_PIPE_TURNS, schema=synth.TRANSCRIPT_SCHEMA)
    clean = [r for r in _PIPE_DICT if r[1] != "shared_tool"]
    ddf = spark.createDataFrame(clean, schema=synth.DICT_SCHEMA)
    io1 = TableIO(str(tmp_path / "wh_c1"), n_buckets=4)
    io2 = TableIO(str(tmp_path / "wh_c2"), n_buckets=4)
    build_graph(spark, tdf, ddf, io1, run_id="c1", disambiguate=True)
    build_graph(spark, tdf, ddf, io2, run_id="c2", disambiguate=False)
    a = io1.read(spark, "triples").select("subj", "pred", "obj").sort(
        "subj", "pred", "obj").collect()
    b = io2.read(spark, "triples").select("subj", "pred", "obj").sort(
        "subj", "pred", "obj").collect()
    assert a == b


def test_split_dictionary_normalizes_and_dedupes(spark):
    """Regression: ambiguity was decided on RAW surfaces, so 'Mercury'
    and 'mercury' counted as two unambiguous surfaces (each silently
    certain of its own candidate), and duplicate (surface, cand) rows
    multiplied that candidate's score."""
    from logset_spark.operators.disambig import split_dictionary

    d = spark.createDataFrame(
        [
            ("Mercury", "ent:planet", 1.0),
            ("mercury", "ent:element", 2.0),
            ("mercury ", "ent:element", 3.0),  # dup after normalize
            ("alpha", "ent:a", 1.0),
        ],
        "surface string, canon_uri string, weight double",
    )
    unamb, amb = split_dictionary(d)
    assert {r.surface for r in amb.collect()} == {"mercury"}
    amb_rows = {(r.surface, r.canon_uri, r.weight) for r in amb.collect()}
    # dedup kept max weight, one row per candidate
    assert amb_rows == {
        ("mercury", "ent:planet", 1.0), ("mercury", "ent:element", 3.0)
    }
    assert {r.surface for r in unamb.collect()} == {"alpha"}


def test_empty_surface_rows_dropped(spark):
    from logset_spark.operators.disambig import split_dictionary
    from logset_spark.operators.link import (
        best_surface_dictionary, temporal_surface_dictionary,
    )
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [("***", "ent:junk", 9.0), ("alpha", "ent:a", 1.0)],
        "surface string, canon_uri string, weight double",
    )
    assert best_surface_dictionary(d).where(
        F.col("surface") == "").count() == 0
    u, a = split_dictionary(d)
    assert u.unionByName(a).where(F.col("surface") == "").count() == 0
    dt = d.withColumn("valid_from", F.lit("2024-01-01").cast("timestamp"))
    assert temporal_surface_dictionary(dt).where(
        F.col("surface") == "").count() == 0


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from logset_spark.operators.link import salted_join

    f = spark.createDataFrame([("k1", 1)], "k string, v int")
    d = spark.createDataFrame([("k1", "x"), ("k2", "y")], "k string, w string")
    with _pytest.raises(ValueError, match="inner"):
        salted_join(f, d, "k", how="full")
