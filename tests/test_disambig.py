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
