"""Context-aware entity disambiguation for ambiguous dictionary surfaces.

The exact-link stage (operators/link.py) collapses the alias dictionary
to ONE canonical row per normalized surface — a global (weight, uri)
election.  That is the right 1:1 join shape for the hot path, but it
throws away genuinely ambiguous aliases: a surface like "mercury" that
maps to several canonical entities resolves to the same winner in every
conversation regardless of what the conversation is about.  The
reference's per-file dict lookup has the same blind spot (one value per
key), so this module is an *extension*, not a parity port: it resolves
each ambiguous mention PER DOCUMENT by scoring every candidate entity
against the document's context tokens.

Model — a distributional one-rest-of-corpus pass, no training loop:

1. Evidence: documents that mention an entity through an UNAMBIGUOUS
   alias vote for that entity.  ``context_profiles`` counts, for each
   entity, how many evidence documents contain each context token:
   ``profile(e, t) = |{d : d unambiguously mentions e and t in d}|``.
2. Scoring: an ambiguous mention (d, surface) scores each candidate e
   by ``sum over tokens t of d, t != surface, of profile(e, t)`` — a
   bag-of-words affinity between the document and the entity's
   observed contexts.  Exact integer arithmetic end-to-end, so the
   result is engine-independent (no float partial-agg ordering).
3. Election: argmax per (d, surface) with a total deterministic order —
   score DESC, dictionary prior weight DESC, canonical URI ASC.

Plan shape at 100 TB: the dictionary is dimension-scale and rides
broadcast joins; the derived profile table is |entities| x |vocab|
bounded (independent of corpus ROW count, but a large vocabulary can
exceed broadcast size — its joins are left to the optimizer, which
AQE sizes from measured stats); the corpus is tokenized ONCE and
every other join is co-partitioned on doc_id or on the token key.  The
candidate fan-out is |candidates per surface| (dictionary-bounded),
never corpus x corpus.  Nothing here collects data-scale rows to the
driver and nothing is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DISTINCT (doc_id, token) pairs — lowercased [a-z]+ runs, the same
    tokenizer the text-analysis queries use.  Distinct because the
    profile/score model is set-of-tokens per document (presence, not
    term frequency): profile counts are then document counts, which
    keeps the score's meaning stable across wildly different document
    lengths."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
                )
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def split_dictionary(dictionary: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(unambiguous, ambiguous) dictionary rows by candidate count per
    NORMALIZED surface.  Surfaces normalize through the SAME
    link.normalize_form the exact-link path uses — deciding ambiguity on
    raw spellings would count 'Mercury' and 'mercury' as two separate
    unambiguous surfaces (each silently voting for its own candidate),
    and a raw surface can never equal a lowercased token anyway.
    Duplicate (surface, canon_uri) rows collapse to max weight so a
    dictionary merged from several sources cannot multiply a candidate's
    score by its row count.  Surfaces that normalize to '' are dropped
    (they could only ever match punctuation).  Multi-word surfaces stay
    a documented limitation of the [a-z]+ token space.  The dictionary
    is dimension-scale; the count rides a broadcast self-join, no
    data-side shuffle."""
    from .link import normalize_form

    d = (
        dictionary.select(
            normalize_form(F.col("surface")).alias("surface"),
            "canon_uri", "weight",
        )
        .where(F.col("surface") != "")
        .groupBy("surface", "canon_uri")
        .agg(F.max("weight").alias("weight"))
    )
    n = d.groupBy("surface").agg(F.count("*").alias("n_cand"))
    d = d.join(F.broadcast(n), "surface")
    return d.where("n_cand = 1").drop("n_cand"), d.where("n_cand > 1").drop(
        "n_cand"
    )


def context_profiles(tokens: DataFrame, unambig: DataFrame) -> DataFrame:
    """Entity-token co-occurrence counts from unambiguous evidence.

    evidence = DISTINCT (doc_id, entity) via token = unambiguous alias;
    profile(e, t) = count of evidence docs of e containing t.  One
    shuffle on doc_id (evidence join) and one on (entity, token) for
    the count — both keys the downstream scoring reuses."""
    ev = (
        tokens.join(
            F.broadcast(
                unambig.select(
                    F.col("surface").alias("token"), "canon_uri"
                )
            ),
            "token",
        )
        .select("doc_id", "canon_uri")
        .distinct()
    )
    return tokens.join(ev, "doc_id").groupBy("canon_uri", "token").agg(
        F.count("*").alias("cnt")
    )


def _score_and_elect(mention: DataFrame, ctx: DataFrame, prof: DataFrame) -> DataFrame:
    """Shared scoring + election core.

    mention: (doc_id, surface, cand, weight) candidate rows;
    ctx:     (doc_id, ctx) context tokens per document;
    prof:    (canon_uri, token, cnt) entity context profiles.

    score(d, surface, cand) = sum of prof(cand, t) over context tokens t
    of d with t != surface (a mention never votes for itself through its
    own surface token; in entity-URI context spaces the predicate is a
    vacuous no-op since surfaces and URIs are disjoint).  Winner per
    (doc_id, surface) by score DESC, prior weight DESC, cand ASC —
    a total order, so the election is deterministic on any engine."""
    scores = (
        mention.select("doc_id", "surface", "cand")
        .join(ctx, "doc_id")
        .where(F.col("ctx") != F.col("surface"))
        .join(
            # no broadcast hint: the profile is |entities| x |vocab|
            # bounded — small on catalog-sized entity sets, but a corpus
            # vocabulary can push it past broadcast limits; the
            # optimizer (AQE) picks the strategy from measured size
            prof,
            (F.col("ctx") == F.col("token"))
            & (F.col("cand") == F.col("canon_uri")),
        )
        .groupBy("doc_id", "surface", "cand")
        .agg(F.sum("cnt").alias("score"))
    )
    ranked = mention.join(
        scores, ["doc_id", "surface", "cand"], "left"
    ).withColumn("score", F.coalesce(F.col("score"), F.lit(0).cast("long")))
    w = Window.partitionBy("doc_id", "surface").orderBy(
        F.desc("score"), F.desc("weight"), F.asc("cand")
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "doc_id", "surface", F.col("cand").alias("canon_uri"), "score"
        )
    )


def conv_winners(evidence: DataFrame, ambiguous: DataFrame) -> DataFrame:
    """Pipeline-facing election over ENTITY-URI context space.

    evidence: (conv_id, entity) distinct — entities linked through
    UNAMBIGUOUS aliases in each conversation (stage-1 exact-link hits).
    ambiguous: (conv_id, surface) mention occurrences joined against the
    ambiguous dictionary rows as (surface, cand, weight) — passed here
    already joined: (conv_id, surface, cand, weight).

    Profiles are entity co-mention counts, prof(e, c) = number of convs
    mentioning both e and c (including e = c, the evidence-count
    self-boost: a conv that unambiguously mentions candidate e elsewhere
    is overwhelming evidence the ambiguous mention is also e).  The
    profile table is |entities|^2-bounded (dimension-scale, broadcast);
    the conv-side joins are co-partitioned on conv_id.

    Returns (conv_id, surface, canon_uri, score, weight) winners."""
    tokens = evidence.select(
        F.col("conv_id").alias("doc_id"), F.col("entity").alias("token")
    ).distinct()
    prof = (
        tokens.select("doc_id", F.col("token").alias("canon_uri"))
        .join(tokens, "doc_id")
        .groupBy("canon_uri", "token")
        .agg(F.count("*").alias("cnt"))
    )
    # defensive dedup: duplicate (conv, surface, cand) rows — a merged
    # dictionary carrying the same candidate at two weights — would
    # multiply that candidate's score and emit duplicate winner rows
    mention = (
        ambiguous.select(
            F.col("conv_id").alias("doc_id"), "surface", "cand", "weight"
        )
        .groupBy("doc_id", "surface", "cand")
        .agg(F.max("weight").alias("weight"))
    )
    won = _score_and_elect(
        mention, tokens.select("doc_id", F.col("token").alias("ctx")), prof
    )
    return won.join(
        mention.select(
            "doc_id", "surface", F.col("cand").alias("canon_uri"), "weight"
        ).distinct(),
        ["doc_id", "surface", "canon_uri"],
    ).select(
        F.col("doc_id").alias("conv_id"),
        "surface",
        "canon_uri",
        "score",
        "weight",
    )


def disambiguate(docs: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Resolve every ambiguous mention to its best candidate entity.

    Input: docs(doc_id, text, ...), dictionary(surface, canon_uri,
    weight) where a surface may carry SEVERAL canon_uri rows.
    Output: one row per (doc_id, surface) occurrence of an ambiguous
    surface — doc_id, surface, canon_uri (winner), score (bigint
    context affinity; 0 when no context token matches any profile).

    Candidates whose profile never intersects the document still get a
    row (left join + coalesce 0) and resolve by prior weight then URI —
    silent drops here would under-link exactly the long-tail mentions
    disambiguation exists for."""
    tokens = docs if "token" in docs.columns else doc_tokens(docs)
    unambig, ambig = split_dictionary(dictionary)
    prof = context_profiles(tokens, unambig)

    mention = tokens.join(
        F.broadcast(
            ambig.select(
                F.col("surface").alias("token"),
                F.col("canon_uri").alias("cand"),
                "weight",
            )
        ),
        "token",
    ).select("doc_id", F.col("token").alias("surface"), "cand", "weight")

    ctx = tokens.select("doc_id", F.col("token").alias("ctx"))
    return _score_and_elect(mention, ctx, prof)
