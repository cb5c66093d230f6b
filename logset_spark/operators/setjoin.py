"""Exact-threshold set-similarity join via prefix filtering (PPJoin
family: Chaudhuri et al. SSJoin / Xiao et al. PPJoin, both public).

The approximate near-dup paths (MinHash-LSH in link.py, SimHash in
dedup.py) trade recall for speed.  This operator is the EXACT
complement: every pair with token-set Jaccard >= t, no misses, no
false positives — the dedup-audit / legal-compliance path where
"probably found every duplicate" is not good enough.

Why it scales without all-pairs: order every document's distinct
tokens by ascending global document frequency (rarest first; total
order with the token string as tie-break).  If J(x, y) >= t then
|x ∩ y| >= ceil(t * max(|x|, |y|)), and the classic prefix lemma says
the first |x| - ceil(t*|x|) + 1 tokens of x and the first
|y| - ceil(t*|y|) + 1 tokens of y must share at least one token.  So:

  1. one explode+groupBy pair computes document frequencies;
  2. each doc sorts its own tokens by (df, token) — a per-row
     array_sort, NO global rank/window, nothing single-partition;
  3. only the rare-token PREFIX is exploded into the equi-join that
     generates candidates — hot frequent tokens (the quadratic
     blow-up in a naive token join) never enter the join;
  4. candidates get a length filter (100*|y| >= t100*|x| both ways)
     for free in the join condition, are deduped, then verified with
     native array_intersect/array_union on re-joined token arrays.

Everything is built-in DataFrame ops (JVM, codegen); no Python in the
hot path.  Shuffles: df-count groupBy, per-doc groupBy, candidate
equi-join + distinct, two verify joins — all keyed, all AQE-coalesced,
no cartesian anywhere.

Integer thresholds (t100 = 100*t) keep the verify predicate
`100*inter >= t100*uni` exact across engines — no float epsilon, so
the DuckDB oracle (naive all-pairs at sf0.01) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def token_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, tokens): distinct lowercase word tokens; empty sets dropped
    (Jaccard is undefined against an empty set)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != F.lit("")
        )
    )
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), toks.alias("tokens"))
        .where(F.size("tokens") > 0)
    )


def _freq_ordered(tok_sets: DataFrame) -> DataFrame:
    """(id, toks ordered rarest-first, n).  The order key is the PAIR
    (df, token) sorted per row — equivalent to a global rank without
    ever computing one (no global window, no single-partition stage)."""
    tok = tok_sets.select("id", F.explode("tokens").alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("df"))
    return (
        tok.join(freq, "token")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "token"))).alias("st"))
        .select(
            "id",
            F.transform("st", lambda s: s["token"]).alias("toks"),
            F.size("st").alias("n"),
        )
    )


def jaccard_threshold_join(
    docs: DataFrame,
    t100: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (id1 < id2) with Jaccard(tokens) >= t100/100 — exact.

    Returns (id1, id2, inter, uni) with integer sizes; the caller can
    derive the score as inter/uni.  t100 is an integer percent so the
    threshold predicate is exact integer arithmetic.
    """
    if not 1 <= t100 <= 100:
        raise ValueError(f"t100 must be in [1, 100], got {t100}")
    ordered = _freq_ordered(token_sets(docs, id_col, text_col))

    # prefix length p = n - ceil(t*n) + 1; ceil(t100*n/100) in integers
    p = F.col("n") - F.expr(f"(({t100} * n) + 99) DIV 100") + 1
    prefix = ordered.select(
        "id", "n", F.explode(F.slice("toks", F.lit(1), p)).alias("token")
    )

    a = prefix.select(
        F.col("id").alias("id1"), F.col("n").alias("n1"), "token"
    )
    b = prefix.select(
        F.col("id").alias("id2"), F.col("n").alias("n2"), "token"
    )
    # length filter: J >= t forces 100*min(n1,n2) >= t100*max(n1,n2);
    # with id1 < id2 both directions are asserted explicitly.
    cand = (
        a.join(b, "token")
        .where(
            (F.col("id1") < F.col("id2"))
            & (100 * F.col("n2") >= t100 * F.col("n1"))
            & (100 * F.col("n1") >= t100 * F.col("n2"))
        )
        .select("id1", "id2")
        .distinct()
    )

    t1 = ordered.select(F.col("id").alias("id1"), F.col("toks").alias("tok1"))
    t2 = ordered.select(F.col("id").alias("id2"), F.col("toks").alias("tok2"))
    return (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("tok1", "tok2")).alias("inter"),
            F.size(F.array_union("tok1", "tok2")).alias("uni"),
        )
        .where(100 * F.col("inter") >= t100 * F.col("uni"))
    )


def jaccard_all_pairs(docs: DataFrame, t100: int, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Naive all-pairs reference (test oracle only — O(n^2), never the
    production path).  Same output schema as jaccard_threshold_join."""
    ts = token_sets(docs, id_col, text_col)
    a = ts.select(F.col("id").alias("id1"), F.col("tokens").alias("tok1"))
    b = ts.select(F.col("id").alias("id2"), F.col("tokens").alias("tok2"))
    return (
        a.crossJoin(b)
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("tok1", "tok2")).alias("inter"),
            F.size(F.array_union("tok1", "tok2")).alias("uni"),
        )
        .where(100 * F.col("inter") >= t100 * F.col("uni"))
    )
