"""Bloom-filter semi-join pruning: cut the fact-side scan BEFORE the
shuffle.

At 100 TB the expensive part of a selective fact x dim join is not the
join itself but shipping every fact row into the exchange.  A Bloom
filter built from the dim side's join keys prunes the fact table at the
scan, map-side, with zero extra shuffles:

* build — each key sets ``n_hashes`` bits chosen by
  ``xxhash64(key, seed) mod n_bits``.  The bitset is built
  DISTRIBUTED: explode the k positions, groupBy the 64-bit word index,
  ``bit_or`` the masks.  The collected artifact is at most
  ``n_bits/64`` rows regardless of input row count (bounded the same
  way the IVF centroid sample is — it is a function of the filter
  geometry, never of the data volume), and two builds over disjoint
  halves of the dim side merge by plain bitwise OR
  (:func:`bloom_merge`), so the build is associative/partial-agg
  friendly.
* probe — the words become ONE array literal in the fact-side filter
  expression; each row tests its k bits with
  ``element_at(words, pos DIV 64 + 1) & (1 << pos % 64)``.  Entirely
  JVM-side inside WholeStageCodegen: no Python, no join, no shuffle —
  the filter sits directly above the scan.

No false negatives by construction: build and probe evaluate the SAME
``xxhash64`` family on the SAME canonicalised (string-cast) key, so a
key present in the dim side always passes the probe.  False positives
are removed by the real join that follows; the filter only changes
which rows reach the exchange, never the result (q_bloom_join's oracle
is the PLAIN join, same discipline as q_salted).

Sizing: default ``n_bits=2**17`` (16 KiB) holds ~10k keys at <1% FPR
with k=5.  The literal-array probe is capped at ``n_bits=2**22``
(512 KiB, 65536 words) to keep the expression tree sane; a 100 TB
deployment with a bigger dim side should raise n_bits toward 2**27
(~16 MiB) and ship the words via ``spark.sparkContext.broadcast`` into
a vectorised pandas UDF instead — same bit layout, same hash family,
numpy ``words[pos >> 6] >> (pos & 63) & 1`` over whole Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_LITERAL_BITS = 2**22


def _positions(key_col, n_bits: int, n_hashes: int) -> list:
    """The k probe positions for one key: xxhash64 with seed i.

    The key is cast to string first so build and probe agree even when
    the two sides carry different physical types (bigint vs int) for
    the same logical key.
    """
    key = key_col.cast("string")
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_word_rows(
    df: DataFrame, key_col: str, n_bits: int = 2**17, n_hashes: int = 5
) -> DataFrame:
    """Distributed bitset build -> DataFrame of (word_idx, word).

    <= n_bits/64 rows.  bit_or is associative and commutative, so
    Catalyst runs this as partial aggregates map-side; two word-row
    sets for the same geometry union-merge with another bit_or
    groupBy (see bloom_merge) — the shape of a mergeable sketch.
    """
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes)))
    return (
        df.select(pos.alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("pos").cast("int") % 64
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_collect(word_rows: DataFrame, n_bits: int) -> list[int]:
    """word rows -> dense python list of n_bits/64 longs (zeros filled).

    The collect is bounded by the filter geometry (n_bits/64 rows max),
    not by data volume — the same bounded-artifact rule as the IVF
    training sample.
    """
    words = [0] * (n_bits // 64)
    for r in word_rows.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 2**17, n_hashes: int = 5
) -> list[int]:
    """One-call build: distributed bitset -> driver-side word list."""
    return bloom_collect(bloom_word_rows(df, key_col, n_bits, n_hashes), n_bits)


def bloom_merge(a: list[int], b: list[int]) -> list[int]:
    """OR-merge two blooms of identical geometry (e.g. per-partition or
    per-day builds unioned into one filter)."""
    if len(a) != len(b):
        raise ValueError(f"geometry mismatch: {len(a)} vs {len(b)} words")
    return [x | y for x, y in zip(a, b)]


def bloom_might_contain(
    key_col, words: list[int], n_bits: int, n_hashes: int = 5
):
    """Boolean Column: all k bits set for this key.

    words is embedded as ONE array<long> literal; the per-row work is k
    hashes + k element_at/bit tests, all codegen'd JVM expressions.
    """
    if n_bits > _MAX_LITERAL_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds the literal-probe cap {_MAX_LITERAL_BITS}; "
            "ship the words via a broadcast + pandas UDF at this size "
            "(module docstring)"
        )
    if len(words) != n_bits // 64:
        raise ValueError(f"expected {n_bits // 64} words, got {len(words)}")
    arr = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key_col, n_bits, n_hashes):
        word = F.element_at(arr, (pos.cast("int") / F.lit(64)).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), pos.cast("int") % 64
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    words: list[int],
    n_bits: int = 2**17,
    n_hashes: int = 5,
) -> DataFrame:
    """Filter fact rows whose key cannot be in the dim side.

    Superset of the true semi-join (false positives pass, no false
    negatives); follow with the real join for exact results.
    """
    return fact.where(bloom_might_contain(F.col(key_col), words, n_bits, n_hashes))
