"""Document deduplication suite (training-data pipeline operators).

Four tiers, cheapest-first — at 100 TB you run them in this order and
each tier shrinks the next tier's input:

1. exact       — md5 content hash groupBy (one shuffle on the hash)
2. simhash     — 64-bit near-dup fingerprint; hamming<=k via (k+1)-band
                 exact-match blocking (pigeonhole: k differing bits can
                 touch at most k of k+1 bands ⇒ one band equal)
3. minhash-LSH — banded Jaccard blocking (shared with entity linking,
                 logset_spark.operators.link.band_signatures)
4. verify      — exact n-gram Jaccard on candidate pairs only (native
                 array ops, no Python)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .link import band_signatures, jaccard


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact content hash."""
    keep = df.groupBy(F.md5(F.col(text_col)).alias("fingerprint")).agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def simhash_udf(bits: int = 64):
    """pandas UDF: text -> SimHash (bit-majority of stable token hashes).

    Token hash = blake2b-8byte (process-independent).  Vectorized per doc
    with a numpy bit matrix; Arrow-batched across docs."""
    from hashlib import blake2b

    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, txt in enumerate(texts):
            if not txt:
                continue
            toks = txt.lower().split()
            if not toks:
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "big")
                    for t in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bitmat = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = bitmat.sum(axis=0) * 2 >= len(toks)
            val = 0
            for b in np.nonzero(votes)[0]:
                val |= 1 << int(b)
            # two's-complement into int64
            out[i] = val - (1 << 64) if val >= (1 << 63) else val
        return pd.Series(out)

    return simhash


def simhash_bands(df: DataFrame, text_col: str = "text", n_bands: int = 4) -> DataFrame:
    """Explode the 64-bit simhash into n_bands bands of 64//n_bands bits:
    two docs with hamming distance < n_bands must agree on at least one
    band (pigeonhole), so candidate pairs come from an equi-join on
    (band_idx, band_val) — never an all-pairs hamming scan.

    The band expressions are built in a plain Python loop with int shift
    amounts: shiftrightunsigned's numBits parameter is int-only, so a
    transform-lambda Column there fails at plan-build time."""
    width = 64 // n_bands
    sh = df.withColumn("simhash", simhash_udf()(F.col(text_col)))
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(n_bands)
        ]
    )
    return sh.select(
        *df.columns,
        "simhash",
        F.posexplode(band_vals).alias("band_idx", "band_val"),
    )


def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash: band-blocked candidates, exact popcount
    verify (native bit_count).

    n_bands derives from max_hamming (pigeonhole needs max_hamming + 1
    bands for a guaranteed shared band — a fixed 4 would silently lose
    recall at max_hamming >= 4).  banded is locally checkpointed before
    the self-join: the two join branches alias differently, so without it
    the simhash UDF would evaluate the whole corpus twice."""
    banded = simhash_bands(df, text_col, n_bands=max_hamming + 1).localCheckpoint()
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
        "band_idx", "band_val",
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
        "band_idx", "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidates + exact token-shingle Jaccard verify.

    Shuffle discipline (VERDICT r04 §What's wrong 2): the banded frame
    carries (id, band, band_hash) ONLY — never the document text.  The
    old plan rode `txt` on every band row, i.e. `bands`x the corpus text
    through the localCheckpoint and the self-join exchange, then
    txt_a+txt_b on every candidate pair — the dominant shuffle cost at
    corpus scale.  Now the LSH exchange moves 3 longs per band row; the
    text is touched again only for docs that actually appear in a
    candidate pair, via a semi-join (AQE broadcasts the candidate-id set
    when it is small — the common case, since LSH exists precisely to
    make the candidate set << corpus).

    banded is locally checkpointed before the self-join — the branches
    alias differently, so the minhash UDF would otherwise run twice over
    the full corpus."""
    slim = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    banded = band_signatures(slim, "txt", num_hashes, bands, unit="word").select(
        "id", "band", "band_hash"
    ).localCheckpoint()
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )

    def shingles(c):
        # \s+ split + empty filter mirrors the python str.split() the
        # MinHash stage tokenizes with — a plain split(' ') keeps empty
        # tokens on doubled spaces and never splits tabs/newlines, so the
        # verify jaccard would disagree with the candidate stage (two docs
        # differing only by a double space scored 0.625, not 1.0)
        toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")
        return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
                )
            )
        )

    # shingle sets ONLY for candidate docs: semi-join scopes the second
    # corpus pass to ids that survived blocking (shingles are native
    # exprs, fused into the scan — no checkpoint, no double-UDF hazard)
    cand_ids = (
        cand.select(F.col("doc_a").alias("id"))
        .union(cand.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    sh = slim.join(cand_ids, "id", "left_semi").select(
        "id", shingles(F.col("txt")).alias("sh")
    )
    return (
        cand.join(
            sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
