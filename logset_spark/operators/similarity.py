"""Similarity search over embedding columns (array<float>).

* cosine_topk — exact brute force: corpus x broadcast(queries), native
  zip_with/aggregate dot products (JVM-side, codegen), window top-k.
  The recall=1.0 baseline; linear in corpus size, embarrassingly parallel.
* lsh_topk — random-hyperplane LSH: sign-bit signature (vectorized numpy
  matmul in a pandas UDF) buckets the corpus; only same-bucket pairs are
  scored.  The 100 TB path: bucket count grows 2^n_planes, each query
  touches one bucket instead of the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. queries must be small (broadcast side).
    Rank on the ROUNDED score with id tie-break => fully deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qe")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ce")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def make_sign_lsh_udf(dim: int, n_planes: int = 8, seed: int = 11):
    """pandas UDF: embedding -> LSH bucket id (sign bits vs fixed random
    hyperplanes).  One numpy matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = mat.astype(np.float64) @ planes >= 0  # (batch, n_planes)
        return pd.Series(signs @ powers)

    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (equi-join on bucket id), exact cosine inside the bucket."""
    dim = len(corpus.select(vec_col).first()[0])
    bucket = make_sign_lsh_udf(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qe"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ce"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
