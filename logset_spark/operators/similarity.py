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
    # try_divide, not '/': under Spark 4's default ANSI mode one all-zero
    # embedding anywhere in a 10^x-row corpus would throw DIVIDE_BY_ZERO
    # and abort the whole job.  Zero-norm vectors score null -> never
    # enter any top-k / threshold result, which is the right semantics
    # (cosine is undefined for them).
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


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


def make_sign_lsh_udf(n_planes: int = 8, n_tables: int = 1, seed: int = 11):
    """pandas UDF: embedding -> array of LSH bucket ids, one per hash
    table (sign bits vs fixed random hyperplanes; the table index rides in
    the high bits so tables never collide).  One numpy matmul per Arrow
    batch covering all tables at once.

    The hyperplanes are derived lazily from (seed, dim-of-first-batch):
    a seeded generator produces the identical plane tensor in every
    executor/batch, so NO driver-side action is needed to learn the
    embedding dimension (the old `corpus.first()` probe is gone)."""
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    tags = (np.arange(n_tables, dtype=np.int64) << n_planes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        planes = np.random.default_rng(seed).standard_normal(
            (mat.shape[1], n_tables * n_planes)
        )
        signs = (mat @ planes >= 0).reshape(len(mat), n_tables, n_planes)
        ids = signs @ powers + tags  # (batch, n_tables)
        return pd.Series(list(ids))

    return buckets


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int | None = None,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    neighborhood (equi-join on bucket id), exact cosine inside.

    Standard L-table OR-construction + multi-probe:
    * `n_tables` independent sign-LSH tables — a neighbor is a candidate
      if it shares a bucket in ANY table (recall 1-(1-p^b)^L instead of
      p^b for one table);
    * each query additionally probes the buckets at Hamming distance 1
      from its own in every table (`n_probes` bit flips, default ALL
      n_planes), catching neighbors that disagree on a single hyperplane.
    Cost model at scale: the corpus is hashed once into L buckets per
    vector (map-side; the bucket join key is the only thing that fans
    out), probing cost scales on the small broadcast query side only, and
    duplicate candidates across tables are deduped BEFORE ranking.  Recall
    vs the exact baseline is measured in
    tests/test_properties.py::test_ann_lsh_recall and reported by
    bench.py."""
    bucket = make_sign_lsh_udf(n_planes, n_tables)
    if n_probes is None:
        n_probes = n_planes
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qe"),
        bucket(F.col(vec_col)).alias("bs"),
    )
    probes = F.flatten(
        F.transform(
            "bs",
            lambda b: F.array(
                b, *[b.bitwiseXOR(F.lit(1 << i)) for i in range(n_probes)]
            ),
        )
    )
    q = q0.select("query_id", "qe", F.explode(probes).alias("bucket"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ce"),
        F.explode(bucket(F.col(vec_col))).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 4).alias("cosine"),
        )
        .distinct()  # a pair can collide in several tables/probes
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a BOUNDED sample.

    The sample is `limit(sample)` rows (deterministic; a fixed few-MB
    matrix at any corpus size) pulled to the driver once — training cost
    is O(sample x n_cells x iters) numpy flops, independent of corpus
    scale; the full corpus only ever sees the broadcast centroids.
    Returns L2-normalized centroids (n_cells, dim)."""
    rows = corpus.select(vec_col).limit(sample).collect()
    mat = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
    return cents


def make_cell_udf(centroids: np.ndarray, n_probe: int = 1):
    """pandas UDF: embedding -> array of the n_probe nearest cell ids
    (by cosine against the broadcast-by-closure centroid matrix).  One
    numpy matmul per Arrow batch; n_probe=1 for corpus assignment,
    n_probe>1 on the query side for multi-cell probing."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ centroids.T  # (batch, n_cells)
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return cells


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell (inverted file); each query scores only the rows of its n_probe
    nearest cells.  Expected scan fraction ~ n_probe/n_cells of the
    corpus per query — the classic recall/cost dial (recall measured
    against cosine_topk in tests/test_properties.py).

    Honest caveat on the measured recall: the sandbox embeddings are
    near-uniform random vectors — the adversarial case for any
    cell-partitioned ANN (no cluster structure, so recall tracks the scan
    fraction almost linearly: 0.63 at 25% scan, 0.82 at 50% on sf0.01).
    Real embedding corpora cluster, which is the regime IVF exploits;
    the defaults here (8 of 16 cells) are chosen to clear a 0.75 recall
    floor even on structureless data.

    Scale shape: centroids train on a bounded driver sample, ride to
    executors inside the UDF closure (a few KB), cell assignment is
    map-side, and the probe join is corpus-cell x broadcast(query-probe)
    — no all-pairs stage anywhere."""
    cents = train_centroids(corpus, n_cells, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("ce"),
        F.element_at(make_cell_udf(cents, 1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qe"),
        F.explode(make_cell_udf(cents, n_probe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
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
