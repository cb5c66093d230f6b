"""Exact Jaccard-threshold similarity join (operators/setjoin.py).

The load-bearing claim is EXACTNESS: prefix filtering must produce the
same pair set as naive all-pairs at every threshold — a missed pair
would be silent recall loss in a dedup audit.  Parity runs at several
thresholds against the in-Spark all-pairs reference; the DuckDB oracle
(q_simjoin) re-proves it cross-engine at sf0.01.
"""

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.setjoin import (
    jaccard_all_pairs,
    jaccard_threshold_join,
    token_sets,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pairs(df):
    return {
        (r["id1"], r["id2"], r["inter"], r["uni"]) for r in df.collect()
    }


@pytest.mark.parametrize("t100", [95, 90, 70])
def test_parity_with_all_pairs(spark, docs, t100):
    got = _pairs(jaccard_threshold_join(docs, t100=t100))
    exp = _pairs(jaccard_all_pairs(docs, t100=t100))
    assert got == exp
    assert len(exp) > 0  # the corpus is templated; thresholds chosen to hit


def test_prefix_join_avoids_frequent_tokens(spark, docs):
    """At a high threshold the candidate join must touch far fewer
    token postings than a full token-postings self-join would: the
    prefix slice keeps only n - ceil(t*n) + 1 rarest tokens per doc
    (~1-2 tokens at t=0.95 for short docs)."""
    ts = token_sets(docs)
    total_postings = ts.select(F.explode("tokens")).count()
    # replicate the operator's prefix accounting
    n_docs = ts.count()
    avg = total_postings / n_docs
    # at t100=95 the prefix is ~5% of tokens + 1; assert the bound holds
    max_prefix = ts.select(
        F.sum(
            F.size("tokens")
            - F.expr("((95 * size(tokens)) + 99) DIV 100")
            + 1
        ).alias("s")
    ).collect()[0]["s"]
    assert max_prefix < 0.25 * total_postings
    assert avg > 4  # sanity: docs are not trivially tiny


def test_empty_and_null_docs_excluded(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, ""),
        (4, None),
        (5, "...!!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = jaccard_threshold_join(df, t100=90)
    got = _pairs(out)
    assert got == {(1, 2, 3, 3)}


def test_threshold_validation(spark, docs):
    with pytest.raises(ValueError):
        jaccard_threshold_join(docs, t100=0)
    with pytest.raises(ValueError):
        jaccard_threshold_join(docs, t100=101)


def test_no_cartesian_in_plan(spark, docs):
    """The production path must contain no cartesian/nested-loop join:
    candidates come from the token equi-join only."""
    plan = (
        jaccard_threshold_join(docs, t100=90)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
