"""Grouped-map (applyInPandas) and grouped-agg (pandas UDAF) operators —
SURVEY.md §2.9 V4/V5.

These are the two vectorized escape hatches for per-group computations the
native F-kit cannot express:

* **V4 grouped map** — `groupBy(k).applyInPandas(fn, schema)`: the whole
  group lands in one pandas frame, so order-dependent, whole-group logic
  (gap analysis, per-conversation audits, per-group model scoring) runs as
  plain numpy/pandas.  Cost model at 100 TB: ONE shuffle on the group key,
  then each group must fit in one python worker's memory — use it for
  bounded groups (users, conversations), never for unbounded keys; a hot
  key needs pre-aggregation or salting first.
* **V5 grouped agg** — `pandas_udf` of PandasUDFType GROUPED_AGG inside a
  normal `groupBy(...).agg(...)`: a vectorized custom *aggregate* that
  composes with native aggregates in the same agg() — unlike V4 it
  benefits from partial aggregation planning and returns one scalar per
  group, so no whole-group materialization beyond the Arrow batch.

Both stay Arrow-batched end to end — no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA = (
    "user_id long, n_events long, median_value double, max_gap_s double"
)


def user_event_profile(events: DataFrame) -> DataFrame:
    """Per-user event profile via applyInPandas: event count, median value,
    and the largest inter-event time gap (seconds).

    The gap statistic needs the group's full, time-ordered event sequence —
    exactly the whole-group context V4 exists for.  Median uses numpy's
    linear interpolation, which equals ANSI SQL `quantile_cont(0.5)` /
    DuckDB `median`, so the operator stays oracle-checkable.

    Plan: one shuffle on user_id; groups are per-user event sets (bounded —
    a user's events, not the whole table), each processed as one pandas
    frame inside an Arrow batch."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"].sort_values()
        gaps = ts.diff().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [round(float(np.median(pdf["value"])), 4)],
                "max_gap_s": [
                    float(gaps.max().total_seconds()) if len(gaps) else None
                ],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(profile, PROFILE_SCHEMA)
    )


@F.pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDAF: sum(v*w)/sum(w) over the group, vectorized
    via Arrow.  NaN-safe: empty/zero-weight groups return None."""
    ws = float(w.sum())
    if ws == 0.0:
        return None
    return float(np.dot(v.to_numpy(dtype="float64"), w.to_numpy(dtype="float64")) / ws)


@F.pandas_udf("long")
def count_rows(v: pd.Series) -> int:
    """Grouped-agg row count.  Spark refuses to mix GROUPED_AGG pandas
    UDFs with native aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT),
    so any companion aggregate must itself be a pandas UDAF."""
    return len(v)


def weighted_price_by_flag(lineitem: DataFrame) -> DataFrame:
    """Quantity-weighted mean extended price per return flag — the V5
    showcase: custom vectorized aggregates in a normal groupBy().agg()
    (one shuffle; each group's columns arrive as Arrow batches)."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")), 2
            ).alias("w_avg_price"),
            count_rows(F.col("l_quantity")).alias("n_items"),
        )
    )


def salted_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    salt_col: str,
    n_salts: int = 16,
    scale: int = 2,
) -> DataFrame:
    """Skew-safe TWO-PHASE aggregation: partial agg on (key, salt) spreads
    a hot group over n_salts reducers, a second (tiny — n_keys x n_salts
    rows) agg on key merges the partials.  Catalyst's own partial
    aggregation already map-side-combines, but one hot key still lands on
    ONE final reducer; the explicit salt bounds that reducer's input at
    1/n_salts of the hot key — the aggregation twin of link.salted_join.

    Salt is pmod(xxhash64(salt_col), n_salts): deterministic, so re-runs
    are stable (no rand()), and derived from a row-level column so a hot
    key's rows spread uniformly.  The value sum stages through
    decimal(18,scale) — exact, associativity-safe: the rewrite must be
    provably value-identical to the plain GROUP BY, which is exactly what
    the q_skew_agg oracle checks.  Returns [key, n_rows, sum_<value_col>
    (decimal)]."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).alias("_s"),
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_s").alias(f"sum_{value_col}"),
    )
