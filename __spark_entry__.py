"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship KG-structural-triples query on sf0.001
queries()     -> one builder per implemented operator (SURVEY.md §2)
oracle_sql()  -> matching DuckDB ANSI SQL (None-valued entries are
                 intentionally omitted: approx sketches / hash signatures
                 are not SQL-reproducible -> rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logset_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive transcripts from sf0.001 events and emit the
    structural knowledge-graph triples (conv->turn->role/tool/time edges,
    the LogSet ConcreteLog/LogSeries/partOf recast)."""
    fn, _ = REGISTRY["q_kg_structural"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
