"""S-family — JSON-lines transcript ingestion with corrupt-row quarantine.

The reference ingests raw per-system log files one at a time with
hand-coded Python parsers (SURVEY §1.1); transcript exports in the wild
are most often JSONL.  Spark-first ingestion rules:

* **Explicit schema, never inference.**  Schema inference runs a full
  extra pass over the data to sample types — at 100 TB that doubles the
  scan.  The transcript schema is the north-rule input contract, so
  declare it.
* **Parse as text + ``from_json``, not the raw JSON datasource.**  The
  datasource's internal ``_corrupt_record`` column refuses any query that
  references only it (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN
  — even ``bad.count()`` after column pruning), which makes the
  quarantine side second-class.  A text scan + ``from_json`` gives the
  identical parse (same Jackson options) with the raw line retained as an
  ordinary column: one scan, both splits first-class.
* **Quarantine, don't FAILFAST.**  A malformed line yields a null struct;
  good rows flow on, bad raw lines go to their own audit sink.  FAILFAST
  on 10^12 rows means one truncated upload kills a cluster-day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_COL = "_raw_line"

# the north-rule transcript contract (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


_CORRUPT = "_corrupt"
# from_json fills a field named by columnNameOfCorruptRecord with the raw
# text when the line fails to parse (PERMISSIVE) — the quarantine signal.
_PARSE_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA) + [T.StructField(_CORRUPT, T.StringType())]
)


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One text scan -> (typed transcript columns..., _raw_line, _bad)."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value").alias(RAW_COL),
        F.from_json(
            F.col("value"),
            _PARSE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r"),
    )
    return parsed.select(
        RAW_COL,
        *[F.col(f"r.{f.name}") for f in TRANSCRIPT_SCHEMA],
        F.col(f"r.{_CORRUPT}").isNotNull().alias("_bad"),
    )


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined raw lines).  Good rows additionally require the
    join/partition keys the pipeline depends on — a syntactically valid
    line with no conv_id is as unusable as a malformed one, so it lands
    in the SAME quarantine (good ∪ bad must account for every input
    line; silently vanishing rows would defeat the audit sink)."""
    has_keys = F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    bad = parsed.where(F.col("_bad") | ~has_keys).select(RAW_COL)
    good = (
        parsed.where(~F.col("_bad") & has_keys)
        .drop(RAW_COL, "_bad")
    )
    return good, bad
