"""S-family — CSV transcript ingestion with corrupt-row quarantine.

The CSV twin of sources/jsonl.py (same rules, same rationale):

* **Explicit schema, never inference** — CSV inference is an extra full
  scan at 100 TB, and silently guesses types per-file.
* **Text scan + ``from_csv``, not the raw CSV datasource** — identical
  parse (same Univocity options) with the raw line retained as an
  ordinary column, so the quarantine split is first-class (the
  datasource's internal corrupt-record column refuses corrupt-only
  queries, exactly like the JSON one).
* **Quarantine, don't FAILFAST** — a malformed line (unclosed quote,
  non-numeric turn_idx, ragged row) yields a corrupt marker; good rows
  flow, bad raw lines land in an audit sink.  good ∪ bad accounts for
  every input line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .jsonl import RAW_COL, TRANSCRIPT_SCHEMA

_CORRUPT = "_corrupt"
_PARSE_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    f"ts timestamp, {_CORRUPT} string"
)

# header line of the transcript CSV contract — matched literally to strip
# it from the text scan (a text source has no header handling; matching
# the exact contract line means a data row can never be mistaken for it)
HEADER = "conv_id,turn_idx,role,text,tool,ts"


def read_transcripts_csv(spark: SparkSession, path: str) -> DataFrame:
    """One text scan -> (typed transcript columns..., _raw_line, _bad)."""
    raw = spark.read.text(path).where(F.col("value") != HEADER)
    parsed = raw.select(
        F.col("value").alias(RAW_COL),
        F.from_csv(
            F.col("value"),
            _PARSE_DDL,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
                "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss",
                # RFC-4180 doubled-quote escaping ("" inside a quoted
                # field) — Spark's CSV default escape is backslash
                "quote": '"',
                "escape": '"',
            },
        ).alias("r"),
    )
    return parsed.select(
        RAW_COL,
        *[F.col(f"r.{f.name}") for f in TRANSCRIPT_SCHEMA],
        F.col(f"r.{_CORRUPT}").isNotNull().alias("_bad"),
    )


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined raw lines) — same key rule as the JSONL source:
    syntactically-fine rows missing the pipeline's join/partition keys are
    quarantined too, so no input line silently vanishes."""
    has_keys = F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    bad = parsed.where(F.col("_bad") | ~has_keys).select(RAW_COL)
    good = parsed.where(~F.col("_bad") & has_keys).drop(RAW_COL, "_bad")
    return good, bad
