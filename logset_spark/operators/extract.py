"""Stage 1 — triple extraction from transcripts.

The reference emits triples from hand-coded Python entity classes looping
over files one at a time (PK:src/handcoded.py; SURVEY §1.1).  Here:

* **structural triples** are pure native column expressions — URI minting
  via concat, next-turn edges via a lag/lead window.  Whole-stage codegen,
  zero Python.
* **mention detection** is the one genuinely non-relational step, so it is
  a vectorized pandas UDF (Arrow-batched, per BASELINE.json north_star
  "vectorized pandas/Arrow UDFs perform batched mention detection") that
  scans each text batch for dictionary surface forms and ISO timestamps,
  returning array<struct<kind,form>> that explodes natively afterwards.

Scale notes: the UDF receives only (text) — keys stay JVM-side and are
re-attached by position via posexplode-free select, so the Arrow transfer
ships one string column, not the whole row.  The surface vocabulary rides
an indexed broadcast (a frozenset per executor), not a per-row closure.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import vocab as V

# token grammar shared by synth fixtures, detector, and tests: lowercase
# word chars with _ or - separators (entity/tool surfaces), or ISO ts
_TOKEN_RE = re.compile(r"[a-z][a-z0-9_-]*")
_ISO_RE = re.compile(r"\b\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\b")

MENTION_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("form", T.StringType()),
        ]
    )
)


def structural_triples(transcripts: DataFrame) -> DataFrame:
    """conv->hasTurn->turn, turn->partOf->conv, hasRole, atTime, usedTool,
    followedBy.  Mirrors ConcreteLog/LogSeries/partOf emission
    (PK:src/handcoded.py) as one narrow select + a window for followedBy."""
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        V.conv_uri("conv_id").alias("conv_u"),
        V.turn_uri("conv_id", "turn_idx").alias("turn_u"),
        V.role_uri("role").alias("role_u"),
        V.iso_ts("ts").alias("iso"),
        V.tool_uri("tool").alias("tool_u"),
        F.col("tool").isNotNull().alias("has_tool"),
    )

    def tri(subj, pred, obj):
        return t.select(
            F.col(subj).alias("subj"),
            F.lit(pred).alias("pred"),
            F.col(obj).alias("obj"),
            "conv_id",
            "turn_idx",
            "ts",
            F.lit(1.0).alias("conf"),
        )

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    followed = (
        t.withColumn("next_u", F.lead("turn_u").over(w))
        .where(F.col("next_u").isNotNull())
        .select(
            F.col("turn_u").alias("subj"),
            F.lit(V.FOLLOWED_BY).alias("pred"),
            F.col("next_u").alias("obj"),
            "conv_id",
            "turn_idx",
            "ts",
            F.lit(1.0).alias("conf"),
        )
    )

    parts = [
        tri("conv_u", V.HAS_TURN, "turn_u"),
        tri("turn_u", V.PART_OF, "conv_u"),
        tri("turn_u", V.HAS_ROLE, "role_u"),
        tri("turn_u", V.AT_TIME, "iso"),
        t.where("has_tool").select(
            F.col("turn_u").alias("subj"),
            F.lit(V.USED_TOOL).alias("pred"),
            F.col("tool_u").alias("obj"),
            "conv_id",
            "turn_idx",
            "ts",
            F.lit(1.0).alias("conf"),
        ),
        followed,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_NAMELIKE_RE = re.compile(r"^[a-z]+[_-][a-z0-9_-]+$")


def make_mention_detector(spark, surfaces: set[str], include_unknown: bool = True):
    """Vectorized detector closed over a broadcast surface vocabulary.

    Returns a pandas UDF: Series[str] -> Series[list[(kind, form)]] with
    kind ∈ {entity, unknown, ts}: dictionary hits, name-like tokens not in
    the dictionary (fuzzy-link candidates), ISO-timestamp literals.
    One tokenize pass per text; set membership against the broadcast
    frozenset is O(1) per token.
    """
    bc = spark.sparkContext.broadcast(frozenset(surfaces))

    @F.pandas_udf(MENTION_TYPE)
    def detect(texts: pd.Series) -> pd.Series:
        vocab_set = bc.value
        out = []
        for txt in texts:
            if txt is None:
                out.append([])
                continue
            low = txt.lower()
            found = []
            for tok in dict.fromkeys(_TOKEN_RE.findall(low)):
                if tok in vocab_set:
                    found.append(("entity", tok))
                elif include_unknown and _NAMELIKE_RE.match(tok):
                    found.append(("unknown", tok))
            found += [("ts", iso) for iso in dict.fromkeys(_ISO_RE.findall(txt))]
            out.append(found)
        return pd.Series(out)

    return detect


def unknown_token_detector():
    """Vocabulary-free variant: every candidate token (kept for fuzzy
    linking of forms the dictionary does not contain)."""

    @F.pandas_udf(MENTION_TYPE)
    def detect(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            if txt is None:
                out.append([])
                continue
            out.append(
                [("token", t) for t in dict.fromkeys(_TOKEN_RE.findall(txt.lower()))]
            )
        return pd.Series(out)

    return detect


def mentions(transcripts: DataFrame, detector) -> DataFrame:
    """Apply the detector and explode: (conv_id, turn_idx, ts, kind, form).

    Column pruning: only text + keys enter the Arrow exchange."""
    hits = transcripts.select(
        "conv_id", "turn_idx", "ts", detector(F.col("text")).alias("hits")
    )
    m = hits.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.explode("hits").alias("hit"),
    )
    return m.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("hit.kind").alias("kind"),
        F.col("hit.form").alias("form"),
    )


def mention_triples(linked: DataFrame) -> DataFrame:
    """linked: (conv_id, turn_idx, ts, kind, form, canon_uri?, score?) ->
    turn->mentions->obj triples.  Linked mentions point at the canonical
    URI with its score; unlinked keep a m:<form> node with conf 0.0; ts
    mentions become ts:<iso> literals."""
    turn_u = V.turn_uri("conv_id", "turn_idx")
    obj = (
        F.when(F.col("kind") == "ts", F.concat(F.lit("ts:"), F.col("form")))
        .when(F.col("canon_uri").isNotNull(), F.col("canon_uri"))
        .otherwise(V.mention_uri(F.col("form")))
    )
    conf = (
        F.when(F.col("kind") == "ts", F.lit(1.0))
        .when(F.col("canon_uri").isNotNull(), F.col("score"))
        .otherwise(F.lit(0.0))
    )
    return linked.select(
        turn_u.alias("subj"),
        F.lit(V.MENTIONS).alias("pred"),
        obj.alias("obj"),
        "conv_id",
        "turn_idx",
        "ts",
        conf.alias("conf"),
    )
