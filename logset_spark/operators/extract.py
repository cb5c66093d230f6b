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
    (PK:src/handcoded.py).

    Plan shape: ONE input scan + one conv_id window (for followedBy) ->
    array-of-(subj,pred,obj)-structs -> explode.  A naive per-predicate
    union would scan the transcript table once per predicate (6x I/O at
    10^12 turns); the explode form is a single narrow pass."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        V.conv_uri("conv_id").alias("conv_u"),
        V.turn_uri("conv_id", "turn_idx").alias("turn_u"),
        V.role_uri("role").alias("role_u"),
        V.iso_ts("ts").alias("iso"),
        V.tool_uri("tool").alias("tool_u"),
        F.lead(V.turn_uri("conv_id", "turn_idx")).over(w).alias("next_u"),
    )

    def e(subj, pred, obj):
        return F.struct(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
        )

    entries = F.array(
        e(F.col("conv_u"), V.HAS_TURN, F.col("turn_u")),
        e(F.col("turn_u"), V.PART_OF, F.col("conv_u")),
        e(F.col("turn_u"), V.HAS_ROLE, F.col("role_u")),
        e(F.col("turn_u"), V.AT_TIME, F.col("iso")),
        e(F.col("turn_u"), V.USED_TOOL, F.col("tool_u")),  # null obj if no tool
        e(F.col("turn_u"), V.FOLLOWED_BY, F.col("next_u")),  # null obj if last
    )
    return t.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.explode(F.filter(entries, lambda x: x["obj"].isNotNull())).alias("tr"),
    ).select(
        F.col("tr.subj").alias("subj"),
        F.col("tr.pred").alias("pred"),
        F.col("tr.obj").alias("obj"),
        "conv_id",
        "turn_idx",
        "ts",
        F.lit(1.0).alias("conf"),
    )


_NAMELIKE_RE = re.compile(r"^[a-z]+[_-][a-z0-9_-]+$")
NAMELIKE_SQL = r"^[a-z]+[_-][a-z0-9_-]+$"  # keep in sync with _NAMELIKE_RE

# Cap on the auxiliary surface set the candidate detector broadcasts: only
# dictionary surfaces the name-shape regex can NOT recognize (bare single
# words like "mainframe") need to ride to the UDF at all — typically a tiny
# fraction of the dictionary.  Above the cap we stop collecting and fall
# back to emitting every token, letting the broadcast join classify (same
# semantics, wider hits arrays through the stage-1 shuffle).
NON_NAMELIKE_CAP = 1_000_000


def non_namelike_surfaces(dictionary: DataFrame, cap: int = NON_NAMELIKE_CAP):
    """Normalized dictionary surfaces that the name-shape heuristic would
    miss.  Returns a set (usually small), or None when it exceeds `cap` —
    the caller must then run the detector in emit-all mode.  This replaces
    the old full-dictionary collect: the driver never materializes more
    than `cap` surfaces no matter how large the dictionary is."""
    from . import link as L

    rows = (
        dictionary.select(L.normalize_form(F.col("surface")).alias("s"))
        .where(~F.col("s").rlike(NAMELIKE_SQL))
        .distinct()
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        return None
    return {r["s"] for r in rows if r["s"]}


def make_candidate_detector(spark, extra_surfaces: set[str] | None):
    """Vocabulary-light detector: emits every name-like token, every token
    in `extra_surfaces` (non-name-like dictionary surfaces), and ISO
    timestamps.  Entity-vs-unknown classification is decided downstream by
    the broadcast dictionary join (unified_stage1) — the join hit IS the
    membership test, so the full dictionary never crosses to the driver.

    `extra_surfaces=None` = emit-ALL-tokens mode (dictionary had more
    non-name-like surfaces than NON_NAMELIKE_CAP); pair it with
    unified_stage1(prefiltered=False) so the join-side filter drops
    tokens that neither hit the dictionary nor look name-like.

    The keep/drop decision tests the NORMALIZED token (strip('_-') is
    link.normalize_form restricted to the token charset) against the same
    name-shape regex the emit-all join-side filter applies to norm_form,
    and `extra_surfaces` holds normalized surfaces — so the two modes
    keep exactly the same tokens (parity asserted in
    tests/test_pipeline.py::test_detector_modes_agree).  Deciding on the
    raw token would diverge: 'mainframe-' normalizes to a dictionary
    surface but matches neither the raw-shape regex nor the set."""
    bc = spark.sparkContext.broadcast(
        frozenset(extra_surfaces) if extra_surfaces is not None else None
    )

    @F.pandas_udf(MENTION_TYPE)
    def detect(texts: pd.Series) -> pd.Series:
        extra = bc.value
        out = []
        for txt in texts:
            if txt is None:
                out.append([])
                continue
            low = txt.lower()
            found = []
            for tok in dict.fromkeys(_TOKEN_RE.findall(low)):
                norm = tok.strip("_-")
                if extra is None or _NAMELIKE_RE.match(norm) or norm in extra:
                    found.append(("cand", tok))
            found += [("ts", iso) for iso in dict.fromkeys(_ISO_RE.findall(txt))]
            out.append(found)
        return pd.Series(out)

    return detect


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


# followedBy skew bound: a window partitioned by conv_id alone sends a
# whole conversation to ONE sort task — a 10^7-turn agent transcript (the
# hot conv_ids the north rule calls out) becomes a straggler.  Chunking
# turn_idx bounds any conversation's contribution to a single task at
# TURN_CHUNK rows; the cross-chunk boundary edges come from a per-chunk
# summary table that is |turns|/TURN_CHUNK small.
TURN_CHUNK = 4096

# predicate-code value marking the PACKED per-turn checkpoint row (all six
# structural triples derive from it post-layout-shuffle); real predicate
# codes start at 1 (vocab.PRED_CODES)
TURN_PC = 0


def with_next_turn(
    base: DataFrame,
    chunk: int | None = None,
    col: str = "turn_u",
    out: str = "next_u",
) -> DataFrame:
    """Attach `out` = the next turn's `col` value within the conversation,
    without unbounded per-conv_id skew.  The pipeline leads the (4-byte)
    turn_idx itself (col="turn_idx", out="next_idx") so only ints ride the
    shuffle; the URI form is reconstructed post-layout-shuffle.

    Plan shape: ONE shuffle on (conv_id, chunk) — the window, the per-chunk
    boundary aggregate, and the boundary join all reuse that partitioning
    (Catalyst emits a single Exchange for the big side); the chunk-summary
    side is tiny.  Handles gaps in turn_idx (empty chunks) because the
    boundary lead() runs over chunks that actually exist."""
    if chunk is None:
        chunk = TURN_CHUNK  # read at call time so tests can shrink it
    w = Window.partitionBy("conv_id", "_chunk").orderBy("turn_idx")
    chunked = base.withColumn(
        "_chunk", F.floor(F.col("turn_idx") / chunk).cast("int")
    ).withColumn(out, F.lead(col).over(w))

    wb = Window.partitionBy("conv_id").orderBy("_chunk")
    bounds = (
        chunked.groupBy("conv_id", "_chunk")
        .agg(
            F.min_by(col, "turn_idx").alias("_first_v"),
            F.max("turn_idx").alias("_last_idx"),
        )
        .withColumn("_next_first_v", F.lead("_first_v").over(wb))
        .select("conv_id", "_chunk", "_next_first_v", "_last_idx")
    )
    return (
        chunked.join(bounds, ["conv_id", "_chunk"], "left")
        .withColumn(
            out,
            F.coalesce(
                out,
                F.when(F.col("turn_idx") == F.col("_last_idx"), F.col("_next_first_v")),
            ),
        )
        .drop("_chunk", "_next_first_v", "_last_idx")
    )


def unified_stage1(
    transcripts: DataFrame, detector, dictionary: DataFrame,
    prefiltered: bool = True, temporal: bool = False,
) -> DataFrame:
    """Single-pass stage 1: structural + exact-linked mention triples from
    ONE scan of the transcript table.

    Plan shape (the production path — SURVEY §3.2 stage 1):
      scan (text + keys only)
        -> detector pandas UDF map-side (text never crosses a shuffle)
        -> ONE narrow shuffle: conv_id window for followedBy (rows carry
           keys + the small hits array, not text)
        -> array-of-(subj,pred,obj,kind,form) structs -> explode
        -> broadcast dictionary join (the exact-link scoring stage)
    The two-leg union variant (structural_triples ∪ mentions) scans the
    input twice and runs both legs concurrently — measured 2x slower at
    32 cores from JVM/python-worker core contention.

    Output is the PACKED checkpoint row set:
      * ONE turn row per input turn (pc=TURN_PC): conv_id, turn_idx, ts,
        role, tool, next_idx — all six structural triples are functionally
        determined by these and are exploded only AFTER the final layout
        shuffle (pipeline._finisher), so neither the checkpoint write nor
        the dedup/layout shuffles ever carry the 6x structural row
        explosion or any URI strings;
      * one mention row per linked/unlinked mention (pc=MENTIONS): obj is
        the canonical URI / m:<form> / ts:<iso> literal, conf the link
        score, form_key (normalized surface) non-null marks mentions the
        fuzzy stage may still rewrite.
    On a memory-bandwidth-bound host this ~3x byte reduction through the
    hot write/shuffle paths is what moves N->4N scaling efficiency: the
    explode work it defers is pure codegen'd CPU, which scales with
    cores (scripts/hw_probe.py: cpu eff 0.93 vs mem eff 0.31)."""
    from . import link as L
    from .. import vocab as V

    from .coref import anaphor_rlike

    base = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        "role",
        "tool",
        detector(F.col("text")).alias("hits"),
        # Anaphor flag for the opt-in coref stage (pipeline._coref_rows):
        # computed HERE because stage 1 is the only pass that sees text.
        # Native rlike (whole-stage codegen, no second UDF), one boolean
        # through the window shuffle and the checkpoint — always present
        # so the checkpoint schema never varies with pipeline flags.
        F.lower(F.col("text")).rlike(anaphor_rlike()).alias("is_anaphor"),
    )
    # lead the 4-byte turn_idx, not a turn URI: ints through the shuffle
    base = with_next_turn(base, col="turn_idx", out="next_idx")

    C = V.PRED_CODES
    turn_marker = F.array(
        F.struct(
            F.lit(TURN_PC).cast("tinyint").alias("pc"),
            F.lit(None).cast("string").alias("obj"),
            F.lit(None).cast("string").alias("form"),
        )
    )
    mention = F.transform(
        "hits",
        lambda h: F.struct(
            F.lit(C[V.MENTIONS]).cast("tinyint").alias("pc"),
            F.when(h["kind"] == "ts", F.concat(F.lit("ts:"), h["form"]))
            .otherwise(F.lit(None).cast("string"))
            .alias("obj"),
            F.when(h["kind"] != "ts", h["form"]).alias("form"),
        ),
    )
    entries = F.concat(turn_marker, mention)
    is_turn = F.col("tr.pc") == TURN_PC
    exploded = base.select(
        "conv_id", "turn_idx", "ts", "role", "tool", "next_idx", "is_anaphor",
        F.explode(entries).alias("tr"),
    ).select(
        "conv_id", "turn_idx", "ts",
        F.col("tr.pc").alias("pc"),
        F.col("tr.obj").alias("obj"),
        F.col("tr.form").alias("form"),
        F.when(F.col("tr.form").isNotNull(), L.normalize_form(F.col("tr.form")))
        .alias("norm_form"),
        # per-turn attributes ride ONLY the turn row (columnar nulls are
        # ~free on the mention rows)
        F.when(is_turn, F.col("role")).alias("role"),
        F.when(is_turn, F.col("tool")).alias("tool"),
        F.when(is_turn, F.col("next_idx")).alias("next_idx"),
        F.when(is_turn, F.col("is_anaphor")).alias("is_anaphor"),
    )
    if temporal:
        # time-valid aliases: broadcast HASH join on the surface with the
        # validity interval as the join residual (intervals are disjoint,
        # so the join stays at-most-1:1); mentions before a surface's
        # first valid_from remain unlinked and flow to the fuzzy stage.
        dim = L.temporal_surface_dictionary(dictionary)
        cond = (
            (exploded.norm_form == dim.surface)
            & (exploded.ts >= dim.valid_from)
            & (dim.valid_to.isNull() | (exploded.ts < dim.valid_to))
        )
        joined = exploded.join(F.broadcast(dim), cond, "left").drop(
            "valid_from", "valid_to"
        )
    else:
        dim = L.best_surface_dictionary(dictionary)
        joined = exploded.join(
            F.broadcast(dim), exploded.norm_form == dim.surface, "left"
        )
    hit = F.col("canon_uri").isNotNull()
    if not prefiltered:
        # emit-all detector mode: the join is the membership test — drop
        # tokens that neither hit the dictionary nor look name-like
        # (exactly what the prefiltering UDF drops in the normal mode).
        joined = joined.where(
            F.col("form").isNull() | hit | F.col("norm_form").rlike(NAMELIKE_SQL)
        )
    return joined.select(
        "conv_id",
        "turn_idx",
        "ts",
        "pc",
        F.coalesce("obj", "canon_uri", V.mention_uri(F.col("form"))).alias("obj"),
        F.when(F.col("form").isNull(), F.lit(1.0))
        .when(hit, F.col("score"))
        .otherwise(F.lit(0.0))
        .cast("float")
        .alias("conf"),
        F.when(F.col("form").isNotNull() & ~hit, F.col("norm_form")).alias("form_key"),
        "role",
        "tool",
        "next_idx",
        "is_anaphor",
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
