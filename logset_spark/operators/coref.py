"""Conversation-scoped anaphora resolution (coreference linking).

The reference's hand-coded emitters operate file-at-a-time and never
recover cross-line references (PK:src/handcoded.py — SURVEY §0: pointer
unverifiable, reference dir empty).  Transcripts, unlike log files, are
DISCOURSE: a turn saying "it failed again" refers to an entity named in
an earlier turn.  This operator resolves such anaphors with the standard
deterministic recency heuristic — an anaphoric turn refers to the most
recently LINKED entity in a strictly earlier turn of the same
conversation — expressed as one window function, never per-row Python:

    antecedent = last(entity, ignorenulls=True)
                   OVER (PARTITION BY conv ORDER BY turn
                         ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)

Scale shape: ONE hash exchange on the conversation key (the same key the
warehouse is bucketed by), narrow columns (conv, turn, entity) — the
window never sees text or full triples.  Ties inside a turn (several
linked mentions) elect min(entity) so the result is deterministic and
replayable in ANSI SQL (the q_coref oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Pronoun surface set the pipeline's stage-1 scan flags as anaphoric.
# Deliberately tiny and third-person: I/you bind to the conversation
# roles (already structural triples), not to mentioned entities.
ANAPHORS = ("it", "they", "this", "that")

# Linking score carried on refersTo triples: a recency heuristic is
# weaker evidence than an exact dictionary hit (1.0) and stronger than
# an unlinked mention (0.0); the midpoint is deliberate and documented
# rather than tuned.
COREF_CONF = 0.5


def anaphor_rlike(anaphors=ANAPHORS) -> str:
    """Native rlike pattern matching any anaphor as a whole lowercase
    token (the detector grammar's token boundaries: non-alnum)."""
    alt = "|".join(anaphors)
    return rf"(^|[^a-z0-9])({alt})([^a-z0-9]|$)"


def resolve_anaphora(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ent_col: str = "ent",
    anaphor_col: str = "is_anaphor",
) -> DataFrame:
    """Input: ONE row per turn with `ent_col` = the turn's linked entity
    (null when the turn mentions none; several mentions should already be
    collapsed to one by the caller's min() election) and `anaphor_col` =
    whether the turn contains an anaphor.  Output: the input plus
    `antecedent` — the most recent non-null entity of a STRICTLY earlier
    turn — on anaphoric rows (null antecedent = unresolved: conversation
    opener or no prior linked mention); non-anaphoric rows are dropped.

    The exclusive upper frame bound means a turn that both names an
    entity and contains an anaphor resolves to the PRIOR entity, not
    itself — "alpha crashed. restart it" resolves `it` -> alpha only
    when alpha was named earlier; same-turn binding is the mention
    triple's job, not coref's."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        turns.withColumn(
            "antecedent", F.last(ent_col, ignorenulls=True).over(w)
        )
        .where(F.col(anaphor_col))
        .drop(anaphor_col)
    )
