"""Pure-pandas oracle of the KG spec — the golden-triple generator.

Stands in for the reference's emitted Turtle until /root/reference is
populated (it was EMPTY at survey time, SURVEY.md §0); slow-but-obvious,
no Spark.  Produces the *ground truth* graph: every mention (including
typo variants, which the oracle can resolve exactly because it knows the
generator's typo map) linked to its canonical URI.  The pipeline's fuzzy
linker is then graded P/R against this (target >= 0.95, BASELINE.json:2).
"""

from __future__ import annotations

import re

import pandas as pd

from logset_spark.sources import synth

_TOKEN_RE = re.compile(r"[a-z][a-z0-9_-]*")
_ISO_RE = re.compile(r"\b\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\b")


def golden_triples(transcripts: pd.DataFrame, dictionary: pd.DataFrame) -> pd.DataFrame:
    """(s,p,o) ground truth for a synth transcript table."""
    tmap = synth.typo_map(dictionary)
    typo_to_canon = dict(zip(tmap.typo, tmap.canon_uri))
    # best canon per surface: max weight, tie-break min canon_uri
    best = (
        dictionary.sort_values(["surface", "weight", "canon_uri"],
                               ascending=[True, False, True])
        .drop_duplicates("surface")
    )
    surface_to_canon = dict(zip(best.surface, best.canon_uri))

    rows: list[tuple[str, str, str]] = []
    df = transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, grp in df.groupby("conv_id", sort=False):
        conv_u = f"conv:{conv_id}"
        turn_us = [f"turn:{conv_id}/{i}" for i in grp.turn_idx]
        for (_, r), turn_u, nxt in zip(
            grp.iterrows(), turn_us, turn_us[1:] + [None]
        ):
            rows.append((conv_u, "hasTurn", turn_u))
            rows.append((turn_u, "partOf", conv_u))
            rows.append((turn_u, "hasRole", f"role:{r.role.strip().lower()}"))
            iso = pd.Timestamp(r.ts).strftime("%Y-%m-%dT%H:%M:%S")
            rows.append((turn_u, "atTime", iso))
            if r.tool is not None and not (isinstance(r.tool, float) and pd.isna(r.tool)):
                rows.append((turn_u, "usedTool", f"tool:{r.tool.strip().lower()}"))
            if nxt is not None:
                rows.append((turn_u, "followedBy", nxt))
            text = r.text or ""
            for tok in dict.fromkeys(_TOKEN_RE.findall(text.lower())):
                if tok in surface_to_canon:
                    rows.append((turn_u, "mentions", surface_to_canon[tok]))
                elif tok in typo_to_canon:
                    rows.append((turn_u, "mentions", typo_to_canon[tok]))
            for iso_m in dict.fromkeys(_ISO_RE.findall(text)):
                rows.append((turn_u, "mentions", f"ts:{iso_m}"))
    out = pd.DataFrame(rows, columns=["subj", "pred", "obj"]).drop_duplicates()
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
