"""Blank-node skolemization via distributed color refinement.

Blank node labels are GRAPH-LOCAL: parsing the same catalog twice
yields `_:anon-1` vs `_:anon-57` for the same `[ ... ]` node, so a
union of the two loads carries every bnode structure twice and
`distinct()` can't see it.  rdflib exposes `Graph.skolemize()` for
exactly this; at warehouse scale the relabeling must be a DataFrame
job.

The canonical label is a Weisfeiler-Leman (1-WL) color: start every
node at a color derived from its own term (bnodes all start alike —
their label carries no information by definition), then refine for k
rounds, each round hashing the sorted multiset of (direction,
predicate, neighbor color) edge signatures around the node.  After k
rounds two bnodes share a color iff their k-hop neighborhoods are
indistinguishable — structurally identical parse products (nested
property lists, rdf collections) collapse to the same skolem IRI while
structurally different nodes separate (w.h.p. under md5).

Plan shape per round: explode each triple into two directed
half-edges, join neighbor colors (equi-join on the node key), then ONE
groupBy per node with collect_list -> array_sort -> md5 — all
JVM-side, linear in |E| per round, k rounds total (k=2 covers the
nesting depth real catalog bnodes have; deeper structures just need a
bigger k, it never needs to reach graph diameter because only
bnode-to-bnode chains propagate ambiguity).

Fixed rounds are SEMANTICS here (the k-hop guarantee), so the oracle
(q_skolem) unrolls the same k rounds in SQL — same signature strings,
same sort, same md5 — and hash-matches exactly.

Two modes, because collapsing is not always wanted:

* dedup=True (default) — structurally identical bnodes map to the SAME
  skolem IRI, so union-of-reloads dedups with a plain distinct().
  Caveat, documented honestly: 1-WL cannot distinguish certain
  regular bnode-only structures (two disjoint equal-length cycles over
  one predicate refine identically), and those would conflate.  Real
  catalog bnodes are trees/lists (`[ ... ]` property lists, `( ... )`
  collections), where k-round WL is exact for nesting depth <= k.
* dedup=False — rdflib `Graph.skolemize()` parity: every bnode gets a
  unique IRI (color + original-label hash), stable within one load,
  no collapsing ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKOLEM_NS = "sk:"


def _is_bnode(col):
    return col.startswith("_:")


def wl_colors(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """DataFrame[node, color] for every term in subj/obj position.

    Non-bnode terms are their own color (md5 of the term — stable
    across graphs); bnodes start uniform and differentiate through
    their neighborhoods over `rounds` refinement rounds.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    t = triples.select("subj", "pred", "obj")
    nodes = (
        t.select(F.col("subj").alias("node"))
        .unionByName(t.select(F.col("obj").alias("node")))
        .distinct()
    )
    colors = nodes.select(
        "node",
        F.md5(
            F.when(_is_bnode(F.col("node")), F.lit("__bnode__")).otherwise(
                F.col("node")
            )
        ).alias("color"),
    )
    # two directed half-edges per triple: the node sees (dir, pred, peer)
    out_half = t.select(
        F.col("subj").alias("node"), F.lit("o").alias("dir"),
        "pred", F.col("obj").alias("peer"),
    )
    in_half = t.select(
        F.col("obj").alias("node"), F.lit("i").alias("dir"),
        "pred", F.col("subj").alias("peer"),
    )
    half = out_half.unionByName(in_half)
    for _ in range(rounds):
        peer_colors = colors.select(
            F.col("node").alias("peer"), F.col("color").alias("peer_color")
        )
        sigs = (
            half.join(peer_colors, "peer")
            .select(
                "node",
                F.concat_ws("|", "dir", "pred", "peer_color").alias("sig"),
            )
            .groupBy("node")
            .agg(
                F.md5(
                    F.array_join(F.array_sort(F.collect_list("sig")), ",")
                ).alias("sig_color")
            )
        )
        # isolated nodes (no edges) keep their previous color
        colors = (
            colors.join(sigs, "node", "left")
            .select(
                "node",
                F.when(
                    _is_bnode(F.col("node")) & F.col("sig_color").isNotNull(),
                    F.col("sig_color"),
                )
                .otherwise(F.col("color"))
                .alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    return colors


def skolemize(
    triples: DataFrame, rounds: int = 2, dedup: bool = True
) -> DataFrame:
    """Relabel every `_:` node to a deterministic skolem IRI.

    dedup=True: `sk:<color>` — structurally identical bnodes collapse
    (see module docstring for the 1-WL caveat).  dedup=False: rdflib
    parity, `sk:<color>-<md5(label)>` — unique per original label,
    never collapses.  Non-bnode terms pass through untouched.
    """
    colors = wl_colors(triples, rounds)
    bn = colors.where(_is_bnode(F.col("node")))
    sk = (
        F.concat(F.lit(SKOLEM_NS), F.col("color"))
        if dedup
        else F.concat(
            F.lit(SKOLEM_NS), F.col("color"), F.lit("-"), F.md5(F.col("node"))
        )
    )
    mapping = bn.select("node", sk.alias("sk"))
    t = triples.select("subj", "pred", "obj")

    s_map = mapping.select(F.col("node").alias("subj"), F.col("sk").alias("s_sk"))
    o_map = mapping.select(F.col("node").alias("obj"), F.col("sk").alias("o_sk"))
    return (
        t.join(s_map, "subj", "left")
        .join(o_map, "obj", "left")
        .select(
            F.coalesce("s_sk", "subj").alias("subj"),
            "pred",
            F.coalesce("o_sk", "obj").alias("obj"),
        )
    )
