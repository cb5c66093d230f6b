"""Stage 3 — canonicalization via connected components over alias edges.

The reference never needs this (rdflib graphs are tiny and single-process);
at 10^12 turns duplicate-node merging is a distributed CC problem
(BASELINE.json north_star: "connected-components union over
GraphFrames-style iterative DataFrame self-joins").  No graphframes jar in
this sandbox, so CC is implemented directly as iterative DataFrame
self-joins.

Algorithm: min-label propagation with path-halving — each round every node
adopts min(own label, neighbors' labels), then labels chase their own
parents (label <- label[label]) which doubles convergence speed.  Rounds =
O(log(diameter)); entity-alias graphs are near-star-shaped so 2-4 rounds
in practice.  The one genuinely scale-lethal trap is Catalyst lineage
blowup across iterations — every round ends in localCheckpoint(eager=True)
to truncate the plan (SURVEY §4).

Convergence is decided by an aggregate ("did any label change?") — one
scalar collect per round, the only driver<->cluster crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidirect(edges: DataFrame) -> DataFrame:
    e = edges.select(F.col("src"), F.col("dst"))
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


# Driver-path ceiling: 250k edges x ~(2 python str objects + dict slots)
# ≈ low hundreds of MB of driver heap worst-case — a safe spike on any
# sane driver.  (2M edges was flagged as a multi-GB spike right at the
# threshold: ~100 B/row of payload is dwarfed by CPython object overhead.)
SMALL_GRAPH_EDGES = 250_000


def _driver_side_cc(edges: DataFrame) -> DataFrame:
    """Union-find on the driver for small alias graphs.  The iterative
    DataFrame loop below costs ~0.5s of scheduling latency per round no
    matter how small the data is; below SMALL_GRAPH_EDGES the whole edge
    list fits in driver memory trivially and a collect + union-find is
    both faster and exactly equivalent (same min-label semantics)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in edges.collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min label wins
    out = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(
        out, "node string, component string"
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, small_graph_edges: int | None = None
) -> DataFrame:
    """edges: DataFrame[src:string, dst:string] (undirected; self-loops ok)
    -> DataFrame[node:string, component:string] where component is the
    lexicographic min node of the component.  Isolated nodes only appear
    if present as a self-loop edge.

    Below `small_graph_edges` (default SMALL_GRAPH_EDGES) the computation
    runs driver-side (see _driver_side_cc); above it, the distributed
    min-label-propagation loop engages — the alias graph over *distinct
    surface forms* is many orders of magnitude smaller than the transcript
    table, so the driver path covers everything up to dictionary scales
    where the iterative loop's per-round cost is actually amortized."""
    # checkpoint the INPUT first: union/bidirect below scans it multiple
    # times within one action, which would re-run the whole upstream plan
    # (extraction UDFs, fuzzy linking) once per branch.
    edges = edges.localCheckpoint(eager=True)
    limit = SMALL_GRAPH_EDGES if small_graph_edges is None else small_graph_edges
    if edges.limit(limit + 1).count() <= limit:
        return _driver_side_cc(edges)
    e = _bidirect(edges).where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)

    labels = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(edges.where(F.col("src") == F.col("dst")).select(F.col("src").alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # candidate label per node from each neighbor's current label
        nbr = (
            e.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # path halving: component <- label(component)
        parent = new_labels.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        )
        halved = (
            new_labels.join(parent, "component", "left")
            .select("node", F.coalesce("grand", "component").alias("component"))
        ).localCheckpoint(eager=True)

        changed = (
            halved.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = halved
        if changed == 0:
            break
    return labels


def same_as_triples(components: DataFrame) -> DataFrame:
    """node != component representative -> (node, sameAs, component)."""
    return components.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("subj"),
        F.lit("sameAs").alias("pred"),
        F.col("component").alias("obj"),
    )
