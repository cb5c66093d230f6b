"""Directed-graph structure operators: strongly connected components
and topological levels (Kahn peel with cycle detection).

Why the engine needs them: the KG the pipeline builds is DIRECTED
(followedBy, partOf, usedTool, sameAs-canonicalized mention edges), and
two recurring questions over a directed warehouse are "which nodes form
mutually-reachable clusters" (SCC — cyclic tool-call loops, circular
partOf contamination, alias cycles that undirected CC would over-merge)
and "what is a valid dependency order / where are the cycles" (topo
levels over partOf/followedBy DAGs).  The reference's rdflib graphs
answer both by in-memory traversal; at 10^12 edges they are iterative
DataFrame problems with the same two scale traps the closure/CC loops
already solve: Catalyst lineage blowup (localCheckpoint per round) and
driver-side convergence decisions (one scalar probe per round, never a
data collect).

SCC algorithm — block refinement with min-label propagation:
  maintain a partition of the unassigned nodes into BLOCKS (initially
  one block).  Each outer round, within every block in parallel:
    fwd(v) = min node id that reaches v on a path inside the block
    bwd(v) = min node id v reaches on a path inside the block
  both computed by min-label propagation along (reversed) edges with
  POINTER HALVING (lab <- min(lab, lab[lab]) — the same O(log depth)
  accelerator cc.py uses), convergence decided by a one-row probe.
  Every node with fwd(v) == bwd(v) == m is assigned scc = m (m reaches
  v and v reaches m, so v is in SCC(m) — sound unconditionally).  The
  survivors re-block on the key (block, fwd, bwd): nodes of one SCC
  always share that key (members have identical inside-block reach
  sets — any u~v path inside an SCC stays inside the SCC), so an SCC
  is never split; a block whose nodes all share the key yet is NOT a
  single SCC cannot exist at fixpoint (the block's min node m always
  carries (m, m) — if every node shares that key, every node both
  reaches and is reached by m, i.e. the block IS SCC(m)).  Cross-block
  edges can never join two nodes of one SCC again and are dropped, so
  the edge set shrinks every round.  Outer rounds needed = refinement
  depth of the condensation — 1 for any DAG whose (min-ancestor,
  min-descendant) pairs are distinct (e.g. every monotone chain), and
  small in practice for condensations that arise from entity graphs;
  max_rounds is a loud backstop, never a silent truncation.

Oracle discipline: q_scc / q_topo replay the exact semantics in DuckDB
via WITH RECURSIVE reachability on fixture-scale graphs, value-hashing
the whole assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..ckpt import checkpoint_cut as _checkpoint_cut  # noqa: F401 — registers df.localCheckpointCut

# Mirrors cc.SMALL_GRAPH_EDGES: below this the edge list collects to the
# driver and an exact Tarjan/Kahn runs in microseconds; the iterative
# DataFrame loops cost ~0.5s of scheduling per round regardless of size.
SMALL_GRAPH_EDGES = 250_000


# --------------------------------------------------------------------------
# driver-side exact algorithms for small graphs
# --------------------------------------------------------------------------


def _driver_side_scc(edges: DataFrame) -> DataFrame:
    """Iterative Tarjan (explicit stack — no recursion limit) over a
    collected edge list; scc label = lexicographic min node of the SCC,
    matching the distributed loop's semantics exactly."""
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for row in edges.collect():
        s, d = row[0], row[1]
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)

    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    comp: dict[str, str] = {}
    counter = 0

    for root in sorted(nodes):
        if root in index:
            continue
        # (node, iterator position) work stack
        work: list[tuple[str, int]] = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succ = adj.get(v, ())
            for i in range(pi, len(succ)):
                w = succ[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                label = min(members)
                for w in members:
                    comp[w] = label
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return edges.sparkSession.createDataFrame(
        sorted(comp.items()), "node string, scc string"
    )


def _driver_side_topo(
    edges: list[tuple[str, str]], on_cycle: str
) -> list[tuple[str, int | None]]:
    """Kahn peel on the driver: level = longest path from any root."""
    indeg: dict[str, int] = {}
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        indeg.setdefault(s, 0)
        indeg[d] = indeg.get(d, 0) + 1
        adj.setdefault(s, []).append(d)
    level: dict[str, int] = {}
    frontier = sorted(n for n, k in indeg.items() if k == 0)
    lvl = 0
    while frontier:
        nxt = []
        for n in frontier:
            level[n] = lvl
            for w in adj.get(n, ()):
                indeg[w] -= 1
                if indeg[w] == 0:
                    nxt.append(w)
        frontier = sorted(nxt)
        lvl += 1
    leftover = [n for n in indeg if n not in level]
    if leftover and on_cycle == "raise":
        raise ValueError(
            f"cycle detected: {len(leftover)} nodes on or downstream of a "
            f"cycle (e.g. {sorted(leftover)[:3]})"
        )
    return sorted(
        [(n, lvl) for n, lvl in level.items()]
        + [(n, None) for n in leftover]
    )


# --------------------------------------------------------------------------
# distributed SCC
# --------------------------------------------------------------------------


def _min_reach_labels(
    e: DataFrame, nodes: DataFrame, max_inner: int
) -> DataFrame:
    """min-label propagation to fixpoint along e (src -> dst), with
    pointer halving.  nodes: DataFrame[node]; e: DataFrame[src, dst],
    every endpoint present in nodes, all edges inside one refinement
    block per edge by construction.  Returns DataFrame[node, lab] where
    lab = min node id with a directed path to `node` (reflexive).

    Invariant that makes halving sound: lab(v) is always an ancestor of
    v inside the block (init self; adoption moves labels one edge
    forward; lab(lab(v)) is an ancestor of an ancestor).

    Job-count discipline (VERDICT r04 §What's wrong 3): one Spark job
    per inner round, not two.  The old label rides the existing
    union+groupBy as `olab` (each node occurs exactly once in `labels`,
    so max(olab) recovers it; neighbor rows contribute NULL), and the
    convergence probe is an `observe()` metric collected by the SAME
    action that materializes the eager checkpoint — the separate
    probe-join job (a second scheduler round trip per round, dominating
    q_scc wall on fixed-cost-bound fixtures) is gone.  Shuffle count
    per round is unchanged."""
    labels = nodes.withColumn("lab", F.col("node")).localCheckpointCut()
    for _ in range(max_inner):
        nbr = e.join(
            labels.select(F.col("node").alias("src"), "lab"), "src"
        ).select(
            F.col("dst").alias("node"),
            "lab",
            F.lit(None).cast("string").alias("olab"),
        )
        stepped = (
            labels.select(
                "node", "lab", F.col("lab").alias("olab")
            )
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"), F.max("olab").alias("olab"))
        )
        parent = labels.select(
            F.col("node").alias("lab"), F.col("lab").alias("grand")
        )
        obs = Observation()
        halved = (
            stepped.join(parent, "lab", "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce("grand", "lab")
                ).alias("lab"),
                "olab",
            )
            .observe(
                obs,
                F.sum(
                    (F.col("lab") != F.col("olab")).cast("long")
                ).alias("changed"),
            )
            .localCheckpointCut()
        )
        labels = halved.select("node", "lab")
        if obs.get["changed"] == 0:
            return labels
    raise RuntimeError(
        f"SCC inner propagation did not converge in {max_inner} rounds "
        "(bounded by log2(block depth) with halving — raise max_inner)"
    )


def scc(
    edges: DataFrame,
    max_rounds: int = 30,
    max_inner: int = 40,
    small_graph_edges: int | None = None,
) -> DataFrame:
    """edges: DataFrame[src:string, dst:string] directed ->
    DataFrame[node:string, scc:string]; scc = lexicographic min node of
    the strongly connected component.  Nodes appear iff present as an
    edge endpoint (singleton SCCs included).  See module docstring for
    the block-refinement algorithm and its soundness argument."""
    edges = edges.localCheckpointCut()
    limit = (
        SMALL_GRAPH_EDGES if small_graph_edges is None else small_graph_edges
    )
    if edges.limit(limit + 1).count() <= limit:
        return _driver_side_scc(edges)

    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointCut()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpointCut()
    )
    assigned_parts: list[DataFrame] = []

    # Scheduler-latency discipline (VERDICT r04 §What's wrong 3): on
    # fixed-cost-bound inputs q_scc's wall is job-launch latency, not
    # data work.  Three fusions, all semantics-preserving:
    #   - fwd and bwd min-reach are INDEPENDENT label propagations over
    #     the same (reversed) edge set — run them on two driver threads
    #     so their per-round job latencies overlap instead of adding;
    #   - the survivor probe is an observe() metric on the SAME action
    #     that checkpoints `both` (was a separate limit(1).count() job);
    #   - `done` and `nodes` are filters over the checkpointed `both` —
    #     their own eager checkpoints were pure extra jobs (cache reads
    #     re-derive them for free; lineage is already truncated at both).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        for _ in range(max_rounds):
            rev = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            f_fwd = pool.submit(_min_reach_labels, e, nodes, max_inner)
            f_bwd = pool.submit(_min_reach_labels, rev, nodes, max_inner)
            fwd = f_fwd.result()
            bwd = f_bwd.result().withColumnRenamed("lab", "blab")
            obs = Observation()
            both = (
                fwd.join(bwd, "node")
                .observe(
                    obs,
                    F.sum(
                        (F.col("lab") != F.col("blab")).cast("long")
                    ).alias("survivors"),
                )
                .localCheckpointCut()
            )

            done = both.where(F.col("lab") == F.col("blab")).select(
                "node", F.col("lab").alias("scc")
            )
            assigned_parts.append(done)

            survivors = both.where(F.col("lab") != F.col("blab"))
            if obs.get["survivors"] == 0:
                break
            # re-block on (fwd, bwd); the old block is implied — edges
            # never cross blocks, so refining by the per-block labels
            # refines the old partition.  Edges whose endpoints land in
            # different blocks (or touch an assigned node) can never
            # witness an SCC again.
            nodes = survivors.select("node")
            blocks = survivors.select(
                "node", F.concat_ws("\x1f", "lab", "blab").alias("blk")
            )
            e = (
                e.join(
                    blocks.select(F.col("node").alias("src"),
                                  F.col("blk").alias("sblk")),
                    "src",
                )
                .join(
                    blocks.select(F.col("node").alias("dst"),
                                  F.col("blk").alias("dblk")),
                    "dst",
                )
                .where(F.col("sblk") == F.col("dblk"))
                .select("src", "dst")
                .localCheckpointCut()
            )
        else:
            raise RuntimeError(
                f"SCC block refinement did not converge in {max_rounds} "
                "rounds — pathological condensation; raise max_rounds"
            )

    if not assigned_parts:  # zero-round loop (max_rounds=0 edge case)
        return spark.createDataFrame([], "node string, scc string")
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out


# --------------------------------------------------------------------------
# distributed topological levels
# --------------------------------------------------------------------------


def topo_levels(
    edges: DataFrame,
    max_rounds: int = 10_000,
    on_cycle: str = "raise",
    small_graph_edges: int | None = None,
) -> DataFrame:
    """edges: DataFrame[src:string, dst:string] directed ->
    DataFrame[node:string, level:int]; level = length of the LONGEST
    path from any root (in-degree-0 node) — the Kahn peel round at
    which the node's last prerequisite clears, i.e. the earliest
    schedulable wave in a dependency execution.  Deterministic (no
    tie-breaking needed: the level is a graph property).

    on_cycle='raise': any node on or downstream of a directed cycle
    (never peelable) raises loudly.  on_cycle='mark': those nodes are
    returned with level NULL — "no finite longest-path-from-root", and
    exactly the rows a cycle report wants.

    Scale shape: one shuffle per peel ROUND on an ever-shrinking edge
    set, frontier-proportional work, one scalar probe per round.
    Rounds = DAG depth — right for the shallow dependency DAGs
    (partOf/followedBy hierarchies) this engine stores; for
    path-shaped graphs of depth ~|V| use transitive_closure/bfs
    machinery instead (documented, not silently slow)."""
    if on_cycle not in ("raise", "mark"):
        raise ValueError("on_cycle must be 'raise' or 'mark'")
    edges = edges.localCheckpointCut()
    limit = (
        SMALL_GRAPH_EDGES if small_graph_edges is None else small_graph_edges
    )
    if edges.limit(limit + 1).count() <= limit:
        rows = [(r[0], r[1]) for r in edges.collect()]
        out = _driver_side_topo(rows, on_cycle)
        return edges.sparkSession.createDataFrame(
            out, "node string, level int"
        )

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpointCut()
    )
    remaining = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpointCut()
    )
    # self-loop nodes are on a cycle by definition — never peelable
    selfloop = (
        edges.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    remaining = remaining.join(selfloop, "node", "left_anti").localCheckpointCut()
    cyclic = selfloop.localCheckpointCut()

    parts: list[DataFrame] = []
    for lvl in range(max_rounds):
        if remaining.limit(1).count() == 0:
            break
        has_in = e.select(F.col("dst").alias("node")).distinct()
        frontier = remaining.join(has_in, "node", "left_anti")
        n_frontier = frontier.limit(1).count()
        if n_frontier == 0:
            # every remaining node has an unpeeled predecessor -> all
            # remaining nodes sit on or downstream of a cycle
            cyclic = cyclic.unionByName(remaining).localCheckpointCut()
            remaining = remaining.limit(0)
            break
        parts.append(
            frontier.withColumn("level", F.lit(lvl)).localCheckpointCut()
        )
        remaining = remaining.join(frontier, "node", "left_anti")
        e = e.join(
            frontier.select(F.col("node").alias("src")), "src", "left_anti"
        ).localCheckpointCut()
        remaining = remaining.localCheckpointCut()
    else:
        # the loop observes completion at the TOP of an iteration, so a
        # DAG of depth exactly max_rounds exhausts the range with
        # remaining already empty — only a truly unfinished peel raises
        if remaining.limit(1).count() > 0:
            raise RuntimeError(
                f"topo peel did not finish in {max_rounds} rounds — DAG "
                "deeper than the backstop; raise max_rounds"
            )

    spark = edges.sparkSession
    out = parts[0] if parts else spark.createDataFrame(
        [], "node string, level int"
    )
    for part in parts[1:]:
        out = out.unionByName(part)
    if cyclic.limit(1).count() > 0:
        if on_cycle == "raise":
            sample = [r[0] for r in cyclic.limit(3).collect()]
            raise ValueError(
                f"cycle detected: nodes on or downstream of a directed "
                f"cycle (e.g. {sample})"
            )
        out = out.unionByName(
            cyclic.withColumn("level", F.lit(None).cast("int"))
        )
    return out
