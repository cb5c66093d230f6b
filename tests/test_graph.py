"""operators/graph.py: path-doubling transitive closure and fixed-point
PageRank, each checked against an independent pure-Python replay of the
same semantics (the DuckDB oracle gate covers them again at sf0.01 via
q_closure / q_pagerank)."""

from __future__ import annotations

import random

from logset_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixedpoint,
    transitive_closure,
)


def _py_closure(edges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """BFS-from-every-node ancestors with min hop distance."""
    parents: dict[str, set[str]] = {}
    for c, p in edges:
        if c != p:
            parents.setdefault(c, set()).add(p)
    out: dict[tuple[str, str], int] = {}
    for start in parents:
        frontier, dist, seen = set(parents[start]), 1, {start}
        while frontier:
            for a in frontier:
                if (start, a) not in out:
                    out[(start, a)] = dist
            seen |= frontier
            frontier = {
                g for a in frontier for g in parents.get(a, ()) if g not in seen
            }
            dist += 1
    return {k: v for k, v in out.items() if k[0] != k[1]}


def _py_pagerank(
    edges: list[tuple[str, str]], n_iter: int, scale: int = PR_SCALE
) -> dict[str, int]:
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg: dict[str, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        contrib: dict[str, int] = {}
        for s, d in e:
            contrib[d] = contrib.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            v: (3 * scale) // (20 * n) + (17 * contrib.get(v, 0)) // 20
            for v in nodes
        }
    return rank


def test_closure_matches_python_bfs(spark):
    rng = random.Random(7)
    # layered DAG: 40 nodes in 5 layers, edges only point to lower layers
    layers = [[f"n{l}_{i}" for i in range(8)] for l in range(5)]
    edges = []
    for l in range(1, 5):
        for c in layers[l]:
            for p in rng.sample(layers[l - 1] + (layers[l - 2] if l > 1 else []), 2):
                edges.append((c, p))
    df = spark.createDataFrame(edges, "child string, parent string")
    # BOTH paths: driver BFS (default under the small-graph threshold)
    # and the distributed path-doubling loop (small_graph_edges=0)
    for kw in ({}, {"small_graph_edges": 0}):
        got = {
            (r["node"], r["ancestor"]): r["dist"]
            for r in transitive_closure(df, **kw).collect()
        }
        assert got == _py_closure(edges), f"path {kw}"



def test_closure_deep_chain_log_rounds(spark):
    # a 64-deep chain closes within the default 20 doubling rounds
    edges = [(f"c{i}", f"c{i + 1}") for i in range(64)]
    df = spark.createDataFrame(edges, "child string, parent string")
    got = {
        (r["node"], r["ancestor"]): r["dist"]
        for r in transitive_closure(df, small_graph_edges=0).collect()
    }
    assert got[("c0", "c64")] == 64
    assert len(got) == 64 * 65 // 2


def test_pagerank_matches_python_fixed_point(spark):
    rng = random.Random(11)
    nodes = [f"v{i}" for i in range(30)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank_fixedpoint(df, n_iter=3).collect()}
    assert got == _py_pagerank(edges, n_iter=3)


def test_pagerank_mass_bounded(spark):
    # total rank can only shrink (dangling leak + floor losses), never grow
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank_fixedpoint(df, n_iter=5).collect()}
    assert sum(ranks.values()) <= PR_SCALE
    assert all(v >= 0 for v in ranks.values())


def _py_triangles(edges):
    """Per-node triangle counts by brute force over node triples of a
    small random graph."""
    import itertools

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_matches_bruteforce(spark):
    from logset_spark.operators.graph import triangle_count

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = list({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(140)
    })
    df = spark.createDataFrame(
        [(a, b) if rng.random() < 0.5 else (b, a) for a, b in edges],
        "a string, b string",
    )
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
    assert got == _py_triangles(edges)


def test_kcore_matches_networkx(spark):
    from logset_spark.operators.graph import kcore_peel

    import networkx as nx

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(130)})
    g = nx.Graph(edges)
    for k in (2, 3):
        # enough rounds to converge on a 40-node graph -> true k-core
        got = {r["node"]: r["deg"] for r in
               kcore_peel(spark.createDataFrame(edges, "a string, b string"),
                          k=k, rounds=12).collect()}
        core = nx.k_core(g, k)
        assert set(got) == set(core.nodes)
        assert got == {n: d for n, d in core.degree()}


def test_kcore_converges_on_deep_peel_adversary(spark):
    """Star-chain: a path of 30 nodes where each peel round removes only
    the two endpoints — peel depth ~15, far past any small fixed round
    count.  Convergence mode (rounds=None) must return the TRUE k-core
    (empty for k=2 on a path); a too-small fixed count silently returns
    a superset (the VERDICT-r02 hazard, pinned here)."""
    from logset_spark.operators.graph import kcore_peel

    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(30)]
    df = spark.createDataFrame(edges, "a string, b string")
    assert kcore_peel(df, k=2).count() == 0  # converged: true core
    assert kcore_peel(df, k=2, rounds=3).count() > 0  # superset hazard


def test_kcore_convergence_matches_fixed_past_depth(spark):
    """On a graph whose peel stabilizes, convergence mode equals the
    fixed-round mode run past the peel depth (clique core survives)."""
    from logset_spark.operators.graph import kcore_peel

    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("c0", "x1"), ("x1", "x2"), ("x2", "x3")]
    df = spark.createDataFrame(clique + chain, "a string, b string")
    conv = {r["node"]: r["deg"] for r in kcore_peel(df, k=3).collect()}
    fixed = {r["node"]: r["deg"] for r in
             kcore_peel(df, k=3, rounds=10).collect()}
    assert conv == fixed == {f"c{i}": 4 for i in range(5)}


def test_closure_small_bails_to_distributed_on_pair_blowup(spark):
    """A 200-edge chain has 20,100 closure pairs — a small EDGE count
    with a closure far bigger.  With max_small_pairs below that, the
    driver BFS must abandon early and the distributed loop must still
    produce the full correct closure."""
    from logset_spark.operators import graph as G

    n = 200
    edges = [(f"c{i}", f"c{i + 1}") for i in range(n)]
    df = spark.createDataFrame(edges, "child string, parent string")
    got = G.transitive_closure(df, max_small_pairs=1_000)
    assert got.count() == n * (n + 1) // 2
    top = {(r["node"], r["ancestor"]): r["dist"]
           for r in got.where("node = 'c0'").collect()}
    assert top[("c0", f"c{n}")] == n
    # and _closure_small itself reports the bail as None
    assert G._closure_small(spark, edges, max_pairs=1_000) is None
