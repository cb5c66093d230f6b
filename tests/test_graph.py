"""operators/graph.py: path-doubling transitive closure and fixed-point
PageRank, each checked against an independent pure-Python replay of the
same semantics (the DuckDB oracle gate covers them again at sf0.01 via
q_closure / q_pagerank)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from logset_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixedpoint,
    ppr_fixedpoint,
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


def _py_lpa(edges: list[tuple[str, str]], n_iter: int) -> dict[str, str]:
    """Synchronous LPA, min-label tie-break — independent replay."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        nxt = {}
        for v, nbrs in adj.items():
            cnt: dict[str, int] = {}
            for u in nbrs:
                cnt[labels[u]] = cnt.get(labels[u], 0) + 1
            nxt[v] = min(cnt, key=lambda L: (-cnt[L], L))
        labels = nxt
    return labels


def test_label_prop_matches_python_replay(spark):
    from logset_spark.operators.graph import label_propagation

    rng = random.Random(23)
    # two dense clusters + one bridge: LPA should separate them
    edges = set()
    for base in ("x", "y"):
        nodes = [f"{base}{i}" for i in range(10)]
        for _ in range(40):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
    edges.add(("x0", "y0"))
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "a string, b string")
    for n_iter in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, n_iter=n_iter).collect()
        }
        assert got == _py_lpa(edges, n_iter), f"n_iter={n_iter}"


def test_label_prop_separates_communities(spark):
    from logset_spark.operators.graph import label_propagation

    # two 5-cliques joined by a single bridge edge
    edges = []
    for base in ("a", "b"):
        nodes = [f"{base}{i}" for i in range(5)]
        edges += [(u, v) for u in nodes for v in nodes if u < v]
    edges.append(("a0", "b0"))
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r["node"]: r["label"] for r in label_propagation(df, n_iter=3).collect()}
    a_labels = {got[f"a{i}"] for i in range(5)}
    b_labels = {got[f"b{i}"] for i in range(1, 5)}  # b0 touches the bridge
    assert len(a_labels) == 1
    assert len(b_labels) == 1
    assert a_labels != b_labels


def _py_bfs(
    edges: list[tuple[str, str]], sources: list[str]
) -> dict[str, int]:
    out_adj: dict[str, list[str]] = {}
    for s, d in edges:
        out_adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for w in out_adj.get(v, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


def test_bfs_distances_matches_python_bfs(spark):
    from logset_spark.operators.graph import bfs_distances

    rng = random.Random(31)
    nodes = [f"v{i}" for i in range(40)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    sources = spark.createDataFrame([("v0",), ("v7",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(df, sources).collect()}
    assert got == _py_bfs(edges, ["v0", "v7"])


def test_bfs_distances_stops_at_eccentricity_and_caps(spark):
    from logset_spark.operators.graph import bfs_distances

    # directed chain: only nodes within max_iter hops get settled
    edges = [(f"c{i}", f"c{i + 1}") for i in range(30)]
    df = spark.createDataFrame(edges, "src string, dst string")
    src = spark.createDataFrame([("c0",)], "node string")
    full = {r["node"]: r["dist"] for r in bfs_distances(df, src).collect()}
    assert full == {f"c{i}": i for i in range(31)}
    capped = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, src, max_iter=5).collect()
    }
    assert capped == {f"c{i}": i for i in range(6)}


def _py_dijkstra(edges, sources):
    """Reference: heap Dijkstra (an independent formulation of the
    same minimum — the operator is frontier Bellman-Ford)."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = {}
    heap = [(0, s) for s in sources]
    while heap:
        d, n = heapq.heappop(heap)
        if n in dist:
            continue
        dist[n] = d
        for m, w in adj[n]:
            if m not in dist:
                heapq.heappush(heap, (d + w, m))
    return dist


def test_shortest_paths_reopens_settled_nodes(spark):
    from logset_spark.operators.graph import shortest_paths

    # a->c direct is found hop-first but a->b->c is cheaper; d hangs
    # off c so its distance must also be re-lowered
    edges = [("a", "b", 1), ("b", "c", 5), ("a", "c", 10), ("c", "d", 1),
             ("a", "d", 100), ("x", "y", 2)]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in shortest_paths(e, s).collect()}
    assert got == {"a": 0, "b": 1, "c": 6, "d": 7}


def test_shortest_paths_rejects_negative_weights(spark):
    import pytest

    from logset_spark.operators.graph import shortest_paths

    e = spark.createDataFrame([("a", "b", -1)],
                              "src string, dst string, w long")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        shortest_paths(e, s)


def test_shortest_paths_random_graphs_match_dijkstra(spark):
    import random

    from logset_spark.operators.graph import shortest_paths

    rng = random.Random(7)
    for trial in range(3):
        nodes = [f"n{i}" for i in range(14)]
        edges = {(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(40)}
        weighted = [(s, d, rng.randrange(0, 9)) for s, d in edges
                    if s != d]
        sources = rng.sample(nodes, 2)
        e = spark.createDataFrame(weighted,
                                  "src string, dst string, w long")
        s = spark.createDataFrame([(x,) for x in sources], "node string")
        got = {r["node"]: r["dist"]
               for r in shortest_paths(e, s).collect()}
        assert got == _py_dijkstra(weighted, sources), f"trial {trial}"


# ---------------------------------------------------------------------------
# neighbor_jaccard
# ---------------------------------------------------------------------------


def _py_jaccard(
    pairs: list[tuple[str, str]], min_common: int, min_sim: float
) -> dict[tuple[str, str], tuple[int, int]]:
    feats: dict[str, set[str]] = {}
    for n, f in pairs:
        feats.setdefault(n, set()).add(f)
    out = {}
    nodes = sorted(feats)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            c = len(feats[u] & feats[v])
            un = len(feats[u] | feats[v])
            if c >= min_common and c / un >= min_sim:
                out[(u, v)] = (c, un)
    return out


def test_neighbor_jaccard_matches_python_sets(spark):
    from logset_spark.operators.graph import neighbor_jaccard

    rng = random.Random(7)
    inc = [
        (f"n{rng.randrange(12)}", f"f{rng.randrange(20)}") for _ in range(120)
    ]
    df = spark.createDataFrame(inc, "node string, feat string")
    for min_common, min_sim in ((1, 0.0), (2, 0.0), (1, 0.25)):
        got = {
            (r["u"], r["v"]): (r["common"], r["union_n"])
            for r in neighbor_jaccard(df, min_common, min_sim).collect()
        }
        assert got == _py_jaccard(inc, min_common, min_sim), (
            min_common,
            min_sim,
        )


def test_neighbor_jaccard_min_sim_cut_is_integer_exact(spark):
    """1/3 against min_sim=1/3: float representation of the threshold
    (0.3333...) must not drop the exactly-at-threshold pair, and the
    integer-domain filter (common*1e6 >= round(min_sim*1e6)*union)
    keeps it because round(1/3 * 1e6) * 3 = 999999 <= 1e6."""
    from logset_spark.operators.graph import neighbor_jaccard

    df = spark.createDataFrame(
        [("a", "f1"), ("a", "f2"), ("b", "f1"), ("b", "f3")],
        "node string, feat string",
    )
    got = neighbor_jaccard(df, min_sim=1 / 3).collect()
    assert [(r["u"], r["v"], r["common"], r["union_n"]) for r in got] == [
        ("a", "b", 1, 3)
    ]


def test_neighbor_jaccard_hub_cap_drops_hub_features_only(spark):
    from logset_spark.operators.graph import neighbor_jaccard

    inc = (
        [("a", "stop"), ("b", "stop"), ("c", "stop"), ("d", "stop")]
        + [("a", "rare"), ("b", "rare")]
    )
    df = spark.createDataFrame(inc, "node string, feat string")
    # uncapped: every pair shares 'stop'
    assert neighbor_jaccard(df).count() == 6
    # cap 3 drops the 4-node hub feature; only the rare co-occurrence
    # survives, and its degrees are recomputed on the CAPPED incidence
    got = neighbor_jaccard(df, max_feat_degree=3).collect()
    assert [(r["u"], r["v"], r["common"], r["union_n"]) for r in got] == [
        ("a", "b", 1, 1)
    ]


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def _py_hits(
    edges: list[tuple[str, str]], n_iter: int, scale: int = 1_000_000
) -> dict[str, tuple[int, int]]:
    """Independent integer replay of the documented recurrence."""
    es = sorted(set(edges))
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw: dict[str, int]) -> dict[str, int]:
        mx = max(max(raw.values(), default=0), 1)
        sh = mx // (1000 * scale) + 1
        return {
            n: (raw.get(n, 0) // sh) * scale // max(mx // sh, 1)
            for n in nodes
        }

    for _ in range(n_iter):
        araw: dict[str, int] = {}
        for u, v in es:
            araw[v] = araw.get(v, 0) + hub[u]
        auth = norm(araw)
        hraw: dict[str, int] = {}
        for u, v in es:
            hraw[u] = hraw.get(u, 0) + auth[v]
        hub = norm(hraw)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_python_integer_replay(spark):
    from logset_spark.operators.graph import hits

    rng = random.Random(11)
    edges = [
        (f"s{rng.randrange(6)}", f"p{rng.randrange(9)}") for _ in range(40)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["hub"], r["auth"]) for r in hits(df, n_iter=3).collect()
    }
    assert got == _py_hits(edges, 3)


def test_hits_shift_path_matches_replay_on_hub_graph(spark):
    """A 2000-in-degree authority pushes raw sums past 1e9, forcing the
    normalization's overflow-guard right-shift; the distributed result
    must still equal the integer replay bit-for-bit."""
    from logset_spark.operators.graph import hits

    edges = [(f"s{i}", "hub") for i in range(2000)] + [("s0", "p1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["hub"], r["auth"]) for r in hits(df, n_iter=2).collect()
    }
    assert got == _py_hits(edges, 2)
    assert max(a for _, a in got.values()) == 1_000_000  # max-normalized


def test_hits_semantics_and_guards(spark):
    from logset_spark.operators.graph import hits

    import pytest

    e = spark.createDataFrame(
        [("h1", "a1"), ("h1", "a2"), ("h2", "a1")], "src string, dst string"
    )
    out = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, 1).collect()}
    # a1 (2 in-links) outranks a2; pure authorities have hub 0
    assert out["a1"][1] > out["a2"][1]
    assert out["a1"][0] == 0 and out["h1"][1] == 0
    with pytest.raises(ValueError, match="n_iter"):
        hits(e, 0)


# ---------------------------------------------------------------------------
# deterministic_walks
# ---------------------------------------------------------------------------


def test_walks_end_at_sinks_and_replay_identically(spark):
    from logset_spark.operators.graph import deterministic_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],  # d is a sink
        "src string, dst string")
    starts = spark.createDataFrame(
        [("w1", "a"), ("w2", "d")], "walk_id string, node string")
    out = deterministic_walks(edges, starts, n_steps=5)
    rows = {(r["walk_id"], r["step"]): r["node"] for r in out.collect()}
    # w2 starts AT a sink: only step 0
    assert [k for k in rows if k[0] == "w2"] == [("w2", 0)]
    # w1: a -> {b|c} -> d, ends at the sink after step 2
    assert rows[("w1", 0)] == "a"
    assert rows[("w1", 1)] in ("b", "c")
    assert rows[("w1", 2)] == "d"
    assert ("w1", 3) not in rows
    # byte-identical replay (the resume guarantee)
    again = {(r["walk_id"], r["step"]): r["node"]
             for r in deterministic_walks(edges, starts, n_steps=5).collect()}
    assert again == rows


def test_walks_salt_reseeds_and_walks_diverge(spark):
    from logset_spark.operators.graph import deterministic_walks
    import pyspark.sql.functions as F

    # complete digraph over 6 nodes: every step has 5 choices
    nodes = [chr(ord("a") + i) for i in range(6)]
    edges = spark.createDataFrame(
        [(u, v) for u in nodes for v in nodes if u != v],
        "src string, dst string")
    starts = spark.createDataFrame(
        [(f"w{i}", "a") for i in range(8)], "walk_id string, node string")
    w1 = deterministic_walks(edges, starts, n_steps=6, salt="s1")
    w2 = deterministic_walks(edges, starts, n_steps=6, salt="s2")
    seq1 = {r["walk_id"]: r["node"] for r in w1.collect() if r["step"] == 3}
    seq2 = {r["walk_id"]: r["node"] for r in w2.collect() if r["step"] == 3}
    # different salts produce a different corpus
    assert seq1 != seq2
    # walks draw independently: 8 walks from one start don't all agree
    assert len(set(seq1.values())) > 1
    # every walk has the full step count on a sink-free graph
    assert w1.count() == 8 * 7
    # step sequence per walk is contiguous 0..6
    per = (w1.groupBy("walk_id").agg(
        F.count("*").alias("n"), F.min("step").alias("lo"),
        F.max("step").alias("hi")).collect())
    assert all(r["n"] == 7 and r["lo"] == 0 and r["hi"] == 6 for r in per)


def test_tagged_bfs_keeps_per_source_distances(spark):
    from logset_spark.operators.graph import (
        bfs_distances, bfs_distances_tagged, harmonic_centrality)
    import pyspark.sql.functions as F

    # a -> b -> c and a separate source directly at c
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    srcs = spark.createDataFrame([("a",), ("c",)], "node string")
    tagged = {(r["src"], r["node"]): r["dist"]
              for r in bfs_distances_tagged(edges, srcs).collect()}
    assert tagged[("a", "c")] == 2 and tagged[("c", "c")] == 0
    assert ("c", "a") not in tagged  # c reaches nothing upstream
    # min over sources == untagged multi-source BFS
    untag = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs).collect()}
    for node in untag:
        mins = min(d for (s, n), d in tagged.items() if n == node)
        assert mins == untag[node]
    # harmonic: b gets 1/1 from a; c gets 1/2 from a (self excluded)
    h = {r["node"]: r["harmonic"]
         for r in harmonic_centrality(edges, srcs).collect()}
    assert h["b"] == 1.0 and h["c"] == 0.5 and "a" not in h


def test_unigram_slot_table_covers_and_sampler_tracks_power_law(spark):
    from logset_spark.operators.graph import (
        negative_samples, unigram_slot_table)
    import pyspark.sql.functions as F

    vocab = spark.createDataFrame(
        [("a", 1), ("b", 16), ("c", 81)], "node string, freq long")
    slots = unigram_slot_table(vocab, power=0.75, resolution=1000)
    rows = slots.collect()
    ids = sorted(r["slot"] for r in rows)
    # contiguous 0..n-1, no gaps or dup slots
    assert ids == list(range(len(ids)))
    share = {n: c / len(rows) for n, c in
             slots.groupBy("node").count().rdd.map(
                 lambda r: (r["node"], r["count"])).collect()}
    # freq^0.75 = 1 : 8 : 27 -> shares ~ 1/36, 8/36, 27/36
    assert abs(share["c"] - 27 / 36) < 0.01
    assert abs(share["b"] - 8 / 36) < 0.01

    # empirical draw distribution over many pairs tracks the slot shares
    pairs = spark.range(2000).select(
        F.concat(F.lit("p"), "id").alias("center"), F.lit("x").alias("context"))
    neg = negative_samples(pairs, vocab, k=1, resolution=1000)
    counts = {r["negative"]: r["count"]
              for r in neg.groupBy("negative").count().collect()}
    tot = sum(counts.values())
    assert abs(counts["c"] / tot - share["c"]) < 0.05
    # determinism: same pairs, same salt -> identical draws
    again = {r["negative"]: r["count"]
             for r in negative_samples(
                 pairs, vocab, k=1, resolution=1000
             ).groupBy("negative").count().collect()}
    assert again == counts


def _py_ppr(edges, sources, n_iter=3, scale=10**12):
    """Driver-side replica of ppr_fixedpoint's integer recurrence."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    ns = len(sources)
    r = {n: (scale // ns if n in sources else 0) for n in nodes}
    for _ in range(n_iter):
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + r[s] // len(out[s])
        r = {
            n: ((3 * scale) // (20 * ns) if n in sources else 0)
            + 17 * (contrib.get(n, 0) // 20)
            + (17 * (contrib.get(n, 0) % 20)) // 20
            for n in nodes
        }
    return r


def test_ppr_matches_python_fixed_point(spark):
    rng = random.Random(13)
    nodes = [f"v{i}" for i in range(25)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    srcs = spark.createDataFrame([("v0",), ("v1",)], "node string")
    got = {
        r["node"]: r["rank"]
        for r in ppr_fixedpoint(df, srcs, n_iter=3).collect()
    }
    assert got == _py_ppr(edges, {"v0", "v1"}, n_iter=3)


def test_ppr_mass_stays_near_sources(spark):
    # two disconnected components: the one without a source keeps rank 0
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    srcs = spark.createDataFrame([("a",)], "node string")
    ranks = {
        r["node"]: r["rank"]
        for r in ppr_fixedpoint(df, srcs, n_iter=4).collect()
    }
    assert ranks["x"] == 0 and ranks["y"] == 0
    assert ranks["a"] > 0 and ranks["b"] > 0
    assert sum(ranks.values()) <= PR_SCALE


def test_anf_reach_estimates_and_monotonicity(spark):
    """ANF on a random DAG: bits_sum is monotone in k per node, sinks
    never grow, and with 32 salts the k-hop reach estimate lands within
    FM's expected error of the exact closure-computed reach."""
    import itertools
    import math

    from logset_spark.operators.graph import anf_reach

    rnd_edges = [
        (f"n{i}", f"n{j}")
        for i, j in itertools.product(range(12), range(12))
        if i < j and (i * 31 + j * 17) % 5 == 0  # fixed pseudo-random DAG
    ]
    edges = spark.createDataFrame(rnd_edges, "src string, dst string")
    out = anf_reach(edges, rounds=3, n_hashes=32).collect()
    rows = {(r.node, r.k): r for r in out}

    # exact k-hop reach by python BFS
    adj = {}
    for s, d in rnd_edges:
        adj.setdefault(s, set()).add(d)
    nodes = {n for e in rnd_edges for n in e}

    def reach(v, k):
        seen, frontier = {v}, {v}
        for _ in range(k):
            frontier = {u for f in frontier for u in adj.get(f, ())} - seen
            seen |= frontier
        return len(seen)

    rel_errs = []
    for v in nodes:
        prev = -1
        for k in range(4):
            r = rows[(v, k)]
            assert r.bits_sum >= prev  # monotone
            prev = r.bits_sum
            exact = reach(v, k)
            if exact >= 4:  # FM is biased below ~4 (known small-n regime)
                rel_errs.append(abs(r.est - exact) / exact)
    # FM with 32 salts: typical error ~ 0.78/sqrt(32) ~ 14%; allow slack
    assert rel_errs, "fixture produced no reaches >= 4"
    assert sum(rel_errs) / len(rel_errs) < 0.35, sum(rel_errs) / len(rel_errs)


def _py_truss(edges: list[tuple[str, str]], k: int) -> dict[tuple, int]:
    """Brute-force k-truss: peel edges with support < k-2 until stable;
    returns surviving canonical edge -> support in survivor graph."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def support(eset):
        nbrs = {}
        for u, v in eset:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        return {
            (u, v): len(nbrs[u] & nbrs[v]) for u, v in eset
        }

    while True:
        sup = support(es)
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return sup
        es -= drop


def _py_clustering(edges: list[tuple[str, str]]) -> dict[str, tuple]:
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs: dict[str, set] = {}
    for u, v in es:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    out = {}
    for n, ns in nbrs.items():
        d = len(ns)
        t = sum(
            1
            for a in ns
            for b in ns
            if a < b and tuple(sorted((a, b))) in es
        )
        coef = ((2 * t * 10000) // (d * (d - 1))) / 10000.0 if d >= 2 else 0.0
        out[n] = (d, t, coef)
    return out


def test_clustering_coefficient_matches_bruteforce(spark):
    rng = random.Random(5)
    edges = [
        (f"n{rng.randrange(14)}", f"n{rng.randrange(14)}") for _ in range(40)
    ]
    from logset_spark.operators.graph import clustering_coefficient

    df = spark.createDataFrame(edges, "a string, b string")
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["coef"])
        for r in clustering_coefficient(df).collect()
    }
    assert got == _py_clustering(edges)


def test_ktruss_matches_bruteforce_random(spark):
    from logset_spark.operators.graph import ktruss_peel

    for seed in (6, 7):
        rng = random.Random(seed)
        edges = [
            (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
            for _ in range(45)
        ]
        df = spark.createDataFrame(edges, "a string, b string")
        got = {
            (r["u"], r["v"]): r["support"]
            for r in ktruss_peel(df, k=4).collect()
        }
        assert got == _py_truss(edges, 4)


def test_ktruss_converges_on_triangle_chain_cascade(spark):
    """A chain of triangles sharing edges: removing the weakest end
    edge cascades one triangle per round — the deep-peel adversary.
    Convergence mode must fully dissolve it for k=4 (every edge is in
    at most 2 triangles... chain interior edges are in 2, so the 4-truss
    (support>=2) keeps the interior until the cascade eats inward)."""
    from logset_spark.operators.graph import ktruss_peel

    # triangles (i, i+1, i+2) for i in 0..6: shared edges form the chain
    edges = []
    for i in range(7):
        a, b, c = f"t{i:02d}", f"t{i + 1:02d}", f"t{i + 2:02d}"
        edges += [(a, b), (b, c), (a, c)]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss_peel(df, k=4).collect()
    }
    assert got == _py_truss(edges, 4)
    # and a fixed round count SHORT of convergence differs (superset),
    # proving the convergence probe is load-bearing
    short = ktruss_peel(df, k=4, rounds=1).count()
    assert short > len(got)


def test_ktruss_rejects_small_k(spark):
    from logset_spark.operators.graph import ktruss_peel

    df = spark.createDataFrame([("a", "b")], "a string, b string")
    with pytest.raises(ValueError, match="k >= 3"):
        ktruss_peel(df, k=2)


def _py_brandes(
    edges: list[tuple[str, str]], sources: list[str], directed: bool
) -> dict[str, float]:
    """Exact Brandes dependency accumulation restricted to `sources`."""
    from collections import deque

    adj: dict[str, list[str]] = {}
    es = {(a, b) for a, b in edges if a != b}
    if not directed:
        es |= {(b, a) for a, b in es}
    for a, b in es:
        adj.setdefault(a, []).append(b)
    score: dict[str, float] = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for w in adj.get(v, ()):
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s and delta[v] > 0:
                score[v] = score.get(v, 0.0) + delta[v]
    return score


@pytest.mark.parametrize("directed", [False, True])
def test_betweenness_matches_exact_brandes(spark, directed):
    from logset_spark.operators.graph import betweenness_approx

    rng = random.Random(17)
    edges = [
        (f"n{rng.randrange(16)}", f"n{rng.randrange(16)}") for _ in range(40)
    ]
    sources = ["n0", "n3", "n7"]
    got = {
        r["node"]: r["score"]
        for r in betweenness_approx(
            spark.createDataFrame(edges, "src string, dst string"),
            spark.createDataFrame([(s,) for s in sources], "node string"),
            directed=directed,
        ).collect()
    }
    want = _py_brandes(edges, sources, directed)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n


def test_betweenness_bridge_dominates(spark):
    """Two cliques joined by one bridge: the bridge endpoints carry the
    mass — the sanity property a sampled estimator must preserve."""
    from logset_spark.operators.graph import betweenness_approx

    edges = []
    for base in ("a", "b"):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((f"{base}{i}", f"{base}{j}"))
    edges.append(("a0", "b0"))
    got = {
        r["node"]: r["score"]
        for r in betweenness_approx(
            spark.createDataFrame(edges, "src string, dst string"),
            spark.createDataFrame(
                [("a1",), ("b2",)], "node string"
            ),
        ).collect()
    }
    assert got["a0"] > max(got.get(f"a{i}", 0) for i in (2, 3))
    assert got["b0"] > max(got.get(f"b{i}", 0) for i in (1, 3))


def test_neighbor_sample_deterministic_and_bounded(spark):
    from logset_spark.operators.graph import neighbor_sample

    rng = random.Random(23)
    edges = [
        (f"s{rng.randrange(6)}", f"d{rng.randrange(30)}") for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, neighbor_sample(df, 4).collect()))
    b = sorted(map(tuple, neighbor_sample(df, 4).collect()))
    assert a == b  # byte-stable across runs
    per_src: dict[str, list] = {}
    for s, d, r in a:
        per_src.setdefault(s, []).append(r)
    for s, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4
    # reseeding actually changes the sample
    c = sorted(map(tuple, neighbor_sample(df, 4, salt="other").collect()))
    assert c != a
    with pytest.raises(ValueError, match="k must be"):
        neighbor_sample(df, 0)


def test_sample_fanout_layers_and_consistency(spark):
    from logset_spark.operators.graph import neighbor_sample, sample_fanout

    rng = random.Random(29)
    edges = [
        (f"n{rng.randrange(10)}", f"n{rng.randrange(10)}") for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("n0",), ("n1",)], "node string")
    out = sample_fanout(df, seeds, [3, 2]).collect()
    l1 = [(r["src"], r["dst"]) for r in out if r["layer"] == 1]
    l2 = [(r["src"], r["dst"]) for r in out if r["layer"] == 2]
    assert {s for s, _ in l1} <= {"n0", "n1"}
    assert {s for s, _ in l2} <= {d for _, d in l1}
    # layer-2 fanout respects its own k and matches the global ranking
    ranked = {
        (r["src"], r["dst"]): r["rank"]
        for r in neighbor_sample(df, 3).collect()
    }
    for s, d in l2:
        assert ranked[(s, d)] <= 2
    with pytest.raises(ValueError, match="fanouts"):
        sample_fanout(df, seeds, [])


def test_ego_network_matches_python_ball(spark):
    from logset_spark.operators.graph import ego_network

    rng = random.Random(31)
    edges = list({
        (f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
        for _ in range(45)
    })
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = {
        (r["src"], r["dst"])
        for r in ego_network(df, seeds, hops=2).collect()
    }
    # python replay: undirected 2-hop ball, then induced original edges
    adj: dict[str, set] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    ball = {"n0"}
    frontier = {"n0"}
    for _ in range(2):
        frontier = {
            w for v in frontier for w in adj.get(v, ()) if w not in ball
        }
        ball |= frontier
    want = {
        (a, b) for a, b in edges if a != b and a in ball and b in ball
    }
    assert got == want
    with pytest.raises(ValueError, match="max_nodes"):
        ego_network(df, seeds, hops=3, max_nodes=2)


def test_modularity_matches_python_and_prefers_true_partition(spark):
    from logset_spark.operators.graph import (
        modularity_parts,
        modularity_score,
    )

    # two 4-cliques plus one bridge
    edges = []
    for base in ("a", "b"):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((f"{base}{i}", f"{base}{j}"))
    edges.append(("a0", "b0"))
    df = spark.createDataFrame(edges, "a string, b string")
    good = spark.createDataFrame(
        [(f"{b}{i}", b) for b in ("a", "b") for i in range(4)],
        "node string, label string",
    )
    allone = good.select("node", F.lit("x").alias("label"))

    # python replay of the integer decomposition for the good partition
    m = len(edges)
    deg: dict[str, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = {}
    for lbl in ("a", "b"):
        e_c = sum(1 for u, v in edges if u[0] == lbl and v[0] == lbl)
        d_c = sum(d for n, d in deg.items() if n[0] == lbl)
        want[lbl] = (4, e_c, d_c, 4 * m * e_c - d_c * d_c)
    got = {
        r["label"]: (r["n_nodes"], r["e_intra"], r["deg_sum"], r["q_num"])
        for r in modularity_parts(df, good).collect()
    }
    assert got == want
    q_good = modularity_score(df, good)
    assert abs(q_good - sum(w[3] for w in want.values()) / (4 * m * m)) < 1e-12
    # the true community split scores higher than the trivial partition
    assert q_good > modularity_score(df, allone)
    # and the trivial all-in-one partition has Q == 0 exactly
    assert modularity_score(df, allone) == 0.0
