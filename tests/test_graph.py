"""Fixed-point PageRank (operators/graph.py): bit-exact equality with
a pure-Python integer reference, determinism across layouts, guards."""

from __future__ import annotations

import pytest

from ensembl_database_loader_spark.operators.graph import (
    out_degrees,
    pagerank_fixed,
)

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4),
]


def _reference(edges, iterations, scale=10**12, damping_pct=85):
    nodes = sorted({n for e in edges for n in e})
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    base = scale // n
    keep = 100 - damping_pct
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += rank[s] // deg[s]
        rank = {
            v: (keep * base + damping_pct * sums[v]) // 100 for v in nodes
        }
    return rank


def _df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def test_pagerank_matches_integer_reference(spark):
    for iters in (1, 3, 5):
        got = {
            r.node: r.rank
            for r in pagerank_fixed(_df(spark, EDGES), iterations=iters).collect()
        }
        assert got == _reference(EDGES, iters), iters


def test_pagerank_layout_independent_and_dangling(spark):
    # node 6 is dangling (in-edges only): its mass leaves circulation,
    # but it still receives teleport + in-neighbor mass
    edges = EDGES + [(1, 6), (2, 6)]
    a = {
        r.node: r.rank
        for r in pagerank_fixed(_df(spark, edges), iterations=4).collect()
    }
    b = {
        r.node: r.rank
        for r in pagerank_fixed(
            _df(spark, edges).repartition(7), iterations=4
        ).collect()
    }
    assert a == b == _reference(edges + [], 4)
    assert 6 in a and a[6] > 0
    # total mass never exceeds scale (it shrinks by the dangling leak)
    assert sum(a.values()) <= 10**12


def test_pagerank_guards_and_degrees(spark):
    df = _df(spark, EDGES)
    assert {(r.node, r.deg) for r in out_degrees(df).collect()} == {
        (1, 2), (2, 1), (3, 1), (4, 2), (5, 1),
    }
    with pytest.raises(ValueError, match="iterations"):
        pagerank_fixed(df, iterations=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_fixed(df, damping_pct=100)


def _hits_reference(edges, iterations, scale=10**9):
    nodes = sorted({n for e in edges for n in e})
    h = {v: scale for v in nodes}
    a = {}
    for _ in range(iterations):
        raw_a = {v: 0 for v in nodes}
        for s, d in edges:
            raw_a[d] += h[s]
        div = max(sum(raw_a.values()) // scale, 1)
        a = {v: raw_a[v] // div for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for s, d in edges:
            raw_h[s] += a[d]
        div = max(sum(raw_h.values()) // scale, 1)
        h = {v: raw_h[v] // div for v in nodes}
    return h, a


def test_hits_matches_integer_reference(spark):
    from ensembl_database_loader_spark.operators.graph import hits_fixed

    for iters in (1, 3):
        got = {
            r.node: (r.hub, r.authority)
            for r in hits_fixed(_df(spark, EDGES), iterations=iters).collect()
        }
        h, a = _hits_reference(EDGES, iters)
        assert got == {v: (h[v], a[v]) for v in h}, iters
    # pure source (5) ends with zero authority; pure-sink behavior:
    h, a = _hits_reference(EDGES, 3)
    assert a[5] == 0
    with pytest.raises(ValueError, match="iterations"):
        hits_fixed(_df(spark, EDGES), iterations=0)


def test_hits_layout_independent(spark):
    x = {
        r.node: (r.hub, r.authority)
        for r in hits_fixed_df(spark, 13).collect()
    }
    y = {
        r.node: (r.hub, r.authority)
        for r in hits_fixed_df(spark, 3).collect()
    }
    assert x == y


def hits_fixed_df(spark, parts):
    from ensembl_database_loader_spark.operators.graph import hits_fixed

    return hits_fixed(_df(spark, EDGES).repartition(parts), iterations=2)


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def _tri_reference(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    tris = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in und:
                continue
            for c in nodes:
                if c > b and (a, c) in und and (b, c) in und:
                    tris += 1
    return len(nodes), len(und), tris


def test_triangle_count_matches_reference(spark):
    from ensembl_database_loader_spark.operators.graph import triangle_count

    # a clique of 4 (4 triangles), a pendant, a separate triangle,
    # duplicate/reversed/self edges that must collapse
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4
        (4, 5),                                           # pendant
        (6, 7), (7, 8), (8, 6),                           # triangle
        (2, 1), (1, 2), (3, 3),                           # noise
    ]
    row = triangle_count(_df(spark, edges)).collect()[0]
    n_nodes, n_edges, tris = _tri_reference(edges)
    assert (row.n_nodes, row.n_edges, row.triangles) == (n_nodes, n_edges, tris)
    assert row.triangles == 5


def test_triangle_count_layout_independent_no_triangles(spark):
    from ensembl_database_loader_spark.operators.graph import triangle_count

    # bipartite graph: zero triangles regardless of partitioning
    edges = [(i, 100 + (i % 3)) for i in range(1, 20)]
    a = triangle_count(_df(spark, edges)).collect()[0]
    b = triangle_count(_df(spark, edges).repartition(5)).collect()[0]
    assert a == b
    assert a.triangles == 0


def test_triangle_count_skewed_hub(spark):
    from ensembl_database_loader_spark.operators.graph import triangle_count

    # star hub + rim cycle: hub degree 40, triangles = 40 (hub with each
    # rim edge) — exercises the orientation path where the hub is the
    # LARGEST-degree endpoint of every edge
    hub = 0
    rim = list(range(1, 41))
    edges = [(hub, r) for r in rim]
    edges += [(rim[i], rim[(i + 1) % len(rim)]) for i in range(len(rim))]
    row = triangle_count(_df(spark, edges)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.triangles) == (41, 80, 40)
    assert _tri_reference(edges) == (41, 80, 40)


# ---------------------------------------------------------------------------
# Personalized PageRank
# ---------------------------------------------------------------------------


def _ppr_reference(edges, seeds, iterations, scale=10**12, damping_pct=85):
    nodes = sorted({n for e in edges for n in e} | set(seeds))
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seed_base = scale // len(set(seeds))
    base = {v: (seed_base if v in set(seeds) else 0) for v in nodes}
    keep = 100 - damping_pct
    rank = dict(base)
    for _ in range(iterations):
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += rank[s] // deg[s]
        rank = {
            v: (keep * base[v] + damping_pct * sums[v]) // 100 for v in nodes
        }
    return rank


def test_personalized_pagerank_matches_reference(spark):
    from ensembl_database_loader_spark.operators.graph import (
        personalized_pagerank_fixed,
    )

    seeds = [1, 4]
    sd = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    for iters in (1, 3):
        got = {
            r.node: r.rank
            for r in personalized_pagerank_fixed(
                _df(spark, EDGES), sd, iterations=iters
            ).collect()
        }
        assert got == _ppr_reference(EDGES, seeds, iters), iters
    # non-seed mass comes only through the walk: node 5 has no
    # in-edges and is no seed -> rank exactly 0
    got3 = _ppr_reference(EDGES, seeds, 3)
    assert got3[5] == 0


def test_personalized_pagerank_offgraph_seed_and_guards(spark):
    from ensembl_database_loader_spark.operators.graph import (
        personalized_pagerank_fixed,
    )
    import pytest as _pt

    # seed 99 has no edges: appears in the output holding teleport mass
    sd = spark.createDataFrame([(1,), (99,)], "node bigint")
    got = {
        r.node: r.rank
        for r in personalized_pagerank_fixed(
            _df(spark, EDGES), sd, iterations=2
        ).collect()
    }
    assert got == _ppr_reference(EDGES, [1, 99], 2)
    assert got[99] > 0
    with _pt.raises(ValueError, match="empty seed set"):
        personalized_pagerank_fixed(
            _df(spark, EDGES),
            spark.createDataFrame([], "node bigint"),
        )
    with _pt.raises(ValueError, match="iterations"):
        personalized_pagerank_fixed(_df(spark, EDGES), sd, iterations=0)


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def _lpa_reference(edges, iterations):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    label = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v, nbrs in adj.items():
            counts: dict = {}
            for n in nbrs:
                counts[label[n]] = counts.get(label[n], 0) + 1
            # majority, ties to smallest label
            new[v] = max(counts, key=lambda c: (counts[c], -c))
        label = new
    return label


def test_label_propagation_matches_reference(spark):
    from ensembl_database_loader_spark.operators.graph import (
        label_propagation_fixed,
    )

    # two dense communities joined by one bridge edge + noise edges
    edges = (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]          # K4 on 1-4
        + [(10, 11), (10, 12), (11, 12), (10, 13), (11, 13), (12, 13)]  # K4 on 10-13
        + [(4, 10)]                                                # bridge
        + [(2, 1), (3, 3)]                                         # noise
    )
    for iters in (1, 2, 4):
        got = {
            r.node: r.label
            for r in label_propagation_fixed(
                _df(spark, edges), iterations=iters
            ).collect()
        }
        assert got == _lpa_reference(edges, iters), iters
    # after enough rounds the two cliques converge to their min labels
    final = _lpa_reference(edges, 4)
    assert {final[v] for v in (1, 2, 3)} == {1}


def test_label_propagation_layout_independent(spark):
    from ensembl_database_loader_spark.operators.graph import (
        label_propagation_fixed,
    )
    import pytest as _pt

    edges = [(i, (i * 7) % 23 + 100) for i in range(1, 40)]
    a = sorted(
        (r.node, r.label)
        for r in label_propagation_fixed(_df(spark, edges), iterations=3).collect()
    )
    b = sorted(
        (r.node, r.label)
        for r in label_propagation_fixed(
            _df(spark, edges).repartition(9), iterations=3
        ).collect()
    )
    assert a == b == sorted(_lpa_reference(edges, 3).items())
    with _pt.raises(ValueError, match="iterations"):
        label_propagation_fixed(_df(spark, edges), iterations=0)


# ---------------------------------------------------------------------------
# Bounded BFS
# ---------------------------------------------------------------------------


def _bfs_reference(edges, seeds, max_hops):
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {v: 0 for v in set(seeds)}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for n in adj.get(v, ()):
                if n not in dist:
                    nxt.add(n)
        for n in nxt:
            dist[n] = h
        frontier = nxt
        if not frontier:
            break
    return dist


def test_bfs_distances_matches_reference(spark):
    from ensembl_database_loader_spark.operators.graph import bfs_distances

    # chain 1->2->3->4->5, shortcut 1->3, unreachable 10->11,
    # back-edge 4->1 (must not shorten anything)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (10, 11), (4, 1)]
    sd = spark.createDataFrame([(1,)], "node bigint")
    for hops in (0, 1, 2, 3):
        got = {
            r.node: r.dist
            for r in bfs_distances(_df(spark, edges), sd, max_hops=hops).collect()
        }
        assert got == _bfs_reference(edges, [1], hops), hops
    got3 = _bfs_reference(edges, [1], 3)
    assert got3 == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}  # shortcut wins; 10/11 absent


def test_bfs_multi_seed_early_stop_and_guards(spark):
    from ensembl_database_loader_spark.operators.graph import bfs_distances
    import pytest as _pt

    edges = [(1, 2), (3, 2), (2, 4)]
    sd = spark.createDataFrame([(1,), (3,)], "node bigint")
    # max_hops far beyond the diameter: early-exit on empty frontier
    got = {
        r.node: r.dist
        for r in bfs_distances(_df(spark, edges), sd, max_hops=10).collect()
    }
    assert got == {1: 0, 3: 0, 2: 1, 4: 2}
    with _pt.raises(ValueError, match="max_hops"):
        bfs_distances(_df(spark, edges), sd, max_hops=-1)
