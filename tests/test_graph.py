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
