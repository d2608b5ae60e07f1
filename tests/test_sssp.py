"""Weighted shortest paths vs python Dijkstra oracle."""

from __future__ import annotations

import heapq
import random

import pytest

from linkgraph.graph.sssp import shortest_paths
from tests.conftest import gnp_graph


def brute_dijkstra(wpairs, roots, directed=False):
    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in wpairs:
        adj.setdefault(a, []).append((b, w))
        if not directed:
            adj.setdefault(b, []).append((a, w))
    out = {}
    for r in roots:
        dist = {r: 0.0}
        pq = [(0.0, r)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        for v, d in dist.items():
            out[(r, v)] = d
    return out


def wdf(spark, wpairs):
    return spark.createDataFrame(wpairs, "src long, dst long, weight double")


def collect(df):
    return {(r["root"], r["id"]): r["dist"] for r in df.collect()}


def assert_close(got, want):
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_weighted_path_prefers_long_cheap_route(spark):
    # 1-3 direct costs 10; 1-2-3 costs 2. BFS would say 1 hop; SSSP 2.0.
    wpairs = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 10.0)]
    res = shortest_paths(wdf(spark, wpairs), [1])
    assert collect(res.distances) == {(1, 1): 0.0, (1, 2): 1.0, (1, 3): 2.0}
    # the improvement to vertex 3 (10.0 -> 2.0) needs the second round
    assert res.iterations >= 2


def test_random_graph_vs_dijkstra(spark):
    rng = random.Random(7)
    base = [
        tuple(sorted(e))
        for e in {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
        if e[0] != e[1]
    ]
    wpairs = [(a, b, round(rng.uniform(0.5, 5.0), 3)) for a, b in sorted(set(base))]
    roots = [0, 1, 2]
    res = shortest_paths(wdf(spark, wpairs), roots)
    assert_close(collect(res.distances), brute_dijkstra(wpairs, roots))


def test_directed(spark):
    wpairs = [(1, 2, 1.0), (2, 3, 1.0)]
    res = shortest_paths(wdf(spark, wpairs), [3], directed=True)
    # nothing is reachable FROM 3 in the directed graph
    assert collect(res.distances) == {(3, 3): 0.0}


def test_negative_weight_rejected(spark):
    with pytest.raises(ValueError, match="positive"):
        shortest_paths(wdf(spark, [(1, 2, -1.0)]), [1])


def test_unit_weights_match_bfs(spark):
    from linkgraph.graph.bfs import bfs_distances
    from pyspark.sql import functions as F

    df = gnp_graph(spark, n=50, p=0.08, seed=11)
    got = collect(shortest_paths(df.withColumn("weight", F.lit(1.0)), [0, 5]).distances)
    want = {
        (r["root"], r["id"]): float(r["dist"])
        for r in bfs_distances(df, [0, 5]).distances.collect()
    }
    assert_close(got, want)
