"""PPR sweep cut: recovers a planted community; cut/volume columns
match a brute-force python sweep on the same order."""

from __future__ import annotations

from linkgraph.graph.localcluster import local_cluster
from tests.conftest import gnp_graph, ring_of_cliques


def test_recovers_clique_in_ring(spark):
    g = ring_of_cliques(spark, 4, 5)  # cliques {0-4},{5-9},{10-14},{15-19}
    res = local_cluster(g, seed=2, k=12, max_iter=30)
    got = {r["id"] for r in res.members.collect()}
    assert got == {0, 1, 2, 3, 4}
    # clique vol = 4*4 + 6 (two bridge endpoints on vertex 0), cut = 2
    assert abs(res.best_conductance - 2 / 22) < 1e-12


def test_sweep_columns_match_bruteforce(spark):
    g = gnp_graph(spark, n=50, p=0.12, seed=9)
    pairs = [(r["src"], r["dst"]) for r in g.collect()]
    res = local_cluster(g, seed=pairs[0][0], k=20, max_iter=15)
    rows = sorted(res.sweep.collect(), key=lambda r: r["pos"])
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    prefix: set[int] = set()
    for r in rows:
        prefix.add(r["id"])
        vol = sum(deg[v] for v in prefix)
        cut = sum(1 for a, b in pairs if (a in prefix) != (b in prefix))
        assert r["volume"] == vol and r["cut_edges"] == cut, r["pos"]
        denom = min(vol, sum(deg.values()) - vol)
        if denom > 0:
            assert abs(r["conductance"] - cut / denom) < 1e-12
    # positions are 1..K without gaps
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
