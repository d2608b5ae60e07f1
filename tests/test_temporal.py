"""Per-window graph metrics vs per-window brute force."""

from __future__ import annotations

from itertools import combinations

from linkgraph.graph.temporal import windowed_graph_stats, windowed_triangle_counts


def brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


WINDOWS = {
    "w1": [(1, 2), (2, 3), (1, 3), (3, 4)],            # one triangle
    "w2": [(1, 2), (2, 3), (3, 4), (4, 1)],            # 4-cycle, none
    "w3": [(i, j) for i, j in combinations(range(5), 2)],  # K5 -> 10
}


def _edges(spark):
    rows = [(w, a, b) for w, ps in WINDOWS.items() for a, b in ps]
    return spark.createDataFrame(rows, "win string, src long, dst long")


def test_windowed_triangles(spark):
    got = {
        r["win"]: r["n_triangles"]
        for r in windowed_triangle_counts(_edges(spark)).collect()
    }
    assert got == {w: brute_triangles(ps) for w, ps in WINDOWS.items()}


def test_windowed_stats(spark):
    got = {
        r["win"]: (r["n_edges"], r["n_vertices"], r["density"])
        for r in windowed_graph_stats(_edges(spark)).collect()
    }
    for w, ps in WINDOWS.items():
        vs = {v for p in ps for v in p}
        dens = 2 * len(ps) / (len(vs) * (len(vs) - 1))
        assert got[w][0] == len(ps) and got[w][1] == len(vs)
        assert abs(got[w][2] - dens) < 1e-12
    assert abs(got["w3"][2] - 1.0) < 1e-12  # K5 density 1


def test_same_pair_across_windows_counted_per_window(spark):
    rows = [("a", 1, 2), ("a", 2, 3), ("a", 1, 3), ("b", 1, 2), ("b", 2, 3), ("b", 1, 3)]
    df = spark.createDataFrame(rows, "win string, src long, dst long")
    got = {
        r["win"]: r["n_triangles"]
        for r in windowed_triangle_counts(df).collect()
    }
    assert got == {"a": 1, "b": 1}
