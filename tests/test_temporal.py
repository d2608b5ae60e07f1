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


def test_windowed_pagerank_vs_single_graph(spark):
    """Each window's batched ranks equal an independent numpy PR run."""
    from linkgraph.graph.temporal import windowed_pagerank

    def numpy_pr(pairs, iters=10, d=0.85):
        links = list(pairs) + [(b, a) for a, b in pairs]
        ids = sorted({v for e in links for v in e})
        idx = {v: i for i, v in enumerate(ids)}
        out = [0] * len(ids)
        for a, _ in links:
            out[idx[a]] += 1
        r = [1.0 / len(ids)] * len(ids)
        for _ in range(iters):
            c = [0.0] * len(ids)
            for a, b in links:
                c[idx[b]] += r[idx[a]] / out[idx[a]]
            r = [(1 - d) / len(ids) + d * x for x in c]
        return {v: r[idx[v]] for v in ids}

    wins = {
        "a": [(1, 2), (2, 3), (1, 3), (3, 4)],
        "b": [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
    }
    rows = [(w, s, t) for w, ps in wins.items() for s, t in ps]
    df = spark.createDataFrame(rows, "win string, src long, dst long")
    got = {}
    for r in windowed_pagerank(df, iters=10).collect():
        got.setdefault(r["win"], {})[r["id"]] = r["rank"]
    for w, ps in wins.items():
        want = numpy_pr(ps)
        assert set(got[w]) == set(want)
        for v in want:
            assert abs(got[w][v] - want[v]) < 1e-12, (w, v)
        assert abs(sum(got[w].values()) - 1.0) < 1e-9


def test_windowed_components_vs_single_graph(spark):
    from linkgraph.graph.components import connected_components
    from linkgraph.graph.temporal import windowed_components
    from tests.conftest import edge_df

    wins = {
        "a": [(1, 2), (3, 4), (4, 5)],               # {1,2}, {3,4,5}
        "b": [(1, 2), (2, 3), (7, 8)],               # {1,2,3}, {7,8}
        "c": [(i, i + 1) for i in range(1, 12)],     # one long path
    }
    rows = [(w, s, t) for w, ps in wins.items() for s, t in ps]
    df = spark.createDataFrame(rows, "win string, src long, dst long")
    got = {}
    for r in windowed_components(df).collect():
        got.setdefault(r["win"], {})[r["id"]] = r["label"]
    for w, ps in wins.items():
        want = {
            r["id"]: r["label"]
            for r in connected_components(edge_df(spark, ps)).collect()
        }
        assert got[w] == want, w


def test_empty_inputs(spark):
    from linkgraph.graph.mixing import attribute_assortativity, mixing_matrix
    from linkgraph.graph.temporal import (
        windowed_components,
        windowed_graph_stats,
        windowed_pagerank,
        windowed_triangle_counts,
    )
    from linkgraph.text.vocab import build_vocab, oov_stats

    ew = spark.createDataFrame([], "win string, src long, dst long")
    assert windowed_triangle_counts(ew).count() == 0
    assert windowed_graph_stats(ew).count() == 0
    assert windowed_pagerank(ew, iters=2).count() == 0
    assert windowed_components(ew, max_rounds=3).count() == 0
    e = spark.createDataFrame([], "src long, dst long")
    attrs = spark.createDataFrame([], "id long, attr string")
    assert mixing_matrix(e, attrs).count() == 0
    row = attribute_assortativity(e, attrs).collect()
    assert len(row) <= 1  # no-edge graph: empty or NULL-r row
    docs = spark.createDataFrame([], "doc_id long, text string")
    v = build_vocab(docs)
    assert v.count() == 0
    assert oov_stats(docs, v).count() == 0


def test_windowed_lpa_vs_replay(spark):
    from collections import Counter

    from linkgraph.graph.temporal import windowed_label_propagation

    def py_lpa(pairs, iters):
        nbrs = {}
        for a, b in pairs:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        lab = {v: v for v in nbrs}
        for _ in range(iters):
            new = {}
            for v, ns in nbrs.items():
                c = Counter(lab[u] for u in ns)
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            lab = new
        return lab

    wins = {
        "a": [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
        "b": [(i, i + 1) for i in range(1, 8)],
    }
    rows = [(w, s, t) for w, ps in wins.items() for s, t in ps]
    df = spark.createDataFrame(rows, "win string, src long, dst long")
    got = {}
    for r in windowed_label_propagation(df, iters=6).collect():
        got.setdefault(r["win"], {})[r["id"]] = r["label"]
    for w, ps in wins.items():
        assert got[w] == py_lpa(ps, 6), w
