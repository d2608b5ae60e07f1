"""k-hop neighbor feature aggregation vs a brute-force Python replay."""

from __future__ import annotations

from conftest import TRUSS_MINI, edge_df

from linkgraph.graph.neighagg import neighbor_agg


def _adj(pairs, include_self=False):
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    if include_self:
        for v in nbrs:
            nbrs[v].append(v)
    return nbrs


def _feats(ids, d=4):
    # deterministic congruence features, mirrors nothing engine-side
    return {v: [((37 * v + 11 * j) % 19) / 19.0 for j in range(d)] for v in ids}


def py_hop(nbrs, feats, agg):
    out = {}
    for v, ns in nbrs.items():
        vals = [feats[n] for n in ns if n in feats]
        if not vals:
            continue
        d = len(vals[0])
        if agg == "mean":
            out[v] = [sum(x[j] for x in vals) / len(vals) for j in range(d)]
        elif agg == "sum":
            out[v] = [sum(x[j] for x in vals) for j in range(d)]
        elif agg == "max":
            out[v] = [max(x[j] for x in vals) for j in range(d)]
    return out


def _run(spark, pairs, hops, agg, include_self=False):
    e = edge_df(spark, pairs)
    nbrs = _adj(pairs, include_self)
    feats = _feats(nbrs.keys())
    fdf = spark.createDataFrame(
        [(v, f) for v, f in feats.items()], "id long, feature array<double>"
    )
    got = {}
    for r in neighbor_agg(
        e, fdf, hops=hops, agg=agg, include_self=include_self
    ).collect():
        got.setdefault(r["id"], {})[r["dim"]] = r["value"]
    want = feats
    for _ in range(hops):
        want = py_hop(nbrs, want, agg)
    return got, want


def test_one_hop_mean(spark):
    got, want = _run(spark, TRUSS_MINI, 1, "mean")
    assert set(got) == set(want)
    for v, vec in want.items():
        for j, x in enumerate(vec):
            assert abs(got[v][j] - x) < 1e-12, (v, j)


def test_two_hop_sum_and_max(spark):
    for agg in ("sum", "max"):
        got, want = _run(spark, TRUSS_MINI, 2, agg)
        assert set(got) == set(want)
        for v, vec in want.items():
            for j, x in enumerate(vec):
                assert abs(got[v][j] - x) < 1e-12, (agg, v, j)


def test_include_self_and_packed(spark):
    pairs = [(1, 2), (2, 3)]
    got, want = _run(spark, pairs, 1, "mean", include_self=True)
    # vertex 1: mean of {1, 2}'s features
    assert set(got) == {1, 2, 3}
    for v, vec in want.items():
        for j, x in enumerate(vec):
            assert abs(got[v][j] - x) < 1e-12

    e = edge_df(spark, pairs)
    feats = _feats({1, 2, 3})
    fdf = spark.createDataFrame(
        [(v, f) for v, f in feats.items()], "id long, feature array<double>"
    )
    packed = {
        r["id"]: r["feature"]
        for r in neighbor_agg(e, fdf, hops=1, agg="mean", packed=True).collect()
    }
    flat, _ = _run(spark, pairs, 1, "mean")
    for v, vec in packed.items():
        assert vec == [flat[v][j] for j in range(len(vec))], v


def test_isolated_vertex_drops_without_self(spark):
    pairs = [(1, 2)]
    e = edge_df(spark, pairs)
    feats = _feats({1, 2, 9})
    fdf = spark.createDataFrame(
        [(v, f) for v, f in feats.items()], "id long, feature array<double>"
    )
    ids = {r["id"] for r in neighbor_agg(e, fdf).select("id").distinct().collect()}
    assert ids == {1, 2}  # 9 has no edges, no aggregate row


def test_include_self_keeps_isolated_feature_vertices(spark):
    # vertex 99 has features but no edges: include_self must keep it
    from linkgraph.graph.neighagg import neighbor_agg

    e = edge_df(spark, [(1, 2)])
    fdf = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (99, [5.0, 6.0])],
        "id long, feature array<double>",
    )
    got = {}
    for r in neighbor_agg(e, fdf, hops=2, agg="mean", include_self=True).collect():
        got.setdefault(r["id"], {})[r["dim"]] = r["value"]
    assert 99 in got
    assert got[99] == {0: 5.0, 1: 6.0}
