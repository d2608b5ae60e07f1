"""Distributed Lloyd's k-means: exact sequential-fold replay, Lloyd
monotonicity, empty-cluster rule, and cluster recovery."""

from __future__ import annotations

import random

from linkgraph.sim.kmeans import kmeans


def _py_kmeans(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Replay with the SAME sequential fold order as the Spark plan."""
    cents = [list(vecs[i]) for i in sorted(vecs)[:k]]

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    assign = {}
    for _ in range(n_iter):
        assign = {
            vid: min((d2(v, c), cid) for cid, c in enumerate(cents))
            for vid, v in vecs.items()
        }
        for cid in range(k):
            members = [vecs[vid] for vid, (_, c) in assign.items() if c == cid]
            if members:
                cents[cid] = [
                    sum(m[j] for m in members) / len(members)
                    for j in range(len(cents[cid]))
                ]
    return {vid: c for vid, (_, c) in assign.items()}, assign


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )


def test_assignments_match_sequential_replay(spark):
    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(80)}
    res = kmeans(_emb_df(spark, vecs), k=5, n_iter=3)
    got = {r["id"]: (r["cluster"], r["d2"]) for r in res.assignments.collect()}
    want_c, want = _py_kmeans(vecs, 5, 3)
    for vid in vecs:
        assert got[vid][0] == want_c[vid]
        assert abs(got[vid][1] - want[vid][0]) < 1e-12


def test_inertia_monotone_nonincreasing(spark):
    rng = random.Random(3)
    vecs = {i: [rng.gauss(i % 4, 0.3) for _ in range(4)] for i in range(60)}
    res = kmeans(_emb_df(spark, vecs), k=4, n_iter=4)
    inert = [c["inertia"] for c in res.counters]
    assert all(b <= a + 1e-9 for a, b in zip(inert, inert[1:]))


def test_recovers_separated_clusters(spark):
    rng = random.Random(7)
    centers = [[0.0] * 6, [10.0] * 6, [-10.0, 10.0] * 3]
    vecs = {
        i: [c + rng.uniform(-0.5, 0.5) for c in centers[i % 3]]
        for i in range(90)
    }
    res = kmeans(_emb_df(spark, vecs), k=3, n_iter=5)
    rows = res.assignments.collect()
    # all members of a true cluster land in one k-means cluster
    by_true: dict[int, set[int]] = {}
    for r in rows:
        by_true.setdefault(r["id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({s.pop() for s in by_true.values()}) == 3


def test_empty_cluster_keeps_centroid(spark):
    # k=3 but only two distinct points: the third centroid starts on a
    # duplicate of another and never wins a point -> stays put, no crash
    vecs = {0: [0.0, 0.0], 1: [0.0, 0.0], 2: [5.0, 5.0], 3: [5.0, 5.0]}
    res = kmeans(_emb_df(spark, vecs), k=3, n_iter=2)
    assert res.assignments.count() == 4
    assert len(res.centroids) == 3
