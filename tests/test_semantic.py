"""Semantic dedup (SemDeDup-style): exact Python replay of the full
kmeans -> intra-cluster cosine -> transitive-group pipeline, planted
near-duplicates, survivor rules, and the degenerate-cluster cap."""

from __future__ import annotations

import math
import random

from linkgraph.dedup.semantic import semantic_dedup_groups, semantic_deduplicate


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )


# ------------------------------------------------------------ replay --
def _py_kmeans(vecs, k, n_iter):
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
    return {vid: c for vid, (_, c) in assign.items()}


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _py_semantic(vecs, k, n_iter, threshold):
    clus = _py_kmeans(vecs, k, n_iter)
    ids = sorted(vecs)
    pairs = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if clus[a] == clus[b] and _cos(vecs[a], vecs[b]) >= threshold
    ]
    # transitive closure, min-id label
    group = {i: i for i in ids}

    def find(x):
        while group[x] != x:
            group[x] = group[group[x]]
            x = group[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        group[max(ra, rb)] = min(ra, rb)
    return clus, {i: find(i) for i in ids}, pairs


# -------------------------------------------------------------- tests --
def test_replay_parity_random(spark):
    rng = random.Random(5)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(70)}
    res = semantic_dedup_groups(_emb_df(spark, vecs), k=4, n_iter=2,
                                threshold=0.8)
    got = {r["id"]: (r["cluster"], r["group_id"])
           for r in res.groups.collect()}
    clus, groups, _ = _py_semantic(vecs, 4, 2, 0.8)
    assert {i: c for i, (c, _) in got.items()} == clus
    assert {i: g for i, (_, g) in got.items()} == groups


def test_planted_duplicates(spark):
    """Three planted dup bundles + noise: groups recover the bundles."""
    rng = random.Random(9)
    base = {j: [rng.gauss(0, 1) for _ in range(16)] for j in range(3)}
    vecs, truth = {}, {}
    vid = 0
    for j in range(3):
        for _ in range(4):  # 4 near-copies of each base vector
            vecs[vid] = [x + rng.gauss(0, 0.01) for x in base[j]]
            truth[vid] = j
            vid += 1
    for _ in range(20):  # noise
        vecs[vid] = [rng.gauss(0, 1) for _ in range(16)]
        truth[vid] = None
        vid += 1
    res = semantic_dedup_groups(_emb_df(spark, vecs), k=4, n_iter=3,
                                threshold=0.99)
    got = {r["id"]: r["group_id"] for r in res.groups.collect()}
    for j in range(3):
        members = [v for v, t in truth.items() if t == j]
        assert len({got[m] for m in members}) == 1  # bundle glued
        assert min(members) == got[members[0]]      # min-id label
    for v, t in truth.items():
        if t is None:
            assert got[v] == v  # noise is its own singleton


def test_survivor_rules(spark):
    rng = random.Random(21)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = _emb_df(spark, vecs)
    kept_min = semantic_deduplicate(df, k=3, n_iter=2, threshold=0.8,
                                    keep="min_id")
    clus, groups, _ = _py_semantic(vecs, 3, 2, 0.8)
    want = sorted(set(groups.values()))
    assert sorted(r["vec_id"] for r in kept_min.collect()) == want

    kept_out = semantic_deduplicate(df, k=3, n_iter=2, threshold=0.8,
                                    keep="outlier")
    # one survivor per group, and the same number of survivors
    got = sorted(r["vec_id"] for r in kept_out.collect())
    assert len(got) == len(want)
    assert {groups[v] for v in got} == set(want)


def test_max_cluster_size_cap(spark):
    """A cluster over the cap contributes no pairs (its members become
    singletons) and the counter reports the drop."""
    rng = random.Random(2)
    vecs = {i: [rng.gauss(0, 0.05) for _ in range(8)] for i in range(30)}
    df = _emb_df(spark, vecs)
    res = semantic_dedup_groups(df, k=1, n_iter=1, threshold=-1.0,
                                max_cluster_size=5)
    assert res.counters["clusters_dropped"] == 1
    got = {r["id"]: r["group_id"] for r in res.groups.collect()}
    assert all(g == i for i, g in got.items())  # all singletons
