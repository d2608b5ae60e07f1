"""PageRank vs NumPy power-iteration oracle (allclose 1e-6)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.graph.edges import canonicalize
from linkgraph.graph.pagerank import pagerank
from tests.conftest import complete_graph, edge_df, gnp_graph, star_graph


def numpy_pagerank(pairs, damping=0.85, directed=False, iters=500):
    """Dense oracle with identical semantics (dangling mass uniform)."""
    links = list(pairs) + ([] if directed else [(b, a) for a, b in pairs])
    ids = sorted({v for e in links for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for a, _ in links:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dangling = r[out == 0].sum()
        for a, b in links:
            contrib[idx[b]] += r[idx[a]] / out[idx[a]]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in ids}


def ranks_dict(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def assert_close(got, want, tol=1e-6):
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) <= tol, (k, got[k], want[k])


def test_complete_graph_uniform(spark):
    n = 6
    res = pagerank(canonicalize(complete_graph(spark, n)), tol=1e-9)
    got = ranks_dict(res.ranks)
    assert_close(got, {i: 1.0 / n for i in range(1, n + 1)})
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_small_twitter_vs_oracle(small_twitter):
    pairs = [(r["src"], r["dst"]) for r in small_twitter.collect()]
    res = pagerank(small_twitter, tol=1e-9)
    assert_close(ranks_dict(res.ranks), numpy_pagerank(pairs))


def test_star_hub_dominates(spark):
    res = pagerank(canonicalize(star_graph(spark, 10)), tol=1e-9)
    got = ranks_dict(res.ranks)
    assert got[0] > 0.3
    leaf = [v for k, v in got.items() if k != 0]
    assert np.allclose(leaf, leaf[0], atol=1e-9)


def test_gnp_vs_oracle(spark):
    edges = canonicalize(gnp_graph(spark, n=80, p=0.06, seed=3))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    res = pagerank(edges, tol=1e-9)
    assert_close(ranks_dict(res.ranks), numpy_pagerank(pairs))


def test_directed_with_dangling(spark):
    # 1->2->3, 3 dangling; exercises dangling-mass redistribution.
    edges = edge_df(spark, [(1, 2), (2, 3)])
    res = pagerank(edges, directed=True, tol=1e-9)
    assert_close(
        ranks_dict(res.ranks), numpy_pagerank([(1, 2), (2, 3)], directed=True)
    )
    assert abs(sum(ranks_dict(res.ranks).values()) - 1.0) < 1e-6


def numpy_ppr(pairs, sources, damping=0.85, directed=False, iters=200):
    """Personalized-PageRank oracle: teleport + dangling mass return to
    the seed set uniformly."""
    links = list(pairs) + ([] if directed else [(b, a) for a, b in pairs])
    ids = sorted({v for e in links for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n, ns = len(ids), len(sources)
    out = np.zeros(n)
    for a, _ in links:
        out[idx[a]] += 1
    member = np.zeros(n)
    for s in sources:
        member[idx[s]] = 1.0
    r = member / ns
    for _ in range(iters):
        contrib = np.zeros(n)
        dangling = r[out == 0].sum()
        for a, b in links:
            if out[idx[a]]:
                contrib[idx[b]] += r[idx[a]] / out[idx[a]]
        r = member * ((1 - damping) / ns + damping * dangling / ns) + damping * contrib
    return {v: r[idx[v]] for v in ids}


def test_personalized_pagerank_vs_oracle(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (6, 7)]
    res = pagerank(
        canonicalize(edge_df(spark, pairs)), tol=0.0, max_iter=100, sources=[1, 2]
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    want = numpy_ppr(pairs, [1, 2])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # seeds dominate; the disconnected component {6, 7} gets zero mass
    assert got[6] == got[7] == pytest.approx(0.0, abs=1e-12)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def numpy_weighted_pagerank(wpairs, damping=0.85, iters=500):
    """Dense weighted oracle: rank splits proportionally to weight."""
    links = [(a, b, w) for a, b, w in wpairs] + [(b, a, w) for a, b, w in wpairs]
    ids = sorted({v for a, b, _ in links for v in (a, b)})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outw = np.zeros(n)
    for a, _, w in links:
        outw[idx[a]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b, w in links:
            contrib[idx[b]] += r[idx[a]] * w / outw[idx[a]]
        r = (1 - damping) / n + damping * contrib
    return {v: r[idx[v]] for v in ids}


def test_weighted_vs_numpy_oracle(spark):
    import random

    rng = random.Random(9)
    wpairs = sorted(
        {(i, j) for i in range(30) for j in range(i + 1, 30) if rng.random() < 0.15}
    )
    wpairs = [(a, b, rng.randint(1, 5)) for a, b in wpairs]
    df = spark.createDataFrame(wpairs, "src long, dst long, weight long")
    res = pagerank(df, tol=1e-10, weight_col="weight")
    got = ranks_dict(res.ranks)
    assert_close(got, numpy_weighted_pagerank(wpairs))
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_uniform_weights_match_unweighted(spark):
    from pyspark.sql import functions as F

    df = canonicalize(gnp_graph(spark, n=40, p=0.1, seed=4))
    wdf = df.withColumn("weight", F.lit(1.0))
    a = ranks_dict(pagerank(df, tol=1e-10).ranks)
    b = ranks_dict(pagerank(wdf, tol=1e-10, weight_col="weight").ranks)
    assert_close(b, a, tol=1e-12)


def _gnp_pairs(n, p, seed):
    import random

    rng = random.Random(seed)
    return [
        (i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p
    ]


def test_warm_start_converges_immediately(spark):
    pairs = _gnp_pairs(60, 0.1, seed=7)
    e = edge_df(spark, pairs)
    cold = pagerank(e, tol=1e-10, max_iter=200)
    ranks = cold.ranks
    warm = pagerank(e, tol=1e-10, max_iter=200, init_ranks=ranks)
    # seeded at the fixpoint: the first delta check already passes
    assert warm.iterations <= 2, warm.iterations
    got = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["id"]: r["rank"] for r in ranks.collect()}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_warm_start_same_fixpoint_fewer_rounds(spark):
    pairs = _gnp_pairs(60, 0.1, seed=11)
    e0 = edge_df(spark, pairs)
    prev = pagerank(e0, tol=1e-10, max_iter=300).ranks
    # perturb: add a few edges (plus a brand-new vertex 999)
    delta = [(1, 50), (2, 51), (999, 3)]
    e1 = edge_df(spark, pairs + delta)
    cold = pagerank(e1, tol=1e-10, max_iter=300)
    warm = pagerank(e1, tol=1e-10, max_iter=300, init_ranks=prev)
    assert warm.iterations < cold.iterations
    got = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-7, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_warm_start_duplicate_init_ids_are_aggregated(spark):
    pairs = _gnp_pairs(40, 0.12, seed=13)
    e = edge_df(spark, pairs)
    fix = pagerank(e, tol=1e-10, max_iter=200).ranks
    # split every init row into two half-mass duplicates: after the
    # sum-aggregate they are equivalent to the clean warm start
    halves = fix.selectExpr("id", "rank / 2 as rank")
    dup = halves.unionAll(halves)
    warm = pagerank(e, tol=1e-10, max_iter=200, init_ranks=dup)
    got = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["id"]: r["rank"] for r in fix.collect()}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_warm_start_zero_mass_rejected(spark):
    import pytest

    pairs = _gnp_pairs(20, 0.2, seed=3)
    e = edge_df(spark, pairs)
    zeros = (
        e.selectExpr("explode(array(src, dst)) as id")
        .distinct()
        .selectExpr("id", "cast(0.0 as double) as rank")
    )
    with pytest.raises(ValueError, match="positive total mass"):
        pagerank(e, max_iter=5, init_ranks=zeros)
