"""Modularity, square counting, and landmark eccentricity vs
brute-force python oracles."""

from __future__ import annotations

from collections import deque
from itertools import combinations

from linkgraph.graph.bfs import eccentricity
from linkgraph.graph.components import connected_components
from linkgraph.graph.modularity import community_stats, modularity
from linkgraph.graph.squares import square_count
from tests.conftest import (
    SMALL_TWITTER,
    complete_graph,
    edge_df,
    gnp_graph,
    ring_of_cliques,
)


# -- python oracles ----------------------------------------------------------


def brute_modularity(pairs, labels):
    m = len(pairs)
    adj: dict[int, int] = {}
    for a, b in pairs:
        adj[a] = adj.get(a, 0) + 1
        adj[b] = adj.get(b, 0) + 1
    lab = {v: labels.get(v, v) for v in adj}
    q = 0.0
    communities = set(lab.values())
    for c in communities:
        mc = sum(1 for a, b in pairs if lab[a] == c and lab[b] == c)
        dc = sum(d for v, d in adj.items() if lab[v] == c)
        q += mc / m - (dc / (2 * m)) ** 2
    return q


def brute_squares(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for u, v in combinations(sorted(adj), 2):
        cn = len(adj[u] & adj[v])
        n += cn * (cn - 1) // 2
    return n // 2


def brute_ecc(pairs, root):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {root: 0}
    q = deque([root])
    while q:
        u = q.popleft()
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return max(dist.values()), len(dist) - 1


# -- modularity --------------------------------------------------------------


def test_modularity_ring_of_cliques(spark):
    # 4 cliques of 5 joined in a ring: per-clique labels give the
    # classic high-Q partition; the python oracle is the ground truth.
    df = ring_of_cliques(spark, 4, 5)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    labels = {v: v // 5 for v in {x for p in pairs for x in p}}
    lab_df = spark.createDataFrame(list(labels.items()), "id long, label long")
    got = modularity(df, lab_df).collect()[0]["modularity"]
    assert abs(got - brute_modularity(pairs, labels)) < 1e-9
    assert got > 0.5


def test_modularity_single_community_is_zero(spark):
    # Everything in one community: Q = m/m - (2m/2m)^2 = 0.
    df = complete_graph(spark, 6)
    lab = spark.createDataFrame([(i, 1) for i in range(1, 7)], "id long, label long")
    got = modularity(df, lab).collect()[0]["modularity"]
    assert abs(got) < 1e-12


def test_modularity_missing_labels_are_singletons(spark):
    df = edge_df(spark, SMALL_TWITTER)
    pairs = SMALL_TWITTER
    labels = {1: 100, 2: 100, 3: 100}  # 4..7 unlabeled -> singletons
    lab_df = spark.createDataFrame(list(labels.items()), "id long, label long")
    got = modularity(df, lab_df).collect()[0]["modularity"]
    assert abs(got - brute_modularity(pairs, labels)) < 1e-9


def test_community_stats_shape(spark):
    df = ring_of_cliques(spark, 3, 4)
    labels = connected_components(df)
    stats = community_stats(df, labels).collect()
    # one ring -> one component covering all 12 vertices and 21 edges
    assert len(stats) == 1
    row = stats[0]
    assert row["n_vertices"] == 12
    assert row["internal_edges"] == 3 * 6 + 3
    assert row["degree_sum"] == 2 * row["internal_edges"]


# -- squares -----------------------------------------------------------------


def test_square_count_c4(spark):
    df = edge_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert square_count(df).collect()[0]["n_squares"] == 1


def test_square_count_k4(spark):
    # K4 has 3 four-cycles (each omits one perfect matching).
    df = complete_graph(spark, 4)
    assert square_count(df).collect()[0]["n_squares"] == 3


def test_square_count_gnp(spark):
    df = gnp_graph(spark, n=60, p=0.1, seed=7)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    got = square_count(df).collect()[0]["n_squares"]
    assert got == brute_squares(pairs)


def test_square_count_triangle_free(spark):
    # path graph: no squares
    df = edge_df(spark, [(i, i + 1) for i in range(10)])
    assert square_count(df).collect()[0]["n_squares"] == 0


def test_square_hub_cap_matches_capped_brute(spark):
    pairs = [(0, i) for i in range(1, 8)] + [(1, 2), (2, 3), (3, 1)]
    df = edge_df(spark, pairs)
    # cap below the hub degree: wedges through vertex 0 vanish
    capped = square_count(df, max_center_degree=4).collect()[0]["n_squares"]
    surviving = [(a, b) for a, b in pairs]  # same edges; cap is center-side
    # brute force with hub-centered wedges removed
    adj: dict[int, set[int]] = {}
    for a, b in surviving:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    n = 0
    for u, v in combinations(sorted(adj), 2):
        cn = len({w for w in adj[u] & adj[v] if deg[w] <= 4})
        n += cn * (cn - 1) // 2
    assert capped == n // 2


# -- eccentricity ------------------------------------------------------------


def test_eccentricity_small_twitter(spark, small_twitter):
    got = {
        r["root"]: (r["eccentricity"], r["n_reached"])
        for r in eccentricity(small_twitter, [1, 4, 7]).collect()
    }
    for root in (1, 4, 7):
        assert got[root] == brute_ecc(SMALL_TWITTER, root)


def test_eccentricity_isolated_root(spark):
    df = edge_df(spark, [(1, 2), (2, 3)])
    got = {
        r["root"]: (r["eccentricity"], r["n_reached"])
        for r in eccentricity(df, [1, 99]).collect()
    }
    assert got[1] == (2, 2)
    assert got[99] == (0, 0)


def test_contract_graph_by_labels(spark):
    from linkgraph.graph.modularity import contract_graph

    # two triangles {1,2,3} {4,5,6} + one bridge (3,4)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    lab = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3)] + [(i, 4) for i in (4, 5, 6)],
        "id long, label long",
    )
    got = {
        (r["label_a"], r["label_b"]): r["n_edges"]
        for r in contract_graph(e, lab).collect()
    }
    assert got == {(1, 1): 3, (4, 4): 3, (1, 4): 1}
    no_loops = contract_graph(e, lab, keep_self_loops=False)
    assert {(r["label_a"], r["label_b"]) for r in no_loops.collect()} == {(1, 4)}


def test_contract_graph_missing_labels_are_singletons(spark):
    from linkgraph.graph.modularity import contract_graph

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    lab = spark.createDataFrame([(1, 9), (2, 9)], "id long, label long")
    got = {
        (r["label_a"], r["label_b"]): r["n_edges"]
        for r in contract_graph(e, lab).collect()
    }
    assert got == {(9, 9): 1, (3, 9): 1}


def test_contract_graph_string_labels(spark):
    from linkgraph.graph.modularity import contract_graph

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    lab = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, label string"
    )
    got = {
        (r["label_a"], r["label_b"]): r["n_edges"]
        for r in contract_graph(e, lab).collect()
    }
    assert got == {("a", "a"): 1, ("a", "b"): 1}


def test_contract_graph_closes_lpa_coarsening(spark):
    """Contraction composes with the engine's own community pass."""
    from linkgraph.graph.labelprop import label_propagation
    from linkgraph.graph.modularity import contract_graph
    from tests.conftest import ring_of_cliques

    g = ring_of_cliques(spark, 4, 5)
    labels = label_propagation(g, max_iter=10).labels
    sup = contract_graph(g, labels, keep_self_loops=False)
    # the coarse graph is a small connected graph over <= 4 supernodes
    n_super = labels.select("label").distinct().count()
    assert 1 <= sup.count() <= n_super * (n_super - 1) // 2


# -- dyad census -------------------------------------------------------------


def brute_dyads(pairs):
    import itertools

    pairs = {(a, b) for a, b in pairs if a != b}
    nodes = sorted({v for e in pairs for v in e})
    mutual = asym = 0
    for a, b in itertools.combinations(nodes, 2):
        fwd, rev = (a, b) in pairs, (b, a) in pairs
        if fwd and rev:
            mutual += 1
        elif fwd or rev:
            asym += 1
    null = len(nodes) * (len(nodes) - 1) // 2 - mutual - asym
    den = 2 * mutual + asym
    return mutual, asym, null, (2.0 * mutual / den if den else 0.0)


def test_dyad_census_golden(spark):
    from linkgraph.graph.edges import dyad_census

    # 1<->2 mutual, 1->3 asym, 4 isolated-but-touched via 4->1.
    pairs = [(1, 2), (2, 1), (1, 3), (4, 1), (2, 2)]
    r = dyad_census(edge_df(spark, pairs)).collect()[0]
    want = brute_dyads(pairs)
    assert (r["mutual"], r["asymmetric"], r["null"]) == want[:3]
    assert abs(r["reciprocity"] - want[3]) < 1e-12


def test_dyad_census_random(spark):
    import random

    from linkgraph.graph.edges import dyad_census

    rng = random.Random(5)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
    r = dyad_census(edge_df(spark, pairs)).collect()[0]
    want = brute_dyads(pairs)
    assert (r["mutual"], r["asymmetric"], r["null"]) == want[:3]
    assert abs(r["reciprocity"] - want[3]) < 1e-12


def test_dyad_census_empty(spark):
    from linkgraph.graph.edges import dyad_census

    empty = spark.createDataFrame([], "src long, dst long")
    r = dyad_census(empty).collect()[0]
    assert (r["mutual"], r["asymmetric"], r["null"], r["reciprocity"]) == (
        0, 0, 0, 0.0
    )


# -- community conductance ---------------------------------------------------


def brute_conductance(pairs, labels):
    from collections import defaultdict

    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    lab = {v: labels.get(v, v) for v in deg}
    vol = defaultdict(int)
    cut = defaultdict(int)
    for v, d in deg.items():
        vol[lab[v]] += d
    for a, b in pairs:
        if lab[a] != lab[b]:
            cut[lab[a]] += 1
            cut[lab[b]] += 1
    m2 = 2 * len(pairs)
    out = {}
    for c in vol:
        den = min(vol[c], m2 - vol[c])
        out[c] = (cut[c], vol[c], cut[c] / den if den > 0 else 0.0)
    return out


def test_conductance_two_cliques_bridge(spark):
    from linkgraph.graph.modularity import community_conductance

    # Two triangles joined by one bridge edge; label by side.
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    labels = {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}
    got = {
        r["label"]: (r["cut_edges"], r["volume"], r["conductance"])
        for r in community_conductance(
            edge_df(spark, pairs),
            spark.createDataFrame(list(labels.items()), "id long, label long"),
        ).collect()
    }
    want = brute_conductance(pairs, labels)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) < 1e-12
    # Each side: cut 1, vol 7, conductance 1/7.
    assert got[0] == (1, 7, 1 / 7)


def test_conductance_random_vs_brute(spark):
    import random

    from linkgraph.graph.modularity import community_conductance

    rng = random.Random(3)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(90)
            )
            if a != b
        }
    )
    labels = {v: rng.randrange(4) for v in range(0, 30, 2)}  # half labeled
    got = {
        r["label"]: (r["cut_edges"], r["volume"], r["conductance"])
        for r in community_conductance(
            edge_df(spark, pairs),
            spark.createDataFrame(list(labels.items()), "id long, label long"),
        ).collect()
    }
    want = brute_conductance(pairs, labels)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) < 1e-12
