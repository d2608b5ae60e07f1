"""Property tests (SURVEY.md §5d): algebraic invariants the operators
must satisfy on arbitrary graphs, with hypothesis-generated edge lists.

Spark session startup is expensive, so strategies are kept small and
example counts low — these are invariant checks, not fuzz campaigns.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph.graph.edges import canonicalize, degrees
from linkgraph.graph.triangles import triangle_count
from linkgraph.graph.truss import k_truss
from tests.conftest import canonical_pairs, edge_df

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0,
    max_size=60,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pairs=pairs_strategy)
@SET
def test_canonicalize_idempotent(spark, pairs):
    once = canonicalize(edge_df(spark, pairs))
    twice = canonicalize(once)
    assert canonical_pairs(once) == canonical_pairs(twice)
    for s, d in canonical_pairs(once):
        assert s < d


@given(pairs=pairs_strategy, shift=st.integers(1, 1000))
@SET
def test_triangle_count_relabel_invariant(spark, pairs, shift):
    g = canonicalize(edge_df(spark, pairs))
    relabeled = canonicalize(
        edge_df(spark, [(a + shift, b + shift) for a, b in pairs])
    )
    assert triangle_count(g) == triangle_count(relabeled)


@given(pairs=pairs_strategy)
@SET
def test_degree_sum_is_twice_edges(spark, pairs):
    g = canonicalize(edge_df(spark, pairs))
    m = g.count()
    total = sum(r["degree"] for r in degrees(g).collect())
    assert total == 2 * m


@pytest.mark.parametrize("seed", [0, 1])
def test_truss_monotone_in_k(spark, seed):
    from tests.conftest import gnp_graph

    g = canonicalize(gnp_graph(spark, n=40, p=0.25, seed=seed)).cache()
    prev = None
    for k in (3, 4, 5, 6):
        cur = set(canonical_pairs(k_truss(g, k).edges))
        if prev is not None:
            assert cur <= prev  # (k+1)-truss ⊆ k-truss
        prev = cur


@given(pairs=pairs_strategy, cut=st.integers(1, 9))
@SET
def test_delta_triangles_partition_invariant(spark, pairs, cut):
    """For ANY split of the edge set, base triangles + delta triangles
    == union triangles (counts), and delta equals the recount diff."""
    from linkgraph.graph.triangles import delta_triangles

    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    base = [p for p in canon if (p[0] * 7 + p[1]) % 10 < cut]
    delta = [p for p in canon if (p[0] * 7 + p[1]) % 10 >= cut]
    n_union = triangle_count(edge_df(spark, canon))
    n_base = triangle_count(edge_df(spark, base))
    n_delta = delta_triangles(
        edge_df(spark, base), edge_df(spark, delta)
    ).count()
    assert n_base + n_delta == n_union


@given(pairs=pairs_strategy, cut=st.integers(1, 9))
@SET
def test_incremental_components_partition_invariant(spark, pairs, cut):
    """Incremental CC over ANY split equals full CC on the union."""
    from linkgraph.graph.components import (
        connected_components,
        incremental_components,
    )

    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    base = [p for p in canon if (p[0] * 7 + p[1]) % 10 < cut]
    delta = [p for p in canon if (p[0] * 7 + p[1]) % 10 >= cut]
    if not canon:
        return
    full = {
        r["id"]: r["label"]
        for r in connected_components(edge_df(spark, canon)).collect()
    }
    if not delta:
        prev = connected_components(edge_df(spark, base))
        got = {r["id"]: r["label"] for r in prev.collect()}
    else:
        prev = connected_components(edge_df(spark, base))
        got = {
            r["id"]: r["label"]
            for r in incremental_components(
                prev, edge_df(spark, delta)
            ).collect()
        }
    assert got == full
