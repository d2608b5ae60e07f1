"""Shared pytest fixtures: one local SparkSession, golden graphs.

Golden graphs are regenerated verbatim from the reference's bundled
fixtures (/root/reference/trussMini.txt, smallTwitter.txt — see
FIXTURES.md §1) so the suite never reads outside the repo.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.session import build_session

# trussMini.txt (27 directed lines, tab-separated) — FIXTURES.md §1.
TRUSS_MINI = [
    (1, 4), (1, 3), (1, 2), (2, 3), (4, 2), (3, 4), (5, 4), (4, 6), (5, 6),
    (6, 7), (9, 6), (10, 6), (7, 8), (7, 9), (7, 10), (8, 9), (8, 10),
    (10, 9), (1, 7), (1, 8), (2, 9), (3, 6), (3, 10), (4, 7), (4, 9),
    (5, 8), (5, 10),
]

# smallTwitter.txt (10 edges).
SMALL_TWITTER = [
    (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (4, 7), (5, 6),
    (5, 7), (6, 7),
]


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="linkgraph-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def edge_df(spark, pairs):
    """Directed edge DataFrame from python pairs (long, long)."""
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def canonical_pairs(df):
    """Collect a canonical edge DataFrame back to a sorted list of tuples."""
    return sorted((r["src"], r["dst"]) for r in df.collect())


@pytest.fixture(scope="session")
def truss_mini(spark):
    from linkgraph.graph.edges import canonicalize

    return canonicalize(edge_df(spark, TRUSS_MINI)).cache()


@pytest.fixture(scope="session")
def small_twitter(spark):
    from linkgraph.graph.edges import canonicalize

    return canonicalize(edge_df(spark, SMALL_TWITTER)).cache()


def complete_graph(spark, n):
    pairs = [(i, j) for i in range(1, n + 1) for j in range(i + 1, n + 1)]
    return edge_df(spark, pairs)


def path_graph(spark, n):
    return edge_df(spark, [(i, i + 1) for i in range(1, n)])


def star_graph(spark, n):
    return edge_df(spark, [(0, i) for i in range(1, n + 1)])


def gnp_graph(spark, n=200, p=0.05, seed=42):
    import random

    rng = random.Random(seed)
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < p
    ]
    return edge_df(spark, pairs)


def ring_of_cliques(spark, m, c):
    """m cliques of size c, consecutive cliques joined by one bridge edge."""
    pairs = []
    for k in range(m):
        base = k * c
        pairs += [(base + i, base + j) for i in range(c) for j in range(i + 1, c)]
    for k in range(m):
        pairs.append((k * c, ((k + 1) % m) * c))
    return edge_df(spark, pairs)
