"""Hub salting: two-phase aggregation and salted join correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph.edges import canonicalize, degrees
from linkgraph.graph.partitioning import (
    hub_vertices,
    salt_edges,
    salted_group_sizes,
    salted_join,
)
from tests.conftest import edge_df, star_graph


def _hub_graph(spark):
    """Star hub (vertex 0, degree 200) + a background path."""
    star = star_graph(spark, 200)
    path = edge_df(spark, [(1000 + i, 1001 + i) for i in range(50)])
    return canonicalize(star.unionByName(path))


def test_hub_detection(spark):
    g = _hub_graph(spark)
    hubs = hub_vertices(g, threshold=100)
    assert [r["id"] for r in hubs.collect()] == [0]


def test_salt_splits_hub_only(spark):
    g = _hub_graph(spark)
    hubs = hub_vertices(g, threshold=100)
    salted = salt_edges(g, hubs, n_salts=8, key="src")
    per_key = (
        salted.groupBy("src").agg(F.countDistinct("salt").alias("n")).collect()
    )
    by_id = {r["src"]: r["n"] for r in per_key}
    assert by_id[0] > 1           # hub adjacency split across salts
    assert all(n == 1 for k, n in by_id.items() if k != 0)  # others untouched
    # salt is deterministic: same edge -> same salt on recompute
    a = {(r["src"], r["dst"]): r["salt"] for r in salted.collect()}
    b = {(r["src"], r["dst"]): r["salt"] for r in salt_edges(g, hubs, 8).collect()}
    assert a == b


def test_two_phase_sizes_match_plain_degrees(spark):
    g = _hub_graph(spark)
    hubs = hub_vertices(g, threshold=100)
    two_phase = {
        r["src"]: r["degree"] for r in salted_group_sizes(g, hubs, 8).collect()
    }
    plain = {
        r["id"]: r["degree"]
        for r in degrees(g).join(
            g.select("src").distinct(), F.col("id") == F.col("src"), "left_semi"
        ).collect()
    }
    # per-src adjacency size == out-degree over the canonical table
    expect = {
        r["src"]: r["n"]
        for r in g.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert two_phase == expect
    assert plain  # sanity: degrees join produced rows


def test_salted_join_matches_plain_join(spark):
    g = _hub_graph(spark)
    hubs = hub_vertices(g, threshold=100)
    attrs = g.select(F.col("src").alias("id")).distinct().select(
        "id", (F.col("id") * 10).alias("attr")
    )
    plain = (
        g.join(attrs.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", "attr")
    )
    salted = salted_join(
        g, attrs.withColumnRenamed("id", "src"), "src", hubs.withColumnRenamed("id", "id"), 8
    ).select("src", "dst", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
