"""Driver-testdata graph derivations (TPC-H-ish parquet -> edge tables).

The driver's correctness gate runs every ``__spark_entry__.queries()``
entry against a DuckDB oracle over the same parquet tables, so each
derivation here is deliberately expressible in plain ANSI SQL — the
DataFrame code below and the oracle strings in ``__spark_entry__`` are
the same relational algebra, written twice.

Graphs:
- **co-purchase** (dense): parts are vertices; an edge connects two
  parts that appear in the same order. ~116k edges / ~2k vertices /
  ~414k triangles at sf0.01 — the triangle/truss workload.
- **co-purchase sparse** (l_quantity >= 48 filter): ~431 edges, 246
  components at sf0.01 — the iterative workload (CC / PageRank / LPA)
  where the oracle side is a recursive CTE.
- **supply digraph**: distinct (l_suppkey -> l_partkey) directed edges —
  the reciprocal-pair and in/out-histogram workload (the reference's
  `bidirect` and `histo` modes, GraphMiningSpark.scala:110-173).

Scale notes: the pair expansion self-joins on l_orderkey; order groups
are tiny and near-uniform (max ~7 lineitems), so the join is skew-free
and the quadratic blowup is bounded by sum(group^2) ~ 6x input. At
100 TB the same derivation holds because the group key cardinality
(orders) grows with the data while group size stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def co_purchase_edges(
    spark: SparkSession, sf_dir: str, min_quantity: float | None = None
) -> DataFrame:
    """Canonical undirected part co-purchase edges (src < dst)."""
    li = load(spark, sf_dir, "lineitem")
    if min_quantity is not None:
        li = li.where(F.col("l_quantity") >= min_quantity)
    ps = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    return (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )


def co_purchase_edges_windowed(
    spark: SparkSession,
    sf_dir: str,
    min_quantity: float | None = None,
    fmt: str = "yyyy",
) -> DataFrame:
    """(win, src, dst): canonical co-purchase edges per order-date
    window (an order belongs to exactly one window, so the pair
    expansion never crosses windows). The same pair may recur across
    windows — that is the temporal signal."""
    li = load(spark, sf_dir, "lineitem")
    if min_quantity is not None:
        li = li.where(F.col("l_quantity") >= min_quantity)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.date_format("o_orderdate", fmt).alias("win"),
    )
    ps = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .join(orders, "ok")
    )
    a, b = ps.alias("a"), ps.alias("b")
    return (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(
            F.col("a.win").alias("win"),
            F.col("a.pk").alias("src"),
            F.col("b.pk").alias("dst"),
        )
        .distinct()
    )


def sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sparse co-purchase variant used by the iterative algorithms."""
    return co_purchase_edges(spark, sf_dir, min_quantity=48)


def supply_digraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed supplier -> part edges."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )


def directed_copurchase(spark: SparkSession, sf_dir: str, min_quantity: float = 46) -> DataFrame:
    """Deterministically DIRECTED co-purchase graph (SCC workload).

    Each undirected edge gets one direction by parity of the endpoint
    sum — an arbitrary but engine-independent rule that leaves plenty
    of directed cycles (397 mutual-reachability pairs at sf0.01), which
    the bipartite supply digraph cannot provide (it is a DAG).
    """
    und = co_purchase_edges(spark, sf_dir, min_quantity=min_quantity)
    even = (F.col("src") + F.col("dst")) % 2 == 0
    return und.select(
        F.when(even, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(even, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def weighted_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense co-purchase graph with weight = number of shared
    orders (the weighted shortest-path workload: one giant component)."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    return (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def sparse_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse co-purchase edges with weight = number of shared orders
    (the weighted-PageRank workload)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    ps = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    return (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
