"""Explicit partitioning + hub salting for power-law edge tables.

The north-star layout: edges hash-partitioned by source, with
high-degree hub vertices salted so no single task owns a hub's whole
adjacency. Where each technique actually matters in this engine:

- **Catalyst hash aggregates** (degrees, support counts, LPA votes)
  need NO salting: partial aggregation combines map-side, so a hub key
  contributes one row per map task to the shuffle, not one per edge.
- **Per-key kernels that materialize a whole group** (applyInPandas
  over groupBy, collect_list adjacency) DO need it: a hub's adjacency
  lands in one task. The triangle kernels dodge this analytically
  (degree ordering bounds every group at O(sqrt(2m))); kernels without
  such a bound — custom per-vertex pandas UDFs over raw adjacency —
  use `salt_edges` + a two-phase merge.
- **Joins against skewed keys** are handled by AQE skew-join splitting
  (on in `build_session`); `salted_join` is the manual fallback for
  plans AQE cannot rewrite (e.g. inside cached/checkpointed stages).

Reference context: the reference had nothing here — its groupByKey hub
buckets were its published scalability ceiling ("limited by
reshuffling", DBDA_Graph_Mining_Spark.pdf slide 20; 3200 s blowups at
k=5 in Benchmarks.xlsx) — this module is the fix the north star asks
for (SURVEY.md §4 "Skew handling").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_edges(edges: DataFrame, num_partitions: int) -> DataFrame:
    """Hash-partition the edge table by source vertex (the layout every
    per-source kernel and self-join in this engine expects)."""
    return edges.repartition(num_partitions, "src")


def hub_vertices(edges: DataFrame, threshold: int) -> DataFrame:
    """(id, degree) of vertices with degree >= threshold — one pass,
    partial-agg safe; broadcastable by construction (hubs are rare)."""
    from linkgraph.graph.edges import degrees

    return degrees(edges).where(F.col("degree") >= threshold)


def salt_edges(
    edges: DataFrame,
    hubs: DataFrame,
    n_salts: int = 16,
    key: str = "src",
) -> DataFrame:
    """Append a `salt` column: 0 for normal rows; hash(dst) % n_salts
    for rows whose `key` endpoint is a hub.

    Downstream per-key work groups by (key, salt) — a hub's adjacency
    splits across n_salts tasks — then merges the n_salts partial
    results per hub in a second, tiny aggregation (two-phase pattern).
    Deterministic (salt from dst hash, no RNG), so resumes and
    parallelism changes reproduce identical partitioning.
    """
    hub_ids = F.broadcast(hubs.select(F.col("id").alias(key), F.lit(True).alias("_hub")))
    other = "dst" if key == "src" else "src"
    return (
        edges.join(hub_ids, key, "left_outer")
        .withColumn(
            "salt",
            F.when(
                F.col("_hub").isNotNull(),
                F.pmod(F.xxhash64(F.col(other)), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hub")
    )


def salted_group_sizes(
    edges: DataFrame, hubs: DataFrame, n_salts: int = 16, key: str = "src"
) -> DataFrame:
    """Per-key adjacency sizes via the two-phase salted aggregation:
    phase 1 groups by (key, salt) — bounded groups — phase 2 merges the
    per-salt partials. The demonstration kernel for the pattern; any
    per-group pandas kernel slots into phase 1 the same way."""
    phase1 = (
        salt_edges(edges, hubs, n_salts, key)
        .groupBy(key, "salt")
        .agg(F.count(F.lit(1)).alias("partial"))
    )
    return phase1.groupBy(key).agg(F.sum("partial").alias("degree"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hubs: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with manual skew salting: hub rows on the left
    get a random-ish (deterministic) salt; the right side is replicated
    n_salts times for hub keys only. Non-hub keys join 1:1 on salt 0.
    """
    hub_ids = F.broadcast(hubs.select(F.col("id").alias(on), F.lit(True).alias("_hub")))
    # deterministic salt from the full row (not monotonically_increasing_id,
    # which varies across task retries and would break resume parity)
    row_hash = F.xxhash64(*[F.col(c) for c in left.columns])
    l = (
        left.join(hub_ids, on, "left_outer")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hub").isNotNull(),
                F.pmod(row_hash, F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hub")
    )
    salts = F.when(
        F.col("_hub").isNotNull(),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    r = (
        right.join(hub_ids, on, "left_outer")
        .withColumn("_salt", F.explode(salts))
        .drop("_hub")
    )
    return l.join(r, [on, "_salt"]).drop("_salt")


def broadcast_state_ok(spark, n_rows: int, limit: int) -> bool:
    """Should an iterative algorithm broadcast its per-vertex state into
    the superstep join (zero-exchange plan) instead of co-partitioning?

    Size is necessary but not sufficient: rebuilding a broadcast
    relation every superstep costs a driver collect plus one hash-map
    build PER EXECUTOR, so the per-superstep fixed cost grows linearly
    with cluster size while the shuffle plan's cost stays constant
    (measured on this box: 4-executor local-cluster PageRank was 2.7x
    SLOWER broadcast than shuffled, while single-JVM local[32] is ~3x
    FASTER broadcast). Policy: broadcast only when the state fits AND
    the master is single-JVM local[*]; multi-executor masters
    (local-cluster/standalone/yarn/k8s) co-partition instead.
    Override with LINKGRAPH_STATE_BROADCAST=always|never.
    """
    import os

    mode = os.environ.get("LINKGRAPH_STATE_BROADCAST", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    master = spark.sparkContext.master or ""
    single_jvm = master == "local" or master.startswith("local[")
    return n_rows <= limit and single_jvm
