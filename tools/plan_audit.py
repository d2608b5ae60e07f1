"""Regenerate the PLANS.md evidence: .explain("formatted") for the
headline operators at sf0.01.

Usage: PYTHONPATH=/root/repo python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from linkgraph import datasets
from linkgraph.graph.edges import degree_histogram
from linkgraph.graph.triangles import triangles
from linkgraph.session import build_session
from linkgraph.text.analysis import token_stats


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("=== A. co_purchase_edges (pushdown + pruning) ===")
    datasets.co_purchase_edges(spark, sf, min_quantity=40).explain("formatted")

    print("=== B. token_stats column pruning ===")
    token_stats(datasets.load(spark, sf, "documents")).select(
        "doc_id", "n_tokens_ws"
    ).explain("formatted")

    print("=== C. triangles (broadcast close, repartitioned explode) ===")
    triangles(datasets.co_purchase_edges(spark, sf)).explain("formatted")

    print("=== D. degree histogram (two-level partial agg) ===")
    degree_histogram(datasets.co_purchase_edges(spark, sf)).explain("formatted")

    print("=== E. PageRank superstep (zero-exchange broadcast mode) ===")
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    edges = datasets.co_purchase_edges(spark, sf)
    links = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    links = links.repartition("dst").persist(StorageLevel.MEMORY_AND_DISK)
    links.count()
    state = (
        links.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .select("id", F.lit(0.001).alias("rank"), "out_deg")
        .localCheckpoint(eager=True)
    )
    contribs = (
        links.join(F.broadcast(state), links["src"] == state["id"])
        .select("dst", (F.col("rank") / F.col("out_deg")).alias("w"))
        .groupBy("dst")
        .agg(F.sum("w").alias("contrib"))
    )
    new_state = state.join(
        F.broadcast(contribs), state["id"] == contribs["dst"], "left_outer"
    ).select("id", F.coalesce("contrib", F.lit(0.0)).alias("rank"), "out_deg")
    new_state.explain("formatted")
    links.unpersist()

    print("=== F. windowed triangles (window id inside every key) ===")
    from linkgraph.graph.temporal import windowed_triangle_counts

    ew = datasets.co_purchase_edges_windowed(spark, sf, min_quantity=40)
    windowed_triangle_counts(ew).explain("formatted")

    print("=== G. attribute assortativity (k^2-row tail after matrix ckpt) ===")
    from linkgraph.graph.mixing import attribute_assortativity

    attrs = datasets.load(spark, sf, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("attr")
    )
    attribute_assortativity(edges, attrs).explain("formatted")

    print("=== H. delta_triangles (wedge-broadcast close) ===")
    from linkgraph.graph.triangles import delta_triangles

    is_delta = F.pmod(F.col("src") * 31 + F.col("dst"), F.lit(10)) == 0
    delta_triangles(edges.where(~is_delta), edges.where(is_delta)).explain(
        "formatted"
    )

    print("=== I. approx_quantiles (bounded counter rows, no data sort) ===")
    from linkgraph.approx import approx_quantiles

    approx_quantiles(
        datasets.load(spark, sf, "documents"), "n_chars", [0.5], ["lang"]
    ).explain("formatted")

    spark.stop()


if __name__ == "__main__":
    main()
