"""SparkSession builder with the engine's required configuration.

The defaults mirror what the engine needs at cluster scale (AQE on,
skew-join splitting on, Arrow on for the pandas-UDF kernels) while being
tuned down for local[N] testing (shuffle partitions ~ cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession configured for the engine.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow batches across the JVM<->Python boundary: CSR adjacency
        # blocks cross as columnar batches, never per-row pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # AQE: runtime coalescing + skew-join splitting. The degree-ordered
        # triangle kernel bounds per-key work analytically, but joins over
        # power-law edge tables still benefit from runtime skew splits.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamps vs DuckDB oracles.
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative algorithms cut lineage with localCheckpoint; keep the
        # checkpoint dir configurable for cluster reliable checkpoints.
        .config("spark.checkpoint.compress", "true")
        .config("spark.ui.enabled", os.environ.get("LINKGRAPH_UI", "false"))
        # local[N] runs the whole "cluster" in the driver JVM: size its
        # heap like an executor's (32 concurrent tasks share the
        # execution-memory pool; 8g starves hash builds past ~10M-edge
        # inputs on this 128 GiB box).
        .config("spark.driver.memory", os.environ.get("LINKGRAPH_DRIVER_MEM", "24g"))
        # Bounded-by-design driver collects (blocked-bloom partial
        # bitmaps, per-partition partial sums) legitimately exceed the
        # 1g default at 1e8+-edge scale — enforced in cluster mode,
        # where the 148.6M-edge bloom build's 8 x 297 MB partials
        # killed every executor-mode rep until raised.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("LINKGRAPH_MAX_RESULT", "8g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
