"""Iceberg-aware table layer for corpus/checkpoint storage.

The north-star deployment stores the corpus and every superstep
checkpoint in an Iceberg catalog (snapshot isolation gives atomic
superstep commits; Iceberg's own manifests carry the per-file lineage).
This sandbox ships no ``iceberg-spark-runtime`` jar, so the layer
degrades explicitly:

- ``iceberg_catalog(spark)`` finds a configured Iceberg catalog
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``)
  AND verifies the class actually loads on the JVM — a configured name
  without the jar is reported as absent, not an error at write time.
- ``write_table`` / ``read_table`` route through ``df.writeTo`` (the
  DataFrameWriterV2 path Iceberg requires — atomic replace, hidden
  partitioning honored) when a catalog is present, else through plain
  parquet directories under ``warehouse_dir``.

``checkpoint.Checkpointer`` composes with this: its JSON manifest is the
resume/counters record either way; on the Iceberg path the table commit
itself is the atomic barrier, on the parquet path the manifest write is
(written only after the parquet commit succeeds).

Reference analogue: the reference's only storage layer is text files on
HDFS (graph-mining-spark GraphMiningSpark.scala:82,90; the Flink side
re-reads its own intermediates, graph-mining-flink MaximalTruss.scala:
63,74) — table-format storage is a north-star addition, not a port.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CATALOG_CLASSES = {
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
}


def has_iceberg_runtime(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 (py4j boundary)
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a usable configured Iceberg catalog, or None.

    Usable = a ``spark.sql.catalog.<name>`` conf points at an Iceberg
    catalog class AND the runtime jar is loadable. Returns the first
    such name (sorted for determinism).
    """
    # Launch-time SparkConf AND session runtime conf: catalogs set via
    # spark.conf.set / builder.config over an existing context are
    # invisible to getConf(), so scan both (ADVICE round 1).
    confs = dict(spark.sparkContext.getConf().getAll())
    try:
        confs.update(
            (r["key"], r["value"])
            for r in spark.sql("SET").collect()
            if r["key"].startswith("spark.sql.catalog.")
        )
    except Exception:
        pass
    names = sorted(
        k.split(".", 3)[3]
        for k, v in confs.items()
        if k.startswith("spark.sql.catalog.")
        and k.count(".") == 3
        and v in _ICEBERG_CATALOG_CLASSES
    )
    if not names or not has_iceberg_runtime(spark):
        return None
    return names[0]


def _safe_ident(name: str) -> str:
    return "".join(c if c.isalnum() or c == "_" else "_" for c in name)


def write_table(
    df: DataFrame,
    name: str,
    warehouse_dir: str,
    catalog: str | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` as table ``name``; returns the identifier/path to read back.

    Iceberg path: ``createOrReplace`` via DataFrameWriterV2 — one atomic
    snapshot commit, concurrent readers never see a partial table.
    Parquet path: directory overwrite under ``warehouse_dir`` (atomicity
    is then the caller's job — Checkpointer uses manifest-after-commit).
    """
    if catalog:
        ident = f"{catalog}.default.{_safe_ident(name)}"
        writer = df.writeTo(ident)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return ident
    path = os.path.join(warehouse_dir, _safe_ident(name))
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    """Read back what ``write_table`` returned (catalog ident or path)."""
    if "/" not in ident and "." in ident:
        return spark.read.table(ident)
    return spark.read.parquet(ident)
