"""Superstep checkpointing with per-partition lineage + counters.

Iterative DataFrame algorithms accumulate unbounded lineage across
driver-side ``while`` rounds — the reference's persist-only approach
(graph-mining-spark Truss.scala:48,73,137; its Flink side literally
wrote/re-read HDFS between binary-search probes,
graph-mining-flink MaximalTruss.scala:51-101). Here every superstep can
be materialized to a checkpoint table with a JSON manifest recording the
superstep number, row count, arbitrary algorithm counters, and the
per-partition file lineage (parquet part files + sizes), so any run is
resumable mid-iteration: ``latest()`` finds the last complete superstep
and ``load()`` restarts from it bit-identically.

Two modes:
- ``dir=None``  -> ``localCheckpoint`` only (fast, test/local mode; cuts
  lineage but is not resumable across processes).
- ``dir=path``  -> parquet + manifest per superstep (cluster mode; the
  parquet write is the shuffle barrier that cuts lineage).

When the session has an Iceberg catalog configured (see
``linkgraph.catalog``), pass ``catalog=iceberg_catalog(spark)`` and the
per-superstep data lands as an Iceberg table (atomic snapshot commit)
instead of a raw parquet directory; the JSON manifest is still written
as the resume/counters record.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


def _safe_name(name: str) -> str:
    return "".join(c if c.isalnum() or c == "_" else "_" for c in name)


@dataclass
class Checkpointer:
    """Checkpoint manager for one named iterative job."""

    spark: SparkSession
    dir: str | None = None
    job: str = "job"
    every: int = 1  # checkpoint every N supersteps (cluster cost knob)
    catalog: str | None = None  # Iceberg catalog name (linkgraph.catalog)
    history: list[dict] = field(default_factory=list)

    def _step_dir(self, step: int) -> str:
        assert self.dir is not None
        return os.path.join(self.dir, self.job, f"superstep={step:05d}")

    def save(
        self,
        df: DataFrame,
        step: int,
        counters: dict | None = None,
        eager: bool = True,
        bucket_cols: list[str] | None = None,
    ) -> DataFrame:
        """Materialize a superstep; returns the (lineage-cut) DataFrame.

        The manifest is written only after the parquet commit succeeds, so
        a manifest's presence == superstep complete (atomic resume point).

        ``eager=False`` (local mode only) defers materialization to the
        caller's next action, letting an algorithm fuse "checkpoint this
        superstep" and "compute this superstep's convergence metric" into
        ONE driver round-trip — at high parallelism the per-job fixed
        cost is what caps scaling efficiency of cheap supersteps.

        ``bucket_cols`` (dir mode only): write the superstep as an
        EXTERNAL BUCKETED TABLE (bucket count = shuffle partitions) and
        return its catalog scan, which advertises HashPartitioning on
        the bucket columns — the next superstep's join against this
        state is then exchange-free on the state side (PLANS.md's
        shuffle-mode gap: a plain parquet/localCheckpoint scan reports
        UnknownPartitioning and re-shuffles O(|V|) every round). The
        parquet files live under the superstep dir like any other
        checkpoint, so cross-session resume (where the in-memory catalog
        is gone) reads them directly — correctness never depends on the
        bucket metadata, only the exchange elimination does.
        """
        counters = dict(counters or {})
        if self.dir is None or (step % self.every) != 0:
            out = df.localCheckpoint(eager=eager)
            self.history.append({"superstep": step, "counters": counters, "mode": "local"})
            return out
        path = self._step_dir(step)
        if bucket_cols and not self.catalog:
            spark = self.spark
            n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
            name = f"lg_{_safe_name(self.job)}_s{step:05d}"
            data = os.path.join(path, "data")
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .bucketBy(n_buckets, *bucket_cols)
                .sortBy(*bucket_cols)
                .option("path", data)
                .saveAsTable(name)
            )
            out = spark.table(name)
            files = sorted(
                f for f in os.listdir(data) if f.endswith(".parquet")
            ) if os.path.isdir(data) else []
            manifest = {
                "job": self.job,
                "superstep": step,
                "ts": time.time(),
                "rows": out.count(),
                "counters": counters,
                "table": None,
                "bucket": {"cols": bucket_cols, "n": n_buckets, "name": name},
                "partitions": [
                    {"file": f, "bytes": os.path.getsize(os.path.join(data, f))}
                    for f in files
                ],
            }
            with open(os.path.join(path, MANIFEST), "w") as fh:
                json.dump(manifest, fh)
            self.history.append(manifest)
            return out
        if self.catalog:
            from linkgraph.catalog import read_table, write_table

            ident = write_table(
                df, f"{self.job}_superstep_{step:05d}", path, catalog=self.catalog
            )
            out = read_table(self.spark, ident)
            os.makedirs(path, exist_ok=True)
            files, data = [], ident
        else:
            data = os.path.join(path, "data")
            df.write.mode("overwrite").parquet(data)
            out = self.spark.read.parquet(data)
            files = sorted(
                f for f in os.listdir(data) if f.endswith(".parquet")
            ) if os.path.isdir(data) else []
        manifest = {
            "job": self.job,
            "superstep": step,
            "ts": time.time(),
            "rows": out.count(),
            "counters": counters,
            "table": data if self.catalog else None,
            "partitions": [
                {"file": f, "bytes": os.path.getsize(os.path.join(data, f))}
                for f in files
            ],
        }
        with open(os.path.join(path, MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        self.history.append(manifest)
        return out

    def latest(self) -> int | None:
        """Last superstep with a complete manifest, or None."""
        if self.dir is None:
            return None
        root = os.path.join(self.dir, self.job)
        if not os.path.isdir(root):
            return None
        steps = []
        for d in os.listdir(root):
            if d.startswith("superstep=") and os.path.exists(
                os.path.join(root, d, MANIFEST)
            ):
                steps.append(int(d.split("=")[1]))
        return max(steps) if steps else None

    def load(self, step: int) -> tuple[DataFrame, dict]:
        path = self._step_dir(step)
        with open(os.path.join(path, MANIFEST)) as fh:
            manifest = json.load(fh)
        if manifest.get("table"):
            from linkgraph.catalog import read_table

            return read_table(self.spark, manifest["table"]), manifest
        b = manifest.get("bucket")
        if b:
            # same-session resume: the catalog scan keeps the bucket
            # partitioning; cross-session the table is gone (in-memory
            # catalog) and the raw parquet read below is still correct.
            try:
                if self.spark.catalog.tableExists(b["name"]):
                    return self.spark.table(b["name"]), manifest
            except Exception:
                pass
        return self.spark.read.parquet(os.path.join(path, "data")), manifest
