"""Exact deduplication: hash-groupBy on (normalized) content.

The canonical 100 TB shape: one sha/md5 per row computed in codegen, one
hash aggregation (map-side partial combine collapses duplicates before
the shuffle — the shuffle carries one row per distinct hash per map
task, not per input row), then either a group report or a keep-min
survivor join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col: str, normalize: bool):
    c = F.col(col)
    if normalize:
        c = F.lower(F.regexp_replace(c, r"\s+", " "))
        c = F.trim(c)
    return c


def exact_duplicate_groups(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """(content_hash, n_docs, min_id) for groups with > 1 member."""
    return (
        df.select(F.md5(_norm(col, normalize)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_id"))
        .where(F.col("n_docs") > 1)
    )


def deduplicate_against(
    df: DataFrame,
    reference: DataFrame,
    col: str = "text",
    ref_col: str | None = None,
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Drop rows whose (normalized) content appears anywhere in
    ``reference`` — exact-match cross-corpus decontamination (the
    train-vs-benchmark split; n-gram-level overlap lives in
    text/decontam.py).

    One anti-join on md5: the reference side collapses to distinct
    hashes first (map-side combine), so the probe carries one row per
    distinct benchmark content, never per benchmark row.
    """
    ref_hashes = reference.select(
        F.md5(_norm(ref_col or col, normalize)).alias("_h")
    ).distinct()
    hashed = df.withColumn("_h", F.md5(_norm(col, normalize)))
    return hashed.join(ref_hashes, "_h", "left_anti").drop("_h")


def deduplicate_exact(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """Keep exactly one survivor (min id) per distinct content.

    Survivor selection is a min-aggregate + semi join on (hash, id) —
    no window sort over the full table.
    """
    hashed = df.withColumn("_h", F.md5(_norm(col, normalize)))
    survivors = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return hashed.join(survivors, ["_h", id_col], "left_semi").drop("_h")
