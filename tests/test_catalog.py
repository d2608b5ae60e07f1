"""Iceberg-aware table layer: detection gate + parquet fallback."""

from __future__ import annotations

from linkgraph.catalog import (
    has_iceberg_runtime,
    iceberg_catalog,
    read_table,
    write_table,
)


def test_no_iceberg_runtime_in_sandbox(spark):
    # This container ships no iceberg-spark-runtime jar; the gate must
    # report that, not fail at write time.
    assert has_iceberg_runtime(spark) is False
    assert iceberg_catalog(spark) is None


def test_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id % 7 AS grp")
    ident = write_table(df, "t round:trip", str(tmp_path), catalog=None)
    assert "/" in ident and "t_round_trip" in ident
    back = read_table(spark, ident)
    assert back.count() == 100
    assert sorted(back.columns) == ["grp", "id"]


def test_partitioned_fallback(spark, tmp_path):
    df = spark.range(50).selectExpr("id", "cast(id % 3 as int) AS p")
    ident = write_table(df, "parted", str(tmp_path), partition_by=["p"])
    back = read_table(spark, ident)
    assert back.count() == 50
    # partition column survives the round trip with its values
    assert back.where("p = 1").count() == 17 or back.where("p = 1").count() == 16
