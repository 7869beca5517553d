"""Sink/lake coverage: partitioned writer + pruning, binary lake reader,
idempotent append, CSV export round-trip (SURVEY.md §2.1 S3/S7/S8/S9, §2.4 A3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from scraping_jobsdb_spark.sources.lake import read_binary_lake
from scraping_jobsdb_spark.sources.tables import (
    load_table,
    write_csv_export,
    write_idempotent_append,
    write_partitioned,
)


def test_partitioned_write_and_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "lake")
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").alias("year"),
        F.month("o_orderdate").alias("month"),
        F.dayofmonth("o_orderdate").alias("day"),
    )
    write_partitioned(o, path)
    back = spark.read.parquet(path)
    assert back.count() == o.count()

    pruned = back.filter((F.col("year") == 1995) & (F.col("month") == 3))
    expect = o.filter((F.col("year") == 1995) & (F.col("month") == 3)).count()
    assert pruned.count() == expect
    # The filter must prune at planning time, not scan-and-filter.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "year" in plan.split("PartitionFilters", 1)[1][:200]


def test_binary_lake_reader_roundtrip(spark, tmp_path):
    payloads = {f"doc{i}.bin": bytes([i] * (i + 1)) for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = read_binary_lake(spark, str(tmp_path / "*.bin"))
    rows = {r.file_path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == payloads
    lengths = {r.file_path.rsplit("/", 1)[-1]: r.length for r in df.collect()}
    assert lengths == {k: len(v) for k, v in payloads.items()}


def test_idempotent_append_is_exactly_once_per_key(spark, tmp_path):
    path = str(tmp_path / "tbl")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    first = o.filter(F.col("o_orderkey") % 2 == 0)
    n1 = write_idempotent_append(first, path, ["o_orderkey"])
    assert n1 == first.count()
    # Re-deliver an overlapping batch: only the truly-new keys land.
    second = o.filter(F.col("o_orderkey") % 4 != 1)
    n2 = write_idempotent_append(second, path, ["o_orderkey"])
    got = spark.read.parquet(path)
    assert got.count() == n1 + n2
    assert got.select("o_orderkey").distinct().count() == got.count()
    union_keys = first.select("o_orderkey").union(second.select("o_orderkey"))
    assert got.count() == union_keys.distinct().count()


def test_csv_export_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_csv_export(o, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == o.count()
    assert back.columns == ["o_orderkey", "o_orderstatus", "o_totalprice"]
