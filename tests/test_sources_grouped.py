"""Tests for lake/catalog/CSV sources and the applyInPandas grouped op."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from tests.conftest import SF_SMOKE

from scraping_jobsdb_spark.operators.grouped import group_zscore
from scraping_jobsdb_spark.sources.catalog import (
    create_table_if_not_exists,
    ctas,
    drop_table_if_exists,
    table_exists,
)
from scraping_jobsdb_spark.sources.lake import join_lake_to_metadata, read_text_lake
from scraping_jobsdb_spark.sources.tables import load_table, read_csv_table


def test_text_lake_reader_and_j4_join(spark, tmp_path):
    lake_dir = tmp_path / "lake"
    lake_dir.mkdir()
    for i in range(5):
        (lake_dir / f"doc{i}.html").write_text(f"<html>doc {i}</html>")
    lake = read_text_lake(spark, str(lake_dir))
    assert lake.count() == 5
    meta = lake.select("file_path").withColumn(
        "doc_no", F.regexp_extract("file_path", r"doc(\d+)\.html$", 1).cast("int")
    )
    joined = join_lake_to_metadata(lake, meta)
    rows = {r.doc_no: r.content for r in joined.collect()}
    assert rows[3] == "<html>doc 3</html>"


def test_csv_source_with_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("k,v\na,1\nb,2\n")
    schema = StructType(
        [StructField("k", StringType()), StructField("v", IntegerType())]
    )
    df = read_csv_table(spark, str(p), schema)
    assert df.schema == schema
    assert {(r.k, r.v) for r in df.collect()} == {("a", 1), ("b", 2)}


def test_catalog_lifecycle(spark):
    name = "sjs_test_table"
    drop_table_if_exists(spark, name)
    assert not table_exists(spark, name)
    schema = StructType([StructField("x", IntegerType())])
    create_table_if_not_exists(spark, name, schema)
    assert table_exists(spark, name)
    create_table_if_not_exists(spark, name, schema)  # idempotent
    ctas(spark, name, spark.createDataFrame([(1,), (2,)], schema))
    assert spark.table(name).count() == 2
    drop_table_if_exists(spark, name)
    assert not table_exists(spark, name)


def test_group_zscore_matches_window_form(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_id: r.zscore for r in group_zscore(ev).collect()}
    # window-function equivalent (population std)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    expect_df = ev.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w))
            / F.stddev_pop("value").over(w)
        ).alias("z"),
    )
    expect = {r.event_id: r.z for r in expect_df.collect()}
    assert set(got) == set(expect)
    worst = max(abs(got[k] - (expect[k] or 0.0)) for k in expect)
    assert worst < 1e-9, worst
    # z-scores are standardized: per-user mean ~0
    means = (
        group_zscore(ev)
        .groupBy("user_id")
        .agg(F.avg("zscore").alias("m"))
        .collect()
    )
    assert all(abs(r.m) < 1e-9 for r in means)
