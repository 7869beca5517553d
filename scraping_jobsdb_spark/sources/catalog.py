"""Table lifecycle / DDL surface (SURVEY.md §2.1 S10).

The reference manages tables with Postgres DDL shipped from Airflow:
``CREATE TABLE IF NOT EXISTS`` (``sql/scrape_url_create_raw_table.sql:1``),
per-combo temp tables created and dropped around COPY
(``sql/scrape_url_create_temp_table.sql:1-3``,
``sql/scrape_url_drop_temp_table.sql:1``), and CTAS
(``sql/impute_salary_create_salary_table.sql:1-3``). The engine maps these to
the Spark catalog: managed parquet tables via ``saveAsTable`` (CTAS),
``spark.sql`` DDL, and the catalog API for existence/drop — the temp-table
hop disappears entirely (frames are already addressable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["create_table_if_not_exists", "ctas", "drop_table_if_exists", "table_exists"]


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def create_table_if_not_exists(
    spark: SparkSession, name: str, schema: StructType, fmt: str = "parquet"
) -> None:
    """Empty managed table with an explicit schema (DDL-first, like the
    reference's CREATE TABLE IF NOT EXISTS)."""
    if not table_exists(spark, name):
        spark.createDataFrame([], schema).write.format(fmt).saveAsTable(name)


def ctas(spark: SparkSession, name: str, df: DataFrame, overwrite: bool = True) -> None:
    """CREATE TABLE AS SELECT (the reference's CTAS dedupe/impute steps)."""
    df.write.mode("overwrite" if overwrite else "errorifexists").saveAsTable(name)


def drop_table_if_exists(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
