"""Impute pipeline: the ``impute_salary`` DAG (SURVEY.md §3.3).

Reference: two Postgres statements — CTAS ``GROUP BY job_id,
min(salary_min), max(salary_max)`` over the search-band memberships
(``sql/impute_salary_create_salary_table.sql:3-9``), then ``UPDATE ... FROM``
filling only NULL salary columns
(``sql/impute_salary_update_parsed_jobs_table.sql:1-7``) — both transactional
because Postgres is.

Engine: A1 aggregate + a transactional MERGE on the parsed table
(sources/txn.py). The merge is UPDATE-only (``when_not_matched_insert=False``
— exactly the reference's UPDATE…FROM), fills only NULL salary columns via
coalesce, and commits as one atomic snapshot swap: a crash mid-write leaves
the previous snapshot intact, unlike the old read-tmp-overwrite double-write
this replaces. A plain-Parquet parsed table is adopted in place
(metadata-only) on first touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scraping_jobsdb_spark.sources.txn import TxnTable, read_table_any

__all__ = ["impute_salary_table", "impute"]


def impute_salary_table(memberships: DataFrame) -> DataFrame:
    """A1: tightest salary interval implied by all band memberships."""
    return memberships.groupBy("job_id").agg(
        F.min("salary_min").alias("imp_min"),
        F.max("salary_max").alias("imp_max"),
    )


def impute(spark: SparkSession, raw_path: str, parsed_path: str) -> int:
    """Fill NULL min/max_salary in the parsed table from the imputed
    aggregate via one transactional MERGE. Returns the table's row count."""
    from scraping_jobsdb_spark.observability import get_logger, job_log

    with job_log(get_logger(), "impute", raw=raw_path, parsed=parsed_path) as rec:
        n = _impute(spark, raw_path, parsed_path)
        rec["table_rows"] = n
        return n


def _impute(spark: SparkSession, raw_path: str, parsed_path: str) -> int:
    memberships = read_table_any(spark, raw_path)
    imputed = impute_salary_table(memberships)
    parsed = TxnTable.ensure(spark, parsed_path)
    return parsed.merge(
        imputed,
        on=["job_id"],
        when_matched_update={
            "min_salary": F.coalesce(
                F.col("t.min_salary"), F.col("s.imp_min").cast("int")
            ),
            "max_salary": F.coalesce(
                F.col("t.max_salary"), F.col("s.imp_max").cast("int")
            ),
        },
        when_not_matched_insert=False,
    )
