"""Impute pipeline: the ``impute_salary`` DAG (SURVEY.md §3.3).

Reference: two Postgres statements — CTAS ``GROUP BY job_id,
min(salary_min), max(salary_max)`` over the search-band memberships
(``sql/impute_salary_create_salary_table.sql:3-9``), then ``UPDATE ... FROM``
filling only NULL salary columns
(``sql/impute_salary_update_parsed_jobs_table.sql:1-7``).

Engine: A1 aggregate + J2 coalesce-merge + atomic overwrite of the parsed
table. The aggregate output (one row per job) broadcasts into the merge when
small; the overwrite goes through a temp path + rename-style two-step because
Spark cannot read and overwrite the same parquet path in one job.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.merge import coalesce_merge

__all__ = ["impute_salary_table", "impute"]


def impute_salary_table(memberships: DataFrame) -> DataFrame:
    """A1: tightest salary interval implied by all band memberships."""
    return memberships.groupBy("job_id").agg(
        F.min("salary_min").alias("imp_min"),
        F.max("salary_max").alias("imp_max"),
    )


def impute(spark: SparkSession, raw_path: str, parsed_path: str) -> int:
    """Fill NULL min/max_salary in the parsed table from the imputed
    aggregate; rewrites the parsed table. Returns its row count."""
    memberships = spark.read.parquet(raw_path)
    parsed = spark.read.parquet(parsed_path)
    imputed = impute_salary_table(memberships)
    merged = coalesce_merge(
        parsed, imputed, ["job_id"], {"min_salary": "imp_min", "max_salary": "imp_max"}
    )
    # Break the read-write cycle: materialize, then overwrite atomically.
    tmp = parsed_path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(parsed_path)
    n = spark.read.parquet(parsed_path).count()
    shutil.rmtree(tmp, ignore_errors=True)
    return n
