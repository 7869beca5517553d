"""Export pipeline: the ``export_to_csv`` DAG (SURVEY.md §3, entry point 4).

Reference: Postgres ``COPY staging.parsed_jobs TO`` one CSV
(``airflow/dags/export_to_csv.py:12-26``). Engine: the CSV edge writer —
single file for the human-facing export, many-part for scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from scraping_jobsdb_spark.sources.tables import write_csv_export
from scraping_jobsdb_spark.sources.txn import read_table_any

__all__ = ["export"]


def export(spark: SparkSession, parsed_path: str, csv_path: str, single_file: bool = True) -> int:
    df = read_table_any(spark, parsed_path)
    # CSV cannot carry arrays: serialize job_functions with the reference's
    # semicolon convention (utils.py:97) at the edge only.
    out = df.withColumn("job_functions", F.array_join("job_functions", ";"))
    write_csv_export(out, csv_path, single_file=single_file)
    return df.count()
