"""Explicit schemas for every table the engine owns (SURVEY.md §1).

The reference declares these via Postgres DDL (``airflow/dags/sql/*.sql``);
the engine declares them as StructTypes — schema-first, never inferred.
Differences from the reference are deliberate fixes:

- ``parsed_jobs.job_functions`` is a real ``array<string>`` instead of a
  comma→semicolon string (``utils.py:97``).
- Missing values are typed NULLs, not empty strings (``utils.py:44-47``).
- The lake is a parquet table of (job_id, html, year, month, day) rather than
  one HTML file per row — splittable, partition-pruned, no per-row ``open()``
  inside a UDF (``utils.py:29-30``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# raw.raw_scraped_url (sql/scrape_url_create_raw_table.sql:1-12): one row =
# "job J appeared in a search for keyword K in salary band [lo,hi] on date D"
RAW_SCRAPED_URL = StructType(
    [
        StructField("keyword", StringType(), False),
        StructField("job_id", StringType(), False),
        StructField("salary_min", IntegerType(), True),
        StructField("salary_max", IntegerType(), True),
        StructField("scrape_date", DateType(), False),
        StructField("url", StringType(), True),
    ]
)

# raw.scraped_job (sql/scrape_url_create_scraped_job_table.sql:1-8): the
# scrape catalog / work queue; html_present=false ≈ "file_path IS NULL"
SCRAPE_CATALOG = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("scraped_date", DateType(), True),
        StructField("html_present", StringType(), True),
    ]
)

# staging.parsed_jobs (sql/parse_html_in_spark_create_parsed_job_table.sql)
PARSED_JOBS = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("job_title", StringType(), True),
        StructField("company_name", StringType(), True),
        StructField("job_description", StringType(), True),
        StructField("location", StringType(), True),
        StructField("official_post_date", DateType(), True),
        StructField("min_official_salary", IntegerType(), True),
        StructField("max_official_salary", IntegerType(), True),
        StructField("career_level", StringType(), True),
        StructField("qualification", StringType(), True),
        StructField("job_type", StringType(), True),
        StructField("job_functions", ArrayType(StringType()), True),
        StructField("industry", StringType(), True),
        StructField("min_salary", IntegerType(), True),
        StructField("max_salary", IntegerType(), True),
    ]
)

# staging.imputed_salary (sql/impute_salary_create_salary_table.sql:3-9)
IMPUTED_SALARY = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("min_salary", IntegerType(), True),
        StructField("max_salary", IntegerType(), True),
    ]
)

# The date-partitioned HTML lake (scrape_url.py:101-116 as a columnar table)
LAKE_DOCUMENT = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("html", StringType(), True),
        StructField("scraped_date", DateType(), True),
        StructField("year", IntegerType(), True),
        StructField("month", IntegerType(), True),
        StructField("day", IntegerType(), True),
    ]
)
