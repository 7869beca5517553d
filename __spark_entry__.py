"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``scraping_jobsdb_spark.plans.queries``; this
module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from scraping_jobsdb_spark.plans.queries import (  # noqa: E402
    REGISTRY as _REGISTRY,
    oracle_sql as _oracle_sql,
    queries as _queries,
)

# Pandas-UDF closures are cloudpickled *by reference* to their defining
# module, so Python workers must be able to ``import scraping_jobsdb_spark``
# themselves — ``sys.path.insert`` above only fixes the driver process.
# ``ship_package`` addPyFiles a package zip, the standard cluster deploy
# story (``spark-submit --py-files``), identical in local mode.
from scraping_jobsdb_spark.session import ship_package as _ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (salary-imputation analog: A1 aggregate + J2 merge) on
    /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return _REGISTRY["impute_interval_merge"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in _queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only for
    non-SQL-expressible ops → rows-only check)."""
    return _oracle_sql()
