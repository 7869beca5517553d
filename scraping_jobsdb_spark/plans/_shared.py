"""Query-registry machinery shared by the per-family chunk modules.

Split out of plans/queries.py (r7 verdict item 8). The inventory itself
lives in the plans.q_* modules; plans/queries.py imports them in
registration order and applies the gate-window reordering.

Every operator claimed in SURVEY.md §2 is represented here as a pair:

- a Spark implementation ``(spark, sf_dir) -> DataFrame`` built from the
  engine's operator/function library, and
- an equivalent ANSI-SQL oracle string executed by DuckDB over the same
  parquet tables (``None`` only for genuinely non-SQL-expressible ops, which
  the driver then checks rows-only).

Determinism contract (what makes hash-comparison sound):
- Aggregates over doubles are computed in DECIMAL (cast each value before
  SUM) so the result is exact and independent of partial-aggregation order,
  then cast back to DOUBLE so both engines agree on the output type. MIN/MAX/
  COUNT need no such treatment (order-independent already).
- Every dedup/top-k picks rows under an explicit total order (row_number over
  a unique key) — never ``dropDuplicates`` / arbitrary DISTINCT ON.
- Every computed column is aliased identically in both implementations (the
  driver sorts columns by name before hashing).
- No floating-point comparisons as selection predicates near ties; tie-breaks
  always include a unique key column.

Reference capabilities covered (SURVEY.md §2 row ids in each docstring):
scans S5/S9, projections P1-P7, joins J1-J4, aggregates A1-A6, window/sort/
limit/set ops (§2.5), scalar functions F1-F16 (§2.6), plus the LLM-pipeline
extensions (exact/near dedup, embedding similarity, text analysis) and
event-time windows (§2.7).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.dedup import dedup_exact, dedup_first
from scraping_jobsdb_spark.operators.incremental import new_rows
from scraping_jobsdb_spark.operators.merge import coalesce_merge
from scraping_jobsdb_spark.sources.tables import fan_out, load_table

__all__ = ["Query", "REGISTRY", "queries", "oracle_sql", "_register",
           "_dsum", "_dsum_sql"]


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, Query] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # A silent overwrite would REPLACE an already-evidenced query with
        # a different implementation under the same gate name (nearly
        # happened in r10: a second "decontamination_ngram_overlap"
        # registered in another family chunk) — duplicate names are a
        # hard error, not a merge.
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} already registered"
            )
        REGISTRY[name] = Query(name, fn.__doc__ or "", fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


# Decimal-exact sum of a double column: cast each value first so the sum is
# order-independent, return DOUBLE. (See module docstring.)
def _dsum(col, scale: int = 4):
    return F.sum(F.col(col).cast(f"decimal(30,{scale})")).cast("double")


def _dsum_sql(col: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(30,{scale}))) AS DOUBLE)"


