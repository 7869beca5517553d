"""Differential oracle: every registered query, Spark vs DuckDB.

Mirrors the driver's t2 gate (BASELINE.md): same parquet tables, compare
row count + column names + order-insensitive values. Values are normalized
(dates/timestamps → ISO strings, floats → repr of the exact double) and the
multisets of rows compared, so any mismatch the driver would flag fails here
first.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime

import pytest

from tests.conftest import SF_CORRECT, register_duck_views

from scraping_jobsdb_spark.plans.queries import REGISTRY


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact double identity — the determinism contract says results must
        # match bit-for-bit after decimal-exact aggregation
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_CORRECT)

    # Driver-canonicalizer safety: the round gate sorts the pandas frame by
    # EVERY column before hashing, and list/dict cells are unhashable — an
    # array/map/struct output column crashes the gate and the query gets NO
    # evidence at all (the r9 `unigram_corpus_tokenize` red row). Queries
    # must scalarize complex columns (e.g. F.array_join of a token head).
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would crash "
        "the driver's canonicalizer — scalarize them (array_join/to_json)"
    )

    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return

    register_duck_views(duck, SF_CORRECT)
    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_ms = _rows_to_multiset(spark_cols, spark_rows)
    d_ms = _rows_to_multiset(duck_cols, duck_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={only_s} duck-only={only_d}"
        )


def test_spark4_sql_udf_and_pipe_syntax_surfaces(spark):
    """Spark 4 SQL-language surfaces beyond the registered queries: SQL
    scalar UDFs (CREATE FUNCTION ... RETURN, catalyst-inlined — no Python
    boundary) and pipe-syntax queries (|>) both compute exactly what their
    classic-SQL rewrites compute."""
    from scraping_jobsdb_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sjs_clamp01(x DOUBLE) "
        "RETURNS DOUBLE RETURN greatest(0.0d, least(1.0d, x))"
    )
    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView(
        "sjs_udf_events"
    )
    via_udf = spark.sql(
        "SELECT event_id, sjs_clamp01(value / 100.0) AS v FROM sjs_udf_events"
    )
    inlined = spark.sql(
        "SELECT event_id, greatest(0.0d, least(1.0d, value / 100.0)) AS v "
        "FROM sjs_udf_events"
    )
    assert sorted(map(tuple, via_udf.collect())) == sorted(
        map(tuple, inlined.collect())
    )
    # the SQL UDF inlines into the plan: no Python eval stage appears
    plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    piped = spark.sql(
        "FROM sjs_udf_events |> WHERE event_type = 'click' "
        "|> AGGREGATE count(*) AS n, sum(user_id) AS su GROUP BY user_id "
        "|> WHERE n > 1"
    )
    classic = spark.sql(
        "SELECT user_id, count(*) AS n, sum(user_id) AS su "
        "FROM sjs_udf_events WHERE event_type = 'click' "
        "GROUP BY user_id HAVING count(*) > 1"
    )
    got = sorted(map(tuple, piped.select("user_id", "n", "su").collect()))
    want = sorted(map(tuple, classic.collect()))
    assert got == want and len(got) > 0
