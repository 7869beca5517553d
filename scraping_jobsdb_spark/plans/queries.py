"""The engine's declared query inventory.

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

__all__ = ["Query", "REGISTRY", "queries", "oracle_sql"]


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, Query] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
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


# ---------------------------------------------------------------------------
# Flagship: the reference's core analytic (salary imputation), §3.3
# ---------------------------------------------------------------------------


@_register(
    "impute_interval_merge",
    oracle=f"""
    WITH imputed AS (
        SELECT l_orderkey AS o_orderkey,
               MIN(l_extendedprice) AS imp_min,
               MAX(l_extendedprice) AS imp_max
        FROM lineitem GROUP BY l_orderkey
    ), target AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS min_price,
               CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_totalprice END AS max_price
        FROM orders
    )
    SELECT t.o_orderkey, t.o_custkey,
           COALESCE(t.min_price, i.imp_min) AS min_price,
           COALESCE(t.max_price, i.imp_max) AS max_price
    FROM target t LEFT JOIN imputed i ON t.o_orderkey = i.o_orderkey
    """,
)
def q_impute_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + J2 (flagship): interval-union aggregate merged into a fact table.

    Reference: ``sql/impute_salary_create_salary_table.sql:3-9`` (GROUP BY
    min/max over overlapping search-band memberships) +
    ``sql/impute_salary_update_parsed_jobs_table.sql:1-7`` (fill-if-null
    UPDATE ... FROM). Here lineitem plays raw memberships, orders plays
    parsed_jobs with synthetically-NULLed targets.

    Scale: partial+final hash agg on l_orderkey; the aggregated side is one
    row per key → AQE broadcasts it into the merge join when small.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    imputed = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_extendedprice").alias("imp_min"),
        F.max("l_extendedprice").alias("imp_max"),
    )
    target = orders.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("min_price"),
        F.when(F.col("o_orderkey") % 4 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("max_price"),
    )
    return coalesce_merge(
        target, imputed, ["o_orderkey"], {"min_price": "imp_min", "max_price": "imp_max"}
    )


# ---------------------------------------------------------------------------
# Aggregations (§2.4)
# ---------------------------------------------------------------------------


@_register(
    "groupby_min_max",
    oracle="""
    SELECT l_orderkey AS order_key,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_groupby_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the bare group-by min/max aggregate (salary imputation core),
    ``sql/impute_salary_create_salary_table.sql:3-9``. Hash aggregate with
    map-side partial combine — the shuffle carries one row per key."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("order_key"))
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the engine's headline scan+agg
    (exercises predicate pushdown, partial aggregation, decimal-exact sums).
    Covers the aggregate family the reference delegates to Postgres
    (SURVEY.md §2.4 closing note)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast("decimal(30,4)")).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "dedup_distinct_on",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
    FROM (
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_dedup_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: deterministic DISTINCT ON — one row per key under a total order.
    Reference: ``sql/scrape_url_dedupe_jobs.sql:3-8`` (Postgres DISTINCT ON
    picks an arbitrary row; the engine's row_number form is reproducible)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"
        ),
        cols=["l_orderkey"],
    )
    # (l_orderkey, l_linenumber) is NOT unique in the testdata; a total order
    # over all output columns makes the kept row well-defined.
    return dedup_first(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey", "l_quantity"]
    )


@_register(
    "upsert_new_keys",
    oracle="""
    SELECT i.o_orderkey, i.o_custkey, i.o_totalprice
    FROM orders i
    WHERE i.o_orderkey % 5 = 0
      AND NOT EXISTS (
        SELECT 1 FROM orders e WHERE e.o_orderkey % 10 = 0
          AND e.o_orderkey = i.o_orderkey
      )
    """,
)
def q_upsert_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: insert-if-absent — the rows an idempotent append would write.
    Reference: ``sql/scrape_url_insert_data.sql:1-4`` (ON CONFLICT DO
    NOTHING keyed on the composite UNIQUE constraint). Incoming = keys %5,
    existing = keys %10; result = incoming anti existing."""
    orders = load_table(spark, sf_dir, "orders")
    incoming = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    existing = orders.filter(F.col("o_orderkey") % 10 == 0)
    return new_rows(incoming, existing, ["o_orderkey"])


@_register(
    "dq_aggregate_checks",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
           strftime(CAST(MIN(o_orderdate) AS DATE), '%Y-%m-%d') AS min_date,
           strftime(CAST(MAX(o_orderdate) AS DATE), '%Y-%m-%d') AS max_date,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_custkeys
    FROM orders
    """,
)
def q_dq_aggregate_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the sanity-check aggregates as one pass — uniqueness, bounds,
    null-count. Reference: ``airflow/dags/scrape_url.py:424-436``
    (SQLColumnCheckOperator on job_id/scraped_date/file_path)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
        # dates emitted as ISO strings: the cross-engine lowest common
        # denominator (DuckDB DATE surfaces as datetime64 in pandas)
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
        F.sum(F.col("o_custkey").isNull().cast("int")).cast("bigint").alias(
            "null_custkeys"
        ),
    )


@_register(
    "count_distinct_pagination",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(CEIL(COUNT(*) / 30.0) AS BIGINT) AS n_pages
    FROM events GROUP BY event_type
    """,
)
def q_count_distinct_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + F5: count / distinct-count plus the ceil-division pagination rule
    (pages = ceil(total/30), ``scrape_url.py:216-219``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.ceil(F.count(F.lit(1)) / 30.0).alias("n_pages"),
    )


# ---------------------------------------------------------------------------
# Projections / filters (§2.2)
# ---------------------------------------------------------------------------


@_register(
    "project_select",
    oracle="SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders",
)
def q_project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P7: narrow projection + rename + cast. Reference:
    ``ParseHtml.py:24`` (3-column SELECT) and ``ParseHtml.py:65-71`` (casts).
    The date lands as its ISO string on BOTH sides — the portable date
    representation (a bare DATE reaches pandas as datetime.date objects
    from Spark but datetime64 from other engines, so its stringified
    hash is comparator-dependent; the ISO string never is).
    Catalyst prunes the scan to exactly these columns (check ReadSchema)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@_register(
    "work_queue_isnull",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def q_work_queue_isnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: the IS NULL work-queue filter (``scrape_url.py:274``:
    ``WHERE file_path IS NULL`` selects unfetched jobs). The testdata has no
    natural NULLs, so NULLIF manufactures them deterministically."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_orderstatus").filter(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull()
    )


@_register(
    "anti_join_not_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/J3: NOT IN over a non-null key ≡ left-anti join. Reference:
    ``ParseHtml.py:26-30`` (exclude already-parsed job_ids). Catalyst plans a
    broadcast anti when the processed key set is small."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return new_rows(
        customer.select("c_custkey", "c_name"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
    )


# ---------------------------------------------------------------------------
# Joins (§2.3)
# ---------------------------------------------------------------------------


@_register(
    "join_dims_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
)
def q_join_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family inner joins through a dimension chain, with the small sides
    explicitly broadcast (no shuffle of the fact side). The filter on region
    is pushed below the joins by Catalyst."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@_register(
    "join_left_outer_agg",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (left-outer form): customers with their order counts, keeping
    order-less customers (COUNT of a null column = 0). Reference idiom:
    ``sql/scrape_url_create_scraped_job_table.sql:10-15``."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("order_cnt"))
    )


@_register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one finished order.
    Declared per SURVEY.md §2.3 note — semi/anti back the reference's
    incremental idioms."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# Windows / sort / limit / set ops (§2.5)
# ---------------------------------------------------------------------------


@_register(
    "window_rank_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_rank_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 ranking + navigation windows: order sequence per customer with
    prev/next price. The reference's 'latest scrape wins' overwrite
    (``scrape_url.py:301-303``) is this window family. Order key
    (o_orderdate, o_orderkey) is total → deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@_register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 aggregate-over-frame: per-customer running spend. Decimal-exact
    so the frame accumulation order can't produce float drift."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@_register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 top-k: orderBy + limit; Spark plans TakeOrderedAndProject (per-
    partition top-k then a k-row merge on the driver — no global sort/shuffle
    of the full table at any scale). Tie-break on the unique key keeps the
    selected set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@_register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer WHERE c_nationkey = 1
    UNION ALL
    SELECT s_suppkey, 'supplier' FROM supplier WHERE s_nationkey = 1
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 set ops (union): the reference unions per-combo temp tables by
    repeated INSERT (``sql/scrape_url_insert_data.sql`` × 88 combos); the
    engine form is unionByName — no shuffle, partitions concatenate."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.filter(F.col("c_nationkey") == 1)
        .select(F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("kind"))
        .unionByName(
            s.filter(F.col("s_nationkey") == 1).select(
                F.col("s_suppkey").alias("entity_key"), F.lit("supplier").alias("kind")
            )
        )
    )


@_register(
    "set_intersect_except",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_acctbal > 0
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    (SELECT c_custkey FROM customer WHERE c_acctbal > 0
     EXCEPT ALL
     SELECT o_custkey FROM orders)
    """,
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 set ops (intersect distinct + except-all) in one plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    all_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    return pos.intersect(finished).unionByName(pos.exceptAll(all_orders))


@_register(
    "rollup_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 grouping sets: ROLLUP over (status, priority) with decimal-exact
    totals — subtotal and grand-total rows carry NULL group keys identically
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_spend"),
    )


@_register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 grouping sets: full CUBE over two low-cardinality dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: document dedup / text analysis (north-star extensions)
# ---------------------------------------------------------------------------


@_register(
    "doc_exact_dedup",
    oracle="""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM all_docs
    ) WHERE rn = 1
    """,
)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup by md5 digest, keep lowest id (LLM-pipeline dedup
    baseline). Duplicates are manufactured deterministically (every 5th doc
    re-appended with a shifted id) since the corpus has none. One shuffle on
    the uniform 128-bit digest — skew-free by construction."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return dedup_exact(docs.unionByName(dupes), ["text"], "doc_id").select("doc_id")


@_register(
    "doc_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           length(regexp_replace(trim(text), '\\s', '', 'g'))
               / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> lower(x) IN ('the','a','an','of','and','or','is','to','in')))
               / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio
    FROM documents
    """,
)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text statistics (token count, char count, avg token length, stopword
    ratio) — the quality-filter raw features, all JVM-side array ops (north-
    star text analysis). Ratios are single int/int divisions → bit-identical
    across engines."""
    from scraping_jobsdb_spark.operators.textops import token_count, tokens

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = tokens("text")
    stop = F.size(
        F.filter(
            t,
            lambda x: F.lower(x).isin(
                "the", "a", "an", "of", "and", "or", "is", "to", "in"
            ),
        )
    )
    return docs.select(
        "doc_id",
        token_count("text").cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        (
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s", ""))
            / F.size(t)
        ).alias("avg_token_len"),
        (stop / F.size(t)).alias("stop_ratio"),
    )


@_register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercased
    text — the canonical near-layout dedup key (north-star text analysis)."""
    from scraping_jobsdb_spark.operators.textops import fingerprint

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@_register(
    "doc_lang_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t, text
        FROM documents
    )
    SELECT doc_id, lang,
        CASE
          WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
          WHEN len(list_filter(t, x -> lower(x) IN ('the','a','of','and','is')))
                 >= len(list_filter(t, x -> lower(x) IN ('der','und','die','ist','das')))
           AND len(list_filter(t, x -> lower(x) IN ('the','a','of','and','is')))
                 >= len(list_filter(t, x -> lower(x) IN ('el','la','de','es','los')))
           AND len(list_filter(t, x -> lower(x) IN ('the','a','of','and','is'))) > 0
            THEN 'en'
          WHEN len(list_filter(t, x -> lower(x) IN ('der','und','die','ist','das')))
                 >= len(list_filter(t, x -> lower(x) IN ('el','la','de','es','los')))
           AND len(list_filter(t, x -> lower(x) IN ('der','und','die','ist','das'))) > 0
            THEN 'de'
          WHEN len(list_filter(t, x -> lower(x) IN ('el','la','de','es','los'))) > 0
            THEN 'es'
          ELSE 'unknown'
        END AS lang_pred,
        0.4 * (CASE WHEN len(t) >= 10 AND len(t) <= 100000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CASE WHEN len(list_filter(t, x -> lower(x) IN
                        ('the','a','an','of','and','or','is','to','in'))) / len(t)
                        BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text))
          AS quality
    FROM toks
    """,
)
def q_doc_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word counts, CJK short-circuit) +
    composite quality score (length band, stopword band, alphabetic purity) —
    the north-star quality-filter pair, entirely built-in expressions."""
    from scraping_jobsdb_spark.operators.textops import lang_guess, quality_score

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "lang",
        lang_guess("text").alias("lang_pred"),
        quality_score("text").alias("quality"),
    )


@_register(
    "doc_ngram_jaccard",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.toks, b.toks))
             / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
)
def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity (n=1 token sets) between consecutive doc
    pairs — the verification predicate of the near-dup family. Single
    int/int division → exact. At scale the pair source is LSH candidates
    (see minhash_neardup_pairs), not a quadratic self-join."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks")
    )
    a = t.alias("a")
    b = t.select(
        (F.col("doc_id") - 1).alias("join_id"),
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
    ).alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.join_id"))
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("toks_b")))
    union = F.size(F.array_distinct(F.concat(F.col("a.toks"), F.col("toks_b"))))
    return joined.select(
        F.col("a.doc_id").alias("id_a"),
        "id_b",
        (inter / union).alias("jaccard"),
    )


@_register("minhash_neardup_pairs", oracle=None)
def q_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs over documents with
    deterministically-injected near-dups (every 10th doc re-appended with its
    last word dropped). Non-SQL-expressible (seeded xxhash64 permutations) →
    rows-only check; pair quality is asserted in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import minhash_candidate_pairs

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return minhash_candidate_pairs(
        docs.unionByName(near), "doc_id", "text", k=32, bands=8
    )


@_register("simhash_neardup_pairs", oracle=None)
def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (Hamming ≤ 3 over 64-bit fingerprints,
    16-bit-chunk banding) over the same injected near-dups. Rows-only check;
    quality asserted in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import simhash_candidate_pairs

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return (
        # max_bucket opt-in (library default None preserves full recall):
        # the deployed posture caps hot-band fan-in, same as the portable form
        simhash_candidate_pairs(
            docs.unionByName(near), "doc_id", "text", max_bucket=256
        ).filter(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: embedding similarity search (north-star extensions)
# ---------------------------------------------------------------------------


@_register(
    "embedding_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.qvec) AS c
        FROM embeddings e, q WHERE e.vec_id != q.query_id
    )
    SELECT query_id, vec_id, rank FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (exact ANN baseline):
    broadcast the tiny query set, one scan of the corpus, per-query window
    top-k — zero corpus shuffle. Scores are engine-internal (float rounding
    differs across engines); the output is the selected (query, neighbor,
    rank) triples, robust because neighbor gaps >> float error."""
    from scraping_jobsdb_spark.operators.similarity import brute_force_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return brute_force_topk(emb, query, k=10).withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@_register(
    "embedding_neardup_pairs_exact_gemm",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
    """,
)
def q_embedding_neardup_pairs_exact_gemm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERIFICATION-ONLY exact embedding near-dup pairs (cos ≥ 0.5, blocked
    normalized-GEMM) — renamed from ``embedding_neardup_pairs`` when the
    LSH banded form was promoted to the family default (r5 verdict item 6):
    O(n²) data movement is inherent to an exact all-pairs answer, so this
    stays registered only as the ground-truth the scale path is verified
    against (and for the low-threshold regime where sign-LSH provably
    cannot prune — a random pair's per-band collision probability at 0.5 is
    too close to the boundary pair's, so candidates ≈ all pairs and the
    only lever is the verify kernel: explode → hash shuffle → one numpy
    matmul per block pair, BLAS speed instead of per-pair expression
    folds). No BNLJ/cartesian in the plan (asserted in test_plan_quality).
    The 0.5 threshold sits in a ≥0.01-wide gap of the sf0.01 pair
    distribution, so engine-level float differences cannot flip
    membership."""
    from scraping_jobsdb_spark.operators.similarity import (
        embedding_neardup_pairs_blocked,
    )

    return embedding_neardup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), 0.5
    )


@_register(
    "embedding_neardup_pairs",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_concat([embedding[1]::DOUBLE + 0.5],
                           embedding[2:]::DOUBLE[]) AS embedding
        FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup family's embedding
    member, REGISTERED ON ITS SCALE PATH: sign-LSH banding
    (operators/similarity.py embedding_neardup_pairs_lsh) at a
    pruning-friendly threshold (0.9) over the corpus with injected
    perturbed near-dups (+0.5 on the first coordinate of every 10th
    vector). Candidates meet on an EQUI-join of (band, signature) buckets
    instead of any all-pairs product, and the exact cosine predicate
    verifies in-bucket only — the plan a 100 TB deployment runs. The
    Rademacher planes are FIXED, so the banding is a pure function of the
    input: the result is deterministic and — with the default bands sized
    for per-pair miss ≤ 1e-7 at the boundary and the nearest pair 0.0016
    away from the threshold — equals the exact pair set on this corpus
    (verified against the blocked-GEMM form AND hash-oracled against
    DuckDB's exact join). Promoted from the sibling slot in r6 (r5 verdict
    item 6); the exact blocked-GEMM form stays registered as
    ``embedding_neardup_pairs_exact_gemm``, the verification-only
    ground truth for the low-threshold regime where LSH cannot prune."""
    from scraping_jobsdb_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    emb = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    near = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    # rows_per_band=8 (256 signatures/band, ~48 auto-sized bands at 0.9):
    # the deployed banding — 2-bit signatures prune nothing on isotropic
    # data (4 buckets/band ⇒ candidates ~ n²/8 per band). The exact cosine
    # filter makes the OUTPUT independent of banding (banding only prunes,
    # never admits); per-pair miss stays ≤ 1e-7 at the boundary, so the
    # oracled pair set is unchanged. arrow_signatures: the 384 sign bits
    # come from one Arrow-batched numpy matmul instead of 384 interpreted
    # Catalyst folds (measured 26 s → ~1 s at sf0.1).
    return embedding_neardup_pairs_lsh(
        emb.unionByName(near), 0.9, rows_per_band=8, arrow_signatures=True
    )


@_register(
    "nearest_centroid_confusion",
    oracle="""
    WITH coords AS (
        SELECT label, i,
               CAST(SUM(CAST(embedding[i] AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label, list(m ORDER BY i) AS centroid FROM coords GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label AS true_label, c.label AS cand,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 9)
                   AS cos
        FROM embeddings e CROSS JOIN cents c
    ), best AS (
        SELECT vec_id, true_label, cand AS pred_label,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, cand
               ) AS rn
        FROM scored
    )
    SELECT true_label AS label, pred_label, COUNT(*) AS n
    FROM best WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification confusion matrix
    (operators/similarity.py label_centroids + nearest_centroid_classify):
    per-label mean embeddings via ONE map-side-combined hash aggregate
    (dim independent decimal-exact SUMs — no explode, the shuffle carries
    one 64-wide row per partition-label, not |corpus|×dim rows), then
    every vector classified by a PURE map expression over the
    driver-baked centroid literals — zero shuffle, embarrassingly
    parallel — and rolled into (label, pred_label, n). Cosines quantize
    to 9 dp before the argmin with ties to the lowest label (min
    best-vs-second margin on this corpus is 1e-4, five orders above the
    quantization), so the whole classification is value-hash oracled."""
    from scraping_jobsdb_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_classify,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb, dim=64)
    pred = nearest_centroid_classify(emb, cents, carry_cols=["label"])
    return pred.groupBy("label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "embedding_topk_np",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding FROM embeddings
        WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 9) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.query_id
    )
    SELECT query_id, vec_id, rank
    FROM (
        SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, vec_id
        ) AS INTEGER) AS rank
        FROM scored
    )
    WHERE rank <= 10
    """,
)
def q_embedding_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy-GEMM brute-force top-k (mapInPandas batch matmul) — the
    throughput variant of embedding_topk. The result carries only
    (query_id, vec_id, rank): the floats stay internal, and BOTH sides
    quantize the cosine to 9 decimals before the (cos desc, vec_id)
    ranking window, so GEMM-vs-expression ulp drift cannot flip a rank —
    the query is fully hash-checkable against DuckDB's
    list_cosine_similarity. Set-equality with the expression form is
    additionally asserted in tests."""
    from scraping_jobsdb_spark.operators.similarity import brute_force_topk_np

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return brute_force_topk_np(emb, query, k=10)


@_register(
    "embedding_ivf_topk",
    oracle="""
    WITH coords AS (
        SELECT label, i,
               CAST(SUM(CAST(embedding[i] AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label AS cell, list(m ORDER BY i) AS centroid
        FROM coords GROUP BY label
    ), assigned AS (
        SELECT vec_id, embedding, cell
        FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           e.embedding::DOUBLE[], c.centroid), 9) DESC, c.cell
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ), probed AS (
        SELECT query_id, qvec, cell
        FROM (
            SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           q.embedding::DOUBLE[], c.centroid), 9) DESC, c.cell
                   ) AS rn
            FROM embeddings q CROSS JOIN cents c
            WHERE q.vec_id IN (0, 100, 200)
        ) WHERE rn <= 3
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            p.qvec::DOUBLE[]), 9) AS cos
        FROM assigned a JOIN probed p USING (cell)
        WHERE a.vec_id != p.query_id
    )
    SELECT query_id, vec_id, rank
    FROM (
        SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, vec_id
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (the 100 TB scale path: corpus
    partitioned by centroid cell, probes prune the scan to
    n_probe/n_centroids of the data). HASH-ORACLED since r8 (r7 verdict
    item 5): the cells are the per-label decimal-exact Rocchio centroids
    (the ``nearest_centroid_confusion`` recipe, SQL-derivable), cell
    assignment runs as a zero-shuffle map over driver-baked centroid
    literals, and every ranked cosine (assignment argmin, probe ranking,
    in-cell top-k) quantizes to 9 dp with ties to the lowest cell/id —
    so the ENTIRE pruning path (assign → probe → in-cell exact scoring)
    is value-checked against DuckDB, not just row-counted. Trained
    (kmeans_fit) and hash-stride-seeded centroid variants stay covered by
    the recall + parity tests in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import (
        ivf_topk,
        label_centroids,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb, dim=64).select(
        F.col("label").alias("cell"), "centroid"
    )
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return ivf_topk(
        emb.select("vec_id", "embedding"),
        query,
        n_probe=3,
        k=10,
        centroids=cents,
        quantize_dp=9,
    )


# ---------------------------------------------------------------------------
# Event-time windows (§2.7 extensions over the events table)
# ---------------------------------------------------------------------------


@_register(
    "events_hourly_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (1h) per event type — the batch form of the
    Structured Streaming aggregation (streaming/windows.py runs the identical
    plan via readStream; tests assert batch ≡ streaming). F.window on a
    1-hour tumble aligns to the epoch grid = date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_register(
    "events_ohlc_hourly",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', ts) AS ws, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT ws AS window_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series DOWNSAMPLING to hourly OHLC bars (open/high/low/close +
    count) per event type — the classic resample an events store serves,
    and the registry's ``min_by``/``max_by`` surface: open and close are
    ONE ordered-argmin aggregate each (no self-join, no second window
    pass), tie-broken on the unique (ts, event_id) pair so the bar is a
    pure function of the data at any partitioning. All four prices are
    RAW stored doubles (no arithmetic), so the result hash-oracles
    exactly; the plan is a single map-side-combined hash aggregate —
    per-bucket state is O(1), the shape that downsamples a 100 TB event
    stream in one shuffle. Oracle mirrors via two ROW_NUMBER lanes
    (DuckDB's arg_min takes one ordering value; the window form pins the
    identical total order)."""
    ev = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", order_key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order_key).alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "n_events",
        )
    )


@_register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (5-minute inactivity gap) per user: F.session_window in
    Spark vs the lag/cumulative-sum sessionization identity in SQL. A new
    session starts when the gap is >= the timeout (Spark's window end is
    exclusive: end = last_ts + gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@_register(
    "events_hourly_streaming",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: the SAME hourly aggregation executed through Structured
    Streaming (file source → watermark → windowed agg → AvailableNow drain
    to memory sink) — proving the engine's batch/streaming plan parity
    against the batch SQL oracle. Checkpoint-based progress tracking is the
    idiomatic replacement for the reference's hand-rolled anti-join
    incrementality (SURVEY.md §2.7)."""
    from scraping_jobsdb_spark.streaming.windows import (
        hourly_event_counts_stream,
        run_stream_to_memory,
    )

    return run_stream_to_memory(hourly_event_counts_stream(spark, sf_dir), spark)


@_register(
    "events_ohlc_streaming",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', ts) AS ws, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT ws AS window_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def q_events_ohlc_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 + the r7 OHLC downsampler THROUGH Structured Streaming: the
    identical min_by/max_by windowed aggregation as the batch
    events_ohlc_hourly, executed file source → watermark → AvailableNow →
    memory sink and checked against the SAME batch SQL oracle — pinning
    that ordered-argmin aggregates (one (key, value) state pair per group)
    hold the batch/streaming plan-parity contract like the sum/count
    family does."""
    from scraping_jobsdb_spark.streaming.windows import (
        ohlc_bars_stream,
        run_stream_to_memory,
    )

    return run_stream_to_memory(ohlc_bars_stream(spark, sf_dir), spark)


# ---------------------------------------------------------------------------
# Scalar function packs (§2.6, F1-F16)
# ---------------------------------------------------------------------------


@_register(
    "scalar_string_pack",
    oracle="""
    SELECT c_custkey,
           replace(c_name, '#', '-') AS slug,
           regexp_extract(c_name, '(\\d+)$', 1) AS trailing_id,
           (c_name LIKE 'Customer%') AS is_customer,
           split_part(c_name, '#', 1) AS name_prefix,
           upper(c_mktsegment) AS segment_uc,
           substring(c_mktsegment, 1, 3) AS seg3,
           trim(concat(' ', c_mktsegment, ' ')) AS seg_trimmed,
           concat_ws(',', c_name, c_mktsegment) AS joined
    FROM customer
    """,
)
def q_scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F7/F8/F9/F14: the string-function family over customer —
    slugify (translate), trailing-id regex capture, prefix test, split-and-
    pick, case/substring/trim, concat_ws. Reference sites:
    ``scrape_url.py:54,170,176,178-181``; ``utils.py:33-36,56-74``."""
    from scraping_jobsdb_spark.functions.scalars import split_item, strip_ws

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_name", "#", "-").alias("slug"),
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("trailing_id"),
        F.col("c_name").startswith("Customer").alias("is_customer"),
        split_item("c_name", "#", 0).alias("name_prefix"),
        F.upper("c_mktsegment").alias("segment_uc"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        strip_ws(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.concat_ws(",", "c_name", "c_mktsegment").alias("joined"),
    )


@_register(
    "scalar_date_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    """,
)
def q_scalar_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F11/F12/F13: date-part extraction + ISO formatting + truncation.
    Reference: partition-path slicing ``scrape_url.py:112``, strftime/strptime
    ``utils.py:56-61``."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_format(
            F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"
        ).alias("month_start"),
    )


@_register(
    "scalar_json_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(CEIL(CAST(json_extract_string(props, '$.k') AS INT) / 30.0) AS BIGINT)
               AS k_pages
    FROM events
    """,
)
def q_scalar_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: JSON field extraction + pagination ceil-div. Reference:
    ``scrape_url.py:216-219`` (json.loads(attr)['totalJobCount'],
    ceil(n/30))."""
    from scraping_jobsdb_spark.functions.scalars import json_field, pages_for

    ev = load_table(spark, sf_dir, "events")
    k = json_field("props", "$.k").cast("int")
    return ev.select(
        "event_id", k.alias("k_val"), pages_for(k).alias("k_pages")
    )


@_register(
    "shipping_priority_top10",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 highest-revenue unshipped orders for one
    market segment. Exercises selective multi-join + agg + decimal-exact
    top-k (tie-broken on the unique key; revenue gaps >> representable
    error because the sum itself is exact)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "returned_items_by_nation",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_returned_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS lost_revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY n.n_name
    """,
)
def q_returned_items_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: returned-item revenue loss per nation — a 4-table
    join where the selective fact filter pushes to the scan and both
    dimension sides broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_returned_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("lost_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Additional surface: latest-per-key, SQL API, subqueries, conditional aggs
# ---------------------------------------------------------------------------


@_register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest wins' per key: the reference's repeated per-job catalog
    overwrite (``scrape_url.py:301-303``) as a descending ranking window
    (operators/windows.latest_per_key). event_id breaks ts ties."""
    from scraping_jobsdb_spark.operators.windows import latest_per_key

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return latest_per_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type"
    )


@_register(
    "sql_surface_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q_sql_surface_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL API surface (S10/DDL family: temp-view registration +
    spark.sql), running a TPC-H-Q5-shaped multi-join analytic — Catalyst
    reorders the join chain and broadcasts the dimensions; revenue is
    decimal-exact. Identical SQL text runs on both engines."""
    for t in ("customer", "nation", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        """
    )


@_register(
    "scalar_subquery_above_total_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(30,4)) * (SELECT COUNT(*) FROM orders)
          > (SELECT SUM(CAST(o_totalprice AS DECIMAL(30,4))) FROM orders)
    """,
)
def q_scalar_subquery_above_total_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The average is
    compared cross-multiplied in decimal (price·N > ΣP) so no engine performs
    a division — the predicate is exact at any aggregation order."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(30,4)) * (SELECT COUNT(*) FROM orders)
              > (SELECT SUM(CAST(o_totalprice AS DECIMAL(30,4))) FROM orders)
        """
    )


@_register(
    "conditional_aggregates",
    oracle=f"""
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%'
                         THEN CAST(o_totalprice AS DECIMAL(30,4))
                         ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) AS urgent_spend
    FROM orders GROUP BY o_custkey
    """,
)
def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot): per-status counts + filtered
    decimal spend in one pass — the idiom that replaces N separate filtered
    scans."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
        F.sum(
            F.when(
                F.col("o_orderpriority").startswith("1-"),
                F.col("o_totalprice").cast("decimal(30,4)"),
            ).otherwise(F.lit(0).cast("decimal(30,4)"))
        )
        .cast("double")
        .alias("urgent_spend"),
    )


@_register(
    "grouped_sorted_list",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_mktsegment)), ',') AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def q_grouped_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped list aggregation: collect_list is
    order-nondeterministic in any parallel engine, so the engine's canonical
    form sorts before joining — reproducible output at any partitioning."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("c_mktsegment")), ",").alias(
            "segments"
        )
    )


@_register(
    "events_user_zscore",
    oracle="""
    SELECT user_id, event_id, value,
           ROUND(CASE WHEN stddev_pop(value) OVER w > 0
                      THEN (value - avg(value) OVER w) / stddev_pop(value) OVER w
                      ELSE 0.0 END, 6) + 0.0 AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_events_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 grouped Pandas transform (applyInPandas): per-user z-score of
    event values. The gate form rounds to 6 decimals (+0.0 normalizes any
    IEEE -0.0) so the fsum-exact Arrow path and the oracle's window
    stddev_pop hash identically — raw doubles differ in the last ulps by
    summation order; full-precision agreement with the window-function form
    is asserted in tests/test_sources_grouped.py."""
    from scraping_jobsdb_spark.operators.grouped import group_zscore

    z = group_zscore(load_table(spark, sf_dir, "events"))
    return z.withColumn("zscore", F.round("zscore", 6) + F.lit(0.0))


# ---------------------------------------------------------------------------
# Wider analytic surface: TPC-H-shaped subquery/predicate forms, window
# variants, pivot/grouping sets, percentile, higher-order array functions,
# string/date scalar packs, sliding event windows.
# ---------------------------------------------------------------------------


@_register(
    "exists_order_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q_exists_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped correlated EXISTS: orders with at least one lineitem
    shipped after the order date, counted by priority. Catalyst rewrites the
    subquery to a left-semi join (RewritePredicateSubquery) — the same
    rewrite the reference gets from Postgres for its NOT IN (J3)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@_register(
    "forecast_revenue_delta",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE)
               AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25
    """,
)
def q_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan+filter+global agg: the pushdown showcase — both
    predicates reach the parquet scan (PushedFilters), the projection prunes
    to three columns, and the single global aggregate ships one partial row
    per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount").between(0.02, 0.06)) & (F.col("l_quantity") < 25))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,6)")
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "promo_revenue_ratio",
    oracle="""
    SELECT CAST(100.0 * SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                   AS DECIMAL(30,6)))
           / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
           AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional-ratio aggregate over a fact↔dim join:
    part is broadcast (dim ≪ fact), both sums are decimal-exact, and the
    single final division is one double op — deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
        F.lit(0).cast("decimal(30,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc))
            .cast("double")
            .alias("promo_pct")
        )
    )


@_register(
    "supplier_count_by_parttype",
    oracle="""
    SELECT p.p_type, COUNT(DISTINCT l.l_suppkey) AS n_suppliers
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_type
    """,
)
def q_supplier_count_by_parttype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped distinct-count with a NOT IN exclusion subquery:
    anti-join against the (tiny, broadcast) excluded-supplier set, then
    count-distinct per part type (two-phase distinct aggregate).
    ``s_suppkey`` is non-null so NOT IN ≡ left_anti (SURVEY §2.2 P4 note)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
    )


@_register(
    "large_order_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING + join + top-k: aggregate-filter the fact,
    join back to orders/customer, take the top 100 under a total order
    (price desc, orderkey tiebreak → deterministic limit set). Spark plans
    TakeOrderedAndProject — no global sort materialization."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@_register(
    "disjunctive_pred_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 30)
    """,
)
def q_disjunctive_pred_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped OR-of-ANDs join predicate: mixed join+filter
    conditions that Catalyst splits into the join key (equi part) plus a
    post-join disjunctive filter; part stays broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "window_distribution_pack",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_distribution_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 distribution windows: ntile / percent_rank / cume_dist /
    first_value per status under a total order. The rank ratios are single
    int/int double divisions — identical operands → identical doubles."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


@_register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS near_spend
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 RANGE frame (value-based, vs the ROWS frame of
    window_running_sum): spend over orders within a key-distance band.
    Decimal-exact so frame-internal accumulation order can't matter."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-10, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("near_spend"),
    )


@_register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 pivot: long→wide counts with an explicit pivot-value list (no
    extra distinct-discovery job, stable column set at any scale). Empty
    cells coalesce to 0 to match the SQL conditional-sum form."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_orders"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_orders"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_orders"),
    )


@_register(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 GROUPING SETS (the general form behind rollup/cube): per-status,
    per-priority, and grand-total aggregates in one pass — Spark expands to
    a single Expand+Aggregate, one shuffle. Identical SQL on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@_register(
    "percentile_part_sizes",
    oracle="""
    SELECT p_brand,
           QUANTILE_CONT(p_size, 0.5) AS median_size,
           QUANTILE_CONT(p_size, 0.9) AS p90_size,
           MIN(p_size) AS min_size, MAX(p_size) AS max_size
    FROM part GROUP BY p_brand
    """,
)
def q_percentile_part_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 exact percentiles (linear interpolation) over an int column per
    group: both engines interpolate (1-f)*lo + f*hi on exact integers, so
    the doubles agree bit-for-bit."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.percentile("p_size", 0.5).alias("median_size"),
        F.percentile("p_size", 0.9).alias("p90_size"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@_register(
    "array_hof_pack",
    oracle="""
    WITH g AS (
        SELECT l_orderkey, list_sort(list(l_linenumber)) AS ns
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           array_to_string(ns, ',') AS lines,
           array_to_string(list_transform(ns, x -> x * 2), ',') AS doubled,
           COALESCE(array_to_string(list_filter(ns, x -> x > 3), ','), '')
               AS tail_lines,
           CAST(list_sum(ns) AS BIGINT) AS line_sum,
           list_contains(ns, 5) AS has_five,
           len(ns) AS n_lines
    FROM g
    """,
)
def q_array_hof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate /
    contains) over a deterministic per-order line list — the JVM-side array
    toolkit the LLM-pipeline text operators are built from (shingling,
    minhash permutations). Arrays are emitted as joined strings so the
    cross-engine hash is representation-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("ns")
    )
    return g.select(
        "l_orderkey",
        F.array_join(F.transform("ns", lambda x: x.cast("string")), ",").alias("lines"),
        F.array_join(
            F.transform("ns", lambda x: (x * 2).cast("string")), ","
        ).alias("doubled"),
        F.array_join(
            F.transform(F.filter("ns", lambda x: x > 3), lambda x: x.cast("string")),
            ",",
        ).alias("tail_lines"),
        F.aggregate("ns", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "line_sum"
        ),
        F.array_contains("ns", 5).alias("has_five"),
        F.size("ns").cast("bigint").alias("n_lines"),
    )


@_register(
    "scalar_string_distance_pack",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, p_type) AS INTEGER) AS brand_type_dist,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           reverse(p_brand) AS rev_brand,
           repeat(p_brand, 2) AS double_brand,
           translate(p_type, 'aeiou', '.....') AS devoweled
    FROM part
    """,
)
def q_scalar_string_distance_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 extended string pack: edit distance (the fuzzy-match primitive
    behind near-dup verification), padding, reverse/repeat/translate — all
    whole-stage-codegen built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat("p_brand", 2).alias("double_brand"),
        F.translate("p_type", "aeiou", ".....").alias("devoweled"),
    )


@_register(
    "scalar_date_arith_pack",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS review_date,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS days_to_y2k1,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow
    FROM orders
    """,
)
def q_scalar_date_arith_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 date arithmetic: day/month offsets (month-end clamped the same
    way by both engines), last_day, day diffs, day-of-week. Reference analog:
    the date-partition path math (``scrape_url.py:112``) and '<N> days ago'
    parsing (``utils.py:56``)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # date outputs as ISO strings: DATE surfaces as datetime64 from DuckDB
    # but as date objects from Spark — value-repr differs, so the gate's
    # pandas hash would mismatch on type alone (same fix as dq checks).
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("review_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2001-01-01").cast("date"), d)
        .cast("bigint")
        .alias("days_to_y2k1"),
        # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark weekday: 0=Monday.
        ((F.weekday(d) + 1) % 7).cast("int").alias("dow"),
    )


@_register(
    "events_sliding_windows",
    oracle="""
    WITH offs AS (SELECT UNNEST([0, 1]) AS off),
    w AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + (CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300)
                     * INTERVAL 1 SECOND AS win_start,
               value
        FROM events, offs
        WHERE epoch(ts) >= CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300
          AND epoch(ts) <  CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300 + 600
    )
    SELECT win_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM w GROUP BY win_start
    """,
)
def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 sliding event-time windows (10 min size, 5 min slide): each event
    lands in exactly two windows. Same F.window used by the streaming
    surface; the batch form is the oracle-checkable projection of it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


@_register(
    "events_sliding_streaming",
    oracle="""
    WITH offs AS (SELECT UNNEST([0, 1]) AS off),
    w AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + (CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300)
                     * INTERVAL 1 SECOND AS win_start,
               value
        FROM events, offs
        WHERE epoch(ts) >= CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300
          AND epoch(ts) <  CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - off * 300 + 600
    )
    SELECT win_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM w GROUP BY win_start
    """,
)
def q_events_sliding_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 sliding windows executed through Structured Streaming
    (readStream → window(10m,5m) → AvailableNow drain): same logical plan and
    same DuckDB oracle as the batch events_sliding_windows — batch/stream
    parity is the checked property."""
    from scraping_jobsdb_spark.streaming.windows import (
        run_stream_to_memory,
        sliding_value_totals_stream,
    )

    return run_stream_to_memory(sliding_value_totals_stream(spark, sf_dir), spark)


@_register(
    "events_session_streaming",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_events_session_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 session windows through Structured Streaming (state-store merged
    sessions, update-mode AvailableNow drain): same oracle as the batch
    events_session_window."""
    from scraping_jobsdb_spark.streaming.windows import (
        run_stream_to_memory,
        session_counts_stream,
    )

    return run_stream_to_memory(session_counts_stream(spark, sf_dir), spark)


@_register(
    "events_streaming_dedup",
    oracle="""
    SELECT event_id, MIN(user_id) AS user_id
    FROM events GROUP BY event_id
    """,
)
def q_events_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 streaming dedup: dropDuplicatesWithinWatermark on event_id over
    the file stream — the bounded-state replacement for the reference's
    batch anti-join idempotence. event_id is already unique in the corpus,
    so the kept set equals per-key GROUP BY (no arbitrary-row ambiguity)."""
    from scraping_jobsdb_spark.streaming.dedup import streaming_dedup
    from scraping_jobsdb_spark.streaming.windows import (
        events_file_stream,
        run_stream_to_memory,
    )

    deduped = streaming_dedup(
        events_file_stream(spark, sf_dir), ["event_id"], "ts", "10 minutes"
    ).select("event_id", "user_id")
    return run_stream_to_memory(deduped, spark, output_mode="append")


@_register(
    "explode_token_positions",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT t.doc_id, t.toks[g.i] AS tok, CAST(g.i - 1 AS INT) AS pos
    FROM t, generate_series(1, 5) AS g(i)
    WHERE g.i <= len(t.toks)
    """,
)
def q_explode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 UDTF-analog fan-out: one document row → N (token, position)
    rows via posexplode — the engine form of the reference's page → job-link
    expansion (``scrape_url.py:169-181``). Generator runs inside codegen; no
    Python. Limited to the first 5 positions to keep the oracle diff small."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .filter(F.col("pos") < 5)
        .select("doc_id", "tok", F.col("pos").cast("int").alias("pos"))
    )


@_register(
    "pandas_udf_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def q_pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 Arrow-vectorized scalar pandas_udf: BPE-ish token counting
    (letter runs | digit runs | single punctuation — the pre-tokenizer
    shape real BPE vocabularies assume). The Python path is exercised
    deliberately (north-star token counting); the regex is anchored to the
    same semantics DuckDB's regexp_extract_all implements, so the oracle is
    exact."""
    from scraping_jobsdb_spark.operators.textops import bpe_ish_token_count

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", bpe_ish_token_count("text").alias("n_bpe_tokens"))


@_register(
    "regexp_extract_all_pack",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '')
               AS numbers,
           regexp_matches(text, '[0-9]') AS has_digit,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
               AS n_capitalized
    FROM documents
    """,
)
def q_regexp_extract_all_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 multi-match regex extraction (F2/F3 generalized): all digit runs,
    digit presence, capitalized-word count — JVM-side regexp_extract_all /
    rlike."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.array_join(F.regexp_extract_all("text", F.lit("[0-9]+")), ",").alias(
            "numbers"
        ),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Z][a-z]+")))
        .cast("bigint")
        .alias("n_capitalized"),
    )


@_register(
    "salted_groupby_skewed",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(user_id AS DECIMAL(30,0))) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
)
def q_salted_groupby_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-immune two-phase aggregation (operators/scale.py): event_type is
    low-cardinality, the shape where one hot key stalls a reducer at scale.
    Salting spreads each key over 16 partial groups; the combine is lossless
    for algebraic aggregates, so the oracle is the plain GROUP BY."""
    from scraping_jobsdb_spark.operators.scale import salted_groupby

    ev = load_table(spark, sf_dir, "events").withColumn(
        "uid_dec", F.col("user_id").cast("decimal(30,0)")
    )
    out = salted_groupby(
        ev,
        ["event_type"],
        [
            ("n_events", "count", "event_id"),
            ("min_value", "min", "value"),
            ("max_value", "max", "value"),
            ("sum_users", "sum", "uid_dec"),
        ],
        n_salts=16,
        salt_source="event_id",
    )
    return out.withColumn("sum_users", F.col("sum_users").cast("bigint"))


# ---------------------------------------------------------------------------
# Correlated-aggregate / decision-support shapes (TPC-H Q2/Q11/Q13/Q15/Q17/
# Q20/Q22 analogs) — thresholds rewritten into decimal-exact cross products
# so predicate membership can't flip on float rounding.
# ---------------------------------------------------------------------------


@_register(
    "argmin_supplier_per_part",
    oracle="""
    SELECT l_partkey, s_suppkey, s_acctbal
    FROM (
        SELECT l.l_partkey, s.s_suppkey, s.s_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY l.l_partkey ORDER BY s.s_acctbal, s.s_suppkey
               ) AS rn
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ) WHERE rn = 1
    """,
)
def q_argmin_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped argmin join-back: per part, the supplying supplier
    with the lowest account balance (suppkey tiebreak). Distinct
    (part, supp) pairs first — one dedup shuffle — then a broadcast of the
    supplier dim and a per-part ranking window."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    joined = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "s_suppkey", "s_acctbal")
    )


@_register(
    "group_share_threshold",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, CAST(spend AS DOUBLE) AS spend
    FROM per_cust
    WHERE spend * 1000 > (SELECT SUM(CAST(o_totalprice AS DECIMAL(30,4))) FROM orders)
    """,
)
def q_group_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped fraction-of-total HAVING: customers holding > 0.1%
    of global spend. The global total is a scalar subquery (one extra
    reduce, broadcast into the filter); the threshold compare is
    decimal-exact (spend*1000 > total, no float division)."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(30,4)")
    per_cust = o.groupBy("o_custkey").agg(F.sum(dec).alias("spend"))
    total = o.agg(F.sum(dec).alias("total"))
    return (
        per_cust.join(F.broadcast(total))
        .filter(F.col("spend") * 1000 > F.col("total"))
        .select("o_custkey", F.col("spend").cast("double").alias("spend"))
    )


@_register(
    "customer_order_histogram",
    oracle="""
    WITH counts AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM counts GROUP BY n_orders
    """,
)
def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped two-level aggregate: orders per customer (left join
    keeps zero-order customers; COUNT(col) skips their NULLs), then the
    distribution of those counts. Two shuffles, the second on a tiny
    domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return counts.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@_register(
    "top_revenue_suppliers",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                   AS revenue
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, CAST(revenue AS DOUBLE) AS revenue
    FROM rev WHERE revenue = (SELECT MAX(revenue) FROM rev)
    """,
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped max-equality selection: supplier(s) with the maximum
    revenue. Equality against a decimal-exact aggregate is sound (both
    engines compute the identical decimal); with doubles this query would be
    the canonical cross-engine flake."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
        ).alias("revenue")
    )
    top = rev.agg(F.max("revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("revenue") == F.col("max_rev"))
        .select("l_suppkey", F.col("revenue").cast("double").alias("revenue"))
    )


@_register(
    "small_quantity_revenue",
    oracle="""
    WITH stats AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(30,4))) AS qsum,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)
               AS small_qty_revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN stats s ON l.l_partkey = s.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(30,4)) * 2 * s.n < s.qsum
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated-average filter: lineitems below half
    their part's average quantity. The correlated subquery is de-correlated
    into aggregate + self-join (what Catalyst/DuckDB both do); the
    ``qty < avg/2`` compare is rewritten ``2·qty·n < sum`` so it stays in
    exact decimal arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    qdec = F.col("l_quantity").cast("decimal(30,4)")
    stats = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(qdec).alias("qsum"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(stats, li.l_partkey == stats.p_key)
        .filter(qdec * 2 * F.col("n") < F.col("qsum"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "suppliers_with_heavy_shipments",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 500
    )
    """,
)
def q_suppliers_with_heavy_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped IN over an aggregate-thresholded subquery: suppliers
    whose shipped quantity exceeds a threshold. Semi-join against the
    (small) qualifying-key set — broadcast."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("q"))
        .filter(F.col("q") > 500)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(F.broadcast(heavy), "s_suppkey", "left_semi")


@_register(
    "inactive_wealthy_customers",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > 0
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_inactive_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped NOT EXISTS: positive-balance customers who never
    ordered — the anti-join form of the reference's new-rows idiom (J1)
    applied to decision support."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_acctbal")


@_register(
    "term_document_frequency",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(string_split_regex(trim(text), '\\s+')))
                   AS term
        FROM documents
    )
    SELECT term, COUNT(*) AS doc_freq
    FROM toks GROUP BY term
    HAVING COUNT(*) >= 50
    """,
)
def q_term_document_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency table (the IDF denominator and the stopword-mining
    primitive): distinct terms per doc → explode → count per term, thresholded
    to the common-term tail. One shuffle on term; at corpus scale the
    distinct-per-doc step is map-side and the term key is zipf-skewed —
    exactly the shape salted_groupby handles if a term goes hot."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= 50)
    )


@_register(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dftbl AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * (ln(((SELECT COUNT(*) + 1 FROM documents))::DOUBLE
                           / (dftbl.df + 1)) + 1.0) AS raw_score
        FROM tf JOIN dftbl USING (term)
    )
    SELECT doc_id, term, ROUND(raw_score, 6) AS score, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY raw_score DESC, term
        ) AS rank
        FROM scored
    )
    WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document. The ranking itself is cross-engine
    stable: scores are tf * (ln((N+1)/(df+1)) + 1) over integer (tf, df),
    so equal scores come from equal (tf, df) pairs and the (score desc,
    term) window breaks them identically everywhere; the reported score is
    rounded to 6 decimals so last-ulp ln() differences can't break the
    value hash. Plan: token explode → per-(doc,term) TF → term DF
    (broadcast) → score → per-doc ranking window."""
    from scraping_jobsdb_spark.operators.textops import tfidf_top_terms

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return tfidf_top_terms(docs, k=3).withColumn("score", F.round("score", 6))


@_register(
    "doc_winnowing_fingerprints",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM documents
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), sel AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    )
    SELECT doc_id, COUNT(*) AS n_fingerprints, CAST(SUM(h) AS BIGINT) AS fp_sum
    FROM sel GROUP BY doc_id
    """,
)
def q_doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing): per-doc count and
    integer checksum of the selected k-gram hashes (k=8, window w=4). The
    polynomial hash is exact 64-bit integer arithmetic, so the oracle
    recomputes the identical fingerprint set from the formula — a full
    value-hash check of a sketching operator, which float-based sketches
    (HLL, simhash-over-xxhash) can't offer. Operator: operators/textops.py
    winnowing_fingerprints — JVM transform/ascii hashing, one doc_id
    shuffle for the window-min, one row per doc out."""
    from scraping_jobsdb_spark.operators.textops import winnowing_fingerprints

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return winnowing_fingerprints(docs, k=8, w=4)


@_register(
    "doc_pii_redaction",
    oracle=r"""
    WITH salted AS (
        SELECT doc_id,
               text || ' contact u' || doc_id || '@example.com from 10.0.'
                    || (doc_id % 256) || '.7 call +1 555 0123 45' AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(
                       text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{2,4}', '<PHONE>', 'g'
           ) AS text_redacted,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(text,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text,
               '\+\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{2,4}')) AS BIGINT)
               AS n_phone
    FROM salted
    """,
)
def q_doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/textops.py redact_pii): every document gets
    a deterministically-injected email, IPv4, and phone number (derived
    from doc_id so every row differs), then the redaction pass replaces all
    three classes and counts matches per class. Map-only JVM regex work —
    no shuffle, no UDF — and the patterns are Java-regex/RE2-portable, so
    the DuckDB oracle reproduces the redacted text BYTE-FOR-BYTE: a full
    value-hash check of the compliance pass itself."""
    from scraping_jobsdb_spark.operators.textops import redact_pii

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 555 0123 45"),
        ).alias("text"),
    )
    out = redact_pii(docs)
    return out.select(
        "doc_id",
        "text_redacted",
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_ip").cast("bigint").alias("n_ip"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
    )


@_register(
    "doc_repetition_stats",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS ws
        FROM documents
    ), posn AS (
        SELECT doc_id, ws, unnest(range(0, len(ws) - 2)) AS i FROM w
    ), g AS (
        SELECT doc_id,
               ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
        FROM posn
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(DISTINCT gram) AS n_distinct_grams
    FROM g GROUP BY doc_id
    """,
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition profile (operators/textops.py
    repetition_stats): total vs distinct word trigrams per doc — the
    Gopher-style duplicate-gram quality signal. Spark builds grams with
    the posexplode+lead single-window shape (one doc_id shuffle, nothing
    quadratic); the oracle rebuilds them from the split array. Integer
    counts only, so the check is engine-exact."""
    from scraping_jobsdb_spark.operators.textops import repetition_stats

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return repetition_stats(docs, n=3)


@_register(
    "doc_top_ngrams",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS ws
        FROM documents
    ), posn AS (
        SELECT doc_id, ws, unnest(range(0, len(ws) - 2)) AS i FROM w
    ), g AS (
        SELECT doc_id,
               ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS gram
        FROM posn
    ), counts AS (
        SELECT gram, COUNT(*) AS n_occurrences FROM g GROUP BY gram
    )
    SELECT gram, n_occurrences, rank FROM (
        SELECT gram, n_occurrences,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, gram) AS rank
        FROM counts
    ) WHERE rank <= 20
    """,
)
def q_doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word trigrams (operators/textops.py top_ngrams):
    the boilerplate detector feeding stop-gram lists. Physical shape is the
    scalable one — partial-aggregated gram counts, then
    TakeOrderedAndProject for the cut (per-partition top-k, no global
    sort), then ranking over the ≤20 survivors. Deterministic under the
    (count desc, gram) total order."""
    from scraping_jobsdb_spark.operators.textops import top_ngrams

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return top_ngrams(docs, n=3, k=20)


@_register(
    "token_budget_sample_per_lang",
    oracle=r"""
    WITH weighted AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), running AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running
        FROM weighted
    )
    SELECT doc_id, lang, n_tokens FROM running WHERE running <= 5000
    """,
)
def q_token_budget_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (operators/sampling.py
    token_budget_sample): per language, keep documents in deterministic
    md5 order until a 5000-token budget is exhausted — the "N tokens per
    language" pretraining-recipe primitive. One shuffle on the stratum
    key; the kept set is a pure function of the data (hash order + integer
    running sum), so the oracle reproduces it row-for-row."""
    from scraping_jobsdb_spark.operators.sampling import token_budget_sample
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("bigint").alias("n_tokens")
    )
    return token_budget_sample(
        docs, ["lang"], "doc_id", "n_tokens", budget=5000
    )


@_register(
    "doc_chunking",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents
    ), st AS (
        SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - 1, 0) + 1, 24)) AS start
        FROM w
    )
    SELECT doc_id,
           start // 24 AS chunk_id,
           CAST(least(len(ws) - start, 32) AS BIGINT) AS n_words,
           array_to_string(list_slice(ws, start + 1, start + 32), ' ')
               AS chunk_text
    FROM st
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking (operators/textops.py
    chunk_documents, 32-word chunks, 8-word overlap): the context-window
    prep pass for long documents. Map-only — split, start sequence,
    posexplode, slice — one scan pass, no shuffle, no UDF; the oracle
    rebuilds every chunk from the same split array and the value hash
    covers the chunk text byte-for-byte."""
    from scraping_jobsdb_spark.operators.textops import chunk_documents

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return chunk_documents(docs, chunk_size=32, overlap=8)


@_register(
    "winnowing_containment_pairs",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM corpus
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), rare AS (
        SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= 50
    ), pruned AS (
        SELECT f.doc_id, f.h FROM fps f JOIN rare USING (h)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pruned GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fp
        FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b, s.shared_fp,
           sa.n_fp AS fp_a, sb.n_fp AS fp_b
    FROM shared s
    JOIN sizes sa ON s.id_a = sa.doc_id
    JOIN sizes sb ON s.id_b = sb.doc_id
    WHERE s.shared_fp * 1000 >= 800 * least(sa.n_fp, sb.n_fp)
    """,
)
def q_winnowing_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join over winnowing fingerprints: pairs whose shared
    selected-gram count covers ≥80% of the smaller document's fingerprint
    set, over the corpus with deterministically-injected near-dups (every
    10th doc re-appended minus its last word — the same injection as the
    MinHash query, here with a FULLY value-hash-checkable answer because
    the sketch is integer-exact and the threshold is applied by
    cross-multiplication). One equi-join on the fingerprint hash with a
    stop-gram df guard — LSH-banding economics, deterministic result."""
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint_containment_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return fingerprint_containment_pairs(
        docs.unionByName(near), threshold_milli=800, k=8, w=4, max_df=50
    )


@_register("approx_distinct_sketch", oracle=None)
def q_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (the 100 TB cardinality path): HyperLogLog distinct
    users + approximate value percentiles per event_type. Rows-only (sketch
    estimates are engine-specific by design); relative-error bounds vs the
    exact answers are asserted in tests/test_similarity.py.

    Output is scalar columns only (no array columns): the driver's result
    canonicalizer sorts via pandas, which cannot sort list-valued cells.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", F.lit(0.5), 10000).alias("value_p50"),
        F.percentile_approx("value", F.lit(0.9), 10000).alias("value_p90"),
    )


@_register("hll_mergeable_sketches", oracle=None)
def q_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (the sketch-once, merge-cheaply
    pattern that makes 100 TB cardinality reporting affordable): per
    (event_type, day) partial HLL sketches of user_id, then a per-type
    re-aggregation that UNIONS the binary sketches instead of rescanning
    the data — `hll_sketch_agg` → `hll_union_agg` → `hll_sketch_estimate`
    (Apache DataSketches, built into Spark 3.5+). Rows-only in the gate
    (sketch internals are engine-specific); tests assert the
    merge-invariance law — union-of-partials estimates EXACTLY equal the
    single-shot sketch — and a 5% error bound vs exact distinct counts."""
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type", F.dayofmonth("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        partials.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .select("event_type", "est_users", "n_partials")
    )


@_register(
    "join_full_outer_reconcile",
    oracle="""
    WITH evens AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), third AS (
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COALESCE(e.o_orderkey, t.o_orderkey) AS o_orderkey,
           e.o_totalprice, t.o_orderpriority
    FROM evens e FULL OUTER JOIN third t ON e.o_orderkey = t.o_orderkey
    """,
)
def q_join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (completes the join family beyond the reference's
    J1–J4): reconcile two partial views of a key space, keeping rows unique
    to either side. The reconcile shape backs table-diff/sync operators."""
    o = load_table(spark, sf_dir, "orders")
    evens = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    third = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("t_orderkey"), "o_orderpriority"
    )
    return (
        evens.join(third, evens.o_orderkey == third.t_orderkey, "full_outer")
        .select(
            F.coalesce("o_orderkey", "t_orderkey").alias("o_orderkey"),
            "o_totalprice",
            "o_orderpriority",
        )
    )


@_register(
    "cross_join_param_grid",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join_param_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims — the parameter-grid generator (the
    reference's 11 keywords × 8 salary bands fan-out, ``scrape_url.py:12-34``,
    became a cross-joined parameter DataFrame in the ingest pipeline).
    Broadcast-nested-loop; only ever used with bounded sides."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@_register(
    "neardup_components",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ), nodes AS (
        SELECT DISTINCT u AS id FROM edges
    ), reach(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.id
    )
    SELECT id, MIN(label) AS component
    FROM reach GROUP BY id
    """,
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: connected components over the embedding near-dup
    pair graph (component = min reachable id). Spark side is iterative
    min-label propagation (operators/graph.py — Spark has no recursive SQL);
    the oracle is DuckDB's WITH RECURSIVE transitive closure. The pairwise →
    cluster step is what turns LSH candidates into an actionable keep/drop
    list."""
    from scraping_jobsdb_spark.operators.graph import connected_components
    from scraping_jobsdb_spark.operators.similarity import (
        embedding_neardup_pairs_blocked,
    )

    pairs = embedding_neardup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), 0.5
    )
    return connected_components(pairs)


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration integer PageRank (the recursive-CTE form
    diverges: a RIGHT JOIN's NULL-iteration group re-enters the working
    table forever) — one CTE per iteration, byte-for-byte the arithmetic
    of ``operators/graph.py pagerank``."""
    steps = ",".join(
        f"""
    pr{k} AS (
      SELECT n.node,
             CAST((150 * 1000000 + 850 * COALESCE(c.contrib, 0)) // 1000
                  AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, SUM(p.rank // o.d) AS contrib
          FROM pr{k - 1} p
          JOIN outdeg o ON o.node = p.node
          JOIN edges e ON e.src = p.node
          GROUP BY e.dst
      ) c ON c.node = n.node
    )"""
        for k in range(1, 6)
    )
    return (
        """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst AS node FROM edges
    ),
    outdeg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),"""
        + steps
        + """
    SELECT node, rank FROM pr5
    """
    )


@_register("order_flow_pagerank", oracle=_pagerank_oracle())
def q_order_flow_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTEGER-EXACT PageRank (operators/graph.py pagerank) over the
    customer→supplier order-flow graph (distinct (o_custkey, l_suppkey)
    edges): 5 power-method iterations, d=0.85, every step in scaled-integer
    arithmetic with floor division — so the full rank vector is
    bit-identical across engines and partitionings and HASH-ORACLES against
    DuckDB's unrolled 5-CTE formulation (floating-point PageRank can never
    value-hash: float addition isn't associative, so the shuffle order
    changes low bits). Iterative-algorithm posture matches
    connected_components: per iteration one join with the checkpointed
    static edge list + one aggregate on dst (the Pregel message pass),
    rank lineage truncated per round via localCheckpoint."""
    from scraping_jobsdb_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .distinct()
    )
    return pagerank(edges, iterations=5).select("node", "rank")


def _pagerank_redistribute_oracle() -> str:
    """The redistribute variant's unrolled CTEs: each iteration adds ONE
    integer global scalar — the danglers' total rank divided by |nodes| —
    to every node's incoming mass before the damped update, byte-for-byte
    the arithmetic of ``pagerank(dangling="redistribute")``. On this graph
    every supplier is a sink (suppliers never appear as src), so the
    variant meaningfully diverges from the leaky default."""
    steps = ",".join(
        f"""
    pr{k} AS (
      SELECT n.node,
             CAST((150 * 1000000
                   + 850 * (COALESCE(c.contrib, 0) + s.share)) // 1000
                  AS BIGINT) AS rank
      FROM nodes n
      CROSS JOIN (
          SELECT (SELECT COALESCE(SUM(p.rank), 0) FROM pr{k - 1} p
                  WHERE p.node NOT IN (SELECT node FROM outdeg))
                 // (SELECT COUNT(*) FROM nodes) AS share
      ) s
      LEFT JOIN (
          SELECT e.dst AS node, SUM(p.rank // o.d) AS contrib
          FROM pr{k - 1} p
          JOIN outdeg o ON o.node = p.node
          JOIN edges e ON e.src = p.node
          GROUP BY e.dst
      ) c ON c.node = n.node
    )"""
        for k in range(1, 6)
    )
    return (
        """
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst AS node FROM edges
    ),
    outdeg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),"""
        + steps
        + """
    SELECT node, rank FROM pr5
    """
    )


@_register(
    "order_flow_pagerank_redistribute", oracle=_pagerank_redistribute_oracle()
)
def q_order_flow_pagerank_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STANDARD-formulation PageRank (operators/graph.py pagerank,
    ``dangling="redistribute"`` — VERDICT r6 item 7) on the same
    customer→supplier graph as ``order_flow_pagerank``: every supplier is
    a sink there, so the leaky default and the textbook form genuinely
    rank differently — this query pins the textbook form against DuckDB.
    The correction stays integer-exact: the danglers' total rank is ONE
    global scalar per iteration (a 1-row broadcast cross join, no driver
    round-trip), shared as ``D div N`` — so the full rank vector still
    value-hashes across engines and partitionings."""
    from scraping_jobsdb_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .distinct()
    )
    return pagerank(edges, iterations=5, dangling="redistribute").select(
        "node", "rank"
    )


@_register(
    "semantic_dedup_embeddings",
    oracle="""
    WITH coords AS (
        SELECT label, i,
               CAST(SUM(CAST(embedding[i] AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label, list(m ORDER BY i) AS centroid FROM coords GROUP BY label
    ), corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_concat([embedding[1]::DOUBLE + 0.5],
                           embedding[2:]::DOUBLE[]) AS embedding
        FROM embeddings WHERE vec_id % 10 = 0
    ), scored AS (
        SELECT e.vec_id, c.label AS cand,
               ROUND(list_cosine_similarity(e.embedding, c.centroid), 9) AS cos
        FROM corpus e CROSS JOIN cents c
    ), cells AS (
        SELECT vec_id, cand AS cell FROM (
            SELECT vec_id, cand, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cand
            ) AS rn FROM scored
        ) WHERE rn = 1
    ), drops AS (
        SELECT DISTINCT b.vec_id AS id_b
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN corpus ea ON ea.vec_id = a.vec_id
        JOIN corpus eb ON eb.vec_id = b.vec_id
        WHERE ROUND(list_cosine_similarity(ea.embedding, eb.embedding), 9)
              >= 0.9
    )
    SELECT c.vec_id, c.cell, (d.id_b IS NULL) AS keep
    FROM cells c LEFT JOIN drops d ON d.id_b = c.vec_id
    """,
)
def q_semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication
    (operators/similarity.py semantic_dedup_keep_list) over the corpus
    with injected perturbed near-dups: per-label Rocchio centroids define
    the cells (zero-shuffle driver-baked assignment), exact cosines run
    ONLY within cells (equi-join on cell — Σ|cell|² work, never corpus²),
    and a vector is dropped when a lower-id in-cell near-duplicate
    (quantized cosine ≥ 0.9) exists. The whole pipeline — cell assignment
    argmin, in-cell pair generation, keep verdicts — is one composition of
    joins/aggregates with 9-dp-quantized floats, so it HASH-ORACLES
    against DuckDB end to end (the non-iterative sibling of
    dedup_pipeline_end_to_end's connected-components rule, and the
    embedding analogue of incremental_indexed_dedup's admission rule)."""
    from scraping_jobsdb_spark.operators.similarity import (
        label_centroids,
        semantic_dedup_keep_list,
    )

    emb = fan_out(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
    )
    near = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(near)
    cents = label_centroids(emb, dim=64)
    return semantic_dedup_keep_list(corpus, cents, threshold=0.9)


@_register("semantic_dedup_kmeans_cells", oracle=None)
def q_semantic_dedup_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in its PRODUCTION-centroid regime (r7 verdict item 4 — the
    gate sibling ``semantic_dedup_embeddings`` uses 10 label cells for SQL
    oracle-ability, which leaves the in-cell quadratic fat): cells come
    from ``kmeans_fit`` at k ≈ corpus/50 trained on a FIXED-SIZE
    deterministic hash-sample (the faiss recipe — training cost O(sample
    × k), never corpus-sized), and assignment runs the ``broadcast``
    argmin path (map-side-combining min(struct) over the broadcast
    centroid table — unbounded k, unlike the driver-baked literal
    expression which outgrows codegen past ~100 cells). Exact cosines
    only within cells: Σ|cell|² stays ~n·cell_size as the corpus grows
    because k scales WITH n — the knob the 10-cell gate shape cannot
    demonstrate (BENCH_SCALING.json measures this at sf0.1→sf1.0).
    Injected exact duplicates (every 7th vector, higher id) land in the
    SAME cell as their original by construction (identical vector ⇒
    identical argmin) and must all be dropped — asserted in
    tests/test_similarity.py along with literal≡broadcast parity and
    verdict stability under cell refinement. kmeans is iterative →
    rows-only at the driver; the operator's join/aggregate composition is
    hash-oracled via the label-cell sibling."""
    from scraping_jobsdb_spark.operators.similarity import (
        kmeans_fit,
        semantic_dedup_keep_list,
    )

    emb = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    dups = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dups)
    n = corpus.count()
    k = max(10, n // 50)
    # fixed-size training sample: deterministic md5 hash-filter (map-only —
    # no sort/limit; at 100 TB this is the same one-in-m admission the
    # sketches use), capped so training is O(sample × k) regardless of n
    mod = max(1, n // 5000)
    sample = corpus.filter(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % mod
        == 0
    )
    cents = kmeans_fit(sample, n_centroids=k, max_iter=3)
    return semantic_dedup_keep_list(
        corpus, cents, threshold=0.9, label_col="cell", assign="broadcast"
    )


@_register(
    "doc_text_normalize",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               text || '  cafe' || chr(769) || chr(7) || chr(9) || 'test  '
                   AS text
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(nfc_normalize(text),
                              '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]',
                              '', 'g'),
               '[ \\t\\n\\f\\r]+', ' ', 'g')) AS norm_text
    FROM corpus
    """,
)
def q_doc_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization (operators/textops.py normalize_text) over the
    corpus with injected DECOMPOSED-unicode + control-char + ragged-
    whitespace rows ("cafe" + combining U+0301, a BEL, a tab, double
    spaces): Unicode NFC → C0-control strip → ASCII-whitespace collapse →
    trim, the pass that runs before ``fingerprint`` so byte-level encoder
    differences stop splitting dedup keys. The normalized STRINGS
    hash-oracle against DuckDB's independent nfc_normalize + RE2 pipeline
    — pinning that the Python/Arrow kernel and the portable semantics
    (ASCII whitespace class, not Python's unicode \\s) agree cross-engine
    end to end."""
    from scraping_jobsdb_spark.operators.textops import normalize_text

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    messy = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit("  cafe\u0301\u0007\ttest  "),
        ).alias("text"),
    )
    corpus = docs.unionByName(messy)
    return corpus.select(
        "doc_id", normalize_text("text").alias("norm_text")
    )


@_register("bpe_corpus_tokenize", oracle=None)
def q_bpe_corpus_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END tokenizer: train a BPE merge table on the corpus
    (``bpe_train``, incremental recount) and APPLY it back to every
    document (``bpe_encode``) — the full train→encode loop a pretraining
    pipeline runs. The apply side is the 100 TB-relevant half: symbol
    rewriting happens once per DISTINCT word (vocabulary-sized Arrow
    stage), reassembled per document with a JVM-side ordered flatten.
    Rows-only: the merge recurrence is iterative (not SQL-expressible);
    train↔encode consistency and the reassembly order are pinned by
    tests/test_scale_ops.py. Output: (doc_id, n_tokens, tok_head) with
    tok_head the first 12 subword tokens space-joined (driver-
    canonicalizable string form of the array column)."""
    from scraping_jobsdb_spark.operators.textops import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, n_merges=30).orderBy("merge_rank").collect()
    ]
    return bpe_encode(docs, merges).select(
        "doc_id",
        "n_tokens",
        F.array_join(F.slice("tokens", 1, 12), " ").alias("tok_head"),
    )


@_register("dedup_pipeline_end_to_end", oracle=None)
def q_dedup_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup dedup pipeline in one plan: corpus (+injected
    near-dups) → MinHash-LSH candidate pairs → connected components → keep
    list → surviving corpus. Rows-only (seeded hashing upstream); the
    injected-duplicate removal property is asserted in
    tests/test_similarity.py. This is the operator composition a training-
    data pipeline actually runs."""
    from scraping_jobsdb_spark.operators.graph import dedup_keep_list
    from scraping_jobsdb_spark.operators.similarity import minhash_candidate_pairs

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = minhash_candidate_pairs(corpus, "doc_id", "text", k=32, bands=8)
    drops = dedup_keep_list(pairs).filter(~F.col("keep")).select(
        F.col("id").alias("doc_id")
    )
    return corpus.join(drops, "doc_id", "left_anti").select("doc_id")


@_register(
    "dedup_pipeline_winnowing",
    oracle=r"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM corpus
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), rare AS (
        SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= 50
    ), pruned AS (
        SELECT f.doc_id, f.h FROM fps f JOIN rare USING (h)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pruned GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fp
        FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s
        JOIN sizes sa ON s.id_a = sa.doc_id
        JOIN sizes sb ON s.id_b = sb.doc_id
        WHERE s.shared_fp * 1000 >= 800 * least(sa.n_fp, sb.n_fp)
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(id, label) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS component FROM reach GROUP BY id
    )
    SELECT doc_id FROM corpus
    WHERE doc_id NOT IN (SELECT id FROM comp WHERE component < id)
    """,
)
def q_dedup_pipeline_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship dedup composition with a FULL value-hash oracle: corpus
    (+injected near-dups) → winnowing-fingerprint containment pairs
    (integer-exact, operators/textops.py) → pointer-jumping connected
    components → keep list → surviving corpus. Same pipeline shape as
    ``dedup_pipeline_end_to_end`` but the candidate stage is deterministic
    in any engine, so the ENTIRE composition is oracle-checkable — the
    oracle recomputes the fingerprint containment join and resolves
    clusters with a recursive CTE (min reachable id), which must agree
    bit-for-bit with the distributed pointer-jumping loop."""
    from scraping_jobsdb_spark.operators.graph import dedup_keep_list
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint_containment_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = fingerprint_containment_pairs(
        corpus, threshold_milli=800, k=8, w=4, max_df=50
    )
    drops = dedup_keep_list(pairs).filter(~F.col("keep")).select(
        F.col("id").alias("doc_id")
    )
    return corpus.join(drops, "doc_id", "left_anti").select("doc_id")


@_register(
    "asof_join_latest_state",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.ts, c.event_id, p.value AS asof_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py): each click annotated with the
    user's latest purchase value at-or-before it. Spark: union-sort trick —
    one shuffle, last(ignorenulls) carry-forward, no candidate explosion.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from scraping_jobsdb_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, "user_id", "ts", "ts", ["value"]
    ).withColumnRenamed("asof_value", "asof_value")


@_register(
    "asof_join_forward_window",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, MAX(value) AS value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.ts, c.event_id,
           CASE WHEN p.ts IS NOT NULL
                     AND epoch(p.ts) - epoch(c.ts) <= 3600
                THEN p.value END AS asof_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def q_asof_join_forward_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (operators/temporal.py): each
    click annotated with the user's NEXT purchase value at-or-after it,
    nulled when that purchase is more than an hour out — the
    pandas-merge_asof(direction='forward', tolerance=...) surface,
    distributed. Same union-sort single-shuffle scan as the backward form
    (timestamp order reversed); the tolerance is a map post-pass on the
    carried right timestamp. Purchases pre-aggregate to one row per
    (user, ts) so the nearest-match tie is unambiguous in both engines.
    Oracle: DuckDB's native ASOF LEFT JOIN with the inequality flipped."""
    from scraping_jobsdb_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        clicks,
        purchases,
        "user_id",
        "ts",
        "ts",
        ["value"],
        direction="forward",
        tolerance_seconds=3600,
    )


@_register(
    "range_join_followups",
    oracle="""
    SELECT a.user_id, a.ts AS left_ts, b.ts AS right_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch(b.ts) >= epoch(a.ts) + 1
     AND epoch(b.ts) <= epoch(a.ts) + 300
    GROUP BY a.user_id, a.ts, b.ts
    """,
)
def q_range_join_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join (operators/temporal.py): events followed by
    another event of the same user within (1s, 5min]. Spark: bucket-banded
    equi-join (3 shifted copies) + exact refinement — candidates bounded by
    bucket occupancy instead of the per-user cross product."""
    from scraping_jobsdb_spark.operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return range_join(ev, ev, "user_id", "ts", "ts", 1, 300)


@_register(
    "events_stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.ts AS purchase_ts, p.value AS purchase_value
    FROM events c JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def q_events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 stream-stream inner join (clicks × following purchases within
    10 min, both sides watermarked so join state is evictable) drained with
    AvailableNow — same result set as the batch interval join the oracle
    runs."""
    from scraping_jobsdb_spark.streaming.windows import (
        click_purchase_stream_join,
        run_stream_to_memory,
    )

    return run_stream_to_memory(
        click_purchase_stream_join(spark, sf_dir), spark, output_mode="append"
    )


@_register(
    "scd2_supplier_balances",
    oracle="""
    WITH current AS (
        SELECT s_suppkey, s_acctbal, TIMESTAMP '2024-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM supplier
    ), incoming AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 3 = 0 THEN s_acctbal + 100 ELSE s_acctbal END
                   AS s_acctbal,
               TIMESTAMP '2024-02-01' AS valid_from
        FROM supplier
    ),
    closed AS (
        SELECT c.s_suppkey, c.s_acctbal, c.valid_from,
               CASE WHEN i.s_acctbal IS DISTINCT FROM c.s_acctbal
                    THEN i.valid_from ELSE c.valid_to END AS valid_to,
               CASE WHEN i.s_acctbal IS DISTINCT FROM c.s_acctbal
                    THEN FALSE ELSE c.is_current END AS is_current
        FROM current c LEFT JOIN incoming i ON i.s_suppkey = c.s_suppkey
    ),
    inserts AS (
        SELECT i.s_suppkey, i.s_acctbal, i.valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM incoming i JOIN current c ON c.s_suppkey = i.s_suppkey
        WHERE i.s_acctbal IS DISTINCT FROM c.s_acctbal
    )
    SELECT * FROM closed UNION ALL SELECT * FROM inserts
    """,
)
def q_scd2_supplier_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge (operators/merge.py): a balance change closes the
    open version at the incoming effective date and opens a new one;
    unchanged keys produce no spurious versions. One join + one anti-join,
    full-table rewrite — no row-level updates."""
    from scraping_jobsdb_spark.operators.merge import scd2_merge

    s = load_table(spark, sf_dir, "supplier")
    current = s.select(
        "s_suppkey",
        "s_acctbal",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    incoming = s.select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 3 == 0, F.col("s_acctbal") + 100)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
        F.lit("2024-02-01").cast("timestamp").alias("valid_from"),
    )
    return scd2_merge(
        current, incoming, ["s_suppkey"], ["s_acctbal"], "valid_from"
    )


@_register(
    "funnel_click_to_purchase",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id) AS first_click
        FROM events
    )
    SELECT user_id,
           MIN(first_click) AS first_click,
           MIN(CASE WHEN event_type = 'purchase' AND ts > first_click THEN ts END)
               AS first_purchase_after
    FROM seq GROUP BY user_id
    HAVING MIN(first_click) IS NOT NULL
    """,
)
def q_funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel / sequence detection: per user, the first click and the first
    purchase strictly after it (NULL = never converted) — the two-step
    funnel primitive, one window + one aggregate, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    seq = ev.withColumn(
        "first_click",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.min("first_click").alias("first_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).alias("first_purchase_after"),
        )
        .filter(F.col("first_click").isNotNull())
    )


@_register(
    "value_histogram_bins",
    oracle="""
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 500 THEN 11
                ELSE CAST(floor(value / 50) AS BIGINT) + 1 END AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS bin_total
    FROM events GROUP BY bin
    """,
)
def q_value_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (10 bins over [0, 500)):
    the one-pass distribution profile used by DQ dashboards and skew
    detection — groups on the computed bin, decimal-exact totals."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bin", F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10)))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "bin_total"
            ),
        )
    )


@_register(
    "unpivot_quality_metrics",
    oracle="""
    WITH m AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_bal,
               CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM m
    UNION ALL
    SELECT c_nationkey, 'total_bal', total_bal FROM m
    UNION ALL
    SELECT c_nationkey, 'max_bal', max_bal FROM m
    """,
)
def q_unpivot_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (the inverse of pivot_priority_by_status): wide
    per-nation metrics → long (nation, metric, value) rows via
    ``DataFrame.unpivot`` — one Expand node, no self-union of scans. The
    long form is what metric stores and DQ dashboards ingest."""
    c = load_table(spark, sf_dir, "customer")
    m = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(30,4)"))
        .cast("double")
        .alias("total_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
    )
    return m.unpivot(
        ["c_nationkey"],
        ["n_customers", "total_bal", "max_bal"],
        "metric",
        "value",
    )


@_register(
    "scalar_map_pack",
    oracle="""
    WITH m AS (
        SELECT o_orderkey,
               MAP(['status', 'priority'], [o_orderstatus, o_orderpriority]) AS props
        FROM orders
    )
    SELECT o_orderkey,
           props['status'][1] AS status_val,
           array_to_string(map_keys(props), ',') AS key_list,
           CAST(cardinality(props) AS INT) AS n_keys
    FROM m
    """,
)
def q_scalar_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar operations (the typed form of the reference's JSON
    props blob, F4): construct from arrays, point lookup, key enumeration,
    cardinality — all JVM-side map expressions."""
    o = load_table(spark, sf_dir, "orders")
    props = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        props.getItem("status").alias("status_val"),
        F.array_join(F.map_keys(props), ",").alias("key_list"),
        F.size(F.map_keys(props)).cast("int").alias("n_keys"),
    )


@_register(
    "embedding_int8_cosine_topk",
    oracle=r"""
    WITH s AS (
        SELECT vec_id, embedding,
               greatest(list_max(list_transform(embedding, x -> abs(x)))
                        / 127.0, 1e-12) AS scale
        FROM embeddings
    ), q8 AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(x / scale) AS INTEGER)) AS codes
        FROM s
    ), n AS (
        SELECT vec_id, codes,
               CAST(list_sum(list_transform(codes,
                    c -> CAST(c AS BIGINT) * c)) AS BIGINT) AS n2
        FROM q8
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND(
                   CAST(list_dot_product(c.codes, q.codes) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))),
                   9) AS qcos
        FROM n c JOIN n q ON q.vec_id IN (0, 100, 200)
        WHERE c.vec_id != q.vec_id
    )
    SELECT query_id, vec_id, rank FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qcos DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_int8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 in the INT8-QUANTIZED domain (operators/similarity.py
    quantized_cosine_topk): scores come from the codes alone — the
    per-vector scales cancel in the cosine, so every sum is a
    small-integer sum and the score is one IEEE-exact √√×÷ chain. The
    first fully value-hash-oracled member of the int8 family (its float
    dequantize sibling stays rows-only): ranks re-derived exactly by
    DuckDB from the same round(x/scale) codes. Broadcast query set, one
    corpus scan, per-query window."""
    from scraping_jobsdb_spark.operators.similarity import quantized_cosine_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return quantized_cosine_topk(emb, query, k=10).withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@_register("embedding_quantized_topk", oracle=None)
def q_embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over int8-quantized embeddings (quantize → dequantize →
    exact search): the 4×-smaller storage path for billion-vector corpora.
    Rows-only (quantization error is by design); recall vs the float-exact
    top-k is asserted in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import (
        brute_force_topk,
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    deq = dequantize_embeddings_int8(quantize_embeddings_int8(emb))
    query = deq.filter(F.col("vec_id").isin(0, 100, 200))
    return brute_force_topk(deq, query, k=10).withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@_register(
    "scalar_misc_pack",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 1 AS odd_key,
           xor(o_orderkey, 21) AS xored,
           CAST(o_orderkey * 8 AS BIGINT) AS shifted,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           LEAST(o_totalprice, 100000.0) AS capped,
           GREATEST(o_totalprice, 1000.0) AS floored
    FROM orders
    """,
)
def q_scalar_misc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 closing pack: bitwise ops (bucket/shard math), NULLIF/COALESCE
    normalization (the engine's empty-string→NULL fix generalized),
    LEAST/GREATEST clamping — all codegen built-ins."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("odd_key"),
        k.bitwiseXOR(F.lit(21)).alias("xored"),
        F.shiftleft(k, 3).cast("bigint").alias("shifted"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.least("o_totalprice", F.lit(100000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("floored"),
    )


@_register(
    "window_moving_average",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS ma3,
           LAST_VALUE(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING
           ) AS next_or_self
    FROM orders
    """,
)
def q_window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 bounded frames both directions: trailing 3-row moving average
    (decimal-exact) and a following-frame last_value — the smoothing /
    look-ahead window shapes. Total order (date, key) keeps frames
    deterministic."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ma = base.rowsBetween(-2, Window.currentRow)
    nxt = base.rowsBetween(Window.currentRow, 1)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).over(ma).cast("double")
            / F.count(F.lit(1)).over(ma)
        ).alias("ma3"),
        F.last("o_orderkey").over(nxt).alias("next_or_self"),
    )


@_register("embedding_kmeans_cells", oracle=None)
def q_embedding_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means (Lloyd's, 5 rounds) over the embedding corpus,
    emitting per-cell sizes — the IVF centroid trainer (similarity.py).
    Iterative float algorithm → rows-only; quantizer-improvement property
    asserted in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import cosine, kmeans_fit

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cents = kmeans_fit(emb, n_centroids=8, max_iter=5)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", cosine(F.col("embedding"), F.col("centroid")).alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c").desc(), F.col("cell"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cell")
    )
    return assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))


@_register(
    "sorted_page_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def q_sorted_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 keyset pagination: page 3 of a 50-row listing under a total
    order (price desc, key tiebreak) via offset+limit. Spark still plans a
    single TakeOrderedAndProject of offset+limit rows — no global sort
    materialization. (At scale prefer keyset predicates over deep offsets;
    this declares the operator, the docstring declares the caveat.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(100)
        .limit(50)
    )


@_register(
    "try_cast_error_safe_pack",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
           TRY_CAST(o_orderstatus AS DOUBLE) AS status_num,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM orders
    """,
)
def q_try_cast_error_safe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 error-safe casts: TRY_CAST yields NULL instead of failing on
    malformed input — the principled form of the reference's empty-string
    sentinel + post-cast cleanup (``ParseHtml.py:65-71``, ``utils.py:44-47``).
    'N-priority' strings fail to int (NULL); their leading digit succeeds."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_to_number("o_orderpriority", F.lit("999")).cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_rank"),
        F.col("o_orderstatus").try_cast("double").alias("status_num"),
        F.col("o_orderkey").cast("string").try_cast("bigint").alias("key_roundtrip"),
    )


@_register(
    "deterministic_sample_split",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0a'
                        THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '14'
                        THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
)
def q_deterministic_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/val/test split (~4%/4%/92% via md5-prefix bands):
    the reproducible sampling a training pipeline needs — membership is a
    pure function of the id, so re-runs, engines, and partitionings all
    agree, and adding documents never reshuffles existing splits (unlike
    seeded ``df.sample``, whose membership depends on partition layout)."""
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = docs.select(
        "doc_id",
        F.when(pfx < "0a", "test").when(pfx < "14", "val").otherwise("train").alias(
            "split"
        ),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@_register(
    "multimodal_corpus_prep",
    oracle="""
    WITH media AS (
        SELECT doc_id, source, text,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ), deduped AS (
        -- sha256 over the text == sha256 over its utf-8 bytes (what the
        -- engine digests); this DuckDB build's sha256 binds VARCHAR only
        SELECT doc_id, source, n_bytes FROM (
            SELECT doc_id, source, n_bytes,
                   ROW_NUMBER() OVER (
                       PARTITION BY sha256(text) ORDER BY doc_id
                   ) AS rn
            FROM media
        ) WHERE rn = 1
    ), quality AS (
        SELECT * FROM deduped WHERE n_bytes BETWEEN 50 AND 5000
    ), capped AS (
        SELECT doc_id, source, n_bytes FROM (
            SELECT doc_id, source, n_bytes,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM quality
        ) WHERE rk <= 50
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM capped GROUP BY source
    """,
)
def q_multimodal_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal corpus prep over opaque binary payloads (the
    utf-8 bytes of each document standing in for image/audio content, as in
    the other multimodal stages): content-digest exact dedup (first doc_id
    per sha256 wins), size-window quality gate, deterministic per-source
    cap (operators/sampling.py stratified_exact_sample), per-source rollup.
    The binary-pipeline composition story — every stage the digest/decode/
    sample operators provide, chained and value-hash-verified. Two window
    shuffles + one aggregate; the payloads never leave the JVM (digest and
    length are built-ins), which is exactly how a 100 TB media crawl should
    run its metadata passes."""
    from scraping_jobsdb_spark.operators.sampling import stratified_exact_sample

    media = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.encode("text", "utf-8").alias("content"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    w = Window.partitionBy(F.sha2("content", 256)).orderBy("doc_id")
    deduped = (
        media.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_bytes")
    )
    quality = deduped.filter(F.col("n_bytes").between(50, 5000))
    capped = stratified_exact_sample(quality, ["source"], "doc_id", 50)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@_register(
    "stratified_sample_per_lang",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    WHERE rk <= 20
    """,
)
def q_stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/sampling.py): exactly 20
    documents per language, ranked by (md5(doc_id), doc_id) within each
    stratum — the balanced per-class subset / per-language cap primitive of
    a corpus pipeline. Unlike seeded df.sample, membership is a pure
    function of the data (engine- and partitioning-independent), which is
    what makes it value-hash-checkable at all. One shuffle on the stratum
    key."""
    from scraping_jobsdb_spark.operators.sampling import stratified_exact_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return stratified_exact_sample(docs, ["lang"], "doc_id", 20)


@_register(
    "decontamination_exact_overlap",
    oracle="""
    WITH bench AS (
        SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
        FROM documents WHERE doc_id % 100 = 0
    ), train AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
        FROM documents WHERE doc_id % 100 <> 0
    )
    SELECT t.doc_id
    FROM train t
    WHERE t.fp IN (SELECT fp FROM bench)
    """,
)
def q_decontamination_exact_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (exact tier): training docs whose
    whitespace/case-normalized fingerprint collides with the held-out
    benchmark set (every 100th doc plays the benchmark) — the semi-join that
    runs before every training corpus ships. The benchmark side is tiny →
    broadcast; at scale the near-dup tier (MinHash pairs restricted to
    train×bench) layers on the same shape."""
    from scraping_jobsdb_spark.operators.textops import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select(fingerprint("text").alias("fp"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 100 != 0).select(
        "doc_id", fingerprint("text").alias("fp")
    )
    return train.join(F.broadcast(bench), "fp", "left_semi").select("doc_id")


@_register(
    "explode_outer_null_preserving",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               CASE WHEN o_custkey % 7 = 0 THEN []
                    ELSE [o_custkey % 3, o_custkey % 5] END AS tags
        FROM (SELECT DISTINCT o_custkey FROM orders)
    )
    SELECT g.o_custkey, u.tag
    FROM g LEFT JOIN (
        SELECT o_custkey, UNNEST(tags) AS tag FROM g
    ) u USING (o_custkey)
    """,
)
def q_explode_outer_null_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 null-preserving fan-out: explode_outer keeps parents with empty
    arrays as a NULL-element row (plain explode silently drops them — the
    classic lost-rows bug in link-extraction pipelines). Every 7th customer
    gets an empty tag set."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    g = o.select(
        "o_custkey",
        F.when(
            F.col("o_custkey") % 7 == 0, F.array().cast("array<bigint>")
        ).otherwise(
            F.array(F.col("o_custkey") % 3, F.col("o_custkey") % 5)
        ).alias("tags"),
    )
    return g.select("o_custkey", F.explode_outer("tags").alias("tag"))


@_register(
    "array_set_ops_pack",
    oracle="""
    WITH g AS (
        SELECT l_orderkey,
               list_sort(list_distinct(list(l_partkey % 10))) AS a,
               list_sort(list_distinct(list(l_suppkey % 10))) AS b
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '')
               AS common,
           COALESCE(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '')
               AS a_only,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS unioned
    FROM g
    """,
)
def q_array_set_ops_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except / union) over per-order bucket
    sets — the token-set operations behind Jaccard and vocabulary diffing,
    emitted sorted+joined so the comparison is representation-free."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list(F.col("l_partkey") % 10))).alias("a"),
        F.array_sort(F.array_distinct(F.collect_list(F.col("l_suppkey") % 10))).alias("b"),
    )
    j = lambda c: F.array_join(F.transform(c, lambda x: x.cast("string")), ",")
    return g.select(
        "l_orderkey",
        j(F.array_sort(F.array_intersect("a", "b"))).alias("common"),
        j(F.array_sort(F.array_except("a", "b"))).alias("a_only"),
        j(F.array_sort(F.array_union("a", "b"))).alias("unioned"),
    )


@_register(
    "robust_stats_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, QUANTILE_CONT(value, 0.5) AS m
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           MIN(med.m) AS median_value,
           QUANTILE_CONT(abs(e.value - med.m), 0.5) AS mad
    FROM events e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type
    """,
)
def q_robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: median absolute deviation per event type — the
    outlier-detection primitive that survives the heavy tails mean/stddev
    DQ checks choke on. Two aggregates; the per-group median broadcasts back
    into the deviation pass. Double interpolation is identical arithmetic in
    both engines (same operands → same doubles)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("m"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("m").alias("median_value"),
            F.percentile(F.abs(F.col("value") - F.col("m")), 0.5).alias("mad"),
        )
    )


@_register(
    "gaps_and_islands",
    oracle="""
    WITH keys AS (
        SELECT DISTINCT o_orderkey FROM orders
    ), tagged AS (
        SELECT o_orderkey,
               o_orderkey - ROW_NUMBER() OVER (ORDER BY o_orderkey) AS island
        FROM keys
    )
    SELECT MIN(o_orderkey) AS island_start,
           MAX(o_orderkey) AS island_end,
           COUNT(*) AS island_size
    FROM tagged GROUP BY island
    """,
)
def q_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive keys via the
    value-minus-row_number identity — the streak/contiguity primitive behind
    retention streaks, missing-id audits, and compaction planning. One sort
    + one aggregate."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    w = Window.orderBy("o_orderkey")
    tagged = o.withColumn(
        "island", F.col("o_orderkey") - F.row_number().over(w)
    )
    return tagged.groupBy("island").agg(
        F.min("o_orderkey").alias("island_start"),
        F.max("o_orderkey").alias("island_end"),
        F.count(F.lit(1)).alias("island_size"),
    ).drop("island")


# ---------------------------------------------------------------------------
# Transactional table layer (sources/txn.py)
# ---------------------------------------------------------------------------


@_register(
    "merge_upsert_txn",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 0
    ), source AS (
        SELECT o_orderkey, o_custkey,
               o_totalprice + 1000.0 AS new_price, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT t.o_orderkey, t.o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price
                ELSE t.o_totalprice END AS o_totalprice,
           t.o_orderstatus
    FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_custkey % 7 = 0)
    UNION ALL
    SELECT s.o_orderkey, s.o_custkey, s.new_price, s.o_orderstatus
    FROM source s LEFT JOIN target t ON s.o_orderkey = t.o_orderkey
    WHERE t.o_orderkey IS NULL
    """,
)
def q_merge_upsert_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional MERGE (J2/A3 unified, sources/txn.py): build a txn table
    from a deterministic orders slice, MERGE a source slice into it —
    matched rows update their price (or delete when the source custkey % 7
    hits), unmatched source rows insert — and return the committed snapshot.
    The reference's UPDATE…FROM + ON CONFLICT semantics
    (``sql/impute_salary_update_parsed_jobs_table.sql:1-7``,
    ``sql/scrape_url_insert_data.sql:1-4``) in one atomic copy-on-write
    commit. Exercises the real write path: data files + manifest land under
    a scratch dir, the read is the published snapshot. The table is
    BUCKETED on the merge key (manifest-recorded write distribution):
    the target side of the MERGE's full-outer join arrives pre-hashed, so
    the join exchanges only the source — one shuffle per merge instead of
    two, the dominant saving for a repeatedly-upserted keyed table
    (plan-pinned in tests/test_txn.py)."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 1000.0).alias("new_price"),
        "o_orderstatus",
    )
    table = TxnTable.create(
        spark,
        tempfile.mkdtemp(prefix="sjs_merge_q_"),
        target,
        bucket_by=["o_orderkey"],
        n_buckets=8,
    )
    table.merge(
        source,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": "new_price"},
        when_matched_delete=F.col("s.o_custkey") % 7 == 0,
    )
    return table.read()


@_register(
    "cdc_row_changes_txn",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ), src AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS new_price
        FROM orders WHERE o_orderkey % 5 = 0
    ), v2 AS (
        SELECT t.o_orderkey, t.o_custkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price
                    ELSE t.o_totalprice END AS o_totalprice
        FROM v1 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_custkey % 11 = 0)
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.new_price
        FROM src s LEFT JOIN v1 t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL
    )
    SELECT o_orderkey, o_custkey, o_totalprice, 'delete' AS _change_type
    FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'insert' AS _change_type
    FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
    """,
)
def q_cdc_row_changes_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between txn-table snapshots (sources/txn.py
    ``read_row_changes``): build v1 from a deterministic orders slice, MERGE
    a second slice (update matched, delete when custkey % 11 hits, insert
    unmatched) to make v2, then emit the v1→v2 change feed — every update
    surfaces as its delete+insert pair. The oracle recomputes both
    snapshots in SQL and diffs them with EXCEPT ALL, the same multiset
    semantics as the engine's exceptAll form. This is the downstream-sync
    edge the reference lacks entirely (its pipelines re-export full CSVs,
    ``airflow/dags/export_to_csv.py:12-26``); at 100 TB shipping the delta
    is the only viable feed."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 500.0).alias("new_price"),
    )
    table = TxnTable.create(spark, tempfile.mkdtemp(prefix="sjs_cdc_q_"), v1)
    from_version = table.version()
    table.merge(
        src,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": "new_price"},
        when_matched_delete=F.col("s.o_custkey") % 11 == 0,
    )
    return table.read_row_changes(from_version)


@_register(
    "cdc_row_changes_bucketed_txn",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ), src AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS new_price
        FROM orders WHERE o_orderkey % 5 = 0
    ), v2 AS (
        SELECT t.o_orderkey, t.o_custkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price
                    ELSE t.o_totalprice END AS o_totalprice
        FROM v1 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_custkey % 11 = 0)
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.new_price
        FROM src s LEFT JOIN v1 t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL
    )
    SELECT o_orderkey, o_custkey, o_totalprice, 'delete' AS _change_type
    FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'insert' AS _change_type
    FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
    """,
)
def q_cdc_row_changes_bucketed_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same v1→MERGE→v2 change feed as ``cdc_row_changes_txn``, on a
    table BUCKETED by the merge key — which switches ``read_row_changes``
    onto its co-bucketed physical path: per-bucket multiplicity counts and
    a co-partitioned full-outer join, ZERO global exchange (plan-pinned in
    tests/test_txn.py), instead of the two-scan exceptAll that shuffles
    both snapshots on all columns. Identical oracle as the unbucketed
    query: bucketing is a physical layout, never a semantic change — and
    this row proves it with a value hash."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 500.0).alias("new_price"),
    )
    table = TxnTable.create(
        spark,
        tempfile.mkdtemp(prefix="sjs_cdc_qb_"),
        v1,
        bucket_by=["o_orderkey"],
        n_buckets=8,
    )
    from_version = table.version()
    table.merge(
        src,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": "new_price"},
        when_matched_delete=F.col("s.o_custkey") % 11 == 0,
    )
    return table.read_row_changes(from_version)


@_register(
    "cdc_apply_changes_txn",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ), src AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS new_price
        FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT t.o_orderkey, t.o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price
                ELSE t.o_totalprice END AS o_totalprice
    FROM v1 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_custkey % 11 = 0)
    UNION ALL
    SELECT s.o_orderkey, s.o_custkey, s.new_price
    FROM src s LEFT JOIN v1 t ON s.o_orderkey = t.o_orderkey
    WHERE t.o_orderkey IS NULL
    """,
)
def q_cdc_apply_changes_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full replication loop, value-hash checked end to end: table A
    takes a MERGE (update/delete/insert), its v1→v2 row-change feed is
    READ (``read_row_changes``) and APPLIED (``apply_changes``) to an
    independent copy B created from v1 — and B must now equal A@v2, which
    the oracle recomputes directly in SQL. Ship the delta, not the table:
    the downstream-sync shape that replaces the reference's full-CSV
    re-exports at any scale where re-shipping the table is unthinkable."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 500.0).alias("new_price"),
    )
    a = TxnTable.create(spark, tempfile.mkdtemp(prefix="sjs_cdc_a_"), v1)
    b = TxnTable.create(spark, tempfile.mkdtemp(prefix="sjs_cdc_b_"), v1)
    from_version = a.version()
    a.merge(
        src,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": "new_price"},
        when_matched_delete=F.col("s.o_custkey") % 11 == 0,
    )
    b.apply_changes(a.read_row_changes(from_version))
    return b.read()


@_register(
    "cdc_appends_since_txn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 7 = 1 OR o_orderkey % 7 = 2
    """,
)
def q_cdc_appends_since_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only CDC (``read_appends_since``): checkpoint a version, keep
    committing appends, poll exactly the new rows — the incremental-consumer
    contract. Two appends after the checkpointed create must surface both
    slices and nothing from the base. File-precise (the manifest delta IS
    the row delta for append commits) — zero compute, zero write-path cost,
    vs the snapshot-diff form in ``cdc_row_changes_txn``."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    table = TxnTable.create(spark, tempfile.mkdtemp(prefix="sjs_cdcapp_q_"), base)
    checkpoint = table.version()
    for rem in (1, 2):
        table.append(
            orders.filter(F.col("o_orderkey") % 7 == rem).select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
        )
    return table.read_appends_since(checkpoint)


@_register(
    "dq_bounds_observed",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           {_dsum_sql('o_totalprice')} AS total_spend
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_dq_bounds_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5, zero-extra-pass form: DQ metrics ride the SAME job as the real
    aggregate via ``df.observe`` (operators/checks.py:observed) — at 100 TB a
    separate checking pass doubles the scan bill, so the engine's canonical
    DQ shape is in-flight observation. The bounds/null assertions
    (bounds_check semantics on o_totalprice, null_check on o_custkey) raise
    on violation after the action; the returned frame is the per-status
    rollup the job computed."""
    import uuid as _uuid

    from scraping_jobsdb_spark.operators.checks import observed

    orders = load_table(spark, sf_dir, "orders")
    obsd, handle = observed(
        orders,
        f"dq_gate_{_uuid.uuid4().hex[:8]}",
        {
            "n_rows": F.count(F.lit(1)),
            "null_custkeys": F.sum(F.col("o_custkey").isNull().cast("int")),
            "min_price": F.min("o_totalprice"),
            "max_price": F.max("o_totalprice"),
        },
    )
    out = obsd.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        _dsum("o_totalprice").alias("total_spend"),
    )
    out.count()  # one action: the metrics ride this job
    m = handle.get()
    if m["null_custkeys"] != 0 or m["min_price"] < 0 or m["n_rows"] == 0:
        raise AssertionError(f"DQ gate failed: {m}")
    return out


@_register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha16
    FROM documents
    """,
)
def q_multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked end to end: a binary content
    column (utf-8 bytes of the document text standing in for an opaque
    payload) crosses into Python as Arrow batches via mapInPandas — the
    exact decode-stage shape of operators/multimodal.py (pruned projection,
    per-row failure isolation) — and the Python side's computed features
    (byte length, sha256 prefix) are verified against DuckDB computing the
    same from the text. Proves the binary-column round trip through Arrow
    byte-for-byte, not just rows-only."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "sha16": []}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                out["doc_id"].append(did)
                try:
                    b = bytes(content)
                    out["n_bytes"].append(len(b))
                    out["sha16"].append(hashlib.sha256(b).hexdigest()[:16])
                except Exception:  # per-row isolation, as in multimodal.py
                    out["n_bytes"].append(None)
                    out["sha16"].append(None)
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, "doc_id bigint, n_bytes bigint, sha16 string")


@_register(
    "multimodal_resize_stage",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               octet_length(encode(text)) AS blen
        FROM documents
        WHERE text IS NOT NULL
    )
    SELECT doc_id AS media_id,
           4 AS width,
           4 AS height,
           CAST(
               8 + least(
                   greatest(1, (blen * 16) // ((2 + doc_id % 7) * (3 + doc_id % 5))),
                   blen
               ) AS BIGINT
           ) AS n_bytes
    FROM d
    """,
)
def q_multimodal_resize_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-resize stage (operators/multimodal.py:resize_images) run
    end to end against an oracle: media payloads are built JVM-side from the
    documents table — a big-endian (w,h) header via unhex(lpad(hex(.)))
    packing plus the utf-8 text bytes as the 'pixel' body — and the real
    mapInPandas resize stage (pruned projection, per-row failure isolation)
    applies the deterministic stand-in resizer. DuckDB mirrors the resizer's
    arithmetic (area-proportional byte keep, floor division) on the same
    source, so the header construction, the Arrow binary crossing, and the
    Python resize arithmetic are all value-hash verified. The real-codec
    hook stays injectable; only the codec itself is faked (none ships in
    this runtime)."""
    from scraping_jobsdb_spark.operators.multimodal import (
        fake_image_resizer,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    def be32(c: Column) -> Column:
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    w = (F.lit(2) + F.col("doc_id") % 7).cast("int")
    h = (F.lit(3) + F.col("doc_id") % 5).cast("int")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(be32(w), be32(h), F.encode("text", "utf-8")).alias("content"),
    )
    resized = resize_images(media, 4, 4, resizer=fake_image_resizer)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.length("content").cast("bigint").alias("n_bytes"),
    )


@_register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(f AS BIGINT) AS frame_idx,
           sha256(text || ':' || CAST(f AS VARCHAR)) AS frame_hex
    FROM documents, generate_series(0, 3, 2) AS g(f)
    WHERE text IS NOT NULL
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video frame-sampling stage (operators/multimodal.py:
    sample_video_frames) run end to end against an oracle: each document
    becomes a fake 4-frame video — header (n_frames, frame_len) + four
    32-byte frames, where frame f is the sha256 digest of 'text:f', all
    constructed JVM-side (sha2 → unhex → concat) — then the real
    mapInPandas generator-UDTF stage splits the payload per its header and
    keeps every 2nd frame. Emitting hex(frame) lets DuckDB state the
    expected frame bytes as the sha256 hex it can compute directly, so the
    binary fan-out (one video row → kept-frame rows) is verified
    byte-for-byte without blob slicing in the oracle."""
    from scraping_jobsdb_spark.operators.multimodal import (
        fake_frame_splitter,
        sample_video_frames,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    def be32(v: int) -> Column:
        return F.unhex(F.lit(f"{v:08x}"))

    def frame(f: int) -> Column:
        return F.unhex(
            F.sha2(F.concat(F.col("text"), F.lit(f":{f}")), 256)
        )

    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            be32(4), be32(32), frame(0), frame(1), frame(2), frame(3)
        ).alias("content"),
    )
    frames = sample_video_frames(media, every_n=2, splitter=fake_frame_splitter)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


@_register("embedding_pq_topk", oracle=None)
def q_embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): train an m=8, k=16
    codebook, encode the corpus to 8-byte code arrays, ADC-score via literal
    lookup tables, exact-cosine re-rank of the top 4k candidates. The
    memory-scale rung of the ANN ladder (codes are 32x smaller than float32
    vectors). Approximate → rows-only; recall vs brute force asserted in
    tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    codebook = pq_train(emb, m=8, k=16, max_iter=4)
    codes = pq_encode(emb, codebook)
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return pq_topk(codes, codebook, query, k=10, refine_with=emb, refine_factor=4)


@_register("embedding_ivfpq_topk", oracle=None)
def q_embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/pq.py ivfpq_topk): the composed FAISS-IVFADC
    shape — map-expression cell assignment (no crossJoin, no window
    shuffle), fused encode+assign scan, driver-baked probe lists that
    become partition pruning on a cell-partitioned codes table, ADC over
    the probed 3/10 cells only, exact-cosine re-rank of the top 4k. The
    scale path that replaces the exact GEMM near-dup at 100×. Approximate →
    rows-only; recall + determinism asserted in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.pq import ivfpq_topk, pq_train

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    codebook = pq_train(emb, m=8, k=16, max_iter=4)
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return ivfpq_topk(
        emb, query, codebook, n_centroids=10, n_probe=3, k=10, refine_factor=4
    )


@_register("reference_pipeline_e2e", oracle=None)
def q_reference_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OWN end-to-end path (SURVEY §3.1-3.3) as one run:
    ingest (param-grid fan-out → rate-limited fetch via mapInPandas →
    link explode → exactly-once raw memberships → dedup → catalog
    anti-join → detail fetch → date-partitioned lake write) → parse
    (HTML extraction over lake docs not yet parsed) → impute (salary
    intervals MERGEd into the parsed table) — against the deterministic
    offline site (sources/fake_site.py), exactly as the e2e pytest drives
    it. Returns the final parsed-and-imputed table. Independent of sf_dir
    by construction (the corpus is the fake site's); registered rows-only
    so the driver and bench exercise the composed pipeline every round —
    the reference's Airflow DAG surface (airflow/dags/scrape_url.py,
    parse_html.py, impute SQL) had only pytest evidence before."""
    import tempfile
    from datetime import date as _date

    from scraping_jobsdb_spark.pipelines.impute import impute
    from scraping_jobsdb_spark.pipelines.ingest import ingest
    from scraping_jobsdb_spark.pipelines.parse import parse
    from scraping_jobsdb_spark.sources.fake_site import fake_transport
    from scraping_jobsdb_spark.sources.txn import read_table_any

    base = tempfile.mkdtemp(prefix="sjs_ref_e2e_")
    ingest(
        spark,
        fake_transport,
        lake_path=f"{base}/lake",
        raw_path=f"{base}/raw",
        catalog_path=f"{base}/catalog",
        run_date=_date(2026, 8, 13),
        fetch_partitions=8,
    )
    parse(spark, f"{base}/lake", f"{base}/parsed")
    impute(spark, f"{base}/raw", f"{base}/parsed")
    # The driver's pandas canonicalizer cannot sort list columns, so the
    # array<string> job_functions column is serialized to a joined string
    # (the same workaround term_postings_index uses for its posting list;
    # also the reference's own CSV-export serialization, pipelines/export.py).
    return read_table_any(spark, f"{base}/parsed").withColumn(
        "job_functions", F.array_join("job_functions", ";")
    )


@_register("embedding_ann_index_topk", oracle=None)
def q_embedding_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED ANN index probe (operators/pq.py write_ann_index +
    ann_index_topk): the IVF-PQ index materialized as a cell-PARTITIONED
    codes table plus two codebook-scale side tables, then queried — each
    query's probe list bakes into a ``cell IN (...)`` predicate, so
    partition pruning restricts the scan to n_probe of n_centroids
    directories; unprobed cell files are never listed or opened
    (PartitionFilters plan-asserted in tests/test_similarity.py). Exercises
    the driver on the pruned-read path itself, not just the in-memory twin
    (row-identical to ivfpq_topk under a shared quantizer — tested).
    Approximate by design → rows-only; recall + determinism + pruning
    asserted in pytest."""
    import tempfile

    from scraping_jobsdb_spark.operators.pq import (
        ann_index_topk,
        pq_train,
        write_ann_index,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    codebook = pq_train(emb, m=8, k=16, max_iter=4)
    path = tempfile.mkdtemp(prefix="sjs_ann_q_")
    write_ann_index(emb, path, codebook, n_centroids=10)
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return ann_index_topk(
        spark, path, query, n_probe=3, k=10, refine_factor=4, refine_with=emb
    )


@_register("embedding_ann_index_txn_lifecycle", oracle=None)
def q_embedding_ann_index_txn_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRANSACTIONAL ANN index, full lifecycle in one plan (operators/pq.py
    write_ann_index_txn family — the production posture of the persisted
    index): train on the corpus, build the index over HALF of it as one
    atomic commit, admit the other half via add-after-train (a second
    atomic commit), MoR-DELETE a slice of vectors (a deletion vector — no
    cell data rewritten; the embedding-store GDPR path), then probe. The
    probe reads the union of per-cell manifest-stats-pruned scans
    (read_pruned: unprobed cells' files never open — the txn equivalent of
    partition pruning) with the DV overlay hiding deleted vectors.
    Approximate scores by design → rows-only; add-equals-rebuild,
    epoch-idempotent streaming admission, delete/time-travel semantics,
    and file skipping all asserted in tests/test_similarity.py."""
    import tempfile

    from scraping_jobsdb_spark.operators.pq import (
        ann_index_txn_add,
        ann_index_txn_delete,
        ann_index_txn_topk,
        pq_train,
        write_ann_index_txn,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    codebook = pq_train(emb, m=8, k=16, max_iter=4)
    path = tempfile.mkdtemp(prefix="sjs_annx_q_")
    write_ann_index_txn(
        emb.filter(F.col("vec_id") % 2 == 0), path, codebook, n_centroids=10
    )
    ann_index_txn_add(spark, path, emb.filter(F.col("vec_id") % 2 == 1))
    ann_index_txn_delete(spark, path, F.col("vec_id") % 97 == 3)
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return ann_index_txn_topk(
        spark, path, query, n_probe=3, k=10, refine_factor=4, refine_with=emb
    )


@_register(
    "llm_corpus_prep",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    ), quality AS (
        SELECT doc_id, text,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM corpus
        WHERE len(string_split_regex(trim(text), '\\s+')) >= 5
          AND length(text) >= 20
    ), deduped AS (
        SELECT doc_id, text, n_tokens FROM (
            SELECT doc_id, text, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ), bench AS (
        SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
        FROM documents WHERE doc_id % 100 = 0
    ), clean AS (
        SELECT d.doc_id, d.n_tokens
        FROM deduped d
        WHERE d.doc_id % 100 <> 0
          AND md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
              NOT IN (SELECT fp FROM bench)
    )
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0a' THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '14' THEN 'val'
                ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM clean GROUP BY 1
    """,
)
def q_llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM training-data pipeline end to end, fully oracle-checked:
    ingest (with injected duplicates) → quality filter (token/char floors) →
    exact content dedup (keep lowest id) → decontamination against the
    benchmark fingerprint set → content-hash train/val/test split →
    per-split corpus stats. Composes dedup_exact, the textops token counter,
    the decontamination anti-join, and the md5-band split — each stage
    individually gate-green, the composition verified here as one plan.
    Scale shape: two hash shuffles (dedup digest, final split agg) and one
    broadcast semi-join (the tiny benchmark fingerprint set); everything
    else is map-side."""
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    quality = corpus.withColumn(
        "n_tokens", token_count("text").cast("bigint")
    ).filter((F.col("n_tokens") >= 5) & (F.length("text") >= 20))
    deduped = dedup_first(
        quality.withColumn("__digest", F.md5("text")), ["__digest"], ["doc_id"]
    ).drop("__digest")
    norm_fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    bench = (
        docs.filter(F.col("doc_id") % 100 == 0).select(norm_fp.alias("fp")).distinct()
    )
    clean = (
        deduped.filter(F.col("doc_id") % 100 != 0)
        .withColumn("fp", norm_fp)
        .join(F.broadcast(bench), on="fp", how="left_anti")
    )
    pfx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = clean.select(
        "doc_id",
        "n_tokens",
        F.when(pfx < "0a", "test").when(pfx < "14", "val").otherwise("train").alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@_register(
    "term_postings_index",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents WHERE text IS NOT NULL
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM toks GROUP BY term
    """,
)
def q_term_postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + the sorted posting
    list (serialized as a comma-joined string: the driver's pandas
    canonicalizer cannot sort list-valued cells — the approx_distinct_
    sketch lesson — and a delimited string hashes identically everywhere).
    The retrieval-side artifact BM25/TF-IDF consume; one distinct + one
    aggregate shuffle, postings sorted under a total order so the index
    is byte-deterministic at any partitioning. At 100 TB the posting list
    per common term is large — this shape streams it through
    sort_array(collect_list) per term; terms are the shuffle key, so skew
    tooling (stop-term filters, max_df guards — see top_ngrams/winnowing)
    applies upstream."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).distinct()
    return toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings"),
    )


@_register(
    "leakage_safe_split_stats",
    oracle=r"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM corpus
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), rare AS (
        SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= 50
    ), pruned AS (
        SELECT f.doc_id, f.h FROM fps f JOIN rare USING (h)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pruned GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fp
        FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s
        JOIN sizes sa ON s.id_a = sa.doc_id
        JOIN sizes sb ON s.id_b = sb.doc_id
        WHERE s.shared_fp * 1000 >= 800 * least(sa.n_fp, sb.n_fp)
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(id, label) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS component FROM reach GROUP BY id
    ), assign AS (
        SELECT c.doc_id, COALESCE(p.component, c.doc_id) AS cluster_id
        FROM corpus c LEFT JOIN comp p ON c.doc_id = p.id
    ), tagged AS (
        SELECT doc_id, cluster_id,
               CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '0a'
                        THEN 'test'
                    WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '14'
                        THEN 'val'
                    ELSE 'train' END AS split
        FROM assign
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
)
def q_leakage_safe_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware splitting (operators/sampling.py:leakage_safe_split):
    near-dup CLUSTERS are the unit of train/val/test assignment, so two
    near-copies can never straddle an eval boundary — the leakage that a
    per-document hash split silently permits. Same injected-near-dup
    corpus and containment-pair stage as dedup_pipeline_winnowing; the
    oracle re-resolves clusters with a recursive CTE and re-derives the
    cluster-hash bands, verifying the per-split counts hash-exactly. The
    no-straddle invariant itself is asserted as a property test."""
    from scraping_jobsdb_spark.operators.sampling import leakage_safe_split
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint_containment_pairs,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = fingerprint_containment_pairs(
        corpus, threshold_milli=800, k=8, w=4, max_df=50
    )
    tagged = leakage_safe_split(corpus, pairs)
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@_register(
    "doc_bigram_perplexity",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
        FROM documents WHERE text IS NOT NULL
    ), grams AS (
        SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur
        FROM toks, unnest(range(1, len(ws))) AS t(i)
    ), bc AS (
        SELECT prev, cur, COUNT(*) AS bc FROM grams GROUP BY prev, cur
    ), ctx AS (
        SELECT prev, SUM(bc) AS ctx FROM bc GROUP BY prev
    ), vocab AS (
        SELECT COUNT(DISTINCT term) AS v FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
            FROM documents WHERE text IS NOT NULL
        )
    ), scored AS (
        SELECT g.doc_id,
               CAST(ROUND(-ln((b.bc + 1)
                              / CAST(c.ctx + (SELECT v FROM vocab) AS DOUBLE)),
                          9) AS DECIMAL(30,9)) AS s
        FROM grams g
        JOIN bc b ON b.prev = g.prev AND b.cur = g.cur
        JOIN ctx c ON c.prev = g.prev
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(s) AS DOUBLE) / COUNT(*) AS surprisal_nats
    FROM scored GROUP BY doc_id
    """,
)
def q_doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM perplexity filter (operators/textops.py bigram_surprisal —
    the CCNet/KenLM-style quality score, new r7): per-doc mean surprisal
    under the corpus's own add-one-smoothed bigram model. One level up
    from ``doc_unigram_surprisal``: it scores word ORDER, catching
    shuffled/templated text unigram stats can't see. Map-only bigram build
    (zip-with-tail, no per-position self-join), one (prev, cur) count
    aggregate whose context rollup is derived from the SAME table, hash
    join back onto the bigram stream, per-doc aggregate. Per-token nats
    rounded to 9 dp then DECIMAL-summed (the engine's ln-portability
    rule) → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import bigram_surprisal

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return bigram_surprisal(docs)


@_register(
    "doc_unigram_surprisal",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents WHERE text IS NOT NULL
    ), model AS (
        SELECT term, COUNT(*) AS tc FROM toks GROUP BY term
    ), total AS (
        SELECT CAST(SUM(tc) AS DOUBLE) AS tt FROM model
    ), scored AS (
        SELECT t.doc_id,
               CAST(ROUND(-ln(m.tc / (SELECT tt FROM total)), 9)
                    AS DECIMAL(30,9)) AS s
        FROM toks t JOIN model m USING (term)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(s) AS DOUBLE) / COUNT(*) AS surprisal_nats
    FROM scored GROUP BY doc_id
    """,
)
def q_doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality score (operators/textops.py:unigram_surprisal):
    per-doc mean surprisal under the corpus's own unigram model — low =
    boilerplate of common words, high = rare-word noise; both tails are
    quality-filter cuts. TF-IDF's plan family (one term aggregate,
    broadcast model join, per-doc aggregate); per-token nats rounded to
    9 dp then DECIMAL-summed so the mean is engine-exact."""
    from scraping_jobsdb_spark.operators.textops import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return unigram_surprisal(docs)


@_register(
    "bloom_point_lookup_txn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 3 = 0 AND o_orderkey = 4200
    """,
)
def q_bloom_point_lookup_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-indexed point lookup (sources/txn.py:read_point): create a
    bloom-indexed txn table over a hash-distributed orders slice, append a
    second commit, then answer ``o_orderkey = 4200`` scanning only the
    files whose per-file Bloom filter may contain the key — the
    Delta-style point-lookup index for exactly the layout where min/max
    stats prune nothing (hash-distributed writes span the whole key range
    in every file). The query asserts the prune actually bit (< half the
    snapshot's files survive) before returning, so the gate row is
    evidence of skipping, not just of filtering."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")

    def slice_rem(rem: int) -> DataFrame:
        # repartition → hash-distributed files: every file spans the whole
        # key range, the worst case for min/max and the case blooms exist for
        return (
            orders.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 2 == rem))
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartition(8)
        )

    t = TxnTable.create(
        spark,
        tempfile.mkdtemp(prefix="sjs_bloom_q_"),
        slice_rem(0),
        bloom_cols=["o_orderkey"],
        bloom_bits=65536,
    )
    t.append(slice_rem(1))
    total = len(t._manifest()["files"])
    kept = len(t.bloom_pruned_files("o_orderkey", 4200))
    assert kept < total / 2, f"bloom prune ineffective: {kept}/{total}"
    return t.read_point("o_orderkey", 4200)


@_register(
    "stats_regression_pack",
    oracle="""
    WITH d AS (
        SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(12,2)) AS xd,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS yd
        FROM lineitem
    ), s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(xd AS DECIMAL(30,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(yd AS DECIMAL(30,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(xd * xd AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(yd * yd AS DECIMAL(30,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(xd * yd AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        FROM d GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 9) AS slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
               / CAST(n AS DOUBLE), 9) AS intercept,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr
    FROM s
    """,
)
def q_stats_regression_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept and Pearson correlation per return flag —
    computed from EXACT sufficient statistics instead of Spark's
    order-dependent corr()/regr_*() aggregates: inputs snap to
    DECIMAL(12,2) (exact — quantity is integral, price has 2 decimals),
    the products and six sums stay in the decimal domain
    (order-independent; never a double→decimal cast of an inexact product,
    which rounds engine-dependently — the bug this query's first draft
    had), and the derivation is a fixed tree of IEEE exactly-rounded ops
    (+,-,*,/,sqrt). The statistics are partition-order-independent by
    construction; outputs round to 9 dp because a DECIMAL sum whose scaled
    integer exceeds 2^53 double-rounds through some engines'
    decimal→double cast (observed in DuckDB: int128→double then /10^scale
    — two roundings, last-ulp drift). The one-pass sufficient-stats shape
    is also the scale answer: one aggregate, no second scan, mergeable
    across shards."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,6)"
    xd = F.col("l_quantity").cast("decimal(12,2)")
    yd = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd.cast(dec)).cast("double").alias("sx"),
        F.sum(yd.cast(dec)).cast("double").alias("sy"),
        F.sum((xd * xd).cast(dec)).cast("double").alias("sxx"),
        F.sum((yd * yd).cast(dec)).cast("double").alias("syy"),
        F.sum((xd * yd).cast(dec)).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 9).alias("intercept"),
        F.round(cov_n / F.sqrt(var_x * var_y), 9).alias("corr"),
    )


@_register(
    "events_time_weighted_value",
    oracle="""
    WITH w AS (
        SELECT user_id, value,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
               LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)) * (nt - t)) AS DOUBLE)
               / CAST(SUM(nt - t) AS DOUBLE) AS twa_value,
           CAST(SUM(nt - t) AS BIGINT) AS observed_seconds
    FROM w WHERE nt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(nt - t) > 0
    """,
)
def q_events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean (operators/temporal.py:time_weighted_mean): per
    user, the average of ``value`` weighted by how long each observation
    was the user's latest — the piecewise-constant-signal statistic a
    plain AVG gets wrong whenever events arrive in bursts. One (user, ts)
    window + one aggregate; value x duration sums through DECIMAL so the
    mean is engine-exact."""
    from scraping_jobsdb_spark.operators.temporal import time_weighted_mean

    ev = load_table(spark, sf_dir, "events")
    out = time_weighted_mean(
        ev, ["user_id"], "ts", "value", order_tiebreak="event_id"
    )
    return out.filter(F.col("observed_seconds") > 0)


@_register(
    "weighted_sample_by_length",
    oracle="""
    SELECT doc_id, n_chars,
           ROUND(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) + 1) / 4294967297.0) / n_chars, 9) AS priority
    FROM documents WHERE n_chars > 0
    ORDER BY priority DESC, doc_id LIMIT 50
    """,
)
def q_weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (operators/sampling.py:
    weighted_priority_sample): 50 documents with inclusion probability
    proportional to length — Efraimidis–Spirakis priorities from an
    md5-uniform draw, so the weighted pick is a pure function of the data
    (engine-reproducible, unlike every RNG sampler). Map-only priorities +
    TakeOrderedAndProject; priorities rounded to 9 dp before ranking on
    both sides."""
    from scraping_jobsdb_spark.operators.sampling import weighted_priority_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_priority_sample(docs, "doc_id", "n_chars", k=50)


@_register(
    "cms_term_frequencies",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents WHERE text IS NOT NULL
    ), seeds AS (
        SELECT unnest(generate_series(0, 3)) AS seed
    ), cells AS (
        SELECT seed,
               CAST(('0x' || substr(md5(term), 1 + 7 * seed, 7)) AS BIGINT)
                   % 256 AS bucket,
               COUNT(*) AS n
        FROM toks, seeds
        GROUP BY 1, 2
    ), probes(term) AS (
        VALUES ('the'), ('data'), ('table'), ('spark'), ('merge'),
               ('window'), ('batch'), ('scan'), ('agg'), ('zzz-absent')
    ), probe_cells AS (
        SELECT p.term, s.seed,
               CAST(('0x' || substr(md5(p.term), 1 + 7 * s.seed, 7)) AS BIGINT)
                   % 256 AS bucket
        FROM probes p, seeds s
    )
    SELECT pc.term, MIN(COALESCE(c.n, 0)) AS est_n
    FROM probe_cells pc LEFT JOIN cells c USING (seed, bucket)
    GROUP BY pc.term
    """,
)
def q_cms_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (operators/sketches.py): build a 4×256 counter
    table over every corpus term in one aggregate, then answer ten
    point-frequency probes (including a never-seen term) from the sketch
    alone. The frequency-sketch sibling of hll_mergeable_sketches — and
    unlike binary-blob sketches, the DataFrame representation with an
    md5-derived hash makes the ENTIRE sketch engine-portable, so the gate
    verifies the estimates hash-exactly against DuckDB re-deriving the
    same sketch. Estimates are upper bounds by construction (asserted as
    a property in tests/test_scale_ops.py)."""
    from scraping_jobsdb_spark.operators.sketches import cms_build, cms_estimate

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    terms = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    sketch = cms_build(terms, "term", width=256, depth=4)
    probes = spark.createDataFrame(
        [(t,) for t in ("the", "data", "table", "spark", "merge",
                        "window", "batch", "scan", "agg", "zzz-absent")],
        "term string",
    )
    return cms_estimate(sketch, probes, "term", width=256, depth=4)


@_register(
    "decontamination_ngram_overlap",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM documents WHERE text IS NOT NULL
    ), grams AS (
        SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
        FROM tok, LATERAL unnest(generate_series(1, len(w) - 7)) AS t(i)
    ), test_g AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0
    ), train_g AS (
        SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 10 <> 0
    )
    SELECT doc_id, COUNT(*) AS n_hit_grams
    FROM train_g JOIN test_g USING (gram)
    GROUP BY doc_id
    """,
)
def q_decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram decontamination (operators/textops.py:
    decontaminate_ngram_overlap): train docs (doc_id % 10 != 0) sharing any
    verbatim 8-word passage with the benchmark slice (doc_id % 10 == 0) —
    the passage-level contamination sweep the exact-fingerprint form
    (decontamination_exact_overlap) can't see. Benchmark gram set
    broadcasts; the corpus is never shuffled on gram."""
    from scraping_jobsdb_spark.operators.textops import decontaminate_ngram_overlap

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return decontaminate_ngram_overlap(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        n=8,
    )


@_register(
    "incremental_mv_refresh",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders WHERE o_orderkey % 4 < 3
    GROUP BY o_orderstatus
    """,
)
def q_incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate view (sources/mv.py): build the
    per-status order rollup from a txn table, then fold two later append
    commits in via the manifest delta — each refresh aggregates ONLY the
    newly-added files and combines with the dimension-sized view state,
    never rescanning the base. The final view must equal the one-shot SQL
    aggregate over everything ingested — the MV maintenance invariant.
    This is the at-scale replacement for the reference's cron-recomputed
    summary SQL (airflow/dags/scrape_url.py re-aggregates the whole table
    every run). dsum keeps the running revenue in DECIMAL(30,4) so the
    incremental total is bit-identical to the batch one."""
    import tempfile

    from scraping_jobsdb_spark.sources.mv import IncrementalAggView
    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders")

    def slice_rem(rem: int) -> DataFrame:
        return orders.filter(F.col("o_orderkey") % 4 == rem).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )

    src_path = tempfile.mkdtemp(prefix="sjs_mv_src_")
    view_path = tempfile.mkdtemp(prefix="sjs_mv_view_")
    table = TxnTable.create(spark, src_path, slice_rem(0))
    mv = IncrementalAggView(
        spark,
        src_path,
        view_path,
        group_cols=["o_orderstatus"],
        measures={
            "n_orders": ("count", None),
            "revenue": ("dsum", "o_totalprice"),
            "min_price": ("min", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
        },
    )
    mv.refresh()  # full build at v1
    table.append(slice_rem(1))
    table.append(slice_rem(2))
    mv.refresh()  # folds exactly the two appended file sets
    return mv.read().select(
        "o_orderstatus",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        "min_price",
        "max_price",
    )


@_register(
    "bm25_doc_ranking",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS dl,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x = 'spark')) AS tf0,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x = 'merge')) AS tf1,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x = 'vector')) AS tf2
        FROM documents WHERE text IS NOT NULL
    ), stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) AS sum_dl,
               SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
               SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
               SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        FROM base
    )
    SELECT b.doc_id, CAST(b.dl AS BIGINT) AS dl,
           ROUND(
               ln(1 + (s.n_docs - s.df0 + 0.5) / (s.df0 + 0.5))
                 * b.tf0 * 2.2 / (b.tf0 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs)))
             + ln(1 + (s.n_docs - s.df1 + 0.5) / (s.df1 + 0.5))
                 * b.tf1 * 2.2 / (b.tf1 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs)))
             + ln(1 + (s.n_docs - s.df2 + 0.5) / (s.df2 + 0.5))
                 * b.tf2 * 2.2 / (b.tf2 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs))),
           9) AS bm25
    FROM base b CROSS JOIN stats s
    ORDER BY bm25 DESC, b.doc_id LIMIT 25
    """,
)
def q_bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (operators/textops.py:bm25_rank): top-25
    documents for the 3-term query (spark, merge, vector) with k1=1.2,
    b=0.75 — the ranking-grade retrieval scorer next to tfidf_top_terms'
    per-doc profiling. One pass over the corpus: map-only per-term tf +
    doc length, a 1-row global stats aggregate broadcast back, map-only
    scoring, TakeOrderedAndProject top-k. Scores rounded to 9 dp before
    ranking on BOTH sides so libm/summation-order ulps can't flip a rank
    (contract shared with embedding_topk_np)."""
    from scraping_jobsdb_spark.operators.textops import bm25_rank

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bm25_rank(docs, ("spark", "merge", "vector"), k=25)


@_register(
    "doc_segment_dedup_global",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents
    ), posn AS (
        SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - 1, 0) + 1, 3)) AS start
        FROM w
    ), seg AS (
        SELECT doc_id, start // 3 AS seg_id,
               array_to_string(ws[start + 1 : start + 3], ' ') AS seg
        FROM posn
    ), kept AS (
        SELECT doc_id, seg_id, seg,
               ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_id)
                   AS rn
        FROM seg
    )
    SELECT doc_id,
           string_agg(seg, ' ' ORDER BY seg_id) AS text_dedup,
           COUNT(*) AS n_segments_kept
    FROM kept WHERE rn = 1 GROUP BY doc_id
    """,
)
def q_doc_segment_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus exact line dedup (operators/textops.py
    dedup_segments_global): every document is cut into 3-word segments,
    only the globally-first occurrence of each distinct segment survives
    (total order: doc_id, position), and documents are reassembled from
    their survivors — fully-duplicated documents vanish. With the
    synthetic corpus' small vocabulary most segments collide, so the
    operator does heavy real work here. Map-only segmentation, one
    shuffle on the segment for the first-occurrence window, one on doc_id
    to reassemble; deterministic, so the rebuilt text is value-hash
    checked byte-for-byte."""
    from scraping_jobsdb_spark.operators.textops import dedup_segments_global

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return dedup_segments_global(docs, segment_words=3)


@_register(
    "quality_top_fraction_per_lang",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t, text
        FROM documents
    ), scored AS (
        SELECT doc_id, lang,
            ROUND(
              0.4 * (CASE WHEN len(t) >= 10 AND len(t) <= 100000
                          THEN 1.0 ELSE 0.0 END)
            + 0.3 * (CASE WHEN len(list_filter(t, x -> lower(x) IN
                              ('the','a','an','of','and','or','is','to','in')))
                              / len(t)
                              BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
            + 0.3 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                              / length(text)), 9) AS quality
        FROM toks
    ), ranked AS (
        SELECT doc_id, lang, quality,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY quality DESC, doc_id)
                   AS rank_in_group,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scored
    )
    SELECT doc_id, lang, quality, rank_in_group
    FROM ranked WHERE rank_in_group <= CEIL(n * 0.5)
    """,
)
def q_quality_top_fraction_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style per-language quality cut (operators/sampling.py
    top_fraction_per_group): keep the best half of each language by the
    composite quality score, ranked under a (score desc, doc_id) total
    order. The score is quantized to 9 dp on BOTH sides before ranking
    (the cross-engine double-ulp contract shared with bm25/embedding_topk_np)
    so near-equal scores cannot rank differently. One shuffle on lang;
    rank and group count share a single Window exec."""
    from scraping_jobsdb_spark.operators.sampling import top_fraction_per_group
    from scraping_jobsdb_spark.operators.textops import quality_score

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    scored = docs.select(
        "doc_id", "lang", F.round(quality_score("text"), 9).alias("quality")
    )
    return top_fraction_per_group(
        scored, ["lang"], F.col("quality"), 0.5, ["doc_id"]
    )


@_register(
    "skew_join_salted",
    oracle=f"""
    WITH dim(event_type, weight) AS (
        VALUES ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
               ('signup', 2.0), ('error', 0.25)
    )
    SELECT e.event_type, CAST(d.weight AS DOUBLE) AS weight,
           COUNT(*) AS n_events, {_dsum_sql('e.value')} AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type, d.weight
    """,
)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-spread dimension join (operators/scale.py salted_join): events
    join a 5-row weight dimension on event_type — a key whose cardinality
    (5) is far below the task count, so an unsalted shuffle join lands the
    whole fact table on 5 tasks. The salt (derived from every big-side
    column, so it varies WITHIN a key) fans each hot key over 8 tasks; the
    dimension replicates once per salt. Row-for-row identical to the plain
    join — the oracle IS the plain join — aggregated per type with a
    decimal-exact value sum."""
    from scraping_jobsdb_spark.operators.scale import salted_join

    events = fan_out(load_table(spark, sf_dir, "events"))
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0),
         ("signup", 2.0), ("error", 0.25)],
        "event_type string, weight double",
    )
    joined = salted_join(events, dim, on=["event_type"], n_salts=8)
    return joined.groupBy("event_type", "weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum("value").alias("sum_value"),
    )


@_register(
    "incremental_batch_dedup",
    oracle=r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM all_docs
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), fps_c AS (
        SELECT doc_id, h FROM fps WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), fps_b AS (
        SELECT doc_id, h FROM fps WHERE doc_id % 5 = 0 OR doc_id >= 20000
    ), stop AS (
        SELECT h FROM fps_c GROUP BY h HAVING COUNT(*) > 50
    ), pruned_c AS (
        SELECT doc_id, h FROM fps_c
        WHERE h NOT IN (SELECT h FROM stop)
    ), pruned_b AS (
        SELECT doc_id, h FROM fps_b
        WHERE h NOT IN (SELECT h FROM stop)
    ), sizes_b AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pruned_b GROUP BY doc_id
    ), shared AS (
        SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS shared_fp
        FROM pruned_b b JOIN pruned_c c ON b.h = c.h
        GROUP BY 1, 2
    ), dup AS (
        SELECT s.bid, COUNT(*) AS n_dup_of
        FROM shared s JOIN sizes_b z ON s.bid = z.doc_id
        WHERE s.shared_fp * 1000 >= 800 * z.n_fp
        GROUP BY 1
    ), batch AS (
        SELECT doc_id FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 20000 AS doc_id
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    )
    SELECT b.doc_id,
           COALESCE(z.n_fp, 0) AS n_fp,
           COALESCE(d.n_dup_of, 0) AS n_dup_of,
           COALESCE(d.n_dup_of, 0) = 0 AS kept
    FROM batch b
    LEFT JOIN sizes_b z ON b.doc_id = z.doc_id
    LEFT JOIN dup d ON b.doc_id = d.bid
    """,
)
def q_incremental_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup (operators/textops.py
    incremental_containment_filter): a NEW batch (every 5th document, plus
    injected near-dups of corpus docs minus their last word) is scored
    against the EXISTING corpus by winnowing-fingerprint containment —
    the content-level generalization of the reference's per-run
    "skip already-scraped ids" anti-join (airflow/dags/scrape_url.py).
    One equi-join on the gram hash between batch fingerprints and the
    stop-gram-pruned corpus index; all-integer thresholding, so the
    verdict frame (n_fp, n_dup_of, kept per batch doc) is value-hash
    exact."""
    from scraping_jobsdb_spark.operators.textops import (
        incremental_containment_filter,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch_new = docs.filter(F.col("doc_id") % 5 == 0)
    near = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return incremental_containment_filter(
        batch_new.unionByName(near), corpus,
        threshold_milli=800, k=8, w=4, max_df=50,
    )


@_register(
    "incremental_indexed_dedup",
    oracle=r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM all_docs
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), fps_c AS (       -- index state at probe 1: the original corpus
        SELECT doc_id, h FROM fps WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), fps_b1 AS (      -- batch 1: every 5th document
        SELECT doc_id, h FROM fps WHERE doc_id % 5 = 0
    ), fps_b2 AS (      -- batch 2: injected near-dups (+20000 ids)
        SELECT doc_id, h FROM fps WHERE doc_id >= 20000
    ), stop1 AS (
        SELECT h FROM fps_c GROUP BY h HAVING COUNT(*) > 50
    ), pc1 AS (
        SELECT doc_id, h FROM fps_c WHERE h NOT IN (SELECT h FROM stop1)
    ), pb1 AS (
        SELECT doc_id, h FROM fps_b1 WHERE h NOT IN (SELECT h FROM stop1)
    ), sz1 AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pb1 GROUP BY doc_id
    ), sh1 AS (
        SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS shared_fp
        FROM pb1 b JOIN pc1 c ON b.h = c.h GROUP BY 1, 2
    ), dup1 AS (
        SELECT s.bid, COUNT(*) AS n_dup_of
        FROM sh1 s JOIN sz1 z ON s.bid = z.doc_id
        WHERE s.shared_fp * 1000 >= 800 * z.n_fp GROUP BY 1
    ), fps_c2 AS (      -- index state at probe 2: corpus UNION batch 1
        SELECT doc_id, h FROM fps_c UNION ALL SELECT doc_id, h FROM fps_b1
    ), stop2 AS (
        SELECT h FROM fps_c2 GROUP BY h HAVING COUNT(*) > 50
    ), pc2 AS (
        SELECT doc_id, h FROM fps_c2 WHERE h NOT IN (SELECT h FROM stop2)
    ), pb2 AS (
        SELECT doc_id, h FROM fps_b2 WHERE h NOT IN (SELECT h FROM stop2)
    ), sz2 AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pb2 GROUP BY doc_id
    ), sh2 AS (
        SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS shared_fp
        FROM pb2 b JOIN pc2 c ON b.h = c.h GROUP BY 1, 2
    ), dup2 AS (
        SELECT s.bid, COUNT(*) AS n_dup_of
        FROM sh2 s JOIN sz2 z ON s.bid = z.doc_id
        WHERE s.shared_fp * 1000 >= 800 * z.n_fp GROUP BY 1
    ), b1 AS (
        SELECT doc_id FROM documents WHERE doc_id % 5 = 0
    ), b2 AS (
        SELECT doc_id + 20000 AS doc_id
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    )
    SELECT b.doc_id, 1 AS batch_no,
           COALESCE(z.n_fp, 0) AS n_fp,
           COALESCE(d.n_dup_of, 0) AS n_dup_of,
           COALESCE(d.n_dup_of, 0) = 0 AS kept
    FROM b1 b
    LEFT JOIN sz1 z ON b.doc_id = z.doc_id
    LEFT JOIN dup1 d ON b.doc_id = d.bid
    UNION ALL
    SELECT b.doc_id, 2 AS batch_no,
           COALESCE(z.n_fp, 0) AS n_fp,
           COALESCE(d.n_dup_of, 0) AS n_dup_of,
           COALESCE(d.n_dup_of, 0) = 0 AS kept
    FROM b2 b
    LEFT JOIN sz2 z ON b.doc_id = z.doc_id
    LEFT JOIN dup2 d ON b.doc_id = d.bid
    """,
)
def q_incremental_indexed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-INDEX posture of incremental-crawl dedup
    (operators/fpindex.py FingerprintIndex — the composition of the txn
    layer, the incremental-MV layer, and the winnowing dedup family): the
    corpus is fingerprinted ONCE into a transactional (doc_id, h) index
    with an incrementally-maintained per-gram document-frequency view;
    then two successive batches probe the STORED index — batch 1 (every
    5th document) is scored and admitted via add() (append + O(delta+view)
    DF refresh, no corpus re-fingerprint), and batch 2 (injected
    near-dups) is scored against the UPDATED index. The batch fingerprint
    sets are broadcast, so each probe streams map-side over the index
    scan — zero corpus-sized shuffles, cost independent of corpus size.
    The oracle recomputes both index states declaratively; kept/n_dup_of
    verdicts are integer-exact, so the whole two-batch ingest sequence is
    value-hash oracled."""
    import tempfile

    from scraping_jobsdb_spark.operators.fpindex import FingerprintIndex

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    idx = FingerprintIndex.create(
        spark, tempfile.mkdtemp(prefix="sjs_fpidx_q_"), corpus,
        k=8, w=4, max_df=50,
    )
    v1 = idx.probe(batch1, threshold_milli=800).withColumn(
        "batch_no", F.lit(1).cast("int")
    )
    idx.add(batch1)
    v2 = idx.probe(batch2, threshold_milli=800).withColumn(
        "batch_no", F.lit(2).cast("int")
    )
    return v1.unionByName(v2).select(
        "doc_id", "batch_no", "n_fp", "n_dup_of", "kept"
    )


@_register(
    "dedup_keep_best_quality",
    oracle=r"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM corpus
    ), posn AS (
        SELECT doc_id, s, unnest(range(0, length(s) - 7)) AS pos FROM norm
    ), grams AS (
        SELECT doc_id, pos,
               (  ord(substr(s, pos + 1, 1))::BIGINT * 13163680
                + ord(substr(s, pos + 2, 1))::BIGINT * 805498697
                + ord(substr(s, pos + 3, 1))::BIGINT * 154885210
                + ord(substr(s, pos + 4, 1))::BIGINT * 362470373
                + ord(substr(s, pos + 5, 1))::BIGINT * 16974593
                + ord(substr(s, pos + 6, 1))::BIGINT * 66049
                + ord(substr(s, pos + 7, 1))::BIGINT * 257
                + ord(substr(s, pos + 8, 1))::BIGINT
               ) % 1000000007 AS h
        FROM posn
    ), winm AS (
        SELECT doc_id, h, min(h) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        ) AS wmin
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, h FROM winm WHERE h = wmin
    ), rare AS (
        SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= 50
    ), pruned AS (
        SELECT f.doc_id, f.h FROM fps f JOIN rare USING (h)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pruned GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fp
        FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s
        JOIN sizes sa ON s.id_a = sa.doc_id
        JOIN sizes sb ON s.id_b = sb.doc_id
        WHERE s.shared_fp * 1000 >= 800 * least(sa.n_fp, sb.n_fp)
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(id, label) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS component FROM reach GROUP BY id
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t, text
        FROM corpus
    ), scored AS (
        SELECT doc_id,
            ROUND(
              0.4 * (CASE WHEN len(t) >= 10 AND len(t) <= 100000
                          THEN 1.0 ELSE 0.0 END)
            + 0.3 * (CASE WHEN len(list_filter(t, x -> lower(x) IN
                              ('the','a','an','of','and','or','is','to','in')))
                              / len(t)
                              BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
            + 0.3 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                              / length(text)), 9) AS quality
        FROM toks
    ), ranked AS (
        SELECT c.id AS doc_id, c.component, s.quality,
               ROW_NUMBER() OVER (PARTITION BY c.component
                                  ORDER BY s.quality DESC, c.id) AS rn
        FROM comp c JOIN scored s ON c.id = s.doc_id
    )
    SELECT doc_id, component, quality, rn = 1 AS keep FROM ranked
    """,
)
def q_dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (operators/graph.py
    dedup_keep_best): winnowing containment pairs over the corpus with
    injected truncated near-dups → connected components → keep the
    HIGHEST-quality member of each cluster (9dp-quantized composite score,
    smaller id on ties) instead of the smallest id. The injected near-dups
    are truncated copies, so quality-aware selection — unlike min-id —
    systematically retains the fuller original. Fully value-hash checked:
    clusters re-resolved by the oracle's recursive CTE, the argmax by a
    window under the same total order."""
    from scraping_jobsdb_spark.operators.graph import dedup_keep_best
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint_containment_pairs,
        quality_score,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = fingerprint_containment_pairs(
        corpus, threshold_milli=800, k=8, w=4, max_df=50
    )
    scores = corpus.select(
        "doc_id", F.round(quality_score("text"), 9).alias("quality")
    )
    return dedup_keep_best(
        pairs, scores, id_col="doc_id", score_col="quality"
    ).withColumnRenamed("id", "doc_id")


@_register(
    "hll_portable_registers",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events
    ), rows_ AS (
        SELECT event_type AS scope, h % 256 AS bucket,
               CASE WHEN (h >> 8) = 0 THEN 53
                    ELSE 53 - length(bin(h >> 8)) END AS rho
        FROM h
    ), per_type AS (
        SELECT scope, bucket, MAX(rho) AS rho FROM rows_ GROUP BY 1, 2
    ), merged AS (
        SELECT '__all__' AS scope, bucket, MAX(rho) AS rho
        FROM per_type GROUP BY bucket
    )
    SELECT scope, CAST(bucket AS BIGINT) AS bucket, CAST(rho AS BIGINT) AS rho
    FROM per_type
    UNION ALL
    SELECT scope, CAST(bucket AS BIGINT) AS bucket, CAST(rho AS BIGINT) AS rho
    FROM merged
    """,
)
def q_hll_portable_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (operators/sketches.py hll_build /
    hll_merge): one register sketch of distinct users per event_type, plus
    the '__all__' sketch obtained by MERGING the five per-type sketches —
    which the oracle checks against DuckDB deriving the global registers
    directly from the rows, verifying the HLL merge law itself hash-exactly.
    Unlike the DataSketches-blob form (hll_mergeable_sketches, rows-only by
    necessity), the md5-derived register table is integer-exact in any
    engine — the distinct-count sibling of the fully-oracled CMS. Estimates
    (with small-range linear counting) live in hll_estimate and are
    accuracy-asserted in tests; the gate hashes only integers."""
    from scraping_jobsdb_spark.operators.sketches import hll_build, hll_merge

    ev = fan_out(load_table(spark, sf_dir, "events"))
    per_type = hll_build(ev, "user_id", p=8, group_cols=["event_type"])
    merged = hll_merge(per_type.select("bucket", "rho")).select(
        F.lit("__all__").alias("scope"), "bucket", "rho"
    )
    return per_type.select(
        F.col("event_type").alias("scope"), "bucket", "rho"
    ).unionByName(merged)


@_register(
    "minhash_portable_neardup_pairs",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM corpus
    ), posn AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS i
        FROM toks
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS s
        FROM posn
    ), perms AS (
        SELECT unnest(generate_series(0, 15)) AS p
    ), hv AS (
        SELECT doc_id, p,
               CAST(('0x' || substr(
                   md5(CASE WHEN p < 4 THEN s
                            ELSE s || ':' || CAST(p // 4 AS VARCHAR) END),
                   1 + 7 * (p % 4), 7)) AS BIGINT) AS hp
        FROM sh, perms
    ), sig AS (
        SELECT doc_id, p, MIN(hp) AS m FROM hv GROUP BY 1, 2
    ), bandkeys AS (
        SELECT doc_id, p // 4 AS band,
               string_agg(CAST(m AS VARCHAR), ',' ORDER BY p) AS key
        FROM sig GROUP BY doc_id, p // 4
    ), sized AS (
        SELECT band, key FROM bandkeys
        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 64
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bandkeys a
    JOIN sized USING (band, key)
    JOIN bandkeys b USING (band, key)
    WHERE a.doc_id < b.doc_id
    """,
)
def q_minhash_portable_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs with md5-portable permutations
    (operators/similarity.py minhash_candidate_pairs_portable) over the
    corpus with injected truncated near-dups — the FIRST fully value-hash
    oracled LSH candidate set in the engine (the xxhash64 form stays the
    100 TB hot path and remains rows-only: its seeds are Spark-internal).
    16 permutations from hash-once-per-block md5 windows, 4 bands × 4
    rows, one shuffle on (band, band-key), max_bucket=64 expansion guard;
    DuckDB re-derives signatures, bands, buckets, and pairs identically."""
    from scraping_jobsdb_spark.operators.similarity import (
        minhash_candidate_pairs_portable,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return minhash_candidate_pairs_portable(
        docs.unionByName(near), "doc_id", "text",
        k=16, bands=4, shingle_n=3, max_bucket=64,
    )


@_register(
    "kmv_distinct_sketches",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS v
        FROM events
    ), ranked AS (
        SELECT event_type AS scope, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk
        FROM h
    ), per_type AS (
        SELECT scope, v FROM ranked WHERE rk <= 64
    ), merged AS (
        SELECT DISTINCT v FROM per_type
    ), merged_ranked AS (
        SELECT '__all__' AS scope, v, ROW_NUMBER() OVER (ORDER BY v) AS rk
        FROM merged
    )
    SELECT scope, v FROM per_type
    UNION ALL
    SELECT scope, v FROM merged_ranked WHERE rk <= 64
    """,
)
def q_kmv_distinct_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketches (operators/sketches.py kmv_build/kmv_merge):
    the k=64 smallest md5-60bit values of the distinct users per event_type,
    plus the '__all__' union sketch obtained by MERGING the five — verified
    against DuckDB deriving the union's minima directly, so the KMV merge
    law is oracle-checked like the HLL one. KMV completes the portable
    sketch family (CMS: frequencies, HLL: distinct counts, KMV: distinct
    counts of SET EXPRESSIONS — the retained values are comparable across
    sketches, enabling intersection estimates HLL cannot give; see
    kmv_intersection_estimate + tests). Grouped build is the map-side
    WindowGroupLimit top-k; everything hashed is integer."""
    from scraping_jobsdb_spark.operators.sketches import kmv_build, kmv_merge

    ev = fan_out(load_table(spark, sf_dir, "events"))
    per_type = kmv_build(ev, "user_id", k=64, group_cols=["event_type"])
    merged = kmv_merge(64, per_type.select("v")).select(
        F.lit("__all__").alias("scope"), "v"
    )
    return per_type.select(
        F.col("event_type").alias("scope"), "v"
    ).unionByName(merged)


@_register(
    "simhash_portable_neardup_pairs",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 10 = 0
    ), toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM corpus
    ), hv AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM toks
    ), bitsv AS (
        SELECT doc_id, unnest(range(0, 60)) AS b, h FROM hv
    ), votes AS (
        SELECT doc_id, b,
               SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
                        THEN 1 ELSE -1 END) AS s
        FROM bitsv GROUP BY 1, 2
    ), fpbits AS (
        SELECT doc_id, b, CASE WHEN s > 0 THEN 1 ELSE 0 END AS v FROM votes
    ), chunks AS (
        SELECT doc_id, 3 - (b // 15) AS chunk,
               SUM(v << CAST(b % 15 AS INTEGER)) AS cval
        FROM fpbits GROUP BY 1, 2
    ), small AS (
        SELECT chunk, cval FROM chunks
        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 256
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM chunks a
        JOIN small USING (chunk, cval)
        JOIN chunks b
          ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
    )
    SELECT * FROM (
        SELECT p.id_a, p.id_b,
               CAST(SUM(CASE WHEN fa.v <> fb.v THEN 1 ELSE 0 END) AS BIGINT)
                   AS hamming
        FROM pairs p
        JOIN fpbits fa ON fa.doc_id = p.id_a
        JOIN fpbits fb ON fb.doc_id = p.id_b AND fb.b = fa.b
        GROUP BY 1, 2
    ) WHERE hamming <= 3
    """,
)
def q_simhash_portable_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidates with md5-portable token hashes
    (operators/similarity.py simhash_candidate_pairs_portable) over the
    corpus with injected truncated near-dups: 60-bit fingerprints from
    per-token bit votes, 4×15-bit bands (Hamming ≤ 3 guaranteed banded by
    pigeonhole), one (chunk, value) shuffle, exact Hamming verified on the
    candidate stream. With this the whole near-dup candidate family —
    winnowing containment, MinHash-LSH, SimHash — has a fully value-hash
    oracled member; the xxhash64 forms remain the hot path. The oracle
    re-derives votes bit-by-bit and distances from the bit tables."""
    from scraping_jobsdb_spark.operators.similarity import (
        simhash_candidate_pairs_portable,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return simhash_candidate_pairs_portable(
        docs.unionByName(near), "doc_id", "text"
    ).filter(F.col("hamming") <= 3)


@_register(
    "quantile_hash_sample",
    oracle="""
    WITH keyed AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR) AS k
        FROM lineitem
    ), sampled AS (
        SELECT * FROM keyed
        WHERE CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) < 429496729
    ), ranked AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, k) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM sampled
    )
    SELECT l_returnflag, MAX(n) AS n_sample,
           MAX(CASE WHEN rn = CEIL(n * 0.5) THEN l_extendedprice END) AS p50,
           MAX(CASE WHEN rn = CEIL(n * 0.9) THEN l_extendedprice END) AS p90
    FROM ranked GROUP BY l_returnflag
    """,
)
def q_quantile_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles made oracle-EXACT by deterministic sampling:
    a ~10% md5-band sample of lineitem (hash_fraction_sample — membership
    is a pure function of the row key, identical in every engine), then
    the exact rank-statistic p50/p90 per return flag over the sample under
    a (value, key) total order. The general pattern: any approximate query
    whose randomness comes from CONTENT HASHING instead of an RNG or a
    sketch library is reproducible bit-for-bit cross-engine — this is the
    quantile member of that family (sampling: deterministic_sample_split;
    sketches: cms/hll/kmv). One shuffle on the group key; rank and count
    share a single window."""
    from scraping_jobsdb_spark.operators.sampling import hash_fraction_sample

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("k"),
    )
    sampled = hash_fraction_sample(li, "k", 0.1)
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice", "k")
    wc = Window.partitionBy("l_returnflag")
    ranked = sampled.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.max("n").alias("n_sample"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("l_extendedprice"))
        ).alias("p50"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("l_extendedprice"))
        ).alias("p90"),
    )


@_register(
    "retention_cohorts",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id
    )
    SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST((a.wk - c.cohort_wk) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the canonical product-analytics rollup:
    users are cohorted by their first active week, then counted distinct
    per (cohort, week offset). Two shuffles (distinct user-weeks, then the
    cohort aggregate); the per-user MIN rides the same user_id
    partitioning as the distinct. Weeks cross the gate as ISO strings
    (bare DATE columns stringify engine-dependently — NOTES date-hygiene
    rule); the offset is integer day-diff / 7, exact in both engines."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@_register(
    "regional_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join: revenue by supplier nation for one region
    and date window, restricted to LOCAL supply (customer and supplier share
    a nation). The scale-shaping: region→nation→supplier collapse into one
    broadcast dim (suppliers-in-region is dim-sized), so lineitem acquires
    its nation map-side; the only shuffles are the two fact joins
    (lineitem⋈orders on orderkey, +customer on custkey) and the final tiny
    group-by. The c_nationkey = s_nationkey local-supply predicate is a
    post-join filter — it is NOT an equi-join key, so keeping it out of the
    join condition lets both engines plan the joins on the real keys."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@_register(
    "nation_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
        OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
    GROUP BY 1, 2, 3
    """,
)
def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between two
    named nations, by direction and ship-year. The disjunctive nation-pair
    predicate cannot be pushed into either single-table scan, but both arms
    restrict each side to one of two nations — so supplier and customer are
    EACH pre-filtered to the two-nation subset via a broadcast nation join
    (turning the fact joins into joins against tiny dims), and the
    disjunction runs as a cheap post-join filter on two small string
    columns. Year crosses as BIGINT (Spark year() is INT, DuckDB EXTRACT is
    BIGINT — cast on the Spark side)."""
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_11")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_9")
                & (F.col("cust_nation") == "NATION_11")
            )
            | (
                (F.col("supp_nation") == "NATION_11")
                & (F.col("cust_nation") == "NATION_9")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@_register(
    "market_share_by_year",
    oracle="""
    WITH base AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                   AS volume,
               n2.n_name AS supp_nation
        FROM part, lineitem, supplier, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: one supplier nation's fraction of
    ECONOMY-part revenue sold into EUROPE customers, by order year. An
    8-table join where every dimension (part-filtered, supplier+nation,
    customer-nation-region) broadcasts, leaving lineitem⋈orders as the only
    shuffle join. Both SUMs are decimal-exact; the share is the ratio of
    their DOUBLE casts rounded to 9 dp (derived statistics round before the
    gate — DECIMAL→DOUBLE double-rounding rule in NOTES)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    eur_nat = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(eur_nat), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    base = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            9,
        ).alias("mkt_share")
    )


@_register(
    "sole_supplier_orders",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(*) AS n_items,
               MIN(l_suppkey) AS the_supp
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS n_orders
    FROM per_order p
    JOIN orders o ON p.l_orderkey = o.o_orderkey
    JOIN supplier s ON p.the_supp = s_suppkey
    WHERE p.n_supp = 1 AND p.n_items > 1 AND o.o_orderstatus = 'F'
    GROUP BY s_name
    ORDER BY n_orders DESC, s_name
    LIMIT 10
    """,
)
def q_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-flavored sole-supplier analysis (reshaped to this schema's
    columns — no commit/receipt dates): suppliers who single-handedly
    fulfilled the most multi-line 'F'-status orders. The per-order profile
    (distinct-supplier count, line count, the supplier itself) is ONE
    aggregation on the natural l_orderkey shuffle; because n_supp = 1 rows
    are the only survivors, MIN(l_suppkey) IS the sole supplier —
    deterministic without a second pass. Orders joins on the same orderkey
    partitioning; supplier broadcasts; the top-10 runs as
    TakeOrderedAndProject under the total order (count DESC, name ASC), so
    no global sort materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count(F.lit(1)).alias("n_items"),
        F.min("l_suppkey").alias("the_supp"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") == 1) & (F.col("n_items") > 1))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("the_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("s_name"))
        .limit(10)
    )


@_register(
    "events_daily_gap_fill",
    oracle=r"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                   AS daily_value
        FROM events GROUP BY 1, 2
    ), nxt AS (
        SELECT *, LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
        FROM daily
    ), filled AS (
        SELECT user_id, daily_value, d AS obs_d,
               unnest(generate_series(CAST(d AS TIMESTAMP),
                      COALESCE(CAST(nd AS TIMESTAMP) - INTERVAL 1 DAY,
                               CAST(d AS TIMESTAMP)),
                      INTERVAL 1 DAY)) AS day_ts
        FROM nxt
    )
    SELECT user_id, strftime(CAST(day_ts AS DATE), '%Y-%m-%d') AS day,
           daily_value, CAST(day_ts AS DATE) = obs_d AS is_observed
    FROM filled
    """,
)
def q_events_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (operators/temporal.py gap_fill): per-user
    daily value rollups expanded to EVERY day between first and last
    activity, carrying the last value forward — the dense daily-state spine
    (balances, last-known metrics) warehouses build nightly. One lead()
    window on the user key, then a map-only sequence+explode that emits
    filled rows WITH their carried values — no spine table, no cross join,
    no second carry-forward pass; fill volume is Σ gap days. Decimal-exact
    daily sums; the day crosses the gate as an ISO string (date-hygiene
    rule)."""
    from scraping_jobsdb_spark.operators.temporal import gap_fill

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(_dsum("value").alias("daily_value"))
    )
    filled = gap_fill(daily, ["user_id"], "d", ["daily_value"])
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "daily_value",
        "is_observed",
    )


@_register(
    "fuzzy_join_supplier_names",
    oracle=r"""
    WITH g0 AS (
        SELECT s_suppkey AS id, s_name AS name,
               unnest(list_distinct(list_transform(
                   range(1, greatest(length(s_name) - 2, 1) + 1),
                   i -> substring(s_name, i, 3)))) AS gram
        FROM supplier
    ), g AS (
        SELECT id, name, gram FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY gram) AS df FROM g0
        ) WHERE df <= 50
    ), cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.name AS name_a, b.name AS name_b
        FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def q_fuzzy_join_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance self-join (operators/similarity.py
    fuzzy_string_join): supplier-name pairs within levenshtein 1 — the
    entity-resolution primitive (near-identical names/titles/SKUs) without
    an n² product. Character-3-gram blocking → one gram equi-join →
    distinct candidates → one exact levenshtein per candidate, with the
    max_df=50 stop-gram guard ON: every synthetic supplier name shares the
    "Supplier#0000…" prefix, and without the guard the gram join
    degenerates to all-pairs (13.6 s at sf0.1 vs 0.4 s guarded — the
    quadratic blow-up the guard exists for; candidate recall is the
    documented blocking contract, mirrored EXACTLY by the oracle's
    per-gram df filter). Integer-exact end to end, so candidates AND
    distances are fully oracled (the simhash_portable precedent)."""
    from scraping_jobsdb_spark.operators.similarity import fuzzy_string_join

    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return fuzzy_string_join(
        supp,
        supp,
        "s_suppkey",
        "s_name",
        "s_suppkey",
        "s_name",
        max_distance=1,
        max_df=50,
    )


@_register(
    "recursive_event_chains",
    oracle="""
    WITH RECURSIVE chains(start_id, cur_id, cur_ts, depth) AS (
        SELECT event_id, event_id, ts, 0
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT c.start_id, n.next_id, n.next_ts, c.depth + 1
        FROM chains c JOIN (
            SELECT event_id, ts,
                   LEAD(event_id) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_id,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
            FROM events
        ) n ON c.cur_id = n.event_id
        WHERE n.next_id IS NOT NULL
          AND epoch(n.next_ts) - epoch(n.ts) <= 120
          AND c.depth < 10
    )
    SELECT start_id, MAX(depth) AS chain_len
    FROM chains GROUP BY start_id
    """,
)
def q_recursive_event_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0's WITH RECURSIVE, new SQL surface): from
    each click, follow the per-user NEXT-EVENT pointer while consecutive
    gaps stay within 2 minutes (depth-capped at 10) — the activity-chain
    / clickstream-path traversal iterative DataFrame loops used to be the
    only answer to. The recursion is explosion-proof BY CONSTRUCTION: the
    lead() window gives every event out-degree ≤ 1 and strictly increasing
    timestamps (acyclic), so UNION ALL — the only recursion Spark supports
    — cannot multiply paths. Gap age compares fractional seconds
    (timestamp→double ≡ DuckDB epoch()). Oracle: the very same SQL."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "sjs_rec_events"
    )
    return spark.sql(
        """
    WITH RECURSIVE chains(start_id, cur_id, cur_ts, depth) AS (
        SELECT event_id, event_id, ts, 0
        FROM sjs_rec_events WHERE event_type = 'click'
        UNION ALL
        SELECT c.start_id, n.next_id, n.next_ts, c.depth + 1
        FROM chains c JOIN (
            SELECT event_id, ts,
                   LEAD(event_id) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_id,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
            FROM sjs_rec_events
        ) n ON c.cur_id = n.event_id
        WHERE n.next_id IS NOT NULL
          AND CAST(n.next_ts AS DOUBLE) - CAST(n.ts AS DOUBLE) <= 120
          AND c.depth < 10
    )
    SELECT start_id, MAX(depth) AS chain_len
    FROM chains GROUP BY start_id
    """
    )


@_register(
    "variant_json_surface",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS absent,
           CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 AS k_div7
    FROM events
    """,
)
def q_variant_json_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured surface (Spark 4.0's open VARIANT type):
    parse_json once into a VARIANT column, then typed variant_get path
    extraction — the shredding-friendly path that replaces repeated
    get_json_object string re-parsing (scalar_json_pack's pre-4.0 form).
    A missing path extracts as typed NULL. The variant never leaves the
    plan (relational columns out), so the oracle checks the extracted
    values via DuckDB's JSON accessors."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "props")
    v = F.parse_json("props")
    staged = ev.select("event_id", v.alias("__v"))
    k = F.try_variant_get("__v", "$.k", "bigint")
    return staged.select(
        "event_id",
        k.alias("k"),
        (k * 2).alias("k_doubled"),
        F.try_variant_get("__v", "$.missing", "bigint").alias("absent"),
        (k % 7 == 0).alias("k_div7"),
    )


@_register(
    "gopher_quality_flags",
    oracle=r"""
    WITH staged AS (
        SELECT doc_id, text AS t,
               string_split_regex(trim(text), '\s+') AS ws,
               string_split(text, chr(10)) AS lines
        FROM documents
    ), stats AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(ws, w -> length(w)))
                    AS BIGINT) AS sum_word_chars,
               CAST(length(t) - length(replace(t, '#', ''))
                    + (length(t) - length(replace(t, '...', ''))) // 3
                    AS BIGINT) AS n_symbols,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines,
                        ln -> regexp_matches(ln, '^\s*[-*•]')))
                    AS BIGINT) AS n_bullet_lines,
               CAST(len(list_filter(lines,
                        ln -> regexp_matches(ln, '(\.\.\.|…)\s*$')))
                    AS BIGINT) AS n_ellipsis_lines,
               CAST(len(list_filter(
                        ['the','be','to','of','and','that','have','with'],
                        w -> list_contains(list_transform(ws, x -> lower(x)), w)))
                    AS BIGINT) AS n_stopwords_present
        FROM staged
    ), flags AS (
        SELECT *,
               n_words BETWEEN 50 AND 100000 AS flag_word_count,
               sum_word_chars BETWEEN 3 * n_words AND 10 * n_words
                   AS flag_mean_word_len,
               10 * n_symbols <= n_words AS flag_symbol_ratio,
               10 * n_bullet_lines < 9 * n_lines AS flag_bullet_lines,
               10 * n_ellipsis_lines <= 3 * n_lines AS flag_ellipsis_lines,
               n_stopwords_present >= 2 AS flag_stopwords
        FROM stats
    )
    SELECT *,
           flag_word_count AND flag_mean_word_len AND flag_symbol_ratio
               AND flag_bullet_lines AND flag_ellipsis_lines
               AND flag_stopwords AS keep
    FROM flags
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule filters (operators/textops.py gopher_quality_flags):
    per-document integer statistics + per-rule boolean flags + the `keep`
    conjunction — the pretraining quality gate upstream of dedup/mixing.
    Every flag derives from cross-multiplied INTEGER comparisons (mean word
    length in [3,10] ⇔ 3n ≤ Σ|w| ≤ 10n), so no double ever crosses the
    oracle gate. Physical shape: one map-only projection over a staged
    token/line array — no shuffle, no UDF, codegen end to end."""
    from scraping_jobsdb_spark.operators.textops import gopher_quality_flags

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return gopher_quality_flags(docs)


@_register(
    "mixture_weighted_corpus_sample",
    oracle=r"""
    WITH weighted AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), budgeted AS (
        SELECT *,
               CASE lang WHEN 'en' THEN 8000 WHEN 'zh' THEN 3000
                         WHEN 'es' THEN 3000 WHEN 'de' THEN 3000
                         WHEN 'fr' THEN 3000 END AS budget
        FROM weighted
    ), running AS (
        SELECT doc_id, lang, n_tokens, budget,
               SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running
        FROM budgeted
    )
    SELECT doc_id, lang, n_tokens
    FROM running WHERE budget IS NOT NULL AND running <= budget
    """,
)
def q_mixture_weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture corpus resampling (operators/sampling.py
    mixture_token_budget_sample): a 20 000-token budget split 40 % en /
    15 % each zh-es-de-fr, filled per language in deterministic md5 order —
    the data-recipe mixing primitive ("40 % web, 30 % code, ...")
    generalizing the uniform token_budget_sample. The mixture is a literal
    map in the plan (no join); one window shuffle on lang; integer budgets
    and running sums make the kept set engine-exact."""
    from scraping_jobsdb_spark.operators.sampling import mixture_token_budget_sample
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("bigint").alias("n_tokens")
    )
    return mixture_token_budget_sample(
        docs,
        "lang",
        "doc_id",
        "n_tokens",
        total_budget=20_000,
        mixture={"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15},
    )


@_register(
    "domain_cap_sample",
    oracle=r"""
    SELECT doc_id, source, rank_in_group FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rank_in_group
        FROM documents
    ) WHERE rank_in_group <= 120
    """,
)
def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping (operators/sampling.py cap_per_group): at
    most 120 documents per ``source``, chosen by deterministic md5 rank —
    the CCNet/RefinedWeb anti-dominance rule ("no single domain may
    contribute more than N pages"), the frequency twin of the
    quality-ranked top_fraction_per_group cut. Hash order means crawl
    arrival order cannot bias the kept set and re-runs agree; one window
    shuffle on the group key. Integer ranks → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, ["source"], "doc_id", 120).select(
        "doc_id", "source", "rank_in_group"
    )


@_register(
    "sequence_packing_stream",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS pack_start
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, pack_start,
           CAST(FLOOR(pack_start / 2048.0) AS BIGINT) AS bin_first,
           CAST(FLOOR((pack_start + n_tokens - 1) / 2048.0) AS BIGINT)
               AS bin_last,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(FLOOR((pack_start + n_tokens - 1) / 2048.0) AS BIGINT)
                   - CAST(FLOOR(pack_start / 2048.0) AS BIGINT) + 1
           END AS n_bins
    FROM packed
    """,
)
def q_sequence_packing_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/sampling.py pack_sequences): documents
    concatenated in deterministic md5 order into one stream PER LANGUAGE
    and cut into 2048-token training examples — each doc's exact token
    offset, first/last example ids, and straddle count (GPT-style
    pretraining packs docs back-to-back; a doc may cross a cut). The
    running sum rides one window shuffle on lang; everything is integer
    arithmetic on whitespace token counts, so offsets and bin ids are
    engine-exact. At 100 TB the packing stream is per-shard/group by
    construction — no global order anywhere."""
    from scraping_jobsdb_spark.operators.sampling import pack_sequences
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("bigint").alias("n_tokens")
    )
    return pack_sequences(
        docs, "doc_id", "n_tokens", capacity=2048, group_cols=["lang"]
    ).select(
        "doc_id", "lang", "n_tokens", "pack_start",
        "bin_first", "bin_last", "n_bins",
    )


@_register(
    "bloom_prefilter_supplier_revenue",
    oracle="""
    SELECT l.l_suppkey AS suppkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 1) s
      ON s.s_suppkey = l.l_suppkey
    GROUP BY l.l_suppkey
    """,
)
def q_bloom_prefilter_supplier_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Runtime-filter join (operators/scale.py bloom_prefilter_join):
    lineitem ⋈ the suppliers of one nation, with a Bloom bitset of the
    small side's keys filtering the BIG side map-side BEFORE its shuffle —
    the explicit form of Spark's threshold-gated runtime bloom-filter
    injection, for the regime where the dimension is too large to
    broadcast exactly but its key set sketches into kilobytes. The bitset
    is built by ONE aggregate over the small side (md5 probe_positions —
    the portable construction the CMS/txn-bloom share) and ships as a
    single binary literal. Bloom filters have no false negatives and the
    real join removes false positives, so the result is row-identical to
    the plain join — hash-oracled here against DuckDB's exact join.
    Row-prune factor asserted in tests/test_scale_ops.py."""
    from scraping_jobsdb_spark.operators.scale import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 1)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        bloom_prefilter_join(li, supp, "l_suppkey", "left_semi", bits=1 << 16)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "key_skew_report_suppkey",
    oracle="""
    WITH counts AS (
        SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey
    ), totals AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
               COUNT(*) AS n_distinct
        FROM counts
    )
    SELECT c.l_suppkey, c.n_rows,
           c.n_rows / t.total AS share,
           c.n_rows * t.n_distinct / t.total AS skew_ratio
    FROM counts c CROSS JOIN totals t
    ORDER BY c.n_rows DESC, c.l_suppkey
    LIMIT 20
    """,
)
def q_key_skew_report_suppkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics (operators/scale.py key_skew_report):
    the 20 heaviest l_suppkey values with row count, share of the table,
    and ratio to the mean key load — the report that decides whether a
    groupBy/join on this key needs salting/AQE skew handling before the
    job runs at 100 TB. One key-count shuffle + a single-row broadcast of
    the totals + an ordered limit (TakeOrderedAndProject); integer counts
    with one final IEEE division per derived column, so the whole report
    hash-oracles."""
    from scraping_jobsdb_spark.operators.scale import key_skew_report

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    return key_skew_report(li, ["l_suppkey"], k=20)


@_register("bpe_learned_merges", oracle=None)
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE vocabulary training (operators/textops.py bpe_train — the
    iterative completion of ``bpe_merge_candidates``): 40 merges learned
    from the documents corpus, returned as the ordered merge table
    (merge_rank, left, right, pair_count). Spark does the one corpus-sized
    reduction (distinct words with counts); the vocabulary-sized merge
    loop runs driver-side (the k-means-centroid/PQ-codebook tiny-state
    exception — per-iteration recounts are megabytes). Deterministic
    (integer counts, lexicographic tie-break) but the recurrence is
    iterative, hence rows-only; equality against an independent pure-Python
    Sennrich implementation and step-1 consistency with the oracled
    ``bpe_merge_candidates`` are pinned in tests/test_scale_ops.py."""
    from scraping_jobsdb_spark.operators.textops import bpe_train

    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    return bpe_train(docs, n_merges=40)


@_register(
    "sequence_packing_per_shard",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    AS BIGINT) % 8 AS INT) AS shard,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY shard
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS pack_start
        FROM toks
    )
    SELECT doc_id, shard, n_tokens, pack_start,
           CAST(FLOOR(pack_start / 2048.0) AS BIGINT) AS bin_first,
           CAST(FLOOR((pack_start + n_tokens - 1) / 2048.0) AS BIGINT)
               AS bin_last,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(FLOOR((pack_start + n_tokens - 1) / 2048.0) AS BIGINT)
                   - CAST(FLOOR(pack_start / 2048.0) AS BIGINT) + 1
           END AS n_bins
    FROM packed
    """,
)
def q_sequence_packing_per_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing SHARDED BY A COMPUTED KEY — the 100 TB posture of
    ``pack_sequences`` when no natural group column exists (the global
    no-group form is a documented single-partition small-N variant): a
    deterministic md5-derived shard id (16-bit digest window mod 8 — the
    portable-hash construction simhash/minhash_portable use) splits the
    corpus into 8 independent packing streams, each its own running-sum
    window partition. Shard assignment, offsets, and bin ids are all
    integer/md5 arithmetic, so the whole output is engine-exact: this
    hash-oracles the exact plan shape — N parallel window partitions, one
    shuffle on the shard key — that replaces the global stream at scale."""
    from scraping_jobsdb_spark.operators.sampling import pack_sequences
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("bigint") % 8
        ).cast("int").alias("shard"),
        token_count("text").cast("bigint").alias("n_tokens"),
    )
    return pack_sequences(
        docs, "doc_id", "n_tokens", capacity=2048, group_cols=["shard"]
    ).select(
        "doc_id", "shard", "n_tokens", "pack_start",
        "bin_first", "bin_last", "n_bins",
    )


@_register(
    "bpe_merge_candidates",
    oracle=r"""
    WITH words AS (
        SELECT w, COUNT(*) AS wc FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY w
    ), pairs AS (
        SELECT wc,
               CASE WHEN i < length(w)
                    THEN substr(w, i, 1) || ' ' || substr(w, i + 1, 1)
                    ELSE substr(w, i, 1) || ' </w>'
               END AS pair
        FROM words, unnest(range(1, length(w) + 1)) AS t(i)
    )
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 60
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training, step 1 (operators/textops.py
    bpe_pair_counts): corpus-weighted counts of adjacent symbol pairs over
    character-split words (symbols = chars + the </w> word-end marker,
    Sennrich-style), top-60 — the pair a BPE trainer merges next plus the
    runners-up. The at-scale reduction is the point: the corpus collapses
    to DISTINCT WORDS WITH COUNTS first (vocabulary-sized, one shuffle),
    pairs explode only off that word table (second shuffle,
    pair-vocab-sized), top-k is an ordered limit (TakeOrderedAndProject,
    no global sort). All-integer, deterministic tie-break → value-hash
    oracled."""
    from scraping_jobsdb_spark.operators.textops import bpe_pair_counts

    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    return bpe_pair_counts(docs, k=60)


@_register(
    "lateral_topn_per_key",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
             SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2
         ) t
    WHERE c.c_custkey % 50 = 0
    """,
)
def q_lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.2+ SQL surface): each selected
    customer's top-2 orders by price via a per-row correlated ORDER BY ...
    LIMIT — the SQL spelling of top-N-per-key, planned by Catalyst as a
    ranked window under the hood rather than N point queries. Identical
    SQL text runs in DuckDB (LATERAL is ANSI). Deterministic: price ties
    break on o_orderkey."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2
             ) t
        WHERE c.c_custkey % 50 = 0
        """
    )


@_register(
    "group_by_all_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY ALL
    """,
)
def q_group_by_all_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / modern-SQL surface): the grouping key
    list is inferred from the non-aggregate select items — the
    exploratory-analytics idiom both engines now share. Decimal-exact sum;
    identical SQL text runs in DuckDB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY ALL
        """
    )


@_register(
    "epoch_repeat_expansion",
    oracle=r"""
    WITH weighted AS (
        SELECT doc_id, source,
               CASE
                   WHEN CAST(substr(source, 4) AS INT) % 4 = 0 THEN 2.5
                   WHEN CAST(substr(source, 4) AS INT) % 4 = 1 THEN 1.0
                   WHEN CAST(substr(source, 4) AS INT) % 4 = 2 THEN 0.5
                   ELSE 0.0
               END AS w
        FROM documents
    ), expanded AS (
        SELECT doc_id, source,
               CAST(FLOOR(w) AS BIGINT)
               + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                           < CAST(FLOOR((w - FLOOR(w)) * 4294967296.0) AS BIGINT)
                      THEN 1 ELSE 0 END AS n
        FROM weighted
    )
    SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS BIGINT) AS repeat_idx
    FROM expanded WHERE n >= 1
    """,
)
def q_epoch_repeat_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-repetition recipe materialized (operators/sampling.py
    epochs_expand): per-source epoch multipliers (2.5 / 1.0 / 0.5 / 0 by
    source-id band — the "N epochs of wiki, half of CC, drop the rest"
    oversampling step of a training mix) expand each document into
    floor(w) copies plus a deterministically-md5-drawn fractional copy —
    expected copies equal the weight exactly, and the decision is a pure
    function of the key (re-runs, engines, and corpus growth all agree).
    MAP-ONLY: no shuffle, no RNG — the oracle re-derives every draw from
    the same md5 arithmetic, so the expansion is value-hash exact."""
    from scraping_jobsdb_spark.operators.sampling import epochs_expand

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    srcnum = F.substring("source", 4, 10).cast("int") % 4
    weighted = docs.withColumn(
        "w",
        F.when(srcnum == 0, 2.5)
        .when(srcnum == 1, 1.0)
        .when(srcnum == 2, 0.5)
        .otherwise(0.0),
    )
    return epochs_expand(weighted, "doc_id", "w").select(
        "doc_id", "source", "repeat_idx"
    )


@_register(
    "corpus_to_training_examples",
    oracle=r"""
    WITH quality AS (
        SELECT doc_id, text, lang, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
        WHERE len(string_split_regex(trim(text), '\s+')) >= 5
          AND length(text) >= 20
    ), deduped AS (
        SELECT doc_id, lang, source, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(text) ORDER BY doc_id
            ) AS rn FROM quality
        ) WHERE rn = 1
    ), capped AS (
        SELECT doc_id, lang, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ) AS rk FROM deduped
        ) WHERE rk <= 80
    ), packed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS pack_start
        FROM capped
    ), binned AS (
        SELECT lang, n_tokens,
               CAST(FLOOR(pack_start / 1024.0) AS BIGINT) AS bin_first,
               CAST(FLOOR((pack_start + n_tokens - 1) / 1024.0) AS BIGINT)
                   AS bin_last
        FROM packed
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MAX(bin_last) + 1 AS n_examples,
           CAST(SUM(CASE WHEN bin_last > bin_first THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddle
    FROM binned GROUP BY lang
    """,
)
def q_corpus_to_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → training examples, the curation chain as ONE plan:
    quality floor (token/char minimums) → exact content dedup (lowest id
    survives) → per-source quota cap (cap_per_group, ≤80 docs/domain) →
    per-language sequence packing into 1024-token examples
    (pack_sequences) → per-language yield stats (docs, tokens, examples,
    straddles). Every stage is individually gate-green; this verifies the
    COMPOSITION value-hash-exactly — the md5 rank a doc gets in the cap
    window feeds the md5 order it packs in, so any drift anywhere in the
    chain breaks the hash. Scale shape: three window shuffles (dedup
    digest, source cap, lang pack) + one rollup, all on natural keys, no
    UDFs anywhere."""
    from scraping_jobsdb_spark.operators.dedup import dedup_exact
    from scraping_jobsdb_spark.operators.sampling import (
        cap_per_group,
        pack_sequences,
    )
    from scraping_jobsdb_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    quality = docs.withColumn(
        "n_tokens", token_count("text").cast("bigint")
    ).filter((F.col("n_tokens") >= 5) & (F.length("text") >= 20))
    deduped = dedup_exact(quality, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_tokens"
    )
    capped = cap_per_group(deduped, ["source"], "doc_id", 80).select(
        "doc_id", "lang", "n_tokens"
    )
    packed = pack_sequences(
        capped, "doc_id", "n_tokens", capacity=1024, group_cols=["lang"]
    )
    return packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max("bin_last") + 1).alias("n_examples"),
        F.sum(
            F.when(F.col("bin_last") > F.col("bin_first"), 1).otherwise(0)
        ).cast("bigint").alias("n_straddle"),
    )


@_register(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(substr(CAST(o.o_orderdate AS VARCHAR), 1, 4) AS INT)
               AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.06
                         AS DECIMAL(30,6))) AS DOUBLE) AS profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type LIKE '%ECONOMY%'
    GROUP BY 1, 2
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profitability (reshaped to this
    schema's columns — no partsupp, so supply cost is a retail-price
    fraction): profit per supplier nation per order year over ECONOMY
    parts — a 5-table star join where BOTH dimension legs (part filter,
    supplier→nation) broadcast and the fact-fact join (lineitem⋈orders)
    shuffles once on the natural key; the year comes from ISO-string
    prefixing per the date-hygiene rule. Decimal-exact profit expression
    → value-hash oracled. Completes the deep-join pack's Q5/Q7/Q8/Q21
    coverage with the classic profit-rollup shape."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").contains("ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.06
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.substring(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, 4)
            .cast("int")
            .alias("o_year"),
        )
        .agg(
            F.sum(profit.cast("decimal(30,6)")).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "txn_replace_where_backfill",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 = 0
    ), after_replace AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
        WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice + 100.0 AS DOUBLE) AS o_totalprice
        FROM base WHERE o_orderstatus = 'F'
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM after_replace
    WHERE NOT (o_orderstatus = 'P' AND o_totalprice < 100000)
    """,
)
def q_txn_replace_where_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level copy-on-write write paths (sources/txn.py delete_where /
    replace_where — the DELETE WHERE and Delta-replaceWhere lakehouse
    ops): a txn table takes an atomic predicate-scoped backfill (every
    'F' row swapped for its recomputed version, one commit covering the
    delete AND the insert, untouched files carried over by PATH — the
    1/365th-rewrite shape for partition backfills) followed by a
    predicate DELETE; the published snapshot is returned. The reference's
    full-table re-exports (airflow/dags/scrape_url.py re-running whole
    SQL loads) map to exactly this slice-swap at scale. Deterministic
    end-state → value-hash oracled."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 4 == 0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    t = TxnTable.create(
        spark,
        tempfile.mkdtemp(prefix="sjs_rw_q_"),
        base.repartition(4),
    )
    redo = base.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", (F.col("o_totalprice") + 100.0).cast("double")
    )
    t.replace_where(F.col("o_orderstatus") == "F", redo)
    t.delete_where(
        (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") < 100000)
    )
    return t.read()


@_register(
    "txn_update_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice * 1.1 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderstatus = 'O' THEN 'repriced'
                ELSE o_orderpriority END AS o_orderpriority
    FROM orders WHERE o_orderkey % 6 = 0
    """,
)
def q_txn_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level copy-on-write UPDATE (sources/txn.py update_where — the
    SQL UPDATE ... SET ... WHERE lakehouse op; the reference's
    UPDATE...FROM imputation family, here as a self-contained predicate
    update): every open order in the slice gets repriced in ONE commit
    that rewrites only the files holding a matching row. Deterministic
    end state → value-hash oracled."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 6 == 0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    t = TxnTable.create(
        spark, tempfile.mkdtemp(prefix="sjs_upd_q_"), base.repartition(4)
    )
    t.update_where(
        F.col("o_orderstatus") == "O",
        {
            "o_totalprice": (F.col("o_totalprice") * 1.1).cast("double"),
            "o_orderpriority": F.lit("repriced"),
        },
    )
    return t.read()


@_register(
    "txn_merge_full_sync",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 8 = 0
    ), src AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice * 1.05 AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 16 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 8 = 4
    )
    SELECT COALESCE(b.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NOT NULL AND s.o_orderkey IS NULL
                THEN 'STALE'
                WHEN b.o_orderkey IS NULL THEN s.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice
    FROM base b FULL OUTER JOIN src s ON s.o_orderkey = b.o_orderkey
    """,
)
def q_txn_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with the WHEN NOT MATCHED BY SOURCE surface (sources/txn.py
    merge — Delta's full-sync clauses, new r7): a mirror table syncs to an
    incoming snapshot in ONE atomic commit — matched keys take the
    source's repriced total, source-only keys insert, and target-only keys
    (gone from the snapshot) are SOFT-DELETED via
    ``when_not_matched_by_source_update`` (o_orderstatus → 'STALE'), the
    retention-friendly alternative to the hard
    ``when_not_matched_by_source_delete`` mirror (both pinned in
    tests/test_txn.py). Still one full-outer join on the key + one
    atomic snapshot swap; deterministic end state → value-hash oracled."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 8 == 0)
    source = (
        orders.filter(F.col("o_orderkey") % 16 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice") * 1.05).cast("double").alias("o_totalprice"),
        )
        .unionByName(orders.filter(F.col("o_orderkey") % 8 == 4))
    )
    t = TxnTable.create(
        spark, tempfile.mkdtemp(prefix="sjs_sync_q_"), base.repartition(4)
    )
    t.merge(
        source,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": F.col("s.o_totalprice")},
        when_not_matched_by_source_update={"o_orderstatus": F.lit("STALE")},
    )
    return t.read()


@_register(
    "txn_mor_update",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ), updated AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice + 500.0 AS DOUBLE)
                    ELSE o_totalprice END AS o_totalprice
        FROM base
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM updated WHERE NOT (o_totalprice < 1000)
    """,
)
def q_txn_mor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE chained with merge-on-read DELETE
    (sources/txn.py update_where_dv + delete_where_dv): the update's one
    commit records a deletion vector over matched rows AND appends their
    updated copies (write cost matched-ROWS-sized, no data file
    rewritten); the delete then stacks a second vector — including over
    the freshly-appended copies. The published read overlays both with
    one broadcast anti-join. Deterministic end state → value-hash
    oracled."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    t = TxnTable.create(
        spark, tempfile.mkdtemp(prefix="sjs_moru_q_"), base.repartition(4)
    )
    t.update_where_dv(
        F.col("o_orderstatus") == "O",
        {"o_totalprice": (F.col("o_totalprice") + 500.0).cast("double")},
    )
    t.delete_where_dv(F.col("o_totalprice") < 1000)
    return t.read()


@_register(
    "txn_deletion_vectors",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_orderkey % 8 = 0
      AND NOT (l_returnflag = 'R')
      AND NOT (l_quantity < 5)
    """,
)
def q_txn_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes (sources/txn.py delete_where_dv — the
    Delta/Iceberg deletion-vector posture): two successive DELETEs record
    row positions in deletion-vector parquets — ZERO data files rewritten
    (the second stacks on the first) — and the published read overlays
    them with a broadcast anti-join keyed on the parquet _metadata
    position. The write cost is deleted-rows-sized, independent of file
    sizes — the GDPR-erasure / late-retraction shape where copy-on-write
    rewrite amplification dominates; compaction later materializes the
    vectors away. Deterministic end state → value-hash oracled."""
    import tempfile

    from scraping_jobsdb_spark.sources.txn import TxnTable

    base = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 8 == 0
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    t = TxnTable.create(
        spark, tempfile.mkdtemp(prefix="sjs_dv_q_"), base.repartition(4)
    )
    t.delete_where_dv(F.col("l_returnflag") == "R")
    t.delete_where_dv(F.col("l_quantity") < 5)
    return t.read()


# ---------------------------------------------------------------------------
# Gate-window ordering.
#
# The round driver hash-verifies the FIRST 50 registry entries against their
# DuckDB oracles; with >50 registered queries the rest get no CORRECTNESS row
# that round. The registry therefore rotates: queries that still lack a green
# driver row (plus queries whose implementation changed) come first, queries
# verified in a previous round move behind the window. Round 2 window = the
# two round-1 hash-fixes, the re-shaped embedding near-dup, the new txn/DQ
# queries, and the highest-value round-1-unchecked entries (the remaining
# eight — window_moving_average, sorted_page_offset, small_quantity_revenue,
# top_revenue_suppliers, customer_order_histogram, group_share_threshold,
# cross_join_param_grid, scalar_misc_pack — rotate in next round; their
# operator families all have green rows already). embedding_quantized_topk
# and embedding_kmeans_cells (both rows-only by design) ceded their window
# slots to the two fully-oracled multimodal stage queries; their families
# keep hash evidence via embedding_topk/embedding_neardup_pairs and recall
# tests in tests/test_similarity.py.
# ---------------------------------------------------------------------------

# Round-8 window (registry 189, window 50). Evidence ages going in (the
# latest-evidence join over CORRECTNESS_r01-r07): r7 went 50/50 green and
# cleared the whole r3-stale cohort; the histogram is now r4:45 / r5:45 /
# r6:47 / r7:50, with exactly three oracled queries never driver-evidenced
# (registered after the r7 window froze). 3 + 2 + 45 = 50 exactly:
# (a) the 3 NEVER-EVIDENCED late-r7 registrations (VERDICT r7 item 1):
#     txn_merge_full_sync (WHEN NOT MATCHED BY SOURCE -- the only MERGE
#     clause family member without a driver row), events_ohlc_streaming
#     (streaming OHLC twin), doc_bigram_perplexity (bigram-LM quality
#     filter). All fully oracled.
# (b) the 2 drift watch-list queries whose code paths r7 touched most
#     (VERDICT r7 item 7): bpe_learned_merges (greedy min-rank encode
#     change), embedding_ann_index_txn_lifecycle (Arrow encode+assign
#     fusion). Re-evidenced even though their rows are r7-fresh.
# (c) ALL 45 queries whose latest green row is r4 -- the oldest remaining
#     evidence cohort (VERDICT r7 item 1 "then the 45-query r4-stale
#     cohort"), led by the three r7 slot-ceders variant_json_surface,
#     merge_upsert_txn, winnowing_containment_pairs, then alphabetical.
#     After this window, no query's evidence is older than r5.
# Note: embedding_ivf_topk (rows-only r7) was CONVERTED to fully-oracled
# this round (VERDICT r7 item 5, label-centroid cells + 9 dp quantized
# ranking) and takes the window's last slot so the IVF pruning path gets
# its first value-level driver row (rows-only drops 15 -> 14). To make
# room, approx_distinct_sketch is the ONE r4 query held over to lead r9:
# its distinct-count-sketch family keeps THREE sibling rows in this window
# (hll_portable_registers, hll_mergeable_sketches, kmv_distinct_sketches)
# and the query itself is the thin approx_count_distinct wrapper -- the
# lowest-information re-check in the cohort.
_GATE_PRIORITY = [
    # (a) never driver-evidenced (late-r7 registrations)
    "txn_merge_full_sync",
    "events_ohlc_streaming",
    "doc_bigram_perplexity",
    # (b) drift watch-list (r7-touched code paths)
    "bpe_learned_merges",
    "embedding_ann_index_txn_lifecycle",
    # (c) the 45-query r4-stale cohort -- slot-ceders first
    "variant_json_surface",
    "merge_upsert_txn",
    "winnowing_containment_pairs",
    "asof_join_forward_window",
    "bloom_point_lookup_txn",
    "bm25_doc_ranking",
    "cdc_apply_changes_txn",
    "cms_term_frequencies",
    "decontamination_ngram_overlap",
    "dedup_keep_best_quality",
    "dedup_pipeline_winnowing",
    "doc_chunking",
    "doc_pii_redaction",
    "doc_repetition_stats",
    "doc_segment_dedup_global",
    "doc_top_ngrams",
    "doc_unigram_surprisal",
    "embedding_int8_cosine_topk",
    "embedding_topk_np",
    "events_daily_gap_fill",
    "events_time_weighted_value",
    "fuzzy_join_supplier_names",
    "gopher_quality_flags",
    "hll_mergeable_sketches",
    "hll_portable_registers",
    "incremental_mv_refresh",
    "kmv_distinct_sketches",
    "leakage_safe_split_stats",
    "market_share_by_year",
    "minhash_portable_neardup_pairs",
    "mixture_weighted_corpus_sample",
    "nation_volume_shipping",
    "quality_top_fraction_per_lang",
    "quantile_hash_sample",
    "recursive_event_chains",
    "regional_supplier_volume",
    "retention_cohorts",
    "scalar_date_pack",
    "shipping_priority_top10",
    "skew_join_salted",
    "sole_supplier_orders",
    "term_postings_index",
    "token_budget_sample_per_lang",
    "weighted_sample_by_length",
    "embedding_ivf_topk",
]


def _reorder_registry(priority: list[str]) -> None:
    ordered = {name: REGISTRY[name] for name in priority}  # KeyError = typo
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry(_GATE_PRIORITY)

REGISTRY_DOC = {name: q.doc for name, q in REGISTRY.items()}
