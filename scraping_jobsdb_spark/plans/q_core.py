"""Flagship (salary imputation), aggregations, projections, joins,
windows / sort / limit / set ops (SURVEY §2.2-§2.5).

Registry chunk split from plans/queries.py (registration order is
preserved by the import sequence in plans/queries.py; the gate window is
re-applied there). Unused imports are part of the shared chunk header.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.dedup import dedup_exact, dedup_first
from scraping_jobsdb_spark.operators.incremental import new_rows
from scraping_jobsdb_spark.operators.merge import coalesce_merge
from scraping_jobsdb_spark.plans._shared import _dsum, _dsum_sql, _register
from scraping_jobsdb_spark.sources.tables import fan_out, load_table

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
    (SURVEY.md §2.4 closing note). The decimal partial aggregation is the
    CPU of this query; fan_out keeps it off a single task when the scan
    has fewer splits than cores (the filter still pushes below the
    repartition, so PushedFilters stays at the scan). Keyed on the
    high-cardinality price column because keyless round-robin pays a
    per-task sort of its input first (guide §2.5) — measured 0.85→0.52 s
    exec at sf0.1."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem"), cols=["l_extendedprice"]
    )
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
# Live JDBC roundtrip (§2.1 S5/S6)
# ---------------------------------------------------------------------------


@_register(
    "jdbc_live_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {_dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_jdbc_live_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S6 LIVE: write orders into an embedded Derby database over JDBC
    (Spark's own jars ship derby-10.16 — zero extra dependencies), read it
    back as a PARTITIONED JDBC scan (8 range predicates over o_orderkey —
    the reference's scan is single-partition, ``ParseHtml.py:33-41``), and
    aggregate. The JDBC write uses OVERWRITE here so the registered query is
    idempotent across driver re-runs (the reference's append semantics — one
    connection per partition — are exercised by tests/test_jdbc.py, which
    asserts two appends double the rows). Types chosen to round-trip
    exactly: BIGINT, DOUBLE (Derby DOUBLE is IEEE 754), VARCHAR. The
    partition bounds come from a 1-row min/max aggregate (bounded driver
    collect); rows outside the bounds would still land in the edge
    partitions, so correctness never depends on them."""
    from scraping_jobsdb_spark.sources.tables import read_jdbc_partitioned

    url = "jdbc:derby:memory:sjdb_gate;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    lo, hi = src.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    src.repartition(4).write.mode("overwrite").jdbc(
        url, "orders_jdbc", properties=props
    )
    back = read_jdbc_partitioned(
        spark, url, "orders_jdbc", "o_orderkey", lo, hi + 1, 8,
        properties=props,
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("sum_price"),
    )
