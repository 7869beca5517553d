"""Wider analytic surface: TPC-H-shaped subquery/predicate forms, window
variants, pivot/grouping sets, percentile, higher-order array functions.

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




@_register(
    "waiting_supplier_report",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ), multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) > 1
    ), sole_late AS (
        SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
        FROM late GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) = 1
    )
    SELECT s.l_suppkey AS suppkey, COUNT(*) AS numwait
    FROM sole_late s JOIN multi m USING (l_orderkey)
    GROUP BY 1
    ORDER BY numwait DESC, suppkey
    LIMIT 20
    """,
)
def q_waiting_supplier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped 'suppliers who kept orders waiting': for finished
    orders served by MULTIPLE suppliers, find the orders where EXACTLY ONE
    supplier shipped late (> 60 days after the order date) and charge that
    order to the late supplier — the classic EXISTS + NOT-EXISTS nesting,
    expressed as aggregates instead of correlated subqueries: 'exactly one
    distinct late supplier' ≡ EXISTS(other supplier) ∧ NOT EXISTS(other
    LATE supplier), but each condition becomes one grouped HAVING on an
    already-scanned frame rather than two more semi/anti self-joins of
    lineitem (the Catalyst decorrelation would scan lineitem three times;
    this form scans it twice and orders once). Top-20 under the total
    order (numwait desc, suppkey) via TakeOrderedAndProject.

    The fan-out is KEYED on ``l_orderkey`` (guide §2.4 — one exchange
    doing double duty): every downstream operator clusters on exactly
    that key (the ``multi`` count-distinct, the ``sole_late`` aggregate
    after the broadcast orders join preserves the child partitioning, and
    the sole_late⋈multi join), so each branch's aggregates run on already
    co-partitioned data with ZERO further data exchanges — the round-robin
    form paid two extra lineitem-sized shuffles for the same answer
    (plan-diffed: 7 data Exchanges → 3, plans/r14)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem"), cols=["l_orderkey"]
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    late = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__nl"),
            F.min("l_suppkey").alias("suppkey"),
        )
        .filter(F.col("__nl") == 1)
        .select("l_orderkey", "suppkey")
    )
    return (
        sole_late.join(multi, "l_orderkey")
        .groupBy("suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(20)
    )
