"""Scalar function packs (SURVEY §2.6, F1-F16) + latest-per-key, SQL
API surface, subqueries, conditional aggregates.

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




@_register(
    "url_canonical_dedup",
    oracle="""
    SELECT doc_id,
           'http://site' || CAST(doc_id % 50 AS VARCHAR)
             || '.example' || CAST(doc_id % 7 AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END
             || '/path/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
             AS url_canon,
           'example' || CAST(doc_id % 7 AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END
             AS reg_domain,
           CAST(2 AS BIGINT) AS n_variants
    FROM documents
    """,
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level crawl dedup (functions/scalars.py canonicalize_url +
    registered_domain — the URL counterpart of the content-dedup
    families, and the generalization of the reference's exact-URL-id
    anti-join, ``scrape_url.py:176``): every document appears as two
    crawl variants — a messy form (uppercase scheme/host, www., explicit
    :80, tracking params in scrambled order, a fragment, a trailing
    slash) and its clean twin — and canonicalization must collapse each
    pair to ONE canonical key. The oracle is deliberately INDEPENDENT:
    DuckDB states the expected canonical string and registered domain
    directly from doc_id arithmetic (it never re-runs the
    canonicalizer), so a hash match proves the whole transform chain —
    case folding, www/port stripping, fragment drop, tracking-param
    filter, param sort, trailing-slash strip, co.uk-style suffix
    handling — lands exactly on the declared target. All JVM-side
    expressions; the dedup is one hash aggregate on the canonical key."""
    from scraping_jobsdb_spark.functions.scalars import (
        canonicalize_url,
        registered_domain,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id"))
    a = (F.col("doc_id") % 50).cast("string")
    b = (F.col("doc_id") % 7).cast("string")
    tld = F.when(F.col("doc_id") % 4 == 0, F.lit(".CO.UK")).otherwise(
        F.lit(".COM")
    )
    tld_l = F.lower(tld)
    i = F.col("doc_id").cast("string")
    messy = F.concat(
        F.lit("HTTP://WWW.Site"), a, F.lit(".Example"), b, tld,
        F.lit(":80/path/"), i,
        F.lit("/?utm_source=x&b=2&a=1&fbclid=zz#frag"),
    )
    clean = F.concat(
        F.lit("http://site"), a, F.lit(".example"), b, tld_l,
        F.lit("/path/"), i, F.lit("?a=1&b=2"),
    )
    variants = docs.select("doc_id", messy.alias("url")).unionByName(
        docs.select("doc_id", clean.alias("url"))
    )
    return (
        variants.select(
            "doc_id",
            canonicalize_url("url").alias("url_canon"),
            registered_domain("url").alias("reg_domain"),
        )
        .groupBy("url_canon")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("reg_domain").alias("reg_domain"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .select("doc_id", "url_canon", "reg_domain", "n_variants")
    )
