"""Later-round LLM-pipeline extensions: portable hashes, sampling,
BPE/bigram-LM, ANN txn lifecycle, bloom pre-filter, e2e pipelines.

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
    is built by ONE aggregate over the small side (xxhash64 probe
    positions — native and codegen-resident, since this bitset lives only
    inside one plan; the persisted CMS/txn-bloom sketches keep their
    engine-portable md5 construction) and ships as a single binary
    literal. Bloom filters have no false negatives and the
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
# Round-8 additions: unigram-LM tokenizer (SentencePiece sibling of BPE)
# ---------------------------------------------------------------------------


@_register(
    "unigram_seed_candidates",
    oracle=r"""
    WITH words AS (
        SELECT w, COUNT(*) AS wc FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY w
    ), subs AS (
        SELECT wc, substr(w, i, l) AS piece
        FROM words,
             unnest(range(1, length(w) + 1)) AS t(i),
             unnest(range(1, 5)) AS u(l)
        WHERE i + l - 1 <= length(w)
    )
    SELECT piece, CAST(SUM(wc) AS BIGINT) AS piece_count
    FROM subs GROUP BY piece
    ORDER BY piece_count DESC, piece
    LIMIT 300
    """,
)
def q_unigram_seed_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training, step 1 (operators/textops.py
    unigram_seed_candidates — the SentencePiece seed vocabulary): corpus-
    weighted counts of every word substring of length ≤ 4, top-300. The
    tokenizer family's second trainer: BPE grows pieces bottom-up by
    merging; the unigram model starts from this over-complete substring
    seed and prunes by EM. Scale shape mirrors bpe_merge_candidates: ONE
    corpus-sized reduction to distinct words with counts, substrings
    explode off the vocabulary-sized word table only, top-k is an ordered
    limit (TakeOrderedAndProject). All-integer, lexicographic tie-break →
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import (
        unigram_seed_candidates,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"))
    return unigram_seed_candidates(docs, max_piece_len=4, k=300)


@_register("unigram_corpus_tokenize", oracle=None)
def q_unigram_corpus_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END unigram-LM tokenizer (operators/textops.py
    unigram_lm_train + unigram_lm_encode): train a 120-piece vocabulary by
    hard-EM over the corpus's distinct-word histogram (2 iterations,
    substring seed, every single character kept for full coverage), then
    Viterbi-encode every document under the learned piece log-probs —
    SentencePiece's deterministic n_best=1 decode, the probabilistic
    sibling of bpe_corpus_tokenize. The corpus-sized stages are the
    distinct-word reduction and ONE Arrow segmentation pass over the
    distinct-word table + JVM-side ordered reassembly (encode cost is per
    DISTINCT word, not per occurrence). Iterative EM → rows-only at the
    driver; determinism, coverage, encode≡train-segmentation, and
    likelihood monotonicity are property-pinned in
    tests/test_scale_ops.py. Output: (doc_id, n_tokens, tok_head) with
    tok_head the first 12 subword tokens space-joined — the driver-
    canonicalizable scalar form ``bpe_corpus_tokenize`` uses (a raw
    ``tokens array<string>`` column crashes the gate's pandas sort)."""
    from scraping_jobsdb_spark.operators.textops import (
        unigram_lm_encode,
        unigram_lm_train,
    )

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    pieces = unigram_lm_train(docs, vocab_size=120, num_iters=2)
    plist = [(r.piece, r.logprob) for r in pieces.collect()]
    return unigram_lm_encode(docs, plist).select(
        "doc_id",
        "n_tokens",
        F.array_join(F.slice("tokens", 1, 12), " ").alias("tok_head"),
    )


@_register(
    "hybrid_rrf_retrieval",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS dl,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x = 'spark')) AS tf0,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x = 'merge')) AS tf1,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x = 'vector')) AS tf2
        FROM documents WHERE text IS NOT NULL
    ), stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) AS sum_dl,
               SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
               SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
               SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        FROM base
    ), lex AS (
        SELECT b.doc_id,
               ROUND(
                   ln(1 + (s.n_docs - s.df0 + 0.5) / (s.df0 + 0.5))
                     * b.tf0 * 2.2 / (b.tf0 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs)))
                 + ln(1 + (s.n_docs - s.df1 + 0.5) / (s.df1 + 0.5))
                     * b.tf1 * 2.2 / (b.tf1 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs)))
                 + ln(1 + (s.n_docs - s.df2 + 0.5) / (s.df2 + 0.5))
                     * b.tf2 * 2.2 / (b.tf2 + 1.2 * (0.25 + 0.75 * b.dl / (s.sum_dl / s.n_docs))),
               9) AS bm25
        FROM base b CROSS JOIN stats s
    ), lex_ranked AS (
        SELECT doc_id, lex_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
            FROM lex
        ) WHERE lex_rank <= 100
    ), q AS (
        SELECT embedding FROM embeddings WHERE vec_id = 0
    ), dense AS (
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 9) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != 0
    ), dense_ranked AS (
        SELECT vec_id, dense_rank FROM (
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS dense_rank
            FROM dense
        ) WHERE dense_rank <= 100
    ), fused AS (
        SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
               CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(d.dense_rank, 0) AS BIGINT) AS dense_rank
        FROM lex_ranked l FULL OUTER JOIN dense_ranked d ON l.doc_id = d.vec_id
    )
    SELECT doc_id, lex_rank, dense_rank,
           ROUND(
               CASE WHEN lex_rank > 0
                    THEN CAST(1.0 AS DOUBLE) / (60 + lex_rank) ELSE 0 END
             + CASE WHEN dense_rank > 0
                    THEN CAST(1.0 AS DOUBLE) / (60 + dense_rank) ELSE 0 END,
           9) AS rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 25
    """,
)
def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (operators/similarity.py
    hybrid_rrf — Cormack/Clarke/Buettcher RRF, the standard RAG-retrieval
    composition): fuse the BM25 top-100 for the 3-term query
    (spark, merge, vector) with the dense cosine top-100 for the vec_id=0
    query embedding as Σ 1/(60+rank), return the fused top-25. Each leg is
    one corpus scan ending in a per-partition top-k (bm25_rank's
    TakeOrderedAndProject; brute_force_topk_np's GEMM + windowed
    row_number over the broadcast query) — the corpus is never shuffled on
    a data-sized key, and the fusion joins two ≤100-row frames, so its
    cost is corpus-size-independent. Both legs quantize scores to 9 dp
    before ranking with id tie-breaks (the engine's shared rank-stability
    contract), integer ranks make 1/(60+r) exactly reproducible IEEE math,
    and a leg miss reports rank 0 (never NULL — integral pandas dtype both
    sides) → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.similarity import hybrid_rrf

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return hybrid_rrf(
        docs, emb, ("spark", "merge", "vector"), query_vec_id=0,
        k_each=100, k_out=25,
    )


@_register(
    "doc_perplexity_buckets",
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
    ), perdoc AS (
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(s) AS DOUBLE) / COUNT(*) AS surprisal_nats
        FROM scored GROUP BY doc_id
    ), cuts AS (
        SELECT quantile_cont(surprisal_nats,
                             [CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3]) AS q
        FROM perdoc
    )
    SELECT CASE WHEN surprisal_nats <= q[1] THEN 'head'
                WHEN surprisal_nats <= q[2] THEN 'middle'
                ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           ROUND(MIN(surprisal_nats), 9) AS min_nats,
           ROUND(MAX(surprisal_nats), 9) AS max_nats
    FROM perdoc CROSS JOIN cuts
    GROUP BY 1
    """,
)
def q_doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (operators/textops.py
    perplexity_buckets — Wenzek et al.'s corpus split at the LM-perplexity
    tertiles, the selection step that follows doc_bigram_perplexity's
    scoring step). Thresholds are ONE 1-row exact-percentile aggregate
    broadcast back over the per-doc score table (percentile_approx is the
    drop-in at 100 TB — same plan, bounded memory); bucket assignment is
    map-only; NO global-sort NTILE window anywhere. Per-token nats follow
    the 9-dp + DECIMAL-sum ln-portability rule and every doc score sits
    strictly between interpolation anchors, so the <= cuts are
    cross-engine stable → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import perplexity_buckets

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return perplexity_buckets(docs)


@_register(
    "wordpiece_corpus_tokenize",
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        FROM documents WHERE text IS NOT NULL
    ), postoks AS (
        SELECT doc_id, i AS pos, ws[i] AS w
        FROM toks, unnest(range(1, len(ws) + 1)) AS t(i)
        WHERE ws[i] <> ''
    ), words AS (
        SELECT w, COUNT(*) AS wc FROM postoks GROUP BY w
    ), pieces AS (
        SELECT substr(w, i, l) AS raw, (i = 1) AS initial, wc
        FROM words,
             unnest(range(1, length(w) + 1)) AS t(i),
             unnest(range(1, 5)) AS u(l)
        WHERE i + l - 1 <= length(w)
    ), counted AS (
        SELECT raw, initial, SUM(wc) AS cnt
        FROM pieces GROUP BY raw, initial
    ), topk AS (
        SELECT raw, initial FROM counted
        ORDER BY cnt DESC, initial DESC, raw LIMIT 200
    ), vocab AS (
        SELECT DISTINCT c.raw, c.initial
        FROM counted c LEFT JOIN topk t
          ON t.raw = c.raw AND t.initial = c.initial
        WHERE t.raw IS NOT NULL OR length(c.raw) = 1
    ), sufs AS (
        SELECT w, i FROM words, unnest(range(1, length(w) + 1)) AS t(i)
    ), best AS (
        SELECT w, i, raw, l FROM (
            SELECT s.w, s.i, v.raw, length(v.raw) AS l,
                   ROW_NUMBER() OVER (PARTITION BY s.w, s.i
                                      ORDER BY length(v.raw) DESC) AS rn
            FROM sufs s JOIN vocab v
              ON v.initial = (s.i = 1)
             AND substr(s.w, s.i, length(v.raw)) = v.raw
        ) WHERE rn = 1
    ), seg AS (
        SELECT w, CAST(1 AS BIGINT) AS i, CAST('' AS VARCHAR) AS out
        FROM words
      UNION ALL
        SELECT s.w, s.i + b.l AS i,
               CASE WHEN s.i = 1 THEN b.raw
                    ELSE s.out || ' ##' || b.raw END AS out
        FROM seg s JOIN best b ON b.w = s.w AND b.i = s.i
    ), done AS (
        SELECT w, out AS wp FROM seg WHERE i = length(w) + 1
    ), perdoc AS (
        SELECT p.doc_id, string_agg(d.wp, ' ' ORDER BY p.pos) AS pieces
        FROM postoks p JOIN done d ON d.w = p.w
        GROUP BY p.doc_id
    )
    SELECT doc_id, pieces,
           CAST(len(string_split(pieces, ' ')) AS BIGINT) AS n_tokens
    FROM perdoc
    """,
)
def q_wordpiece_corpus_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END WordPiece tokenizer (operators/textops.py wordpiece_vocab
    + wordpiece_encode — the BERT tokenizer), completing the tokenizer
    triad next to BPE (merge-replay) and unigram-LM (Viterbi): derive a
    200-piece position-aware vocabulary (+ single-char coverage, so [UNK]
    is unreachable) from the corpus, then greedy longest-match-first
    encode every document. Corpus-sized stages are the distinct-word
    reduction and ONE Arrow segmentation pass over the distinct-word table
    + JVM-side ordered reassembly (encode cost per DISTINCT word, not per
    occurrence). Greedy longest-match is a pure function of (word, vocab),
    so unlike the EM-trained unigram sibling this one is FULLY ORACLED:
    DuckDB replays the segmentation as a precomputed best-match-per-suffix
    table walked by a recursive CTE. All-string/integer output →
    value-hash checked."""
    from scraping_jobsdb_spark.operators.textops import (
        wordpiece_encode,
        wordpiece_vocab,
    )

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    vocab = [
        (r.raw, r.initial)
        for r in wordpiece_vocab(docs, max_piece_len=4, k=200)
        .select("raw", "initial")
        .collect()
    ]
    enc = wordpiece_encode(docs, vocab)
    return enc.select(
        "doc_id",
        F.array_join("tokens", " ").alias("pieces"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


@_register(
    "embedding_random_projection",
    oracle="""
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
    )
    SELECT vec_id, j AS dim,
           CAST(list_sum(list_transform(range(1, len(codes) + 1),
                i -> CAST(codes[i] AS BIGINT) *
                     (1 - 2 * (CAST(('0x' || substr(md5(
                          CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                          1, 1)) AS BIGINT) % 2))))
                AS BIGINT) AS proj
    FROM q8, unnest(range(0, 16)) AS t(j)
    """,
)
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection 64→16
    (operators/similarity.py random_projection_int — Achlioptas's
    database-friendly Rademacher matrix): the embedding-compression lever
    upstream of ANN (project once, search short vectors, re-rank
    survivors full-width). Int8-quantize first (the int8 family's exact
    recipe), signs recomputed from md5("i:j") inside the expression (the
    matrix is never materialized — nothing rides closures), every output
    an exact BIGINT sum → fully value-hash oracled. Map-only codegen over
    one scan + posexplode; no shuffle, no UDF."""
    from scraping_jobsdb_spark.operators.similarity import (
        random_projection_int,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return random_projection_int(emb, out_dim=16)


@_register(
    "embedding_hard_negatives",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
        FROM embeddings WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, e.vec_id, e.label AS neg_label,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.qvec::DOUBLE[]), 9) AS qcos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.query_id AND e.label != q.qlabel
    )
    SELECT query_id, vec_id, neg_label, rank FROM (
        SELECT query_id, vec_id, neg_label,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY qcos DESC, vec_id)
                    AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q_embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (operators/similarity.py hard_negatives — the DPR/SimCSE-style
    examples an embedding model learns most from): top-5 most-similar
    DIFFERENT-label vectors per anchor (anchors 0/100/200). One corpus
    scan vs the broadcast anchor set, label-mismatch filter pruned
    map-side BEFORE the ranking window, 9-dp quantized (cos desc, id)
    ranking — the engine's shared rank-stability contract → fully
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.similarity import hard_negatives

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return hard_negatives(emb, (0, 100, 200), k=5)


@_register(
    "embedding_matryoshka_topk",
    oracle="""
    WITH s AS (
        SELECT vec_id, (embedding::DOUBLE[])[1:16] AS pv FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, pv AS qvec FROM s
        WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, s.vec_id,
               ROUND(list_cosine_similarity(s.pv, q.qvec), 9) AS qcos
        FROM s CROSS JOIN q
        WHERE s.vec_id != q.query_id
    )
    SELECT query_id, vec_id, rank FROM (
        SELECT query_id, vec_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY qcos DESC, vec_id)
                    AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-truncated retrieval (operators/similarity.py
    matryoshka_topk — Kusupati et al.'s MRL first pass: rank from the
    first 16 of 64 coordinates, 4× less score compute per candidate, then
    re-rank survivors full-width): cosine top-10 per query in the
    truncated space, 9-dp quantized ranking with id tie-breaks. Same
    broadcast-query single-scan plan as brute_force_topk; prefix overlap
    with the full-width ranking is asserted in tests → fully value-hash
    oracled."""
    from scraping_jobsdb_spark.operators.similarity import matryoshka_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return matryoshka_topk(emb, (0, 100, 200), prefix_dim=16, k=10)


@_register(
    "quality_classifier_nb",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS label, t.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE t.tok != ''
    ), tf AS (
        SELECT doc_id, label, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
    ), cls AS (
        SELECT tok,
               SUM(CASE WHEN label THEN tf ELSE 0 END) AS cp,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS cn
        FROM tf GROUP BY tok
    ), stats AS (
        SELECT SUM(CASE WHEN label THEN tf ELSE 0 END) AS np,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS nn,
               COUNT(DISTINCT tok) AS v,
               COUNT(DISTINCT CASE WHEN label THEN doc_id END) AS dp,
               COUNT(DISTINCT CASE WHEN NOT label THEN doc_id END) AS dn
        FROM tf
    ), weights AS (
        SELECT tok,
               CAST(ROUND(ln((cp + 1) / CAST(np + v AS DOUBLE))
                          - ln((cn + 1) / CAST(nn + v AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS w
        FROM cls, stats
    ), prior AS (
        SELECT CAST(ROUND(ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)), 9)
                    AS DECIMAL(30,9)) AS p
        FROM stats
    ), sums AS (
        SELECT doc_id, label, SUM(CAST(tf AS DECIMAL(10,0)) * w) AS s
        FROM tf JOIN weights USING (tok) GROUP BY 1, 2
    )
    SELECT doc_id, label,
           CAST(p + s AS DOUBLE) AS score,
           (p + s) > 0 AS predicted
    FROM sums, prior
    """,
)
def q_quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality classifier, trained AND scored in one job
    (operators/textops.py nb_quality_scores — the relational stand-in for
    the fastText quality filter CCNet/LLaMA pipelines train against a
    reference corpus; here the proxy label is lang='en'). Class-
    conditional token counts and the vocabulary-sized log-odds weight
    table derive from ONE (doc, token) tf aggregate; scoring is a
    broadcast weight join + doc-keyed decimal sum. Per-token weights
    rounded to 9 dp then DECIMAL-summed (the ln-portability rule), so the
    score and the >0 decision boundary are cross-engine exact → fully
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import nb_quality_scores

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return nb_quality_scores(docs, label=F.col("lang") == "en")


@_register(
    "dsir_importance_sample",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS t, tk.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk(tok)
        WHERE tk.tok != ''
    ), db AS (
        SELECT doc_id, t,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 256 AS b,
               COUNT(*) AS c
        FROM toks GROUP BY 1, 2, 3
    ), dist AS (
        SELECT b,
               SUM(CASE WHEN t THEN c ELSE 0 END) AS ct,
               SUM(c) AS cr
        FROM db GROUP BY b
    ), tot AS (
        SELECT SUM(CASE WHEN t THEN c ELSE 0 END) AS nt, SUM(c) AS nr FROM db
    ), ratios AS (
        SELECT b,
               CAST(ROUND(ln((ct + 1) / CAST(nt + 256 AS DOUBLE))
                          - ln((cr + 1) / CAST(nr + 256 AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS r
        FROM dist, tot
    ), scored AS (
        SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(10,0)) * r) AS DOUBLE) AS score
        FROM db JOIN ratios USING (b) GROUP BY doc_id
    )
    SELECT doc_id, score, rank FROM (
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 100
    """,
)
def q_dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/textops.py
    dsir_importance_topk — Xie et al. 2023's hashed-unigram data
    selection: score raw documents by the log importance ratio of a
    target-corpus bag-of-words model vs the raw-corpus model, keep the
    top slice; target here is the lang='en' subset). Buckets are the
    engine's portable 60-bit md5 hash mod 256; both distribution vectors
    are 256-row aggregates of the SAME (doc, bucket) count table; the cut
    is TakeOrderedAndProject. 9-dp DECIMAL log-ratios, exact decimal
    sums → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import dsir_importance_topk

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return dsir_importance_topk(
        docs, target=F.col("lang") == "en", n_buckets=256, k=100
    )


@_register(
    "doc_boilerplate_removal",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        FROM documents
    ), pos AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS tok
        FROM toks, unnest(range(1, len(ws) + 1)) AS t(i)
        WHERE ws[i] != ''
    ), tri AS (
        SELECT doc_id, i - 1 AS start,
               ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
        FROM toks, unnest(range(1, len(ws) - 1)) AS t(i)
    ), freq AS (
        SELECT gram FROM tri GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 4
    ), covered AS (
        SELECT DISTINCT t.doc_id, t.start + d.d AS pos
        FROM tri t JOIN freq USING (gram),
             (SELECT unnest([0, 1, 2]) AS d) AS d
    ), surv AS (
        SELECT p.doc_id, p.pos, p.tok
        FROM pos p ANTI JOIN covered c
          ON p.doc_id = c.doc_id AND p.pos = c.pos
    ), rebuilt AS (
        SELECT doc_id, COUNT(*) AS kept,
               string_agg(tok, ' ' ORDER BY pos) AS clean_text
        FROM surv GROUP BY doc_id
    ), counts AS (
        SELECT doc_id, COUNT(*) AS n_tokens FROM pos GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_tokens,
           c.n_tokens - COALESCE(r.kept, 0) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM counts c LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_doc_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate SPAN removal (operators/textops.py
    boilerplate_span_removal — the C4/RefinedWeb step AFTER detection:
    strike every token position covered by a corpus-frequent trigram from
    EVERY document, first occurrence included — vs dedup_segments_global
    which keeps firsts — and reassemble survivors in order). One gram-
    keyed doc-frequency aggregate, broadcast semi join of the tiny
    boilerplate list onto the occurrence stream, (doc, pos) anti join,
    JVM-side ordered reassembly. Integer/string-only → exact, fully
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import boilerplate_span_removal

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return boilerplate_span_removal(docs, min_df=4)


@_register(
    "temperature_mixture_corpus",
    oracle=r"""
    WITH shares AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), quota AS (
        SELECT lang, n,
               CAST(ROUND(100 * pow(n, 0.5) / SUM(pow(n, 0.5)) OVER (), 9)
                    AS DECIMAL(30,9)) AS q9
        FROM shares
    ), split AS (
        SELECT lang, n, CAST(FLOOR(q9) AS BIGINT) AS base,
               q9 - FLOOR(q9) AS rem
        FROM quota
    ), alloc AS (
        SELECT lang, n AS n_docs,
               base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
                                <= 100 - SUM(base) OVER ()
                           THEN 1 ELSE 0 END AS alloc
        FROM split
    ), ranked AS (
        SELECT d.lang, d.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rk
        FROM documents d
    )
    , sampled AS (
        SELECT r.lang, COUNT(*) AS n_sampled,
               CAST(SUM(r.doc_id) AS BIGINT) AS id_checksum
        FROM ranked r JOIN alloc a USING (lang)
        WHERE r.rk <= a.alloc
        GROUP BY r.lang
    )
    SELECT a.lang, a.n_docs, CAST(a.alloc AS BIGINT) AS alloc,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(s.id_checksum, 0) AS BIGINT) AS id_checksum
    FROM alloc a LEFT JOIN sampled s USING (lang)
    """,
)
def q_temperature_mixture_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled language mixture (operators/sampling.py
    temperature_mixture_sample — the XLM-R/mT5 α=0.5 recipe: per-language
    budget ∝ share^α, flattening the head so low-resource languages are
    upsampled; exact 100-doc budget via largest-remainder allocation over
    9-dp DECIMAL quotas, members picked in md5(id) order). The quota
    arithmetic windows over the 5-row language frame; selection is one
    rank window on the natural lang shuffle + a broadcast quota join →
    fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.sampling import temperature_mixture_sample

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "lang"))
    return temperature_mixture_sample(docs, group_col="lang", alpha=0.5, budget=100)


@_register(
    "doc_token_entropy",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, t.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE t.tok != ''
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), tot AS (
        SELECT doc_id, SUM(c) AS n FROM tf GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(MAX(t.n) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CAST(ROUND(-(f.c / CAST(t.n AS DOUBLE))
                                 * ln(f.c / CAST(t.n AS DOUBLE)), 9)
                         AS DECIMAL(18,9))) AS DOUBLE) AS entropy_nats
    FROM tf f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id
    """,
)
def q_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram Shannon entropy (operators/textops.py
    token_entropy — the information-density quality scalar: near-zero for
    degenerate repeated-token docs, ln(n) for all-distinct; intrinsic to
    the doc, vs unigram_surprisal's corpus-model score). One (doc, token)
    count aggregate; the per-doc total is a window over the SAME doc-keyed
    shuffle (no join, no second pass). 9-dp DECIMAL terms, exact decimal
    sums → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import token_entropy

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return token_entropy(docs)


@_register(
    "corpus_pmi_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        FROM documents
    ), grams AS (
        SELECT ws[i] AS prev, ws[i + 1] AS cur
        FROM toks, unnest(range(1, len(ws))) AS t(i)
    ), bc AS (
        SELECT prev, cur, COUNT(*) AS c FROM grams GROUP BY 1, 2
    ), lm AS (
        SELECT prev, SUM(c) AS lm FROM bc GROUP BY prev
    ), rm AS (
        SELECT cur, SUM(c) AS rm FROM bc GROUP BY cur
    ), tot AS (
        SELECT SUM(c) AS n FROM bc
    ), scored AS (
        SELECT b.prev, b.cur, b.c AS n_pair,
               ROUND(ln(CAST(b.c AS DOUBLE)) + ln(CAST(t.n AS DOUBLE))
                     - ln(CAST(l.lm AS DOUBLE)) - ln(CAST(r.rm AS DOUBLE)),
                     6) AS pmi
        FROM bc b
        JOIN lm l USING (prev) JOIN rm r USING (cur), tot t
        WHERE b.c >= 5
    )
    SELECT prev, cur, n_pair, pmi, rank FROM (
        SELECT prev, cur, n_pair, pmi,
               CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, prev, cur)
                    AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 20
    """,
)
def q_corpus_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 collocations by pointwise mutual information
    (operators/textops.py pmi_top_pairs — Church & Hanks' phrase/stop-pair
    detector, the corpus-ranking complement to bigram_surprisal's per-doc
    scoring; min_count=5 floors out noise estimates). One (prev, cur)
    count aggregate; marginals and the 1-row total are rollups of that
    SAME table; the cut is TakeOrderedAndProject. PMI is the overflow-
    proof sum of logs over exact integers, 6-dp rounded (the tfidf ln-ulp
    contract) → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import pmi_top_pairs

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return pmi_top_pairs(docs, min_count=5, k=20)


@_register("embedding_whitening_topk", oracle=None)
def q_embedding_whitening_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA-whitened cosine retrieval (operators/similarity.py
    whitening_topk — Su et al.'s whitening post-processing for anisotropic
    encoder embeddings): one mapInPandas moments pass (per-batch partial
    (n, Σx, Σxxᵀ) — d+d² doubles per partition), driver-side d×d
    eigendecomposition, one Arrow transform pass, then the standard
    broadcast-query cosine window top-k in the whitened space. Rows-only
    (eigendecomposition is not SQL-expressible); whitened-covariance ≈ I
    and rank-determinism contracts are pinned in pytest."""
    from scraping_jobsdb_spark.operators.similarity import whitening_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return whitening_topk(emb, (0, 100, 200), k=10)


@_register(
    "doc_quality_streaming",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS label, t.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE t.tok != ''
    ), tf AS (
        SELECT doc_id, label, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
    ), cls AS (
        SELECT tok,
               SUM(CASE WHEN label THEN tf ELSE 0 END) AS cp,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS cn
        FROM tf GROUP BY tok
    ), stats AS (
        SELECT SUM(CASE WHEN label THEN tf ELSE 0 END) AS np,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS nn,
               COUNT(DISTINCT tok) AS v,
               COUNT(DISTINCT CASE WHEN label THEN doc_id END) AS dp,
               COUNT(DISTINCT CASE WHEN NOT label THEN doc_id END) AS dn
        FROM tf
    ), weights AS (
        SELECT tok,
               CAST(ROUND(ln((cp + 1) / CAST(np + v AS DOUBLE))
                          - ln((cn + 1) / CAST(nn + v AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS w
        FROM cls, stats
    ), prior AS (
        SELECT CAST(ROUND(ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS p
        FROM stats
    ), sums AS (
        SELECT doc_id, label, SUM(CAST(tf AS DECIMAL(10,0)) * w) AS s
        FROM tf JOIN weights USING (tok) GROUP BY 1, 2
    )
    SELECT doc_id, label,
           CAST(p + s AS DOUBLE) AS score,
           (p + s) > 0 AS predicted
    FROM sums, prior
    """,
)
def q_doc_quality_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 × quality family: the batch-trained NB quality model scoring
    the document corpus consumed as a FILE STREAM (streaming/quality.py
    nb_scores_stream — the deployment shape of a learned quality filter in
    continuous ingestion: offline (re)fit, online stream-static broadcast
    scoring). Chained stateful aggregations being unsupported, the stream
    side sums PER-OCCURRENCE weights in its one stateful aggregate —
    bit-exact to the batch Σ tf·w because DECIMAL addition is exact. Same
    oracle as quality_classifier_nb → streaming results hash-match the
    batch model end to end."""
    from scraping_jobsdb_spark.streaming.quality import nb_scores_stream
    from scraping_jobsdb_spark.streaming.windows import run_stream_to_memory

    return run_stream_to_memory(nb_scores_stream(spark, sf_dir), spark)


@_register(
    "lang_kl_divergence",
    oracle=r"""
    WITH toks AS (
        SELECT lang AS g, t.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE t.tok != ''
    ), gt AS (
        SELECT g, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), marg AS (
        SELECT tok, SUM(c) AS ct FROM gt GROUP BY tok
    ), tot AS (
        SELECT SUM(c) AS n FROM gt
    ), ng AS (
        SELECT g, SUM(c) AS ng FROM gt GROUP BY g
    ), terms AS (
        SELECT gt.g, ng.ng,
               CAST(ROUND((gt.c / CAST(ng.ng AS DOUBLE))
                          * (ln(CAST(gt.c AS DOUBLE)) + ln(CAST(t.n AS DOUBLE))
                             - ln(CAST(ng.ng AS DOUBLE))
                             - ln(CAST(m.ct AS DOUBLE))), 9)
                    AS DECIMAL(18,9)) AS term
        FROM gt
        JOIN marg m USING (tok) JOIN ng USING (g), tot t
    )
    SELECT g AS lang,
           CAST(MAX(ng) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(term) AS DOUBLE) AS kl_nats
    FROM terms GROUP BY g
    """,
)
def q_lang_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language KL divergence from the corpus unigram distribution
    (operators/textops.py lang_kl_divergence — the domain-shift diagnostic
    read before setting mixture weights; MLE distributions, no smoothing
    needed since group vocabularies are corpus subsets). One (lang, token)
    aggregate; marginal/totals are rollups of the SAME table; group totals
    ride a window over the same lang-keyed shuffle; sum-of-logs ratio
    (overflow-proof), 9-dp DECIMAL terms, exact decimal sums → fully
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import lang_kl_divergence

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    return lang_kl_divergence(docs)


@_register(
    "k_anonymity_report",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS class_size,
           COUNT(*) >= 5 AS k_anonymous,
           CAST(CASE WHEN COUNT(*) >= 5 THEN 0 ELSE COUNT(*) END AS BIGINT)
               AS risk_rows
    FROM documents GROUP BY lang, source
    """,
)
def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance k-anonymity over the (lang, source) quasi-identifier
    pair (operators/checks.py k_anonymity_report — the release gate that
    finds equivalence classes small enough to re-identify members; k=5).
    One map-side-combined hash aggregate, exact integers → fully
    value-hash oracled."""
    from scraping_jobsdb_spark.operators.checks import k_anonymity_report

    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    return k_anonymity_report(docs, ["lang", "source"], k=5)


@_register(
    "quality_ensemble_verdicts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS label, t.tok
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE t.tok != ''
    ), tf AS (
        SELECT doc_id, label, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
    ), cls AS (
        SELECT tok,
               SUM(CASE WHEN label THEN tf ELSE 0 END) AS cp,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS cn
        FROM tf GROUP BY tok
    ), stats AS (
        SELECT SUM(CASE WHEN label THEN tf ELSE 0 END) AS np,
               SUM(CASE WHEN NOT label THEN tf ELSE 0 END) AS nn,
               COUNT(DISTINCT tok) AS v,
               COUNT(DISTINCT CASE WHEN label THEN doc_id END) AS dp,
               COUNT(DISTINCT CASE WHEN NOT label THEN doc_id END) AS dn
        FROM tf
    ), weights AS (
        SELECT tok,
               CAST(ROUND(ln((cp + 1) / CAST(np + v AS DOUBLE))
                          - ln((cn + 1) / CAST(nn + v AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS w
        FROM cls, stats
    ), prior AS (
        SELECT CAST(ROUND(ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS p
        FROM stats
    ), nb AS (
        SELECT doc_id, (p + s) > 0 AS nb_pred
        FROM (SELECT doc_id, SUM(CAST(tf AS DECIMAL(10,0)) * w) AS s
              FROM tf JOIN weights USING (tok) GROUP BY doc_id), prior
    ), dtot AS (
        SELECT doc_id, SUM(tf) AS n FROM tf GROUP BY doc_id
    ), ent AS (
        SELECT f.doc_id,
               CAST(MAX(t.n) AS BIGINT) AS n_tokens,
               CAST(SUM(CAST(ROUND(-(f.tf / CAST(t.n AS DOUBLE))
                                     * ln(f.tf / CAST(t.n AS DOUBLE)), 9)
                             AS DECIMAL(18,9))) AS DOUBLE) AS entropy_nats
        FROM (SELECT doc_id, tok, tf FROM tf) f JOIN dtot t USING (doc_id)
        GROUP BY f.doc_id
    ), ws AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS a
        FROM documents WHERE text IS NOT NULL
    ), grams AS (
        SELECT doc_id, a[i] AS prev, a[i + 1] AS cur
        FROM ws, unnest(range(1, len(a))) AS t(i)
    ), bc AS (
        SELECT prev, cur, COUNT(*) AS bc FROM grams GROUP BY prev, cur
    ), ctx AS (
        SELECT prev, SUM(bc) AS ctx FROM bc GROUP BY prev
    ), vocab AS (
        -- bigram smoothing V counts distinct tokens WITHOUT the
        -- empty-token filter (bigram_surprisal's definition) — the
        -- NB-side `toks` CTE is filtered, so derive V independently
        SELECT COUNT(DISTINCT t.tok) AS v
        FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(tok)
        WHERE text IS NOT NULL
    ), sur AS (
        SELECT doc_id,
               CAST(SUM(s) AS DOUBLE) / COUNT(*) AS surprisal_nats
        FROM (
            SELECT g.doc_id,
                   CAST(ROUND(-ln((b.bc + 1)
                                  / CAST(c.ctx + (SELECT v FROM vocab)
                                         AS DOUBLE)), 9)
                        AS DECIMAL(30,9)) AS s
            FROM grams g
            JOIN bc b ON b.prev = g.prev AND b.cur = g.cur
            JOIN ctx c ON c.prev = g.prev
        ) GROUP BY doc_id
    )
    SELECT nb.doc_id, ent.n_tokens, nb.nb_pred,
           ent.entropy_nats, sur.surprisal_nats,
           (nb.nb_pred AND ent.n_tokens >= 50
            AND ent.entropy_nats >= 2.9
            AND sur.surprisal_nats <= 3.42) AS keep
    FROM nb JOIN ent USING (doc_id) JOIN sur USING (doc_id)
    """,
)
def q_quality_ensemble_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality verdict (operators/textops.py quality_ensemble
    — the FineWeb/Dolma curation shape: word-count rule gate + learned NB
    prediction + intrinsic entropy floor + corpus-model surprisal ceiling,
    keep = conjunction). Each signal is the library operator unchanged
    (one corpus scan each, re-cuttable independently), joined on the doc
    key; every signal is already cross-engine exact so the literal cuts
    and the conjunction are too → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.textops import quality_ensemble

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    return quality_ensemble(docs, label=F.col("lang") == "en")


@_register(
    "embedding_binary_hamming_topk",
    oracle="""
    WITH packed AS (
        SELECT vec_id,
               (SELECT CAST(SUM(CASE WHEN (e.embedding::DOUBLE[])[i] > 0
                                     THEN 1::BIGINT << (i - 1) ELSE 0 END)
                            AS BIGINT)
                FROM unnest(range(1, 33)) AS t(i)) AS h0,
               (SELECT CAST(SUM(CASE WHEN (e.embedding::DOUBLE[])[i + 32] > 0
                                     THEN 1::BIGINT << (i - 1) ELSE 0 END)
                            AS BIGINT)
                FROM unnest(range(1, 33)) AS t(i)) AS h1
        FROM embeddings e
    ), q AS (
        SELECT vec_id AS query_id, h0 AS q0, h1 AS q1 FROM packed
        WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, p.vec_id,
               CAST(bit_count(xor(p.h0, q.q0)) + bit_count(xor(p.h1, q.q1))
                    AS BIGINT) AS hamming
        FROM packed p CROSS JOIN q
        WHERE p.vec_id != q.query_id
    )
    SELECT query_id, vec_id, hamming, rank FROM (
        SELECT query_id, vec_id, hamming,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY hamming, vec_id)
                    AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized Hamming retrieval (operators/similarity.py
    binary_hamming_topk — the 1-bit point on the quantization ladder:
    zero-threshold sign bits packed into two BIGINT halves, XOR+popcount
    distances, 32× smaller scan than float32; the hot first pass in
    modern vector stores). Map-only packing, broadcast-query window
    top-k, integer distances with id tie-breaks → fully value-hash
    oracled."""
    from scraping_jobsdb_spark.operators.similarity import binary_hamming_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return binary_hamming_topk(emb, (0, 100, 200), k=10)


@_register(
    "referential_integrity_report",
    oracle="""
    SELECT 'orders.o_custkey -> customer' AS relationship,
           (SELECT COUNT(*) FROM orders) AS child_rows,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS orphan_rows,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0 AS ok
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_suppkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_suppkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey)) = 0
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)) = 0
    """,
)
def q_referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse FK orphan audit over four relationships
    (operators/checks.py referential_integrity_report — the DQ gate that
    catches children-before-parents ingestion and bad backfills; NULL FKs
    are not orphans, matching SQL FK semantics). One left-anti join per
    relationship against the parent KEY projection (scans prune to the
    key; small parents broadcast), exact integers → fully value-hash
    oracled."""
    from scraping_jobsdb_spark.operators.checks import (
        referential_integrity_report,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return referential_integrity_report(
        [
            ("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem.l_orderkey -> orders", l, "l_orderkey", o, "o_orderkey"),
            ("lineitem.l_suppkey -> supplier", l, "l_suppkey", s, "s_suppkey"),
            ("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey"),
        ]
    )


@_register(
    "events_value_psi_daily",
    oracle="""
    WITH binned AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(GREATEST(0, LEAST(FLOOR(value / 50.0), 9)) AS INT) AS bin
        FROM events
    ), counts AS (
        SELECT day, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
    ), day_totals AS (
        SELECT day, SUM(c) AS n_d FROM counts GROUP BY day
    ), grid AS (
        SELECT d.day, d.n_d, b.bin
        FROM day_totals d
        CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) AS b
    ), dense AS (
        SELECT g.day, g.n_d, g.bin, COALESCE(c.c, 0) AS c
        FROM grid g
        LEFT JOIN counts c ON c.day = g.day AND c.bin = g.bin
    ), base AS (
        SELECT bin, c AS cb, n_d AS nb FROM dense
        WHERE day = (SELECT MIN(day) FROM counts)
    ), terms AS (
        SELECT d.day, d.n_d,
               CAST(ROUND(((d.c + 1) / CAST(d.n_d + 10 AS DOUBLE)
                           - (b.cb + 1) / CAST(b.nb + 10 AS DOUBLE))
                          * ln(((d.c + 1) / CAST(d.n_d + 10 AS DOUBLE))
                               / ((b.cb + 1) / CAST(b.nb + 10 AS DOUBLE))),
                          9) AS DECIMAL(18,9)) AS t
        FROM dense d JOIN base b USING (bin)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MAX(n_d) AS BIGINT) AS n_events,
           CAST(SUM(t) AS DOUBLE) AS psi
    FROM terms GROUP BY day
    """,
)
def q_events_value_psi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Population Stability Index of the event value distribution vs
    the earliest day (operators/temporal.py value_psi_by_day — the ML-ops
    drift monitor that fires before a downstream model degrades; add-one
    smoothed over a dense fixed-bin grid so empty bins never ln(0)). One
    (day, bin) aggregate; totals, grid and baseline are rollups of that
    SAME table broadcast back. 9-dp DECIMAL terms, exact sums; the
    baseline day reads exactly 0 → fully value-hash oracled."""
    from scraping_jobsdb_spark.operators.temporal import value_psi_by_day

    ev = fan_out(load_table(spark, sf_dir, "events").select("ts", "value"))
    return value_psi_by_day(ev)


@_register(
    "attribution_last_touch",
    oracle=f"""
    WITH touches AS (
        SELECT user_id, ts, arg_max(event_type, event_id) AS touch
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY user_id, ts
    ), p AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(t.touch, 'none') AS touch_type,
           COUNT(*) AS n_purchases,
           {_dsum_sql('p.value')} AS attributed_value
    FROM p ASOF LEFT JOIN touches t
      ON p.user_id = t.user_id AND p.ts >= t.ts
    GROUP BY 1
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits the user's
    most recent preceding touch event (click or view), 'none' when the
    purchase had no prior touch — the marketing-analytics composition of
    the engine's as-of join (operators/temporal.py asof_join: one
    union-sort shuffle, last(ignorenulls) carry, no candidate explosion)
    with a decimal-exact revenue rollup. Touches pre-aggregate to one row
    per (user, ts) via max_by(event_type, event_id) so equal-timestamp
    ties resolve identically in both engines → fully value-hash
    oracled (DuckDB replays with native ASOF LEFT JOIN + arg_max)."""
    from scraping_jobsdb_spark.operators.temporal import asof_join

    ev = fan_out(load_table(spark, sf_dir, "events"))
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    att = asof_join(purchases, touches, "user_id", "ts", "ts", ["touch"])
    return att.groupBy(
        F.coalesce(F.col("asof_touch"), F.lit("none")).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        _dsum("value").alias("attributed_value"),
    )
