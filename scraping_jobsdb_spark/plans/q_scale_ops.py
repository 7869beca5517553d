"""Scale operators: point lookups, sketches, quality flags, sampling
families, skew handling, incremental dedup.

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
    across shards. The six decimal product-sums are the CPU; fan_out
    keeps the partial aggregation off a single task when the scan has
    fewer splits than cores (keyed on the high-cardinality price column —
    keyless round-robin pays a per-task pre-sort, guide §2.5)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem"), cols=["l_extendedprice"]
    )
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

    # the md5 probe derivation per (term, seed) is the CPU of the sketch
    # build; fan_out keeps it off a single task on a narrow scan
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("text")
    ).filter(F.col("text").isNotNull())
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


# Shared by the batch and STREAMING index-dedup twins: the same two
# index states, probes and verdicts replayed declaratively.
_IDX_DEDUP_ORACLE = r"""
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
    """


@_register(
    "incremental_indexed_dedup",
    oracle=_IDX_DEDUP_ORACLE,
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
    # Fingerprint batch 1 ONCE and share the materialized frame between
    # the probe and the admission append (fingerprinting is deterministic
    # per doc, so the shared frame is row-identical to each path's own
    # derivation — the r14 admit_stream_batch construction, applied to
    # the probe-then-add composition; one signing map pass per batch
    # instead of two, at any scale).
    fps_b1 = idx.fingerprint(batch1).localCheckpoint()
    v1 = idx.probe(batch1, threshold_milli=800, _fps_b=fps_b1).withColumn(
        "batch_no", F.lit(1).cast("int")
    )
    idx.add(batch1, _fps=fps_b1)
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




# Bit-interleave expression for the 8-bit-per-dimension Morton code —
# generated once so the Spark column and the DuckDB oracle share the text.
_ZORDER_EXPR = (
    "(((bx >> 0) & 1) << 0) + (((by >> 0) & 1) << 1) + (((bx >> 1) & 1) << 2) + (((by >> 1) & 1) << 3) + (((bx >> 2) & 1) << 4) + (((by >> 2) & 1) << 5) + (((bx >> 3) & 1) << 6) + (((by >> 3) & 1) << 7) + (((bx >> 4) & 1) << 8) + (((by >> 4) & 1) << 9) + (((bx >> 5) & 1) << 10) + (((by >> 5) & 1) << 11) + (((bx >> 6) & 1) << 12) + (((by >> 6) & 1) << 13) + (((bx >> 7) & 1) << 14) + (((by >> 7) & 1) << 15)"
)


@_register(
    "zorder_layout_stats",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS x,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y
        FROM orders
    ), stats AS (
        SELECT MIN(x) AS minx, MAX(x) AS maxx,
               MIN(y) AS miny, MAX(y) AS maxy
        FROM base
    ), coords AS (
        SELECT x, y,
               ((x - minx) * 256) // (maxx - minx + 1) AS bx,
               ((y - miny) * 256) // (maxy - miny + 1) AS by
        FROM base CROSS JOIN stats
    ), z AS (
        SELECT x, y, """ + _ZORDER_EXPR + """ AS zval
        FROM coords
    )
    SELECT zval >> 8 AS zbucket,
           COUNT(*) AS n_rows,
           MIN(x) AS min_cust, MAX(x) AS max_cust,
           MIN(y) AS min_price_c, MAX(y) AS max_price_c
    FROM z GROUP BY 1
    """,
)
def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) DATA-LAYOUT statistics over orders on the
    (customer, price) plane — the multi-dimensional clustering technique
    lakehouse writers (Delta OPTIMIZE ZORDER, Iceberg sort orders) use so
    per-file min/max stats prune scans on EITHER predicate column: each
    row's two dimensions are range-normalized to 8 bits (one 1-row
    min/max aggregate broadcast back), bit-interleaved into a 16-bit
    Morton code, and grouped by the code's high byte — exactly the
    file-assignment a `repartitionByRange(zval)` write would produce.
    The emitted per-bucket (count, min/max of both raw dimensions) IS
    the pruning evidence: every bucket bounds BOTH dimensions to ~1/16
    of their range, where a single-column sort bounds one and leaves the
    other unconstrained (pinned in tests). All arithmetic is integer
    (price in exact DECIMAL cents; normalization is integer
    multiply-divide; interleave is shifts/masks shared TEXTUALLY with
    the oracle), so the whole layout value-hash replays."""
    o = fan_out(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    stats = o.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    coords = o.crossJoin(F.broadcast(stats)).select(
        "x",
        "y",
        F.expr("((x - minx) * 256) div (maxx - minx + 1)").alias("bx"),
        F.expr("((y - miny) * 256) div (maxy - miny + 1)").alias("by"),
    )
    z = coords.select("x", "y", F.expr(_ZORDER_EXPR).alias("zval"))
    return z.groupBy(
        F.shiftright(F.col("zval"), 8).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_cust"),
        F.max("x").alias("max_cust"),
        F.min("y").alias("min_price_c"),
        F.max("y").alias("max_price_c"),
    )


@_register(
    "bitmap_exact_distinct",
    oracle="""
    WITH per_type AS (
        SELECT event_type AS scope, COUNT(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY 1
    ), merged AS (
        SELECT '__all__' AS scope, COUNT(DISTINCT user_id) AS n_distinct
        FROM events
    )
    SELECT scope, n_distinct FROM per_type
    UNION ALL
    SELECT scope, n_distinct FROM merged
    """,
)
def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark's native bitmap functions
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_or_agg / bitmap_count, Spark 3.5+) — the warehouse recipe for
    exact COUNT DISTINCT that still PRE-AGGREGATES: per (event_type,
    32k-value bucket) partial bitmaps are built map-side, per-type counts
    sum the per-bucket popcounts, and the '__all__' row demonstrates the
    MERGE law (bitmap_or_agg over the per-type bitmaps ≡ distinct of the
    union) — what the approximate HLL/KMV family cannot give when the
    business rule says exact. Shape: one scan, one (type, bucket)-keyed
    aggregate whose state is a 4 KB bitmap per bucket (NOT a per-value
    set — memory is bounded by the value RANGE/32k per group, not by
    cardinality), then k-bucket-sized rollups; everything integer →
    value-hash oracles against DuckDB's exact distinct."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("__bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("__pos"),
        )
        .groupBy("event_type", "__bucket")
        .agg(F.expr("bitmap_construct_agg(__pos)").alias("__bm"))
    )
    per_type = (
        per_bucket.groupBy(F.col("event_type").alias("scope"))
        .agg(F.sum(F.expr("bitmap_count(__bm)")).alias("n_distinct"))
    )
    merged = (
        per_bucket.groupBy("__bucket")
        .agg(F.expr("bitmap_or_agg(__bm)").alias("__bm"))
        .agg(F.sum(F.expr("bitmap_count(__bm)")).alias("n_distinct"))
        .select(F.lit("__all__").alias("scope"), "n_distinct")
    )
    return per_type.unionByName(merged)


@_register(
    "range_partition_balance_report",
    oracle="""
    WITH keys AS (
        SELECT o_custkey AS k FROM orders
    ), bnds AS (
        SELECT quantile_cont(CAST(k AS DOUBLE),
                             [CAST(i AS DOUBLE) / 16 FOR i IN range(1, 16)])
                   AS bs
        FROM keys
    ), assigned AS (
        SELECT k, len(list_filter(bs, b -> k > b)) AS bucket
        FROM keys CROSS JOIN bnds
    ), agg AS (
        SELECT bucket, COUNT(*) AS n_rows,
               MIN(k) AS min_key, MAX(k) AS max_key
        FROM assigned GROUP BY bucket
    )
    SELECT CAST(bucket AS INT) AS bucket, n_rows, min_key, max_key,
           ROUND(n_rows * 16.0 / (SELECT COUNT(*) FROM keys), 9)
               AS balance_ratio
    FROM agg
    """,
)
def q_range_partition_balance_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range-partition boundary planning made observable — the exact
    computation behind a sorted lakehouse write (`repartitionByRange` /
    Iceberg sort orders): 15 exact percentile cuts of the key (ONE 1-row
    aggregate broadcast back — the registered sibling
    ``range_partition_balance_approx`` is the percentile_approx 100 TB
    production form with the identical plan; this exact form stays as
    the oracle-parity baseline), map-side bucket assignment by counting
    boundaries below the key, and the per-bucket (rows, min/max,
    balance ratio) report that tells you BEFORE writing whether the
    layout will be balanced (ratio ≈ 1) or skew-hot (ratio ≫ 1 — the
    signal to salt or split). Boundary comparisons are exact (integer
    keys, half-integer percentile cuts), so the whole report value-hash
    replays. Shape: one scan for the cuts, one map-only assignment pass,
    one 16-group aggregate."""
    keys = fan_out(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("k")
    )
    # ONE percentile aggregate over the 15-fraction ARRAY, not 15 separate
    # aggregates: each percentile instance buffers its own value-counts map,
    # so the 15-way form held 15 independent copies of the aggregation
    # state per partial — the 100x sweep OOM'd exactly there (r9 verdict
    # item 5's suspect confirmed). The array form computes every cut from
    # one shared map with identical interpolation arithmetic → identical
    # boundaries, 1/15th the state.
    fracs = ", ".join(f"{i}.0D/16.0D" for i in range(1, 16))
    bnds = keys.agg(
        F.expr(f"percentile(cast(k as double), array({fracs}))").alias("bs")
    )
    assigned = keys.crossJoin(F.broadcast(bnds)).select(
        "k",
        F.size(F.filter(F.col("bs"), lambda b: F.col("k") > b)).alias(
            "bucket"
        ),
    )
    total = keys.agg(F.count(F.lit(1)).alias("__t"))
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_rows",
            "min_key",
            "max_key",
            F.round(
                F.col("n_rows") * F.lit(16.0) / F.col("__t"), 9
            ).alias("balance_ratio"),
        )
    )


@_register(
    "range_partition_balance_approx",
    oracle="""
    SELECT CAST(16 AS INT) AS n_buckets,
           (SELECT COUNT(*) FROM orders) AS total_rows,
           TRUE AS coverage_ok,
           TRUE AS boundaries_monotone,
           TRUE AS balanced
    """,
)
def q_range_partition_balance_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION form of ``range_partition_balance_report`` (r9
    verdict item 6): identical plan shape, but the 15 boundary cuts come
    from ``percentile_approx`` (Spark's Greenwald-Khanna sketch,
    accuracy=10000) instead of the exact full-value-buffering
    ``percentile`` — bounded aggregation state per partition, the drop-in
    at 100 TB where buffering every key value is the scale-killer the
    exact twin's 10× sweep flagged (6.97×, the steepest non-GEMM family).

    Evidence split, per the exact/approx contract the HLL/KMV family set:
    sketch merge order makes the approx boundary VALUES
    partitioning-dependent, so the gate row pins the INVARIANTS any valid
    boundary set satisfies — 16 buckets, exact total coverage (no row
    lost or double-assigned), monotone boundaries, and all balance
    ratios within [0.5, 1.5] (the report's operational verdict: rank
    error ≤ 1e-4 ≪ the 0.5 skew-flag threshold) — while the
    exact≡approx-within-rank-tolerance comparison lives in
    tests/test_scale_ops.py against the exact twin (which stays
    registered as the oracle-parity form). Shape: one scan for the cuts
    (ONE 1-row sketch aggregate broadcast back), one map-only assignment
    pass, one 16-group aggregate — no corpus-sized value buffer
    anywhere."""
    keys = fan_out(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("k")
    )
    # ONE GK sketch evaluated at the 15-fraction ARRAY, not 15 separate
    # percentile_approx instances — the exact twin learned this in r9
    # (each instance keeps its own aggregation state per partial); the
    # array form carried this query from 5.6x to ~2x at 10x data in the
    # r13 sweep, and one shared sketch also makes the returned cuts
    # monotone by construction.
    fracs = ", ".join(f"{i}.0D/16.0D" for i in range(1, 16))
    bnds = keys.agg(
        F.expr(
            f"percentile_approx(cast(k as double), array({fracs}), 10000)"
        ).alias("bs")
    )
    assigned = keys.crossJoin(F.broadcast(bnds)).select(
        "k",
        F.size(F.filter(F.col("bs"), lambda b: F.col("k") > b)).alias(
            "bucket"
        ),
        "bs",
    )
    total = keys.agg(F.count(F.lit(1)).alias("__t"))
    per_bucket = (
        assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_rows",
            (F.col("n_rows") * F.lit(16.0) / F.col("__t")).alias("ratio"),
            "__t",
        )
    )
    mono = bnds.select(
        (
            F.col("bs")
            == F.array_sort("bs")
        ).alias("boundaries_monotone")
    )
    return (
        per_bucket.agg(
            F.count(F.lit(1)).cast("int").alias("n_buckets"),
            F.sum("n_rows").alias("total_rows"),
            (F.sum("n_rows") == F.first("__t")).alias("coverage_ok"),
            (
                (F.max("ratio") <= F.lit(1.5))
                & (F.min("ratio") >= F.lit(0.5))
            ).alias("balanced"),
        )
        .crossJoin(F.broadcast(mono))
        .select(
            "n_buckets",
            "total_rows",
            "coverage_ok",
            "boundaries_monotone",
            "balanced",
        )
    )


@_register(
    "approx_topk_native",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents WHERE text IS NOT NULL
    ), counted AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    )
    SELECT tok, cnt FROM counted
    ORDER BY cnt DESC, tok LIMIT 20
    """,
)
def q_approx_topk_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters via Spark's NATIVE approx_top_k (the DataSketches
    frequent-items aggregate, Spark 4+): one bounded-state pass over the
    exploded tokens — the streaming-friendly alternative to a full
    groupBy when only the head matters. The sketch tracks maxItemsTracked
    candidates; when the live vocabulary fits inside that budget (as
    here: the synthetic corpus has 31 tokens vs a 4096 budget) its counts
    are EXACT, which is what lets this query carry a value-hash oracle —
    the wrapper re-sorts the returned (item, count) pairs under the
    engine-wide (count desc, token) total order so the sketch's own
    arbitrary tie order never reaches the output. On a vocabulary larger
    than the budget the counts become estimates with error bounds and the
    oracle contract would drop to rows-only — the same exact-to-approx
    trade the HLL/KMV family documents. Shape: explode once, ONE
    sketch-state aggregate (no (token)-keyed shuffle of the corpus), one
    20-row sort."""
    from scraping_jobsdb_spark.operators.textops import tokens

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("text")
    )
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    sketch = toks.agg(
        F.expr("approx_top_k(tok, 64, 4096)").alias("top")
    )
    return (
        sketch.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("tok"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(20)
    )


@_register(
    "streaming_indexed_dedup",
    oracle=_IDX_DEDUP_ORACLE,
)
def q_streaming_indexed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-maintenance twin of ``incremental_indexed_dedup``
    (operators/fpindex.py add_stream_batch — the ``foreachBatch`` body of
    a continuously-ingesting dedup index): identical index states and
    probes, but batch 1's admission goes through the EPOCH-KEYED
    exactly-once append (``stream_epoch_append`` — a failure-recovery
    replay of the same (app_id, epoch) appends nothing and the DF-view
    refresh no-ops; replayed here explicitly to prove it) instead of the
    plain transactional add. Streaming-equals-batch at the REGISTRY
    level: this query shares the batch twin's oracle verbatim, so the
    driver hash-verifies that N micro-batches through the streaming path
    leave verdicts byte-identical to the batch sequence. Same scale
    shape as the batch twin: batch fingerprint sets broadcast, probes
    stream map-side over the index scan, the DF view folds ONLY the
    epoch's delta."""
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
        spark, tempfile.mkdtemp(prefix="sjs_fpidx_s_"), corpus,
        k=8, w=4, max_df=50,
    )
    v1 = idx.probe(batch1, threshold_milli=800).withColumn(
        "batch_no", F.lit(1).cast("int")
    )
    idx.add_stream_batch(batch1, epoch_id=0)
    # failure-recovery replay of the SAME epoch: must append nothing —
    # the probe below would see doubled fingerprints otherwise
    replay_rows = idx.add_stream_batch(batch1, epoch_id=0)
    if replay_rows != 0:
        raise AssertionError(
            f"epoch replay appended {replay_rows} rows; expected 0"
        )
    v2 = idx.probe(batch2, threshold_milli=800).withColumn(
        "batch_no", F.lit(2).cast("int")
    )
    return v1.unionByName(v2).select(
        "doc_id", "batch_no", "n_fp", "n_dup_of", "kept"
    )


# Shared oracle for the LSH-signature-index pair: DuckDB re-derives the
# md5-window band keys (the construction minhash_portable_neardup_pairs
# proved green), replays both index states (corpus, then corpus ∪ batch 1)
# with their hot-bucket guards, and scores both probes. Integer/string
# exact end to end, so the whole add→probe lifecycle value-hashes.
_LSH_IDX_DEDUP_ORACLE = r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM all_docs WHERE text IS NOT NULL
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
    ), bk_c AS (        -- index state at probe 1: the original corpus
        SELECT doc_id, band, key FROM bandkeys
        WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), bk_b1 AS (       -- batch 1: every 5th document
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id % 5 = 0
    ), bk_b2 AS (       -- batch 2: injected near-dups (+20000 ids)
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id >= 20000
    ), hot1 AS (
        SELECT band, key FROM bk_c GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb1 AS (
        SELECT b.* FROM bk_b1 b
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc1 AS (
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits1 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb1 b JOIN pc1 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), bk_c2 AS (       -- index state at probe 2: corpus UNION batch 1
        SELECT doc_id, band, key FROM bk_c
        UNION ALL
        SELECT doc_id, band, key FROM bk_b1
    ), hot2 AS (
        SELECT band, key FROM bk_c2 GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb2 AS (
        SELECT b.* FROM bk_b2 b
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc2 AS (
        SELECT c.* FROM bk_c2 c
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits2 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb2 b JOIN pc2 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), b1 AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
    ), b2 AS (
        SELECT doc_id + 20000 AS doc_id
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1 AND text IS NOT NULL
    )
    SELECT b.doc_id, 1 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b1 b LEFT JOIN hits1 h ON b.doc_id = h.bid
    UNION ALL
    SELECT b.doc_id, 2 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b2 b LEFT JOIN hits2 h ON b.doc_id = h.bid
    """


@_register(
    "incremental_minhash_indexed_dedup",
    oracle=_LSH_IDX_DEDUP_ORACLE,
)
def q_incremental_minhash_indexed_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PERSISTED-INDEX posture of MinHash-LSH near-dup dedup
    (operators/lshindex.py LshSignatureIndex — VERDICT r10 item 4, the
    near-dup analog of incremental_indexed_dedup's FingerprintIndex): the
    corpus is signed ONCE into a transactional (doc_id, band, key) index
    with an incrementally-maintained per-bucket size view (the hot-bucket
    guard that bounds quadratic candidate expansion, maintained like the
    fingerprint index's stop-gram view); then two successive batches
    probe the STORED index — batch 1 (every 5th document) is scored and
    admitted via add() (append + O(delta+view) bucket-size refresh, no
    corpus re-sign), and batch 2 (injected truncated near-dups) is scored
    against the UPDATED index, where LSH banding catches them. The batch
    signature sets are broadcast, so each probe streams map-side over the
    index scan — zero corpus-sized shuffles, cost independent of corpus
    size. md5-portable permutations (minhash_band_keys_portable), so the
    oracle re-derives both index states and all verdicts bit-for-bit; the
    xxhash64 hot path shares the index code and is covered by equivalence
    tests in tests/test_lshindex.py."""
    import tempfile

    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    idx = LshSignatureIndex.create(
        spark, tempfile.mkdtemp(prefix="sjs_lshidx_q_"), corpus,
        k=16, bands=4, shingle_n=3, max_bucket=64,
    )
    # sign batch 1 ONCE, shared by probe + admission append (deterministic
    # per-doc signing — see incremental_indexed_dedup)
    sig_b1 = idx.sign(batch1).localCheckpoint()
    v1 = idx.probe(batch1, _sig_b=sig_b1).withColumn(
        "batch_no", F.lit(1).cast("int")
    )
    idx.add(batch1, _sigs=sig_b1)
    v2 = idx.probe(batch2).withColumn("batch_no", F.lit(2).cast("int"))
    return v1.unionByName(v2).select(
        "doc_id", "batch_no", "n_bands_hit", "n_cand", "kept"
    )


@_register(
    "streaming_minhash_indexed_dedup",
    oracle=_LSH_IDX_DEDUP_ORACLE,
)
def q_streaming_minhash_indexed_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAMING-maintenance twin of
    ``incremental_minhash_indexed_dedup`` (operators/lshindex.py
    add_stream_batch — the ``foreachBatch`` body of a continuously-
    ingesting near-dup index): identical index states and probes, but
    batch 1's admission goes through the EPOCH-KEYED exactly-once append
    (a failure-recovery replay of the same (app_id, epoch) appends
    nothing and the bucket-size refresh no-ops; replayed here explicitly
    to prove it). Streaming-equals-batch at the REGISTRY level: this
    query shares the batch twin's oracle verbatim, so the driver
    hash-verifies that micro-batches through the streaming path leave
    verdicts byte-identical to the batch sequence."""
    import tempfile

    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    idx = LshSignatureIndex.create(
        spark, tempfile.mkdtemp(prefix="sjs_lshidx_s_"), corpus,
        k=16, bands=4, shingle_n=3, max_bucket=64,
    )
    v1 = idx.probe(batch1).withColumn("batch_no", F.lit(1).cast("int"))
    idx.add_stream_batch(batch1, epoch_id=0)
    # failure-recovery replay of the SAME epoch: must append nothing —
    # the probe below would see doubled signatures otherwise
    replay_rows = idx.add_stream_batch(batch1, epoch_id=0)
    if replay_rows != 0:
        raise AssertionError(
            f"epoch replay appended {replay_rows} rows; expected 0"
        )
    v2 = idx.probe(batch2).withColumn("batch_no", F.lit(2).cast("int"))
    return v1.unionByName(v2).select(
        "doc_id", "batch_no", "n_bands_hit", "n_cand", "kept"
    )


@_register(
    "incremental_simhash_indexed_dedup",
    oracle=r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
    ), toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM all_docs WHERE text IS NOT NULL
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
    ), bandkeys AS (
        SELECT doc_id, 3 - (b // 15) AS band,
               CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END
                        << CAST(b % 15 AS INTEGER)) AS VARCHAR) AS key
        FROM votes GROUP BY 1, 2
    ), bk_c AS (        -- index state at probe 1: the original corpus
        SELECT doc_id, band, key FROM bandkeys
        WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), bk_b1 AS (       -- batch 1: every 5th document
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id % 5 = 0
    ), bk_b2 AS (       -- batch 2: injected near-dups (+20000 ids)
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id >= 20000
    ), hot1 AS (
        SELECT band, key FROM bk_c GROUP BY 1, 2 HAVING COUNT(*) > 256
    ), pb1 AS (
        SELECT b.* FROM bk_b1 b
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc1 AS (
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits1 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb1 b JOIN pc1 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), bk_c2 AS (       -- index state at probe 2: corpus UNION batch 1
        SELECT doc_id, band, key FROM bk_c
        UNION ALL
        SELECT doc_id, band, key FROM bk_b1
    ), hot2 AS (
        SELECT band, key FROM bk_c2 GROUP BY 1, 2 HAVING COUNT(*) > 256
    ), pb2 AS (
        SELECT b.* FROM bk_b2 b
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc2 AS (
        SELECT c.* FROM bk_c2 c
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits2 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb2 b JOIN pc2 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), b1 AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
    ), b2 AS (
        SELECT doc_id + 20000 AS doc_id
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1 AND text IS NOT NULL
    )
    SELECT b.doc_id, 1 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b1 b LEFT JOIN hits1 h ON b.doc_id = h.bid
    UNION ALL
    SELECT b.doc_id, 2 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b2 b LEFT JOIN hits2 h ON b.doc_id = h.bid
    """,
)
def q_incremental_simhash_indexed_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SIMHASH member of the persisted-signature-index family
    (operators/lshindex.py, hasher='simhash-portable' — VERDICT r10 item
    4 asked for MinHash AND SimHash admission): identical index
    mechanics to ``incremental_minhash_indexed_dedup`` — transactional
    (doc_id, band, key) signatures + incrementally-maintained hot-bucket
    view, batch 1 probed then admitted via add(), batch 2 (injected
    truncated near-dups) probed against the UPDATED index — but the band
    keys are 15-bit chunks of a 60-bit md5-token-hash SimHash
    fingerprint, so collision means Hamming proximity (docs within
    Hamming 3 share ≥ 1 of the 4 bands by pigeonhole) rather than
    shingle-set resemblance. Truncating one trailing word flips few bit
    votes, so batch 2 lands within Hamming 3 of its source and is
    caught; batch 1's distinct documents survive. DuckDB replays the
    votes, chunks, both index states, and all verdicts bit-for-bit."""
    import tempfile

    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    idx = LshSignatureIndex.create(
        spark, tempfile.mkdtemp(prefix="sjs_shidx_q_"), corpus,
        k=60, bands=4, max_bucket=256, hasher="simhash-portable",
    )
    # sign batch 1 ONCE, shared by probe + admission append (deterministic
    # per-doc signing — see incremental_indexed_dedup)
    sig_b1 = idx.sign(batch1).localCheckpoint()
    v1 = idx.probe(batch1, _sig_b=sig_b1).withColumn(
        "batch_no", F.lit(1).cast("int")
    )
    idx.add(batch1, _sigs=sig_b1)
    v2 = idx.probe(batch2).withColumn("batch_no", F.lit(2).cast("int"))
    return v1.unionByName(v2).select(
        "doc_id", "batch_no", "n_bands_hit", "n_cand", "kept"
    )


# Oracle for the ONLINE admission path: unlike _LSH_IDX_DEDUP_ORACLE
# (where batch 1 is admitted wholesale), the index state at probe 2 is
# corpus ∪ signatures of batch 1's KEPT docs only — dropped docs leave no
# trace, and batch 2 contains near-dups of BATCH-1 docs specifically so a
# collision with an earlier micro-batch's admission is observable in the
# verdicts. Integer/string exact end to end.
_LSH_ONLINE_ADMIT_ORACLE = r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 30000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents WHERE doc_id % 5 = 0 AND doc_id % 3 = 0
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM all_docs WHERE text IS NOT NULL
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
    ), bk_c AS (        -- index state at probe 1: the original corpus
        SELECT doc_id, band, key FROM bandkeys
        WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), bk_b1 AS (       -- batch 1: every 5th document
        SELECT doc_id, band, key FROM bandkeys
        WHERE doc_id % 5 = 0 AND doc_id < 20000
    ), bk_b2 AS (       -- batch 2: near-dups of corpus AND batch-1 docs
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id >= 20000
    ), hot1 AS (
        SELECT band, key FROM bk_c GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb1 AS (
        SELECT b.* FROM bk_b1 b
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc1 AS (
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits1 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb1 b JOIN pc1 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), kept1 AS (       -- only SURVIVORS of batch 1 are admitted
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
          AND doc_id NOT IN (SELECT bid FROM hits1)
    ), bk_c2 AS (       -- index state at probe 2: corpus ∪ kept batch 1
        SELECT doc_id, band, key FROM bk_c
        UNION ALL
        SELECT b.doc_id, b.band, b.key
        FROM bk_b1 b JOIN kept1 k ON b.doc_id = k.doc_id
    ), hot2 AS (
        SELECT band, key FROM bk_c2 GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb2 AS (
        SELECT b.* FROM bk_b2 b
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc2 AS (
        SELECT c.* FROM bk_c2 c
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits2 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb2 b JOIN pc2 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), b1 AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
    ), b2 AS (
        SELECT doc_id + 20000 AS doc_id FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 30000 AS doc_id FROM documents
        WHERE doc_id % 5 = 0 AND doc_id % 3 = 0 AND text IS NOT NULL
    )
    SELECT b.doc_id, 1 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b1 b LEFT JOIN hits1 h ON b.doc_id = h.bid
    UNION ALL
    SELECT b.doc_id, 2 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b2 b LEFT JOIN hits2 h ON b.doc_id = h.bid
    """


@_register(
    "streaming_minhash_online_admission",
    oracle=_LSH_ONLINE_ADMIT_ORACLE,
)
def q_streaming_minhash_online_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ONLINE near-dup admission path of the persisted LSH signature
    index (operators/lshindex.py admit_stream_batch — VERDICT r11 gap 1),
    driven through a REAL Structured Streaming query: a file stream over
    two staged micro-batch files (maxFilesPerTrigger=1, AvailableNow) →
    writeStream.foreachBatch, whose body probes each batch against the
    current index, admits ONLY the surviving (kept) docs' signatures
    under the epoch key, and appends the verdict frame to the result
    sink. Batch 2 contains truncated near-dups of BATCH-1 documents as
    well as of corpus documents, so the defining online semantics — a
    collision with a doc admitted by an EARLIER micro-batch is a drop,
    but only if that doc actually survived its own admission — is
    hash-verified: the oracle replays the kept-only index state (corpus ∪
    batch-1 survivors) in SQL. After the stream drains, a failure-
    recovery replay of epoch 0 is run explicitly and must append nothing
    (the epoch-keyed exactly-once guard). Scale shape identical to the
    probe/add lifecycle: batch signatures broadcast, O(delta + view)
    admission, zero corpus re-signs or corpus-keyed shuffles."""
    import glob
    import os
    import shutil
    import tempfile

    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = (
        corpus.filter(F.col("doc_id") % 7 == 1)
        .select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
        .unionByName(
            batch1.filter(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
            )
        )
    )

    root = tempfile.mkdtemp(prefix="sjs_lsh_online_")
    in_dir = os.path.join(root, "in")
    out_dir = os.path.join(root, "verdicts")
    os.makedirs(in_dir)

    def _stage(df: DataFrame, name: str, mtime: int) -> None:
        # one file per micro-batch, mtimes pinned so the file source's
        # oldest-first ordering delivers batch 1 at epoch 0
        d = os.path.join(root, "stage_" + name)
        df.coalesce(1).write.parquet(d)
        dst = os.path.join(in_dir, name + ".parquet")
        shutil.copyfile(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (mtime, mtime))

    _stage(batch1, "batch1", 1_600_000_000)
    _stage(batch2, "batch2", 1_600_000_100)

    idx = LshSignatureIndex.create(
        spark, os.path.join(root, "idx"), corpus,
        k=16, bands=4, shingle_n=3, max_bucket=64,
    )

    def _admit(batch_df: DataFrame, epoch_id: int) -> None:
        # The staged micro-batch is ONE file (ordering pin), so the frame
        # arrives single-partition — spread it before signing or the
        # whole batch's shingle/minhash work runs on one task (measured:
        # the 100x sweep row was 7x worse without this; a production
        # stream's batches arrive many-partitioned on their own).
        batch_df = batch_df.repartition(
            batch_df.sparkSession.sparkContext.defaultParallelism
        )
        v = idx.admit_stream_batch(batch_df, epoch_id=epoch_id)
        v.withColumn("batch_no", F.lit(epoch_id + 1).cast("int")).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(_admit)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        # a hung drain must fail LOUDLY here: proceeding would read a
        # partially-written out_dir and leave a live stream contaminating
        # the bench's next timed run
        q.stop()
        raise TimeoutError("online-admission stream failed to drain in 600s")

    # failure-recovery replay of epoch 0: the epoch-keyed append must
    # no-op or the index would double batch 1's surviving signatures
    before = idx.signatures().count()
    idx.admit_stream_batch(
        spark.read.parquet(os.path.join(in_dir, "batch1.parquet")).repartition(
            spark.sparkContext.defaultParallelism
        ),
        epoch_id=0,
    )
    after = idx.signatures().count()
    if after != before:
        raise AssertionError(
            f"epoch-0 replay grew the index {before} -> {after}; expected no-op"
        )

    return spark.read.parquet(out_dir).select(
        "doc_id", "batch_no", "n_bands_hit", "n_cand", "kept"
    )


@_register(
    "warc_ingest_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 404
                ELSE 301 END AS INT) AS http_status,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS body_sha16
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_warc_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest, end to end and hash-oracled (sources/warc.py — the
    Common-Crawl generalization of the reference's live-HTTP ingest,
    ``airflow/dags/scrape_url.py``): the documents table is written out
    as REAL ``.warc.gz`` archives of per-record gzip members,
    each record a spec-conformant WARC/1.0 response wrapping a full
    HTTP/1.1 response whose body is the document text (one archive per
    task, defaultParallelism of them) — then read back
    through ``read_warc`` (binaryFile scan → one Arrow stage walking
    member gunzip, WARC header parse, Content-Length framing, HTTP
    status/body split). DuckDB recomputes status/length/sha straight
    from the documents table, so a hash match proves the writer, the
    gzip member stream, and the record parser agree byte-for-byte.
    Scale shape: archive write is foreachPartition (one file per task,
    how WARC corpora shard); the read is map-only, one task per file,
    body sha computed JVM-side."""
    import tempfile

    from scraping_jobsdb_spark.sources.warc import read_warc

    root = tempfile.mkdtemp(prefix="sjs_warc_q_")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        # one archive per task: write AND read parallelism = this count,
        # so pin it to the machine, not a literal (the r13 sweep's
        # partition-collapse lesson — 8 archives capped the member-walk
        # read at 8 of 32 cores at 100x data)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def write_part(rows) -> None:
        import os

        from pyspark import TaskContext

        from scraping_jobsdb_spark.sources.warc import (
            warc_gz_file,
            warc_response_record,
        )

        recs = []
        for r in rows:
            status = {0: 200, 1: 404, 2: 301}[r.doc_id % 3]
            recs.append(
                warc_response_record(
                    f"http://corpus.example/doc/{r.doc_id}",
                    r.text.encode("utf-8"),
                    status=status,
                )
            )
        if recs:
            pid = TaskContext.get().partitionId()
            with open(
                os.path.join(root, f"part-{pid:05d}.warc.gz"), "wb"
            ) as f:
                f.write(warc_gz_file(recs))

    docs.foreachPartition(write_part)
    parsed = read_warc(spark, root + "/*.warc.gz", gzipped=True)
    return parsed.select(
        F.regexp_extract("url", r"doc/(\d+)$", 1).cast("bigint").alias(
            "doc_id"
        ),
        "http_status",
        "n_bytes",
        F.substring(F.sha2("body", 256), 1, 16).alias("body_sha16"),
    )


@_register(
    "jsonl_ingest_roundtrip",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS text_sha16
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzipped-JSONL interchange roundtrip — the other canonical
    training-corpus format next to WARC (every public pretraining set
    ships as one of the two): documents are written as compressed JSON
    Lines with a NESTED metadata struct (the layout real corpus dumps
    use), then read back SCHEMA-FIRST (explicit nested schema, no
    expensive inference scan — the only sane posture at 100 TB file
    counts) in PERMISSIVE mode with a _corrupt_record column, asserted
    empty before the result returns. DuckDB recomputes the flattened
    projection straight from the source table, so the JSON encode →
    gzip → decode → struct-flatten chain is value-hash verified,
    including UTF-8 fidelity (sha over the text). Scale shape: the
    write is map-only (one .json.gz per partition), the read is a
    pruned-schema scan + map-only flatten; gzip bounds task parallelism
    to file count, exactly like the WARC layout."""
    import tempfile

    out = tempfile.mkdtemp(prefix="sjs_jsonl_q_") + "/dump"
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.struct("lang", "source", "n_chars").alias("meta"),
            "text",
        )
        # one gz file per task: the read-back's parallelism is this file
        # count (gzip is unsplittable), so pin it to the machine, not a
        # literal (the r13 partition-collapse lesson)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    docs.write.json(out, compression="gzip")
    schema = (
        "doc_id bigint, meta struct<lang:string,source:string,"
        "n_chars:bigint>, text string, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
        # Spark disallows queries referencing ONLY _corrupt_record on a
        # raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize
        # the parsed batch once, exactly the workaround its error text
        # prescribes; a 100 TB pipeline would carry the bad-row count as
        # an observe() metric on the main pass instead
        .localCheckpoint()
    )
    n_bad = back.filter(F.col("_corrupt_record").isNotNull()).count()
    if n_bad:
        raise AssertionError(f"{n_bad} corrupt JSONL records in roundtrip")
    return back.select(
        "doc_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
        F.substring(F.sha2(F.encode("text", "utf-8"), 256), 1, 16).alias(
            "text_sha16"
        ),
    )


# ---------------------------------------------------------------------------
# STEADY-STATE posture of the persisted dedup indexes (VERDICT r12 item 2).
#
# The lifecycle queries above (incremental_indexed_dedup,
# incremental_minhash_indexed_dedup, streaming_*) rebuild their index from
# scratch inside the query, so the driver artifact charges the ONE-TIME
# corpus fingerprint/sign pass to the steady-state family every round (r12
# stage profile at 100x: create 36.3 s vs probe 2.4/1.7 s + append 7.8 s).
# The queries below evidence the O(batch) admission claim itself: the index
# is SETTLED once per process (create + batch-1 admission, cached per
# sf_dir — the "outside the timed region" build), and the registered query
# replays only what a production ingest pays per batch: the epoch-keyed
# admission check (asserted a no-op — the failure-recovery path), the
# batch-sized probes, and the index-freshness guard. min-of-N timing in
# bench.py / bench_scaling.py therefore measures the steady state, never
# the create. Correctness: the probes read the SETTLED index (corpus +
# batch 1), so the replayed batch-1 probe self-excludes its own admitted
# rows (admit_stream_batch's recovery guard) and both probes share the
# settled stop/hot list — exactly what the oracles state.
# ---------------------------------------------------------------------------

_STEADY_CACHE: dict[tuple[str, str], str] = {}


def _steady_dir(kind: str, sf_dir: str) -> str | None:
    """Settled-index directory for (kind, sf_dir), or None if not yet
    settled in this process (caller settles, then records via
    _steady_done)."""
    return _STEADY_CACHE.get((kind, sf_dir))


def _steady_done(kind: str, sf_dir: str, path: str) -> None:
    _STEADY_CACHE[(kind, sf_dir)] = path


def _steady_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


_FPIDX_STEADY_ORACLE = r"""
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
    ), fps_c AS (       -- the original corpus
        SELECT doc_id, h FROM fps WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), fps_b1 AS (      -- batch 1 (admitted at settle time)
        SELECT doc_id, h FROM fps WHERE doc_id % 5 = 0
    ), fps_b2 AS (      -- batch 2: injected near-dups (+20000 ids)
        SELECT doc_id, h FROM fps WHERE doc_id >= 20000
    ), fps_set AS (     -- the SETTLED index: corpus UNION batch 1
        SELECT doc_id, h FROM fps_c UNION ALL SELECT doc_id, h FROM fps_b1
    ), stop AS (        -- ONE settled stop-gram list, shared by both probes
        SELECT h FROM fps_set GROUP BY h HAVING COUNT(*) > 50
    ), pc1 AS (         -- batch-1 replay probe self-excludes its own rows
        SELECT doc_id, h FROM fps_c WHERE h NOT IN (SELECT h FROM stop)
    ), pb1 AS (
        SELECT doc_id, h FROM fps_b1 WHERE h NOT IN (SELECT h FROM stop)
    ), pc2 AS (
        SELECT doc_id, h FROM fps_set WHERE h NOT IN (SELECT h FROM stop)
    ), pb2 AS (
        SELECT doc_id, h FROM fps_b2 WHERE h NOT IN (SELECT h FROM stop)
    ), sz1 AS (
        SELECT doc_id, COUNT(*) AS n_fp FROM pb1 GROUP BY doc_id
    ), sh1 AS (
        SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS shared_fp
        FROM pb1 b JOIN pc1 c ON b.h = c.h GROUP BY 1, 2
    ), dup1 AS (
        SELECT s.bid, COUNT(*) AS n_dup_of
        FROM sh1 s JOIN sz1 z ON s.bid = z.doc_id
        WHERE s.shared_fp * 1000 >= 800 * z.n_fp GROUP BY 1
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
    """


@_register(
    "fpindex_steady_admission",
    oracle=_FPIDX_STEADY_ORACLE,
)
def q_fpindex_steady_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEADY-STATE admission against a PRE-BUILT FingerprintIndex
    (operators/fpindex.py — VERDICT r12 item 2): unlike
    ``incremental_indexed_dedup``, which re-fingerprints the corpus into a
    fresh index every run (and so charges the one-time create to the
    steady-state family — 64.9 s at 100x, of which 36.3 s was create by
    the r12 stage profile), this query settles the index ONCE per process
    (create corpus fps + admit batch 1 via the epoch-keyed stream append,
    cached per sf_dir) and then runs only what a production ingest pays
    per batch: the epoch-replay admission check (asserted to append
    NOTHING — the failure-recovery path), the batch-1 replay probe
    (self-excluding its own admitted fingerprints, exactly
    ``admit_stream_batch``'s recovery guard), and the batch-2
    pre-admission probe. Both probes broadcast the batch fingerprint set
    and stream map-side over the index scan — zero corpus-sized shuffles,
    cost O(batch), independent of corpus size. The oracle replays the
    SETTLED index state declaratively: one shared stop-gram list over
    corpus+batch1, corpus-only candidates for the replayed batch-1 probe,
    full settled candidates for batch 2."""
    from scraping_jobsdb_spark.operators.fpindex import FingerprintIndex

    docs = _steady_docs(spark, sf_dir)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 1)
    ).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    path = _steady_dir("fpidx", sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="sjs_fpidx_steady_")
        idx = FingerprintIndex.create(
            spark, path, docs.filter(F.col("doc_id") % 5 != 0),
            k=8, w=4, max_df=50,
        )
        idx.add_stream_batch(batch1, epoch_id=0, app_id="steady-admit")
        _steady_done("fpidx", sf_dir, path)
    idx = FingerprintIndex(spark, path)
    # steady-state admission of batch 1 = a recognized epoch replay: the
    # index already holds this (app_id, epoch) commit, so the append MUST
    # no-op (exactly-once) — and asserting it keeps the cached settle
    # honest (a broken cache would double the fingerprints and the hash
    # gate would catch the drifted verdicts anyway)
    replayed = idx.add_stream_batch(batch1, epoch_id=0, app_id="steady-admit")
    if replayed != 0:
        raise AssertionError(
            f"steady-state epoch replay appended {replayed} rows; expected 0"
        )
    v1 = idx.probe(batch1, threshold_milli=800, exclude_self_ids=True)
    v2 = idx.probe(batch2, threshold_milli=800)
    return (
        v1.withColumn("batch_no", F.lit(1).cast("int"))
        .unionByName(v2.withColumn("batch_no", F.lit(2).cast("int")))
        .select("doc_id", "batch_no", "n_fp", "n_dup_of", "kept")
    )


_LSH_STEADY_ORACLE = r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 5 <> 0 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id, text FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 20000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1 AND text IS NOT NULL
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM all_docs WHERE text IS NOT NULL
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
    ), bk_c AS (        -- the original corpus
        SELECT doc_id, band, key FROM bandkeys
        WHERE doc_id % 5 <> 0 AND doc_id < 20000
    ), bk_b1 AS (       -- batch 1 (admitted at settle time)
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id % 5 = 0
    ), bk_b2 AS (       -- batch 2: injected near-dups (+20000 ids)
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id >= 20000
    ), bk_set AS (      -- the SETTLED index: corpus UNION batch 1
        SELECT doc_id, band, key FROM bk_c
        UNION ALL
        SELECT doc_id, band, key FROM bk_b1
    ), hot AS (         -- ONE settled hot-bucket list, shared by both probes
        SELECT band, key FROM bk_set GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb1 AS (
        SELECT b.* FROM bk_b1 b
        WHERE NOT EXISTS (SELECT 1 FROM hot h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc1 AS (         -- batch-1 replay probe self-excludes its own rows
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits1 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb1 b JOIN pc1 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), pb2 AS (
        SELECT b.* FROM bk_b2 b
        WHERE NOT EXISTS (SELECT 1 FROM hot h
                          WHERE h.band = b.band AND h.key = b.key)
    ), pc2 AS (
        SELECT c.* FROM bk_set c
        WHERE NOT EXISTS (SELECT 1 FROM hot h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits2 AS (
        SELECT b.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT b.band) AS n_bands_hit
        FROM pb2 b JOIN pc2 c ON b.band = c.band AND b.key = c.key
        GROUP BY 1
    ), b1 AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
    ), b2 AS (
        SELECT doc_id + 20000 AS doc_id
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1 AND text IS NOT NULL
    )
    SELECT b.doc_id, 1 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b1 b LEFT JOIN hits1 h ON b.doc_id = h.bid
    UNION ALL
    SELECT b.doc_id, 2 AS batch_no,
           COALESCE(h.n_bands_hit, 0) AS n_bands_hit,
           COALESCE(h.n_cand, 0) AS n_cand,
           COALESCE(h.n_cand, 0) = 0 AS kept
    FROM b2 b LEFT JOIN hits2 h ON b.doc_id = h.bid
    """


@_register(
    "lshindex_steady_admission",
    oracle=_LSH_STEADY_ORACLE,
)
def q_lshindex_steady_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEADY-STATE admission against a PRE-BUILT LshSignatureIndex
    (operators/lshindex.py — VERDICT r12 item 2, the MinHash-LSH member
    of the steady-state family beside ``fpindex_steady_admission``): the
    index is settled ONCE per process (sign corpus + admit batch 1 via the
    epoch-keyed stream append, cached per sf_dir); the registered query
    then pays only the per-batch steady state — the epoch-replay admission
    check (asserted to append NOTHING), the batch-1 replay probe
    (self-excluding its own admitted signatures), and the batch-2
    pre-admission probe, each a broadcast batch-signature join streaming
    map-side over the index scan. O(batch) cost, zero corpus re-sign; the
    oracle restates the SETTLED index (one hot-bucket list over
    corpus+batch1, corpus-only candidates for the replayed probe,
    full settled candidates for batch 2) with md5-portable permutations,
    bit-for-bit."""
    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex

    docs = _steady_docs(spark, sf_dir).filter(F.col("text").isNotNull())
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 1)
    ).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    path = _steady_dir("lshidx", sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="sjs_lshidx_steady_")
        idx = LshSignatureIndex.create(
            spark, path, docs.filter(F.col("doc_id") % 5 != 0),
            k=16, bands=4, shingle_n=3, max_bucket=64,
        )
        idx.add_stream_batch(batch1, epoch_id=0, app_id="steady-admit")
        _steady_done("lshidx", sf_dir, path)
    idx = LshSignatureIndex(spark, path)
    replayed = idx.add_stream_batch(batch1, epoch_id=0, app_id="steady-admit")
    if replayed != 0:
        raise AssertionError(
            f"steady-state epoch replay appended {replayed} rows; expected 0"
        )
    v1 = idx.probe(batch1, exclude_self_ids=True)
    v2 = idx.probe(batch2)
    return (
        v1.withColumn("batch_no", F.lit(1).cast("int"))
        .unionByName(v2.withColumn("batch_no", F.lit(2).cast("int")))
        .select("doc_id", "batch_no", "n_bands_hit", "n_cand", "kept")
    )


@_register(
    "online_admission_intra_batch",
    oracle=r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 5 <> 0 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id, text FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 40000 AS doc_id,
               regexp_replace(text, '\s+\S+$', '') AS text
        FROM documents
        WHERE doc_id % 5 = 0 AND doc_id % 3 = 0 AND text IS NOT NULL
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM all_docs
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
    ), bk_c AS (        -- the corpus (settled index before admission)
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id % 5 <> 0
    ), bk_b AS (        -- the batch: originals AND their +40000 near-dups
        SELECT doc_id, band, key FROM bandkeys WHERE doc_id % 5 = 0
    ), b AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 40000 AS doc_id FROM documents
        WHERE doc_id % 5 = 0 AND doc_id % 3 = 0 AND text IS NOT NULL
    ), ibk AS (         -- intra-batch candidate buckets (2..64 docs)
        SELECT band, key FROM bk_b GROUP BY 1, 2
        HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64
    ), dropped AS (     -- greedy keep-lowest-id intra-batch admission
        SELECT DISTINCT hi.doc_id
        FROM bk_b hi
        JOIN ibk i ON i.band = hi.band AND i.key = hi.key
        JOIN bk_b lo ON lo.band = hi.band AND lo.key = hi.key
                    AND lo.doc_id < hi.doc_id
    ), surv AS (
        SELECT doc_id FROM b
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    ), hot1 AS (        -- hot buckets at settle-time admission: corpus only
        SELECT band, key FROM bk_c GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pbs AS (
        SELECT s.* FROM bk_b s
        JOIN surv USING (doc_id)
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = s.band AND h.key = s.key)
    ), pcs AS (
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot1 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits0 AS (       -- settle-time corpus collisions of the survivors
        SELECT DISTINCT p.doc_id FROM pbs p
        JOIN pcs c ON p.band = c.band AND p.key = c.key
    ), admitted0 AS (   -- what the settle-time admission actually kept
        SELECT doc_id FROM surv
        WHERE doc_id NOT IN (SELECT doc_id FROM hits0)
    ), bk_set AS (      -- the SETTLED index: corpus + admitted signatures
        SELECT doc_id, band, key FROM bk_c
        UNION ALL
        SELECT s.doc_id, s.band, s.key FROM bk_b s
        JOIN admitted0 USING (doc_id)
    ), hot2 AS (        -- hot buckets the replay probe sees
        SELECT band, key FROM bk_set GROUP BY 1, 2 HAVING COUNT(*) > 64
    ), pb2 AS (
        SELECT s.* FROM bk_b s
        JOIN surv USING (doc_id)
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = s.band AND h.key = s.key)
    ), pc2 AS (         -- replay self-excludes the batch's own admitted sigs
        SELECT c.* FROM bk_c c
        WHERE NOT EXISTS (SELECT 1 FROM hot2 h
                          WHERE h.band = c.band AND h.key = c.key)
    ), hits2 AS (
        SELECT p.doc_id AS bid,
               COUNT(DISTINCT c.doc_id) AS n_cand,
               COUNT(DISTINCT p.band) AS n_bands_hit
        FROM pb2 p JOIN pc2 c ON p.band = c.band AND p.key = c.key
        GROUP BY 1
    ), flags AS (
        SELECT b.doc_id,
               NOT EXISTS (SELECT 1 FROM dropped d
                           WHERE d.doc_id = b.doc_id) AS intra_kept
        FROM b
    )
    SELECT f.doc_id,
           f.intra_kept,
           CAST(CASE WHEN f.intra_kept
                     THEN COALESCE(h.n_bands_hit, 0) ELSE 0 END
                AS BIGINT) AS n_bands_hit,
           CAST(CASE WHEN f.intra_kept
                     THEN COALESCE(h.n_cand, 0) ELSE 0 END
                AS BIGINT) AS n_cand,
           f.intra_kept AND COALESCE(h.n_cand, 0) = 0 AS admitted
    FROM flags f LEFT JOIN hits2 h ON f.doc_id = h.bid
    """,
)
def q_online_admission_intra_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULL online-admission story a real deduplicating ingest runs
    (VERDICT r12 item 7): ``admit_stream_batch`` is batch-vs-corpus by
    contract — near-dups WITHIN a micro-batch survive together — so a
    production stream composes it with an INTRA-batch keep-list first.
    This query gate-evidences exactly that composition end to end: the
    batch (every 5th document plus injected +40000 truncated near-dups of
    every 15th) first runs ``minhash_candidate_pairs_portable`` against
    itself and drops every doc that LSH-collides with a smaller-id batch
    member (the greedy keep-lowest-id admission rule — deterministic and
    engine-portable); the survivors then go through the index's ONLINE
    admission (``LshSignatureIndex.admit_stream_batch``: probe vs the
    settled corpus index, kept-only epoch-keyed append). The index is
    settled once per process (create corpus + admit the survivors, cached
    per sf_dir — the steady-state build outside the timed region); the
    registered query re-derives the intra-batch keep-list (pure,
    batch-sized) and replays the epoch-0 admission — the failure-recovery
    path: the probe self-excludes the batch's own admitted signatures and
    the append no-ops, so the output is run-stable. The oracle replays
    BOTH stages declaratively: the intra-batch bucket collisions and
    keep-list, the settle-time admission's kept set (corpus-only hot
    list), and the replay verdicts against the settled state."""
    from scraping_jobsdb_spark.operators.lshindex import LshSignatureIndex
    from scraping_jobsdb_spark.operators.similarity import (
        minhash_band_keys_portable,
        minhash_pairs_from_band_keys,
    )

    docs = _steady_docs(spark, sf_dir).filter(F.col("text").isNotNull())
    originals = docs.filter(F.col("doc_id") % 5 == 0)
    batch = originals.unionByName(
        originals.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 40000).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
    )
    # ONE signing pass for the whole composition (r14 — guide §1.2): the
    # intra-batch pairing and the index admission use IDENTICAL signing
    # parameters (k=16, bands=4, shingle_n=3, md5-portable — pinned in the
    # index manifest), so the batch is signed once, materialized, and
    # shared: the pair stage consumes the band keys directly
    # (minhash_pairs_from_band_keys) and the admission receives the
    # survivor subset via ``_sig_b`` (signing is deterministic per doc, so
    # the semi-joined subset is row-identical to re-signing the
    # survivors). The r13 form signed the batch twice per run — once
    # inside the pair stage and once inside admit_stream_batch.
    bk = minhash_band_keys_portable(
        batch, "doc_id", "text", k=16, bands=4, shingle_n=3
    ).localCheckpoint()
    pairs = minhash_pairs_from_band_keys(bk, id_col="doc_id", max_bucket=64)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = batch.join(dropped, "doc_id", "left_anti")
    sig_surv = bk.join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    )
    path = _steady_dir("intralsh", sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="sjs_intralsh_steady_")
        idx = LshSignatureIndex.create(
            spark, path, docs.filter(F.col("doc_id") % 5 != 0),
            k=16, bands=4, shingle_n=3, max_bucket=64,
        )
        idx.admit_stream_batch(
            survivors, epoch_id=0, app_id="intra-admit", _sig_b=sig_surv
        )
        _steady_done("intralsh", sf_dir, path)
    idx = LshSignatureIndex(spark, path)
    # epoch-0 replay: probe vs the settled index (self-excluding the
    # batch's own admitted signatures), kept-only append no-ops
    verdict = idx.admit_stream_batch(
        survivors, epoch_id=0, app_id="intra-admit", _sig_b=sig_surv
    )
    flags = batch.join(
        dropped.withColumn("__dropped", F.lit(True)), "doc_id", "left"
    ).select("doc_id", F.col("__dropped").isNull().alias("intra_kept"))
    return flags.join(verdict, "doc_id", "left").select(
        "doc_id",
        "intra_kept",
        F.when(F.col("intra_kept"), F.coalesce("n_bands_hit", F.lit(0)))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_bands_hit"),
        F.when(F.col("intra_kept"), F.coalesce("n_cand", F.lit(0)))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_cand"),
        (F.col("intra_kept") & F.coalesce("kept", F.lit(False))).alias(
            "admitted"
        ),
    )
