"""Round-9 curation/evaluation wave: retrieval quality metrics, dictionary
phrase tagging, blocklist filtering, exact-integer EWMA smoothing, and
curriculum ordering — the evaluation-and-ordering layer a training-data
pipeline runs AFTER the cleaning/dedup/mixing families already registered.

Registry chunk (registration order is preserved by the import sequence in
plans/queries.py; the gate window is re-applied there). Unused imports are
part of the shared chunk header.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scraping_jobsdb_spark.plans._shared import _dsum, _dsum_sql, _register
from scraping_jobsdb_spark.sources.tables import fan_out, load_table

# The three single-term eval queries (terms present in every SF's corpus —
# the same vocabulary bm25_doc_ranking queries).
_EVAL_TERMS = ["spark", "merge", "vector"]

# C4-style blocklist: one token that occurs in ~5% of documents plus two
# that never occur (real blocklists are mostly-absent by design).
_BLOCKLIST = ["dup", "corrupt", "deadlock"]


@_register(
    "retrieval_eval_metrics",
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
    ), long AS (
        SELECT b.doc_id, q.query_id, q.term,
               CASE q.query_id WHEN 0 THEN b.tf0
                               WHEN 1 THEN b.tf1
                               ELSE b.tf2 END AS tf,
               CASE q.query_id WHEN 0 THEN s.df0
                               WHEN 1 THEN s.df1
                               ELSE s.df2 END AS df,
               s.n_docs, s.sum_dl, b.dl
        FROM base b
        CROSS JOIN stats s
        CROSS JOIN (VALUES (0, 'spark'), (1, 'merge'), (2, 'vector'))
                   AS q(query_id, term)
    ), scored AS (
        SELECT query_id, term, doc_id,
               least(tf, 2) AS rel,
               ROUND(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))),
                     9) AS bm25
        FROM long
    ), run AS (
        SELECT query_id, term, doc_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored
    ), dcg AS (
        SELECT query_id, term,
               SUM(((CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1)
                   / log2(rank + 1.0)) AS dcg10,
               MAX(CASE WHEN rel > 0 THEN 1.0 / rank END) AS rr_best,
               SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits10
        FROM run WHERE rank <= 10 GROUP BY 1, 2
    ), ideal AS (
        SELECT query_id,
               SUM(((CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1)
                   / log2(irank + 1.0)) AS idcg10
        FROM (
            SELECT query_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, doc_id) AS irank
            FROM scored WHERE rel > 0
        ) WHERE irank <= 10 GROUP BY 1
    ), nrel AS (
        SELECT query_id, COUNT(*) AS n_rel
        FROM scored WHERE rel > 0 GROUP BY 1
    )
    SELECT CAST(d.query_id AS BIGINT) AS query_id, d.term,
           n.n_rel,
           ROUND(d.dcg10 / i.idcg10, 9) AS ndcg_at_10,
           ROUND(COALESCE(d.rr_best, 0.0), 9) AS mrr,
           ROUND(CAST(d.hits10 AS DOUBLE) / n.n_rel, 9) AS recall_at_10
    FROM dcg d JOIN ideal i USING (query_id) JOIN nrel n USING (query_id)
    """,
)
def q_retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the engine's own retrieval
    (operators/textops.py bm25_rank): nDCG@10, MRR and recall@10 for three
    single-term queries against DETERMINISTIC graded qrels — rel(q, doc) =
    min(tf(q in doc), 2), i.e. relevance is a pure function of the corpus,
    so the whole eval (run ranking, ideal ranking, metric arithmetic) is
    value-hash replayable; gains 2^rel−1 are exact small integers, the
    only libm surface (log2 discounts, the final divisions) is rounded to
    9 dp on both sides. Shape: ONE corpus pass computes every per-(doc,
    term) tf + the 1-row stats broadcast (the bm25_doc_ranking scan),
    rankings are per-query windows over ≤corpus rows, metrics are
    query-count-sized aggregates — eval cost ≡ one retrieval pass, no
    per-query rescans. The eval harness every RAG/retrieval deployment
    needs next to hybrid_rrf_retrieval's fusion."""
    from scraping_jobsdb_spark.operators.textops import tokens

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    toks = tokens("text")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    base = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(_EVAL_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(_EVAL_TERMS))
        ],
    )
    # long form: one row per (doc, query); tf/df picked per query id.
    per_q = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("query_id"),
                F.lit(t).alias("term"),
                F.col(f"tf{i}").cast("bigint").alias("tf"),
                F.col(f"df{i}").cast("bigint").alias("df"),
            )
            for i, t in enumerate(_EVAL_TERMS)
        ]
    )
    long = (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", "n_docs", "sum_dl", F.explode(per_q).alias("q"))
        .select("doc_id", "dl", "n_docs", "sum_dl", "q.*")
    )
    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_docs
    tf = F.col("tf").cast("double")
    df = F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n_docs - df + 0.5) / (df + 0.5))
    norm = F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / avgdl)
    scored = long.select(
        "query_id",
        "term",
        "doc_id",
        F.least(F.col("tf"), F.lit(2)).cast("bigint").alias("rel"),
        F.round(idf * tf * F.lit(2.2) / (tf + norm), 9).alias("bm25"),
    )
    # SQL-form shiftleft: the DataFrame-API builtin wants a literal shift
    gain = F.expr(
        "cast(shiftleft(cast(1 as bigint), cast(rel as int)) - 1 as double)"
    )
    w_run = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    run = scored.withColumn("rank", F.row_number().over(w_run)).filter(
        F.col("rank") <= 10
    )
    dcg = run.groupBy("query_id", "term").agg(
        F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg10"),
        F.max(
            F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rank"))
        ).alias("rr_best"),
        F.sum((F.col("rel") > 0).cast("bigint")).alias("hits10"),
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    ideal = (
        scored.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= 10)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("irank") + F.lit(1.0))).alias("idcg10"))
    )
    nrel = (
        scored.filter(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    return (
        dcg.join(ideal, "query_id")
        .join(nrel, "query_id")
        .select(
            "query_id",
            "term",
            "n_rel",
            F.round(F.col("dcg10") / F.col("idcg10"), 9).alias("ndcg_at_10"),
            F.round(F.coalesce(F.col("rr_best"), F.lit(0.0)), 9).alias("mrr"),
            F.round(
                F.col("hits10").cast("double") / F.col("n_rel"), 9
            ).alias("recall_at_10"),
        )
    )


@_register(
    "dictionary_phrase_tagging",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE text IS NOT NULL
    ), bigrams AS (
        SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS phrase
        FROM toks, unnest(range(1, len(ws))) AS t(i)
    ), dict AS (
        SELECT phrase FROM (
            SELECT phrase, COUNT(*) AS n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, phrase) AS rn
            FROM bigrams GROUP BY phrase
        ) WHERE rn <= 5
    )
    SELECT DISTINCT b.doc_id, b.phrase
    FROM bigrams b JOIN dict d USING (phrase)
    """,
)
def q_dictionary_phrase_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary phrase tagging — the SCALABLE form of multi-phrase
    matching (blocklists, entity gazetteers, topic lexicons): instead of
    one regex pass per dictionary entry (O(corpus × |dict|)), documents
    explode into word bigrams and an equi-join against the phrase
    dictionary tags every occurrence in one shuffle-free broadcast join —
    O(corpus + |dict|), the Aho-Corasick economics expressed relationally.
    The dictionary here is self-derived (top-5 corpus bigrams under a
    (count desc, phrase) total order — the doc_top_ngrams recipe), which
    costs a SECOND tokenize pass of the corpus (learn the dictionary,
    then tag — two consumers of the exploded frame; checkpointing the
    corpus-sized explode would be worse); a real deployment broadcasts
    an EXTERNAL gazetteer through the identical tagging plan and pays
    exactly one pass. Output: distinct (doc_id, phrase) tags."""
    from scraping_jobsdb_spark.operators.textops import tokens

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    ws = tokens("text")
    bigram_arr = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bigrams = docs.select(
        "doc_id", F.explode(bigram_arr).alias("phrase")
    )
    # top-5 under the (count desc, phrase) total order as a
    # TakeOrderedAndProject (per-partition partial top-k), not a global
    # row_number window over the whole vocabulary
    dict_df = (
        bigrams.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("phrase"))
        .limit(5)
        .select("phrase")
    )
    return bigrams.join(F.broadcast(dict_df), "phrase").select(
        "doc_id", "phrase"
    ).distinct()


@_register(
    "badwords_filter_report",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE text IS NOT NULL
    ), flagged AS (
        SELECT lang,
               CASE WHEN len(list_intersect(ws,
                        ['dup', 'corrupt', 'deadlock'])) > 0
                    THEN 1 ELSE 0 END AS hit
        FROM toks
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(hit) AS BIGINT) AS n_flagged,
           CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS flag_rate
    FROM flagged GROUP BY lang
    """,
)
def q_badwords_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filtering report: documents containing any
    blocklist TOKEN are flagged, with kept/dropped counts and the drop
    rate per language — the per-shard audit every blocklist deployment
    ships next to the filter itself (C4 dropped ~5% of Common Crawl this
    way; biased per-language drop rates are the known failure mode this
    report exists to surface). Matching is token-set intersection against
    a literal array (map-only, no regex scan per entry — the per-entry
    form is O(corpus × |list|)); the rate is one exact division of an
    integer count. Blocklist entries that never occur cost nothing —
    membership rides the same array pass."""
    from scraping_jobsdb_spark.operators.textops import tokens

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("lang", "text")
    )
    hit = F.arrays_overlap(
        tokens("text"), F.array(*[F.lit(t) for t in _BLOCKLIST])
    ).cast("bigint")
    return (
        docs.select("lang", hit.alias("hit"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").alias("n_flagged"),
            (F.sum("hit").cast("double") / F.count(F.lit(1))).alias(
                "flag_rate"
            ),
        )
    )


@_register(
    "events_ewma_smoothing",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) * 10000 AS BIGINT)
                   AS xm
        FROM events GROUP BY 1, 2
    ), rn AS (
        SELECT user_id, day, xm,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS n
        FROM daily
    ), terms AS (
        SELECT a.user_id, a.day,
               SUM(CAST(b.xm AS DECIMAL(38,0))
                   * CAST((CAST(1 AS BIGINT)
                           << CAST(49 - (a.n - b.n) AS INT))
                          AS DECIMAL(38,0))) AS num,
               COUNT(*) AS m
        FROM rn a JOIN rn b
          ON b.user_id = a.user_id AND b.n BETWEEN a.n - 49 AND a.n
        GROUP BY 1, 2
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(m AS BIGINT) AS n_window,
           CAST(num AS DOUBLE)
               / CAST(((CAST(1 AS BIGINT) << 50)
                       - (CAST(1 AS BIGINT) << CAST(50 - m AS INT)))
                      AS DOUBLE)
               / 10000.0 AS ewma
    FROM terms
    """,
)
def q_events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily value
    (α = 1/2, adjusted/finite form: E_n = Σ 2^-j x_{n-j} / Σ 2^-j over
    the user's last ≤50 OBSERVED days — j is the observation lag, the
    pandas ``ewm(adjust=True)`` semantics over the series; a
    calendar-lag variant would swap the rows frame for a rangeBetween
    frame on epoch day and weight by day gaps) — the smoothing/trend
    primitive for metric monitoring,
    computed EXACTLY: daily sums are DECIMAL, milli-unit integers carry
    half-life weights as powers of two (every product and the DECIMAL(38)
    numerator sum are exact integers, order-independent), and the only
    float operations are two final correctly-rounded divisions — the
    result is bit-identical in any engine, no epsilon anywhere. The
    50-day truncation is the scale contract: 2^-50 is below double
    resolution, so the window frame bounds state without changing the
    value. Shape: one (user, day) aggregate, then ONE window (collect over
    a 50-row frame + an indexed-transform fold) on the same user
    partitioning — no self-join; the oracle replays via an explicit
    bounded range join."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    daily = (
        ev.groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(30,4)")) * 10000)
            .cast("bigint")
            .alias("xm")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-49, 0)
    )
    lst = F.collect_list("xm").over(w)
    out = daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        lst.alias("__lst"),
    ).select(
        "user_id",
        "day",
        F.size("__lst").cast("bigint").alias("n_window"),
        (
            F.expr(
                "cast(aggregate(transform(__lst, (x, i) -> "
                "cast(x as decimal(38,0)) * cast(shiftleft(cast(1 as bigint),"
                " 50 - size(__lst) + i) as decimal(38,0))), "
                "cast(0 as decimal(38,0)), (acc, v) -> acc + v) as double)"
            )
            / F.expr(
                "cast(shiftleft(cast(1 as bigint), 50) - "
                "shiftleft(cast(1 as bigint), 50 - size(__lst)) as double)"
            )
            / F.lit(10000.0)
        ).alias("ewma"),
    )
    return out


@_register(
    "curriculum_pack_order",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t, text
        FROM documents WHERE text IS NOT NULL
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
    ), cuts AS (
        SELECT quantile_cont(quality,
                             [CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3]) AS q
        FROM scored
    ), bucketed AS (
        SELECT doc_id, quality,
               CASE WHEN quality >= q[2] THEN 0
                    WHEN quality >= q[1] THEN 1
                    ELSE 2 END AS bucket
        FROM scored CROSS JOIN cuts
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY bucket, md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS position,
           doc_id, CAST(bucket AS INT) AS bucket, quality
    FROM bucketed
    """,
)
def q_curriculum_pack_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering of training documents: quality tertiles
    (highest-quality bucket first — the easy→hard curriculum axis used in
    data-ordering studies), pseudo-randomly shuffled WITHIN each bucket by
    content hash so batch composition isn't correlated with any corpus
    attribute, and assigned a global training position. Cuts are the ONE
    1-row exact-percentile aggregate broadcast back (the
    doc_perplexity_buckets recipe — percentile_approx is the 100 TB
    drop-in with the same plan; both cuts come from ONE array-fraction
    percentile so the aggregation state isn't duplicated per cut); the
    9-dp-rounded score and md5 shuffle keys make the total order
    (bucket, md5(doc_id), doc_id) a pure function of the data, so the
    position column value-hash oracles. A training order is a TOTAL
    order, but the global row_number is computed scale-safely —
    ``operators/windows.py global_ordered_rank``: range-exchange on the
    order key, per-partition ranks, broadcast partition offsets — never
    the Exchange SinglePartition a bare Window.orderBy compiles to (the
    100x sweep measured that serial stage at 41.7x wall; this form is
    parallel end to end with bit-identical positions)."""
    from scraping_jobsdb_spark.operators.textops import quality_score
    from scraping_jobsdb_spark.operators.windows import global_ordered_rank

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    # Materialize the scored projection ONCE (doc_id, quality — 2 narrow
    # columns, text dropped): the percentile aggregate, the range
    # exchange's boundary sampling, the offsets branch and the ranked
    # branch all read these checkpointed blocks instead of re-running the
    # quality-scoring corpus scan (the r10 form scored the corpus twice
    # and then checkpointed a THIRD copy inside global_ordered_rank —
    # VERDICT r10 item 5, measured 21.8x wall at 100x data).
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 9).alias("quality")
    ).localCheckpoint()
    cuts = scored.agg(
        F.expr(
            "percentile(quality, array(1.0D/3.0D, 2.0D/3.0D))"
        ).alias("qs")
    ).select(
        F.col("qs").getItem(0).alias("q1"), F.col("qs").getItem(1).alias("q2")
    )
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "quality",
        F.when(F.col("quality") >= F.col("q2"), F.lit(0))
        .when(F.col("quality") >= F.col("q1"), F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("bucket"),
    )
    return global_ordered_rank(
        bucketed.withColumn(
            "__shuf", F.md5(F.col("doc_id").cast("string"))
        ),
        ["bucket", "__shuf", "doc_id"],
        out_col="position",
        # bucketed is a cheap broadcast-join projection of the checkpoint
        # above — deterministic by construction, so the rank operator can
        # skip its own second materialization
        materialize=False,
    ).select("position", "doc_id", "bucket", "quality")


@_register(
    "curriculum_pack_order_approx",
    oracle="""
    SELECT (SELECT COUNT(*) FROM documents WHERE text IS NOT NULL)
               AS total_rows,
           TRUE AS positions_are_permutation,
           TRUE AS buckets_contiguous_ordered,
           TRUE AS bucket_order_matches_quality,
           TRUE AS cut_rank_error_bounded
    """,
)
def q_curriculum_pack_order_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION form of ``curriculum_pack_order`` (VERDICT r12 item
    4): identical plan — quality scoring, tertile cuts broadcast back,
    md5 within-bucket shuffle, scale-safe ``global_ordered_rank`` — but
    the two cuts come from ONE ``percentile_approx`` array aggregate
    (Greenwald-Khanna sketch, accuracy=10000, bounded state per
    partition) instead of the exact full-value-buffering ``percentile``,
    the drop-in at 100 TB where buffering every quality value is the
    scale-killer the exact twin\'s sweep row flagged (16.7x at 100x data,
    the steepest non-demoted family of the r12 sweep; the exact twin
    stays registered as the oracle-parity baseline and leaves the sweep
    like ``range_partition_balance_report`` did in r12).

    Evidence split, per the exact/approx contract the HLL/KMV and
    range-partition families set: sketch merge order makes the approx cut
    VALUES partitioning-dependent (and tie-heavy score distributions make
    bucket COUNTS legitimately lopsided — at sf0.01 the quality score
    takes two values, so even EXACT tertiles yield two buckets), so the
    gate row pins the DISTRIBUTION-FREE invariants of a valid curriculum
    order: every document ordered (total_rows), positions CONSISTENT
    with a 1..N permutation (exact integer min/max/sum/sum-of-squares
    moments PLUS an independent bit-XOR aggregate, each against its
    closed form — one aggregate pass, no distinct exchange; a strong
    consistency gate, not a formal proof, since rare multisets can match
    all five invariants — the exact permutation verification lives in
    tests/test_scale_ops.py on the shared rank operator where the
    count-distinct shuffle cost doesn't matter), bucket blocks
    contiguous and in curriculum order, bucket
    membership consistent with quality (max quality of bucket b+1 <= min
    of bucket b — the bucketing never scrambles), and the GK guarantee
    itself — each returned cut\'s rank within accuracy^-1 of its target
    fraction, checked by counting (<=cut / >=cut) against N/3 and 2N/3
    with tolerance floor(N/10000)+1. The exact-vs-approx cut comparison
    at rank tolerance additionally lives in tests/test_curation_eval.py."""
    from scraping_jobsdb_spark.operators.textops import quality_score
    from scraping_jobsdb_spark.operators.windows import global_ordered_rank

    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 9).alias("quality")
    ).localCheckpoint()
    cuts = scored.agg(
        F.expr(
            "percentile_approx(quality, array(1.0D/3.0D, 2.0D/3.0D), 10000)"
        ).alias("qs")
    ).select(
        F.col("qs").getItem(0).alias("q1"), F.col("qs").getItem(1).alias("q2")
    )
    # The whole invariant battery below is built as parsed SQL strings
    # (one F.expr parse per stage) rather than Column-DSL trees: the ~40
    # small aggregates/HOF lambdas cost ~2,700 py4j round-trips ≈ 1.3 s of
    # driver wall per build (guide §5 — pure driver time that delays every
    # executor and scales with query complexity, not data). Expression
    # trees are IDENTICAL (same CaseWhen/And associativity, same literal
    # types, same decimal casts) — verified analyzed-plan-equal modulo
    # expr ids against the DSL form over the same parents, and hash-green
    # vs the oracle.
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "quality",
        F.expr(
            "cast(CASE WHEN quality >= q2 THEN 0 "
            "WHEN quality >= q1 THEN 1 ELSE 2 END AS int)"
        ).alias("bucket"),
    )
    ranked = global_ordered_rank(
        bucketed.withColumn(
            "__shuf", F.md5(F.col("doc_id").cast("string"))
        ),
        ["bucket", "__shuf", "doc_id"],
        out_col="position",
        materialize=False,
    )
    # per-bucket blocks folded via a sorted-array HOF (2-3 rows; avoids
    # even a token single-partition window)
    blocks = (
        ranked.groupBy("bucket")
        .agg(
            F.expr("count(1) AS n"),
            F.expr("min(position) AS min_pos"),
            F.expr("max(position) AS max_pos"),
            F.expr("min(quality) AS min_q"),
            F.expr("max(quality) AS max_q"),
        )
        .agg(
            F.expr(
                "sort_array(collect_list(struct("
                "bucket, n, min_pos, max_pos, min_q, max_q))) AS bs"
            )
        )
    )
    folded = blocks.select(
        F.expr(
            "aggregate(bs, "
            "struct(cast(0 AS bigint) AS prev_max, "
            "cast(null AS double) AS prev_min_q, "
            "true AS ok_pos, true AS ok_q), "
            "(acc, s) -> struct("
            "s.max_pos AS prev_max, "
            "s.min_q AS prev_min_q, "
            "((acc.ok_pos AND (s.min_pos = acc.prev_max + 1)) "
            "AND ((s.max_pos - s.min_pos) + 1 = s.n)) AS ok_pos, "
            "(acc.ok_q AND (acc.prev_min_q IS NULL "
            "OR s.max_q <= acc.prev_min_q)) AS ok_q)) AS acc"
        )
    ).select(
        F.expr("acc.ok_pos AS buckets_contiguous_ordered"),
        F.expr("acc.ok_q AS bucket_order_matches_quality"),
    )
    # permutation CONSISTENCY check by exact integer MOMENTS (min/max/
    # sum/sum-of-squares against the closed forms) plus an INDEPENDENT
    # bit-XOR aggregate (xor of 1..N has a closed form by N mod 4;
    # xor is not a polynomial moment, so multiset swaps that preserve
    # all four moments — e.g. {2,6,7}->{3,4,8} — are caught when they
    # flip any bit-column parity), all riding the ONE aggregate pass —
    # the count_distinct form this replaces compiled to its own
    # hash-distinct exchange over every position, which dominated the
    # 100x sweep row (the audit was costing more than the production
    # plan it audits). This is a strong consistency gate, NOT a formal
    # permutation proof; the exact count-distinct verification lives in
    # tests/test_scale_ops.py where its shuffle cost doesn't matter.
    # Sum-of-squares reaches ~4e19 at 5M rows, past int64 — hence the
    # decimal(38,0) accumulators.
    perm = ranked.agg(
        F.expr("count(1) AS total_rows"),
        F.expr("min(position) AS __min_p"),
        F.expr("max(position) AS __max_p"),
        F.expr("sum(cast(position AS decimal(19,0))) AS __sum_p"),
        F.expr(
            "sum(cast(position AS decimal(19,0)) "
            "* cast(position AS decimal(19,0))) AS __sumsq_p"
        ),
        F.expr("bit_xor(position) AS __xor_p"),
    ).select(
        "total_rows",
        F.expr(
            "(((((__min_p = 1) AND (__max_p = total_rows)) "
            "AND (__sum_p * 2 = "
            "cast(total_rows AS decimal(38,0)) * (total_rows + 1))) "
            "AND (__sumsq_p * 6 = "
            "cast(total_rows AS decimal(38,0)) * (total_rows + 1) "
            "* (total_rows * 2 + 1))) "
            "AND (__xor_p = CASE WHEN total_rows % 4 = 0 THEN total_rows "
            "WHEN total_rows % 4 = 1 THEN 1 "
            "WHEN total_rows % 4 = 2 THEN total_rows + 1 "
            "ELSE 0 END)) AS positions_are_permutation"
        ),
    )
    # The GK guarantee, checked end to end: rank(cut) within eps*N of the
    # target fraction => count(quality<=cut) >= f*N - eps*N and
    # count(quality>=cut) >= (1-f)*N - eps*N, eps = 1/accuracy
    gk = (
        scored.crossJoin(F.broadcast(cuts))
        .agg(
            F.expr("count(1) AS n_docs"),
            F.expr(
                "sum(CASE WHEN quality <= q1 THEN 1 ELSE 0 END) AS le1"
            ),
            F.expr(
                "sum(CASE WHEN quality >= q1 THEN 1 ELSE 0 END) AS ge1"
            ),
            F.expr(
                "sum(CASE WHEN quality <= q2 THEN 1 ELSE 0 END) AS le2"
            ),
            F.expr(
                "sum(CASE WHEN quality >= q2 THEN 1 ELSE 0 END) AS ge2"
            ),
        )
        .select(
            F.expr(
                "(((((le1 + floor(n_docs / 10000) + 1) * 3 >= n_docs) "
                "AND ((ge1 + floor(n_docs / 10000) + 1) * 3 >= n_docs * 2)) "
                "AND ((le2 + floor(n_docs / 10000) + 1) * 3 >= n_docs * 2)) "
                "AND ((ge2 + floor(n_docs / 10000) + 1) * 3 >= n_docs)) "
                "AS cut_rank_error_bounded"
            )
        )
    )
    return (
        perm.crossJoin(F.broadcast(folded))
        .crossJoin(F.broadcast(gk))
        .select(
            "total_rows",
            "positions_are_permutation",
            "buckets_contiguous_ordered",
            "bucket_order_matches_quality",
            "cut_rank_error_bounded",
        )
    )
