"""Benchmark runner (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints small
self-contained JSON lines: per-query timing chunks (~15 queries each,
oldest-first so a tail capture keeps the newest) followed by ONE summary
line {"metric": "headline_queries_total", "value": total_sec, "unit":
"sec", "sf": ..., "query_count": ..., "canary_start/mid/end": ...}.
The complete result is also written to ``BENCH_SELF.json`` (committed),
because the driver's stdout capture keeps only a ~2 KB tail.

Each query is fully materialized through the noop sink (forces the whole
plan — scan, shuffle, agg — without paying driver-side collect/serialization,
which is what a cluster deployment would also avoid).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from scraping_jobsdb_spark.plans.queries import REGISTRY  # noqa: E402
from scraping_jobsdb_spark.session import get_spark  # noqa: E402

# Headline set: the flagship + one representative per operator family,
# including the LLM-pipeline extensions (dedup/similarity/text) and windows.
# ORDER IS APPEND-ONLY: positions stay stable across rounds so per-query
# times in BENCH_r{N}.json are directly comparable; new headline queries go
# at the end (round 2 added the bucketed embedding near-dup, the
# transactional MERGE write path, the observe-based DQ rollup, and the
# temporal/SCD2/funnel/dedup-pipeline analytics).
BENCH_QUERIES = [
    "impute_interval_merge",
    "pricing_summary",
    "groupby_min_max",
    "dedup_distinct_on",
    "join_dims_broadcast",
    "join_left_outer_agg",
    "anti_join_not_in",
    "count_distinct_pagination",
    "window_running_sum",
    "topk_orders",
    "doc_text_stats",
    "minhash_neardup_pairs",
    "embedding_topk",
    "events_hourly_tumbling",
    "large_order_customers",
    "promo_revenue_ratio",
    "window_distribution_pack",
    "events_sliding_windows",
    "pandas_udf_token_count",
    "salted_groupby_skewed",
    "customer_order_histogram",
    # --- round 2 additions (keep appending, never reorder) ---
    "embedding_neardup_pairs",
    "merge_upsert_txn",
    "dq_bounds_observed",
    "asof_join_latest_state",
    "range_join_followups",
    "scd2_supplier_balances",
    "funnel_click_to_purchase",
    "dedup_pipeline_end_to_end",
    "llm_corpus_prep",
    # --- round 3 additions (keep appending, never reorder) ---
    "doc_winnowing_fingerprints",
    "stratified_sample_per_lang",
    "cdc_row_changes_txn",
    "tfidf_top_terms",
    "embedding_topk_np",
    # --- round 4 additions (keep appending, never reorder) ---
    "winnowing_containment_pairs",
    "cdc_appends_since_txn",
    "cdc_row_changes_bucketed_txn",
    "dedup_pipeline_winnowing",
    "doc_pii_redaction",
    "doc_repetition_stats",
    "doc_top_ngrams",
    "doc_chunking",
    "token_budget_sample_per_lang",
    "hll_mergeable_sketches",
    "bm25_doc_ranking",
    "incremental_mv_refresh",
    "decontamination_ngram_overlap",
    "cms_term_frequencies",
    "weighted_sample_by_length",
    "events_time_weighted_value",
    "stats_regression_pack",
    "bloom_point_lookup_txn",
    "doc_unigram_surprisal",
    "term_postings_index",
    "doc_segment_dedup_global",
    "quality_top_fraction_per_lang",
    "skew_join_salted",
    "incremental_batch_dedup",
    "dedup_keep_best_quality",
    "hll_portable_registers",
    "minhash_portable_neardup_pairs",
    "kmv_distinct_sketches",
    "quantile_hash_sample",
    "retention_cohorts",
    "regional_supplier_volume",
    "nation_volume_shipping",
    "market_share_by_year",
    "sole_supplier_orders",
    "gopher_quality_flags",
    "mixture_weighted_corpus_sample",
    "asof_join_forward_window",
    "events_daily_gap_fill",
    "fuzzy_join_supplier_names",
    "embedding_int8_cosine_topk",
    "recursive_event_chains",
    "variant_json_surface",
    # --- round 5 additions (keep appending, never reorder) ---
    # simhash re-admitted: the hot-band pre-filter now bounds band-join
    # fan-in (not just emitted pairs), and the fingerprint stage is
    # checkpointed once instead of replayed per consumer (8.1 s → 1.7 s)
    "simhash_neardup_pairs",
    "simhash_portable_neardup_pairs",
    "incremental_indexed_dedup",
    # the reference's own ingest → parse → impute path on the offline
    # site: a recurring timing row for the composed pipeline (SURVEY
    # §3.1-3.3), previously pytest-only
    "reference_pipeline_e2e",
    "domain_cap_sample",
    "sequence_packing_stream",
    "bpe_merge_candidates",
    "lateral_topn_per_key",
    "group_by_all_rollup",
    "nearest_centroid_confusion",
    "epoch_repeat_expansion",
    "corpus_to_training_examples",
    "product_type_profit",
    "txn_replace_where_backfill",
    "txn_deletion_vectors",
    "txn_update_where",
    "txn_mor_update",
    # --- round 6 additions (keep appending, never reorder) ---
    # NB: as of r6 the "embedding_neardup_pairs" row above times the
    # PROMOTED sign-LSH banded plan (the scale path); the exact blocked-
    # GEMM form it used to time is appended here under its new
    # verification-only name, so both shapes stay measured.
    "embedding_neardup_pairs_exact_gemm",
    "order_flow_pagerank",
    "embedding_ann_index_txn_lifecycle",
    "bpe_learned_merges",
    "bloom_prefilter_supplier_revenue",
    "key_skew_report_suppkey",
    # --- round 7 additions (keep appending, never reorder) ---
    "order_flow_pagerank_redistribute",
    "bpe_corpus_tokenize",
    "semantic_dedup_embeddings",
    "doc_text_normalize",
    "events_ohlc_hourly",
    "txn_merge_full_sync",
    "events_ohlc_streaming",
    "doc_bigram_perplexity",
    # --- round 8 additions (keep appending, never reorder) ---
    # SemDeDup at production cell counts (kmeans k ~ corpus/50, broadcast
    # argmin assignment) — the row that shows the cell-count knob bounding
    # the in-cell quadratic, vs the 10-label-cell gate sibling above
    "semantic_dedup_kmeans_cells",
    # the IVF pruning path on its new fully-oracled form
    "embedding_ivf_topk",
    # unigram-LM tokenizer family (SentencePiece sibling of the BPE rows)
    "unigram_seed_candidates",
    "unigram_corpus_tokenize",
    # WordPiece completes the tokenizer triad (BPE / unigram / WordPiece)
    "wordpiece_corpus_tokenize",
    # RAG retrieval: BM25 + dense cosine fused by reciprocal-rank fusion
    "hybrid_rrf_retrieval",
    # CCNet perplexity head/middle/tail corpus split
    "doc_perplexity_buckets",
    # JL +-1 random projection (embedding compression upstream of ANN)
    "embedding_random_projection",
    # contrastive hard-negative mining + MRL truncated first-pass retrieval
    "embedding_hard_negatives",
    "embedding_matryoshka_topk",
    # naive-Bayes quality classifier, trained AND scored in one job
    "quality_classifier_nb",
    # DSIR hashed-unigram importance resampling (target-vs-raw log ratio)
    "dsir_importance_sample",
    # C4-style boilerplate SPAN removal (frequent-trigram strike + rebuild)
    "doc_boilerplate_removal",
    # XLM-R temperature-resampled language mixture (largest remainder)
    "temperature_mixture_corpus",
    # per-doc unigram Shannon entropy (information-density quality scalar)
    "doc_token_entropy",
    # corpus-wide PMI collocations (phrase/stop-pair detector)
    "corpus_pmi_pairs",
    # ZCA-whitened retrieval (moments pass + driver eigh + Arrow transform)
    "embedding_whitening_topk",
    # streaming NB quality scoring (offline fit, online stream-static score)
    "doc_quality_streaming",
    # per-language KL divergence from the corpus distribution
    "lang_kl_divergence",
    # governance: k-anonymity over the (lang, source) quasi-identifiers
    "k_anonymity_report",
    # FineWeb-style multi-signal quality verdicts (rule+NB+entropy+LM)
    "quality_ensemble_verdicts",
    # 1-bit sign-sketch Hamming retrieval (XOR+popcount first pass)
    "embedding_binary_hamming_topk",
    # warehouse FK orphan audit (one anti-join per relationship)
    "referential_integrity_report",
    # daily PSI drift monitor over the event value distribution
    "events_value_psi_daily",
    # last-touch revenue attribution (asof-join composition)
    "attribution_last_touch",
    # retrieval-quality eval harness (nDCG@10 / MRR / recall@10 vs qrels)
    "retrieval_eval_metrics",
    # dictionary phrase tagging (explode-once + broadcast gazetteer join)
    "dictionary_phrase_tagging",
    # C4 blocklist filter report (token-set overlap, per-language rates)
    "badwords_filter_report",
    # exact-integer EWMA smoothing (50-day half-life window, no epsilon)
    "events_ewma_smoothing",
    # curriculum ordering (quality tertiles + in-bucket hash shuffle)
    "curriculum_pack_order",
    # degree-ordered triangle count over the supplier co-occurrence graph
    "graph_triangle_count",
    # median/MAD robust daily-value outlier flags
    "events_anomaly_mad",
    # KMV/theta sketch set algebra (union/intersection/Jaccard estimates)
    "kmv_set_operations",
    # char-trigram language-ID confusion matrix (held-out split)
    "doc_langid_trigram",
    # TPC-H Q21 shape: exists + not-exists as grouped HAVING (2 scans not 3)
    "waiting_supplier_report",
    # Morton-curve layout stats (multi-dim min/max pruning evidence)
    "zorder_layout_stats",
    # exact mergeable distinct via native bitmap functions
    "bitmap_exact_distinct",
    # exact-moment column profiler (DECIMAL power sums, one scan)
    "column_profile_orders",
    # range-partition boundary planning (sorted-write balance report)
    "range_partition_balance_report",
    # native approx_top_k heavy hitters (bounded sketch state, one pass)
    "approx_topk_native",
    # snapshot time travel + schema evolution + restore lifecycle audit
    "txn_time_travel_audit",
    # rolling exact median (28-row frame, single user-keyed shuffle)
    "events_rolling_median",
    # --- round 10 additions (keep appending, never reorder) ---
    # percentile_approx production twin of the range-partition planner
    # (bounded sketch state — the 100 TB form; the exact twin above stays
    # as the oracle-parity baseline)
    "range_partition_balance_approx",
    # exhaustive-PQ ADC retrieval, now hash-oracled in the int8 domain
    "embedding_pq_topk",
    # quantize→dequantize→exact search, now hash-oracled via pow2 scale
    "embedding_quantized_topk",
    # --- round 11 additions (keep appending, never reorder) ---
    # live JDBC write → partitioned scan roundtrip (embedded Derby, S5/S6)
    "jdbc_live_roundtrip",
    # persisted MinHash-LSH signature index: batch admission + probes
    "incremental_minhash_indexed_dedup",
    # the SimHash (Hamming-space) member of the signature-index family
    "incremental_simhash_indexed_dedup",
    # ExactSubstr dedup spans (Lee et al.) as duplicated-window merge
    "exact_substring_dedup_spans",
    # --- round 12 additions (keep appending, never reorder) ---
    # real PNG codec (stdlib DEFLATE+filters) through the decode stage
    "multimodal_png_decode_features",
    # real RIFF/WAVE PCM decode through the audio stage
    "multimodal_wav_decode_features",
    # real YUV4MPEG2 frame fan-out through the video sampling stage
    "multimodal_y4m_frame_sample",
    # Common-Crawl WARC source: write + read real .warc.gz archives
    "warc_ingest_roundtrip",
    # URL-level crawl dedup (canonicalize + registered domain)
    "url_canonical_dedup",
    # gzipped JSONL interchange roundtrip (schema-first nested read)
    "jsonl_ingest_roundtrip",
    # --- round 13 additions (keep appending, never reorder) ---
    # STEADY-STATE persisted-index rows (VERDICT r12 item 2): settle once
    # per process outside the timed region; these measure the per-batch
    # O(batch) admission/probe path a production ingest actually pays
    "fpindex_steady_admission",
    "lshindex_steady_admission",
    "ann_index_steady_probe",
    # intra-batch keep-list composed with online admission (item 7)
    "online_admission_intra_batch",
    # percentile_approx production twin of the curriculum packer (item 4)
    "curriculum_pack_order_approx",
    # real baseline-JPEG codec through the decode stage (item 6)
    "multimodal_jpeg_decode_features",
    # real ISO-BMFF container walk + stsz/stco demux (video ingest pass)
    "multimodal_mp4_demux",
    # --- round 14 additions (keep appending, never reorder) ---
    # real IMA-ADPCM compressed-audio decode (fmt 0x0011 WAV)
    "multimodal_adpcm_decode_features",
    # container -> pixels: multi-chunk MP4 of JPEG samples, demux + decode
    "multimodal_mp4_jpeg_pipeline",
    # 100-query batch probe of the settled txn ANN index (O(1) in queries)
    "ann_index_batch_topk",
]

# Full-lifecycle streaming rows moved to the SCALING-ONLY tier (VERDICT
# r12 item 8): each spins up a readStream/foreachBatch lifecycle whose
# wall time is Structured-Streaming scheduler setup, not plan execution
# (11.7 s / 6.5 s / 5.2 s at sf0.1 in the r12 artifact) — the steady-state
# rows above now carry the family's headline timing, while these keep
# their CORRECTNESS gate rows (registry unchanged) and their
# BENCH_SCALING.json 10x/100x rows (scripts/bench_scaling.py FAMILIES).
LIFECYCLE_SCALING_ONLY = [
    "streaming_indexed_dedup",
    "streaming_minhash_indexed_dedup",
    "streaming_minhash_online_admission",
]

# Canary reference: the r10 verdict's canary mean for pricing_summary at
# sf0.1 on the round driver's machine ((1.19 + 1.10 + 1.18) / 3). Dividing
# a run's canary mean by this gives the session/machine drift factor;
# "normalized" seconds below are raw / that factor, so round-over-round
# deltas read directly from the artifact without manual canary arithmetic
# (VERDICT r10 item 8). The constant is a fixed REFERENCE POINT, not a
# target — update it only if the canary query's own plan changes.
CANARY_REF = 1.157

# Python-stage canary (VERDICT r11 Wrong #1): the r11 driver run showed
# 2-8.6x blowups concentrated in Arrow/pandas-UDF queries while the
# JVM-relational canary stayed flat — whatever slows the Python-worker
# path (worker pool contention, host load against the Arrow transfer,
# page cache) is INVISIBLE to pricing_summary. pandas_udf_token_count is
# the same start/mid/end probe through the ArrowEvalPython path; its
# drift factor is reported alongside so a divergence between the two
# factors localizes the cause to the Python lane. Reference pinned from
# this round's builder machine (min-of-2 mean over start/mid/end, sf0.1).
PYCANARY_REF = 0.504


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once per engine path (hash agg, window codegen, higher-
    # order array exprs, Arrow/pandas-UDF workers) at the tiny sf0.001 so the
    # timed sf runs measure the plan, not first-touch JIT/codegen/worker
    # startup. A long-running cluster is always in this steady state.
    warm_dir = "/root/testdata/sf0.001"
    for warm in (
        "groupby_min_max",
        "dedup_distinct_on",
        "window_running_sum",
        "minhash_neardup_pairs",
        "doc_text_stats",
        "embedding_topk",
        "pandas_udf_token_count",
        "events_sliding_windows",
    ):
        REGISTRY[warm].spark_fn(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    # Warm the TIMED dataset's page cache too (one pass over the two canary
    # queries at sf_dir): without this the start canaries pay the cold
    # parquet read that no later query pays, inflating canary_start ~2x
    # (measured r12: 2.7 s cold vs 1.5 s steady) and skewing the drift
    # factor the normalization depends on.
    for warm in ("pricing_summary", "pandas_udf_token_count"):
        REGISTRY[warm].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Drift canary (VERDICT r6 Wrong #2): one fixed query timed at the
    # start, middle, and end of the sweep. The suite total has drifted
    # uniformly round-over-round on UNCHANGED code (r4→r5 1.06×, r5→r6
    # 1.15×) — if the canary's end/start ratio tracks that drift, the cause
    # is single-JVM session aging (code cache / GC pressure growing with
    # the suite), not plan regressions.
    def _time_fn(build_fn) -> float:
        runs: list[float] = []
        # min-of-2 steady-state timing (the deployed posture of a
        # long-running cluster), robust to one-off GC/compilation hiccups
        # — plus a THIRD run when the first two disagree >1.4x (VERDICT
        # r11 Wrong #1: a single transient host-load spike can still eat
        # both runs' min when they land back-to-back; a disagreement that
        # large says at least one run was not steady-state).
        for _ in range(2):
            t0 = time.perf_counter()
            build_fn().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if max(runs) > 1.4 * min(runs):
            t0 = time.perf_counter()
            build_fn().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    def _time_query(name: str) -> float:
        return _time_fn(lambda: REGISTRY[name].spark_fn(spark, sf_dir))

    def _canary_df():
        # FROZEN canary plan — the r10-r13 pricing_summary shape, inlined
        # verbatim. The canary exists to measure HOST/session drift, so
        # its plan must never change even when the registry query it was
        # cloned from is optimized (r14 batch 9 added fan_out to the
        # registry's pricing_summary, halving it; timing the registry
        # form against the r10-pinned CANARY_REF would report drift=0.5
        # on an unchanged host and silently inflate every normalized
        # number). This frozen form keeps CANARY_REF and the canary
        # series comparable across all rounds.
        from pyspark.sql import functions as F

        from scraping_jobsdb_spark.plans._shared import _dsum
        from scraping_jobsdb_spark.sources.tables import load_table

        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.filter(
                F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
            )
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
                (
                    F.sum(F.col("l_quantity").cast("decimal(30,4)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("avg_qty"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def _canary() -> float:
        return _time_fn(_canary_df)

    def _pycanary_df():
        # FROZEN Python-lane canary plan — the r8-r14 shape of
        # pandas_udf_token_count, inlined verbatim (fan_out scan +
        # Arrow-vectorized pandas_udf regex count), for the same reason
        # _canary_df is frozen: the canary measures HOST/session drift on
        # the Python-worker lane, so its plan must stay fixed even if the
        # registry query it was cloned from is later optimized — otherwise
        # an optimization would read as drift against the pinned
        # PYCANARY_REF and skew every normalized number (the exact failure
        # the JVM canary hit in r14 batch 9).
        import re

        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        from scraping_jobsdb_spark.sources.tables import fan_out, load_table

        pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

        def _count(s):
            return s.map(
                lambda t: len(pat.findall(t)) if t is not None else None
            )

        _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
        counter = pandas_udf(_count, "bigint")
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id", counter(F.col("text")).alias("n_bpe_tokens")
        )

    def _pycanary() -> float:
        return _time_fn(_pycanary_df)

    # codegen-warm the frozen canary plans (their registry siblings warmed
    # the page cache above, but the frozen forms compile their own stages)
    _canary_df().write.format("noop").mode("overwrite").save()
    _pycanary_df().write.format("noop").mode("overwrite").save()

    canary = {"canary_start": _canary(), "pycanary_start": _pycanary()}

    # Dense canary SERIES (r12): one JVM canary sample ahead of every
    # ~15-query chunk, on top of the start/mid/end probes. Host noise on
    # this box moves on minute scales — a window a 3-sample global mean
    # cannot localize (three same-commit r12 runs normalized to
    # 148.8/186.7/266.1 s with DIFFERENT worst-query sets) — so each
    # query is also normalized against the linear interpolation of the
    # two canary samples bracketing it in time
    # (queries_nearest_canary_normalized). Every series point uses the
    # SAME min-of-2 discipline as the endpoints (r12 ADVICE: mixing
    # single-shot interior samples with min-of-N endpoints biased the
    # interpolated baseline high near the interior). Cost: ~22 extra
    # canary runs at ~1.5 s each at sf0.1.
    series: list[tuple[int, float]] = [(0, canary["canary_start"])]

    timings: dict[str, float] = {}
    for i, name in enumerate(BENCH_QUERIES):
        if i == len(BENCH_QUERIES) // 2:
            canary["canary_mid"] = _canary()
            canary["pycanary_mid"] = _pycanary()
            series.append((i, canary["canary_mid"]))
        elif i and i % 15 == 0:
            series.append((i, _canary()))
        timings[name] = _time_query(name)
    canary["canary_end"] = _canary()
    canary["pycanary_end"] = _pycanary()
    series.append((len(BENCH_QUERIES), canary["canary_end"]))

    def _drift_at(i: int) -> float:
        for (i0, c0), (i1, c1) in zip(series, series[1:]):
            if i0 <= i <= i1:
                frac = (i - i0) / (i1 - i0) if i1 > i0 else 0.0
                return (c0 + frac * (c1 - c0)) / CANARY_REF
        return series[-1][1] / CANARY_REF

    drift_for = {
        name: max(_drift_at(i), 1e-6)
        for i, name in enumerate(BENCH_QUERIES)
    }

    # Flagged-row RE-RUN pass (VERDICT r12 item 3): min-of-2 back-to-back
    # still lets one hot host window mint a fake top row in a single
    # artifact (r12: minhash_neardup_pairs 13.67 s vs 2.7 s quiet-box).
    # After the sweep — minutes later, a temporally SEPARATED sample —
    # re-measure every expensive or hot-window row and publish the min
    # across passes; both passes' values stay in the artifact
    # (rerun_queries) so the adjudication is auditable. Flag = raw time
    # >= 2 s (the rows that dominate the total) OR local canary drift
    # >= 1.25 (the rows a hot window inflated), capped at the 20 largest.
    flagged = [
        n
        for i, n in enumerate(BENCH_QUERIES)
        if timings[n] >= 2.0 or _drift_at(i) >= 1.25
    ]
    flagged = sorted(flagged, key=lambda n: -timings[n])[:20]
    rerun_queries: dict[str, list[float]] = {}
    if flagged:
        rr_c0 = _canary()
        rr_vals = {n: _time_query(n) for n in flagged}
        rr_c1 = _canary()
        canary["rerun_canary_start"] = rr_c0
        canary["rerun_canary_end"] = rr_c1
        for j, n in enumerate(flagged):
            frac = (j + 0.5) / len(flagged)
            d2 = max((rr_c0 + frac * (rr_c1 - rr_c0)) / CANARY_REF, 1e-6)
            rerun_queries[n] = [timings[n], rr_vals[n]]
            if rr_vals[n] < timings[n]:
                timings[n] = rr_vals[n]
                drift_for[n] = d2

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)

    # Canary-normalized seconds alongside raw (VERDICT r10 item 8): the
    # canary mean over CANARY_REF estimates this run's session/machine
    # drift; dividing it out makes totals comparable across rounds.
    drift = round(
        (canary["canary_start"] + canary["canary_mid"] + canary["canary_end"])
        / 3
        / CANARY_REF,
        4,
    )
    py_drift = round(
        (
            canary["pycanary_start"]
            + canary["pycanary_mid"]
            + canary["pycanary_end"]
        )
        / 3
        / PYCANARY_REF,
        4,
    )
    nearest = {
        name: round(timings[name] / drift_for[name], 3)
        for name in BENCH_QUERIES
    }
    normalized = {
        "canary_drift_factor": drift,
        "pycanary_drift_factor": py_drift,
        "value_canary_normalized": round(total / drift, 3),
        "queries_canary_normalized": {
            n: round(t / drift, 3) for n, t in timings.items()
        },
        "canary_series": [[i, c] for i, c in series],
        "rerun_queries": rerun_queries,
        "value_nearest_canary_normalized": round(sum(nearest.values()), 3),
        "queries_nearest_canary_normalized": nearest,
    }

    # The full result also lands in BENCH_SELF.json at the repo root (a
    # committed artifact): the driver's stdout capture keeps only a ~2 KB
    # TAIL, which cannot hold 100+ per-query timings no matter how the
    # lines are arranged — BENCH_r05/r06 each lost ~40 queries' numbers.
    self_path = Path(__file__).resolve().parent / "BENCH_SELF.json"
    self_path.write_text(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "query_count": len(timings),
                **canary,
                "canary_drift_factor": normalized["canary_drift_factor"],
                "pycanary_drift_factor": normalized["pycanary_drift_factor"],
                "value_canary_normalized": normalized[
                    "value_canary_normalized"
                ],
                "canary_series": normalized["canary_series"],
                "rerun_queries": normalized["rerun_queries"],
                "value_nearest_canary_normalized": normalized[
                    "value_nearest_canary_normalized"
                ],
                "queries": timings,
                "queries_canary_normalized": normalized[
                    "queries_canary_normalized"
                ],
                "queries_nearest_canary_normalized": normalized[
                    "queries_nearest_canary_normalized"
                ],
            },
            indent=1,
        )
        + "\n"
    )

    # stdout: SMALL self-contained JSON lines, ~15 queries each, so any
    # line that survives the tail capture parses on its own. Chunks are
    # ordered OLDEST-first so the lines nearest the end of stdout — the
    # ones the tail keeps — carry the NEWEST queries (this round's
    # additions, the ones needing driver scrutiny; r6's newest-first single
    # line sacrificed exactly those). The one-line summary with the canary
    # scalars goes last: whatever else is cut, it parses.
    chunk = 15
    for ci in range(0, len(BENCH_QUERIES), chunk):
        names = BENCH_QUERIES[ci : ci + chunk]
        print(
            json.dumps(
                {
                    "metric": "headline_queries_chunk",
                    "i": ci // chunk,
                    "sf": sf_val,
                    "queries": {n: timings[n] for n in names},
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "query_count": len(timings),
                **canary,
                "canary_drift_factor": normalized["canary_drift_factor"],
                "pycanary_drift_factor": normalized["pycanary_drift_factor"],
                "value_canary_normalized": normalized[
                    "value_canary_normalized"
                ],
                "value_nearest_canary_normalized": normalized[
                    "value_nearest_canary_normalized"
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
