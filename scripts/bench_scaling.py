"""Empirical scaling sweep: sf0.1 vs a 10x scale-up (VERDICT r7 items 3+6).

The 100 TB posture has so far been argued from plan shape (no products, no
row-Python, banded equi-joins, partition-pruned probes). This script turns
the argument into measured exponents: run one representative query per
headline family at sf0.1 AND at the deterministic 10x scale-up built by
``scripts/gen_scale_data.py``, and record t_big/t_base per family in
``BENCH_SCALING.json``.

Reading the ratios: a linear operator with shuffle overhead lands ~<=12x at
10x data on a fixed 32-thread machine (scan+shuffle are linear; fixed
per-job costs amortize DOWN, so cheap queries often come in well under
10x). Anything materially above ~12x is flagged super_linear=true and needs
a doc note or a fix — that is exactly the failure the sweep exists to catch
(e.g. an in-cell quadratic whose cell count failed to scale with n).

Two entries need construction beyond the registry:
- ``semantic_dedup_kmeans_cells`` comes from the registry unchanged — its
  k ~ corpus/50 and fixed-size training sample are IN the query, so the
  sweep measures the production posture (cells scale with n => in-cell
  quadratic stays ~n * cell_size).
- ``reference_pipeline_10x``: the e2e ingest->parse->impute pipeline is
  sf-independent (its corpus is the fake site), so the 10x point runs a
  10x (keyword x band) param grid against the same transport — S1-S9
  composed at 10x the crawl, same fetch_partitions.

Run:  python scripts/bench_scaling.py          (~10-20 min)
Env:  SPARK_GRAFT_SCALE_BIG=<dir>  (default <repo>/.scaling/sf1.0)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scraping_jobsdb_spark.plans.queries import REGISTRY  # noqa: E402
from scraping_jobsdb_spark.session import get_spark  # noqa: E402

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_BIG", str(REPO / ".scaling" / "sf1.0")
)

# One representative per headline family. Verdict-named families first.
FAMILIES = [
    # scan + aggregate (also the drift canary)
    "pricing_summary",
    # multi-join + agg + top-k
    "top_revenue_suppliers",
    # text MinHash LSH banding
    "minhash_neardup_pairs",
    # embedding sign-LSH banding
    "embedding_neardup_pairs",
    # SimHash hamming banding
    "simhash_neardup_pairs",
    # persisted fingerprint index: build + O(batch) admission
    "incremental_indexed_dedup",
    # iterative graph (5 power iterations, integer-exact)
    "order_flow_pagerank",
    # corpus-wide TF-IDF aggregate
    "tfidf_top_terms",
    # BPE train + corpus encode
    "bpe_corpus_tokenize",
    # IVF probe pruning (oracled form)
    "embedding_ivf_topk",
    # event-time session windows
    "events_session_window",
    # dedup pipeline keep-best (CC + quality argmax)
    "dedup_keep_best_quality",
    # SemDeDup, production cell regime (k ~ n/50, broadcast argmin)
    "semantic_dedup_kmeans_cells",
    # WordPiece end-to-end (distinct-word reduction + Arrow segmentation)
    "wordpiece_corpus_tokenize",
    # RRF hybrid retrieval (two corpus-scan legs + tiny fusion join)
    "hybrid_rrf_retrieval",
    # CCNet perplexity tertile split (bigram LM + 1-row percentile)
    "doc_perplexity_buckets",
    # JL random projection (map-only codegen, no shuffle)
    "embedding_random_projection",
    # NB classifier train+score (tf agg + vocab-sized broadcast weights)
    "quality_classifier_nb",
    # DSIR hashed-unigram importance resampling (256-bucket model)
    "dsir_importance_sample",
    # boilerplate span removal (gram df agg + anti join + reassembly)
    "doc_boilerplate_removal",
    # temperature mixture (5-row quota frame + rank window)
    "temperature_mixture_corpus",
    # per-doc Shannon entropy (tf agg + same-shuffle window)
    "doc_token_entropy",
    # corpus PMI collocations (pair agg + marginal rollups + TOAP)
    "corpus_pmi_pairs",
    # ZCA whitening (Arrow moments + driver eigh + Arrow transform)
    "embedding_whitening_topk",
    # streaming NB scoring (stream-static broadcast, one stateful agg)
    "doc_quality_streaming",
    # per-language KL divergence (one (lang, token) agg + rollups)
    "lang_kl_divergence",
    # multi-signal quality ensemble (NB + entropy + bigram LM legs)
    "quality_ensemble_verdicts",
    # k-anonymity (one map-side-combined hash agg)
    "k_anonymity_report",
    # 1-bit Hamming retrieval (map-only packing + broadcast-query top-k)
    "embedding_binary_hamming_topk",
    # FK orphan audit (anti joins against key projections)
    "referential_integrity_report",
    # PSI drift monitor (one (day, bin) agg + tiny grid rollups)
    "events_value_psi_daily",
    # last-touch attribution (asof union-sort window over events)
    "attribution_last_touch",
    # retrieval eval harness (one corpus pass + query-count-sized metrics)
    "retrieval_eval_metrics",
    # dictionary phrase tagging (explode-once + broadcast dict join)
    "dictionary_phrase_tagging",
    # blocklist filter report (map-only token-set overlap + lang agg)
    "badwords_filter_report",
    # exact-integer EWMA (one keyed agg + one 50-row-frame window)
    "events_ewma_smoothing",
    # curriculum ordering: the EXACT-percentile form is demoted from the
    # sweep (VERDICT r12 item 4, the range_partition precedent) — exact
    # `percentile` buffers every quality value per partial aggregate
    # (16.7x at 100x, the r12 sweep's steepest non-demoted row); its
    # production twin `curriculum_pack_order_approx` (percentile_approx
    # cuts, identical plan otherwise) carries the scale rows below.
    # triangle enumeration (wedge join bounded by oriented out-degree)
    "graph_triangle_count",
    # MAD anomalies (one shuffle: both percentiles window over user)
    "events_anomaly_mad",
    # KMV set algebra (two 64-row sketches; corpus-size-independent tail)
    "kmv_set_operations",
    # trigram langid (explode once, broadcast profile, per-doc argmax)
    "doc_langid_trigram",
    # Q21 shape (two lineitem scans + keyed aggs, TakeOrderedAndProject)
    "waiting_supplier_report",
    # z-order layout (map-only interleave + one keyed agg)
    "zorder_layout_stats",
    # bitmap exact distinct (4KB-per-bucket agg state, mergeable)
    "bitmap_exact_distinct",
    # column profiler (one scan, mergeable power sums)
    "column_profile_orders",
    # range-partition planning: the EXACT-percentile form is demoted from
    # the sweep (VERDICT r11 item 8) — exact `percentile` buffers the full
    # distinct-key value map per partial aggregate, a known-unscalable
    # baseline kept ONLY for sf0.01 oracle parity; its production twin
    # `range_partition_balance_approx` (bounded-sketch percentile_approx,
    # identical plan otherwise) carries the scale rows below.
    # approx_top_k (one sketch-state agg, no token-keyed shuffle)
    "approx_topk_native",
    # time-travel audit (history-length-bounded snapshot aggregates)
    "txn_time_travel_audit",
    # streaming index maintenance (epoch-keyed append + delta DF fold)
    "streaming_indexed_dedup",
    # rolling median (bounded frame array median, one window)
    "events_rolling_median",
    # --- round 10 additions ---
    # percentile_approx range-partition planning (bounded sketch state)
    "range_partition_balance_approx",
    # exhaustive-PQ ADC retrieval (int8 codebook derivation + scan)
    "embedding_pq_topk",
    # quantize→dequantize→exact search (pow2-scale gate instance)
    "embedding_quantized_topk",
    # --- round 11 additions ---
    # persisted MinHash-LSH signature index (sign corpus once + two
    # batch-sized probes — the near-dup analog of the fingerprint index)
    "incremental_minhash_indexed_dedup",
    # its SimHash (Hamming-space) sibling — also exercises the Arrow
    # vote kernel under the md5-portable hash family
    "incremental_simhash_indexed_dedup",
    # ExactSubstr dedup spans (gram agg + equi-join + per-doc merge)
    "exact_substring_dedup_spans",
    # --- round 12 additions ---
    # foreachBatch ONLINE LSH admission (readStream lifecycle; its
    # headline bench row moved to the lifecycle tier in r13 — the scale
    # rows here keep measuring the full stream drain)
    "streaming_minhash_online_admission",
    # real PNG codec through the Arrow decode stage (DEFLATE + filters)
    "multimodal_png_decode_features",
    # real RIFF/WAVE PCM decode + YUV4MPEG2 frame fan-out
    "multimodal_wav_decode_features",
    "multimodal_y4m_frame_sample",
    # WARC archive write + member-walk read (parallelism = file count)
    "warc_ingest_roundtrip",
    # URL canonicalization + one hash aggregate
    "url_canonical_dedup",
    # gzipped JSONL schema-first roundtrip
    "jsonl_ingest_roundtrip",
    # --- round 13 additions ---
    # STEADY-STATE persisted-index rows (settle cached per process; the
    # min-of-2 discipline below times the post-settle steady state — the
    # first run pays the one-time create, the second only probe+replay)
    "fpindex_steady_admission",
    "lshindex_steady_admission",
    "ann_index_steady_probe",
    # intra-batch keep-list + online admission replay
    "online_admission_intra_batch",
    # percentile_approx curriculum twin (bounded sketch state)
    "curriculum_pack_order_approx",
    # real baseline-JPEG codec through the Arrow decode stage
    "multimodal_jpeg_decode_features",
    # real ISO-BMFF container walk + demux through the Arrow stage
    "multimodal_mp4_demux",
    # --- round 14 additions ---
    # real IMA-ADPCM compressed-audio decode through the Arrow stage
    "multimodal_adpcm_decode_features",
    # container -> pixels: multi-chunk MP4 demux feeding the JPEG decoder
    "multimodal_mp4_jpeg_pipeline",
    # batch probe of the settled txn ANN index (one pruned multi-cell
    # read + one vectorized scoring stage for the whole query set)
    "ann_index_batch_topk",
    # NOT measured: jdbc_live_roundtrip — a scale row there would measure
    # the embedded Derby test double's single-JVM serial ingest (12.6x at
    # 10x when tried), not a plan property of this engine; production
    # JDBC scale is partitioned parallel connections against a real
    # server, which no local substitute represents honestly.
]


# Queries that SETTLE a persisted index on their first in-process call
# (the documented steady-state design: the one-time create happens outside
# the timed region). Their first run at each sf_dir pays the settle, which
# at 100x exceeds _time's 60 s second-run skip — so the sweep must warm
# them once untimed per directory or the row silently re-measures the
# create (caught in r13: fpindex_steady_admission read 114 s / 20x when
# the settle leaked into the timed region, vs the actual steady state).
STEADY_SETTLE = {
    "fpindex_steady_admission",
    "lshindex_steady_admission",
    "ann_index_steady_probe",
    "ann_index_batch_topk",
    "online_admission_intra_batch",
}


def _run_registry(spark, name: str, sf_dir: str) -> None:
    REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()


def _reference_pipeline(spark, grid_factor: int) -> None:
    import tempfile
    from datetime import date as _date

    from scraping_jobsdb_spark.pipelines.impute import impute
    from scraping_jobsdb_spark.pipelines.ingest import (
        DEFAULT_BANDS,
        DEFAULT_KEYWORDS,
        ingest,
    )
    from scraping_jobsdb_spark.pipelines.parse import parse
    from scraping_jobsdb_spark.sources.fake_site import fake_transport
    from scraping_jobsdb_spark.sources.txn import read_table_any

    keywords = [
        kw if rep == 0 else f"{kw}x{rep}"
        for rep in range(grid_factor)
        for kw in DEFAULT_KEYWORDS
    ]
    base = tempfile.mkdtemp(prefix=f"sjs_scale_e2e_{grid_factor}x_")
    ingest(
        spark,
        fake_transport,
        lake_path=f"{base}/lake",
        raw_path=f"{base}/raw",
        catalog_path=f"{base}/catalog",
        run_date=_date(2026, 8, 13),
        keywords=keywords,
        bands=list(DEFAULT_BANDS),
        fetch_partitions=8,
    )
    parse(spark, f"{base}/lake", f"{base}/parsed")
    impute(spark, f"{base}/raw", f"{base}/parsed")
    read_table_any(spark, f"{base}/parsed").write.format("noop").mode(
        "overwrite"
    ).save()


def _time(fn, min_runs: int = 2, skip_second_above_s: float = 60.0) -> float:
    best = float("inf")
    for i in range(min_runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        if dt > skip_second_above_s:
            break
    return round(best, 3)


def _spot_check_100x(big_dir: str, factor: int, families: list[str]) -> None:
    """The deep-scale spot check (r8 verdict item 6): re-measure the named
    families (the steepest 10x movers) at ``factor``x data and record them
    in a ``data_factor_100`` section of BENCH_SCALING.json. The flag
    threshold scales with the factor (linear work at Nx on a fixed
    32-thread box lands <= ~1.2N once parallelism is saturated)."""
    spark = get_spark(app_name="bench_scaling_100x")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    for warm in ("groupby_min_max", "minhash_neardup_pairs", "embedding_topk"):
        _run_registry(spark, warm, warm_dir)
    section: dict = {"sf_big": big_dir, "data_factor": factor, "families": {}}
    for name in families:
        # a family that CANNOT complete at factor-x data (OOM, hang-kill) is
        # the sweep's most important possible finding — record it as a
        # flagged failure and keep measuring the rest instead of dying
        try:
            if name in STEADY_SETTLE:
                _run_registry(spark, name, BASE_DIR)  # settle, untimed
            t_base = _time(lambda: _run_registry(spark, name, BASE_DIR))
            if name in STEADY_SETTLE:
                _run_registry(spark, name, big_dir)  # settle, untimed
            t_big = _time(
                lambda: _run_registry(spark, name, big_dir), min_runs=1
            )
        except Exception as e:  # noqa: BLE001
            section["families"][name] = {
                "error": f"{type(e).__name__}: {str(e)[:200]}",
                "super_linear": True,
            }
            print(f"{name}: FAILED at {factor}x — {type(e).__name__}", flush=True)
            continue
        ratio = round(t_big / t_base, 2) if t_base > 0 else None
        section["families"][name] = {
            "t_base_s": t_base,
            "t_big_s": t_big,
            "ratio": ratio,
            "super_linear": bool(ratio and ratio > 1.2 * factor),
        }
        print(f"{name}: {t_base}s -> {t_big}s  ({ratio}x)", flush=True)
    section["super_linear_families"] = sorted(
        n for n, v in section["families"].items() if v["super_linear"]
    )
    prior_path = REPO / "BENCH_SCALING.json"
    prior = json.loads(prior_path.read_text()) if prior_path.exists() else {}
    # merge: later invocations extend the 100x section family by family
    # (same big dir AND same factor — a different factor is a different
    # measurement regime and replaces the section)
    old = prior.get("data_factor_100")
    if (
        old
        and old.get("sf_big") == section["sf_big"]
        and old.get("data_factor") == section["data_factor"]
    ):
        old["families"].update(section["families"])
        old["super_linear_families"] = sorted(
            n for n, v in old["families"].items() if v["super_linear"]
        )
        section = old
    prior["data_factor_100"] = section
    prior_path.write_text(json.dumps(prior, indent=1))
    print(json.dumps({"flagged_100x": section["super_linear_families"]}))


def main() -> None:
    # --big DIR --factor N name...: deep-scale spot check section
    argv = sys.argv[1:]
    if "--big" in argv:
        big = factor = None
        names = []
        it = iter(argv)
        for a in it:
            if a == "--big":
                big = next(it, None)
            elif a == "--factor":
                factor = next(it, None)
            elif a.startswith("-"):
                sys.exit(f"unknown flag {a!r}")
            else:
                names.append(a)
        if not big or not factor or not names:
            sys.exit(
                "usage: bench_scaling.py --big DIR --factor N family..."
            )
        _spot_check_100x(big, int(factor), names)
        return
    if not Path(BIG_DIR, "lineitem.parquet").exists():
        sys.exit(
            f"scale-up data missing at {BIG_DIR} — run scripts/gen_scale_data.py"
        )
    # optional: name families on argv to run ONLY those and merge the new
    # rows into an existing BENCH_SCALING.json (late-round additions don't
    # re-pay the whole sweep)
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    families = only or FAMILIES
    run_e2e = not only
    spark = get_spark(app_name="bench_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # same steady-state warm-up as bench.py
    warm_dir = "/root/testdata/sf0.001"
    for warm in (
        "groupby_min_max",
        "minhash_neardup_pairs",
        "embedding_topk",
        "pandas_udf_token_count",
        "events_sliding_windows",
    ):
        _run_registry(spark, warm, warm_dir)

    out: dict = {
        "sf_base": BASE_DIR,
        "sf_big": BIG_DIR,
        "data_factor": 10,
        "families": {},
    }
    for name in families:
        if name in STEADY_SETTLE:
            _run_registry(spark, name, BASE_DIR)  # settle, untimed
        t_base = _time(lambda: _run_registry(spark, name, BASE_DIR))
        if name in STEADY_SETTLE:
            _run_registry(spark, name, BIG_DIR)  # settle, untimed
        t_big = _time(lambda: _run_registry(spark, name, BIG_DIR))
        ratio = round(t_big / t_base, 2) if t_base > 0 else None
        out["families"][name] = {
            "t_base_s": t_base,
            "t_big_s": t_big,
            "ratio": ratio,
            "super_linear": bool(ratio and ratio > 12),
        }
        print(f"{name}: {t_base}s -> {t_big}s  ({ratio}x)", flush=True)

    if run_e2e:
        # e2e pipeline at 1x vs 10x param grid (corpus-independent of sf dirs)
        t_base = _time(lambda: _reference_pipeline(spark, 1), min_runs=1)
        t_big = _time(lambda: _reference_pipeline(spark, 10), min_runs=1)
        ratio = round(t_big / t_base, 2)
        out["families"]["reference_pipeline_10x_grid"] = {
            "t_base_s": t_base,
            "t_big_s": t_big,
            "ratio": ratio,
            "super_linear": bool(ratio > 12),
        }
        print(f"reference_pipeline_10x_grid: {t_base}s -> {t_big}s ({ratio}x)", flush=True)

    prior_path = REPO / "BENCH_SCALING.json"
    if only:
        if prior_path.exists():
            prior = json.loads(prior_path.read_text())
            merged = prior.get("families", {})
            merged.update(out["families"])
            prior["families"] = merged
            out = prior
    elif prior_path.exists():
        # a FULL re-sweep replaces the 10x section but must carry the
        # deep-scale section forward (r13: a full run silently dropped
        # data_factor_100 and with it every 100x row)
        prior = json.loads(prior_path.read_text())
        if "data_factor_100" in prior:
            out["data_factor_100"] = prior["data_factor_100"]

    flagged = sorted(
        n for n, v in out["families"].items() if v["super_linear"]
    )
    out["super_linear_families"] = flagged
    (REPO / "BENCH_SCALING.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"flagged": flagged, "n": len(out["families"])}))


if __name__ == "__main__":
    main()
