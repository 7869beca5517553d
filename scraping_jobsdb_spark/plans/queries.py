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

# Registry machinery (Query, REGISTRY, _register, decimal-sum helpers).
from scraping_jobsdb_spark.plans._shared import (  # noqa: F401
    Query,
    REGISTRY,
    _dsum,
    _dsum_sql,
    _register,
    oracle_sql,
    queries,
)

__all__ = ["Query", "REGISTRY", "queries", "oracle_sql"]

# The inventory: importing each chunk registers its queries. IMPORT ORDER IS
# REGISTRATION ORDER (what the driver sees beyond the gate window) — append
# new chunks at the end, new queries inside the family chunk they belong to.
from scraping_jobsdb_spark.plans import q_core as _q_core  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_text_dedup as _q_text_dedup  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_embedding as _q_embedding  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_events as _q_events  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_scalars as _q_scalars  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_analytic as _q_analytic  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_decision_graph as _q_decision_graph  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_txn_write as _q_txn_write  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_scale_ops as _q_scale_ops  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_llm_extensions as _q_llm_extensions  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_curation_eval as _q_curation_eval  # noqa: F401,E402
from scraping_jobsdb_spark.plans import q_graph_monitor as _q_graph_monitor  # noqa: F401,E402

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

# Round-12 window (registry 238, window 50). Evidence going in (latest-
# evidence join over CORRECTNESS_r01-r11): r11 went 47 hash-green + 3 clean
# rows-only, 0 red; histogram r7:42 / r8:48 / r9:49 / r10:48 / r11:50, plus
# seven queries registered this round with no rows yet. 7 + 1 + 42 = 50:
# (a) the 7 never-evidenced queries: streaming_minhash_online_admission —
#     the foreachBatch-driven ONLINE admission path of the LSH signature
#     index (VERDICT r11 gap 1 / item 3: admit_stream_batch finally gate-
#     evidenced, kept-only index state replayed in the oracle) — and
#     the REAL-codec trio (VERDICT item 7): multimodal_png_decode_features
#     (stdlib PNG — DEFLATE + scanline filters — through the Arrow decode
#     stage, decoded features hash-matched to DuckDB's closed-form pixel
#     arithmetic), multimodal_wav_decode_features (RIFF/WAVE PCM, encoder
#     cross-checked against the stdlib wave reader), and
#     multimodal_y4m_frame_sample (YUV4MPEG2 frame fan-out, frames
#     sha-matched byte-for-byte) — and warc_ingest_roundtrip (the
#     Common-Crawl WARC source: real per-record-gzip archives written by
#     foreachPartition, read back through the binaryFile + Arrow record
#     walk, status/length/sha hash-matched to the documents table) — and
#     url_canonical_dedup (URL-level crawl dedup; the oracle states the
#     expected canonical string INDEPENDENTLY from doc_id arithmetic) —
#     and jsonl_ingest_roundtrip (gzipped JSON-Lines interchange,
#     schema-first nested read, corrupt-record gate asserted empty).
# (b) the query whose implementation changed this round:
#     embedding_neardup_pairs (ADVICE-high fix: the in-bucket GEMM's
#     off-diagonal blocks now order-NORMALIZE pairs instead of
#     order-filtering, so super-block buckets keep cross-block pairs;
#     sub-block outputs — including every gate dataset — are unchanged;
#     bucket dispatch also moved from per-group applyInPandas to
#     partition-sorted mapInPandas runs). VERDICT item 4's md5 gram-key
#     swap for exact_substring_dedup_spans was implemented, A/B-measured
#     13% SLOWER at 100x (compression already eats the text-gram
#     redundancy; digests are incompressible), and REVERTED — the
#     operator is byte-identical to its r11-green form, so it returns
#     its window slot.
# (c) the ENTIRE 42-member r7-stale cohort (VERDICT item 2 — after this
#     window no query's evidence is older than r8).
# The r8 cohort members that briefly held (d) slots this round all
# ceded them to the new registrations (cdc_apply_changes_txn,
# bpe_learned_merges, bm25_doc_ranking, bloom_point_lookup_txn,
# asof_join_forward_window); the r8 tail rotation resumes next round.
_GATE_PRIORITY = [
    # (a) never-evidenced / new registrations
    "streaming_minhash_online_admission",
    "multimodal_png_decode_features",
    "multimodal_wav_decode_features",
    "multimodal_y4m_frame_sample",
    "warc_ingest_roundtrip",
    "url_canonical_dedup",
    "jsonl_ingest_roundtrip",
    # (b) implementation changed this round
    "embedding_neardup_pairs",
    # (c) the full r7-stale cohort (alphabetical)
    "cdc_row_changes_bucketed_txn",
    "cdc_row_changes_txn",
    "count_distinct_pagination",
    "cross_join_param_grid",
    "customer_order_histogram",
    "deterministic_sample_split",
    "doc_text_normalize",
    "embedding_kmeans_cells",
    "events_hourly_tumbling",
    "events_ohlc_hourly",
    "events_session_streaming",
    "events_session_window",
    "events_sliding_streaming",
    "events_sliding_windows",
    "events_stream_stream_join",
    "events_streaming_dedup",
    "events_user_zscore",
    "funnel_click_to_purchase",
    "group_share_threshold",
    "large_order_customers",
    "latest_event_per_user",
    "llm_corpus_prep",
    "minhash_neardup_pairs",
    "multimodal_binary_features",
    "multimodal_corpus_prep",
    "order_flow_pagerank_redistribute",
    "pricing_summary",
    "promo_revenue_ratio",
    "range_join_followups",
    "robust_stats_mad",
    "salted_groupby_skewed",
    "scalar_json_pack",
    "scalar_misc_pack",
    "semantic_dedup_embeddings",
    "small_quantity_revenue",
    "sorted_page_offset",
    "stats_regression_pack",
    "stratified_sample_per_lang",
    "tfidf_top_terms",
    "top_revenue_suppliers",
    "value_histogram_bins",
    "window_moving_average",
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
