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
