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

# Round-10 window (registry 232, window 50). Evidence going in (latest-
# evidence join over CORRECTNESS_r01-r09): r9 went 47 green + 2 declared
# rows-only + 1 RED (unigram_corpus_tokenize crashed the driver's pandas
# canonicalizer on its array<string> column); histogram r5:22 / r6:45 /
# r7:47 / r8:49 / r9:50, plus 18 queries registered after the r9 window
# froze with NO driver row yet. 1 + 18 + 2 + 1 + 22 + 6 = 50 exactly:
# (a) unigram_corpus_tokenize — the r9 red, output scalarized to
#     (doc_id, n_tokens, tok_head) exactly as bpe_corpus_tokenize; leads
#     the window so the fix gets a clean rows-only row (VERDICT r9 item 1).
# (b) the 18 never-evidenced r9 registrations (VERDICT r9 item 2):
#     curation/eval wave, graph/monitoring wave, the analytic/layout/
#     exact-aggregation/layout-planning pairs, the time-travel audit, the
#     streaming index twin and the rolling median.
# (c) embedding_pq_topk + embedding_quantized_topk PROMOTED to full
#     value-hash oracles this round (VERDICT r9 item 3: the exhaustive-PQ
#     int8-codebook form and the fixed-pow2-scale dequantize form;
#     rows-only 13 -> 11).
# (d) range_partition_balance_approx — REGISTERED this round (VERDICT r9
#     item 6, the percentile_approx production twin, invariant-style
#     oracle), windowed immediately so no registration carries 'never'
#     evidence.
# (e) the remaining 22 members of the r5-stale cohort (alphabetically
#     last; after this window NO query has pre-r6 evidence).
# (f) the 6 alphabetically-first members of the 45-query r6 cohort
#     (VERDICT r9 item 7 — the tail rotation continues; embedding_pq_topk
#     was also r6 but sits in (c)).
_GATE_PRIORITY = [
    # (a) the r9 red, fixed
    "unigram_corpus_tokenize",
    # (b) never driver-evidenced r9 registrations
    "retrieval_eval_metrics",
    "dictionary_phrase_tagging",
    "badwords_filter_report",
    "events_ewma_smoothing",
    "curriculum_pack_order",
    "graph_triangle_count",
    "events_anomaly_mad",
    "kmv_set_operations",
    "doc_langid_trigram",
    "waiting_supplier_report",
    "zorder_layout_stats",
    "bitmap_exact_distinct",
    "column_profile_orders",
    "range_partition_balance_report",
    "approx_topk_native",
    "txn_time_travel_audit",
    "streaming_indexed_dedup",
    "events_rolling_median",
    # (c) promoted to full oracles this round
    "embedding_pq_topk",
    "embedding_quantized_topk",
    # (d) new registration this round
    "range_partition_balance_approx",
    # (e) r5-stale cohort, the remaining 22
    "join_semi",
    "lateral_topn_per_key",
    "multimodal_frame_sample",
    "multimodal_resize_stage",
    "neardup_components",
    "nearest_centroid_confusion",
    "project_select",
    "returned_items_by_nation",
    "rollup_status_priority",
    "scalar_string_pack",
    "scalar_subquery_above_total_avg",
    "sequence_packing_stream",
    "set_intersect_except",
    "set_union_all",
    "simhash_portable_neardup_pairs",
    "sql_surface_revenue_by_nation",
    "supplier_count_by_parttype",
    "topk_orders",
    "upsert_new_keys",
    "window_rank_navigation",
    "window_running_sum",
    "work_queue_isnull",
    # (f) r6 cohort, alphabetical first 6
    "argmin_supplier_per_part",
    "array_hof_pack",
    "array_set_ops_pack",
    "cdc_appends_since_txn",
    "conditional_aggregates",
    "decontamination_exact_overlap",
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
