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

# Round-11 window (registry 235, window 50). Evidence going in (latest-
# evidence join over CORRECTNESS_r01-r10): r10 went 49 green + 1 clean
# rows-only, 0 red; histogram r6:38 / r7:46 / r8:49 / r9:49 / r10:50, plus
# jdbc_live_roundtrip registered after the r10 window froze with no driver
# row yet. 4 + 1 + 38 + 7 = 50 exactly:
# (a) the 4 queries with no evidence: the live Derby JDBC roundtrip (S5/S6
#     flipped to full) and the new persisted LSH signature-index trio
#     (VERDICT r10 item 4 — operators/lshindex.py: MinHash batch
#     admission + streaming twin + SimHash Hamming-space admission).
# (b) dedup_pipeline_end_to_end — PROMOTED to a full value-hash oracle
#     (VERDICT r10 item 3: candidate stage swapped to the portable
#     md5-window MinHash banding); its last row is rows-only r7, so the
#     promotion needs a fresh hash-green row.
# (c) the ENTIRE 38-member r6-stale cohort (VERDICT r10 item 2 — after
#     this window no query's evidence is older than r7).
# (d) the two queries whose implementation changed this round —
#     curriculum_pack_order (the scored projection is checkpointed once
#     and global_ordered_rank skips its second materialization; hash
#     verified unchanged locally) and hll_mergeable_sketches (PROMOTED to
#     a full value-hash oracle in the portable-register domain, VERDICT
#     r10 item 3 stretch; rows-only 10 → 9) and
#     simhash_portable_neardup_pairs (now rides the exact-parity Arrow
#     vote kernel, simhash_fp_frame), and the NEW
#     exact_substring_dedup_spans (the Lee-et-al ExactSubstr method as
#     duplicated-L-window interval merge, fully oracled) — plus the 3
#     alphabetically-first members of the 45-query r7 cohort
#     (dedup_pipeline_end_to_end was also r7 but sits in (b);
#     count_distinct_pagination, cdc_row_changes_txn and
#     cdc_row_changes_bucketed_txn ceded their slots to this round's
#     registrations; the tail rotation continues next round).
_GATE_PRIORITY = [
    # (a) never-evidenced / new registrations
    "jdbc_live_roundtrip",
    "incremental_minhash_indexed_dedup",
    "streaming_minhash_indexed_dedup",
    "incremental_simhash_indexed_dedup",
    # (b) implementation changed: promoted to a value-hash oracle
    "dedup_pipeline_end_to_end",
    # (c) the full r6-stale cohort (alphabetical)
    "disjunctive_pred_revenue",
    "doc_winnowing_fingerprints",
    "dq_aggregate_checks",
    "dq_bounds_observed",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_exact_gemm",
    "explode_outer_null_preserving",
    "explode_token_positions",
    "gaps_and_islands",
    "grouping_sets_status_priority",
    "impute_interval_merge",
    "inactive_wealthy_customers",
    "incremental_indexed_dedup",
    "join_full_outer_reconcile",
    "key_skew_report_suppkey",
    "order_flow_pagerank",
    "pandas_udf_token_count",
    "percentile_part_sizes",
    "pivot_priority_by_status",
    "product_type_profit",
    "reference_pipeline_e2e",
    "regexp_extract_all_pack",
    "scalar_date_arith_pack",
    "scalar_map_pack",
    "scalar_string_distance_pack",
    "scd2_supplier_balances",
    "sequence_packing_per_shard",
    "simhash_neardup_pairs",
    "suppliers_with_heavy_shipments",
    "term_document_frequency",
    "try_cast_error_safe_pack",
    "txn_deletion_vectors",
    "txn_mor_update",
    "txn_replace_where_backfill",
    "txn_update_where",
    "unpivot_quality_metrics",
    "window_distribution_pack",
    "window_range_frame",
    # (d) changed/new this round + r7 cohort, alphabetical first 3
    "curriculum_pack_order",
    "hll_mergeable_sketches",
    "simhash_portable_neardup_pairs",
    "exact_substring_dedup_spans",
    "asof_join_latest_state",
    "bloom_prefilter_supplier_revenue",
    "bpe_corpus_tokenize",
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
