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

# Round-15 window (registry 254, window 50). Evidence going in: r14 went
# 50/50 green (CORRECTNESS_r14); latest-evidence join over
# CORRECTNESS_r01-r14 on the live registry (counting clean rows-only
# rows): histogram r9:12 / r10:47 / r11:46 / r12:47 / r13:46 / r14:50,
# with the 6 rows-only tokenizer/kmeans rows carrying only pre-r12
# rows-only evidence by design. 6 + 24 + 12 + 8 = 50, ordered so the
# driver's oracle verifies BOTH optimization rounds' own changes first
# (VERDICT r14 item 1 and ADVICE: the r14 window rotated toward stale
# queries and missed the round's optimizer-touched set entirely):
# (a) the 6 queries whose implementation changed in r15 (optimization
#     round 2): exact_substring_dedup_spans (gram multiplicity as one
#     count() window — one gram-build pass), order_flow_pagerank_
#     redistribute (per-round dangling mass observed on the round's own
#     materialization), both pagerank gate rows (shared setup), and the
#     three incremental_*_indexed_dedup lifecycles (batch 1 signed once,
#     shared by probe + admission append).
# (b) the 24 r14-optimizer-touched queries the r14 window missed —
#     pricing/profile/CMS/bloom/Q21 exec-side batch, the centroid/PQ
#     parsed-SQL consumers, the steady admission family, the LSH
#     signature builders' pair queries, events_time_weighted_value, and
#     the fingerprint-pair + quality_score consumers (window-df pruning,
#     batch-5 parsed quality_score).
# (c) the 12 r9-stale members deferred from the r14 window, as promised
#     there (embedding family, persisted-ANN lifecycle, streaming,
#     sketch; semantic_dedup_kmeans_cells + embedding_whitening_topk are
#     rows-only by design).
# (d) 8 of the r10-stale cohort (alphabetical; several other r10-stale
#     members — column_profile_orders, waiting_supplier_report,
#     embedding_pq_topk, nearest_centroid_confusion — already sit in (b);
#     the remainder rotates in next round).
_GATE_PRIORITY = [
    # (a) implementation changed THIS round (r15) — optimizer-touched
    # queries gate in the same round they change (r14 ADVICE):
    # exact_substring_spans' gram-window multiplicity, the pagerank
    # redistribute observe scheme, the sign-once incremental lifecycle
    # composition, and the graph setup shared by both pagerank modes.
    "exact_substring_dedup_spans",
    "order_flow_pagerank_redistribute",
    "order_flow_pagerank",
    "incremental_indexed_dedup",
    "incremental_minhash_indexed_dedup",
    "incremental_simhash_indexed_dedup",
    # (b) r14-optimizer-touched queries the r14 window missed (VERDICT
    # r14 item 1 — their correctness rested on r13 rows + local checks;
    # the driver's oracle closes the loop here), plus the r14-touched
    # fingerprint-pair/quality_score consumers in the same position.
    "pricing_summary",
    "stats_regression_pack",
    "column_profile_orders",
    "cms_term_frequencies",
    "bloom_prefilter_supplier_revenue",
    "waiting_supplier_report",
    "nearest_centroid_confusion",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "semantic_dedup_embeddings",
    "fpindex_steady_admission",
    "lshindex_steady_admission",
    "ann_index_steady_probe",
    "online_admission_intra_batch",
    "minhash_neardup_pairs",
    "simhash_neardup_pairs",
    "minhash_portable_neardup_pairs",
    "simhash_portable_neardup_pairs",
    "events_time_weighted_value",
    "dedup_keep_best_quality",
    "winnowing_containment_pairs",
    "dedup_pipeline_winnowing",
    "leakage_safe_split_stats",
    "quality_top_fraction_per_lang",
    # (c) the 12 r9-stale members deferred from the r14 window (as
    # promised there — embedding family + streaming + sketch stand-ins
    # have been carrying their evidence since r9).
    "approx_distinct_sketch",
    "embedding_ann_index_topk",
    "embedding_ann_index_txn_lifecycle",
    "embedding_binary_hamming_topk",
    "embedding_hard_negatives",
    "embedding_ivfpq_topk",
    "embedding_matryoshka_topk",
    "embedding_random_projection",
    "embedding_topk",
    "embedding_whitening_topk",
    "events_hourly_streaming",
    "semantic_dedup_kmeans_cells",
    # (d) 8 of the r10-stale cohort (alphabetical; the rest rotate in
    # next round — several r10-stale members already sit in (a)/(b)).
    "approx_topk_native",
    "argmin_supplier_per_part",
    "array_hof_pack",
    "array_set_ops_pack",
    "badwords_filter_report",
    "bitmap_exact_distinct",
    "cdc_appends_since_txn",
    "conditional_aggregates",
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
