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

# Round-9 window (registry 213, window 50). Evidence going in (latest-
# evidence join over CORRECTNESS_r01-r08): r8 went 47 green + 3 declared
# rows-only, zero red; histogram r4:1 / r5:44 / r6:47 / r7:47 / r8:50, plus
# 24 queries registered after the r8 window froze with NO driver row yet
# (VERDICT r8 "Missing" item 1). 1 + 24 + 3 + 22 = 50 exactly:
# (a) approx_distinct_sketch — the one r4 holdover (VERDICT r8 item 2),
#     REFRESHED this round from a rows-only approx_count_distinct wrapper
#     to a FULLY-ORACLED portable form (HLL estimate over hll_build
#     registers + exact-division KMV estimate + hash-sample rank
#     percentiles); leads the window so the refresh gets value evidence.
# (b) the 24 never-evidenced r8 registrations (VERDICT r8 item 1),
#     quality/curation wave first (the compositions a training-data user
#     runs daily), then retrieval/embedding, tokenizers, SemDeDup
#     production regime, governance.
# (c) the three ANN queries PROMOTED to full oracles this round (VERDICT
#     r8 item 4: ivfpq + persisted index + txn lifecycle now share the
#     int8-domain SQL-derivable-quantizer oracle; rows-only 17 -> 14) —
#     re-evidenced at value level even though their rows are r8-fresh,
#     because their implementations changed this round (item 5's
#     lifecycle job-count cuts included).
# (d) the 22 alphabetically-first members of the 44-query r5-stale cohort
#     (after this window the oldest evidence is r5 for the remaining 22,
#     which lead r10 — the histogram tail shortens monotonically).
_GATE_PRIORITY = [
    # (a) the r4 holdover, refreshed to fully-oracled
    "approx_distinct_sketch",
    # (b) never driver-evidenced r8 registrations: quality/curation wave
    "quality_classifier_nb",
    "dsir_importance_sample",
    "doc_boilerplate_removal",
    "temperature_mixture_corpus",
    "quality_ensemble_verdicts",
    "doc_quality_streaming",
    "doc_perplexity_buckets",
    "doc_token_entropy",
    "corpus_pmi_pairs",
    "lang_kl_divergence",
    # retrieval / embedding wave
    "hybrid_rrf_retrieval",
    "embedding_random_projection",
    "embedding_hard_negatives",
    "embedding_matryoshka_topk",
    "embedding_whitening_topk",
    "embedding_binary_hamming_topk",
    # tokenizer completions
    "wordpiece_corpus_tokenize",
    "unigram_corpus_tokenize",
    "unigram_seed_candidates",
    # SemDeDup production regime
    "semantic_dedup_kmeans_cells",
    # governance / DQ / ML-ops wave
    "k_anonymity_report",
    "referential_integrity_report",
    "events_value_psi_daily",
    "attribution_last_touch",
    # (c) ANN trio promoted to full oracles this round
    "embedding_ivfpq_topk",
    "embedding_ann_index_topk",
    "embedding_ann_index_txn_lifecycle",
    # (d) r5-stale cohort, alphabetical first 22
    "anti_join_not_in",
    "bpe_merge_candidates",
    "corpus_to_training_examples",
    "cube_flag_status",
    "dedup_distinct_on",
    "doc_exact_dedup",
    "doc_fingerprint",
    "doc_lang_quality",
    "doc_ngram_jaccard",
    "doc_text_stats",
    "domain_cap_sample",
    "embedding_topk",
    "epoch_repeat_expansion",
    "events_hourly_streaming",
    "exists_order_priority_count",
    "forecast_revenue_delta",
    "group_by_all_rollup",
    "groupby_min_max",
    "grouped_sorted_list",
    "incremental_batch_dedup",
    "join_dims_broadcast",
    "join_left_outer_agg",
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
