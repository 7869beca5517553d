"""Incremental-batch operators: process only what hasn't been processed.

The reference expresses incrementality three ways (SURVEY.md §2.3-§2.4):

- J1: ``LEFT OUTER JOIN ... WHERE right.key IS NULL``
  (``sql/scrape_url_create_scraped_job_table.sql:10-15``)
- J3/P4: ``WHERE job_id NOT IN (SELECT job_id FROM staging.parsed_jobs)``
  pushed into Postgres via the JDBC query option (``spark/ParseHtml.py:26-30``)
- P3: a ``file_path IS NULL`` work-queue scan (``scrape_url.py:274``)

All three are the same logical operator: an anti-join of candidates against
the processed set. ``NOT IN`` and ``LEFT ANTI`` differ when the subquery side
contains NULL keys (NOT IN yields no rows); the engine's keys are declared
NOT NULL so the anti-join form is semantics-preserving — and unlike NOT IN it
never degenerates into a nested-loop against a NULL-laden build side.

Scale posture: Catalyst rewrites this to broadcast-hash anti when the
processed-set *keys* fit in memory (they're pruned to key columns only), else
shuffled-hash/sort-merge anti; AQE picks at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["new_rows"]


def new_rows(candidates: DataFrame, processed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of ``candidates`` whose key does not appear in ``processed``.

    The processed side is only column-pruned, NOT deduplicated: an anti-join
    is insensitive to duplicate build-side keys, and a pre-dedup would cost a
    full extra shuffle+aggregate of the processed set at scale."""
    return candidates.join(processed.select(*key_cols), on=key_cols, how="left_anti")
