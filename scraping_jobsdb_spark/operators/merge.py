"""Merge / fill-if-null update (the salary-imputation pattern).

The reference's core analytic is a two-step Postgres flow (SURVEY.md §3.3):

1. A1 — ``SELECT job_id, min(salary_min) AS min_salary, max(salary_max) AS
   max_salary FROM raw.raw_scraped_url GROUP BY job_id``
   (``sql/impute_salary_create_salary_table.sql:3-9``): the tightest salary
   interval implied by all search-band memberships of a job.
2. J2 — ``UPDATE staging.parsed_jobs SET ... FROM staging.imputed_salary
   WHERE job_id matches AND target IS NULL``
   (``sql/impute_salary_update_parsed_jobs_table.sql:1-7``).

Spark has no in-place UPDATE; the engine expresses the merge declaratively as
left-join + ``coalesce(target, source)`` and rewrites the table. That is the
same logical result with a plan Catalyst fully optimizes (partial/final hash
aggregation for step 1; broadcast of the aggregated side when small for
step 2 — the aggregate output is one row per key, usually far smaller than
the fact table it merges into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["coalesce_merge"]


def coalesce_merge(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    fill_cols: dict[str, str],
) -> DataFrame:
    """Left-join ``source`` onto ``target`` and fill NULL target columns.

    ``fill_cols`` maps target column -> source column. Only NULL target values
    are replaced (the reference's ``WHERE min_salary IS NULL AND max_salary IS
    NULL`` guard, generalized per-column). Non-key target columns keep their
    values; rows with no source match are untouched.
    """
    src_cols = set(fill_cols.values())
    src = source.select(*key_cols, *src_cols)
    joined = target.join(src, on=key_cols, how="left")
    out_cols = []
    for c in target.columns:
        if c in fill_cols:
            out_cols.append(F.coalesce(target[c], src[fill_cols[c]]).alias(c))
        else:
            out_cols.append(target[c])
    return joined.select(*out_cols)
