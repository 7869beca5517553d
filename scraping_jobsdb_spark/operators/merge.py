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

__all__ = ["coalesce_merge", "scd2_merge"]


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


def scd2_merge(
    current: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge, expressed declaratively.

    ``current`` is the versioned dimension (one open row per key:
    ``end_col`` NULL, ``current_flag`` true, possibly closed history rows);
    ``incoming`` carries at most one new observation per key with its
    ``effective_col`` timestamp. Result:

    - history rows (already closed) pass through untouched;
    - an open row whose tracked values CHANGED closes (``end_col`` = the
      incoming effective timestamp, flag false) and a new open row appears;
    - an open row whose tracked values are unchanged stays open (no
      spurious versions);
    - a brand-new key simply inserts its open row.

    One left join of current ↔ incoming on the keys plus one anti-join for
    new keys — no per-row updates, the whole table rewrite is one plan (the
    same overwrite discipline as ``pipelines/impute``). At scale the
    incoming batch is the small side and broadcasts.
    """
    inc = incoming.select(
        *[F.col(c).alias(f"__in_{c}") for c in incoming.columns]
    )
    cond = None
    for k in key_cols:
        eq = current[k] == inc[f"__in_{k}"]
        cond = eq if cond is None else (cond & eq)
    joined = current.join(inc, cond, "left")

    changed = None
    for c in tracked_cols:
        ne = ~F.col(c).eqNullSafe(F.col(f"__in_{c}"))
        changed = ne if changed is None else (changed | ne)
    has_inc = F.col(f"__in_{key_cols[0]}").isNotNull()
    is_open = F.col(current_flag)

    closing = is_open & has_inc & changed
    out_cols = []
    for c in current.columns:
        if c == end_col:
            out_cols.append(
                F.when(closing, F.col(f"__in_{effective_col}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        elif c == current_flag:
            out_cols.append(
                F.when(closing, F.lit(False)).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    kept = joined.select(*out_cols)

    # new open versions: changed keys (from the close step) + brand-new keys
    changed_keys = (
        joined.filter(is_open & has_inc & changed)
        .select(*[F.col(f"__in_{c}").alias(c) for c in incoming.columns])
    )
    new_keys = incoming.join(
        current.filter(F.col(current_flag)).select(*key_cols), key_cols, "left_anti"
    )
    inserts = changed_keys.unionByName(new_keys).select(
        *key_cols,
        *tracked_cols,
        F.col(effective_col),
        F.lit(None).cast(current.schema[end_col].dataType).alias(end_col),
        F.lit(True).alias(current_flag),
    )
    return kept.unionByName(inserts)
