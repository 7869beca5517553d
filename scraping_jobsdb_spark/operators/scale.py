"""Skew and co-location tools for the 100 TB posture.

The reference never meets skew (its keys are job_ids from one job board) and
co-locates nothing (every join runs inside Postgres). At lake scale both
dominate:

- **Skewed aggregation**: one hot key (a boilerplate document, a bot user)
  funnels into one reducer. ``salted_groupby`` splits every key across
  ``n_salts`` partial groups, aggregates, then combines — two small shuffles
  instead of one stuck straggler. AQE's ``skewJoin`` handles the join case
  automatically; aggregation skew needs this explicit rewrite.
- **Skewed join**: ``salted_join`` replicates the small side ``n_salts``
  times and salts the big side, so a hot join key spreads over ``n_salts``
  tasks. Use when the small side is too big to broadcast but small enough to
  replicate.
- **Co-located join**: ``write_bucketed`` persists both sides hash-bucketed
  on the join key; subsequent joins read bucket-aligned splits and skip the
  exchange entirely (verified in tests by asserting no Exchange in the
  physical plan). This is the ahead-of-time version of what
  ``fan_out(cols=...)`` does per-query.

All salting here is deterministic (hash-derived, not ``rand()``) so salted
plans stay replayable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["salted_groupby", "salted_join", "write_bucketed"]

# How each algebraic aggregate combines its partial results.
_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation immune to key skew.

    ``aggs`` is a list of (out_name, func, col) with func in
    {sum, count, min, max} — the algebraic aggregates, which re-combine
    losslessly. Phase 1 groups by (keys + salt) so a hot key's rows spread
    over ``n_salts`` reducers; phase 2 combines the ≤ n_salts partials per
    key. ``salt_source`` (default: first agg column) feeds the deterministic
    hash salt.

    sums should be decimal-cast upstream when exact cross-engine results are
    required (same contract as every other aggregate in the engine).
    """
    for _, func, _ in aggs:
        if func not in _COMBINERS:
            raise ValueError(f"non-algebraic aggregate {func!r} cannot be salted")
    src = salt_source or aggs[0][2]
    salt = F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            (F.count(F.lit(1)) if func == "count" else getattr(F, func)(col)).alias(
                f"__p_{out}"
            )
            for out, func, col in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINERS[func](f"__p_{out}").alias(out)
            for out, func, _ in aggs
        ]
    )


#: Join types whose semantics survive small-side replication: each big row
#: carries exactly one salt, so it meets each matching small row exactly once
#: (inner/left) or tests membership against the full small set (semi/anti).
#: right/full would emit every UNMATCHED small row once per replica — broken.
_SALTABLE_JOINS = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join that spreads hot keys over ``n_salts`` tasks.

    The big side gets a deterministic salt in [0, n_salts); the small side is
    replicated once per salt value (explode of a literal sequence), and the
    join key becomes (on + salt). Row-for-row identical to ``big.join(small,
    on, how)`` for the supported join types — every big row still meets every
    matching small row exactly once. Replication multiplies the small side's
    shuffle volume by ``n_salts``: use broadcast when it fits, this when it
    doesn't.

    The salt must vary WITHIN a key for the skew spreading to happen, so it
    is derived from every big-side column (``salt_source`` overrides — pass a
    row-varying expression, never the join key alone). ``how`` is restricted
    to inner/left/semi/anti: right/full outer would emit unmatched small-side
    rows once per replica.
    """
    if how not in _SALTABLE_JOINS:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "replicating the small side would duplicate its unmatched rows"
        )
    src = salt_source if salt_source is not None else F.xxhash64(*[F.col(c) for c in big.columns])
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(src), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return salted_big.join(replicated, on=[*on, "__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist hash-bucketed (and optionally sorted) on the join/agg key.

    Two tables bucketed on the same key with the same bucket count join
    without any exchange — the ahead-of-time co-location that pays for itself
    the second time the key is joined. Sorting within buckets additionally
    removes the sort of a sort-merge join.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
