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

__all__ = ["salted_groupby", "salted_join", "write_bucketed", "bloom_prefilter_join", "key_skew_report"]

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


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    bits: int = 1 << 20,
    probes: int = 4,
) -> DataFrame:
    """Join ``big ⋈ small`` with a Bloom-filter pre-filter on the big side —
    the runtime-filter pattern for the regime where ``small`` is too large
    to broadcast as an exact hash relation but its KEY SET sketches into a
    bitset of ``bits`` bits. The big side is filtered map-side BEFORE its
    shuffle, so the exchange moves only rows whose key might match: at a
    1% join selectivity that is a ~100× cut of the dominant shuffle, the
    same effect Spark's own (off-by-default, threshold-gated) runtime
    bloom-filter injection targets — here explicit, deterministic, and
    available to any join the caller chooses.

    Mechanics: one aggregate over ``small`` collects the DISTINCT probe
    positions of its keys, the driver packs them into a ``bits/8``-byte
    bitset, and the bitset rides the plan as ONE binary literal (a single
    py4j call and one task-binary shipment — never a per-element literal
    array). The big side's membership test is pure JVM expression work:
    per probe, one dynamic one-byte ``substring`` of the literal +
    hex→int + bit shift. Positions come from ``xxhash64(key, probe_seed)``
    (native, codegen, no digest string), NOT the md5 construction the
    CMS/txn Bloom index share: those sketches are PERSISTED/ORACLED and
    need engine portability, while this bitset lives only inside one plan
    — and the probe runs on EVERY big-side row, so its per-row cost is
    the scan stage at 100 TB (measured r14: the md5 form was ~4× the
    whole-stage CPU of the xxhash64 form). The key is still stringified
    first so both sides hash identical bytes even when their column
    types differ (int vs bigint keys).

    EXACTNESS: a Bloom filter has no false negatives, and every false
    positive is eliminated by the real join that follows — the result is
    row-identical to ``big.join(small, on, how)`` (oracle-checkable).
    Allowed ``how``: ``inner`` and ``left_semi`` (big-side-preserving
    joins would be broken by the filter: a big row with no match must
    survive a left join, but the filter drops it). The collected position
    set is bounded by ``min(|small keys| × probes, bits)`` ints — size the
    bitset so bits ≪ driver memory; 2^20 bits = 128 KB packed.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi, got {how!r} "
            "(big-side-preserving joins would drop unmatched big rows)"
        )
    if bits % 8:
        raise ValueError(f"bits must be a multiple of 8, got {bits}")

    def probe_positions(col: Column, n_probes: int, width: int) -> list[Column]:
        # one native 64-bit hash per probe; pmod keeps positions in [0, width)
        return [
            F.pmod(F.xxhash64(col, F.lit(s)), F.lit(width)).cast("bigint")
            for s in range(n_probes)
        ]

    key = F.col(on).cast("string")
    # NULL small-side keys never match an inner/left_semi join, so dropping
    # them before probe collection is semantics-preserving — and required:
    # xxhash64 hashes a NULL input as just its seed (non-NULL result), so
    # an unfiltered NULL key would set real bits and loosen the filter for
    # every big-side row colliding with those positions.
    pos_rows = (
        small.filter(F.col(on).isNotNull())
        .select(
            F.explode(F.array(*probe_positions(key, probes, bits))).alias("p")
        )
        .distinct()
        .collect()
    )
    bitset = bytearray(bits // 8)
    for r in pos_rows:
        p = int(r.p)
        bitset[p // 8] |= 1 << (p % 8)
    bf = F.lit(bytes(bitset))

    def bit_is_set(pos: Column) -> Column:
        byte_val = F.conv(
            F.hex(F.substring(bf, (pos / 8).cast("int") + 1, 1)), 16, 10
        ).cast("int")
        # shiftright() only takes a literal shift — divide by 2^bit instead
        # (exact: byte_val <= 255, 2^bit <= 128 are both exact doubles)
        bit_weight = F.pow(F.lit(2.0), (pos % 8).cast("double")).cast("int")
        return (F.floor(byte_val / bit_weight).cast("int") % 2) == 1
    test = None
    for p in probe_positions(key, probes, bits):
        t = bit_is_set(p)
        test = t if test is None else test & t
    return big.filter(test).join(small, on, how)


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    k: int = 20,
) -> DataFrame:
    """Skew diagnostics for a prospective shuffle key: the top-``k``
    heaviest key values with their row counts, share of the table, and
    ratio to the MEAN key load — the numbers that decide whether a
    groupBy/join on these columns needs ``salted_groupby``/``salted_join``
    /AQE skew handling (ratio ≫ 1 for any hot key ⇒ one straggler reducer
    at scale). One aggregate on the key + one tiny ordered limit; the
    global totals ride a single-row broadcast join, so the whole report
    costs one shuffle of key-count rows. All arithmetic on exact integer
    counts (shares/ratios derived per row) — fully oracle-able.

    Output: key cols + ``n_rows``, ``share`` (fraction of all rows),
    ``skew_ratio`` (n_rows ÷ mean rows per distinct key), ordered
    (n_rows desc, keys asc)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = F.broadcast(
        counts.agg(
            F.sum("n_rows").alias("__total"),
            F.count(F.lit(1)).alias("__distinct"),
        )
    )
    return (
        counts.crossJoin(totals)
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
            (F.col("n_rows") * F.col("__distinct") / F.col("__total")).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
    )
