"""Temporal joins Spark lacks as primitives: as-of and interval-range joins.

Neither exists in the reference (its joins are equi-joins, SURVEY.md §2.3) or
in Spark's built-in surface; both are staples of event/market data work and
of joining scraped observations to slowly-changing metadata.

- **As-of join**: for each left row, the single latest right row with
  ``right.ts <= left.ts`` within the key. Implemented as the union-sort
  trick: tag both sides, sort (key, ts, side) once, and carry the last seen
  right value forward with ``last(..., ignorenulls=True)`` over an unbounded
  preceding frame — ONE shuffle on the key, no range explosion, no
  per-row probing. This beats the naive join-then-filter-then-rank form,
  which shuffles the full candidate cross product per key.
- **Range join**: pair rows whose timestamps fall within a bounded window of
  each other. Implemented by bucketing both sides to the window granularity
  and joining on (key, bucket) ∪ (key, bucket±1) then refining — the
  standard banding that turns an O(n·m) theta join into an equi-join the
  planner can hash. The bucket join is exact, never approximate: banding
  only prunes candidates, the precise predicate still applies.

Determinism: as-of ties (equal right ts) resolve by the greatest tiebreak
column; range-join output is a set of (left, right) pairs — both
reproducible at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_join",
    "time_weighted_mean",
    "gap_fill",
    "value_psi_by_day",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right values at-or-before
    (``direction="backward"``, the default) or at-or-after
    (``direction="forward"``) its timestamp — NULLs where no right row
    qualifies. ``tolerance_seconds`` bounds the match age (fractional
    seconds): a carried match further than the tolerance nulls out (the
    pandas ``merge_asof`` surface, distributed). Matching is ROW-level:
    the nearest qualifying right row's values attach even when some are
    NULL — a nearer null-valued observation is not skipped in favor of a
    staler non-null one (merge_asof / SQL ASOF JOIN semantics).

    Plan: union(tagged left, tagged right) → one hash shuffle on ``key`` →
    per-key sort by (ts, side, tiebreak) with right rows ordered BEFORE left
    rows at equal timestamps (an exactly-simultaneous right row is visible) →
    ``last(value, ignorenulls)`` over rows unbounded preceding → keep left
    rows. Forward is the same scan with the timestamp order reversed; the
    tolerance is a pure map post-pass on the carried right timestamp. State
    per task is one row of carried values — O(1) memory beyond the sort,
    linear scan, no candidate explosion in any variant.

    Determinism: multiple right rows with equal (key, ts) resolve to the one
    with the GREATEST ``tiebreak_cols`` tuple (default: the value columns
    themselves) — the sort places it last, so ``last()`` carries it. Pass an
    explicit unique right-side column when value columns can tie.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    tb_cols = tiebreak_cols if tiebreak_cols is not None else value_cols
    # The tiebreak struct exists on both sides of the union (typed NULLs on
    # the left) so the window can order by it; only right-right ties at equal
    # ts are affected — __side already orders right before left.
    tb_right = F.struct(
        *[F.col(c).alias(f"t{i}") for i, c in enumerate(tb_cols)]
    )
    tb_left = F.struct(
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"t{i}")
            for i, c in enumerate(tb_cols)
        ]
    )
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        tb_left.alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb_right.alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side"), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the last right ROW as one struct: its timestamp and its values
    # stay together, so a nearer right row with a NULL value correctly
    # yields NULL (pandas merge_asof and SQL ASOF JOIN semantics) instead
    # of resurrecting a staler non-null value; a single internal alias
    # also cannot collide with a value column named 'ts'.
    row_struct = F.struct(
        F.col("__ts").alias("t"),
        *[F.col(f"__r_{c}").alias(f"v_{c}") for c in value_cols],
    )
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("__side") == 0, row_struct), ignorenulls=True)
        .over(w)
        .alias("__asof_row"),
    )
    matched = F.col("__asof_row").isNotNull()
    if tolerance_seconds is None:
        within = matched
    else:
        # fractional seconds on BOTH sides (timestamp→double is exact
        # microsecond epoch); unix_timestamp truncates to whole seconds
        # and would admit matches up to ~1s past the tolerance, diverging
        # from an oracle computing fractional epoch()
        age = (
            F.col("__ts").cast("double") - F.col("__asof_row.t").cast("double")
            if direction == "backward"
            else F.col("__asof_row.t").cast("double")
            - F.col("__ts").cast("double")
        )
        within = matched & (age <= tolerance_seconds)
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[
            F.when(within, F.col(f"__asof_row.v_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """All (left, right) pairs within the key where
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Banding: both sides bucketed at ``width = upper - lower`` granularity;
    a qualifying right row can only land in the left row's bucket or the two
    adjacent ones, so the theta join becomes an equi-join on (key, bucket)
    over three shifted copies of the left side, refined by the exact
    predicate. Candidate volume is bounded by bucket occupancy, not n·m.
    """
    width = max(1, upper_seconds - lower_seconds)
    lefts = left.select(
        F.col(key).alias("__lk"),
        F.col(left_ts).alias("left_ts"),
        F.floor((F.unix_timestamp(F.col(left_ts)) + lower_seconds) / width).alias(
            "__b0"
        ),
    )
    shifted = None
    for d in (-1, 0, 1):
        part = lefts.select("__lk", "left_ts", (F.col("__b0") + d).alias("__b"))
        shifted = part if shifted is None else shifted.unionByName(part)
    rights = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("right_ts"),
        F.floor(F.unix_timestamp(F.col(right_ts)) / width).alias("__b"),
    )
    lts = F.unix_timestamp(F.col("left_ts"))
    rts = F.unix_timestamp(F.col("right_ts"))
    return (
        shifted.join(
            rights,
            on=[
                shifted["__lk"] == rights["__rk"],
                shifted["__b"] == rights["__b"],
            ],
        )
        .filter((rts >= lts + lower_seconds) & (rts <= lts + upper_seconds))
        .select(F.col("__lk").alias(key), "left_ts", "right_ts")
        .distinct()
    )


def time_weighted_mean(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Time-weighted average of a piecewise-constant signal per key — the
    state-duration statistic (mean price while held, mean queue depth,
    mean sensor reading) where a plain AVG over-weights bursts of events.
    Each observation holds until the key's NEXT observation; the last one
    carries no duration and drops out (standard left-closed convention).
    Output: key cols, ``twa_value``, ``observed_seconds``.

    One window per key (lead = next ts) sharing a single (key, ts)
    partitioning with nothing global, then one aggregate. Determinism:
    durations are exact integer seconds, value×duration is summed through
    DECIMAL(30,6) (order-independent), and the final division is one
    IEEE-exact double op — so the result is reproducible bit-for-bit at
    any partitioning and by any engine (fully oracle-able, unlike a
    float-summed weighted mean). ``order_tiebreak`` must make (ts, tiebreak)
    unique per key or the lead order is ambiguous."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_tiebreak)
    dur = (
        F.unix_timestamp(F.lead(ts_col).over(w))
        - F.unix_timestamp(F.col(ts_col))
    ).alias("__dur")
    with_dur = df.select(*key_cols, F.col(value_col).alias("__v"), dur).filter(
        F.col("__dur").isNotNull()
    )
    return with_dur.groupBy(*key_cols).agg(
        (
            F.sum(F.col("__v").cast("decimal(30,6)") * F.col("__dur"))
            .cast("double")
            / F.sum("__dur")
        ).alias("twa_value"),
        F.sum("__dur").alias("observed_seconds"),
    )


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Calendar densification with carry-forward: given at most one row per
    (key, date), emit one row for EVERY day between a key's first and last
    observation, carrying each value forward until the next observation —
    the time-series spine that turns sparse event rollups into dense daily
    state (inventory positions, balances, last-known metrics). Adds
    ``is_observed`` marking real rows vs filled ones.

    Shape: one lead() window on the key (single shuffle), then a map-only
    ``sequence`` + ``explode`` of each observation's [d, next_d) day range —
    the filled rows are generated WITH their carried values in the same
    pass, so there is no spine table, no cross join, and no second
    carry-forward window. The last observation emits only itself (nothing
    to fill toward). Fill volume is bounded by Σ gap days, not
    |keys| × |calendar|. Rows must be unique per (key, date): aggregate to
    the day grain first."""
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    nxt = F.lead(date_col).over(w)
    staged = df.select(
        *key_cols,
        *value_cols,
        F.col(date_col).alias("__obs"),
        F.sequence(
            F.col(date_col),
            F.coalesce(F.date_sub(nxt, 1), F.col(date_col)),
            F.expr("interval 1 day"),
        ).alias("__days"),
    )
    return staged.select(
        *key_cols,
        F.explode("__days").alias(date_col),
        *value_cols,
        "__obs",
    ).select(
        *key_cols,
        date_col,
        *value_cols,
        (F.col(date_col) == F.col("__obs")).alias("is_observed"),
    )


def value_psi_by_day(
    events: DataFrame,
    bin_width: float = 50.0,
    n_bins: int = 10,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Population Stability Index per day against the earliest day's value
    distribution — the ML-ops drift monitor
    (``PSI_d = Σ_bins (p_d - p_base)·ln(p_d / p_base)``) that fires before
    a downstream model quietly degrades: PSI < 0.1 is stable, 0.1–0.25
    moderate shift, > 0.25 action. Values bin into ``n_bins`` fixed-width
    buckets (last bucket open-ended); counts are add-one smoothed over the
    dense (day × bin) grid so empty bins never produce ln(0).

    Scale shape: ONE (day, bin) count aggregate over the stream; the dense
    grid is a |days|-row × n_bins literal explode (tiny) left-joined onto
    those counts; the baseline row set (n_bins rows) and day totals are
    rollups of the SAME aggregate, broadcast back. Nothing event-sized
    shuffles twice.

    Determinism: bin = floor(value / width) is exact IEEE; per-bin terms
    rounded to 9 dp and DECIMAL-summed (the ln-portability rule); the
    baseline day's own PSI is exactly 0. Output: (day, n_events, psi).
    """
    binned = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        # clamp BOTH ends: without the lower clamp, negative values land in
        # negative bins excluded from the dense grid while still inflating
        # n_d — drift into the negative region would be invisible
        F.greatest(
            F.lit(0),
            F.least(
                F.floor(F.col(value_col) / F.lit(bin_width)),
                F.lit(n_bins - 1),
            ),
        ).cast("int").alias("bin"),
    )
    counts = binned.groupBy("day", "bin").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.localCheckpoint()  # totals, baseline AND grid consume it

    day_totals = counts.groupBy("day").agg(F.sum("c").alias("n_d"))
    dense = (
        day_totals.select(
            "day", "n_d", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
        )
        .join(counts, ["day", "bin"], "left")
        .select("day", "n_d", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    base_day = counts.agg(F.min("day").alias("day"))
    base = (
        dense.join(F.broadcast(base_day), "day")
        .select(
            "bin",
            F.col("c").alias("cb"),
            F.col("n_d").alias("nb"),
        )
    )
    p_d = (F.col("c") + 1).cast("double") / (F.col("n_d") + F.lit(n_bins))
    p_b = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.lit(n_bins))
    return (
        dense.join(F.broadcast(base), "bin")
        .select(
            "day",
            "n_d",
            F.round((p_d - p_b) * F.log(p_d / p_b), 9)
            .cast("decimal(18,9)")
            .alias("__t"),
        )
        .groupBy("day")
        .agg(
            F.max("n_d").alias("n_events"),
            F.sum("__t").cast("double").alias("psi"),
        )
        # DATE→string: the cross-engine dtype contract for date outputs
        # (Spark→pandas yields object dates, DuckDB yields datetime64)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "psi",
        )
    )
