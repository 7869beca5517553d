"""Window-function operators (SURVEY.md §2.5).

The reference never writes an explicit window function, but two of its idioms
are windows in disguise: DISTINCT ON dedup (→ ``row_number``) and
"latest scrape wins" (``scrape_url.py:301-303`` repeatedly overwrites
``file_path`` per job_id → ``row_number`` desc over scrape time). The engine
declares the full ranking/navigation/frame surface.

Scale: a window is one shuffle on its partition keys + a per-partition sort.
Partition keys here are high-cardinality (customer, order) so no skew; a
global window (no partitionBy) would single-task the corpus — the engine
never emits one over corpus-sized input. Total orders over the corpus go
through ``global_ordered_rank`` (range exchange + per-partition ranks +
broadcast offsets); the only bare global windows left rank top-k-limited or
partition-count-sized frames (bounded rows by construction, audited in the
r10 sweep).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "global_ordered_rank",
    "keyed_window",
    "latest_per_key",
    "running",
    "with_rank_columns",
]


def global_ordered_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "position",
    materialize: bool = True,
) -> DataFrame:
    """Global 1-based rank under a TOTAL order, without the single-task
    sort a bare ``Window.orderBy`` compiles to (``Exchange
    SinglePartition`` — the one window shape this module's header bans;
    the 100x sweep measured the global-window form of
    ``curriculum_pack_order`` at 41.7x wall for 100x data, all of it the
    serial stage).

    Shape: ``repartitionByRange`` on the order columns (parallel range
    exchange; equal keys co-locate, and ``order_cols`` must end in a
    unique tie-breaker for the rank to be deterministic), per-partition
    ``row_number`` keyed on the materialized partition id, plus a
    BROADCAST join of per-partition offsets (one P-row aggregate —
    partition counts in range order, cumulated driver-side). Rank values
    are IDENTICAL to the global-window form for ANY boundary placement —
    range partition i holds strictly earlier keys than i+1, so
    ``offset_i + local_rank`` is the global rank — which is what keeps
    hash-oracle parity while the plan stays parallel end to end.

    The input is materialized ONCE (localCheckpoint) before ranking:
    the range exchange's boundary-sampling pass, the offsets branch and
    the ranked branch would otherwise each re-execute the caller's
    upstream DAG (measured 2.3× wall on curriculum_pack_order, whose
    upstream is a full quality-scoring scan). Callers therefore pass a
    PROJECTED frame — the order columns plus what they keep — not a
    wide corpus; on a real cluster the same contract holds with
    persist(DISK) or a staged table for inputs past executor storage.
    A caller whose input is ALREADY materialized (a checkpointed frame,
    or a cheap projection of one) passes ``materialize=False`` to skip
    the second copy — re-running a narrow projection over checkpointed
    blocks per branch is cheaper than writing the frame to disk again
    (the r11 curriculum_pack_order cut)."""
    staged = df.localCheckpoint() if materialize else df
    ranked = staged.repartitionByRange(*order_cols).withColumn(
        "__gor_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__gor_pid").orderBy(*order_cols)
    local = ranked.withColumn("__gor_rn", F.row_number().over(w))
    # Offsets stay INSIDE the one plan (no driver collect): both branches
    # reference the same range exchange, which Spark de-duplicates
    # (ReusedExchange), so the partition ids the offsets were counted
    # under are — by construction — the ids the final join sees. The
    # cumulative window here IS global, but over ≤ shuffle-partitions
    # rows (P, not n): bounded state, the legitimate use of a
    # single-task window.
    w_off = (
        Window.orderBy("__gor_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranked.groupBy("__gor_pid")
        .agg(F.count(F.lit(1)).alias("__gor_cnt"))
        .select(
            "__gor_pid",
            F.coalesce(F.sum("__gor_cnt").over(w_off), F.lit(0)).alias(
                "__gor_off"
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets), "__gor_pid")
        .withColumn(
            out_col, (F.col("__gor_off") + F.col("__gor_rn")).cast("bigint")
        )
        .drop("__gor_pid", "__gor_rn", "__gor_off")
    )


def keyed_window(partition_cols: list[str], order_cols: list[str]) -> WindowSpec:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def latest_per_key(df: DataFrame, key_cols: list[str], ts_cols: list[str]) -> DataFrame:
    """Keep the most recent row per key ("latest scrape wins"). ``ts_cols``
    must totally order rows within a key (append a unique id to break ties)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in ts_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def running(agg: Column, partition_cols: list[str], order_cols: list[str]) -> Column:
    """Aggregate over the growing frame (running sum/avg/min/...)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.over(w)


def with_rank_columns(
    df: DataFrame, partition_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Attach the ranking family over one window spec."""
    w = keyed_window(partition_cols, order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
    )
