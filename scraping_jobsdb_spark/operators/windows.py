"""Window-function operators (SURVEY.md §2.5).

The reference never writes an explicit window function, but two of its idioms
are windows in disguise: DISTINCT ON dedup (→ ``row_number``) and
"latest scrape wins" (``scrape_url.py:301-303`` repeatedly overwrites
``file_path`` per job_id → ``row_number`` desc over scrape time). The engine
declares the full ranking/navigation/frame surface.

Scale: a window is one shuffle on its partition keys + a per-partition sort.
Partition keys here are high-cardinality (customer, order) so no skew; a
global window (no partitionBy) would single-task — the engine never emits one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = ["keyed_window", "latest_per_key", "running", "with_rank_columns"]


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
