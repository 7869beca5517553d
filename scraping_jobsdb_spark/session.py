"""SparkSession factory.

Replaces the reference's config-file loader (``spark/lib/utils.py:128-138``,
which read ``spark.conf`` into a SparkConf and pinned ``local[3]`` with
``spark.sql.shuffle.partitions=2``). Here the defaults are scale-sane: AQE on
(runtime partition coalescing + skew-join handling), Arrow enabled for the
pandas-UDF surface, and shuffle parallelism sized from the env rather than
hard-coded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "scraping_jobsdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Local mode is only the test harness; every setting here is chosen to also
    be correct on a multi-executor cluster:

    - AQE: runtime shuffle-partition coalescing, skew-join splitting, and
      dynamic join-strategy demotion — the knobs that keep a fixed
      ``shuffle.partitions`` from being wrong at 1000x the data.
    - ``autoBroadcastJoinThreshold`` left at default (10 MB) so dimension
      tables (region/nation/...) broadcast automatically; operators that know
      a side is small also hint ``F.broadcast`` explicitly.
    - Arrow on for pandas UDFs (the only sanctioned Python hot path).
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Master: honor an existing session/cluster manager; local[N] only as the
    # single-machine fallback (tests, bench).
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
