"""Structured Streaming windowed aggregations (SURVEY.md §2.7).

The reference is strictly periodic batch (cron DAGs, ``scrape_url.py:311``);
its incremental bookkeeping is hand-rolled anti-joins. Structured Streaming
with ``Trigger.AvailableNow`` subsumes that bookkeeping: the checkpoint tracks
what's been processed, each trigger drains exactly the new files, and the
SAME windowed-aggregation plan serves both batch and streaming (verified by
the differential oracle: the streaming query below must hash-match the DuckDB
batch SQL).

Scale: file-source streaming partitions work by file; state for windowed aggs
lives in the state store keyed by (window, group) — bounded by watermark
eviction in continuous deployments.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["hourly_event_counts_stream", "run_stream_to_memory"]


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: 1-hour tumbling windows per event_type over the events
    table consumed as a file stream. Identical logical aggregation to the
    batch q_events_hourly_tumbling."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file source requires a directory; expose the (read-only) table file
    # through a symlink in a temp dir.
    stream_dir = tempfile.mkdtemp(prefix="sjs_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(stream_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(streaming_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Drain a (finite) streaming aggregation with Trigger.AvailableNow into
    an in-memory table and return it as a batch DataFrame. Complete output
    mode so every window is emitted regardless of final watermark position."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="sjs_ckpt_")
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
