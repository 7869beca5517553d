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

from ..sources.tables import normalize_event_ts

__all__ = [
    "events_file_stream",
    "hourly_event_counts_stream",
    "ohlc_bars_stream",
    "sliding_value_totals_stream",
    "session_counts_stream",
    "click_purchase_stream_join",
    "stream_static_enriched_totals",
    "run_stream_to_memory",
]


def events_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source stream (the engine's standard
    stream-ingest edge). The file source requires a directory; the read-only
    table file is exposed through a symlink in a temp dir. At scale this is
    a landing directory new files keep arriving into — the checkpoint tracks
    which have been drained."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = tempfile.mkdtemp(prefix="sjs_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    # Same dtype-adaptive ts normalization as the batch reader, so batch and
    # streaming plans see an identical TIMESTAMP column whichever encoding
    # the testdata files carry.
    return normalize_event_ts(stream)


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: 1-hour tumbling windows per event_type over the events
    table consumed as a file stream. Identical logical aggregation to the
    batch q_events_hourly_tumbling."""
    stream = events_file_stream(spark, sf_dir)
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


def ohlc_bars_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: hourly OHLC bars per event type — identical logical
    aggregation to the batch q_events_ohlc_hourly (min_by/max_by keyed on
    the unique (ts, event_id) pair run fine inside a watermarked streaming
    agg: ordered-argmin state is one (key, value) pair per group), so the
    same DuckDB oracle checks both."""
    stream = events_file_stream(spark, sf_dir)
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", order_key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order_key).alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "n_events",
        )
    )


def sliding_value_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: 10-minute windows sliding every 5 minutes (each event
    in exactly two windows) — identical logical aggregation to the batch
    q_events_sliding_windows, so the same DuckDB oracle checks both."""
    stream = events_file_stream(spark, sf_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


def session_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: per-user session windows (5-minute inactivity gap) —
    the streaming form of q_events_session_window. Session state is merged
    across micro-batches in the state store and finalized when the watermark
    passes a session's end."""
    stream = events_file_stream(spark, sf_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def click_purchase_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: clicks joined to same-user purchases that
    happen within the following 10 minutes.

    Both sides carry watermarks and the join condition carries the time
    bound — that pair is what lets the state store evict: a buffered click
    can only match purchases up to (click.ts + 10 min), so once the purchase
    watermark passes that point the click's state is dropped. Without the
    time bound the state would grow forever; this is THE stream-stream join
    discipline at scale.
    """
    clicks = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        events_file_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.col("c_ts").alias("click_ts"),
        F.col("p_ts").alias("purchase_ts"),
        "purchase_value",
    )


def stream_static_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the third §2.7 join shape next to stream-stream
    and the stateful ops: each micro-batch of the events stream enriches
    against the static customer dimension (broadcast: a dimension join
    carries NO streaming state, unlike a stream-stream join — the static
    side is simply re-planned per micro-batch, picking up nothing but its
    scan), then aggregates hourly value totals per customer nation.
    Identical logical aggregation to the equivalent batch plan (asserted in
    tests)."""
    from scraping_jobsdb_spark.sources.tables import load_table

    stream = events_file_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        stream.join(F.broadcast(dim), "user_id")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_nationkey",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    streaming_df: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Drain a (finite) streaming aggregation with Trigger.AvailableNow into
    an in-memory table and return it as a batch DataFrame. Complete output
    mode (default) emits every window regardless of final watermark position
    (append would drop windows the final watermark hasn't passed); plain
    row-level streams (e.g. streaming dedup) aren't aggregations and use
    ``"append"``."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="sjs_ckpt_")
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
