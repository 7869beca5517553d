"""Event-time windows over the events table (SURVEY §2.7 extensions).

Registry chunk split from plans/queries.py (registration order is
preserved by the import sequence in plans/queries.py; the gate window is
re-applied there). Unused imports are part of the shared chunk header.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.dedup import dedup_exact, dedup_first
from scraping_jobsdb_spark.operators.incremental import new_rows
from scraping_jobsdb_spark.operators.merge import coalesce_merge
from scraping_jobsdb_spark.plans._shared import _dsum, _dsum_sql, _register
from scraping_jobsdb_spark.sources.tables import fan_out, load_table

# ---------------------------------------------------------------------------
# Event-time windows (§2.7 extensions over the events table)
# ---------------------------------------------------------------------------


@_register(
    "events_hourly_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (1h) per event type — the batch form of the
    Structured Streaming aggregation (streaming/windows.py runs the identical
    plan via readStream; tests assert batch ≡ streaming). F.window on a
    1-hour tumble aligns to the epoch grid = date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_register(
    "events_ohlc_hourly",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', ts) AS ws, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT ws AS window_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series DOWNSAMPLING to hourly OHLC bars (open/high/low/close +
    count) per event type — the classic resample an events store serves,
    and the registry's ``min_by``/``max_by`` surface: open and close are
    ONE ordered-argmin aggregate each (no self-join, no second window
    pass), tie-broken on the unique (ts, event_id) pair so the bar is a
    pure function of the data at any partitioning. All four prices are
    RAW stored doubles (no arithmetic), so the result hash-oracles
    exactly; the plan is a single map-side-combined hash aggregate —
    per-bucket state is O(1), the shape that downsamples a 100 TB event
    stream in one shuffle. Oracle mirrors via two ROW_NUMBER lanes
    (DuckDB's arg_min takes one ordering value; the window form pins the
    identical total order)."""
    ev = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


@_register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (5-minute inactivity gap) per user: F.session_window in
    Spark vs the lag/cumulative-sum sessionization identity in SQL. A new
    session starts when the gap is >= the timeout (Spark's window end is
    exclusive: end = last_ts + gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@_register(
    "events_hourly_streaming",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: the SAME hourly aggregation executed through Structured
    Streaming (file source → watermark → windowed agg → AvailableNow drain
    to memory sink) — proving the engine's batch/streaming plan parity
    against the batch SQL oracle. Checkpoint-based progress tracking is the
    idiomatic replacement for the reference's hand-rolled anti-join
    incrementality (SURVEY.md §2.7)."""
    from scraping_jobsdb_spark.streaming.windows import (
        hourly_event_counts_stream,
        run_stream_to_memory,
    )

    return run_stream_to_memory(hourly_event_counts_stream(spark, sf_dir), spark)


@_register(
    "events_ohlc_streaming",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', ts) AS ws, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT ws AS window_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def q_events_ohlc_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 + the r7 OHLC downsampler THROUGH Structured Streaming: the
    identical min_by/max_by windowed aggregation as the batch
    events_ohlc_hourly, executed file source → watermark → AvailableNow →
    memory sink and checked against the SAME batch SQL oracle — pinning
    that ordered-argmin aggregates (one (key, value) state pair per group)
    hold the batch/streaming plan-parity contract like the sum/count
    family does."""
    from scraping_jobsdb_spark.streaming.windows import (
        ohlc_bars_stream,
        run_stream_to_memory,
    )

    return run_stream_to_memory(ohlc_bars_stream(spark, sf_dir), spark)


