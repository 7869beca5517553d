"""Kafka source/sink wrappers (S1/S2's continuous-ingest analogue).

The reference polls a website on a cron schedule; the continuous version of
that edge is a message bus. These wrappers pin the engine's conventions —
earliest/explicit offsets, JSON value decoding against a REQUIRED schema
(never inference), and fail-fast configuration — around Spark's built-in
``kafka`` data source.

The test container ships neither a broker nor the spark-sql-kafka connector
JAR, so construction fails fast with a clear message when the format is
unavailable; the JSON-decode stage is pure DataFrame logic and is tested
against an in-memory frame shaped like Kafka's wire schema (key/value
binary + topic/partition/offset/timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["kafka_stream", "decode_json_values", "KafkaUnavailable"]


class KafkaUnavailable(RuntimeError):
    """The spark-sql-kafka connector is not on the classpath."""


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """A readStream over one topic with the engine's defaults: explicit
    starting offsets (reprocessing is a deliberate choice, not an accident)
    and optional per-trigger offset caps (micro-batch size control — the
    backpressure knob that keeps state stores bounded at scale)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "true")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - connector-present path
        if "kafka" in str(e).lower() or "DATA_SOURCE_NOT_FOUND" in str(e):
            raise KafkaUnavailable(
                "spark-sql-kafka connector missing: add "
                "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
            ) from e
        raise


def decode_json_values(
    raw: DataFrame, value_schema: StructType, key_as: str = "kafka_key"
) -> DataFrame:
    """Kafka wire rows → typed columns: cast the binary value to string,
    parse against the REQUIRED schema (corrupt records become NULL structs —
    count them, don't crash), keep the (topic, partition, offset) provenance
    columns the exactly-once bookkeeping needs."""
    return raw.select(
        F.col("key").cast("string").alias(key_as),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    ).select(key_as, "v.*", "topic", "partition", "offset", "kafka_ts")
