"""Streaming deduplication (SURVEY.md §2.7 extension).

The reference's idempotence story is batch anti-joins against a processed-set
table (``sql/scrape_url_create_scraped_job_table.sql:10-15``,
``spark/ParseHtml.py:26-30``). In a continuous deployment the same guarantee
is ``dropDuplicatesWithinWatermark``: state holds one entry per key only
until the watermark passes the key's event time, so state is bounded — the
property that makes exactly-once ingest dedup feasible on an unbounded
stream, where the batch anti-join's "processed" side would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["streaming_dedup"]


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    ``delay`` bounds both late data and the dedup state: two events with the
    same key separated by more than ``delay`` of event time are treated as
    distinct (by then the first's state has been evicted). That is the right
    semantics for at-least-once upstream retries, which arrive close
    together.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
