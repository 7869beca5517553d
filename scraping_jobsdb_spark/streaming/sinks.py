"""Streaming sinks: foreachBatch with idempotent (exactly-once-per-key)
parquet appends.

Structured Streaming's file sink is append-only exactly-once via the commit
log, but cannot dedup against PRE-EXISTING table contents or run arbitrary
batch logic. ``foreachBatch`` hands each micro-batch to ordinary batch code
— here the engine's anti-join idempotent append (``sources/tables.
write_idempotent_append``), the same discipline as the reference's
``ON CONFLICT DO NOTHING`` (``sql/scrape_url_insert_data.sql:1-4``), now
applied continuously.

Replay safety comes from two layers: the checkpoint replays a batch only on
failure, and the anti-join inside the batch makes the replay a no-op — the
belt-and-braces that makes the sink safe even when the sink table is shared
with batch writers.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from scraping_jobsdb_spark.sources.tables import write_idempotent_append

__all__ = ["idempotent_stream_sink", "txn_stream_sink"]


def idempotent_stream_sink(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint_dir: str | None = None,
):
    """Start a foreachBatch query appending only unseen keys to ``path``.

    Returns the StreamingQuery (AvailableNow trigger: drains what exists and
    stops — the incremental-batch posture; swap the trigger for continuous
    deployments).
    """

    def _write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        write_idempotent_append(batch_df, path, key_cols)

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="sjs_sink_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )


def txn_stream_sink(
    stream: DataFrame,
    path: str,
    app_id: str,
    key_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Exactly-once streaming sink into a transactional table
    (``sources/txn.py``): every micro-batch commits atomically with its
    (app_id, epoch) recorded in the manifest, so a checkpoint-replayed batch
    is recognized and skipped — the stronger guarantee
    ``idempotent_stream_sink`` approximates with key anti-joins alone, and
    the same txnAppId/txnVersion contract Delta's sink offers. ``key_cols``
    optionally adds the key-level dedup on top (shared tables with
    non-streaming writers). The table must exist (create it with the
    stream's schema first); AvailableNow trigger, same as the plain sink.
    """
    from scraping_jobsdb_spark.sources.txn import TxnTable

    def _write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        TxnTable(batch_df.sparkSession, path).stream_epoch_append(
            batch_df, app_id=app_id, epoch_id=epoch_id, key_cols=key_cols
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="sjs_txn_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
