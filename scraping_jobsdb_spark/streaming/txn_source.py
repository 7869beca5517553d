"""Structured Streaming source over txn-table append CDC.

Closes the loop between the transactional layer and Structured Streaming:
the manifest log IS an offset log — version numbers are offsets, and the
file delta of an append commit is exactly that offset range's data
(``TxnTable.read_appends_since``). This source exposes that contract
through the Spark 4 Python streaming DataSource API, so a txn table tails
into any streaming query with checkpointed exactly-once progress:

    spark.dataSource.register(TxnAppendsStreamDataSource)
    stream = (spark.readStream.format("txn_appends")
              .option("path", table_path).load())

Offsets are ``{"version": N}``; a restart resumes from the checkpointed
version and replays nothing. Non-append commits (overwrite/merge/compact/
zorder) in the offset range fail the batch — same rule as
``read_appends_since``: their file delta is not a row delta, so tailing a
rewritten table silently would be wrong. Tables that need streaming
consumers should stay append-only (the same discipline Delta CDF asks of
its sources).

Scale posture: one InputPartition per appended file, so read parallelism
follows the commit's file count. Rows cross through Python (pyarrow) —
the cost of a pure-Python source; the JVM-side alternative is a file-
source stream on a landing directory, which this complements by adding
transactional visibility (orphans from crashed writers are never read).

Manifest mechanics (layout, version listing, the append-op allowlist, the
per-batch file-delta resolution) are NOT re-implemented here: the source
calls the same module-level helpers TxnTable itself uses
(``sources.txn.append_delta_files`` / ``current_version`` /
``read_manifest``), so the batch and streaming CDC paths cannot drift.
The imports are deferred into the methods to keep the pickled reader
object itself dependency-light.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = ["TxnAppendsStreamDataSource"]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TxnAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._table_path = os.path.abspath(options["path"])
        self._schema = schema
        self._start = int(options.get("startversion", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from scraping_jobsdb_spark.sources.txn import current_version

        return {"version": current_version(self._table_path)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from scraping_jobsdb_spark.sources.txn import append_delta_files

        lo, hi = int(start["version"]), int(end["version"])
        new_files = append_delta_files(self._table_path, lo, hi)
        if not new_files:
            # Spark requires >= 1 partition per (non-empty) batch; an empty
            # offset range yields one empty partition.
            return [_FilePartition("")]
        return [
            _FilePartition(os.path.join(self._table_path, f)) for f in new_files
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        names = [f.name for f in self._schema.fields]
        cols = [
            table.column(n).to_pylist() if n in table.column_names else
            [None] * table.num_rows
            for n in names
        ]
        yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the query checkpoint, nothing to release


class TxnAppendsStreamDataSource(DataSource):
    """``spark.readStream.format("txn_appends").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_appends"

    def schema(self) -> StructType:
        from scraping_jobsdb_spark.sources.txn import (
            current_version,
            read_manifest,
        )

        path = os.path.abspath(self.options["path"])
        m = read_manifest(path, current_version(path))
        return StructType.fromJson(json.loads(m["schema"]))

    def streamReader(self, schema: StructType) -> _TxnAppendsStreamReader:
        return _TxnAppendsStreamReader(schema, self.options)
