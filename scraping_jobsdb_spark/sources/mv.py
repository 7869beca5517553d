"""Incrementally-maintained aggregate materialized views over txn tables.

The scale story: a 100 TB fact table's rollup must NOT be recomputed by
rescanning the base on every refresh. For append-only commit ranges the
delta files ARE the row delta (``append_delta_files``), so a refresh costs
one partial aggregate over ONLY the new files plus a combine against the
current view state (dimension-sized) — O(|delta| + |view|), independent of
the base table's size. The view state itself lives in a txn table, and the
last-applied source version rides each commit's manifest as ``meta``, so
refresh is idempotent and crash-safe: a re-run of the same refresh sees the
watermark already advanced and no-ops.

This is the at-scale mapping of the reference's cron-recomputed summary
tables (``airflow/dags/scrape_url.py`` re-runs its aggregation SQL over the
full parsed_jobs table every schedule): same result, incremental cost.

Maintainable aggregates under append-only deltas: count, sum, min, max
(avg = sum/count at read time). ``dsum`` sums through DECIMAL(30,4) so the
running total is exact and order-independent — the determinism contract
for double measures. A non-append commit in the range (overwrite, merge,
delete) voids the delta algebra; refresh detects it and falls back to one
full recompute at the captured snapshot, then resumes incremental.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scraping_jobsdb_spark.sources.txn import (
    TxnTable,
    append_delta_files,
)

__all__ = ["IncrementalAggView"]

_WATERMARK_KEY = "mv_source_version"
_EPOCH_KEY = "mv_epoch"

# (delta-level aggregate, state-level re-combine) per measure kind. count
# re-combines by SUM; everything else re-combines with itself.
_SUPPORTED = ("count", "sum", "dsum", "min", "max")


class IncrementalAggView:
    """An aggregate view over an append-mostly ``TxnTable``, refreshed from
    the source's manifest delta instead of its full snapshot.

    ``measures`` maps output column → ("count", None) | ("sum"|"dsum"|
    "min"|"max", source_col). State schema: ``group_cols`` + measure
    columns (dsum state is DECIMAL(30,4); cast at read if you want a
    double).
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        view_path: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str | None]],
    ):
        for out, (kind, col) in measures.items():
            if kind not in _SUPPORTED:
                raise ValueError(f"{out}: unsupported aggregate {kind!r}")
            if kind != "count" and col is None:
                raise ValueError(f"{out}: {kind} needs a source column")
        self.spark = spark
        self.source_path = source_path
        self.view_path = view_path
        self.group_cols = list(group_cols)
        self.measures = dict(measures)

    # ------------------------------------------------------------ aggregate

    def _delta_aggs(self) -> list:
        out = []
        for name, (kind, col) in self.measures.items():
            if kind == "count":
                out.append(F.count(F.lit(1)).alias(name))
            elif kind == "sum":
                out.append(F.sum(col).alias(name))
            elif kind == "dsum":
                out.append(F.sum(F.col(col).cast("decimal(30,4)")).alias(name))
            elif kind == "min":
                out.append(F.min(col).alias(name))
            else:
                out.append(F.max(col).alias(name))
        return out

    def _combine_aggs(self) -> list:
        # state ∪ partial re-aggregates: counts and sums add, min/max fold
        out = []
        for name, (kind, _col) in self.measures.items():
            if kind in ("count", "sum", "dsum"):
                out.append(F.sum(name).alias(name))
            elif kind == "min":
                out.append(F.min(name).alias(name))
            else:
                out.append(F.max(name).alias(name))
        return out

    def _partial(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_cols).agg(*self._delta_aggs())

    # dsum partials come out DECIMAL(40,4) (Spark widens SUM); pin the state
    # type so repeated combines can't keep widening the column
    def _pin_types(self, df: DataFrame) -> DataFrame:
        cols = []
        for c in self.group_cols:
            cols.append(F.col(c))
        for name, (kind, _col) in self.measures.items():
            if kind == "dsum":
                cols.append(F.col(name).cast("decimal(30,4)").alias(name))
            elif kind == "count":
                cols.append(F.col(name).cast("bigint").alias(name))
            else:
                cols.append(F.col(name))
        return df.select(*cols)

    # ------------------------------------------------------------ watermark

    def exists(self) -> bool:
        return TxnTable.exists(self.spark, self.view_path)

    def _view(self) -> TxnTable:
        return TxnTable(self.spark, self.view_path)

    def applied_source_version(self) -> int:
        """Highest source version folded into the view (-1 if the view does
        not exist). Walks commits newest-first so maintenance commits on the
        view itself (compact/vacuum) can't hide the watermark."""
        if not self.exists():
            return -1
        view = self._view()
        for v in range(view.version(), 0, -1):
            m = view._manifest(v)
            if _WATERMARK_KEY in m:
                return int(m[_WATERMARK_KEY])
        return -1

    def applied_epoch(self) -> int:
        """Highest streaming epoch folded into the view (-1 if none)."""
        if not self.exists():
            return -1
        view = self._view()
        for v in range(view.version(), 0, -1):
            m = view._manifest(v)
            if _EPOCH_KEY in m:
                return int(m[_EPOCH_KEY])
        return -1

    # -------------------------------------------------------------- refresh

    def read(self) -> DataFrame:
        return self._view().read()

    def fold(self, delta: DataFrame, epoch_id: int | None = None) -> bool:
        """Fold an externally-supplied delta (a streaming micro-batch) into
        the view with the same combine algebra as ``refresh`` — the
        ``foreachBatch`` body that turns any stream into a continuously-
        maintained aggregate view. ``epoch_id`` makes the fold exactly-once
        under failure-recovery replays: a batch whose epoch is already
        recorded in the view's manifest is a no-op (the Delta
        txnAppId/txnVersion contract, same as stream_epoch_append).
        Returns whether the batch was applied."""
        if epoch_id is not None and self.applied_epoch() >= epoch_id:
            return False
        meta: dict[str, Any] = {}
        if epoch_id is not None:
            meta[_EPOCH_KEY] = int(epoch_id)
        partial = self._pin_types(self._partial(delta))
        if not self.exists():
            TxnTable.create(self.spark, self.view_path, partial, meta=meta)
            return True
        merged = self._pin_types(
            self.read()
            .unionByName(partial)
            .groupBy(*self.group_cols)
            .agg(*self._combine_aggs())
        )
        self._view().overwrite(merged, meta=meta)
        return True

    def refresh(self) -> int:
        """Fold source commits past the watermark into the view; returns the
        source version the view now reflects. No-op when already current."""
        source = TxnTable(self.spark, self.source_path)
        target = source.version()  # captured once: the refresh is AS OF this
        last = self.applied_source_version()
        if last >= target:
            return last
        meta: dict[str, Any] = {_WATERMARK_KEY: target}
        if last < 0:
            state = self._pin_types(self._partial(source.read(target)))
            TxnTable.create(self.spark, self.view_path, state, meta=meta)
            return target
        try:
            # Tolerate row-preserving maintenance (compact/zorder) in the
            # range: those commits rewrite files, not rows, so the aggregate
            # delta is still just the appends around them. A rewrite landing
            # AFTER in-range appends still raises (their files were folded
            # into the rewrite) and falls back below.
            files = append_delta_files(
                self.source_path, last, target, skip_row_preserving=True
            )
        except ValueError:
            # a row-CHANGING rewrite landed in the range: delta algebra is
            # void — one full recompute at the captured snapshot, then
            # incremental again
            state = self._pin_types(self._partial(source.read(target)))
            self._view().overwrite(state, meta=meta)
            return target
        if not files:
            self._view().overwrite(self.read(), meta=meta)
            return target
        # schema straight from the manifest — building source.read(target)
        # just to take .schema costs a full DataSource resolution (~0.1 s
        # of driver time per refresh, measured r14)
        import json as _json

        from pyspark.sql.types import StructType as _StructType

        schema = _StructType.fromJson(
            _json.loads(source._manifest(target)["schema"])
        )
        delta = self.spark.read.schema(schema).parquet(
            *[os.path.join(self.source_path, f) for f in files]
        )
        partial = self._partial(delta)
        merged = self._pin_types(
            self.read()
            .unionByName(self._pin_types(partial))
            .groupBy(*self.group_cols)
            .agg(*self._combine_aggs())
        )
        self._view().overwrite(merged, meta=meta)
        return target
