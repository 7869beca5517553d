"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 extension: the engine's escape hatch for operators Spark's
built-in windowed aggregations can't express).

Example operator: per-user running totals with explicit state — the streaming
generalization of the reference's per-key "latest wins" bookkeeping
(``scrape_url.py:301-303``). State is one row per user in the state store;
each micro-batch folds its events into the state and emits the updated
totals, so downstream consumers always see the cumulative picture without
reprocessing history (what the reference re-derives each run via anti-joins).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "running_user_totals_tws", "sessionize"]

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"

_SESS_OUT = "user_id bigint, session_start timestamp, n_events bigint"
_SESS_STATE = "starts array<timestamp>, ends array<timestamp>, counts array<bigint>"


def _fold(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
    )


def _merge_sessions(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold event timestamps into gap-separated sessions kept in state.

    Each session is (start, end=last_ts+gap, count); an event extends the
    session whose half-open interval [start, end) it falls into (or lands
    within gap of), otherwise opens a new one. Equivalent to Spark's built-in
    ``session_window`` merge logic, held in explicit state so the operator
    template generalizes to custom session semantics (per-key gaps, capped
    sessions, value-dependent splits) the built-in can't express.
    """
    import pandas as _pd

    gap = _pd.Timedelta(minutes=5)
    (user_id,) = key
    if state.exists:
        starts, ends, counts = state.get
        sessions = [
            [_pd.Timestamp(s), _pd.Timestamp(e), int(c)]
            for s, e, c in zip(starts, ends, counts)
        ]
    else:
        sessions = []
    ts_all = _pd.concat([pdf["ts"] for pdf in batches]).sort_values()
    for t in ts_all:
        t = _pd.Timestamp(t)
        placed = False
        for sess in sessions:
            if sess[0] - gap < t < sess[1]:  # merges into this session
                sess[0] = min(sess[0], t)
                sess[1] = max(sess[1], t + gap)
                sess[2] += 1
                placed = True
                break
        if not placed:
            sessions.append([t, t + gap, 1])
        sessions.sort(key=lambda s: s[0])
        # coalesce overlapping neighbours (an event can bridge two sessions)
        merged = [sessions[0]]
        for s in sessions[1:]:
            if s[0] < merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        sessions = merged
    state.update(
        (
            [s[0] for s in sessions],
            [s[1] for s in sessions],
            [s[2] for s in sessions],
        )
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [s[0] for s in sessions],
            "n_events": [s[2] for s in sessions],
        }
    )


def sessionize(events_stream: DataFrame) -> DataFrame:
    """Custom stateful sessionization (5-minute gap) via
    applyInPandasWithState — the explicit-state twin of
    ``F.session_window`` (tests assert they agree). The template for session
    semantics the built-in can't express."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _merge_sessions,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user cumulative (count, sum(value)) over a stream of
    events with columns (user_id, value, ...)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum(value)) via transformWithStateInPandas
    — Spark 4's successor API to applyInPandasWithState: named state
    variables acquired from a handle in ``init`` instead of one positional
    state tuple, with the RocksDB state store managing layout. Same fold
    semantics as ``_fold`` (tests assert the two APIs and the batch
    aggregate agree). The processor class is defined at call time:
    importing StatefulProcessor at module import would hard-bind this
    module to the Spark-4-only API. Requires the RocksDB provider on the
    session (``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
    and the ``protobuf`` package (the API's state-server wire protocol);
    the equivalence test skips where protobuf is absent and the
    applyInPandasWithState twin remains the runtime-independent path.
    """
    from pyspark.sql.streaming import StatefulProcessor

    class Processor(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self):
            pass

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Processor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
