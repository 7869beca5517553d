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

__all__ = ["running_user_totals"]

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


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
