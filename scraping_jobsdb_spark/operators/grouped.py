"""Grouped Pandas transforms: the ``applyInPandas`` surface (SURVEY.md §2.8).

For per-group computations that genuinely need imperative/vectorized Python —
model scoring, per-group fitting, numpy-heavy features — the engine's
sanctioned path is grouped Arrow batches: one shuffle on the group key, then
each group as a pandas DataFrame in a worker. Everything expressible as
built-ins (including plain z-scores via window functions) should stay
JVM-side; this module exists for the remainder and as the template for it.

Scale: group size must fit a worker's memory — high-cardinality keys with
bounded group sizes (users, documents) are the right shape; a global or
heavily-skewed key is not (salt first).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["group_zscore"]

_OUT = "user_id bigint, event_id bigint, value double, zscore double"


def _zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Population z-score per group, numerically robust form: fsum-exact
    moments, then one sqrt + one division per row."""
    xs = pdf["value"].astype(float).tolist()
    n = len(xs)
    s = math.fsum(xs)
    s2 = math.fsum(x * x for x in xs)
    var = max(0.0, (s2 - s * s / n) / n)
    std = math.sqrt(var)
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["zscore"] = [((x - s / n) / std) if std > 0 else 0.0 for x in xs]
    return out


def group_zscore(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values via applyInPandas (one shuffle on
    user_id; each user's events as one Arrow batch)."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(events.sparkSession)
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(_zscore_pdf, schema=_OUT)
    )
