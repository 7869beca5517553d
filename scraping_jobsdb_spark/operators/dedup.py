"""Deduplication operators.

The reference dedupes with Postgres ``SELECT DISTINCT ON (job_id)``
(``sql/scrape_url_dedupe_jobs.sql:3-8``) — "keep one arbitrary row per key."
Arbitrary is not reproducible, so the engine's canonical dedup is
*deterministic*: a ranking window over an explicit total order (A2 in
SURVEY.md §2.4). Exact-content dedup (hash the payload, keep one row per
digest) is the first of the LLM-pipeline dedup family; the near-duplicate
members (MinHash-LSH, SimHash, n-gram Jaccard) live in ``similarity.py`` /
``textops.py``.

Scale posture: both operators are a single hash-shuffle on the dedup key.
``row_number`` needs a per-key sort but keys here are high-cardinality so
partitions stay balanced; for skewed keys AQE skew-join/salting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_first", "dedup_exact"]


def dedup_first(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep exactly one row per key: the first under the given total order.

    Deterministic replacement for ``DISTINCT ON`` / ``dropDuplicates`` —
    ``order_cols`` must be a total order within each key group for the result
    to be reproducible (the differential-oracle queries guarantee this).
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: Digest preimage encoding: fields joined on U+001F (unit separator, a
#: control char the engine's text domains never contain), NULL encoded as
#: U+0000 — distinct from the empty string. concat_ws alone would SKIP null
#: fields, colliding ("a", NULL, "b") with ("a", "b", NULL).
_FIELD_SEP = "\x1f"
_NULL_SENTINEL = "\x00"


def dedup_exact(df: DataFrame, content_cols: list[str], keep_order_col: str) -> DataFrame:
    """Exact-duplicate removal by content digest.

    Hashes the content columns (md5 over a unit-separator join with a NULL
    sentinel — JVM-side, no UDF) and keeps the row with the smallest
    ``keep_order_col`` per digest. Distinct contents never share a digest:
    the separator delimits column boundaries and NULL encodes differently
    from the empty string. This is the map-side-cheap baseline of the dedup
    family: one shuffle on the 128-bit digest, uniform by construction
    (no skew).
    """
    digest = F.md5(
        F.concat_ws(
            _FIELD_SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
                for c in content_cols
            ],
        )
    )
    return dedup_first(
        df.withColumn("__digest", digest), ["__digest"], [keep_order_col]
    ).drop("__digest")
