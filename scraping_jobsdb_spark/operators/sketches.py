"""Mergeable count-min sketches as plain DataFrames.

The sketch family next to Spark's built-in DataSketches HLL
(``hll_sketch_agg``, used by the hll_mergeable_sketches gate query): where
HLL answers "how many distinct", a count-min sketch (CMS) answers "about
how often does THIS item occur" in sub-linear space — the heavy-hitter /
frequency primitive for corpus vocabularies too large to count exactly.

Representation: a CMS is just a (depth × width) counter table, so here it
IS a DataFrame with columns (seed, bucket, n) — no binary blobs, no UDFs.
That buys three things the blob form can't give:

* **Construction is one aggregate**: explode each item into its ``depth``
  (seed, bucket) cells and sum — partial aggregation combines map-side, so
  building over 100 TB shuffles at most ``depth × width`` rows per mapper.
* **Merging is a union + re-sum** (counters are linear), so per-shard /
  per-day sketches roll up without touching the data again.
* **Everything is oracle-able**: the hash is md5-derived (one digest per
  value, probe positions sliced from disjoint 7-hex windows), which any
  engine reproduces bit-for-bit — unlike xxhash64, whose seeds are
  Spark-internal. Estimates are integer mins: no floats anywhere.

Standard CMS guarantees: estimate ≥ true count (never under), and with
width w, depth d, the overestimate ≤ N·e/w with probability 1 − e^−d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate", "probe_positions"]


def probe_positions(col: Column, probes: int, width: int) -> list[Column]:
    """Engine-portable probe positions: hash ONCE, slice the digest.

    One md5 yields 32 hex chars = four disjoint 7-hex (28-bit) windows;
    probe s reads window s mod 4, and every block of 4 probes past the
    first re-hashes with a ":block" suffix. md5 dominates the sketch-build
    map stage, so hash-once-slice-probes is ~probes× cheaper than the
    md5-per-probe form at the standard depth 4 — the difference between
    one digest and four per corpus row at 100 TB. 28-bit windows modulo a
    64-multiple width stay uniform for any practical width (2^28 >> bits).
    Shared by the CMS and the txn-table Bloom index; DuckDB oracles and
    the driver-side Bloom prober replicate the same construction."""
    out = []
    for s in range(probes):
        block = s // 4
        basis = col if block == 0 else F.concat_ws(":", col, F.lit(block))
        h = F.conv(F.substring(F.md5(basis), 1 + 7 * (s % 4), 7), 16, 10)
        out.append(h.cast("bigint") % width)
    return out




def cms_build(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of ``col``'s frequency distribution → DataFrame
    (seed, bucket, n), ``depth × width`` rows at most. ``weight_col`` counts
    each row with a weight (e.g. pre-aggregated term counts) instead of 1.

    One pass, one aggregate: each value hashes ONCE and posexplodes its
    ``depth`` sliced positions into cells; the cell counts hash-aggregate
    with map-side combine — the shuffle carries counters, not data."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    positions = probe_positions(F.col(col).cast("string"), depth, width)
    cells = df.select(
        F.posexplode(F.array(*positions)).alias("seed", "bucket"),
        w.cast("bigint").alias("__w"),
    )
    return cells.groupBy("seed", "bucket").agg(F.sum("__w").alias("n"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables cell-wise — CMS is linear, so the merge of
    per-shard sketches equals the sketch of the union (exactly, asserted
    in tests). Cost: a union + one tiny aggregate over ≤ depth×width rows
    per input."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for each probe value: min over the
    ``depth`` counters the value hashes to (the classic CMS upper bound —
    never below the true count). Returns (probe_col, est_n).

    The sketch is ≤ depth×width rows → broadcast; probing any number of
    values is a map-only explode + broadcast join + per-probe min."""
    positions = probe_positions(F.col(probe_col).cast("string"), depth, width)
    cells = probes.select(
        F.col(probe_col),
        F.posexplode(F.array(*positions)).alias("seed", "bucket"),
    )
    return (
        cells.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(probe_col)
        # a missing cell means nothing ever hashed there: count 0
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n"))
    )
