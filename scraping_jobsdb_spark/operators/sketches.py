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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate", "probe_positions", "hll_build", "hll_rows", "hll_merge", "hll_estimate", "kmv_build", "kmv_merge", "kmv_estimate", "kmv_intersection_estimate"]


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


# ------------------------------------------------------------- portable HLL

HLL_DRAW_BITS = 60  # 15 md5 hex chars -> uniform 60-bit draw


def hll_build(
    df: DataFrame, col: str, p: int = 8, group_cols: list[str] | None = None
) -> DataFrame:
    """Engine-portable HyperLogLog registers as a DataFrame (bucket, rho) —
    the distinct-count sibling of ``cms_build``, with the same portability
    contract: md5-derived hashing, so any engine re-derives the IDENTICAL
    register table and the gate can verify the sketch itself hash-exactly
    (Spark's native ``hll_sketch_agg`` blobs are DataSketches-internal and
    only rows-only checkable; this one is the fully-oracled form).

    m = 2^p buckets; per value: a 60-bit md5 draw splits into bucket
    (low p bits) and the remaining 60-p bits whose leading-zero count + 1
    is rho; registers are max(rho) per bucket — ONE aggregate with
    map-side combine, shuffling at most m rows per mapper (per group when
    ``group_cols`` asks for one sketch per group). rho is derived
    from the minimal binary-string length (identical in Spark ``conv`` and
    DuckDB ``bin``), never from float log2 (exact at power-of-two
    boundaries where log2 rounding is not)."""
    keys = list(group_cols or [])
    return (
        hll_rows(df, col, p)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_rows(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """The pre-aggregation row form of ``hll_build``: every input row mapped
    to its (bucket, rho) observation, all other columns preserved. Registers
    are max(rho) per bucket over these rows — which makes HLL maintenance
    literally an incremental MAX-aggregate view: feed these rows to
    ``IncrementalAggView`` (or any max-folding state) and the folded state
    IS the register table, idempotent under micro-batch replay because max
    is (tested in test_streaming_multimodal)."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    rest = F.shiftright(h, p)
    binlen = F.length(F.conv(rest.cast("string"), 10, 2))
    max_rho = HLL_DRAW_BITS - p + 1
    rho = (
        F.when(rest == 0, F.lit(max_rho))
        .otherwise(F.lit(max_rho) - binlen)
        .cast("bigint")
    )
    return df.select(
        "*", (h % m).cast("bigint").alias("bucket"), rho.alias("rho")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union-max of register tables: the HLL merge law (registers are
    max-linear), so per-shard / per-day sketches roll up without touching
    the data — bit-identical to building over the concatenated data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, p: int = 8, group_cols: list[str] | None = None
) -> DataFrame:
    """Raw HyperLogLog estimate from a register DataFrame (one row —
    or one per ``group_cols`` group when the sketch carries group keys:
    ``est_distinct`` double, ``n_zero_buckets`` bigint, ``harmonic_sum``
    bigint).

    Determinism: the harmonic sum is computed as the INTEGER
    S = sum(2^(max_rho - rho)) (+ 2^max_rho per never-hit bucket) — every
    term is an exact power of two and the integer sum is order-independent,
    where the float form sum(2^-rho) rounds order-dependently once terms
    differ by >53 binary orders. One double division at the end — IEEE
    correctly-rounded, so the raw estimate is bit-identical in any engine
    given the same registers. The standard small-range correction applies
    (raw estimate ≤ 2.5m with empty buckets → linear counting m·ln(m/V));
    ln() carries libm ulps, which is why gate queries either hash the
    integer registers (hll_portable_registers) or round the estimate to
    3 dp before hashing (approx_distinct_sketch) — estimate accuracy
    (~1.04/sqrt(m)) is asserted in tests."""
    keys = list(group_cols or [])
    m = 1 << p
    max_rho = HLL_DRAW_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # DataFrame-API shiftleft wants a literal shift; the SQL form takes a
    # column — the per-register term 2^(max_rho - rho) is an exact bigint
    aggs = [
        F.expr(
            f"sum(shiftleft(cast(1 as bigint), cast({max_rho} - rho as int)))"
        ).alias("__s_hit"),
        F.count(F.lit(1)).alias("__n_hit"),
    ]
    agg = sketch.groupBy(*keys).agg(*aggs) if keys else sketch.agg(*aggs)
    s_total = F.col("__s_hit") + (F.lit(m) - F.col("__n_hit")) * F.lit(
        1 << max_rho
    ).cast("bigint")
    num = alpha * m * m * float(1 << max_rho)
    raw = F.lit(num) / s_total.cast("double")
    v = (F.lit(m) - F.col("__n_hit")).cast("bigint")
    est = F.when(
        (v > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *keys,
        est.alias("est_distinct"),
        v.alias("n_zero_buckets"),
        s_total.cast("bigint").alias("harmonic_sum"),
    )


# ------------------------------------------------------------- portable KMV


def kmv_build(
    df: DataFrame, col: str, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """K-minimum-values (theta-style) sketch: the k smallest md5-derived
    60-bit hash values of the column's DISTINCT items, per group — rows
    (group..., v). The third member of the portable-sketch family (CMS:
    frequencies, HLL: distinct counts) and the one that answers what HLL
    cannot: DISTINCT COUNTS OF SET EXPRESSIONS — union via merge,
    intersection via the theta cut — because the sketch retains actual
    hash values, which are comparable across sketches.

    Physical shape: map-side hash → per-group k-smallest. Grouped builds
    compile to the WindowGroupLimit map-side top-k (one shuffle of ≤ k
    rows per mapper per group); the ungrouped form is a global
    TakeOrderedAndProject. All values integer → the sketch itself is
    value-hash oracle-able in any engine."""
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    keys = list(group_cols or [])
    hashed = df.select(*keys, h.alias("v")).distinct()
    if keys:
        w = Window.partitionBy(*keys).orderBy("v")
        return (
            hashed.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
        )
    return hashed.orderBy("v").limit(k)


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Union sketch: pool the retained values, keep the k smallest —
    KMV(A ∪ B), bit-identical to building over the concatenated data
    (both sides retain supersets of the union's k minima)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.select("v").distinct().orderBy("v").limit(k)


def kmv_estimate(
    sketch: DataFrame, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from a (v) sketch: (k-1) * 2^60 / v_k with
    v_k the k-th smallest retained value; exact count when the sketch
    holds fewer than k values (the whole distinct set hashed). One double
    division (both operands exact: (k-1)·2^60 is an exact double for any
    sane k, v_k an integer) — bit-identical in any engine; everything
    before it is integer. One row per group when ``group_cols`` names the
    sketch's group keys."""
    keys = list(group_cols or [])
    aggs = [F.count(F.lit(1)).alias("__n"), F.max("v").alias("__vk")]
    agg = sketch.groupBy(*keys).agg(*aggs) if keys else sketch.agg(*aggs)
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("__vk").cast("double")
    )
    return agg.select(*keys, est.alias("est_distinct"))


def kmv_intersection_estimate(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Distinct-count estimate of A ∩ B from two KMV sketches — the
    theta-sketch recipe: cut both at theta = min(max_a, max_b), count
    matching values below the cut (rho) out of the union's survivors (u),
    and scale the union estimate by rho/u. Returns one row:
    (rho, u, est_intersection) — rho and u are integers (hash-exact;
    rho/u is the Jaccard estimate), the estimate is two double
    operations on integers."""
    av = a.select("v")
    bv = b.select("v")
    theta = (
        av.agg(F.max("v").alias("ma"))
        .crossJoin(bv.agg(F.max("v").alias("mb")))
        .select(F.least("ma", "mb").alias("theta"))
    )
    # broadcast 1-row theta to both sides
    at = av.crossJoin(F.broadcast(theta)).filter(F.col("v") <= F.col("theta"))
    bt = bv.crossJoin(F.broadcast(theta)).filter(F.col("v") <= F.col("theta"))
    inter = at.select("v").intersect(bt.select("v"))
    union = at.select("v").union(bt.select("v")).distinct()
    rho = inter.agg(F.count(F.lit(1)).alias("rho"))
    u = union.agg(
        F.count(F.lit(1)).alias("u"), F.max("v").alias("vu")
    )
    joined = rho.crossJoin(u)
    est_union = F.when(
        F.col("u") < k, F.col("u").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("vu").cast("double")
    )
    return joined.select(
        F.col("rho").cast("bigint").alias("rho"),
        F.col("u").cast("bigint").alias("u"),
        (F.col("rho").cast("double") / F.greatest(F.col("u"), F.lit(1)).cast("double") * est_union).alias(
            "est_intersection"
        ),
    )
