"""Deterministic sampling operators for training-data pipelines.

Seeded ``df.sample`` is NOT reproducible across engines, partitionings, or
even re-runs with a different file split — membership depends on the
per-partition RNG stream. Every sampler here instead derives membership
from a content hash of the row's key, so the same row makes the same
decision everywhere: re-runs agree, Spark and the SQL oracle agree, and
growing the table never reshuffles prior decisions. This is the
training-data-curation contract (stable splits, stable subsets, auditable
lineage) that `q_deterministic_sample_split` established for fractions,
extended to exact-count and per-stratum forms.

Scale posture: hash-rank sampling is one window per stratum (single shuffle
on the stratum key); fraction sampling is a pure map. Neither materializes
anything driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_fraction_sample",
    "stratified_exact_sample",
    "token_budget_sample",
    "mixture_token_budget_sample",
    "weighted_priority_sample",
    "leakage_safe_split",
    "top_fraction_per_group",
    "cap_per_group",
    "pack_sequences",
    "epochs_expand",
    "temperature_mixture_sample",
]


def _hash_rank(key: Column) -> Column:
    """Deterministic pseudo-random total order: md5 of the stringified key.
    Hex md5 compares identically as a string in every engine."""
    return F.md5(key.cast("string"))


def hash_fraction_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """~``fraction`` of rows, chosen by md5-prefix band of the key — the
    fraction analogue of the split query: membership is a pure function of
    the key. Uses the first 8 hex chars as a uniform 32-bit draw."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    draw = F.conv(F.substring(_hash_rank(F.col(key_col)), 1, 8), 16, 10).cast(
        "bigint"
    )
    return df.filter(draw < F.lit(int(fraction * 2**32)))


def stratified_exact_sample(
    df: DataFrame, stratum_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically:
    rank rows within each stratum by (md5(key), key) and keep the first k.

    The hash makes the pick pseudo-random w.r.t. any meaningful column
    while staying a pure function of the data; the key tiebreak makes it a
    total order, so the selected set is unique and engine-independent
    (oracle-checkable by value hash, unlike any RNG sampler). One shuffle
    on the stratum key; the per-stratum sort is the window's local sort.
    Balanced per-class subsets, eval slices, and per-language caps in a
    corpus pipeline are all this operator."""
    w = Window.partitionBy(*stratum_cols).orderBy(
        _hash_rank(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    stratum_cols: list[str],
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Per-stratum sampling up to a WEIGHT budget (token budget): walk each
    stratum in deterministic hash order and keep rows while the running
    weight stays within ``budget`` — the corpus-mixing primitive ("N
    tokens per language/source/domain") behind every pretraining data
    recipe.

    The running sum is a window over (md5(key), key) within the stratum —
    same single-shuffle shape as ``stratified_exact_sample``, same
    engine-portable determinism: the kept set is a pure function of the
    data, so the oracle reproduces it exactly and re-runs never reshuffle
    prior decisions. A row is kept iff its own weight still fits
    (running <= budget); one over-budget row never sneaks in, and a row
    heavier than the whole budget can never be selected."""
    w = (
        Window.partitionBy(*stratum_cols)
        .orderBy(_hash_rank(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__running", F.sum(F.col(weight_col)).over(w))
        .filter(F.col("__running") <= budget)
        .drop("__running")
    )


def mixture_token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weight_col: str,
    total_budget: int,
    mixture: dict[str, float],
) -> DataFrame:
    """Resample a corpus to a TARGET MIXTURE: each stratum (language,
    source, domain) gets ``floor(total_budget * mixture[stratum])`` of the
    weight budget, then rows are kept in deterministic md5 order while the
    stratum's running weight fits — the "40 % web / 30 % code / 30 %
    academic" data-recipe primitive, generalizing `token_budget_sample`'s
    uniform per-stratum budget to explicit proportions.

    The mixture is a literal map baked into the plan (no join, no
    broadcast): the per-row budget lookup is a pure expression, so the
    whole operator stays one window shuffle on the stratum key. Strata
    absent from the mixture have no budget and are dropped entirely —
    exclusion is part of the recipe. Determinism contract as the other
    samplers: membership is a pure function of the data, reproduced
    row-for-row by the SQL oracle, and integer budgets + integer running
    sums make the cut engine-exact.
    """
    if not mixture:
        raise ValueError("mixture must be non-empty")
    for k, frac in mixture.items():
        if frac < 0:
            raise ValueError(f"negative mixture weight for {k!r}")
    from fractions import Fraction

    entries: list[Column] = []
    for k, frac in mixture.items():
        # exact decimal floor: Fraction(str(frac)) reads the fraction as
        # the DECIMAL the caller wrote (0.07 -> 7/100), so the budget is
        # floor(total * decimal) at ANY magnitude — a float product
        # truncates (10000 * 0.07 = 699.99...) and an absolute epsilon
        # stops compensating once budgets reach ~1e9 tokens
        entries += [F.lit(k), F.lit(int(Fraction(total_budget) * Fraction(str(frac))))]
    budget = F.element_at(F.create_map(*entries), F.col(stratum_col))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(_hash_rank(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__budget", budget)
        .filter(F.col("__budget").isNotNull())
        .withColumn("__running", F.sum(F.col(weight_col)).over(w))
        .filter(F.col("__running") <= F.col("__budget"))
        .drop("__budget", "__running")
    )


def weighted_priority_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with the uniform draw derived from the
    key's content hash instead of an RNG. Each row gets priority
    ln(u)/w where u ∈ (0,1) is its md5-uniform and w its weight; the k
    LARGEST priorities are the sample — inclusion probability ∝ weight,
    heavier rows win systematically more often, and the pick is a pure
    function of the data (re-runs, engines, and partitionings all agree —
    the quality-weighted corpus-subset primitive: "sample 10k documents
    proportional to quality/length").

    Scale: priority is a pure map; the cut is a TakeOrderedAndProject
    (per-partition partial top-k, no global sort). The priority is rounded
    to 9 dp before ranking so libm ln() last-ulp differences can't flip a
    rank across engines (the embedding_topk_np contract); ties break on
    the key. Rows with weight <= 0 can never be sampled (filtered)."""
    draw = F.conv(F.substring(_hash_rank(F.col(key_col)), 1, 8), 16, 10).cast(
        "bigint"
    )
    # u in (0,1): (draw+1) / (2^32+1) — never 0 (ln undefined), never 1
    u = (draw + 1).cast("double") / F.lit(float(2**32 + 1))
    priority = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", priority)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Group-aware train/val/test split: near-duplicate CLUSTERS, not
    documents, are the unit of assignment — a hash split on doc ids leaks
    eval content whenever two near-copies land in different splits, the
    contamination that inflates benchmark scores. ``pairs`` is any
    near-dup pair list (winnowing containment, MinHash, embedding LSH);
    clusters resolve via connected components (min reachable id — the
    canonical deterministic key), singletons are their own cluster, and
    the split is the md5 band of the CLUSTER id (same 'test' < 0a ≤
    'val' < 14 ≤ 'train' bands as the content-hash split query), so every
    member of a cluster lands in the same split by construction.

    Adds (cluster_id, split) to ``df``. Scale: the pair graph is the
    output of an aggressive candidate filter (tiny next to the corpus) —
    components resolve on it alone, and the assignment join back is left
    to AQE, which broadcasts the (materialized, size-known) component map
    when it is small and falls back to a shuffled join when a pathological
    pair graph isn't — a forced broadcast hint here would be a driver OOM
    hazard on exactly that pathological input. Deterministic end to end:
    the same corpus always yields the same split — auditable and
    engine-checkable."""
    from scraping_jobsdb_spark.operators.graph import connected_components

    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    tagged = df.join(comp, id_col, "left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    pfx = F.substring(F.md5(cluster.cast("string")), 1, 2)
    return tagged.select(
        *df.columns,
        cluster.alias("cluster_id"),
        F.when(pfx < "0a", "test")
        .when(pfx < "14", "val")
        .otherwise("train")
        .alias("split"),
    )


def top_fraction_per_group(
    df: DataFrame,
    group_cols: list[str],
    score: Column,
    fraction: float,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Keep the best ``fraction`` of rows per group under ``score`` — the
    FineWeb-style per-language quality cut ("keep the top half of each
    language by quality"), and generally any score-ranked stratified
    selection (as opposed to the hash-ranked pseudo-random samplers above).

    The cut keeps ``rank <= ceil(|group| * fraction)`` rows, so every
    non-empty group retains at least one row. Rank is a row_number under
    (score desc, tiebreak_cols) — a total order, so the selected set is
    unique and engine-independent PROVIDED the caller quantizes a
    floating-point score first (round to 9 dp: cross-engine double
    arithmetic can differ in the last ulp and flip near-equal ranks; see
    NOTES on GEMM-vs-expression drift).

    One shuffle on the group key; rank and group count ride the SAME window
    partitioning (a single Window exec), so the count adds no exchange.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(*group_cols).orderBy(
        score.desc(), *[F.col(c) for c in tiebreak_cols]
    )
    wc = Window.partitionBy(*group_cols)
    ranked = df.select(
        "*",
        F.row_number().over(w).alias("__rank"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    return (
        ranked.filter(
            F.col("__rank") <= F.ceil(F.col("__n") * F.lit(fraction))
        )
        .drop("__n")
        .withColumnRenamed("__rank", "rank_in_group")
        .withColumn("rank_in_group", F.col("rank_in_group").cast("bigint"))
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    max_rows: int,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, chosen pseudo-randomly but
    DETERMINISTICALLY (md5-rank of the unique key) — the CCNet/RefinedWeb
    per-domain quota ("no single domain may contribute more than N pages"),
    the frequency-capping twin of ``top_fraction_per_group``'s quality cut.
    Hash order, not arrival order, so a crawler that happens to fetch one
    domain first gets no bias, and re-runs pick the identical set.

    One shuffle on the group key; groups at-or-under the cap pass through
    whole. Output adds ``rank_in_group`` (1-based hash rank) so callers can
    audit which rows sat closest to the cut."""
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_rank(F.col(key_col)), F.col(key_col)
    )
    return (
        df.select("*", F.row_number().over(w).alias("rank_in_group"))
        .filter(F.col("rank_in_group") <= max_rows)
        .withColumn("rank_in_group", F.col("rank_in_group").cast("bigint"))
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    n_tokens_col: str,
    capacity: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-``capacity`` training examples by
    concatenation order — the sequence-packing step that turns a curated
    corpus into equal-length examples (GPT-style pretraining packs docs
    back-to-back and cuts every ``capacity`` tokens; a doc may straddle a
    cut). Order is the deterministic md5-rank of ``key_col`` (the same
    shuffle-the-corpus-then-concatenate posture as token_budget_sample),
    optionally per ``group_cols`` stream (e.g. one packing stream per
    language).

    Output per doc: ``pack_start`` (token offset in the concatenated
    stream), ``bin_first``/``bin_last`` (the examples it lands in:
    floor(start/capacity) .. floor((end-1)/capacity)) and ``n_bins`` —
    enough for a writer to materialize examples with documents split at
    exact token boundaries. Zero-token docs occupy no span: bin_last <
    bin_first and n_bins = 0.

    All-integer (a running SUM window — one shuffle on the group key, or a
    single global window partition when ``group_cols`` is None, matching
    the oracle exactly). At 100 TB pack per shard/group: the global form's
    single-partition window is the documented small-N/driver-side variant.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    parts = [F.col(c) for c in (group_cols or [])]
    w = (
        Window.partitionBy(*parts)
        .orderBy(_hash_rank(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tokens_col).cast("bigint")
    running = F.sum(n).over(w)
    start = (running - n).alias("pack_start")
    out = df.select("*", start, running.alias("__end"))
    return (
        out.select(
            "*",
            F.floor(F.col("pack_start") / capacity).alias("bin_first"),
            F.floor((F.col("__end") - 1) / capacity).alias("bin_last"),
        )
        .withColumn(
            "n_bins",
            F.when(n == 0, F.lit(0).cast("bigint")).otherwise(
                F.col("bin_last") - F.col("bin_first") + 1
            ),
        )
        .drop("__end")
    )


def epochs_expand(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    max_repeats: int = 100,
) -> DataFrame:
    """Materialize a data-repetition recipe: each row is emitted
    ``floor(w)`` times plus one more with probability ``frac(w)`` — the
    "3.5 epochs of wiki, 0.3 of CC" oversampling step of a training-data
    mix, with the fractional epoch decided by a DETERMINISTIC md5 draw of
    the key (the hash_fraction_sample idiom): expected copies equal the
    weight exactly, re-runs and engines agree row-for-row, and growing
    the corpus never re-rolls prior decisions.

    Output = input columns + ``repeat_idx`` (1-based). Weight ≤ 0 emits
    nothing; weights cap at ``max_repeats`` (a mis-joined weight column
    must not explode a row into millions of copies — the guard raises).

    MAP-ONLY: floor + one hash comparison + explode(sequence) — no
    shuffle, no RNG state; at 100 TB the expansion streams through the
    scan partition-locally."""
    if max_repeats < 1:
        raise ValueError(f"max_repeats must be >= 1, got {max_repeats}")
    w = F.col(weight_col).cast("double")
    draw = F.conv(
        F.substring(_hash_rank(F.col(key_col)), 1, 8), 16, 10
    ).cast("bigint")
    # frac(w) compared against the 32-bit uniform draw in INTEGER space —
    # floor(frac * 2^32) exactly as hash_fraction_sample does, so the
    # boundary behavior matches the established sampler family
    extra = F.when(
        draw < F.floor((w - F.floor(w)) * F.lit(2.0**32)).cast("bigint"),
        F.lit(1),
    ).otherwise(F.lit(0))
    n = (F.floor(w).cast("bigint") + extra).alias("__n")
    expanded = df.select("*", n).withColumn(
        "__over", F.col("__n") > max_repeats
    )
    # driver-side contract: fail loudly instead of silently truncating
    # (checked lazily inside the plan via a guarded expression)
    guarded = F.when(
        F.col("__over"),
        F.raise_error(
            F.concat(
                F.lit(f"epochs_expand: weight exceeds max_repeats={max_repeats} for key "),
                F.col(key_col).cast("string"),
            )
        ),
    ).otherwise(F.col("__n"))
    return (
        expanded.withColumn("__n", guarded)
        .filter(F.col("__n") >= 1)
        .select(
            "*", F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("repeat_idx")
        )
        .drop("__n", "__over")
        .withColumn("repeat_idx", F.col("repeat_idx").cast("bigint"))
    )


def temperature_mixture_sample(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-resampled group mixture (the XLM-R / mT5 multilingual
    recipe: sample group g with probability ∝ share_g^α, α<1 flattening
    the head so low-resource groups are upsampled relative to their raw
    share). Allocates an exact ``budget``-document quota across groups by
    the LARGEST-REMAINDER method over q_g = n_g^α / Σ n_h^α, then picks
    each group's quota deterministically in md5(id) order (the engine's
    layout-independent sampling order — re-runs, engines and
    partitionings all agree, unlike seeded df.sample).

    Scale shape: group shares are ONE tiny aggregate (|groups| rows); the
    quota arithmetic runs in windows over that |groups|-row frame (the
    single-partition window is over groups, never rows); selection is one
    rank window on the natural group shuffle + a broadcast quota join.
    No corpus-sized driver collect, no global sort.

    Determinism: n_g^α is the one irrational — quotas are rounded to 9 dp
    and carried as DECIMAL(30,9) before the floor/remainder split, so the
    largest-remainder ranking (remainder desc, group) is exact decimal
    arithmetic cross-engine. Output one row per group:
    (group, n_docs, alloc, n_sampled, id_checksum).
    """
    shares = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    q = (
        F.lit(float(budget))
        * F.pow(F.col("n").cast("double"), F.lit(alpha))
        / F.sum(F.pow(F.col("n").cast("double"), F.lit(alpha))).over(wall)
    )
    quota = shares.select(
        group_col,
        "n",
        F.round(q, 9).cast("decimal(30,9)").alias("q9"),
    ).select(
        group_col,
        "n",
        F.floor("q9").cast("bigint").alias("base"),
        (F.col("q9") - F.floor("q9")).alias("rem"),
    )
    wrem = Window.orderBy(F.col("rem").desc(), F.col(group_col))
    alloc = quota.select(
        group_col,
        "n",
        "base",
        F.row_number().over(wrem).alias("__rr"),
        (F.lit(budget) - F.sum("base").over(wall)).alias("__extra"),
    ).select(
        group_col,
        F.col("n").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("__rr") <= F.col("__extra"), 1).otherwise(0)
        ).alias("alloc"),
    )
    wpick = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    picked = (
        docs.select(group_col, id_col)
        .withColumn("__rk", F.row_number().over(wpick))
        .join(F.broadcast(alloc.select(group_col, "alloc")), group_col)
        .filter(F.col("__rk") <= F.col("alloc"))
    )
    sampled = picked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(id_col).alias("id_checksum"),
    )
    # derive the report from ALLOC, not from picked rows: a group whose
    # largest-remainder allocation is 0 must still appear (the documented
    # one-row-per-group contract), with zero samples and a zero checksum
    return alloc.join(sampled, group_col, "left").select(
        group_col,
        "n_docs",
        "alloc",
        F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint").alias(
            "n_sampled"
        ),
        F.coalesce(F.col("id_checksum"), F.lit(0)).cast("bigint").alias(
            "id_checksum"
        ),
    )
