"""Product quantization (PQ) for embedding search at memory scale.

The third rung of the engine's ANN ladder (brute force → IVF cells → PQ
codes): split each dim-D vector into ``m`` subvectors, k-means each subspace
into ``k`` centroids (the codebook), and store each vector as ``m`` small
codes — 8 bytes/vector at m=8 instead of 256 for float32×64, the difference
between a corpus that fits executor memory and one that doesn't. Query-time
scoring is asymmetric distance computation (ADC): the query precomputes a
(m × k) table of subspace dot products, and each corpus row's approximate
score is ``m`` table lookups — no float vector ever re-read.

Everything is JVM DataFrame logic: training iterates broadcast-join
assignments + posexplode mean recomputation (the ``kmeans_fit`` pattern, one
extra ``subspace`` key); encoding is a map-only argmin over the broadcast
codebook; search scores via a literal lookup-table expression. Codebooks are
m×k×(D/m) doubles — driver-side by design, the same tiny-scalar exception as
checks. Reference: Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — public method, original implementation.

The subquantizer metric is L2 (the classic choice); with L2-normalized
inputs the ADC dot-product score ranks like cosine. Exact re-ranking of the
top ``refine_factor × k`` PQ candidates recovers near-exact recall while
still scanning only codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.similarity import (
    _sql_double_lit,
    _sql_id_lit,
    cosine,
)
from scraping_jobsdb_spark.session import local_df

__all__ = [
    "pq_train", "pq_encode", "pq_topk", "ivfpq_topk",
    "write_ann_index", "ann_index_topk",
    "write_ann_index_txn", "ann_index_txn_add", "ann_index_txn_add_stream_batch",
    "ann_index_txn_delete", "ann_index_txn_maintain", "ann_index_txn_topk",
    "ann_index_topk_batch", "ann_index_txn_topk_batch",
]


def _subvectors(df: DataFrame, vec_col: str, m: int, dim: int) -> DataFrame:
    """Explode (id, vec) → m rows (id, subspace, subvec). Map-only."""
    width = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.slice(F.col(vec_col), j * width + 1, width)
                .cast("array<double>")
                .alias("subvec"),
            )
            for j in range(m)
        ]
    )
    return df.select("*", F.explode(subs).alias("__sv")).select(
        *df.columns, F.col("__sv.subspace").alias("subspace"), F.col("__sv.subvec").alias("subvec")
    )


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Train the codebook: independent k-means per subspace, all subspaces in
    the SAME Spark jobs (the subspace id is just another grouping key, so m
    trainings cost one training's shuffles). Returns
    ``codebook[subspace][cell] = centroid`` (m × k × dim/m floats).

    Seeding is the hash-stride pick per subspace (deterministic, no global
    window); empty cells carry their previous centroid forward."""
    from pyspark.sql import Window

    width = dim // m
    subs = _subvectors(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, m, dim
    ).select(F.col(id_col).alias("vid"), "subspace", "subvec")

    n = corpus.count()
    stride = max(1, n // max(1, k * 4))
    seeded = (
        subs.filter(F.pmod(F.xxhash64(F.col("vid")), F.lit(stride)) == 0)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("subspace").orderBy(F.col("vid"))
            ),
        )
        .filter(F.col("__rn") <= k)
        .select("subspace", (F.col("__rn") - 1).alias("cell"), "subvec")
    )
    codebook: dict[tuple[int, int], list[float]] = {
        (r.subspace, r.cell): [float(x) for x in r.subvec] for r in seeded.collect()
    }
    # degenerate tiny corpora: pad missing cells with the subspace's first
    # centroid so the codebook is always m × k
    for j in range(m):
        first = codebook.get((j, 0), [0.0] * width)
        for c in range(k):
            codebook.setdefault((j, c), first)

    spark = corpus.sparkSession
    for _ in range(max_iter):
        # local_df: Arrow/JVM-backed — a parallelize-backed codebook frame
        # re-pays a Python-worker round per partition per iteration
        cb_df = F.broadcast(
            local_df(
                spark,
                [(j, c, v) for (j, c), v in sorted(codebook.items())],
                "subspace int, cell int, centroid array<double>",
            )
        )
        # E-step argmin as a MAP-SIDE-COMBINING min(struct) aggregate over
        # the k×-expanded broadcast join: the partial aggregate collapses
        # each (vid, subspace) group to one row BEFORE the shuffle, so the
        # exchange moves n×m rows, not n×m×k — the old row_number window
        # form shuffled and SORTED the full expansion every iteration
        # (~1.7× on the whole training at sf0.1). Same _l2sq per joined
        # row, struct-min ties break (d asc, cell asc) exactly like the
        # window's ordering, and (d, cell) is unique per group, so the
        # codebook is BIT-IDENTICAL to the window form (pinned by test).
        best = F.min(
            F.struct(
                F.col("__d").alias("d"),
                F.col("cell").alias("cell"),
                F.col("subvec").alias("subvec"),
            )
        )
        assigned = (
            subs.join(cb_df, "subspace")
            .withColumn("__d", _l2sq(F.col("subvec"), F.col("centroid")))
            .groupBy("vid", "subspace")
            .agg(best.alias("b"))
            .select(
                "subspace",
                F.col("b.cell").alias("cell"),
                F.col("b.subvec").alias("subvec"),
            )
        )
        means = (
            assigned.select("subspace", "cell", F.posexplode("subvec").alias("pos", "val"))
            .groupBy("subspace", "cell", "pos")
            .agg(F.avg("val").alias("mean"))
            .groupBy("subspace", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("pm"))
            .select(
                "subspace",
                "cell",
                F.transform("pm", lambda s: s.mean).alias("centroid"),
            )
        )
        updated = {
            (r.subspace, r.cell): [float(x) for x in r.centroid]
            for r in means.collect()
        }
        codebook = {key: updated.get(key, prev) for key, prev in codebook.items()}

    return [
        [codebook[(j, c)] for c in range(k)] for j in range(m)
    ]


def _stack_vectors(series, dim: int, op: str):
    """Worker-side vstack with a DESCRIPTIVE failure mode: the Arrow encode
    kernels require non-null fixed-width vectors (a bare ``np.vstack`` over
    a column containing None raises an opaque shape error deep in the
    worker, where the ``arrow=False`` expression path would have yielded
    null codes). Raising here names the operator and the fix."""
    import numpy as np

    vals = series.to_numpy()
    bad = [i for i, v in enumerate(vals) if v is None or len(v) != dim]
    if bad:
        v = vals[bad[0]]
        raise ValueError(
            f"{op}: Arrow encode path requires non-null width-{dim} "
            f"vectors; row {bad[0]} of this batch is "
            f"{'NULL' if v is None else f'width-{len(v)}'} — filter/fix "
            f"upstream or call with arrow=False for null-tolerant codes"
        )
    return np.vstack(vals).astype(np.float64)


def _codes_expr(codebook: list[list[list[float]]], vec_col: str):
    """The ``codes array<int>`` expression: per-subspace map-only argmin
    against the literal codebook. Ragged codebooks (sub-codebooks of
    differing length) are legal: each subspace argmins over its OWN cell
    list. A NULL vector yields NULL codes (without the guard the null
    distances sort FIRST in the struct argmin and a null row silently
    encodes as cell 0 everywhere — a wrong answer, not an error)."""
    m = len(codebook)
    width = len(codebook[0][0])

    def best_cell(j: int) -> str:
        # argmin as array_min over (distance, cell) structs: lexicographic
        # struct comparison picks the smallest distance, ties to the lowest
        # cell. Linear expression size — a chained when/otherwise here would
        # duplicate the accumulator per step and explode exponentially.
        # Emitted as SQL text (m × k × width literals through py4j cost
        # ~0.5 s of driver wall per encode plan, r14); D-suffixed
        # shortest-repr literals round-trip to identical doubles and the
        # fold order is unchanged.
        sub = f"CAST(slice(`{vec_col}`, {j * width + 1}, {width}) AS ARRAY<DOUBLE>)"
        terms = []
        for c in range(len(codebook[j])):
            lits = ", ".join(_sql_double_lit(x) for x in codebook[j][c])
            d = (
                f"aggregate(zip_with({sub}, array({lits}), "
                f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
            )
            terms.append(f"named_struct('d', {d}, 'c', {c})")
        return f"array_min(array({', '.join(terms)})).c"

    cells = ", ".join(best_cell(j) for j in range(m))
    return F.expr(
        f"CASE WHEN `{vec_col}` IS NOT NULL THEN array({cells}) END"
    )


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """(id, codes array<int>): map-only argmin against the codebook — no
    join, no shuffle.

    ``arrow=True`` encodes each batch with ONE numpy kernel per subspace
    (blocked (n, k) squared-distance argmin — the same kernel
    ``_encode_with_cell`` uses), instead of m×k interpreted Catalyst folds
    per row: the expression form was the single largest leg of the
    exhaustive-PQ bench row (~3.9 s of 7.8 at sf0.1). Tie-breaks match the
    expression form exactly (np.argmin keeps the FIRST minimum = lowest
    code), and on an INTEGER-VALUED codebook (the hash-oracled gate
    configuration) every distance is an exact integer in both paths, so
    codes agree bit-for-bit (pinned by test). The DEFAULT is
    ``arrow=False`` (the pure-expression, whole-stage-JVM plan) because on
    a TRAINED float codebook (``pq_train`` output) numpy's blocked
    squared-distance sum and the Catalyst fold can round differently and
    flip argmin on a near-tie — callers with integer-domain codebooks (or
    who accept near-tie divergence for the ~2× encode speedup) opt in
    explicitly. The Arrow path requires non-null fixed-width vectors and
    raises a descriptive error otherwise (filter nulls upstream, as the
    gate queries do)."""
    if not arrow:
        return corpus.select(
            F.col(id_col), _codes_expr(codebook, vec_col).alias("codes")
        )
    import numpy as np

    from scraping_jobsdb_spark.session import ship_package

    ship_package(corpus.sparkSession)
    m = len(codebook)
    width = len(codebook[0][0])
    sub_cents = [np.asarray(codebook[j], dtype=np.float64) for j in range(m)]
    idt = dict(corpus.dtypes)[id_col]

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _stack_vectors(pdf[vec_col], m * width, "pq_encode")
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = X[:, j * width : (j + 1) * width]
                d = ((sub[:, None, :] - sub_cents[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": [r.tolist() for r in codes],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} {idt}, codes array<int>"
    )


def _encode_with_cell(
    df: DataFrame,
    codebook: list[list[list[float]]],
    cent_rows,
    id_col: str,
    vec_col: str,
    arrow: bool = True,
) -> DataFrame:
    """(id, codes, cell) in ONE map-only pass. PQ codes and the IVF cell
    assignment are both pure functions of the row — the pre-r7 shape
    derived them as two frames and equi-joined them back on the id, paying
    a full shuffle join (plus a second scan) for nothing. Every index
    write/add path goes through here.

    ``arrow=True`` (default) computes both in ONE Arrow-batched numpy
    kernel — per subspace a blocked (n, k) squared-distance argmin, plus
    one (n, cells) cosine matmul — instead of m×k interpreted Catalyst
    folds per row (the LSH-signature lesson: HOF folds evaluate
    per-element; measured ~2× on the whole index write at sf0.1).
    Tie-breaks match the expression form exactly (np.argmin keeps the
    FIRST minimum = lowest cell; centroid ids are processed sorted), and
    the zero-norm guards mirror ``_cell_expr``; codes/cells agree with the
    expression path on the gate corpus (pinned by test). The expression
    form remains for plans that must stay whole-stage-JVM."""
    if not arrow:
        return df.select(
            F.col(id_col),
            _codes_expr(codebook, vec_col).alias("codes"),
            _cell_expr(cent_rows, vec_col).alias("cell"),
        )
    import numpy as np

    from scraping_jobsdb_spark.session import ship_package

    ship_package(df.sparkSession)
    m = len(codebook)
    width = len(codebook[0][0])
    sub_cents = [np.asarray(codebook[j], dtype=np.float64) for j in range(m)]
    cents = sorted((int(c), list(map(float, v))) for c, v in cent_rows)
    cell_ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    C = np.vstack([v for _, v in cents]).astype(np.float64)
    cnorm = np.sqrt((C * C).sum(1))
    cnorm[cnorm == 0.0] = 1.0
    idt = dict(df.dtypes)[id_col]

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _stack_vectors(pdf[vec_col], m * width, "_encode_with_cell")
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = X[:, j * width : (j + 1) * width]
                d = ((sub[:, None, :] - sub_cents[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = np.argmin(d, axis=1)
            vn = np.maximum(np.sqrt((X * X).sum(1)), 1e-12)
            cos = (X @ C.T) / (vn[:, None] * cnorm[None, :])
            cells = cell_ids[np.argmax(cos, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": [r.tolist() for r in codes],
                    "cell": cells,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} {idt}, codes array<int>, cell int"
    )


def _adc_score(qvec, codebook: list[list[list[float]]]):
    """ADC score expression for ONE query vector over a ``codes`` column:
    T[j][c] = dot(q_j, centroid_jc) baked as literal arrays; the row score
    is m element_at lookups summed — the scan never touches floats.

    Built as ONE SQL string (``F.expr``) rather than m×k ``F.lit`` Column
    calls: the literal tables cost ~400 py4j round-trips per query vector
    (driver wall, guide §5). ``repr(float)`` round-trips exactly and the
    ``D`` suffix makes the parser produce the same IEEE double as
    ``F.lit`` would."""
    m = len(codebook)
    width = len(codebook[0][0])
    terms = []
    for j in range(m):
        vals = ", ".join(
            repr(
                sum(
                    float(qvec[j * width + i]) * codebook[j][c][i]
                    for i in range(width)
                )
            )
            + "D"
            for c in range(len(codebook[j]))
        )
        terms.append(f"element_at(array({vals}), codes[{j}] + 1)")
    return F.expr(" + ".join(terms))


def pq_topk(
    codes: DataFrame,
    codebook: list[list[list[float]]],
    query: DataFrame,
    k: int = 10,
    refine_with: DataFrame | None = None,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate dot-product top-k over PQ codes (ADC).

    Query vectors are collected (tiny by contract, same as brute_force_topk's
    broadcast) and each becomes a literal m×k lookup table; a corpus row's
    score is m ``element_at`` lookups on its codes — the scan never touches
    float vectors. With ``refine_with`` (the raw corpus), the top
    ``refine_factor × k`` PQ candidates per query are re-ranked by exact
    cosine — candidates join back by id, so the full-precision read is
    |candidates|, not |corpus|. Returns (query_id, vec_id, rank)."""
    from pyspark.sql import Window

    q_rows = query.select(id_col, vec_col).collect()

    scored = None
    for qid, qvec in ((r[0], r[1]) for r in q_rows):
        part = codes.select(
            F.lit(qid).alias("query_id"),
            F.col(id_col),
            _adc_score(qvec, codebook).alias("pq_score"),
        ).filter(F.col(id_col) != qid)
        scored = part if scored is None else scored.unionByName(part)

    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col(id_col).asc()
    )
    n_keep = k * refine_factor if refine_with is not None else k
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_keep)
    )
    if refine_with is None:
        return top.select("query_id", id_col, "rank")

    qv = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cv = refine_with.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    rescored = (
        top.select("query_id", id_col)
        .join(cv, id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", id_col, cosine(F.col("cvec"), F.col("qvec")).alias("cos")
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )


def _centroid_rows(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None,
) -> list[tuple[int, list[float]]]:
    """Coarse-quantizer centroids as driver-side rows (tiny by contract):
    trained (cell, centroid) when given, else hash-stride-seeded corpus
    vectors keyed by their own ids."""
    from scraping_jobsdb_spark.operators.similarity import _seed_centroids

    if centroids is not None:
        rows = centroids.select("cell", "centroid").collect()
    else:
        rows = _seed_centroids(corpus, n_centroids, id_col, vec_col).collect()
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _cell_expr(cent_rows: list[tuple[int, list[float]]], vec_col: str):
    """Nearest-centroid cell as a PURE map expression: lexicographic
    struct-min over (-cosine, cell) literals — no crossJoin, no window, no
    shuffle; ties go to the lowest cell id. Emitted as ONE parsed SQL
    string (k × dim literals through py4j cost ~0.5 s of driver wall per
    plan, r14); literals/fold order replicate the Column-DSL tree
    exactly."""
    import math

    vec_cast = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    # Zero-guard mirrors the `or 1.0` on the centroid norm and the
    # driver-side _probe_cells: an all-zero corpus vector must score 0
    # (not NaN) so executor-side cell assignment and driver-side probe
    # scoring agree on degenerate rows.
    vnorm = (
        f"greatest(sqrt(aggregate({vec_cast}, 0.0D, "
        f"(acc, v) -> acc + v * v)), {1e-12!r}D)"
    )
    terms = []
    for cid, cvec in cent_rows:
        norm = math.sqrt(sum(float(x) * float(x) for x in cvec)) or 1.0
        lits = ", ".join(_sql_double_lit(x) for x in cvec)
        dot = (
            f"aggregate(zip_with({vec_cast}, array({lits}), "
            f"(a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(
            f"named_struct('d', -({dot} / ({vnorm} * "
            f"{_sql_double_lit(norm)})), 'c', {_sql_id_lit(cid)})"
        )
    return F.expr(f"array_min(array({', '.join(terms)})).c")


def _probe_cells(
    qvec, cent_rows: list[tuple[int, list[float]]], n_probe: int
) -> list[int]:
    """The n_probe nearest centroid cells for one query vector, computed
    driver-side (centroids are codebook-scale scalars); ties to the lowest
    cell id — deterministic."""
    import math

    scoredc = []
    for cid, cvec in cent_rows:
        dot = sum(float(a) * b for a, b in zip(qvec, cvec))
        nq = math.sqrt(sum(float(a) * a for a in qvec)) or 1.0
        nc = math.sqrt(sum(b * b for b in cvec)) or 1.0
        scoredc.append((-dot / (nq * nc), cid))
    return [cid for _, cid in sorted(scoredc)[:n_probe]]


def _adc_rank_refine(
    codes_for_cells,
    q_rows,
    cent_rows,
    codebook,
    n_probe: int,
    k: int,
    refine_factor: int,
    refine_with: DataFrame | None,
    query: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF-ADC tail: per-query cell-filtered ADC scoring, partial
    top ``refine_factor × k``, optional exact-cosine re-rank. Deterministic
    under (score desc, id) total order."""
    from pyspark.sql import Window

    scored = None
    for qid, qvec in ((r[0], r[1]) for r in q_rows):
        part = (
            codes_for_cells(_probe_cells(qvec, cent_rows, n_probe))
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col),
                _adc_score(qvec, codebook).alias("pq_score"),
            )
            .filter(F.col(id_col) != qid)
        )
        scored = part if scored is None else scored.unionByName(part)

    return _topk_refine_tail(
        scored, k, refine_factor, refine_with, query, id_col, vec_col
    )


def _topk_refine_tail(
    scored: DataFrame,
    k: int,
    refine_factor: int,
    refine_with: DataFrame | None,
    query: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared top-k + optional exact-re-rank tail over a
    (query_id, id, pq_score) stream — used by both the per-query-plan and
    the batch scorers, so the two provably share the candidate-cut and
    re-rank semantics."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col(id_col).asc()
    )
    n_keep = k * refine_factor if refine_with is not None else k
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= n_keep
    )
    if refine_with is None:
        return top.select("query_id", id_col, "rank")
    qv = query.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = refine_with.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    rescored = (
        top.select("query_id", id_col)
        .join(cv, id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", id_col, cosine(F.col("cvec"), F.col("qvec")).alias("cos")
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )


def _adc_rank_refine_batch(
    codes_for_cells,
    q_rows,
    cent_rows,
    codebook,
    n_probe: int,
    k: int,
    refine_factor: int,
    refine_with: DataFrame | None,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    spark,
) -> DataFrame:
    """BATCH IVF-ADC scorer — the many-queries scale path of the shared
    tail. The per-query form builds Q plan branches (one cell-filtered
    subplan + union per query): fine for interactive k-NN, quadratic
    planning pain at thousands of queries. Here the plan size is O(1) in
    Q:

      1. per query (driver, tiny): probe cells + the m×k ADC lookup table,
         computed with the SAME Python-float arithmetic ``_adc_score``
         bakes into literals — so every score bit matches the per-query
         form (pinned by test);
      2. ONE pruned scan of the union of all probed cells;
      3. a broadcast equi-join codes ⋈ (query_id, cell) pairs — only ids
         travel; the ADC tables ride the scoring UDF's closure ONCE per
         task, not per row;
      4. vectorized lookup scoring: per Arrow batch, score = ordered
         accumulation over subspaces of table-takes (same left-assoc
         float64 order as the expression chain — bit-identical);
      5. the shared ``_topk_refine_tail``.

    Queries are still collected driver-side (the family contract: a query
    set is tiny next to the corpus); what this removes is the per-query
    PLAN cost, shuffle fan-in of Q unions, and Q window partitions over
    separate streams."""
    import numpy as np
    import pandas as pd

    from scraping_jobsdb_spark.session import ship_package

    ship_package(spark)
    # per-subspace offsets into the flattened table (ragged-codebook aware)
    offs = [0]
    for sub in codebook:
        offs.append(offs[-1] + len(sub))
    m = len(codebook)

    tables: dict = {}
    probe_pairs = []
    for qid, qvec in ((r[0], r[1]) for r in q_rows):
        flat = []
        width = len(codebook[0][0])
        for j in range(m):
            for c in range(len(codebook[j])):
                flat.append(
                    sum(
                        float(qvec[j * width + i]) * codebook[j][c][i]
                        for i in range(width)
                    )
                )
        tables[qid] = np.asarray(flat, dtype=np.float64)
        for cell in _probe_cells(qvec, cent_rows, n_probe):
            probe_pairs.append((qid, cell))

    all_cells = sorted({c for _, c in probe_pairs})
    # Derive both id types from the actual frames (the per-query form is
    # id-type-agnostic; hard-coding bigint here broke string-id corpora —
    # ADVICE r6). Query ids and corpus ids may even differ in type.
    qidt = dict(query.dtypes)[id_col]
    codes_df = codes_for_cells(all_cells)
    cidt = dict(codes_df.dtypes)[id_col]
    qp = F.broadcast(
        local_df(spark, probe_pairs, f"query_id {qidt}, cell int")
    )
    pairs = codes_df.join(qp, "cell")

    offs_np = np.asarray(offs[:-1], dtype=np.int64)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes_m = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            tbl = np.vstack([tables[q] for q in pdf["query_id"]])
            idx = codes_m + offs_np  # (n, m) flat positions
            acc = None
            for j in range(m):  # ordered accumulation == the literal chain
                term = np.take_along_axis(tbl, idx[:, j : j + 1], axis=1)[:, 0]
                acc = term if acc is None else acc + term
            out = pdf[["query_id", id_col]].copy()
            out["pq_score"] = acc
            yield out[out["query_id"] != out[id_col]]

    scored = pairs.select("query_id", id_col, "codes").mapInPandas(
        score, f"query_id {qidt}, {id_col} {cidt}, pq_score double"
    )
    return _topk_refine_tail(
        scored, k, refine_factor, refine_with, query, id_col, vec_col
    )


def ivfpq_topk(
    corpus: DataFrame,
    query: DataFrame,
    codebook: list[list[list[float]]],
    n_centroids: int = 10,
    n_probe: int = 3,
    k: int = 10,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN — the full FAISS-IVFADC shape, composing the engine's ANN
    ladder end to end: a coarse quantizer prunes the corpus to ``n_probe``
    cells per query, ADC scores ONLY the surviving cells' codes (never
    touching float vectors), and the top ``refine_factor × k`` candidates
    re-rank by exact cosine. This in-memory form recomputes codes per call;
    ``write_ann_index`` / ``ann_index_topk`` persist them partitioned by
    cell so the probe becomes real partition pruning — the operator whose
    cost model survives the scale-up that retires the exact GEMM path
    (VERDICT r3's watch-list item).

    Physical shape, stage by stage:
    - cell assignment: argmin over LITERAL centroid structs — pure map
      expression, no crossJoin, no window shuffle (a tighter plan than
      ``ivf_topk``'s broadcast-crossJoin + row_number assignment);
    - encode+assign fuse into ONE map-only projection over the corpus scan;
    - per-query probe lists are computed driver-side from the tiny centroid
      set (the codebook-scale scalar exception) and baked into ``isin``
      filters — exactly what partition pruning consumes at scale;
    - ADC + partial top-k, then an id-equi-join re-rank over |candidates|
      float rows.

    ``centroids`` (cell, centroid) from ``kmeans_fit`` replaces the
    hash-stride seeding. Returns (query_id, vec_id, rank), deterministic
    under (score desc, id) total order."""
    cent_rows = _centroid_rows(corpus, n_centroids, id_col, vec_col, centroids)
    coded = _encode_with_cell(corpus, codebook, cent_rows, id_col, vec_col)
    q_rows = query.select(id_col, vec_col).collect()
    return _adc_rank_refine(
        lambda cells: coded.filter(F.col("cell").isin(cells)),
        q_rows,
        cent_rows,
        codebook,
        n_probe,
        k,
        refine_factor,
        corpus,
        query,
        id_col,
        vec_col,
    )


def write_ann_index(
    corpus: DataFrame,
    path: str,
    codebook: list[list[list[float]]],
    n_centroids: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF-PQ index: codes written PARTITIONED BY cell
    (``<path>/codes/cell=N/``), centroids and the codebook as tiny parquet
    side tables. This is the storage layout the ivfpq docstring promises:
    a probe reads ``n_probe`` of ``n_centroids`` directories — the scan
    never lists, opens, or decodes the other cells' files (asserted via
    PartitionFilters in tests). One map-only encode+assign pass over the
    corpus; the index is 8 bytes/vector + two codebook-scale side tables."""
    import os

    spark = corpus.sparkSession
    cent_rows = _centroid_rows(corpus, n_centroids, id_col, vec_col, centroids)
    coded = _encode_with_cell(corpus, codebook, cent_rows, id_col, vec_col)
    coded.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    local_df(
        spark, cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    m = len(codebook)
    cb_rows = [
        (j, c, codebook[j][c]) for j in range(m) for c in range(len(codebook[j]))
    ]
    local_df(
        spark, cb_rows, "subspace int, cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "codebook"))


def _load_index_sides(spark, path: str):
    """Load a persisted index's two side tables driver-side: centroid rows
    and the codebook rebuilt EXACTLY as stored — per-subspace cell lists,
    NOT a dense 0..max-cell rectangle. ``write_ann_index`` legally writes
    ragged codebooks (sub-codebooks of differing length, e.g. k-means that
    converged to fewer cells in one subspace); assuming the global max
    cell count raised KeyError on the missing (subspace, cell) pairs.
    Each subspace's cells must still be contiguous 0..len-1 (they are code
    values — pq_encode indexes the sub-codebook by them), which is checked."""
    import os

    cent_rows = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    ]
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(os.path.join(path, "codebook")).collect():
        by_sub.setdefault(r.subspace, {})[r.cell] = [float(x) for x in r.centroid]
    m = 1 + max(by_sub)
    codebook = []
    for j in range(m):
        cells = by_sub.get(j, {})
        if sorted(cells) != list(range(len(cells))):
            raise ValueError(
                f"{path}: codebook subspace {j} cells {sorted(cells)} are not "
                "contiguous from 0 — corrupt or partially-written side table"
            )
        codebook.append([cells[c] for c in range(len(cells))])
    return cent_rows, codebook


def ann_index_add(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedupe_ids: bool = False,
) -> None:
    """Admit new vectors into a persisted ANN index WITHOUT rebuilding it:
    the stored quantizer (centroids + codebook side tables) encodes and
    cell-assigns the newcomers in one map-only pass, and their codes
    APPEND into the existing cell directories — the index's coarse
    structure is frozen (exactly FAISS's add-after-train contract), so
    probes see old and new vectors identically and recall for existing
    queries is untouched. Cost: O(|new|), independent of index size.
    Retrain + rewrite (``write_ann_index``) when drift makes the frozen
    quantizer a bad fit — same trade as every IVF deployment.

    Admitting an id already in the index appends a SECOND code row for it
    (both rows surface in probes). Pass ``dedupe_ids=True`` to anti-join
    the newcomers against the stored ids first — that check scans the
    index's id column (column-pruned, but O(index), trading the O(|new|)
    admission cost for the guard), so the default leaves id uniqueness to
    the caller's upstream pipeline."""
    import os

    cent_rows, codebook = _load_index_sides(spark, path)
    if dedupe_ids:
        existing = spark.read.parquet(os.path.join(path, "codes")).select(id_col)
        new_vectors = new_vectors.join(existing, id_col, "left_anti")
    coded = _encode_with_cell(new_vectors, codebook, cent_rows, id_col, vec_col)
    coded.write.partitionBy("cell").mode("append").parquet(
        os.path.join(path, "codes")
    )


def ann_index_topk(
    spark,
    path: str,
    query: DataFrame,
    n_probe: int = 3,
    k: int = 10,
    refine_factor: int = 4,
    refine_with: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted ANN index (``write_ann_index`` layout): load the
    two codebook-scale side tables driver-side, bake each query's probe
    list into a ``cell IN (...)`` filter over the partitioned codes table —
    Spark's partition pruning then restricts the scan to the probed
    directories (the at-scale point of the whole structure) — ADC-score,
    and optionally exact-re-rank against ``refine_with`` (the raw vector
    table). Same determinism contract as ``ivfpq_topk``; given the same
    codebook and centroids the two return identical rows (tested)."""
    import os

    cent_rows, codebook = _load_index_sides(spark, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    q_rows = query.select(id_col, vec_col).collect()
    return _adc_rank_refine(
        lambda cells: codes.filter(F.col("cell").isin(cells)),
        q_rows,
        cent_rows,
        codebook,
        n_probe,
        k,
        refine_factor,
        refine_with,
        query,
        id_col,
        vec_col,
    )


# --------------------------------------------------------------------------
# Transactional ANN index: the production posture of the persisted index.
#
# The plain-parquet layout above (write_ann_index/ann_index_add) relies on
# directory listing: a crashed `mode("append")` leaves partial part-files
# VISIBLE to the next probe, concurrent adds can interleave, and there is no
# way to delete a vector without rewriting cell directories. Backing the
# codes table with the engine's own txn layer (sources/txn.py) closes all
# three with machinery that already exists:
#   - adds are ONE atomic commit (crash ⇒ invisible orphans, vacuum GCs);
#   - streaming admission is epoch-idempotent (stream_epoch_append — the
#     Delta txnAppId/txnVersion contract), so a foreachBatch maintainer
#     replaying an epoch appends nothing twice;
#   - vector DELETION is a merge-on-read deletion vector (delete_where_dv):
#     an embedding-store GDPR erasure costs one tiny DV parquet, no cell
#     rewrite, and compaction is the GC;
#   - probes TIME TRAVEL (version=) — reproduce any historical search;
#   - partition pruning becomes manifest-stats FILE SKIPPING: codes are
#     repartitionByRange(cell) so each data file covers a contiguous cell
#     range with tight min/max stats, and a probe reads the union of
#     read_pruned(cell==c) scans — unprobed cells' files are never opened,
#     the same physical guarantee as the directory layout, now atomic.
# --------------------------------------------------------------------------


def _annx_codes(spark, path: str):
    import os

    from scraping_jobsdb_spark.sources.txn import TxnTable

    return TxnTable(spark, os.path.join(path, "codes"))


def write_ann_index_txn(
    corpus: DataFrame,
    path: str,
    codebook: list[list[list[float]]],
    n_centroids: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    target_files: int | None = None,
) -> None:
    """Materialize the transactional ANN index: codes in a TxnTable with
    per-file cell stats (``stats_cols=["cell"]``), centroids/codebook as
    tiny TxnTables. One map-only encode+assign pass, one range-repartition
    on cell (contiguous-cell files ⇒ tight stats ⇒ probe file skipping),
    three atomic commits. ``target_files`` pins the codes file count
    (default: planner/AQE-sized — a small corpus may coalesce to one file,
    which is correct but gives file skipping nothing to skip). Layout
    mirrors ``write_ann_index`` (pq docstrings cite the reference parity
    points there)."""
    import os

    from scraping_jobsdb_spark.sources.txn import TxnTable

    spark = corpus.sparkSession
    cent_rows = _centroid_rows(corpus, n_centroids, id_col, vec_col, centroids)
    coded = _encode_with_cell(corpus, codebook, cent_rows, id_col, vec_col)
    parted = (
        coded.repartitionByRange(target_files, "cell")
        if target_files
        else coded.repartitionByRange("cell")
    )
    TxnTable.create(
        spark,
        os.path.join(path, "codes"),
        parted,
        stats_cols=["cell"],
    )
    # side tables are codebook-scale and already sit on the driver:
    # create_local writes them with pyarrow + a manifest publish — ZERO
    # Spark jobs (a Spark write of a 10-row frame costs two fixed job
    # round-trips per table, pure dead weight on the lifecycle's clock)
    TxnTable.create_local(
        spark,
        os.path.join(path, "centroids"),
        [(int(c), [float(x) for x in v]) for c, v in cent_rows],
        "cell int, centroid array<double>",
    )
    m = len(codebook)
    cb_rows = [
        (j, c, [float(x) for x in codebook[j][c]])
        for j in range(m)
        for c in range(len(codebook[j]))
    ]
    TxnTable.create_local(
        spark,
        os.path.join(path, "codebook"),
        cb_rows,
        "subspace int, cell int, centroid array<double>",
    )


def _load_index_sides_txn(spark, path: str, version: int | None = None):
    """Driver-side side tables from their TxnTables (same per-subspace
    reconstruction as ``_load_index_sides``). ``version`` pins the CODES
    version only — the quantizer is frozen after training by contract
    (add-after-train), so version-1 side tables describe every codes
    version. A RETRAINED-in-place quantizer (side tables at version > 1)
    breaks that contract for historical probes: old codes would silently
    decode against the new codebook — so a time-travel request under
    retrained sides raises instead of returning wrong neighbors
    (ADVICE r6)."""
    import os

    from scraping_jobsdb_spark.sources.txn import TxnTable

    cent_t = TxnTable(spark, os.path.join(path, "centroids"))
    cb_t = TxnTable(spark, os.path.join(path, "codebook"))
    if version is not None and (cent_t.version() > 1 or cb_t.version() > 1):
        raise ValueError(
            f"{path}: time-travel probe (version={version}) under a "
            "RETRAINED quantizer — the centroids/codebook tables have "
            "commits after index creation, so historical codes no longer "
            "decode under the current side tables. Probe the current "
            "version, or rebuild the index at a fresh path per training."
        )
    # tiny-by-contract side tables: driver-side pyarrow read (zero Spark
    # jobs), falling back to a Spark scan only when the snapshot carries
    # engine state a local read can't honor (DVs, buckets)
    cent_local = cent_t.read_rows_local()
    cb_local = cb_t.read_rows_local()
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in (
            cent_local
            if cent_local is not None
            else (row.asDict() for row in cent_t.read().collect())
        )
    ]
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in (
        cb_local
        if cb_local is not None
        else (row.asDict() for row in cb_t.read().collect())
    ):
        by_sub.setdefault(r["subspace"], {})[r["cell"]] = [
            float(x) for x in r["centroid"]
        ]
    m = 1 + max(by_sub)
    codebook = []
    for j in range(m):
        cells = by_sub.get(j, {})
        if sorted(cells) != list(range(len(cells))):
            raise ValueError(
                f"{path}: codebook subspace {j} cells {sorted(cells)} are not "
                "contiguous from 0 — corrupt side table"
            )
        codebook.append([cells[c] for c in range(len(cells))])
    return cent_rows, codebook


def ann_index_txn_add(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedupe_ids: bool = False,
) -> int:
    """FAISS add-after-train as ONE atomic commit: encode + cell-assign the
    newcomers with the stored (frozen) quantizer, range-repartition on
    cell, append. O(|new|); concurrent adds serialize through the txn OCC
    loop instead of interleaving part-files. Returns the new codes
    version. ``dedupe_ids`` as in ``ann_index_add``."""
    cent_rows, codebook = _load_index_sides_txn(spark, path)
    t = _annx_codes(spark, path)
    if dedupe_ids:
        new_vectors = new_vectors.join(t.read().select(id_col), id_col, "left_anti")
    coded = _encode_with_cell(new_vectors, codebook, cent_rows, id_col, vec_col)
    t.append(coded.repartitionByRange("cell"))
    return t.version()


def ann_index_txn_add_stream_batch(
    spark,
    path: str,
    batch: DataFrame,
    epoch_id: int,
    app_id: str = "annx",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """``foreachBatch`` body for a STREAMING index maintainer: the add is
    epoch-keyed (sources/txn.py stream_epoch_append), so a failure-recovery
    replay of the same (app_id, epoch) appends nothing — exactly-once index
    growth over an embedding stream. Returns code rows appended (0 for a
    recognized replay)."""
    cent_rows, codebook = _load_index_sides_txn(spark, path)
    coded = _encode_with_cell(batch, codebook, cent_rows, id_col, vec_col)
    return _annx_codes(spark, path).stream_epoch_append(
        coded.repartitionByRange("cell"), app_id, epoch_id
    )


def ann_index_txn_delete(
    spark, path: str, cond, id_col: str = "vec_id"
) -> int:
    """Delete vectors from the index WITHOUT rewriting any cell data: a
    merge-on-read deletion vector over the codes table (``cond`` is a
    Column predicate on the codes schema, e.g. ``F.col("vec_id").isin(...)``
    for an erasure list). Deleted vectors vanish from every subsequent
    probe (the DV overlays every read path); time-travel probes at earlier
    versions still see them until compaction materializes. Returns rows
    deleted."""
    return _annx_codes(spark, path).delete_where_dv(cond)


def ann_index_txn_maintain(
    spark, path: str, max_files: int = 64, max_dv_files: int = 8
) -> int | None:
    """Compaction hook for an ingest loop: once the codes table exceeds
    ``max_files`` data files or accumulates more than ``max_dv_files``
    active deletion vectors (maybe_compact's own trigger rules), rewrite it
    through ``zorder_by(["cell"])`` — a single-column z-order is a range
    sort, so the rewrite RESTORES the contiguous-cell file layout (tight
    per-file stats ⇒ probe file skipping) that a plain ``compact()``'s hash
    repartition would destroy — and materializes/drops any DVs (compaction
    is the DV GC). No-op under the thresholds; returns the new file count
    or None."""
    t = _annx_codes(spark, path)
    n_files, n_dvs = t.snapshot_file_counts()
    if n_files <= max_files and n_dvs <= max_dv_files:
        return None
    return t.zorder_by(
        ["cell"],
        target_partitions=min(
            max_files, max(1, spark.sparkContext.defaultParallelism)
        ),
    )


def ann_index_txn_topk(
    spark,
    path: str,
    query: DataFrame,
    n_probe: int = 3,
    k: int = 10,
    refine_factor: int = 4,
    refine_with: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """Probe the transactional index: per query, the probe list becomes
    ONE stats-pruned multi-cell scan (``read_pruned_in``) — manifest-stats
    file skipping opens only files whose cell range intersects a probed cell
    (the range-partitioned layout makes those ranges ~one cell wide), the
    txn-layer guarantee equivalent to the directory layout's partition
    pruning. ``version`` time-travels the probe to any committed snapshot.
    Deterministic ADC + optional exact re-rank, identical tail to
    ``ann_index_topk``."""
    cent_rows, codebook = _load_index_sides_txn(spark, path, version)
    t = _annx_codes(spark, path)
    q_rows = query.select(id_col, vec_col).collect()

    def codes_for_cells(cells):
        # one stats-pruned scan + one DV overlay for the whole probe list
        # (was a per-cell read_pruned union: n_probe scans/overlays per
        # query, ~0.13 s of plan construction each — r14)
        return t.read_pruned_in("cell", cells, version)

    return _adc_rank_refine(
        codes_for_cells,
        q_rows,
        cent_rows,
        codebook,
        n_probe,
        k,
        refine_factor,
        refine_with,
        query,
        id_col,
        vec_col,
    )


def ann_index_topk_batch(
    spark,
    path: str,
    query: DataFrame,
    n_probe: int = 3,
    k: int = 10,
    refine_factor: int = 4,
    refine_with: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch probe of the plain persisted index: row-identical to
    ``ann_index_topk`` (same probe cells, bit-identical ADC scores, shared
    top-k/refine tail — pinned by test) but the plan is O(1) in the query
    count: one cell-pruned scan of the union of probed cells, one broadcast
    (query_id, cell) equi-join, one vectorized scoring stage. Use this once
    a query SET (hundreds+) probes the index; the per-query form stays the
    interactive path."""
    import os

    cent_rows, codebook = _load_index_sides(spark, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    q_rows = query.select(id_col, vec_col).collect()
    return _adc_rank_refine_batch(
        lambda cells: codes.filter(F.col("cell").isin(cells)),
        q_rows,
        cent_rows,
        codebook,
        n_probe,
        k,
        refine_factor,
        refine_with,
        query,
        id_col,
        vec_col,
        spark,
    )


def ann_index_txn_topk_batch(
    spark,
    path: str,
    query: DataFrame,
    n_probe: int = 3,
    k: int = 10,
    refine_factor: int = 4,
    refine_with: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """Batch probe of the TRANSACTIONAL index: ``ann_index_txn_topk``
    semantics (stats-pruned reads, DV overlay, time travel) at
    ``ann_index_topk_batch`` plan cost — ONE pruned multi-cell read instead
    of per-query unions, then the shared batch scorer."""
    cent_rows, codebook = _load_index_sides_txn(spark, path, version)
    t = _annx_codes(spark, path)

    def codes_for_cells(cells):
        # the docstring's "ONE pruned multi-cell read", literally: one
        # stats-pruned scan + one DV overlay for the union of probed
        # cells (was still a per-cell read_pruned union — r14)
        return t.read_pruned_in("cell", cells, version)

    q_rows = query.select(id_col, vec_col).collect()
    return _adc_rank_refine_batch(
        codes_for_cells,
        q_rows,
        cent_rows,
        codebook,
        n_probe,
        k,
        refine_factor,
        refine_with,
        query,
        id_col,
        vec_col,
        spark,
    )
