"""Streaming quality filtering: score an arriving document stream against
a batch-trained naive-Bayes quality model (SURVEY.md §2.7 × the LLM-
pipeline quality family).

This is the deployment shape of every learned quality filter in a
continuous ingestion pipeline (CCNet/LLaMA-style): the model is (re)fitted
OFFLINE over a reference corpus — here ``operators/textops.py nb_train``
— and each micro-batch of new documents is scored ONLINE with a
stream-static join against the broadcast weight table. No retraining on
the hot path; refreshing the model is a redeploy of the static side.

Streaming constraint that shapes the plan: chained stateful aggregations
are unsupported, so the stream side cannot build the (doc, token) tf table
and then re-aggregate per doc. Instead each token OCCURRENCE joins the
weight table and the per-document score is ONE stateful aggregation of
per-occurrence weights — algebraically identical (``Σ_t tf·w(t) ≡
Σ_occurrences w(token)``; DECIMAL addition is exact, so the equivalence is
bit-exact, not approximate) and verified by the shared batch oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["documents_file_stream", "nb_scores_stream"]


def documents_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file-source stream (same symlink-landing-
    directory shape as ``windows.events_file_stream``: at scale this is a
    directory new corpus shards keep arriving into; the checkpoint tracks
    which have been drained)."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream_dir = tempfile.mkdtemp(prefix="sjs_stream_docs_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(stream_dir, "documents.parquet"),
    )
    return spark.readStream.schema(static.schema).parquet(stream_dir)


def nb_scores_stream(
    spark: SparkSession, sf_dir: str, stream_source: DataFrame | None = None
) -> DataFrame:
    """Streaming NB quality scoring plan: train batch-side on the corpus
    (proxy label lang='en', identical to the batch quality_classifier_nb),
    then score documents consumed as a file stream — by default the SAME
    corpus (so the batch oracle doubles as the streaming-parity check);
    pass ``stream_source`` to score a different landing stream against the
    fitted model (the real deployment shape). Returns the streaming
    DataFrame; drain with ``windows.run_stream_to_memory`` (complete mode
    — the per-doc score aggregation is stateful).

    Tokens UNSEEN at fit time score the NB smoothed OOV weight
    ``ln(N_neg+V) - ln(N_pos+V)`` via a LEFT join + coalesce — an inner
    join would silently drop OOV occurrences and make an all-OOV document
    vanish from the scored stream entirely, exactly the junk a quality
    gate exists to catch.
    """
    from ..operators.textops import nb_train, tokens
    from ..sources.tables import fan_out, load_table

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    _, weights, prior, oov = nb_train(docs, label=F.col("lang") == "en")
    # prior and the OOV weight are batch-derived 1-row scalars; lift them
    # into the streaming plan as literals (a stream-static cross join would
    # force a BNLJ into the streaming plan for one constant)
    prior_val = prior.first()[0]
    oov_val = oov.first()[0]

    stream = (
        stream_source
        if stream_source is not None
        else documents_file_stream(spark, sf_dir)
    )
    occurrences = stream.select(
        F.col("doc_id"),
        (F.col("lang") == "en").alias("label"),
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"),
    ).filter(F.col("tok") != "")
    scored = (
        occurrences.join(F.broadcast(weights), "tok", "left")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(
                F.coalesce(
                    F.col("w"), F.lit(oov_val).cast("decimal(18,9)")
                )
            ).alias("__s")
        )
        .select(
            "doc_id",
            "label",
            (F.lit(prior_val).cast("decimal(18,9)") + F.col("__s").cast("decimal(30,9)"))
            .cast("double")
            .alias("score"),
            (
                (
                    F.lit(prior_val).cast("decimal(18,9)")
                    + F.col("__s").cast("decimal(30,9)")
                )
                > 0
            ).alias("predicted"),
        )
    )
    return scored
