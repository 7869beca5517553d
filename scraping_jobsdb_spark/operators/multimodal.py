"""Multimodal (binary) columns: images/audio/video as opaque ``binary`` with
typed metadata (north-star extension; the reference's analogue is the HTML
document lake, SURVEY.md §1.1 item 1 — an unstructured column joined to
relational metadata).

The Spark-side plumbing here is fully real — schemas, Arrow-batched
``mapInPandas`` decode stages, partitioning by modality/shard — while the
actual media decoding is STUBBED: the container ships no image/audio codecs,
so ``decode_image`` raises ``NotImplementedError`` unless handed a
deterministic fake decoder (tests use ``fake_image_decoder``). Swapping in a
real decoder (PIL/ffmpeg) changes one injected callable, nothing else.

Scale notes: binary payloads ride Parquet as page-compressed byte arrays;
decode stages are map-only (no shuffle) and should run on a projection that
carries ONLY (key, content) so Tungsten isn't dragging metadata columns
through Python. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for large media.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "synthetic_media",
    "fake_image_decoder",
    "decode_image",
    "extract_image_features",
]

# An opaque media column with typed metadata — the multimodal table shape.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", IntegerType(), True),
        StructField("content_sha", StringType(), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes with a tiny
    header encoding (width, height) so the fake decoder has real structure to
    parse. Stands in for a binary-file ingest
    (``spark.read.format('binaryFile')``)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
        body = hashlib.sha256(str(i).encode()).digest() * 4
        content = struct.pack(">II", w, h) + body
        rows.append((i, "image", "image/fake", bytearray(content), len(content)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_image_decoder(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: header-declared (w, h) + mean of the
    payload bytes as 'luminance'."""
    if content is None or len(content) < 8:
        raise ValueError("truncated media payload")
    w, h = struct.unpack(">II", content[:8])
    body = content[8:]
    return w, h, int(sum(body) / len(body))


def decode_image(content: bytes) -> tuple[int, int, int]:
    """Real decode hook — intentionally stubbed (no codecs in the runtime).
    Inject ``fake_image_decoder`` (tests) or a PIL-backed callable (prod)."""
    raise NotImplementedError(
        "no image codec available in this runtime; inject a decoder into "
        "extract_image_features(decoder=...)"
    )


def extract_image_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] = decode_image,
) -> DataFrame:
    """Arrow-batched decode/feature stage over a binary column.

    mapInPandas so one Python worker handles a whole Arrow batch of payloads;
    the projection is pruned to (media_id, content) before crossing into
    Python. Per-row decode failures surface as NULL features, never task
    failures (failure isolation as in the fetch stage)."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(media.sparkSession)
    pruned = media.select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_luma": [],
                "content_sha": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                try:
                    w, h, luma = decoder(bytes(content) if content is not None else None)
                    sha = hashlib.sha256(bytes(content)).hexdigest()[:16]
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_luma"].append(luma)
                    out["content_sha"].append(sha)
                except Exception:  # noqa: BLE001 — isolate per-row decode failure
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_luma"].append(None)
                    out["content_sha"].append(None)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)
