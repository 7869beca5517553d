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
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "AUDIO_FEATURES_SCHEMA",
    "synthetic_media",
    "synthetic_video",
    "synthetic_audio",
    "fake_image_decoder",
    "fake_image_resizer",
    "fake_frame_splitter",
    "fake_audio_decoder",
    "decode_image",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
    "extract_audio_features",
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
        StructField("frame_sha", StringType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", IntegerType(), True),
    ]
)


def synthetic_video(spark, n: int = 16, frames_per_video: int = 8) -> DataFrame:
    """Deterministic fake video table: payload = header (n_frames, frame_len)
    + concatenated fixed-length 'frames' (seeded bytes)."""
    rows = []
    frame_len = 32
    for i in range(n):
        frames = [
            hashlib.sha256(f"{i}:{f}".encode()).digest()[:frame_len]
            for f in range(frames_per_video)
        ]
        content = struct.pack(">II", frames_per_video, frame_len) + b"".join(frames)
        rows.append((i, "video", "video/fake", bytearray(content), len(content)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_audio(spark, n: int = 16) -> DataFrame:
    """Deterministic fake audio table: payload = header (sample_rate,
    n_samples) + one unsigned byte per sample."""
    rows = []
    for i in range(n):
        rate = 8000 + (i % 4) * 4000
        samples = hashlib.sha256(f"audio{i}".encode()).digest() * 8
        content = struct.pack(">II", rate, len(samples)) + samples
        rows.append((i, "audio", "audio/fake", bytearray(content), len(content)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_image_resizer(content: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in resizer: rewrite the header to the target
    dimensions and subsample the body proportionally to the area change."""
    if content is None or len(content) < 8:
        raise ValueError("truncated media payload")
    w, h = struct.unpack(">II", content[:8])
    body = content[8:]
    keep = max(1, int(len(body) * (target_w * target_h) / max(1, w * h)))
    return struct.pack(">II", target_w, target_h) + body[:keep]


def fake_frame_splitter(content: bytes) -> list[bytes]:
    """Deterministic stand-in for video frame extraction: slice the payload
    into its header-declared fixed-length frames."""
    if content is None or len(content) < 8:
        raise ValueError("truncated media payload")
    n_frames, frame_len = struct.unpack(">II", content[:8])
    body = content[8:]
    if len(body) < n_frames * frame_len:
        raise ValueError("truncated media payload")
    return [body[i * frame_len : (i + 1) * frame_len] for i in range(n_frames)]


def fake_audio_decoder(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in audio decoder → (sample_rate, n_samples, rms)."""
    if content is None or len(content) < 8:
        raise ValueError("truncated media payload")
    rate, n_samples = struct.unpack(">II", content[:8])
    pcm = content[8 : 8 + n_samples]
    if len(pcm) < n_samples:
        raise ValueError("truncated media payload")
    mean_sq = sum(b * b for b in pcm) / max(1, len(pcm))
    return rate, n_samples, int(mean_sq**0.5)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched resize stage: (media_id, content) → resized binary.

    Same shape as ``extract_image_features``: projection pruned before the
    Python boundary, per-row failures → NULL content. Default resizer is the
    stubbed real-codec hook (raises); inject ``fake_image_resizer`` in tests
    or a PIL-backed callable in prod."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(media.sparkSession)
    pruned = media.select("media_id", "content")

    def _no_codec(content: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "no image codec available in this runtime; inject resizer=..."
        )

    fn = resizer or _no_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                try:
                    resized = fn(
                        bytes(content) if content is not None else None,
                        target_w,
                        target_h,
                    )
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["content"].append(resized)
                except Exception:  # noqa: BLE001 — per-row failure isolation
                    out["width"].append(None)
                    out["height"].append(None)
                    out["content"].append(None)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, RESIZED_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_n: int = 1,
    splitter: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sampling fan-out: one video row → one row per kept frame.

    The mapInPandas stage is a generator-UDTF shape (the multimodal analogue
    of the page → job-links explode, SURVEY §2.8): each Arrow batch of videos
    yields a frame table. ``every_n`` keeps frames 0, n, 2n, … Failed rows
    contribute zero frames (isolation) rather than failing the task."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(media.sparkSession)
    pruned = media.select("media_id", "content")

    def _no_codec(content: bytes) -> list[bytes]:
        raise NotImplementedError(
            "no video codec available in this runtime; inject splitter=..."
        )

    fn = splitter or _no_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": [], "frame_sha": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = fn(bytes(content) if content is not None else None)
                except Exception:  # noqa: BLE001
                    continue
                for idx in range(0, len(frames), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frames[idx])
                    out["frame_sha"].append(
                        hashlib.sha256(frames[idx]).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, FRAME_SCHEMA)


def extract_audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Audio decode/feature stage: (sample_rate, duration_ms, rms) per clip,
    same Arrow-batched shape and failure isolation as the image stage."""
    from scraping_jobsdb_spark.session import ship_package

    ship_package(media.sparkSession)
    pruned = media.select("media_id", "content")

    def _no_codec(content: bytes) -> tuple[int, int, int]:
        raise NotImplementedError(
            "no audio codec available in this runtime; inject decoder=..."
        )

    fn = decoder or _no_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_ms": [], "rms": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                try:
                    rate, n_samples, rms = fn(
                        bytes(content) if content is not None else None
                    )
                    out["sample_rate"].append(rate)
                    out["duration_ms"].append(int(n_samples * 1000 / rate))
                    out["rms"].append(rms)
                except Exception:  # noqa: BLE001
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
                    out["rms"].append(None)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
