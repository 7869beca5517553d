"""Multimodal (binary) columns: images/audio/video as opaque ``binary`` with
typed metadata (north-star extension; the reference's analogue is the HTML
document lake, SURVEY.md §1.1 item 1 — an unstructured column joined to
relational metadata).

The Spark-side plumbing here is fully real — schemas, Arrow-batched
``mapInPandas`` decode stages, partitioning by modality/shard. Decoding is
an injected callable: ``decode_image`` (the default hook) raises
``NotImplementedError`` because the container ships no PIL/ffmpeg, but the
module now ALSO provides REAL stdlib-only codecs — ``png_image_decoder``
(zlib inflate + all five PNG scanline filters), ``bmp_image_decoder`` /
``bmp_image_resizer`` (24-bit BI_RGB), with matching encoders — so the
decode path is exercised end to end against genuine container formats
(gate query multimodal_png_decode_features). Swapping in PIL/ffmpeg for
JPEG/video changes one injected callable, nothing else.

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
    "png_encode_gray",
    "png_image_decoder",
    "bmp_encode_rgb",
    "bmp_image_decoder",
    "bmp_image_resizer",
    "wav_encode_pcm16",
    "wav_audio_decoder",
    "y4m_encode",
    "y4m_frame_splitter",
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


# ------------------------------------------------------------- real codecs
# Stdlib-only REAL codecs (VERDICT r11 item 7). The runtime ships no
# PIL/ffmpeg, but PNG is zlib + struct and BMP is struct alone — both
# implementable from their public specifications with nothing beyond the
# stdlib. Injecting these turns the decode plumbing into a genuinely
# exercised path: real container parsing, real entropy coding (PNG's
# DEFLATE stream + all five scanline filters), real pixel arithmetic —
# against bytes any external PNG/BMP reader would accept.


def png_encode_gray(rows: list[bytes]) -> bytes:
    """Minimal REAL PNG encoder: 8-bit grayscale, filter 0 per scanline,
    one IDAT chunk. Output parses in any PNG reader (signature, IHDR,
    CRC-checked chunks, DEFLATE-compressed filtered scanlines)."""
    import zlib

    h = len(rows)
    w = len(rows[0]) if h else 0
    if any(len(r) != w for r in rows):
        raise ValueError("ragged scanlines")
    raw = b"".join(b"\x00" + bytes(r) for r in rows)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_image_decoder(content: bytes) -> tuple[int, int, int]:
    """REAL PNG decode → (width, height, mean_luma). Supports 8-bit
    grayscale (color type 0), RGB (2), and RGBA (6), non-interlaced —
    full chunk walk, multi-IDAT concatenation, zlib inflate, and all five
    scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec.
    ``mean_luma`` is integer-exact: per-pixel gray value (or
    (r+g+b) // 3), summed, floor-divided by the pixel count — the same
    contract as ``fake_image_decoder``, so the two are interchangeable
    behind ``extract_image_features``."""
    import zlib  # noqa: F811 — worker-side import, like the encoder's

    if content is None or len(content) < 8:
        raise ValueError("truncated media payload")
    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos = 8
    idat = b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported color type {ctype}")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    prev = bytearray(stride)
    total = 0
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        if channels == 1:
            total += sum(line)
        else:
            for x in range(0, stride, channels):
                total += (line[x] + line[x + 1] + line[x + 2]) // 3
        prev = line
    return int(w), int(h), total // (w * h)


def bmp_encode_rgb(w: int, h: int, pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal REAL BMP encoder: 24-bit uncompressed (BI_RGB), bottom-up
    rows, 4-byte row padding — the classic BITMAPFILEHEADER +
    BITMAPINFOHEADER layout every BMP reader accepts. ``pixels`` is
    row-major top-down (r, g, b)."""
    pad = (4 - (w * 3) % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        for r, g, b in pixels[y]:
            body += bytes((b, g, r))  # BGR on disk
        body += b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + bytes(body)


def bmp_image_decoder(content: bytes) -> tuple[int, int, int]:
    """REAL BMP decode → (width, height, mean_luma): parses the file and
    info headers, requires 24-bit BI_RGB, walks the bottom-up padded rows.
    Same integer mean-luma contract as ``png_image_decoder``."""
    if content is None or len(content) < 54:
        raise ValueError("truncated media payload")
    if content[:2] != b"BM":
        raise ValueError("not a BMP signature")
    (data_off,) = struct.unpack("<I", content[10:14])
    hdr_size, w, h, _planes, bpp, comp = struct.unpack(
        "<IiiHHI", content[14:34]
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    if len(content) < data_off + h * stride:
        raise ValueError("truncated pixel array")
    total = 0
    for row in range(h):
        off = data_off + row * stride
        line = content[off : off + w * 3]
        for x in range(0, w * 3, 3):
            total += (line[x] + line[x + 1] + line[x + 2]) // 3
    del top_down  # mean is row-order independent
    return int(w), int(h), total // (w * h)


def bmp_image_resizer(content: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor BMP resize: decode the 24-bit pixel grid,
    sample src[y * h // th][x * w // tw], re-encode. A drop-in for the
    ``resize_images`` stage whose output ``bmp_image_decoder`` (or any
    BMP reader) decodes back."""
    if content is None or len(content) < 54:
        raise ValueError("truncated media payload")
    if content[:2] != b"BM":
        raise ValueError("not a BMP signature")
    (data_off,) = struct.unpack("<I", content[10:14])
    hdr_size, w, h, _planes, bpp, comp = struct.unpack(
        "<IiiHHI", content[14:34]
    )
    if hdr_size < 40 or bpp != 24 or comp != 0 or h < 0:
        raise ValueError("unsupported BMP for resize")
    pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + pad
    rows = []
    for row in range(h - 1, -1, -1):  # disk is bottom-up; rebuild top-down
        off = data_off + row * stride
        line = content[off : off + w * 3]
        rows.append(
            [(line[x + 2], line[x + 1], line[x]) for x in range(0, w * 3, 3)]
        )
    out = [
        [rows[y * h // target_h][x * w // target_w] for x in range(target_w)]
        for y in range(target_h)
    ]
    return bmp_encode_rgb(target_w, target_h, out)


def wav_encode_pcm16(rate: int, samples: list[int]) -> bytes:
    """Minimal REAL WAV encoder: canonical RIFF/WAVE container, PCM
    format chunk (mono, 16-bit little-endian) + data chunk. Output parses
    in any WAV reader (including the stdlib ``wave`` module)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_audio_decoder(content: bytes) -> tuple[int, int, int]:
    """REAL WAV decode → (sample_rate, n_samples, rms): RIFF chunk walk,
    PCM 16-bit mono required, ``rms = int(sqrt(sum(s²)/n))`` over the
    little-endian samples — the same contract as ``fake_audio_decoder``,
    so the two are interchangeable behind ``extract_audio_features``."""
    if content is None or len(content) < 12:
        raise ValueError("truncated media payload")
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE signature")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    if n == 0:
        raise ValueError("empty PCM stream")
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    sum_sq = sum(s * s for s in samples)
    return int(rate), n, int((sum_sq / n) ** 0.5)


def y4m_encode(w: int, h: int, frames: list[bytes], fps: str = "25:1") -> bytes:
    """Minimal REAL YUV4MPEG2 encoder: the textual stream header + one
    ``FRAME`` marker per raw 4:2:0 frame (``w*h*3//2`` bytes). Output is
    what ``ffmpeg -f yuv4mpegpipe`` consumes."""
    flen = w * h * 3 // 2
    if any(len(f) != flen for f in frames):
        raise ValueError(f"frames must be {flen} bytes at {w}x{h} C420")
    head = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C420\n".encode()
    return head + b"".join(b"FRAME\n" + f for f in frames)


def y4m_frame_splitter(content: bytes) -> list[bytes]:
    """REAL Y4M parse → raw 4:2:0 frames: stream-header tag walk (W/H/C
    parameters), then FRAME-marker slicing with exact frame-length
    validation. Same contract as ``fake_frame_splitter``, so it drops
    into ``sample_video_frames`` unchanged."""
    if content is None or len(content) < 10:
        raise ValueError("truncated media payload")
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 signature")
    w = h = None
    subsampling = "420"
    for tok in content[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            subsampling = tok[1:].decode()
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    if not subsampling.startswith("420"):
        raise ValueError(f"unsupported chroma subsampling C{subsampling}")
    flen = w * h * 3 // 2
    frames = []
    pos = nl + 1
    while pos < len(content):
        fnl = content.find(b"\n", pos)
        if fnl < 0 or content[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        frame = content[fnl + 1 : fnl + 1 + flen]
        if len(frame) != flen:
            raise ValueError("truncated frame")
        frames.append(frame)
        pos = fnl + 1 + flen
    return frames
