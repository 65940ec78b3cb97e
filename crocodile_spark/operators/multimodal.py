"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The codec is a REAL, dependency-free container-header parser: PNG / GIF /
BMP dimensions + channel count and WAV channel count are decoded from the
payload bytes (struct.unpack over fixed offsets -- the formats' public
container layouts). Pixel/sample decoding would need a codec library this
container doesn't ship, so the per-item feature vector remains a
deterministic content-addressed placeholder (sha256-derived 8 floats),
clearly documented as such; everything else about the operator -- schema,
partitioning, Arrow batch shape, the parsed header fields -- is real and
value-checked against a DuckDB oracle that re-derives the same fields via
hex arithmetic.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("width", T.IntegerType(), True),     # claimed metadata
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, format string, n_bytes long, sha string, "
    "width int, height int, channels int, feat array<double>"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (PNG spec, public)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_media_header(b) -> tuple:
    """(format, width, height, channels) from container header bytes.

    Real parsing of the public container layouts:
      PNG  -- IHDR: width/height big-endian u32 at 16/20, color type at 25
      GIF  -- logical screen: width/height little-endian u16 at 6/8
      BMP  -- BITMAPINFOHEADER: width/height LE i32 at 18/22, bpp LE u16 at 28
      WAV  -- RIFF/WAVE fmt chunk: channel count LE u16 at 22
    Unknown magic -> (None, None, None, None): opaque payloads flow through
    with null header fields instead of failing the batch.
    """
    if b is None:
        return (None, None, None, None)
    b = bytes(b)
    if b[:8] == _PNG_SIG and len(b) >= 26:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, _PNG_CHANNELS.get(b[25]))
    if b[:4] == b"GIF8" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, 3)
    if b[:2] == b"BM" and len(b) >= 30:
        w, h = struct.unpack("<ii", b[18:26])
        (bpp,) = struct.unpack("<H", b[28:30])
        return ("bmp", w, abs(h), max(1, bpp // 8))
    if b[:4] == b"RIFF" and len(b) >= 24 and b[8:12] == b"WAVE":
        (ch,) = struct.unpack("<H", b[22:24])
        return ("wav", None, None, ch)
    return (None, None, None, None)


def content_feature(b, dim: int = 8) -> list[float]:
    """Deterministic content-addressed placeholder embedding: ``dim``
    floats derived from sha256(payload). A real embedding needs a pixel
    decoder + model; the placeholder keeps the downstream contract (stable
    bytes -> stable vector in [0,1]) testable without one."""
    if b is None:
        return [0.0] * dim
    h = hashlib.sha256(bytes(b)).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the opaque payload column:
    parsed container header fields + byte stats + placeholder embedding.

    Batch shape: the UDF sees an iterator of pandas DataFrames sized by
    spark.sql.execution.arrow.maxRecordsPerBatch; heavy media rows should
    lower that setting and/or pre-repartition by size bucket so one batch
    fits executor memory.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(parse_media_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": parsed.map(lambda t: t[0]),
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "sha": pdf["payload"].map(
                        lambda b: ""
                        if b is None
                        else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": parsed.map(lambda t: t[1]).astype("Int32"),
                    "height": parsed.map(lambda t: t[2]).astype("Int32"),
                    "channels": parsed.map(lambda t: t[3]).astype("Int32"),
                    "feat": pdf["payload"].map(content_feature),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts)
    to be decoded downstream -- pure native expressions (sequence +
    explode); the frame decode itself needs a video codec (not shipped)."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


# -- deterministic synthetic payload builders (valid container headers) ----
def encode_png(w: int, h: int, color_type: int, body: bytes) -> bytes:
    return (
        _PNG_SIG
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes([8, color_type, 0, 0, 0])
        + b"\x00\x00\x00\x00"  # placeholder CRC (parser reads offsets only)
        + body
    )


def encode_gif(w: int, h: int, body: bytes) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + bytes([0xF7, 0, 0]) + body


def encode_bmp(w: int, h: int, bpp: int, body: bytes) -> bytes:
    return (
        b"BM"
        + struct.pack("<I", 54 + len(body))
        + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", w, h)
        + struct.pack("<HH", 1, bpp)
        + b"\x00" * 16
        + body
    )


def encode_wav(channels: int, rate: int, data: bytes) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, channels)
        + struct.pack("<I", rate)
        + struct.pack("<I", rate * channels * 2)
        + struct.pack("<HH", channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: images are VALID PNG/GIF/BMP
    payloads (random dims, junk bodies), audio is valid WAV, video is an
    opaque payload exercising the unknown-format fallback."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.choice(["image", "audio", "video"])
        junk = bytes(rng.getrandbits(8) for _ in range(rng.randrange(64, 512)))
        w = rng.randrange(16, 1024)
        h = rng.randrange(16, 1024)
        if kind == "image":
            fmt = rng.choice(["png", "gif", "bmp"])
            if fmt == "png":
                payload = encode_png(w, h, rng.choice([0, 2, 6]), junk)
                mime = "image/png"
            elif fmt == "gif":
                payload = encode_gif(w, h, junk)
                mime = "image/gif"
            else:
                payload = encode_bmp(w, h, rng.choice([8, 24, 32]), junk)
                mime = "image/bmp"
            rows.append((i, kind, mime, payload, w, h, None))
        elif kind == "audio":
            payload = encode_wav(rng.choice([1, 2]), 16000, junk)
            rows.append((i, kind, "audio/wav", payload, None, None,
                         rng.randrange(1000, 60000)))
        else:
            rows.append((i, kind, "video/mp4", junk, None, None,
                         rng.randrange(1000, 60000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
