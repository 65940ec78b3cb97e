"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the codec step itself is STUBBED because this
environment ships no image/audio libraries -- ``decode_image_batch`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, which produces
a seeded, content-derived fake (stable bytes -> stable features) so the
distributed plumbing is exercisable end to end.
"""

from __future__ import annotations

import hashlib
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
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, feat array<double>"
)


def decode_image_batch(payloads: pd.Series, deterministic_fake: bool = False):
    """STUB: real decode needs an image codec library (not in this
    container). The fake derives an 8-float feature vector from the sha256
    of the bytes -- deterministic, content-addressed, shape-correct."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires a codec library; pass deterministic_fake=True "
            "for the plumbing-test path"
        )

    def fake(b):
        if b is None:
            return [0.0] * 8
        h = hashlib.sha256(bytes(b)).digest()
        return [h[i] / 255.0 for i in range(8)]

    return payloads.map(fake)


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over the opaque payload column.

    Batch shape: the UDF sees an iterator of pandas DataFrames sized by
    spark.sql.execution.arrow.maxRecordsPerBatch; heavy media rows should
    lower that setting and/or pre-repartition by size bucket so one batch
    fits executor memory.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "sha": pdf["payload"].map(
                        lambda b: ""
                        if b is None
                        else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feat": decode_image_batch(
                        pdf["payload"], deterministic_fake=deterministic_fake
                    ),
                }
            )
            yield out

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts)
    to be decoded downstream -- pure native expressions (sequence +
    explode); the decode itself is the stubbed UDF above."""
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


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.choice(["image", "audio", "video"])
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randrange(64, 512)))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                rng.randrange(16, 1024) if kind == "image" else None,
                rng.randrange(16, 1024) if kind == "image" else None,
                rng.randrange(1000, 60000) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
