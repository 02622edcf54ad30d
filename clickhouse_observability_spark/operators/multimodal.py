"""EXT multimodal column plumbing (north-star surface).

Image/audio/video payloads are opaque `binary` columns with typed
metadata; the Spark-side machinery — schema, partition-friendly
layout, Arrow-batched mapInPandas transforms, batch shapes — is real
and tested. The actual codec step is STUBBED (Pillow/ffmpeg are not
in this container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic hash-seeded decode stands
in so downstream feature extraction is testable end-to-end.

Scale design: payload bytes travel through Arrow record batches
(mapInPandas), never through Python object pickling row-at-a-time;
feature extraction is embarrassingly parallel (no shuffle); metadata
lives in plain columns so filters (kind, width bounds) prune BEFORE
any payload decoding touches bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),  # image-ish feature
        T.StructField("payload_sha", T.StringType(), True),
    ]
)


def make_fake_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + i if kind != "audio" else None,
                48 + i if kind != "audio" else None,
                16000 if kind == "audio" else None,
                1000 + 10 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> list[list[int]]:
    """Decode an image payload to pixel rows.

    STUB: real decoding needs an image library not present in this
    container. With fake=True a deterministic pseudo-decode (bytes ->
    8x8 gray tile) keeps the pipeline testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not installed here; "
            "pass fake=True for the deterministic test decode"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [[h[(r * 8 + c) % 32] for c in range(8)] for r in range(8)]


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; numpy
    does the per-payload math; output batches conform to
    FEATURE_SCHEMA. Metadata filters should be applied BEFORE calling
    this (column pruning means un-selected payloads never leave
    parquet)."""
    import math

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [], "byte_entropy": [], "mean_luma": [], "payload_sha": [],
            }
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                out["n_bytes"].append(len(b))
                if len(b):
                    counts = np.bincount(arr, minlength=256) / len(b)
                    nz = counts[counts > 0]
                    out["byte_entropy"].append(float(-(nz * np.log2(nz)).sum()))
                    tile = decode_image(b, fake=fake_decode)
                    out["mean_luma"].append(float(np.mean(tile)))
                else:
                    out["byte_entropy"].append(0.0)
                    out["mean_luma"].append(math.nan)
                out["payload_sha"].append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(_batch, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: one row per frame timestamp to
    extract — pure column math (sequence/explode), no decoding. The
    decode of each planned frame is the stubbed step."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.explode(
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(int(every_ms)))
    ).alias("frame_ms")
    return vids.select("media_id", "duration_ms", ts)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("dst_width", T.IntegerType(), False),
        T.StructField("dst_height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resized_sha", T.StringType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    dst_width: int = 8,
    dst_height: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Arrow-batched image resize over the binary column.

    Same plumbing contract as extract_features: images only (metadata
    filter prunes BEFORE payload bytes are read), payloads arrive per
    Arrow batch, numpy does a nearest-neighbor index-map resample of
    the decoded tile, and the resized raster ships back as a binary
    column plus a content sha. The DECODE step is the stub
    (decode_image); the resample math, batch shape, schema and
    partitioning behavior are real — swap the decode for Pillow and
    nothing else changes.
    """

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "src_width": pdf["width"],
                "src_height": pdf["height"],
                "dst_width": [], "dst_height": [], "resized": [], "resized_sha": [],
            }
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                tile = np.asarray(decode_image(b, fake=fake_decode), dtype=np.uint8)
                sh, sw = tile.shape
                # nearest-neighbor: integer index maps, pure numpy
                rows = (np.arange(dst_height) * sh) // dst_height
                cols = (np.arange(dst_width) * sw) // dst_width
                resized = tile[np.ix_(rows, cols)]
                raw = resized.tobytes()
                out["dst_width"].append(dst_width)
                out["dst_height"].append(dst_height)
                out["resized"].append(bytearray(raw))
                out["resized_sha"].append(hashlib.sha256(raw).hexdigest())
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    )
    return imgs.mapInPandas(_batch, RESIZE_SCHEMA)
