"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the actual media decoding
is stubbed (no image/audio libs in this container): ``decode_image`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which case a
seeded, content-derived fake is produced so downstream plumbing (resize
dims, frame sampling, feature vectors) is fully exercisable and assertable.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = ["MEDIA_SCHEMA", "IMAGE_FEATURES_SCHEMA", "decode_image",
           "make_image_feature_kernel", "image_features", "sample_frames"]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),         # nullable typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("n_bytes", IntegerType()),
    StructField("feature", ArrayType(FloatType())),  # dim-16 embedding
])


def decode_image(payload: bytes, *, deterministic_fake: bool = False):
    """Decode encoded image bytes to (width, height, pixel summary).

    Real decoding requires an image library not present in this container.
    With ``deterministic_fake`` the result is a pure function of the bytes,
    keeping the distributed plumbing testable end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (not in this container); "
            "pass deterministic_fake=True for the content-derived stand-in")
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    return width, height, digest


def _fake_feature(digest: bytes, dim: int = 16) -> list[float]:
    return [(digest[i % len(digest)] - 128) / 128.0 for i in range(dim)]


def make_image_feature_kernel(target: tuple[int, int] = (32, 32),
                              deterministic_fake: bool = True):
    """mapInPandas kernel: MEDIA_SCHEMA batches -> IMAGE_FEATURES_SCHEMA.

    ``target`` models the resize step; the fake keeps output dims = min of
    source and target (as a real thumbnailer would for downscale-only)."""

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "out_width": [], "out_height": [],
                   "n_bytes": [], "feature": []}
            for mid, payload in zip(pdf["media_id"].tolist(),
                                    pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                w, h, digest = decode_image(raw, deterministic_fake=deterministic_fake)
                out["media_id"].append(mid)
                out["out_width"].append(min(w, target[0]))
                out["out_height"].append(min(h, target[1]))
                out["n_bytes"].append(len(raw))
                out["feature"].append(_fake_feature(digest))
            yield pd.DataFrame(out)

    return kernel


def image_features(media: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Distributed decode/resize/feature-extract over image rows."""
    imgs = media.filter(F.col("kind") == "image") \
        .select("media_id", "payload")
    return imgs.mapInPandas(make_image_feature_kernel(target), IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (the decode itself is the stubbed step; the explode/partition
    shape is the real contract)."""
    vids = media.filter(F.col("kind") == "video") \
        .select("media_id", "payload", "duration_ms")
    stamps = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))
    return (vids.withColumn("frame_ms", F.explode(stamps))
            .select("media_id", "frame_ms",
                    F.xxhash64("payload", "frame_ms").alias("frame_token")))
