"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
pandas iterators over ``mapInPandas`` — the only sane shape at 100 TB
(media bytes never round-trip through Python row-at-a-time, partitions
stream batch-wise).

Decode backends (PIL / soundfile / av) are NOT in this container, so the
decode step is STUBBED: ``deterministic_features`` derives a fake-but-stable
feature vector from the bytes themselves (sha256-seeded), and the real
decode path raises NotImplementedError behind an import-try. The Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),  # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURE_DIM = 32


def _try_decode_backend(media_type: str):
    """Real decoders, gated: absent in this environment by design."""
    try:
        if media_type == "image":
            from PIL import Image  # noqa: F401
            return Image
        if media_type == "audio":
            import soundfile  # noqa: F401
            return soundfile
        if media_type == "video":
            import av  # noqa: F401
            return av
    except ImportError:
        return None
    return None


def deterministic_features(content: bytes, dim: int = FEATURE_DIM) -> list:
    """Stable stand-in for a decoded-feature vector: sha256(content) seeds
    a tiny xorshift stream -> dim floats in [-1, 1]. Replays identically
    anywhere; replaced by a real model/decoder in production."""
    if content is None:
        return None
    x = int.from_bytes(hashlib.sha256(content).digest()[:8], "big") or 1
    out = []
    for _ in range(dim):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out.append((x % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def extract_features(df: DataFrame, content_col: str = "content",
                     out_col: str = "features") -> DataFrame:
    """binary -> array<float> features via mapInPandas (Arrow batches)."""
    schema = T.StructType(df.schema.fields +
                          [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[content_col].map(
                lambda b: deterministic_features(bytes(b)) if b is not None
                else None)
            yield pdf

    return df.mapInPandas(run, schema)


def decode_image(df: DataFrame, content_col: str = "content",
                 out_col: str = "pixels") -> DataFrame:
    """binary -> decoded pixel tensor. STUB: raises unless PIL is present.
    The plan shape (mapInPandas, Arrow batches, schema) is the real one."""
    backend = _try_decode_backend("image")
    if backend is None:
        raise NotImplementedError(
            "image decode requires PIL, not available in this container; "
            "use extract_features() for the deterministic stand-in path")
    raise NotImplementedError("real decode wiring pending backend presence")


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-metadata resize planning (no decode): computes target dims
    preserving aspect ratio — JVM-side arithmetic on the meta struct."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h,
                    F.lit(1.0))
    return df.withColumn("target_width",
                         F.round(w * scale).cast("int")) \
             .withColumn("target_height",
                         F.round(h * scale).cast("int"))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms)
    without decoding — the explode drives downstream decode partitions."""
    n = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"),
                   F.lit(1))
    ts = F.transform(F.sequence(F.lit(0), n - 1),
                     lambda i: i * F.lit(every_ms))
    return df.filter(F.col("media_type") == "video") \
             .select("media_id", F.explode(ts).alias("frame_ts_ms"))


def synth_media_from_text(df: DataFrame, id_col: str, text_col: str,
                          media_type: str = "image") -> DataFrame:
    """Test helper: fabricate a media table from a text table (bytes =
    utf-8 of the text; deterministic meta from its length)."""
    content = F.encode(F.col(text_col), "utf-8")
    ln = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.struct(
            (ln % 640 + 64).cast("int").alias("width"),
            (ln % 480 + 48).cast("int").alias("height"),
            (ln * 100).cast("long").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"))
