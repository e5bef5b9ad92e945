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
                 out_col: str = "pixels",
                 stats_only: bool = True) -> DataFrame:
    """binary -> decoded image stats via mapInPandas (Arrow batches).

    Real path, gated on PIL (absent from this container by design — the
    NotImplementedError below is the disclosed stub behavior there). Where
    PIL exists, each Arrow batch decodes images and emits
    (decoded_width, decoded_height, mode, mean_luma) — the summary columns a
    training-data pipeline filters on. ``stats_only=False`` additionally
    carries the raw pixel bytes (RGB, row-major) in ``out_col``; keep it
    off for wide scans, pixel tensors belong in the downstream model reader.
    """
    backend = _try_decode_backend("image")
    if backend is None:
        raise NotImplementedError(
            "image decode requires PIL, not available in this container; "
            "use extract_features() for the deterministic stand-in path")

    fields = list(df.schema.fields) + [
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
    if not stats_only:
        fields.append(T.StructField(out_col, T.BinaryType()))
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ws, hs, modes, lumas, pixels = [], [], [], [], []
            for b in pdf[content_col]:
                if b is None:
                    ws.append(None); hs.append(None); modes.append(None)
                    lumas.append(None); pixels.append(None)
                    continue
                try:
                    img = backend.open(io.BytesIO(bytes(b)))
                    rgb = img.convert("RGB")
                    arr = np.asarray(rgb, dtype=np.uint8)
                    ws.append(img.width); hs.append(img.height)
                    modes.append(img.mode)
                    # ITU-R BT.601 luma over the decoded pixels
                    lumas.append(float(
                        (arr @ np.array([0.299, 0.587, 0.114])).mean()))
                    pixels.append(arr.tobytes() if not stats_only else None)
                except Exception:  # undecodable bytes -> null row, not a crash
                    ws.append(None); hs.append(None); modes.append(None)
                    lumas.append(None); pixels.append(None)
            pdf["decoded_width"] = pd.array(ws, dtype="Int32")
            pdf["decoded_height"] = pd.array(hs, dtype="Int32")
            pdf["mode"] = modes
            pdf["mean_luma"] = lumas
            if not stats_only:
                pdf[out_col] = pixels
            yield pdf

    return df.mapInPandas(run, schema)


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
