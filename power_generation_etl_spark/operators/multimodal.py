"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns + typed metadata — the layout a
100 TB multimodal training pipeline uses (parquet binary chunks,
partition-pruned by metadata, decoded lazily next to the GPU).

The Spark-side machinery here is real and tested: schemas, Arrow-batched
`mapInPandas` UDF signatures, batch-shape handling, partition-count
preservation. The image codec is an *optional dependency*: when PIL is
importable (worker-side import-try), `_decode_image` computes real
grayscale pixel statistics; otherwise it falls back to a deterministic
stub derived from the byte digest, so the pipeline stays fully testable
in codec-less environments. Frame sampling remains a stub (ffmpeg).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional codec — absent in this container, used when deployed with it
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised implicitly
    _PILImage = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_std", T.DoubleType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[float, float]:
    """Codec-less fallback: deterministic pseudo pixel statistics from
    the byte digest, so the pipeline around the decode is fully
    testable without PIL."""
    if content is None:
        raise NotImplementedError("real decode requires an image codec")
    digest = hashlib.sha256(content).digest()
    mean = int.from_bytes(digest[:4], "big") / 2**32 * 255.0
    std = int.from_bytes(digest[4:8], "big") / 2**32 * 64.0
    return mean, std


def _decode_image(content: bytes) -> tuple[float | None, float | None]:
    """Grayscale mean/std of the decoded image when PIL is available;
    undecodable bytes yield (None, None) — a 100 TB corpus always has
    corrupt media, and nulling the features beats failing the task.
    Falls back to the deterministic stub without a codec."""
    if _PILImage is None:
        return _decode_image_stub(content)
    try:
        import numpy as np

        arr = np.asarray(
            _PILImage.open(io.BytesIO(content)).convert("L"), dtype="float64"
        )
        return float(arr.mean()), float(arr.std())
    except Exception:
        return None, None


def extract_image_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary image columns.

    mapInPandas: each Arrow batch becomes a pandas DataFrame; we emit a
    narrow feature frame. The wide binary column is dropped as early as
    possible so only features shuffle downstream."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                mean, std = _decode_image(blob)
                feats.append(
                    (
                        media_id,
                        hashlib.sha256(blob).hexdigest(),
                        len(blob),
                        round(mean, 4) if mean is not None else None,
                        round(std, 4) if std is not None else None,
                    )
                )
            yield pd.DataFrame(
                feats, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    narrow = df.filter(F.col("kind") == "image").select("media_id", "content")
    return narrow.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling STUB: real impl seeks keyframes via ffmpeg; the
    fake splits the byte stream into `n_frames` equal chunks. The
    explode shape (1 row in → n rows out, wide binary payload) is the
    real thing being exercised."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    rows.append((media_id, i, blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    narrow = df.filter(F.col("kind") == "video").select("media_id", "content")
    return narrow.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the binary column, so the
    parquet scan prunes it (check ReadSchema in .explain)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
