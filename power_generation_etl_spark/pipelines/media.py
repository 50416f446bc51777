"""End-to-end media feature/curation pipeline — the multimodal twin of
`pipelines/pretrain.py` (prep-shards).

Input: a media parquet with (media_id long, kind string in
{image,audio,video}, content binary). Output: one feature parquet per
modality plus a near-dup pair list, and a summary with conserved
counts:

  out_dir/image_features/        media_id, n_bytes, feat_mean,
                                 feat_std, dhash, thumb row-major
                                 pixels (out_h×out_w), kept flag
  out_dir/image_neardup_pairs/   id_a, id_b, hamming
  out_dir/audio_features/        the AUDIO_FEATURES_SCHEMA columns
  out_dir/video_metadata/        container/codec/dims/duration/frames
  out_dir/video_frame_features/  per sampled frame: n_bytes, luma stats

Design points that matter at 100 TB:

* ONE decode per image. The catalog exposes mean/std, dHash, and
  thumbnail as separate operators (each independently oracle-gated);
  running all three over a corpus would decode every blob three
  times. The pipeline fuses them into a single mapInPandas pass
  (`_image_bundle`) — the binary column is read once, grayscale
  decode happens once, and only narrow features leave the worker.
* Near-dup policy matches the text pipeline: banded dHash candidates
  (pigeonhole-exact recall for hamming < bands), drop the HIGHER
  media_id of every verified pair; `kept=false` rows stay in the
  feature table so downstream can audit rather than re-derive.
* Every output is total over its modality's input (undecodable blobs
  keep a row with null features), so counts reconcile: n_images =
  rows(image_features), dropped = rows with kept=false.

Decode tiers are `_gray_image`'s (PIL when present, else pure-python
PNG/BMP/JPEG) — like dHash, the pipeline does NOT use the digest stub
for unknown formats: fake pixel features would manufacture fake
near-dups. Unknown/corrupt image bytes yield null features.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from power_generation_etl_spark.operators import multimodal as mm

_IMAGE_BUNDLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_std", T.DoubleType(), True),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
    ]
)


def _image_bundle(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Fused image extractor: decode each blob ONCE, emit mean/std +
    dHash + thumbnail together. Feature semantics match the standalone
    operators (same rounding, same null policy as `_gray_image` /
    `_dhash64` / `resize_gray`)."""

    def bundle(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _IMAGE_BUNDLE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                gray = mm._gray_image(blob)
                if gray is None or not gray.size:
                    rows.append(
                        (media_id, len(blob), None, None, None,
                         out_h, out_w, None)
                    )
                    continue
                px = mm.resize_gray(gray, out_h, out_w)
                rows.append(
                    (
                        media_id,
                        len(blob),
                        round(float(gray.mean()), 4),
                        round(float(gray.std()), 4),
                        mm._dhash64(gray),
                        out_h,
                        out_w,
                        [float(v) for v in px.ravel()],
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    narrow = df.filter(F.col("kind") == "image").select("media_id", "content")
    return narrow.mapInPandas(bundle, _IMAGE_BUNDLE_SCHEMA)


@dataclass
class MediaPrepSummary:
    n_input: int
    n_images: int
    n_audio: int
    n_video: int
    n_image_neardup_pairs: int
    n_images_dropped: int
    n_video_frames: int
    out_dir: str

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def prepare_media_features(
    media: DataFrame,
    out_dir: str,
    *,
    max_hamming: int = 6,
    bands: int = 8,
    thumb_h: int = 4,
    thumb_w: int = 4,
    n_frames: int = 4,
) -> MediaPrepSummary:
    """Run the full media feature/curation pipeline and write the
    per-modality parquet outputs described in the module docstring."""
    n_input = media.count()

    # ---- images: fused single-decode bundle + banded near-dup -------
    # The one-decode contract is enforced by materializing the bundle
    # BEFORE anything derives from it: without the persist, the pairs
    # write, the feature join's left side, and the `dropped` subtree
    # would each re-execute the mapInPandas decode (~3 decodes/blob —
    # tripling the most expensive stage at the 100 TB target). DISK_ONLY
    # per the session-wide persist policy (deserialized in-heap blocks
    # outlive the ContextCleaner over long sessions).
    from pyspark import StorageLevel

    spark = media.sparkSession
    pairs_out = os.path.join(out_dir, "image_neardup_pairs")
    img_out = os.path.join(out_dir, "image_features")
    bundle = _image_bundle(media, thumb_h, thumb_w).persist(
        StorageLevel.DISK_ONLY
    )
    try:
        pairs = mm.dhash_neardup_pairs(
            bundle.select("media_id", "dhash"),
            max_hamming=max_hamming,
            bands=bands,
        )
        pairs.write.mode("overwrite").parquet(pairs_out)
        # Re-derive the drop set from the parquet just written — the
        # in-memory `pairs` plan would re-run the candidate join (and,
        # unpersisted, the decode) a second time.
        dropped = (
            spark.read.parquet(pairs_out)
            .select(F.col("id_b").alias("media_id"))
            .distinct()
        )
        feat = bundle.join(
            dropped.withColumn("_drop", F.lit(True)), "media_id", "left"
        ).withColumn("kept", F.col("_drop").isNull()).drop("_drop")
        feat.write.mode("overwrite").parquet(img_out)
    finally:
        bundle.unpersist()
    n_images = spark.read.parquet(img_out).count()
    n_pairs = spark.read.parquet(pairs_out).count()
    n_dropped = (
        spark.read.parquet(img_out).filter(~F.col("kept")).count()
    )

    # ---- audio ------------------------------------------------------
    audio = mm.extract_audio_features(media)
    audio.write.mode("overwrite").parquet(
        os.path.join(out_dir, "audio_features")
    )
    n_audio = spark.read.parquet(
        os.path.join(out_dir, "audio_features")
    ).count()

    # ---- video: container metadata + per-frame pixel features -------
    meta = mm.probe_video_metadata(media)
    meta.write.mode("overwrite").parquet(
        os.path.join(out_dir, "video_metadata")
    )
    frames = mm.extract_video_frame_features(media, n_frames=n_frames)
    frames.write.mode("overwrite").parquet(
        os.path.join(out_dir, "video_frame_features")
    )
    n_video = spark.read.parquet(
        os.path.join(out_dir, "video_metadata")
    ).count()
    n_frames_out = spark.read.parquet(
        os.path.join(out_dir, "video_frame_features")
    ).count()

    return MediaPrepSummary(
        n_input=n_input,
        n_images=n_images,
        n_audio=n_audio,
        n_video=n_video,
        n_image_neardup_pairs=n_pairs,
        n_images_dropped=n_dropped,
        n_video_frames=n_frames_out,
        out_dir=out_dir,
    )
