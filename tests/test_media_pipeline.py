"""End-to-end test of the media feature/curation pipeline
(`pipelines/media.py::prepare_media_features` + CLI `prep-media`):
synthesized real containers per modality, fused image extraction
equals the standalone operators, near-dup drop policy, count
conservation, and null-feature rows for undecodable bytes."""

from __future__ import annotations

import hashlib
import json
import struct

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import multimodal as mm
from power_generation_etl_spark.pipelines.media import prepare_media_features


def _bmp(pixels: bytes, side: int = 16) -> bytes:
    """side×side gray 24-bit BMP (side·3 must be a multiple of 4, e.g.
    8 or 16). 16×16 by default: dHash needs at least 8×9 pixels, so
    the 8×8 catalog shape would hash to None and never near-dup."""
    assert len(pixels) == side * side and (side * 3) % 4 == 0
    size = side * side * 3
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + size, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, side, side, 1, 24, 0, size, 2835, 2835, 0, 0
        )
    )
    body = b"".join(bytes([v, v, v]) for v in pixels)
    return hdr + body


def _wav_pcm16(samples: bytes) -> bytes:
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(samples))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(samples))
    )
    return hdr + samples


def _avi(frames: list[bytes]) -> bytes:
    chunks = b""
    for fb in frames:
        chunks += b"00db" + struct.pack("<I", len(fb)) + fb
        if len(fb) % 2:
            chunks += b"\x00"
    movi = 4 + len(chunks)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + movi)
        + b"AVI LIST"
        + struct.pack("<I", movi)
        + b"movi"
        + chunks
    )


@pytest.fixture(scope="module")
def media_rows():
    px_a = hashlib.md5(b"imgA").digest() * 16  # 256 bytes → 16×16
    px_c = b"".join(
        hashlib.md5(b"imgC%d" % i).digest() for i in range(16)
    )  # distinct image
    return [
        (1, "image", bytearray(_bmp(px_a))),
        (2, "image", bytearray(_bmp(px_a))),        # exact dup of 1
        (3, "image", bytearray(_bmp(px_c))),        # distinct
        (4, "image", bytearray(b"not an image")),   # undecodable
        (10, "audio", bytearray(_wav_pcm16(hashlib.md5(b"aud").digest() * 4))),
        (20, "video", bytearray(_avi([_bmp(px_a), _bmp(px_c)]))),
    ]


@pytest.fixture(scope="module")
def prep(spark, media_rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("media_out"))
    media = spark.createDataFrame(
        media_rows, "media_id long, kind string, content binary"
    )
    return prepare_media_features(media, out), out


class TestMediaPipeline:
    def test_counts_conserve(self, prep):
        s, _ = prep
        assert s.n_input == 6
        assert s.n_images == 4          # total over image rows, incl. bad
        assert s.n_audio == 1
        assert s.n_video == 1
        assert s.n_video_frames == 2    # both AVI frames sampled

    def test_exact_dup_dropped_higher_id_kept_lower(self, spark, prep):
        s, out = prep
        feat = {r["media_id"]: r for r in
                spark.read.parquet(f"{out}/image_features").collect()}
        assert feat[1]["kept"] is True
        assert feat[2]["kept"] is False  # higher id of the dup pair
        assert feat[3]["kept"] is True
        assert s.n_images_dropped == 1
        assert s.n_image_neardup_pairs >= 1

    def test_fused_bundle_matches_standalone_operators(self, spark, prep, media_rows):
        _, out = prep
        feat = {r["media_id"]: r for r in
                spark.read.parquet(f"{out}/image_features").collect()}
        blob = bytes(media_rows[0][2])
        gray = mm._gray_image(blob)
        assert feat[1]["feat_mean"] == round(float(gray.mean()), 4)
        assert feat[1]["feat_std"] == round(float(gray.std()), 4)
        assert feat[1]["dhash"] == mm._dhash64(gray)
        px = mm.resize_gray(gray, 4, 4)
        assert feat[1]["pixels"] == [float(v) for v in px.ravel()]

    def test_undecodable_keeps_row_with_null_features(self, spark, prep):
        _, out = prep
        row = (
            spark.read.parquet(f"{out}/image_features")
            .filter(F.col("media_id") == 4)
            .head()
        )
        assert row is not None and row["kept"] is True
        assert row["feat_mean"] is None and row["dhash"] is None
        assert row["pixels"] is None

    def test_video_frame_features_real_decode(self, spark, prep, media_rows):
        _, out = prep
        frames = (
            spark.read.parquet(f"{out}/video_frame_features")
            .orderBy("frame_index")
            .collect()
        )
        blob_a = bytes(media_rows[0][2])
        gray_a = mm._gray_image(blob_a)
        assert frames[0]["luma_mean"] == round(float(gray_a.mean()), 4)

    def test_cli_prep_media_roundtrip(self, spark, media_rows, tmp_path):
        from power_generation_etl_spark.cli import main

        src = str(tmp_path / "media.parquet")
        spark.createDataFrame(
            media_rows, "media_id long, kind string, content binary"
        ).write.parquet(src)
        out = str(tmp_path / "out")
        rc = main(
            ["--warehouse", str(tmp_path / "wh"), "prep-media", src, out]
        )
        assert rc == 0
        meta = spark.read.parquet(f"{out}/video_metadata")
        assert meta.count() == 1

    def test_summary_serializes(self, prep, capsys):
        s, _ = prep
        assert json.loads(json.dumps(s.as_dict()))["n_input"] == 6


class TestDhashBucketGuard:
    """r10: the banded-candidate volume guard on the image family —
    same contract as minhash_lsh_pairs/simhash_pairs (identical images
    share all chunk buckets, so buckets grow with cluster size)."""

    def _sigs(self, spark):
        # 2-image identical cluster + 6-image identical cluster
        rows = [(1, 0x1234ABCD5678EF00), (2, 0x1234ABCD5678EF00)] + [
            (10 + i, 0x0F0F0F0F0F0F0F0F) for i in range(6)
        ]
        return spark.createDataFrame(rows, "media_id bigint, dhash bigint")

    def test_exact_below_bound_and_supercap_drop(self, spark):
        import warnings as w

        import pytest as pt

        sigs = self._sigs(spark)
        with w.catch_warnings():
            w.simplefilter("error")
            full = {
                (r["id_a"], r["id_b"])
                for r in mm.dhash_neardup_pairs(
                    sigs, max_candidates=10**9
                ).collect()
            }
        assert len(full) == 1 + 15  # both clusters all-pairs at hamming 0
        # bound=50: the 8 size-2 buckets (vol 16) fit, the 8 size-6
        # buckets (vol 240) don't -> cap=2; only the small pair survives
        with pt.warns(UserWarning, match="auto-engaging bucket_cap"):
            capped = {
                (r["id_a"], r["id_b"])
                for r in mm.dhash_neardup_pairs(
                    sigs, max_candidates=50
                ).collect()
            }
        assert capped == {(1, 2)}
