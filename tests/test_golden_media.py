"""Foreign-encoder golden fixtures for the WAV/G.711 and AVI decode
tiers (r10 — closes the r9 verdict's item 7).

The media catalog oracles (`plans/media_queries.py`) synthesize WAV and
AVI bytes in SQL and decode them through `operators/multimodal.py`, so
container-header literals are shared between synthesizer and decoder —
a mirrored header-field or codec-table bug would cancel (exactly the
risk `tests/fixtures/real_jpeg/` closed for JPEG). These tests decode
bytes produced by FOREIGN encoders (stdlib `wave`, `audioop`'s C
implementation of G.711, and real libjpeg frames inside a
spec-transcribed AVI) against a priori sample/pixel truth — see
tests/fixtures/real_av/README.md for provenance.
"""

from __future__ import annotations

import pathlib
import struct

import numpy as np
import pytest

from power_generation_etl_spark.operators.multimodal import (
    _avi_frames,
    _avi_metadata,
    _decode_wav,
    _jpeg_gray_pixels,
    _wav_pcm,
)

from tests.fixtures.real_av.gen_fixtures import SAMPLES

FIX = pathlib.Path(__file__).parent / "fixtures" / "real_av"
JPEG_FIX = pathlib.Path(__file__).parent / "fixtures" / "real_jpeg"

def _audioop():
    """Skip only the G.711-reproducibility checks on Python 3.13+ (the
    stdlib reference codec is gone; the committed goldens stay frozen).
    A module-level skip would also drop the PCM roundtrip and the AVI
    demux goldens, which never touch audioop."""
    return pytest.importorskip(
        "audioop", reason="G.711 reference codec gone (py3.13+) — goldens frozen"
    )


def _fixture(name: str) -> bytes:
    return (FIX / name).read_bytes()


class TestGoldenWav:
    def test_fixtures_are_reproducible(self):
        """The committed bytes match a fresh generator run — no silent
        drift between fixture, generator, and the provenance README."""
        from tests.fixtures.real_av import gen_fixtures as g

        raw = struct.pack(f"<{len(SAMPLES)}h", *SAMPLES)
        assert _fixture("pcm16.wav") == g.pcm16_wav(SAMPLES)
        audioop = _audioop()
        assert _fixture("ulaw.wav") == g.g711_wav(audioop.lin2ulaw(raw, 2), 7)
        assert _fixture("alaw.wav") == g.g711_wav(audioop.lin2alaw(raw, 2), 6)

    def test_pcm16_stdlib_encoder_roundtrip_exact(self):
        rate, nch, x = _wav_pcm(_fixture("pcm16.wav"))
        assert (rate, nch) == (8000, 1)
        got = np.round(x * 32768.0).astype(np.int64)
        assert got.tolist() == SAMPLES  # /32768 normalization is exact

    @pytest.mark.parametrize(
        "name,enc,dec",
        [
            ("ulaw.wav", "lin2ulaw", "ulaw2lin"),
            ("alaw.wav", "lin2alaw", "alaw2lin"),
        ],
    )
    def test_g711_expansion_matches_reference_codec(self, name, enc, dec):
        """Our integer expansion table must invert audioop's G.711
        ENCODER output to exactly the int16 values audioop's own
        DECODER produces (the ITU reference tables), and land within
        one quantization segment of the original samples — a mirrored
        bias/segment bug in `_wav_g711` fails both ways."""
        audioop = _audioop()
        rate, nch, x = _wav_pcm(_fixture(name))
        assert (rate, nch) == (8000, 1)
        got = np.round(x * 32768.0).astype(np.int64)

        raw = struct.pack(f"<{len(SAMPLES)}h", *SAMPLES)
        ref_bytes = getattr(audioop, dec)(getattr(audioop, enc)(raw, 2), 2)
        ref = np.frombuffer(ref_bytes, "<i2").astype(np.int64)
        assert got.tolist() == ref.tolist()

        # independent of any codec: expansion stays within G.711's
        # per-segment quantization error of the ORIGINAL samples
        # (largest µ-law step 2048/2, A-law 1024/2 → generous 1100)
        err = np.abs(got - np.asarray(SAMPLES, np.int64))
        assert int(err.max()) <= 1100, int(err.max())

    def test_decode_wav_peak_from_known_samples(self):
        meta = _decode_wav(_fixture("pcm16.wav"))
        rate, nch, n_samples, duration_ms, _rms, peak = meta
        assert (rate, nch, n_samples) == (8000, 1, len(SAMPLES))
        assert duration_ms == len(SAMPLES) * 1000 // 8000
        assert peak == round(
            max(abs(s) for s in SAMPLES) / 32768.0, 6
        )


class TestGoldenAvi:
    def _ppm_luma(self) -> np.ndarray:
        import re

        raw = (JPEG_FIX / "python.ppm").read_bytes()
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", raw)
        w, h, _mx = map(int, m.groups())
        arr = (
            np.frombuffer(raw[m.end() : m.end() + w * h * 3], np.uint8)
            .reshape(h, w, 3)
            .astype(np.float64)
        )
        return (arr[..., 0] * 299 + arr[..., 1] * 587 + arr[..., 2] * 114) / 1000

    def test_demux_recovers_foreign_frames_bytewise(self):
        """The chunk walk must hand back the embedded libjpeg frames
        byte-for-byte — a size/padding/offset bug in either the walk or
        the spec-transcribed writer shows as a byte diff."""
        frames = _avi_frames(_fixture("python2f.avi"))
        assert frames is not None and len(frames) == 2
        assert frames[0] == (JPEG_FIX / "python.jpg").read_bytes()
        assert frames[1] == (JPEG_FIX / "python-raw.jpg").read_bytes()

    def test_metadata_from_spec_written_header(self):
        meta = _avi_metadata(_fixture("python2f.avi"))
        assert meta["container"] == "avi"
        assert meta["n_frames"] == 2
        assert (meta["width"], meta["height"]) == (16, 16)
        assert meta["duration_ms"] == 2 * (1_000_000 // 25) // 1000  # 80ms

    def test_frame_pixels_match_lossless_truth(self):
        """Demux + the repo's pure-python JPEG decode, end-to-end
        against the committed PPM pixel truth — same PSNR bar as the
        still-image golden (a symmetric zigzag/IDCT/sign bug lands
        under 20 dB)."""
        truth = self._ppm_luma()
        for fb in _avi_frames(_fixture("python2f.avi")):
            gray = _jpeg_gray_pixels(fb)
            assert gray is not None and gray.shape == truth.shape
            mse = float(((gray - truth) ** 2).mean())
            psnr = 10 * np.log10(255.0**2 / mse)
            assert psnr > 35.0, psnr
