"""Generate the committed audio/video golden fixtures (r10).

Run from the repo root: `python tests/fixtures/real_av/gen_fixtures.py`
(regenerates byte-identical files — everything below is deterministic).

Foreign-encoder provenance (the point of these fixtures — see
README.md): the PCM WAV is written by CPython's stdlib `wave` module
and the µ-law/A-law payloads by CPython's `audioop` C implementation
of the G.711 codecs — both encoders foreign to this repo's decode
code, so a mirrored constant in `operators/multimodal.py::_wav_g711`
cannot cancel. The AVI is assembled field-by-field from the RIFF/AVI
spec (MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER layouts) by
THIS script — independent of both the decoder's chunk walk and the
catalog's SQL byte synthesizer — and carries the real libjpeg-encoded
CPython test-suite frames from tests/fixtures/real_jpeg/ (PSF license)
whose lossless PPM pixel truth is already committed.
"""

from __future__ import annotations

import io
import os
import struct
import wave

HERE = os.path.dirname(os.path.abspath(__file__))
JPEG_DIR = os.path.join(os.path.dirname(HERE), "real_jpeg")

# Deterministic int16 samples: exact zero, ±1, segment-spanning
# magnitudes, both rails, then a fixed pseudo-ramp covering all eight
# µ-law/A-law segments.
SAMPLES = [
    0, 1, -1, 7, -7, 64, -64, 500, -500, 4000, -4000,
    15000, -15000, 32767, -32767, -32768,
] + [((i * 2731 + 17) % 65536) - 32768 for i in range(32)]


def pcm16_wav(samples: list[int], rate: int = 8000) -> bytes:
    """PCM16 WAV via the stdlib `wave` encoder (foreign to the repo)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def g711_wav(payload: bytes, fmt_tag: int, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAV container around a G.711 payload, written
    field-by-field per the WAVEFORMAT spec (fmt tag 7 = µ-law, 6 =
    A-law; 8 bits/sample, mono). The stdlib can't write non-PCM WAVs,
    so only the 44-byte container layout is local code — the payload
    bytes (the part the decoder's expansion table must invert) come
    from audioop's C codec."""
    fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, data: bytes) -> bytes:
    return tag + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) % 2 else b""
    )


def _list(subtype: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", subtype + data)


def mjpeg_avi(frames: list[bytes], w: int, h: int, fps: int = 25) -> bytes:
    """Spec-complete minimal AVI-MJPEG: RIFF('AVI ') → LIST hdrl
    (avih + LIST strl (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) →
    LIST movi ('00dc' chunks). Field layouts transcribed from the
    RIFF/AVI spec, not from any code in this repo."""
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<10I4I",
        us_per_frame,          # dwMicroSecPerFrame
        sum(map(len, frames)) * fps,  # dwMaxBytesPerSec (advisory)
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX off, WASCAPTUREFILE-ish
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max(map(len, frames)), # dwSuggestedBufferSize
        w, h,                  # dwWidth, dwHeight
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0, 0, 0,               # flags, priority, language
        0,                     # initial frames
        1, fps,                # scale, rate → fps frames/sec
        0, len(frames),        # start, length (in frames)
        max(map(len, frames)), # suggested buffer
        0xFFFFFFFF, 0,         # quality (default), sample size (varies)
        0, 0, w, h,            # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main() -> int:
    import audioop  # deprecated in 3.11, removed in 3.13 — gen-time only

    raw = struct.pack(f"<{len(SAMPLES)}h", *SAMPLES)
    out = {
        "pcm16.wav": pcm16_wav(SAMPLES),
        "ulaw.wav": g711_wav(audioop.lin2ulaw(raw, 2), 7),
        "alaw.wav": g711_wav(audioop.lin2alaw(raw, 2), 6),
    }
    jpgs = [
        open(os.path.join(JPEG_DIR, "python.jpg"), "rb").read(),
        open(os.path.join(JPEG_DIR, "python-raw.jpg"), "rb").read(),
    ]
    out["python2f.avi"] = mjpeg_avi(jpgs, 16, 16)
    for name, data in out.items():
        with open(os.path.join(HERE, name), "wb") as fh:
            fh.write(data)
        print(f"{name}: {len(data)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
