"""mp4/mov sample-table demux + mp4/mkv/avi/y4m metadata probe: the
containers are synthesized in-test byte-for-byte (minimal valid ISO
BMFF box tree / EBML element tree), so the tests assert real parsing
against known ground truth with no codec or fixture files."""

from __future__ import annotations

import struct

from power_generation_etl_spark.operators.multimodal import (
    VIDEO_PROBE_SCHEMA,
    _mkv_frames,
    _mkv_metadata,
    _mp4_metadata,
    _mp4_video_samples,
    _y4m_metadata,
    probe_video_metadata,
    sample_video_frames,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _make_mp4(
    frames: list[bytes], *, two_chunks: bool = False, stsz_override: bytes | None = None
) -> bytes:
    """Minimal valid ISO BMFF: ftyp + mdat(frames) + moov with a video
    trak whose stsz/stsc/stco tables map the frames exactly. With
    two_chunks, the frames split across two chunks with distinct
    stsc runs (exercises the run expansion)."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(frames))
    data_off = len(ftyp) + 8  # first frame byte inside mdat

    stsz = _box(
        b"stsz",
        stsz_override
        if stsz_override is not None
        else struct.pack(">III", 0, 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    if two_chunks:
        # chunk 1: first frame; chunk 2: the rest
        stsc = _box(
            b"stsc",
            struct.pack(">II", 0, 2)
            + struct.pack(">III", 1, 1, 1)
            + struct.pack(">III", 2, len(frames) - 1, 1),
        )
        stco = _box(
            b"stco",
            struct.pack(">II", 0, 2)
            + struct.pack(">II", data_off, data_off + len(frames[0])),
        )
    else:
        stsc = _box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, len(frames), 1))
        stco = _box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", data_off))
    stsd = _box(
        b"stsd",
        struct.pack(">II", 0, 1) + struct.pack(">I", 16) + b"mp4v" + b"\x00" * 4,
    )
    stbl = _box(b"stbl", stsd + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", hdlr + minf)
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 0)  # version/flags
        + b"\x00" * 16  # ctime/mtime/track_id/reserved
        + struct.pack(">I", 2000)  # duration
        + b"\x00" * 16  # reserved/layer/alt/volume/reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", 320 << 16, 240 << 16),  # 16.16 fixed w/h
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0)
        + b"\x00" * 8  # ctime/mtime
        + struct.pack(">II", 1000, 2000)  # timescale, duration -> 2000 ms
        + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _ebml_el(eid: bytes, payload: bytes) -> bytes:
    n = len(payload)
    size = bytes([0x80 | n]) if n < 0x7F else struct.pack(">H", 0x4000 | n)
    return eid + size + payload


def _make_mkv(clusters: bytes = b"") -> bytes:
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
        + _ebml_el(b"\x44\x89", struct.pack(">f", 1500.0)),
    )
    video = _ebml_el(
        b"\xe0",
        _ebml_el(b"\xb0", (640).to_bytes(2, "big"))
        + _ebml_el(b"\xba", (360).to_bytes(2, "big")),
    )
    track = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", b"\x01")  # TrackNumber = 1
        + _ebml_el(b"\x83", b"\x01")
        + _ebml_el(b"\x86", b"V_MPEG4/ISO/AVC")
        + video,
    )
    audio = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", b"\x02") + _ebml_el(b"\x83", b"\x02"),
    )
    tracks = _ebml_el(b"\x16\x54\xae\x6b", track + audio)
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks + clusters)
    return _ebml_el(b"\x1a\x45\xdf\xa3", b"") + segment


def _xiph_size(n: int) -> bytes:
    return bytes([255] * (n // 255) + [n % 255])


def _simpleblock(track: int, frames: list[bytes], lacing: str) -> bytes:
    """SimpleBlock payload: track vint + int16 timecode + flags +
    lace headers + frame payloads, per the Matroska block structure."""
    head = bytes([0x80 | track]) + struct.pack(">h", 0)
    if lacing == "none":
        assert len(frames) == 1
        return _ebml_el(b"\xa3", head + bytes([0x80]) + frames[0])
    body = bytes([len(frames) - 1])
    if lacing == "xiph":
        flags = 0x82
        body += b"".join(_xiph_size(len(f)) for f in frames[:-1])
    elif lacing == "fixed":
        flags = 0x84
        assert len({len(f) for f in frames}) == 1
    elif lacing == "ebml":
        flags = 0x86
        if len(frames) > 1:
            body += bytes([0x80 | len(frames[0])])  # first size, vint
            prev = len(frames[0])
            for f in frames[1:-1]:
                # 1-byte signed vint delta: raw = delta + 63
                body += bytes([0x80 | (len(f) - prev + 63)])
                prev = len(f)
    return _ebml_el(b"\xa3", head + bytes([flags]) + body + b"".join(frames))


_LACED = [b"aaaa-frame-0", b"b1", b"cc-frame-2-is-longer"]


class TestMkvDemux:
    def test_no_lacing(self):
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, [b"only-frame"], "none"))
        assert _mkv_frames(_make_mkv(cl)) == [b"only-frame"]

    def test_xiph_lacing(self):
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, _LACED, "xiph"))
        assert _mkv_frames(_make_mkv(cl)) == _LACED

    def test_xiph_255_boundary(self):
        frames = [b"x" * 255, b"y" * 510, b"tail"]
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, frames, "xiph"))
        assert _mkv_frames(_make_mkv(cl)) == frames

    def test_ebml_lacing(self):
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, _LACED, "ebml"))
        assert _mkv_frames(_make_mkv(cl)) == _LACED

    def test_fixed_lacing(self):
        frames = [b"12345678", b"abcdefgh", b"ABCDEFGH"]
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, frames, "fixed"))
        assert _mkv_frames(_make_mkv(cl)) == frames

    def test_blockgroup_and_multi_cluster(self):
        bg = _ebml_el(
            b"\xa0",
            _ebml_el(b"\xa1", bytes([0x81]) + struct.pack(">h", 0) + b"\x00" + b"grouped"),
        )
        cl1 = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, [b"first"], "none"))
        cl2 = _ebml_el(b"\x1f\x43\xb6\x75", bg)
        assert _mkv_frames(_make_mkv(cl1 + cl2)) == [b"first", b"grouped"]

    def test_non_video_track_filtered(self):
        cl = _ebml_el(
            b"\x1f\x43\xb6\x75",
            _simpleblock(2, [b"audio-bytes"], "none")
            + _simpleblock(1, [b"video-bytes"], "none"),
        )
        assert _mkv_frames(_make_mkv(cl)) == [b"video-bytes"]

    def test_no_clusters_or_not_mkv(self):
        assert _mkv_frames(_make_mkv()) is None
        assert _mkv_frames(b"not an ebml stream") is None

    def test_truncated_does_not_raise(self):
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, _LACED, "xiph"))
        blob = _make_mkv(cl)
        for cutoff in (len(blob) - 5, len(blob) - 20, 30, 7):
            _mkv_frames(blob[:cutoff])  # must not raise

    def test_mkv_tier_in_frame_sampler(self, spark):
        cl = _ebml_el(b"\x1f\x43\xb6\x75", _simpleblock(1, _LACED, "ebml"))
        df = spark.createDataFrame(
            [(0, "video", None, _make_mkv(cl), None, None, None)],
            "media_id bigint, kind string, mime string, content binary,"
            " width int, height int, duration_ms bigint",
        )
        got = sample_video_frames(df, n_frames=3).collect()
        assert [bytes(r["frame_bytes"]) for r in got] == _LACED


_FRAMES = [b"frame-zero!!", b"f1-payload", b"frame--2", b"last-frame-3"]


class TestMp4Demux:
    def test_sample_table_roundtrip(self):
        assert _mp4_video_samples(_make_mp4(_FRAMES)) == _FRAMES

    def test_two_chunk_roundtrip(self):
        assert _mp4_video_samples(_make_mp4(_FRAMES, two_chunks=True)) == _FRAMES

    def test_metadata(self):
        meta = _mp4_metadata(_make_mp4(_FRAMES))
        assert meta == {
            "container": "mp4",
            "duration_ms": 2000,
            "width": 320,
            "height": 240,
            "codec": "mp4v",
            "n_frames": 4,
        }

    def test_not_mp4(self):
        assert _mp4_video_samples(b"RIFF....AVI not an mp4") is None
        assert _mp4_video_samples(b"") is None
        # truncated box header / garbage sizes must not raise
        assert _mp4_video_samples(b"\x00\x00\x00\x08ftyp"[:6]) is None

    def test_truncated_tables_return_none(self):
        blob = _make_mp4(_FRAMES)
        assert _mp4_video_samples(blob[: len(blob) - 40]) is None


class TestMkvMetadata:
    def test_metadata(self):
        meta = _mkv_metadata(_make_mkv())
        assert meta == {
            "container": "mkv",
            "duration_ms": 1500,
            "width": 640,
            "height": 360,
            "codec": "V_MPEG4/ISO/AVC",
        }

    def test_not_mkv(self):
        assert _mkv_metadata(b"not an ebml stream") is None


class TestUntrustedBytesHardening:
    """Probes/demuxers run over UNTRUSTED binary columns — crafted or
    corrupt headers must fail closed (None), never allocate
    proportionally to header-declared counts, and never raise."""

    def test_stsz_count_bomb_rejected(self):
        # fixed-size stsz declaring ~2^32 samples: a naive
        # `[fixed] * count` would allocate a multi-GB list per row.
        bomb = struct.pack(">III", 0, 1, 0xFFFF0000)
        blob = _make_mp4(_FRAMES, stsz_override=bomb)
        assert _mp4_video_samples(blob) is None
        assert _mp4_metadata(blob) is None or "n_frames" not in _mp4_metadata(blob)

    def test_stsz_fixed_size_legit(self):
        # a LEGIT fixed-size table (4 samples of 12 bytes) still demuxes
        frames = [b"aaaabbbbcccc", b"ddddeeeeffff", b"gggghhhhiiii", b"jjjjkkkkllll"]
        fixed = struct.pack(">III", 0, 12, 4)
        assert _mp4_video_samples(_make_mp4(frames, stsz_override=fixed)) == frames

    def test_y4m_frame_marker_in_payload_not_counted(self):
        # 4x2 mono frames (8 bytes each) whose PAYLOAD contains the
        # ASCII marker b"FRAME" — a substring count would report 4.
        payload = b"FRAMExyz"
        blob = (
            b"YUV4MPEG2 W4 H2 F25:1 Cmono\n"
            + b"FRAME\n" + payload
            + b"FRAME\n" + b"01234567"
        )
        meta = _y4m_metadata(blob)
        assert meta["n_frames"] == 2
        assert meta["duration_ms"] == 2 * 1000 // 25

    def test_y4m_c411_counted_like_420(self):
        # C411 (DV): 12 bpp like 4:2:0 — 4x2 frames are 12 bytes
        blob = (
            b"YUV4MPEG2 W4 H2 F30:1 C411\n"
            + b"FRAME\n" + bytes(12)
            + b"FRAME\n" + bytes(range(12))
        )
        meta = _y4m_metadata(blob)
        assert meta["n_frames"] == 2
        assert meta["duration_ms"] == 2 * 1000 // 30

    def test_y4m_unknown_colourspace_yields_null_not_zero(self):
        # an unwalkable colourspace must NOT claim "0 frames" (reads
        # as an empty clip to quality filters) — n_frames stays null
        blob = b"YUV4MPEG2 W4 H2 F25:1 Cxyz9\n" + b"FRAME\n" + bytes(12)
        meta = _y4m_metadata(blob)
        assert meta["container"] == "y4m"
        assert meta["n_frames"] is None
        assert "duration_ms" not in meta

    def test_mkv_odd_duration_size_skipped_not_fatal(self):
        # Duration element of 3 bytes (neither float32 nor float64):
        # the probe must keep the rest of the metadata, not return None.
        info = _ebml_el(
            b"\x15\x49\xa9\x66",
            _ebml_el(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
            + _ebml_el(b"\x44\x89", b"\x01\x02\x03"),
        )
        track = _ebml_el(
            b"\xae",
            _ebml_el(b"\xd7", b"\x01")
            + _ebml_el(b"\x83", b"\x01")
            + _ebml_el(b"\x86", b"V_VP9"),
        )
        tracks = _ebml_el(b"\x16\x54\xae\x6b", track)
        segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks)
        meta = _mkv_metadata(_ebml_el(b"\x1a\x45\xdf\xa3", b"") + segment)
        assert meta is not None
        assert meta["codec"] == "V_VP9"
        assert "duration_ms" not in meta


class TestSparkPlumbing:
    def _media_df(self, spark, blobs):
        return spark.createDataFrame(
            [(i, "video", None, b, None, None, None) for i, b in enumerate(blobs)],
            "media_id bigint, kind string, mime string, content binary,"
            " width int, height int, duration_ms bigint",
        )

    def test_mp4_tier_in_frame_sampler(self, spark):
        df = self._media_df(spark, [_make_mp4(_FRAMES)])
        got = sample_video_frames(df, n_frames=2).collect()
        # evenly spaced incl. frame 0 over the 4 demuxed samples
        assert [bytes(r["frame_bytes"]) for r in got] == [_FRAMES[0], _FRAMES[2]]

    def test_probe_total_over_input(self, spark):
        df = self._media_df(
            spark, [_make_mp4(_FRAMES), _make_mkv(), b"???unknown???"]
        )
        out = probe_video_metadata(df)
        assert out.schema == VIDEO_PROBE_SCHEMA
        rows = {r["media_id"]: r for r in out.collect()}
        assert len(rows) == 3  # total: unknown containers keep their row
        assert rows[0]["container"] == "mp4" and rows[0]["n_frames"] == 4
        assert rows[1]["container"] == "mkv" and rows[1]["codec"] == "V_MPEG4/ISO/AVC"
        assert rows[1]["duration_ms"] == 1500
        assert rows[2]["container"] is None


class TestSceneCuts:
    def test_cut_rule_and_null_frames(self, spark):
        from power_generation_etl_spark.operators.multimodal import scene_cuts

        # Hand-built feature rows: luma sums 1000, 1601 (diff 601 > 600
        # → cut), 1601 (diff 0), 900 (diff 701 → cut at index 3);
        # video 2 has a null-decode middle frame → no cuts ever.
        feats = spark.createDataFrame(
            [
                (1, 0, 100, 1000 / 64, 0.0),
                (1, 1, 100, 1601 / 64, 0.0),
                (1, 2, 100, 1601 / 64, 0.0),
                (1, 3, 100, 900 / 64, 0.0),
                (2, 0, 100, 1000 / 64, 0.0),
                (2, 1, 100, None, None),
                (2, 2, 100, 5000 / 64, 0.0),
            ],
            "media_id long, frame_index int, n_bytes long, "
            "luma_mean double, luma_std double",
        )
        got = {
            r["media_id"]: (r["n_frames"], r["n_cuts"], r["cut_checksum"])
            for r in scene_cuts(feats, pixels=64, threshold=600).collect()
        }
        assert got[1] == (4, 2, 1 + 3)
        # null middle frame: both adjacent diffs are null → no cuts
        assert got[2] == (3, 0, 0)

    def test_exact_threshold_is_not_a_cut(self, spark):
        from power_generation_etl_spark.operators.multimodal import scene_cuts

        feats = spark.createDataFrame(
            [(1, 0, 9, 0.0, 0.0), (1, 1, 9, 600 / 64, 0.0)],
            "media_id long, frame_index int, n_bytes long, "
            "luma_mean double, luma_std double",
        )
        r = scene_cuts(feats, pixels=64, threshold=600).collect()[0]
        assert (r["n_cuts"], r["cut_checksum"]) == (0, 0)  # strict >
