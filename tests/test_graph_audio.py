"""Triangle counting (degree orientation) and WAV spectral features."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest


def _make_wav(freq_hz: float, rate: int = 8000, ms: int = 250, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    n = rate * ms // 1000
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            s = int(20000 * math.sin(2 * math.pi * freq_hz * i / rate))
            frames += struct.pack("<h", s) * nch
        w.writeframes(bytes(frames))
    return buf.getvalue()


class TestTriangles:
    def test_known_graph(self, spark):
        from power_generation_etl_spark.operators.graph import triangle_count

        # K4 (4 triangles) + a pendant edge + a duplicate/reversed edge
        edges = [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (4, 5),            # pendant — no new triangle
            (2, 1), (3, 1),    # reversed duplicates — must not double count
            (5, 5),            # self loop — dropped
        ]
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        assert triangle_count(df, "u", "v").collect()[0]["n_triangles"] == 4

    def test_triangle_free(self, spark):
        from power_generation_etl_spark.operators.graph import triangle_count

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "u bigint, v bigint"
        )
        assert triangle_count(df, "u", "v").collect()[0]["n_triangles"] == 0

    def test_empty(self, spark):
        from power_generation_etl_spark.operators.graph import triangle_count

        df = spark.createDataFrame([], "u bigint, v bigint")
        assert triangle_count(df, "u", "v").collect()[0]["n_triangles"] == 0


class TestAudioSpectral:
    def test_sine_dominant_frequency(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            extract_audio_spectral,
        )

        rows = [
            (1, "audio", "audio/wav", _make_wav(440.0), None, None, None),
            (2, "audio", "audio/wav", _make_wav(1000.0, nch=2), None, None, None),
            (3, "audio", "audio/mpeg", b"\xff\xfbnotdecodable", None, None, None),
            (4, "image", "image/png", b"\x89PNG", None, None, None),
        ]
        from power_generation_etl_spark.operators.multimodal import MEDIA_SCHEMA

        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r["media_id"]: r for r in extract_audio_spectral(df).collect()}
        assert set(got) == {1, 2, 3}  # images filtered out
        assert got[1]["dominant_hz"] == pytest.approx(440.0, abs=5.0)
        assert got[2]["dominant_hz"] == pytest.approx(1000.0, abs=5.0)
        assert got[3]["dominant_hz"] is None
        # centroid of a pure tone sits near the tone
        assert got[1]["centroid_hz"] == pytest.approx(440.0, abs=40.0)

    def test_audio_summary_still_decodes(self, spark):
        # the _wav_pcm refactor must keep extract_audio_features intact
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_features,
        )

        df = spark.createDataFrame(
            [(1, "audio", "audio/wav", _make_wav(440.0), None, None, None)],
            MEDIA_SCHEMA,
        )
        r = extract_audio_features(df).collect()[0]
        assert r["sample_rate"] == 8000
        assert r["n_channels"] == 1
        assert r["duration_ms"] == 250
        # sine rms = amp/sqrt(2) = (20000/32768)/1.414 ≈ 0.432
        assert r["rms"] == pytest.approx(0.432, abs=0.01)


class TestKCore:
    def test_peeling_cascade(self, spark):
        from power_generation_etl_spark.operators.graph import kcore

        # Triangle {1,2,3} plus a chain 3-4-5: 2-core = the triangle
        # only, and removing 5 (deg 1) must cascade the removal of 4.
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        got = {r["id"]: r["core_degree"] for r in kcore(df, "u", "v", k=2).collect()}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_k_larger_than_graph(self, spark):
        from power_generation_etl_spark.operators.graph import kcore

        df = spark.createDataFrame([(1, 2), (2, 3)], "u bigint, v bigint")
        assert kcore(df, "u", "v", k=5).count() == 0

    def test_nonconvergence_raises(self, spark):
        """Deep peeling (a long chain into a triangle core) needs one
        round per chain hop; an under-budgeted max_rounds must raise
        rather than silently return a superset of the k-core."""
        import pytest as _pytest

        from power_generation_etl_spark.operators.graph import kcore

        chain = [(i, i + 1) for i in range(10, 18)]  # 10-11-...-18
        tri = [(1, 2), (2, 3), (1, 3), (3, 10)]
        df = spark.createDataFrame(tri + chain, "u bigint, v bigint")
        with _pytest.raises(ValueError, match="fixpoint"):
            kcore(df, "u", "v", k=2, max_rounds=2)
        # strict=False accepts the truncated trajectory (a superset)...
        loose = {r["id"] for r in
                 kcore(df, "u", "v", k=2, max_rounds=2, strict=False).collect()}
        assert {1, 2, 3} < loose
        # ...and enough rounds reaches the true 2-core: the triangle.
        full = {r["id"] for r in kcore(df, "u", "v", k=2).collect()}
        assert full == {1, 2, 3}


class TestRarity:
    def test_hand_computed(self, spark):
        from power_generation_etl_spark.operators.text import rarity_scores

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "a z"), (3, None)],
            "doc_id bigint, text string",
        )
        # corpus tokens: a×3, b×1, z×1 → T=5
        # doc 1: 5//3 + 5//3 + 5//1 = 1+1+5 = 7, n=3, avg=2
        # doc 2: 5//3 + 5//1 = 1+5 = 6, n=2, avg=3
        got = {
            r["doc_id"]: (r["rarity"], r["n_tokens"], r["avg_rarity"])
            for r in rarity_scores(docs, "doc_id", "text").collect()
        }
        assert got == {1: (7, 3, 2), 2: (6, 2, 3)}

    def test_empty(self, spark):
        from power_generation_etl_spark.operators.text import rarity_scores

        docs = spark.createDataFrame([], "doc_id bigint, text string")
        out = rarity_scores(docs, "doc_id", "text")
        assert out.count() == 0
        assert out.columns == ["doc_id", "rarity", "n_tokens", "avg_rarity"]


class TestLPA:
    def test_two_cliques_with_bridge(self, spark):
        from power_generation_etl_spark.operators.graph import label_propagation

        # two triangles bridged by one edge: labels converge within
        # each triangle to its min node id
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        labs = {
            r["id"]: r["lab"]
            for r in label_propagation(df, "u", "v", rounds=4).collect()
        }
        assert len(labs) == 6
        # deterministic: re-running yields the identical labeling
        labs2 = {
            r["id"]: r["lab"]
            for r in label_propagation(df, "u", "v", rounds=4).collect()
        }
        assert labs == labs2
        # the two triangle interiors never share a label with each other
        assert labs[1] != labs[6]

    def test_isolated_pair(self, spark):
        from power_generation_etl_spark.operators.graph import label_propagation

        df = spark.createDataFrame([(7, 8)], "u bigint, v bigint")
        labs = {
            r["id"]: r["lab"]
            for r in label_propagation(df, "u", "v", rounds=2).collect()
        }
        # even rounds of a 2-cycle: each adopts the other then swaps back
        assert set(labs) == {7, 8}


def test_cusum_closed_form_matches_recurrence(spark):
    """S_i = P_i - min(0, min_j<=i P_j) must equal the clamped
    recurrence max(0, S_{i-1} + d_i) on a hand-run series."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    drifts = [3, -5, 2, 2, -1, 4, -10, 6]
    s, exp = 0, []
    for d in drifts:
        s = max(0, s + d)
        exp.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(drifts)], "i int, d bigint"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    got = [
        r["s"]
        for r in df.select(
            "i",
            (
                F.sum("d").over(w)
                - F.least(F.lit(0).cast("bigint"), F.min(F.sum("d").over(w)).over(w))
            ).alias("s"),
        )
        .orderBy("i")
        .collect()
    ]
    assert got == exp


def _make_wav_scaled(freq_hz: float, amp: int, rate: int = 8000, ms: int = 400,
                     sweep_hz: float = 2000.0) -> bytes:
    """Linear chirp (not a stationary tone): the Haitsma-Kalker bits
    are band-energy DERIVATIVE signs, which are all zero for a steady
    sine — temporal structure is what the fingerprint encodes."""
    buf = io.BytesIO()
    n = rate * ms // 1000
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        phase = 0.0
        for i in range(n):
            f = freq_hz + sweep_hz * i / n
            phase += 2 * math.pi * f / rate
            s = int(amp * math.sin(phase))
            frames += struct.pack("<h", s)
        w.writeframes(bytes(frames))
    return buf.getvalue()


class TestAudioFingerprint:
    def test_volume_invariant_and_content_sensitive(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_fingerprint,
        )

        rows = [
            (1, "audio", "audio/wav", _make_wav_scaled(440.0, 20000), None, None, None),
            (2, "audio", "audio/wav", _make_wav_scaled(440.0, 9000), None, None, None),
            (3, "audio", "audio/wav", _make_wav_scaled(440.0, 20000, sweep_hz=-300.0), None, None, None),
            (4, "audio", "audio/mpeg", b"\xff\xfbnope", None, None, None),
            (5, "image", "image/png", b"\x89PNG", None, None, None),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r["media_id"]: r for r in extract_audio_fingerprint(df).collect()}
        assert set(got) == {1, 2, 3, 4}  # images filtered, bad audio kept as nulls
        # volume scaling preserves derivative signs up to int16
        # quantization noise on near-zero differences: near, not exact
        ham12 = bin(
            (got[1]["afp64"] ^ got[2]["afp64"]) & ((1 << 64) - 1)
        ).count("1")
        assert ham12 <= 4
        assert got[1]["afp64"] is not None and got[1]["afp64"] != 0
        # an opposite-direction sweep flips derivative bits
        assert got[1]["afp64"] != got[3]["afp64"]
        assert got[4]["afp64"] is None and got[4]["n_frames"] is None

    def test_feeds_banded_hamming_pairs(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            dhash_neardup_pairs,
            extract_audio_fingerprint,
        )

        rows = [
            (1, "audio", "audio/wav", _make_wav_scaled(440.0, 20000), None, None, None),
            (2, "audio", "audio/wav", _make_wav_scaled(440.0, 9000), None, None, None),
            (3, "audio", "audio/wav", _make_wav_scaled(2600.0, 20000, sweep_hz=-2000.0), None, None, None),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        sigs = extract_audio_fingerprint(df).localCheckpoint()
        fps = {r["media_id"]: r["afp64"] for r in sigs.collect()}
        pairs = dhash_neardup_pairs(sigs, hash_col="afp64", max_hamming=4).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # self-consistency: the banded join must return exactly the
        # pairs whose true 64-bit Hamming distance is <= 4
        want = set()
        ids = sorted(fps)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin((fps[ids[i]] ^ fps[ids[j]]) & ((1 << 64) - 1)).count("1")
                if ham <= 4:
                    want.add((ids[i], ids[j]))
        assert got == want
        assert (1, 2) in got  # volume twin lands within the Hamming bound

    def test_too_short_clip_null(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_fingerprint,
        )

        rows = [(1, "audio", "audio/wav", _make_wav_scaled(440.0, 20000, ms=30), None, None, None)]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        r = extract_audio_fingerprint(df).collect()[0]
        assert r["afp64"] is None


class TestCopartition:
    """Iteration-invariant tables (LPA adjacency, PageRank weighted
    edges) are pre-partitioned by their per-round join key under the
    cluster lineage-cut modes, so each round exchanges only the |V|
    label/rank side, never the 2|E| table."""

    def test_cluster_mode_elides_edge_side_exchange(self, spark, monkeypatch):
        from pyspark.sql import functions as F

        from power_generation_etl_spark import lineage
        from power_generation_etl_spark.operators.graph import _copartition

        monkeypatch.setenv("SPARK_ETL_LINEAGE_CUT", "persist")
        adj = spark.range(500).select(
            (F.col("id") % 50).alias("nb"), F.col("id")
        )
        pre = lineage.cut(_copartition(adj, "nb"))
        labels = spark.range(50).select(
            F.col("id").alias("nb"), F.lit(1).alias("lab")
        )
        try:
            plan = (
                pre.join(labels.hint("merge"), "nb")
                .select("id")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            ens = [
                ln
                for ln in plan.splitlines()
                if "ENSURE_REQUIREMENTS" in ln and "hashpartitioning(nb" in ln
            ]
            # only the labels side needs an exchange; the cached
            # adjacency reports its static hash partitioning
            assert len(ens) == 1, plan
        finally:
            pre.unpersist()

    def test_local_mode_is_noop(self, spark, monkeypatch):
        # localCheckpoint drops outputPartitioning across the RDD scan
        # boundary, so the up-front shuffle would be pure cost
        monkeypatch.setenv("SPARK_ETL_LINEAGE_CUT", "local")
        from pyspark.sql import functions as F

        from power_generation_etl_spark.operators.graph import _copartition

        adj = spark.range(10).select((F.col("id") % 3).alias("nb"), "id")
        assert _copartition(adj, "nb") is adj


class TestG711Wav:
    """µ-law / A-law WAV decode (format tags 7/6 — the speech-corpus
    encodings stdlib `wave` rejects): round-trips against independent
    reference compressors implemented from the G.711 segment layout."""

    @staticmethod
    def _ulaw_compress(x):
        import numpy as np

        BIAS, CLIP = 0x84, 32635
        x = np.clip(x.astype(np.int64), -CLIP, CLIP)
        sign = np.where(x < 0, 0x80, 0)
        a = np.abs(x) + BIAS
        exp = np.clip(np.floor(np.log2(a)).astype(np.int64) - 7, 0, 7)
        mant = (a >> (exp + 3)) & 0x0F
        return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)

    @staticmethod
    def _alaw_compress(x):
        import numpy as np

        x = x.astype(np.int64)
        sign = np.where(x >= 0, 0x80, 0)  # pre-XOR: bit set = positive
        a = np.clip(np.abs(x), 0, 32767)
        exp = np.where(
            a < 256, 0, np.floor(np.log2(np.maximum(a, 1))).astype(np.int64) - 7
        )
        mant = np.where(exp == 0, a >> 4, (a >> (exp + 3)) & 0x0F)
        return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)

    @staticmethod
    def _g711_wav(fmt_tag, rate, nch, payload):
        import struct

        fmt = struct.pack("<HHIIHH", fmt_tag, nch, rate, rate * nch, nch, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    @staticmethod
    def _snr_db(ref, got):
        import numpy as np

        noise = ref - got
        return 10 * np.log10(float((ref**2).sum()) / float((noise**2).sum()))

    def _sine16(self, n=8000, f=440.0, rate=8000, amp=20000):
        import numpy as np

        t = np.arange(n) / rate
        return np.round(amp * np.sin(2 * np.pi * f * t)).astype(np.int64)

    def test_ulaw_roundtrip_snr(self):
        from power_generation_etl_spark.operators.multimodal import _wav_pcm

        s = self._sine16()
        blob = self._g711_wav(7, 8000, 1, self._ulaw_compress(s).tobytes())
        rate, nch, x = _wav_pcm(blob)
        assert (rate, nch, len(x)) == (8000, 1, len(s))
        assert self._snr_db(s / 32768.0, x) > 30

    def test_alaw_roundtrip_snr(self):
        from power_generation_etl_spark.operators.multimodal import _wav_pcm

        s = self._sine16()
        blob = self._g711_wav(6, 8000, 1, self._alaw_compress(s).tobytes())
        rate, nch, x = _wav_pcm(blob)
        assert (rate, nch, len(x)) == (8000, 1, len(s))
        assert self._snr_db(s / 32768.0, x) > 30

    def test_sign_conventions(self):
        # hand-checked values: both codings must preserve the SIGN of
        # every sample (the two specs use opposite sign-bit meanings)
        import numpy as np

        from power_generation_etl_spark.operators.multimodal import _wav_pcm

        s = np.array([1000, -1000, 30000, -30000, 16, -16], np.int64)
        for tag, comp in ((7, self._ulaw_compress), (6, self._alaw_compress)):
            blob = self._g711_wav(tag, 8000, 1, comp(s).tobytes())
            _, _, x = _wav_pcm(blob)
            assert (np.sign(x) == np.sign(s)).all(), (tag, x)

    def test_stereo_duration_and_features(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            extract_audio_features,
        )

        s = self._sine16(n=16000)  # 8000 stereo frames at 8 kHz = 1000 ms
        blob = self._g711_wav(7, 8000, 2, self._ulaw_compress(s).tobytes())
        df = spark.createDataFrame(
            [(0, "audio", None, blob, None, None, None)],
            "media_id bigint, kind string, mime string, content binary,"
            " width int, height int, duration_ms bigint",
        )
        row = extract_audio_features(df).collect()[0]
        assert row["n_channels"] == 2
        assert row["sample_rate"] == 8000
        assert abs(row["duration_ms"] - 1000) <= 1

    def test_other_formats_still_rejected(self):
        from power_generation_etl_spark.operators.multimodal import _wav_pcm

        blob = self._g711_wav(2, 8000, 1, b"\x00" * 64)  # ADPCM tag
        assert _wav_pcm(blob) is None
        assert _wav_pcm(b"RIFF\x00\x00\x00\x00WAVEjunk") is None


class TestSilenceSegments:
    def _wav_from_i16(self, samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    def test_hand_computed_runs(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            segment_audio_silence,
        )

        loud, soft = 20000, 10
        # runs: [0,1] silent (len 2, start 0), [3] silent (len 1 → dropped),
        # [5..7] silent (len 3, start 5) → 2 segments, 5 samples,
        # checksum (0+1)*2 + (5+1)*3 = 20
        s1 = [soft, soft, loud, soft, loud, soft, soft, soft]
        # all-silent blob: one run covering everything
        s2 = [0] * 4
        rows = [
            (1, "audio", "audio/wav", self._wav_from_i16(s1), None, None, None),
            (2, "audio", "audio/wav", self._wav_from_i16(s2), None, None, None),
            (3, "audio", "audio/mpeg", b"\xff\xfbnope", None, None, None),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {
            r["media_id"]: tuple(r)[1:]
            for r in segment_audio_silence(df, threshold_i16=8192, min_run=2).collect()
        }
        assert got[1] == (2, 5, 20)
        assert got[2] == (1, 4, 4)  # (0+1)*4
        assert got[3] == (None, None, None)

    def test_min_run_and_threshold_knobs(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            segment_audio_silence,
        )

        s = [100, 100, 100, 30000, 100, 100]
        df = spark.createDataFrame(
            [(1, "audio", "audio/wav", self._wav_from_i16(s), None, None, None)],
            MEDIA_SCHEMA,
        )
        r = segment_audio_silence(df, threshold_i16=8192, min_run=3).collect()[0]
        assert (r["n_segments"], r["silent_samples"], r["seg_checksum"]) == (1, 3, 3)
        # threshold below the quiet level → nothing is silent
        r = segment_audio_silence(df, threshold_i16=50, min_run=1).collect()[0]
        assert r["n_segments"] == 0
