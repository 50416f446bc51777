"""Oracle-gated multimodal catalog queries — the encode→decode
round-trip family.

The synthetic tables carry no binary media column, so until now the
multimodal operators (`operators/multimodal.py`) were verified only by
pytest. These entries close that gap: each SYNTHESIZES deterministic
media bytes from `documents.text` with plain Spark SQL expressions
(md5 → unhex → binary concat — no Python), pushes them through the
REAL decode path (`extract_image_features` / `extract_audio_features`
/ `extract_video_frame_features`, i.e. the Arrow-batched mapInPandas
decoders), and emits integer statistics that a DuckDB oracle can
recompute directly from the same md5-derived bytes WITHOUT any codec:

* image — a 24-bit BMP whose 64 pixels are gray (B=G=R=v), so the
  decoder's ITU-601 luma (299R+587G+114B)/1000 collapses to exactly v
  and round(feat_mean*64) recovers the integer pixel sum bit-exactly.
* audio — per doc parity, a PCM16 WAV (stdlib `wave` tier) or a G.711
  µ-law WAV (`_wav_g711` tier); round(peak*32768) recovers the exact
  max |sample| integer, which the oracle reproduces with the µ-law
  expansion written in SQL.
* video — a RIFF/AVI container with 1-3 BMP frames (count varies per
  doc): `_avi_frames` demux + `_gray_image` decode inside ONE
  mapInPandas pass; the oracle predicts every per-frame luma sum.
* resize — the same BMPs decoded AND box-averaged to a 4×4 thumbnail
  (`extract_image_thumbnail`); the POSITION-WEIGHTED checksum
  Σ (4r+c)·pixel·4 is exact (2×2 box means are multiples of 0.25) and
  layout-sensitive — wrong block→cell mapping or a dropped bottom-up
  row flip breaks it where a plain mean cannot.

Feature-extractor rounding (4dp mean, 6dp peak) is lossless here by
construction: |error| ≤ 5e-5·64 = 3.2e-3 and 5e-7·32768 ≈ 0.016, both
< 0.5, so the final round() lands on the exact integer.

Scale notes: synthesis and decode are a single narrow-in/narrow-out
mapInPandas stage — the wide binary column is born and dies inside the
Python worker's Arrow batch, nothing wide shuffles; the exchanges are
a narrow pre-synthesis round-robin when the input collapsed to fewer
partitions than the session can run (`_spread` — the driver tables are
single files) and the final ORDER BY on the scalar outputs. At 100 TB
the corpus arrives as many files, `_spread` is a no-op, and the same
plan shape holds with real media bytes read from parquet/object
storage.

Reference parity: the reference pipeline (pandas + Postgres) has no
media handling at all — this family is part of the mandated
beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import multimodal as mm
from power_generation_etl_spark.plans.queries import T, _register

# ---------------------------------------------------------------------------
# Fixed container headers (pure literals — sizes are compile-time
# constants because every synthesized payload has a fixed layout).
# ---------------------------------------------------------------------------

# 8×8 24-bit bottom-up BI_RGB BMP: 54-byte header + 8·(8·3) = 192 px
# bytes (row stride 24 is already a multiple of 4 — no padding).
_BMP_HDR = (
    b"BM"
    + struct.pack("<IHHI", 246, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 192, 2835, 2835, 0, 0)
)
assert len(_BMP_HDR) == 54

# Mono 8 kHz PCM16 WAV, 32 samples = 64 data bytes (4 md5 digests).
_WAV_PCM_HDR = (
    b"RIFF"
    + struct.pack("<I", 36 + 64)
    + b"WAVEfmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data"
    + struct.pack("<I", 64)
)

# Mono 8 kHz G.711 µ-law WAV (format tag 7), 32 samples = 32 data
# bytes (2 md5 digests). The stdlib `wave` module rejects tag 7, which
# routes the blob through the `_wav_g711` expansion tier — exactly the
# telephony-corpus path this entry is meant to exercise.
_WAV_ULAW_HDR = (
    b"RIFF"
    + struct.pack("<I", 36 + 32)
    + b"WAVEfmt "
    + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
    + b"data"
    + struct.pack("<I", 32)
)


def _avi_hdr(n_frames: int) -> bytes:
    """RIFF/AVI shell around `n_frames` 00db chunks of one 246-byte BMP
    each (246 is even — no chunk padding)."""
    movi = 4 + n_frames * (8 + 246)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + movi)
        + b"AVI LIST"
        + struct.pack("<I", movi)
        + b"movi"
    )


_DB_CHUNK_HDR = b"00db" + struct.pack("<I", 246)


# ---------------------------------------------------------------------------
# md5-derived byte streams, as Spark SQL expressions
# ---------------------------------------------------------------------------


def _digest_bytes(text: Column, suffixes: list[str]) -> Column:
    """len(suffixes)·16 deterministic bytes: unhex(md5(text||s0) ||
    md5(text||s1) || …). Matches DuckDB's md5() on the same UTF-8
    string byte-for-byte."""
    return F.unhex(
        F.concat(*[F.md5(F.concat(text, F.lit(s))) for s in suffixes])
    )


def _digest_bytes_tripled(text: Column, suffixes: list[str]) -> Column:
    """Same stream, each byte TRIPLED (hex pair repeated 3×) — the
    B=G=R pixel layout of a gray 24-bit BMP row. One regexp_replace
    per digest (each non-overlapping hex pair → itself ×3) instead of
    16 substring+repeat expressions: the per-digest expression tree
    goes 64 nodes → 1, which cuts the first-run codegen cost of every
    media entry built on this helper."""
    return F.unhex(
        F.concat(
            *[
                F.regexp_replace(
                    F.md5(F.concat(text, F.lit(s))), "(..)", r"$1$1$1"
                )
                for s in suffixes
            ]
        )
    )


def _oracle_byte(expr_md5: str, pos_expr: str) -> str:
    """DuckDB: byte value at 0-based position `pos_expr` of the hex
    digest string `expr_md5`."""
    return f"CAST(('0x' || substr({expr_md5}, 2*({pos_expr})+1, 2)) AS BIGINT)"


def _spread(df: DataFrame) -> DataFrame:
    """Restore decode parallelism when the input collapsed to fewer
    partitions than the session can run: the driver tables are single
    parquet files (1 scan partition), which would serialize the whole
    mapInPandas decode stage onto one task. Round-robin the NARROW
    pre-synthesis rows (doc_id + text — the wide media bytes don't
    exist yet, so the exchange is cheap). A real 100 TB corpus arrives
    as many files/row-groups and skips this branch entirely."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


# ---------------------------------------------------------------------------
# image_decode_luma — BMP encode → real BMP decode → exact luma sum
# ---------------------------------------------------------------------------


@_register(
    "image_decode_luma",
    f"""
    WITH b AS (
      SELECT doc_id,
             {_oracle_byte("md5(text || 'i' || CAST(j.j AS VARCHAR))", "k.k")} AS v
      FROM documents, unnest(range(0, 4)) AS j(j), unnest(range(0, 16)) AS k(k)
      WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(246 AS BIGINT) AS n_bytes,
           CAST(sum(v) AS BIGINT) AS luma_sum
    FROM b
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def image_decode_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one 8×8 gray 24-bit BMP per document (pixel bytes =
    md5(text||'i0'..'i3'), each tripled to B=G=R) entirely in Spark SQL
    expressions, then decode it with the REAL pure-python BMP decoder
    behind `extract_image_features` (Arrow-batched mapInPandas).
    Because the pixels are gray, the 601 luma equals the pixel byte
    exactly, and round(feat_mean·64) recovers the integer pixel sum the
    oracle computes straight from the md5 hex. A decoder regression
    (wrong stride, wrong channel order, palette confusion) breaks the
    hash — this is the stills decoder under an exact oracle."""
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    blob = F.concat(
        F.lit(_BMP_HDR),
        _digest_bytes_tripled(F.col("text"), [f"i{j}" for j in range(4)]),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        blob.alias("content"),
    )
    feats = mm.extract_image_features(media)
    return (
        feats.select(
            F.col("media_id").alias("doc_id"),
            "n_bytes",
            F.round(F.col("feat_mean") * 64).cast("long").alias("luma_sum"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# audio_decode_peak — PCM16 + G.711 µ-law WAV → exact integer stats
# ---------------------------------------------------------------------------

# PCM16: sample s of digest j lives in bytes (2s, 2s+1), little-endian.
_PCM_H = "md5(text || 'a' || CAST(j.j AS VARCHAR))"
_PCM_RAW = (
    _oracle_byte(_PCM_H, "2*s.s") + " + 256 * " + _oracle_byte(_PCM_H, "2*s.s + 1")
)

# G.711 µ-law expansion in SQL: c = (~u)&0xFF = 255-u; |sample| =
# ((mant·8 + 0x84) << exp) − 0x84 with exp = (c>>4)&7, mant = c&0xF —
# the mirror of operators/multimodal.py::_wav_g711.
_ULAW_H = "md5(text || 'u' || CAST(j.j AS VARCHAR))"
_ULAW_C = f"(255 - {_oracle_byte(_ULAW_H, 'k.k')})"
_ULAW_MAG = (
    f"((({_ULAW_C} % 16) * 8 + 132) << (({_ULAW_C} // 16) % 8)) - 132"
)


@_register(
    "audio_decode_peak",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    pcm AS (
      SELECT doc_id,
             max(abs(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END)) AS pk
      FROM (
        SELECT doc_id, {_PCM_RAW} AS raw
        FROM d, unnest(range(0, 4)) AS j(j), unnest(range(0, 8)) AS s(s)
      )
      GROUP BY doc_id
    ),
    ulaw AS (
      SELECT doc_id, max({_ULAW_MAG}) AS pk
      FROM d, unnest(range(0, 2)) AS j(j), unnest(range(0, 16)) AS k(k)
      GROUP BY doc_id
    )
    SELECT * FROM (
      SELECT doc_id,
             CAST(108 AS BIGINT) AS n_bytes,
             CAST(8000 AS INTEGER) AS sample_rate,
             CAST(1 AS INTEGER) AS n_channels,
             CAST(32 AS BIGINT) AS n_samples,
             CAST(4 AS BIGINT) AS duration_ms,
             CAST(pk AS BIGINT) AS peak_i16
      FROM pcm WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, 76, 8000, 1, 32, 4, CAST(pk AS BIGINT)
      FROM ulaw WHERE doc_id % 2 = 1
    )
    ORDER BY doc_id
    """,
)
def audio_decode_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one WAV per document — even doc_ids get PCM16 (the
    stdlib `wave` decode tier), odd doc_ids get G.711 µ-law (format
    tag 7, the `_wav_g711` expansion tier) — and decode via the real
    `extract_audio_features` mapInPandas pass. round(peak·32768)
    recovers the exact integer max |sample|, which the oracle
    recomputes from the same md5 bytes, including the full µ-law
    logarithmic expansion written in SQL. Container fields
    (rate/channels/samples/duration) come from the decoder, proving
    the RIFF walk parsed the synthesized header rather than echoing
    constants."""
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    pcm_blob = F.concat(
        F.lit(_WAV_PCM_HDR),
        _digest_bytes(F.col("text"), [f"a{j}" for j in range(4)]),
    )
    ulaw_blob = F.concat(
        F.lit(_WAV_ULAW_HDR),
        _digest_bytes(F.col("text"), [f"u{j}" for j in range(2)]),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.when(F.col("doc_id") % 2 == 0, pcm_blob)
        .otherwise(ulaw_blob)
        .alias("content"),
    )
    feats = mm.extract_audio_features(media)
    return (
        feats.select(
            F.col("media_id").alias("doc_id"),
            "n_bytes",
            "sample_rate",
            "n_channels",
            "n_samples",
            "duration_ms",
            F.round(F.col("peak") * 32768).cast("long").alias("peak_i16"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# video_frames_luma — AVI demux + per-frame BMP decode, one pass
# ---------------------------------------------------------------------------

_VID_H = "md5(text || 'v' || CAST(fr.frame_index AS VARCHAR) || CAST(j.j AS VARCHAR))"


@_register(
    "video_frames_luma",
    f"""
    WITH fr AS (
      SELECT doc_id, text, i.i AS frame_index
      FROM documents, unnest(range(0, 3)) AS i(i)
      WHERE text IS NOT NULL AND i.i < 1 + doc_id % 3
    ),
    b AS (
      SELECT fr.doc_id, fr.frame_index,
             {_oracle_byte(_VID_H, "k.k")} AS v
      FROM fr, unnest(range(0, 4)) AS j(j), unnest(range(0, 16)) AS k(k)
    )
    SELECT doc_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(246 AS BIGINT) AS n_bytes,
           CAST(sum(v) AS BIGINT) AS luma_sum
    FROM b
    GROUP BY doc_id, frame_index
    ORDER BY doc_id, frame_index
    """,
)
def video_frames_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a RIFF/AVI container per document carrying 1-3 gray
    BMP frames (count = 1 + doc_id mod 3; frame pixels =
    md5(text||'v<frame>'||'<digest>')), then run the full video path:
    `extract_video_frame_features` demuxes the AVI (`_avi_frames` 00db
    chunk walk) AND decodes every frame with the stills decoder inside
    one mapInPandas stage. The oracle predicts the per-frame luma sums
    and the per-doc frame COUNT — a demux bug (wrong chunk stride,
    swallowed frame, bad LIST recursion) changes the row count, a
    decode bug changes the hash."""
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    n = (F.col("doc_id") % 3).cast("int")  # frames beyond the first
    chunks = [
        F.concat(
            F.lit(_DB_CHUNK_HDR),
            F.lit(_BMP_HDR),
            _digest_bytes_tripled(
                F.col("text"), [f"v{i}{j}" for j in range(4)]
            ),
        )
        for i in range(3)
    ]
    content = (
        F.when(n == 0, F.concat(F.lit(_avi_hdr(1)), chunks[0]))
        .when(n == 1, F.concat(F.lit(_avi_hdr(2)), chunks[0], chunks[1]))
        .otherwise(
            F.concat(F.lit(_avi_hdr(3)), chunks[0], chunks[1], chunks[2])
        )
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        content.alias("content"),
    )
    feats = mm.extract_video_frame_features(media, n_frames=4)
    return (
        feats.select(
            F.col("media_id").alias("doc_id"),
            "frame_index",
            "n_bytes",
            F.round(F.col("luma_mean") * 64).cast("long").alias("luma_sum"),
        )
        .orderBy("doc_id", "frame_index")
    )


# ---------------------------------------------------------------------------
# image_thumbnail_checksum — decode + RESIZE (box-average thumbnail)
# ---------------------------------------------------------------------------

# 0-based byte index (into the concatenated i0..i3 digests) of the
# DECODED pixel feeding thumbnail cell (r, c) at offset (dy, dx): the
# BMP stores rows bottom-up, so decoded row y reads stored row 7-y.
_TIDX = "((7 - (2*r.r + dy.dy)) * 8 + 2*c.c + dx.dx)"
_TBYTE = (
    "CAST(('0x' || substr("
    f"md5(text || 'i' || CAST({_TIDX} // 16 AS VARCHAR)), "
    f"2*({_TIDX} % 16) + 1, 2)) AS BIGINT)"
)


@_register(
    "image_thumbnail_checksum",
    f"""
    WITH g AS (
      SELECT doc_id, (4*r.r + c.c) * {_TBYTE} AS t
      FROM documents,
           unnest(range(0, 4)) AS r(r), unnest(range(0, 4)) AS c(c),
           unnest(range(0, 2)) AS dy(dy), unnest(range(0, 2)) AS dx(dx)
      WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(4 AS INTEGER) AS out_h,
           CAST(4 AS INTEGER) AS out_w,
           CAST(sum(t) AS BIGINT) AS wsum4
    FROM g
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def image_thumbnail_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESIZE tier under the exact oracle: the same synthesized
    8×8 BMPs as `image_decode_luma`, decoded AND box-averaged to a 4×4
    thumbnail in one mapInPandas stage (`extract_image_thumbnail`).
    The output is the position-weighted checksum Σ (4r+c)·pixel·4 — an
    exact integer because each 2×2 box mean is a multiple of 0.25 —
    which the oracle recomputes from the md5 bytes INCLUDING the
    bottom-up→top-down row flip. Unlike a plain sum (which box
    averaging preserves), the weighted form breaks if the resize maps
    blocks to the wrong cells, mixes rows across blocks, or drops the
    BMP orientation — layout bugs a mean/std feature can't see."""
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    blob = F.concat(
        F.lit(_BMP_HDR),
        _digest_bytes_tripled(F.col("text"), [f"i{j}" for j in range(4)]),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        blob.alias("content"),
    )
    th = mm.extract_image_thumbnail(media, out_h=4, out_w=4)
    wsum4 = F.expr(
        "aggregate(zip_with(pixels, sequence(0, 15),"
        " (p, i) -> p * CAST(i AS DOUBLE) * 4D), 0D, (a, x) -> a + x)"
    )
    return (
        th.select(
            F.col("media_id").alias("doc_id"),
            "out_h",
            "out_w",
            F.round(wsum4).cast("long").alias("wsum4"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# audio_silence_segments — run-length silence segmentation (r11 third
# wave): the same synthesized PCM16/µ-law WAVs as audio_decode_peak,
# decoded by the real tiers, then maximal |sample| < 8192 runs of
# length ≥ 2 detected per blob. The oracle recomputes the integer
# sample stream from the md5 bytes (µ-law expansion in SQL) and runs
# the identical gaps-and-islands algebra; the position-weighted
# Σ (start+1)·len checksum breaks on any off-by-one in run detection
# that a count/total would survive.
# ---------------------------------------------------------------------------


@_register(
    "audio_silence_segments",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    mag AS (
      SELECT doc_id, idx,
             abs(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END) AS mag
      FROM (
        SELECT doc_id, j.j * 8 + s.s AS idx, {_PCM_RAW} AS raw
        FROM d, unnest(range(0, 4)) AS j(j), unnest(range(0, 8)) AS s(s)
        WHERE doc_id % 2 = 0
      )
      UNION ALL
      SELECT doc_id, j.j * 16 + k.k AS idx, {_ULAW_MAG} AS mag
      FROM d, unnest(range(0, 2)) AS j(j), unnest(range(0, 16)) AS k(k)
      WHERE doc_id % 2 = 1
    ),
    sil AS (SELECT doc_id, idx FROM mag WHERE mag < 8192),
    grp AS (
      SELECT doc_id, idx,
             idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS g
      FROM sil
    ),
    runs AS (
      SELECT doc_id, min(idx) AS st, count(*) AS len
      FROM grp GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(len) AS BIGINT) AS silent_samples,
           CAST(sum((st + 1) * len) AS BIGINT) AS seg_checksum
    FROM runs WHERE len >= 2
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    pcm_blob = F.concat(
        F.lit(_WAV_PCM_HDR),
        _digest_bytes(F.col("text"), [f"a{j}" for j in range(4)]),
    )
    ulaw_blob = F.concat(
        F.lit(_WAV_ULAW_HDR),
        _digest_bytes(F.col("text"), [f"u{j}" for j in range(2)]),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.when(F.col("doc_id") % 2 == 0, pcm_blob)
        .otherwise(ulaw_blob)
        .alias("content"),
    )
    segs = mm.segment_audio_silence(media, threshold_i16=8192, min_run=2)
    return (
        segs.where(F.col("n_segments") >= 1)
        .select(
            F.col("media_id").alias("doc_id"),
            "n_segments",
            "silent_samples",
            "seg_checksum",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# video_scene_cuts — frame-difference scene detection (r11 fourth
# wave) over the same synthesized AVIs as video_frames_luma: the
# oracle extends the per-frame luma-sum prediction with the identical
# lag-window cut rule, so a shifted frame order, an off-by-one in the
# detector, or a fabricated cut on a single-frame video breaks the
# position-weighted checksum.
# ---------------------------------------------------------------------------


@_register(
    "video_scene_cuts",
    f"""
    WITH fr AS (
      SELECT doc_id, text, i.i AS frame_index
      FROM documents, unnest(range(0, 3)) AS i(i)
      WHERE text IS NOT NULL AND i.i < 1 + doc_id % 3
    ),
    b AS (
      SELECT fr.doc_id, fr.frame_index,
             {_oracle_byte(_VID_H, "k.k")} AS v
      FROM fr, unnest(range(0, 4)) AS j(j), unnest(range(0, 16)) AS k(k)
    ),
    s AS (
      SELECT doc_id, frame_index, CAST(sum(v) AS BIGINT) AS ls
      FROM b GROUP BY doc_id, frame_index
    ),
    d AS (
      SELECT doc_id, frame_index,
             abs(ls - lag(ls) OVER (PARTITION BY doc_id
                                    ORDER BY frame_index)) > 600 AS is_cut
      FROM s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(*) FILTER (is_cut) AS BIGINT) AS n_cuts,
           CAST(coalesce(sum(CASE WHEN is_cut THEN frame_index END), 0)
                AS BIGINT) AS cut_checksum
    FROM d
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    n = (F.col("doc_id") % 3).cast("int")
    chunks = [
        F.concat(
            F.lit(_DB_CHUNK_HDR),
            F.lit(_BMP_HDR),
            _digest_bytes_tripled(
                F.col("text"), [f"v{i}{j}" for j in range(4)]
            ),
        )
        for i in range(3)
    ]
    content = (
        F.when(n == 0, F.concat(F.lit(_avi_hdr(1)), chunks[0]))
        .when(n == 1, F.concat(F.lit(_avi_hdr(2)), chunks[0], chunks[1]))
        .otherwise(
            F.concat(F.lit(_avi_hdr(3)), chunks[0], chunks[1], chunks[2])
        )
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        content.alias("content"),
    )
    feats = mm.extract_video_frame_features(media, n_frames=4)
    return (
        mm.scene_cuts(feats, pixels=64, threshold=600)
        .select(
            F.col("media_id").alias("doc_id"),
            "n_frames",
            "n_cuts",
            "cut_checksum",
        )
        .orderBy("doc_id")
    )
