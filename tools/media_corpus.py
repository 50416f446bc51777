"""Materialize a synthetic media parquet (media_id, kind, content) from
a documents table — the corpus `prep-media` e2e measurements run on
(SCALING_MEASURED.md; the driver ships no media table).

Blob synthesis reuses the catalog's SQL byte constructors
(`plans/media_queries.py`): every blob is a REAL container the decode
tiers parse (16×16 gray BMP / PCM16 WAV / AVI with two 8×8 BMP
frames), with bytes derived from md5 of the document text — fully
deterministic, built distributed (no driver-side blob loop). Images
use 16×16 (not the catalog's 8×8) because dHash needs ≥9×8 pixels.
Kinds round-robin by doc_id % 3. Every image-kind doc whose id is
divisible by 21 draws its pixels from a seed SHARED by a group of
three (`dup<doc_id div 63>`), so the corpus contains genuine
exact-pixel near-duplicate clusters and the pipeline's banded dHash
drop stage has real work.

Usage: python tools/media_corpus.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from power_generation_etl_spark.plans import media_queries as mq  # noqa: E402
from power_generation_etl_spark.plans.queries import T  # noqa: E402
from power_generation_etl_spark.session import get_spark  # noqa: E402

# 16×16 24-bit bottom-up BI_RGB BMP: 54-byte header + 16·48 = 768 px
# bytes (stride 48 — multiple of 4, no padding).
_BMP16_HDR = (
    b"BM"
    + struct.pack("<IHHI", 822, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 16, 16, 1, 24, 0, 768, 2835, 2835, 0, 0)
)


def build(spark, sf_dir: str, out: str) -> int:
    d = mq._spread(
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    # doc_ids divisible by 21 are image-kind (21 ≡ 0 mod 3) AND share a
    # pixel seed with the two neighbouring multiples (div 63 → groups of
    # three identical images), so the corpus carries genuine near-dup
    # clusters: ~|docs|/63 groups → 3 pairs each.
    seed = F.when(
        F.col("doc_id") % 21 == 0,
        F.concat(F.lit("dup"), F.expr("doc_id div 63").cast("string")),
    ).otherwise(F.concat(F.col("text"), F.col("doc_id").cast("string")))

    image = F.concat(
        F.lit(_BMP16_HDR),
        mq._digest_bytes_tripled(seed, [f"p{j}" for j in range(16)]),
    )
    audio = F.concat(
        F.lit(mq._WAV_PCM_HDR),
        mq._digest_bytes(seed, [f"a{j}" for j in range(4)]),
    )
    frame = lambda i: F.concat(  # noqa: E731
        F.lit(mq._DB_CHUNK_HDR),
        F.lit(mq._BMP_HDR),
        mq._digest_bytes_tripled(seed, [f"v{i}{j}" for j in range(4)]),
    )
    video = F.concat(F.lit(mq._avi_hdr(2)), frame(0), frame(1))

    k = F.col("doc_id") % 3
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(k == 0, "image").when(k == 1, "audio").otherwise("video").alias("kind"),
        F.when(k == 0, image).when(k == 1, audio).otherwise(video).alias("content"),
    )
    media.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print(f"{out}: {n} media rows from {sf_dir}")
    return n


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".probe_sf/media_sf01.parquet"
    build(get_spark("media_corpus"), sf_dir, out)
