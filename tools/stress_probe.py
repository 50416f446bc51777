"""Dup-heavy stress probe: replicate the sf0.1 documents/embeddings
10× (distinct ids, near-identical content) — a worst-case corpus where
~every document has 9 near-duplicates, the regime web-scale pretraining
dedup actually faces — and time the heavy dedup/ANN family against the
1× baseline. True near-dup pair count grows ~1000×, so per-PAIR cost is
the meaningful number, not wall-clock ratio.

Writes nothing into the repo; prints a markdown table. The measured
results live in SCALING.md (§ dedup family) with analysis.

Usage: python tools/stress_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sfbig"

HEAVY = [
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_neardup_pairs",
    "ann_topk_cosine",
    "neardup_components",
    "doc_rarity_scores",
    "lang_id_confusion",
    "chunk_dedup_stats",
    # suffix family: the dup-heavy corpus is LRS's documented worst
    # case — long shared prefixes make ~every adjacent suffix pair
    # "hard", driving the binary descent at position scale (the
    # graceful-degradation path, still plain equi-joins per level).
    "suffix_array_topk",
    "longest_repeated_substrings",
]


def build_big() -> None:
    import duckdb

    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT doc_id + 100000 * r AS doc_id,
             CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END AS text,
             lang, source, n_chars
      FROM '{BASE}/documents.parquet'
      CROSS JOIN (SELECT unnest(range(10)) AS r)
    ) TO '{BIG}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + 100000 * r AS vec_id,
             list_transform(embedding, x -> x + 0.0001 * r) AS embedding,
             label
      FROM '{BASE}/embeddings.parquet'
      CROSS JOIN (SELECT unnest(range(10)) AS r)
    ) TO '{BIG}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        dst = f"{BIG}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)


def main() -> int:
    from power_generation_etl_spark.plans import QUERIES
    from power_generation_etl_spark.session import get_spark

    build_big()
    spark = get_spark("stress-probe")
    QUERIES["doc_token_counts"](spark, BASE).count()  # warm-up
    print("| query | 1x s | 1x rows | 10x s | 10x rows |")
    print("|---|---|---|---|---|")
    for name in HEAVY:
        row = [name]
        for sf_dir in (BASE, BIG):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            row += [f"{time.perf_counter() - t0:.2f}", str(n)]
        print("| " + " | ".join(row) + " |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
