"""Extended scale points for the catalog's two steepest queries
(r7 verdict #2): `prefix_jaccard_pairs` (alpha=0.7 between sf0.01 and
sf0.1) and `lpa_communities` (alpha=0.5). The driver only ships
sf<=0.1, so this tool MATERIALIZES derived 2x and 4x corpora from the
sf0.1 snapshot — the goal is to see whether the 0.01->0.1 exponent
flattens (fixed-cost amortization) or keeps climbing (super-linear
candidate growth) as data actually grows.

Derivation (only the tables the two queries read):

* documents: each extra copy keeps the sf0.1 vocabulary, doc count,
  and length distribution but TOKEN-SHUFFLES every document with a
  copy-and-doc-seeded hash sort. Cloned text would be wrong for a
  near-dup probe — identical posting lists quadruple candidate pairs
  per shingle and measure a pathology, not scaling; shuffled trigrams
  land in fresh posting lists, approximating the fresh-docs corpus the
  generator would emit at a larger SF.
* lineitem: key-shifted disjoint copies (l_partkey / l_suppkey /
  l_orderkey offset past the originals' max) — LPA's workload is
  rounds x edges, and a disjoint union is exactly 2x/4x edges with the
  same degree distribution.
* embeddings (r9, for the ANN training family): id-offset copies with
  a per-copy CIRCULAR DIMENSION SHIFT of the vector (distribution and
  norms preserved, vectors distinct from the originals). k-means /
  PQ training cost is value-independent (N·k·iters·d mults either
  way), but shifted copies also keep the probe honest for the
  scan/top-k stages where duplicate vectors would create mass ties.

Timings: min of REPS same-session runs per (query, sf), after a
warm-up query — consistent with tools/scaling_probe.py methodology.
Appends a section to SCALING_MEASURED.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from power_generation_etl_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
DERIVED = os.path.join(ROOT, ".probe_sf")
# r7: the two steepest relational/text entries. r9: + the ANN training
# family, whose claimed fixed-cost flatness (alpha~0 at 0.01->0.1) had
# never been tested past sf0.1. Override with argv[1:] (query names).
TARGETS = [
    "prefix_jaccard_pairs",
    "lpa_communities",
    "ivf_kmeans_topk",
    "pq_adc_topk",
]
REPS = 2
# r10: corpus multipliers. 2x/4x are the r7-r9 standard; --mults lets a
# round add the decade point (10x) that turns 2-point extrapolation
# into 3-point measurement for the steepest queries:
#   python tools/scale_point.py --mults 2,4,10 <query...>
MULTS = [2, 4]


def _shuffled_docs(spark, base_docs: str, copy_no: int):
    """A token-shuffled, id-offset copy of the documents table."""
    d = spark.read.parquet(base_docs)
    max_id = d.agg(F.max("doc_id")).first()[0] or 0
    toks = F.split(F.col("text"), r"\s+")
    keyed = F.transform(
        toks,
        lambda t: F.struct(
            F.crc32(
                F.concat_ws("#", t, F.col("doc_id").cast("string"), F.lit(str(copy_no)))
            ).alias("k"),
            t.alias("t"),
        ),
    )
    shuffled = F.array_join(
        F.transform(F.array_sort(keyed), lambda s: s["t"]), " "
    )
    return d.select(
        (F.col("doc_id") + F.lit(copy_no * (max_id + 1))).alias("doc_id"),
        shuffled.alias("text"),
        *[c for c in d.columns if c not in ("doc_id", "text")],
    ).select(*d.columns)


def _shifted_embeddings(spark, base_emb: str, copy_no: int):
    """An id-offset copy with the vector circularly shifted by copy_no
    dimensions — same distribution/norms, distinct vectors."""
    e = spark.read.parquet(base_emb)
    max_id = e.agg(F.max("vec_id")).first()[0] or 0
    dim = F.size("embedding")
    k = F.lit(copy_no) % dim
    shifted = F.concat(
        F.slice(F.col("embedding"), k + 1, dim - k),
        F.slice(F.col("embedding"), 1, k),
    )
    return e.select(
        (F.col("vec_id") + F.lit(copy_no * (max_id + 1))).alias("vec_id"),
        shifted.alias("embedding"),
        *[c for c in e.columns if c not in ("vec_id", "embedding")],
    ).select(*e.columns)


# r11 third wave: ONE global per-copy key shift, applied to EVERY
# fact AND dimension key column. The earlier per-table max+1 shifts
# made copies disjoint per table but MISALIGNED cross-table joins
# (copied events' user_id never matched any customer; copied lineitem
# never matched its orders unless the two maxes happened to coincide),
# so join-bearing entries probed less work than a real bigger corpus
# does. With a single constant, copy i of every table lives in the
# same disjoint key range and every FK edge of the schema joins
# within its copy — degree/selectivity distributions identical to the
# base corpus. 1e9 dwarfs every shipped key domain (max custkey at
# sf0.1 is ~1.5e4).
_KSHIFT = 1_000_000_000

_TABLE_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],  # c_nationkey stays: nations are fixed
    "supplier": ["s_suppkey"],  # s_nationkey stays
    "part": ["p_partkey"],
}


def _shifted_copy(spark, base_path: str, table: str, copy_no: int):
    """Key-shifted disjoint copy: every key column of the table offset
    by copy_no·_KSHIFT, everything else untouched."""
    df = spark.read.parquet(base_path)
    keys = set(_TABLE_KEYS[table])

    def col(c):
        if c in keys:
            return (F.col(c) + F.lit(copy_no * _KSHIFT)).alias(c)
        return F.col(c)

    return df.select(*[col(c) for c in df.columns])


def materialize(spark, mult: int, skew_pct: int = 0) -> str:
    """Derived corpus at `mult` x sf0.1 — ALL ten driver tables, so any
    catalog entry can probe. documents are token-shuffled, embeddings
    dimension-shifted, every keyed fact/dim table key-shifted by the
    global per-copy constant (see _KSHIFT), and the fixed-size
    nation/region tables copied as-is. `skew_pct` > 0 additionally
    reassigns that percentage of ALL event rows (hash-chosen by
    event_id) to ONE hot user — same total rows as the uniform corpus,
    so a uniform-vs-skew delta isolates the skew cost, not volume."""
    suffix = f"_skew{skew_pct}" if skew_pct else ""
    out = os.path.join(DERIVED, f"sf0.{mult}{suffix}")
    all_tables = (
        "documents", "lineitem", "embeddings", "events", "orders",
        "customer", "supplier", "part", "nation", "region",
    )
    if os.path.exists(os.path.join(out, "_DONE")) and all(
        os.path.exists(os.path.join(out, f"{t}.parquet"))
        for t in all_tables
    ):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    parts = {
        "documents": [spark.read.parquet(f"{BASE}/documents.parquet")],
        "embeddings": [spark.read.parquet(f"{BASE}/embeddings.parquet")],
    }
    for t in _TABLE_KEYS:
        parts[t] = [spark.read.parquet(f"{BASE}/{t}.parquet")]
    for i in range(1, mult):
        parts["documents"].append(
            _shuffled_docs(spark, f"{BASE}/documents.parquet", i)
        )
        parts["embeddings"].append(
            _shifted_embeddings(spark, f"{BASE}/embeddings.parquet", i)
        )
        for t in _TABLE_KEYS:
            parts[t].append(
                _shifted_copy(spark, f"{BASE}/{t}.parquet", t, i)
            )
    for t, dfs in parts.items():
        df = dfs[0]
        for x in dfs[1:]:
            df = df.unionByName(x)
        if t == "events" and skew_pct:
            hot = (
                F.conv(
                    F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                    16, 10,
                ).cast("bigint")
                % 100
                < skew_pct
            )
            df = df.withColumn(
                "user_id", F.when(hot, F.lit(1)).otherwise(F.col("user_id"))
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ("nation", "region"):  # fixed-size dims, never scaled
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> int:
    import math

    argv = sys.argv[1:]
    mults = list(MULTS)
    if argv and argv[0].startswith("--mults="):
        mults = [int(x) for x in argv[0].split("=", 1)[1].split(",") if x]
        argv = argv[1:]
    elif argv and argv[0] == "--mults":
        mults = [int(x) for x in argv[1].split(",")]
        argv = argv[2:]

    spark = get_spark("scale_point")
    from power_generation_etl_spark.plans import QUERIES

    targets = argv or TARGETS
    for q in targets:
        assert q in QUERIES, f"unknown query {q!r}"

    sfs = [0.1] + [round(0.1 * m, 2) for m in mults]
    dirs = {0.1: BASE}
    for m in mults:
        dirs[round(0.1 * m, 2)] = materialize(spark, m)
    # warm-up: JIT/codegen paid before any timed run
    QUERIES["pricing_summary"](spark, BASE).collect()

    rows = []
    for q in targets:
        times, colds = {}, {}
        for sf in sfs:
            d = dirs[sf]
            best = first = None
            for _ in range(REPS):
                t0 = time.monotonic()
                QUERIES[q](spark, d).collect()
                dt = time.monotonic() - t0
                if first is None:
                    first = dt
                best = dt if best is None else min(best, dt)
            # first rep is COLD for session-memoized products (ANN
            # trainings, suffix indexes): it includes the build at this
            # corpus size; later reps hit the memo and measure the
            # serving path. Both slopes matter — report both.
            times[sf], colds[sf] = best, first
            print(f"{q} @ sf{sf}: cold {first:.2f}s warm {best:.2f}s", flush=True)

        def alphas(d):
            return [
                math.log(d[b] / d[a]) / math.log(b / a)
                for a, b in zip(sfs, sfs[1:])
            ]

        rows.append(
            (q, [colds[x] for x in sfs], alphas(colds),
             [times[x] for x in sfs], alphas(times))
        )

    sf_label = "/".join(str(x) for x in sfs)
    lines = [
        "",
        f"## Extended scale points ({sf_label}): {', '.join(targets)}",
        "",
        "Generated by `python tools/scale_point.py`: derived corpora come",
        "from the sf0.1 snapshot (token-shuffled fresh documents /",
        "key-shifted disjoint lineitem copies / dimension-shifted embedding",
        "copies — see the tool docstring for why clones would mis-measure",
        f"a near-dup probe). min of {REPS} same-session runs.",
        "",
        "cold = first run at that corpus (includes any session-memoized",
        "build: ANN trainings, suffix indexes); warm = min of reps (the",
        "serving path once the index/codebooks exist). alpha_i = measured",
        "exponent between consecutive corpus sizes.",
        "",
        f"| query | cold {sf_label} s | cold alphas |"
        f" warm {sf_label} s | warm alphas |",
        "|---|---|---|---|---|",
    ]
    for q, cold_v, cold_a, warm_v, warm_a in rows:
        lines.append(
            "| {} | {} | {} | {} | {} |".format(
                q,
                " / ".join(f"{v:.2f}" for v in cold_v),
                " / ".join(f"{a:.1f}" for a in cold_a),
                " / ".join(f"{v:.2f}" for v in warm_v),
                " / ".join(f"{a:.1f}" for a in warm_a),
            )
        )
    with open(os.path.join(ROOT, "SCALING_MEASURED.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
