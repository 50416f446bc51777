"""Core-count scaling probe at a decade SF (r12, VERDICT r11 item 2).

The driver's 8-vs-32-core ratios at sf0.1 are all ~1 because every
heavy query is fixed-overhead-bound at ~17 MB of input — the instrument
saturates, and a parallelism regression would be invisible. This tool
restores the signal: it materializes the 10x derived corpus
(tools/scale_point.py — token-shuffled documents, key-shifted facts,
dimension-shifted embeddings) and times the heavy parallelizable
queries in FRESH subprocesses at each core count (master local[N] and
shuffle partitions both follow $SPARK_GRAFT_CPUS through
session.get_spark, i.e. exactly the bench contract).

Methodology: per core count, one process runs each query twice —
rep0 (cold: includes memoized index/training builds) and rep1 (warm:
the serving path). Core-count rounds are interleaved
(32, 8, 32, 8, ...) so host drift cannot masquerade as a scaling
ratio; the reported ratio uses the per-(query, cpus) MIN across
process rounds, warm and cold separately. Streaming entries whose
candidate volume is quadratic in N with a pinned-exact guard
(stream_intake_neardup_docs: bucket_cap=None is part of the oracle
contract) are deliberately excluded — see SCALING_r12.md.

    python tools/scaling_cores.py [--mult 10] [--cpus 32,8] [--rounds 2]
                                  [query ...]
    # worker mode (internal): --worker --sf DIR --reps 2 q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_TARGETS = [
    "minhash_lsh_pairs",
    "prefix_jaccard_pairs",
    "suffix_array_topk",
    "longest_repeated_substrings",
    "lpa_communities",
    "ivf_kmeans_topk",
    "ivfpq_adc_topk",
    "stream_sessions_stateful",
    "stream_transition_totals",
    "stream_late_data_rollup",
]


def worker(sf_dir: str, reps: int, names: list[str]) -> None:
    import __spark_entry__ as e
    from power_generation_etl_spark.session import get_spark

    spark = get_spark("scaling-cores")
    qs = e.queries()
    qs["pricing_summary"](spark, sf_dir).count()  # session warm-up
    out: dict[str, list[float]] = {}
    for name in names:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--sf", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", default="32,8")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.worker:
        worker(args.sf, args.reps, args.names)
        return 0

    targets = args.names or list(DEFAULT_TARGETS)
    cpu_list = [int(c) for c in args.cpus.split(",")]

    from power_generation_etl_spark.session import get_spark
    from tools.scale_point import materialize

    spark = get_spark("scaling-corpus")
    sf_dir = materialize(spark, args.mult)
    print(f"# corpus: {sf_dir}", flush=True)
    spark.stop()

    # interleaved rounds: 32, 8, 32, 8, ...
    results: dict[int, dict[str, list[float]]] = {c: {} for c in cpu_list}
    for rnd in range(args.rounds):
        for cpus in cpu_list:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            print(f"# round {rnd + 1}/{args.rounds} cpus={cpus}", flush=True)
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    "--sf", sf_dir, "--reps", str(args.reps), *targets,
                ],
                cwd=ROOT, env=env, capture_output=True, text=True,
            )
            sys.stderr.write(proc.stderr[-2000:])
            if proc.returncode != 0:
                print(f"!! worker cpus={cpus} failed rc={proc.returncode}")
                continue
            got = json.loads(proc.stdout.strip().splitlines()[-1])
            for q, times in got.items():
                results[cpus].setdefault(q, []).append(times)

    lines = [
        f"## Core-count scaling at {args.mult}x sf0.1 "
        f"(tools/scaling_cores.py, r12)",
        "",
        f"Fresh process per (round, cpus); rounds interleaved "
        f"{'/'.join(map(str, cpu_list))} x{args.rounds}; rep0 = cold "
        "(includes memoized builds), rep1 = warm serving path; cell = "
        "min across rounds. Ratio = t(low cpus) / t(high cpus) — "
        "parallelizable queries should approach the core ratio as the "
        "per-query data grows past the fixed-overhead floor.",
        "",
        "| query | "
        + " | ".join(f"c{c} cold | c{c} warm" for c in cpu_list)
        + " | cold ratio | warm ratio |",
        "|---|" + "---|" * (2 * len(cpu_list) + 2),
    ]
    hi, lo = max(cpu_list), min(cpu_list)
    summary = {}
    for q in targets:
        cells = []
        vals = {}
        for c in cpu_list:
            rounds = results[c].get(q, [])
            if not rounds:
                cells += ["—", "—"]
                continue
            cold = min(r[0] for r in rounds)
            warm = min(min(r[1:]) for r in rounds if len(r) > 1)
            vals[c] = (cold, warm)
            cells += [f"{cold:.1f}", f"{warm:.1f}"]
        if hi in vals and lo in vals:
            rc = vals[lo][0] / vals[hi][0] if vals[hi][0] else float("nan")
            rw = vals[lo][1] / vals[hi][1] if vals[hi][1] else float("nan")
            cells += [f"{rc:.2f}", f"{rw:.2f}"]
            summary[q] = {"cold_ratio": round(rc, 2), "warm_ratio": round(rw, 2),
                          **{f"c{c}": vals[c] for c in vals}}
        else:
            cells += ["—", "—"]
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    out_md = "\n".join(lines) + "\n"
    print(out_md)
    with open(os.path.join(ROOT, "SCALING_r12.md"), "a") as fh:
        fh.write(out_md + "\n")
    # Merge (don't clobber) so targeted re-probes of individual queries
    # update only their own entries.
    jpath = os.path.join(ROOT, "SCALING_r12.json")
    merged = {}
    if os.path.exists(jpath):
        try:
            with open(jpath) as fh:
                merged = json.load(fh)
        except (json.JSONDecodeError, OSError):
            merged = {}  # corrupt/partial file: fall back to clobber
    merged.update(summary)
    with open(jpath, "w") as fh:
        json.dump(merged, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
