"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line with per-query
wall-clock seconds.

The first query pays JVM/session warm-up; a throwaway warm-up count()
is run first so the numbers reflect query execution, not session start.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as e
    from power_generation_etl_spark.session import get_spark

    spark = get_spark("bench")
    # Warm-up: JVM JIT + codegen + parquet footers, via one LIGHT query
    # per base table instead of a full second pass over the catalog (a
    # full pre-pass doubles the heavy LSH queries and can push total
    # wall-clock past external time budgets on a contended host).
    warmups = [
        "pricing_summary",      # lineitem
        "top_orders",           # orders/customer
        "regional_revenue",     # dims
        "json_props_rollup",    # events
        "doc_token_counts",     # documents
        "ann_topk_cosine",      # embeddings
    ]
    for _name in warmups:
        try:
            e.queries()[_name](spark, sf_dir).count()
        except Exception as exc:  # keep bench robust to a single bad query
            print(f"# warmup {_name} failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in e.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else 0
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    full = {
        "metric": "total wall-clock for all registered queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # The full per-query map (150+ keys) overflows the driver's output
    # tail capture (round 4 shipped `parsed: null`). Persist the full
    # map to a sidecar artifact and print it FIRST (so it scrolls out
    # of the tail), then print a compact machine-readable line LAST —
    # the line the driver actually parses. The compact line keeps the
    # required schema (metric/value/unit/queries/sf) but bounds the
    # `queries` map to the slowest entries so it stays under ~1 KiB.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh)
    except OSError as exc:
        print(f"# could not write {detail_path}: {exc}", file=sys.stderr)
    print(json.dumps(full))
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:12]
    )
    print(
        json.dumps(
            {
                "metric": "total wall-clock for all registered queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
