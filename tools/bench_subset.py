"""Time a subset of catalog queries (same methodology as bench.py:
construct + count) with optional repeat count and per-run job stats.

    python tools/bench_subset.py q1 q2 ... [--sf DIR] [--repeat N]

Prints per-query seconds and the Spark job count consumed by each
query (from the status tracker), so a fix can be judged by BOTH wall
time and "how many jobs did this plan launch".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import __spark_entry__ as e
    from power_generation_etl_spark.session import get_spark

    spark = get_spark("bench-subset")
    qs = e.queries()
    # session warm-up (mirror bench.py: JIT + parquet footers)
    qs["pricing_summary"](spark, args.sf).count()

    st = spark.sparkContext.statusTracker()
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        for r in range(args.repeat):
            j0 = st.getJobIdsForGroup(None)
            n0 = max(j0) if j0 else -1
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            n = df.count()
            dt = time.perf_counter() - t0
            j1 = st.getJobIdsForGroup(None)
            n1 = max(j1) if j1 else -1
            print(
                f"{name}[{r}]: {dt:.3f}s  ({n} rows, ~{n1 - n0} jobs)",
                flush=True,
            )


if __name__ == "__main__":
    main()
