"""Phase-timing probe for stream_sessions_stateful (r12): times the
split-picker, staging, each availableNow round, and the sink read
separately, so streaming-floor claims rest on numbers.

    python tools/session_phase_probe.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from power_generation_etl_spark.plans.queries import stream_parallelism_scope
    from power_generation_etl_spark.plans.streaming_queries import (
        _run_session_rounds,
        _session_round_split,
    )
    from power_generation_etl_spark.session import get_spark

    spark = get_spark("session-probe")
    spark.read.parquet(f"{args.sf}/events.parquet").count()

    with stream_parallelism_scope(spark, args.sf):
        t0 = time.perf_counter()
        ev, cutoff, lo, hi = _session_round_split(spark, args.sf)
        t_split = time.perf_counter() - t0
        t0 = time.perf_counter()
        emitted = _run_session_rounds(spark, ev, cutoff, hi, native=False)
        t_rounds = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = emitted.count() if emitted is not None else 0
        t_read = time.perf_counter() - t0
    print(f"split_picker   {t_split:7.3f}s")
    print(f"two_rounds     {t_rounds:7.3f}s")
    print(f"sink_count     {t_read:7.3f}s  ({n} rows)")


if __name__ == "__main__":
    main()
