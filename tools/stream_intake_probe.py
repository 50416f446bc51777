"""Phase-timing probe for the two-round streaming-intake entries
(r12 optimization round): replicates stream_intake_neardup_docs'
body with timers around each phase (staging, per-round stream run,
final read) and per-phase Spark job counts, so the fixed-cost attack
(VERDICT r11 item 1) targets the phase that actually holds the time.

    python tools/stream_intake_probe.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from power_generation_etl_spark.plans.intake_queries import (
        _doc_rounds,
        _link_round,
        _stage_json,
    )
    from power_generation_etl_spark.plans.queries import stream_parallelism_scope
    from power_generation_etl_spark.session import get_spark
    from power_generation_etl_spark.streaming.ingest import stream_neardup_intake

    spark = get_spark("intake-probe")
    # warm-up: session + parquet footers
    spark.read.parquet(f"{args.sf}/documents.parquet").count()

    st = spark.sparkContext.statusTracker()

    def jobs() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    marks: list[tuple[str, float, int]] = []

    def mark(label: str, t0: float, j0: int) -> None:
        marks.append((label, time.perf_counter() - t0, jobs() - j0))

    with stream_parallelism_scope(spark, args.sf):
        t_all = time.perf_counter()
        j_all = jobs()
        r1, r2 = _doc_rounds(spark, args.sf)
        stage = tempfile.mkdtemp(prefix="probe_nd_stage_")
        landing = tempfile.mkdtemp(prefix="probe_nd_landing_")
        out = os.path.join(stage, "out")
        ckpt = os.path.join(stage, "ckpt")
        store = os.path.join(stage, "store")

        def _run() -> None:
            q = stream_neardup_intake(
                spark, landing, out, ckpt, store,
                threshold=0.5, n=3, k=64, n_bands=16, seed=42,
                bucket_cap=None,
            )
            q.awaitTermination()
            q.stop()

        try:
            t0, j0 = time.perf_counter(), jobs()
            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(_stage_json, r2, os.path.join(stage, "r2"))
                _stage_json(r1, os.path.join(stage, "r1"))
                _link_round(os.path.join(stage, "r1"), landing, "r1")
                mark("stage_r1(+r2 bg)", t0, j0)
                t0, j0 = time.perf_counter(), jobs()
                _run()
                mark("round1_stream", t0, j0)
                t0, j0 = time.perf_counter(), jobs()
                fut.result()
                mark("stage_r2_wait", t0, j0)
            t0, j0 = time.perf_counter(), jobs()
            _link_round(os.path.join(stage, "r2"), landing, "r2")
            _run()
            mark("round2_stream", t0, j0)
            t0, j0 = time.perf_counter(), jobs()
            rows = sorted(
                r["doc_id"]
                for r in spark.read.parquet(out).select("doc_id").collect()
            )
            mark("final_read", t0, j0)
        finally:
            for d in (stage, landing):
                shutil.rmtree(d, ignore_errors=True)
        total = time.perf_counter() - t_all
        totj = jobs() - j_all
    print(f"rows={len(rows)}")
    for label, dt, nj in marks:
        print(f"{label:20s} {dt:7.3f}s  ~{nj} jobs")
    print(f"{'TOTAL':20s} {total:7.3f}s  ~{totj} jobs")


if __name__ == "__main__":
    main()
