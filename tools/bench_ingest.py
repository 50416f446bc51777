"""Ingest-throughput benchmark against the reference's ONLY published
throughput number.

The reference's incremental extractor budgets **~5 minutes per ENTSOE
data month** (reference `src/incremental_extract.py:84-86`: "350-min
job timeout / ~5min per ENTSOE month / ... ~12-month soft ceiling"),
inserting in 500k-record batches (`src/database.py:568`,
`batch_size=500000`). That 5 minutes covers API extraction + validate +
dedup-insert; the engine-comparable axis is everything after the bytes
exist locally, so this benchmark synthesizes a month-equivalent ENTSOE
JSONL (~500k unique records: hourly readings for one calendar month
across enough plants to reach the reference's batch size) and measures
`Engine.load_jsonl` end-to-end — read → fixup chain → validation →
first-wins dedup → stored-key dedup → partition-pruned anti-join append
→ lineage/metadata upsert — plus the idempotent RE-load (the pure
anti-join path the reference pays on every catch-up re-run) and the
monthly MV refresh.

Usage:
    python tools/bench_ingest.py            # one JSON line on stdout

Env:
    SPARK_ETL_INGEST_N      record count (default 499968 — 672 plants
                            x 744 hours, one January)
    SPARK_GRAFT_CPUS        local[N] parallelism (default 32)

The committed results live in BENCH_INGEST.md (docs-sync-gated).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JAN_MS = 1704067200000  # 2024-01-01T00:00:00Z
HOURS = 31 * 24
RUN_ID = "deadbeef-0000-4000-8000-0123456789ab"

# All 20 PSR codes of the reference's psr->fuel map get traffic.
PSR_CODES = [f"B{i:02d}" for i in range(1, 21)]


def synthesize(path: str, n: int) -> int:
    """Month-equivalent ENTSOE JSONL: hourly readings, unique
    (plant, timestamp) keys, deterministic values. Returns rows
    written. Generation time is NOT part of the measured load (the
    reference's 5 min includes API extraction; we only claim the
    engine-side phase, and say so in BENCH_INGEST.md)."""
    plants = max(1, -(-n // HOURS))  # ceil
    now_ms = 1704067200123
    written = 0
    with open(path, "w") as f:
        for p in range(plants):
            if written >= n:
                break
            plant = f"PLANT_{p:05d}"
            psr = PSR_CODES[p % len(PSR_CODES)]
            country = ("DE", "FR", "ES", "IT", "PL")[p % 5]
            for h in range(HOURS):
                if written >= n:
                    break
                rec = {
                    "extraction_run_id": RUN_ID,
                    "created_at_ms": now_ms,
                    "timestamp_ms": JAN_MS + h * 3_600_000,
                    "country_code": country,
                    "psr_type": psr,
                    "plant_name": plant,
                    "fuel_type": "Unknown",
                    "data_type": "Actual Aggregated",
                    "generation_mw": round(((p * 7919 + h * 104729) % 100000) / 100.0, 2),
                    "resolution_minutes": 60,
                }
                f.write(json.dumps(rec) + "\n")
                written += 1
    return written


def main() -> int:
    from power_generation_etl_spark.engine import Engine
    from power_generation_etl_spark.session import get_spark

    n = int(os.environ.get("SPARK_ETL_INGEST_N", str(672 * HOURS)))
    work = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        src = os.path.join(work, "entsoe_month.jsonl")
        t0 = time.monotonic()
        rows = synthesize(src, n)
        gen_s = time.monotonic() - t0

        spark = get_spark("bench_ingest")
        engine = Engine(spark, os.path.join(work, "warehouse"))

        t0 = time.monotonic()
        res = engine.load_jsonl("entsoe", src)
        load_s = time.monotonic() - t0
        assert res.success and res.inserted == rows, (res, rows)

        t0 = time.monotonic()
        res2 = engine.load_jsonl("entsoe", src)
        reload_s = time.monotonic() - t0
        assert res2.success and res2.inserted == 0, res2

        t0 = time.monotonic()
        engine.refresh_views("entsoe")
        mv_s = time.monotonic() - t0

        out = {
            "metric": "ingest_month_equivalent",
            "rows": rows,
            "gen_sec": round(gen_s, 2),
            "load_sec": round(load_s, 2),
            "reload_sec": round(reload_s, 2),
            "mv_refresh_sec": round(mv_s, 2),
            "rows_per_sec": int(rows / load_s),
            "reference_month_sec": 300,
            "speedup_vs_reference": round(300.0 / load_s, 1),
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
