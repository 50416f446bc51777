"""Driver-fidelity correctness sweep: same Spark-vs-DuckDB compare as
check_correctness.py but on a VANILLA SparkSession — no tuned confs, no
UTC pin, default shuffle partitions, stock ANSI mode — exactly what the
external driver builds. Catches any catalog query that silently depends
on the tuned session (session timezone, legacy parquet confs set
globally instead of per-query, shuffle-partition counts).

Usage: python tools/check_vanilla.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, _norm_rows  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"  {name}: SPARK ERROR {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"  {name}: SCHEMA {scols} vs {ocols}")
            failures += 1
        elif len(srows) != len(orows):
            print(f"  {name}: ROWS {len(srows)} vs {len(orows)}")
            failures += 1
        elif _norm_rows(scols, srows) != _norm_rows(ocols, orows):
            print(f"  {name}: VALUES differ")
            failures += 1
        else:
            print(f"  {name}: OK ({len(srows)} rows)")
    n = len(only) if only else len(qs)
    if failures:
        print(f"FAIL: {failures}/{n} vanilla-session mismatches")
        return 1
    print(f"PASS: {n}/{n} queries match on a vanilla session")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
