"""Dump `.explain("formatted")` for named catalog queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit alongside bench numbers.

    python tools/plan_snapshot.py <suffix> q1 q2 ... [--sf DIR] [--tag r11]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix", help="file suffix, e.g. before / after")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r11")
    args = ap.parse_args()

    import __spark_entry__ as e
    from power_generation_etl_spark.session import get_spark

    spark = get_spark("plan-snapshot")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = e.queries()
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
