"""Round-start maintenance: bump the committed ROUND number and advance
the committed ROTATION cursor together.

Run ONCE at the start of each build round (before any catalog growth):

    python tools/bump_round.py

ROUND drives round-scoped bookkeeping; ROTATION is the driver-sample
rotation cursor (`plans/__init__.py::_reorder`). The cursor advances by
exactly `step` (the rotating slice width) from its previous committed
value, wrapped at the CURRENT rest size — see `plans.advance_cursor`
for why this, and not a round-number formula, guarantees coverage under
catalog growth.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from power_generation_etl_spark import plans

    step = 50 - len(plans._CORE)
    n_rest = len(plans.QUERIES) - len(plans._CORE)

    with open(os.path.join(ROOT, "ROUND")) as f:
        rnd = int(f.read().strip())
    cur = plans._rotation_cursor()
    if cur is None:  # first migration from the legacy round formula
        # Seed the cursor the legacy formula would have produced for the
        # CURRENT round, then advance both — a round-start run must
        # always bump ROUND, migration or not.
        cur = ((rnd - 1) * step) % n_rest if n_rest else 0
    nxt_round, nxt_cur = rnd + 1, plans.advance_cursor(cur, step, n_rest)

    with open(os.path.join(ROOT, "ROUND"), "w") as f:
        f.write(f"{nxt_round}\n")
    with open(os.path.join(ROOT, "ROTATION"), "w") as f:
        f.write(f"{nxt_cur}\n")
    print(
        f"ROUND {rnd} -> {nxt_round}; ROTATION cursor -> {nxt_cur} "
        f"(step={step}, rest={n_rest})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
