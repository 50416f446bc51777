"""Plan linter: the scale-hygiene rules the test suite enforces on the
query catalog (tests/test_queries_oracle.py), packaged as a reusable
diagnostic for arbitrary user SQL / DataFrames.

Checks the OPTIMIZED LOGICAL plan for semantic hazards (unpartitioned
windows, python evals) and the PHYSICAL plan for execution hazards
(cartesians, non-broadcast nested loops, scans without pushed filters),
and counts the shuffle exchanges — the first number a 100 TB plan
review looks at.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    shuffles: int = 0
    broadcasts: int = 0
    global_windows: int = 0
    partitioned_windows: int = 0
    cartesians: int = 0
    nested_loop_joins: int = 0
    python_evals: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    warnings: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.warnings

    def lines(self) -> list[str]:
        out = [
            f"shuffle exchanges:      {self.shuffles}",
            f"broadcast exchanges:    {self.broadcasts}",
            f"windows (partitioned):  {self.partitioned_windows}",
            f"windows (GLOBAL):       {self.global_windows}",
            f"cartesian products:     {self.cartesians}",
            f"nested-loop joins:      {self.nested_loop_joins}",
            f"python evals:           {self.python_evals}",
            f"scans (with pushdown):  {self.scans} ({self.scans_with_pushed_filters})",
        ]
        out += [f"WARN: {w}" for w in self.warnings]
        out.append("plan: OK" if self.ok else "plan: REVIEW")
        return out


def check_plan(df: DataFrame) -> PlanReport:
    """Lint a DataFrame's plan for 100 TB hazards."""
    rep = PlanReport()
    qe = df._jdf.queryExecution()

    for nd in json.loads(qe.optimizedPlan().toJSON()):
        cls = nd.get("class", "")
        if cls.endswith(".Window"):
            if nd.get("partitionSpec") == []:
                rep.global_windows += 1
            else:
                rep.partitioned_windows += 1

    phys = qe.executedPlan().toString()
    rep.shuffles = len(re.findall(r"\bExchange (?:hash|range)partitioning", phys))
    rep.broadcasts = phys.count("BroadcastExchange")
    rep.cartesians = phys.count("CartesianProduct")
    rep.nested_loop_joins = phys.count("BroadcastNestedLoopJoin")
    rep.python_evals = phys.count("BatchEvalPython") + phys.count("ArrowEvalPython")
    scans = re.findall(r"FileScan \w+ .*?PushedFilters: (\[[^\]]*\])", phys)
    rep.scans = phys.count("FileScan")
    rep.scans_with_pushed_filters = sum(1 for f in scans if f != "[]")

    if rep.global_windows:
        rep.warnings.append(
            f"{rep.global_windows} unpartitioned Window node(s): every row "
            "moves to ONE task at scale — partition the window or use "
            "operators/rank.py's distributed two-pass rank"
        )
    if rep.cartesians:
        rep.warnings.append(
            f"{rep.cartesians} shuffle cartesian product(s): O(n*m) rows"
        )
    if rep.nested_loop_joins:
        rep.warnings.append(
            f"{rep.nested_loop_joins} BroadcastNestedLoopJoin(s): fine only "
            "when the broadcast side is guaranteed tiny (1-row scalars, "
            "literal grids)"
        )
    if rep.python_evals:
        rep.warnings.append(
            f"{rep.python_evals} Python eval node(s): row/batch data leaves "
            "the JVM — keep hot paths on built-in expressions"
        )
    return rep
