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
    single_partition_exchanges: int = 0
    bigtable_broadcasts: list[str] = field(default_factory=list)
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
            f"single-partition exch.: {self.single_partition_exchanges}",
        ]
        out += [f"WARN: {w}" for w in self.warnings]
        out.append("plan: OK" if self.ok else "plan: REVIEW")
        return out


# One column name unique to each scale-factor-proportional base table;
# LogicalRelation leaves expose the full parquet schema regardless of
# aliasing above, so these identify the table through renames.
_BIG_TABLE_KEYS = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "l_linenumber": "lineitem",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# Logical nodes that bound the row count of everything above them: an
# aggregation (output ≤ |group-key domain|), an explicit limit, a
# distinct, or a fixed-fraction sample used only in bounded demos.
_SIZE_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "Deduplicate"}


def bigtable_broadcasts(df: DataFrame) -> list[str]:
    """Names of sf-proportional base tables reached by a broadcast hint
    with no size-bounding node (Aggregate / GlobalLimit / Deduplicate)
    in between.

    A hard ``F.broadcast`` hint overrides AQE's size check, so hinting
    a table that grows with scale factor (customer/part/supplier/...)
    is an executor-or-driver OOM at large sf, not just a slow plan.
    Hints are only safe on constant-cardinality dims (nation, region)
    and on aggregated/limited sub-results. AQE promotes genuinely
    small sides to broadcast at runtime — dropping the hint costs
    nothing when the side really is small.
    """
    found: list[str] = []
    plan = df._jdf.queryExecution().analyzed()

    def walk(node, under_hint: bool) -> None:
        name = node.nodeName()
        if name == "ResolvedHint" and "broadcast" in node.hints().toString():
            under_hint = True
        elif under_hint and name in _SIZE_BOUNDING_NODES:
            under_hint = False
        if under_hint and name == "LogicalRelation":
            outs = node.output()
            cols = {outs.apply(i).name() for i in range(outs.size())}
            for key, table in _BIG_TABLE_KEYS.items():
                if key in cols:
                    found.append(table)
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), under_hint)

    walk(plan, False)
    return found


def _single_partition_exchanges(phys: str) -> tuple[int, int]:
    """(total, suspicious) counts of ``Exchange SinglePartition`` nodes.

    A single-partition exchange funnels every row through ONE task —
    the same hazard class as an unpartitioned window. The ubiquitous
    benign form is the final step of a global (no group key) aggregate:
    partial HashAggregate(keys=[]) → Exchange SinglePartition → final,
    whose input is one row per upstream partition. Any other producer
    (repartition(1), coalesce-to-one compiled as shuffle, global sort
    to one partition) is flagged as suspicious.
    """
    lines = phys.splitlines()
    total = suspicious = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        total += 1
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "Aggregate(keys=[]" not in child and "Aggregate(key=[]" not in child:
            suspicious += 1
    return total, suspicious


def single_partition_exchanges(df: DataFrame) -> tuple[int, int]:
    """Public form of `_single_partition_exchanges` over a DataFrame —
    (total, suspicious) ``Exchange SinglePartition`` counts in its
    physical plan. Suspicious = not feeding a global (keyless)
    aggregate; the catalog gate in tests/test_queries_oracle.py fails
    any non-allowlisted query with a suspicious count."""
    return _single_partition_exchanges(
        df._jdf.queryExecution().executedPlan().toString()
    )


def check_plan(df: DataFrame) -> PlanReport:
    """Lint a DataFrame's plan for 100 TB hazards."""
    rep = PlanReport()
    qe = df._jdf.queryExecution()
    rep.bigtable_broadcasts = bigtable_broadcasts(df)

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
    rep.single_partition_exchanges, sp_suspicious = _single_partition_exchanges(
        phys
    )

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
    if rep.bigtable_broadcasts:
        rep.warnings.append(
            "broadcast hint on sf-proportional table(s) "
            f"{sorted(set(rep.bigtable_broadcasts))}: a hard hint overrides "
            "AQE's size check — at large scale factors this is an OOM. "
            "Drop the hint (AQE still broadcasts genuinely small sides) or "
            "bound the side with an aggregate/limit first"
        )
    if sp_suspicious:
        rep.warnings.append(
            f"{sp_suspicious} Exchange SinglePartition node(s) not feeding a "
            "global aggregate: every row funnels through ONE task — avoid "
            "repartition(1)/coalesce(1) on row-scale data"
        )
    return rep
