"""Declarative data-quality expectations compiled into ONE aggregation
pass (the Deequ / Great Expectations shape, Spark-first).

The reference validates ROW-level shape (src/validator.py — type
algebra, required fields, per-record error taxonomy; mirrored by
`validation.py`). What it has no analogue for is DATASET-level
constraints — "o_orderkey is unique", "99% of rows are complete",
"the mean lands in this band" — which at 100 TB must be computed
without a second scan per check. This module compiles an arbitrary
suite of such checks into a SINGLE keyless aggregation over one scan:
map-side partial aggregation does all the work, the final exchange
carries exactly one row, and the report explodes driver-side from
that row (`F.inline`) — the canonical cluster shape for a 50-check
suite over a 100 TB table (one pass, no shuffle of data rows).

Every metric is deterministic integer arithmetic (counts, ppm ratios
via the overflow-safe staged long division — valid to 9.2e16 rows —
and floor-scaled extrema), so a suite has an exact DuckDB twin
generated from the SAME check definitions (`Suite.oracle_sql`): the
engine and the oracle can never drift on what a check means.

Pass/fail is a pure function of the metric (`lo <= metric <= hi`,
NULL-metric = fail), which keeps the report schema uniform:
(check_name, metric, passed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _ppm_tpl(num: str, den: str) -> str:
    """floor(num · 1e6 / den) in pure int64 via three ×100 stages —
    `num * 1000000` would overflow past 9.2e12 rows (ANSI error in
    Spark, BIGINT multiply error in DuckDB); each stage multiplies a
    remainder < den by 100, valid to den ≤ 9.2e16. `{DIV}` is the
    dialect integer-division token (Spark `div`, DuckDB `//`)."""
    q1 = f"(({num}) * 100 {{DIV}} ({den}))"
    r1 = f"(({num}) * 100 % ({den}))"
    q2 = f"({r1} * 100 {{DIV}} ({den}))"
    r2 = f"({r1} * 100 % ({den}))"
    q3 = f"({r2} * 100 {{DIV}} ({den}))"
    return (
        f"CASE WHEN ({den}) = 0 THEN NULL"
        f" ELSE {q1} * 10000 + {q2} * 100 + {q3} END"
    )


@dataclass(frozen=True)
class Check:
    """One expectation: a dialect-templated aggregate metric (`{DIV}`
    marks integer division) and the inclusive [lo, hi] band the metric
    must land in. A NULL metric (empty input) fails.

    `kind`/`args` additionally record the check's MERGEABLE
    decomposition for the streaming monitor (streaming/ingest.py::
    stream_expectations): kind → partial-aggregate slots and their
    merge ops. `opaque` kinds (uniqueness — count-distinct does not
    merge) are batch-only."""

    name: str
    metric_tpl: str
    lo: int
    hi: int
    kind: str = "opaque"
    args: tuple = ()

    # -- mergeable decomposition (used by the streaming monitor) ----------
    #   slots(): per-batch aggregate SQL templates ({DIV} dialect token)
    #   merge_ops(): how a slot combines across batches
    #   final_tpl(names): the metric over merged slot column names

    def slots(self) -> tuple[str, ...]:
        if self.kind in ("count", "min", "max"):
            return (self.args[0],)
        if self.kind in ("ppm", "mean"):
            return (self.args[0], self.args[1])
        raise ValueError(f"check {self.name} ({self.kind}) is not mergeable")

    def merge_ops(self) -> tuple[str, ...]:
        return {
            "count": ("sum",),
            "min": ("min",),
            "max": ("max",),
            "ppm": ("sum", "sum"),
            "mean": ("sum", "sum"),
        }[self.kind]

    def final_tpl(self, names: tuple[str, ...]) -> str:
        if self.kind in ("count", "min", "max"):
            return names[0]
        if self.kind == "ppm":
            return _ppm_tpl(names[0], names[1])
        if self.kind == "mean":
            return (
                f"CASE WHEN {names[1]} = 0 OR {names[1]} IS NULL THEN NULL"
                f" ELSE {names[0]} {{DIV}} {names[1]} END"
            )
        raise ValueError(f"check {self.name} ({self.kind}) is not mergeable")


class Suite:
    """A named set of checks over one table, compiled to one scan."""

    _INT64_MAX = (1 << 63) - 1

    def __init__(self) -> None:
        self.checks: list[Check] = []

    # -- check constructors -------------------------------------------------

    def _add(
        self,
        name: str,
        metric_tpl: str,
        lo: int,
        hi: int,
        kind: str = "opaque",
        args: tuple = (),
    ) -> "Suite":
        assert all(c.name != name for c in self.checks), f"duplicate check {name}"
        self.checks.append(Check(name, metric_tpl, lo, hi, kind, args))
        return self

    def size_at_least(self, n: int) -> "Suite":
        return self._add(
            "size_at_least", "count(*)", n, self._INT64_MAX,
            kind="count", args=("count(*)",),
        )

    def completeness(self, col: str, *, at_least_ppm: int = PPM) -> "Suite":
        """count(col)/count(*) in ppm — non-null fraction."""
        return self._add(
            f"completeness_{col}",
            _ppm_tpl(f"count({col})", "count(*)"),
            at_least_ppm,
            PPM,
            kind="ppm", args=(f"count({col})", "count(*)"),
        )

    def uniqueness(self, col: str, *, at_least_ppm: int = PPM) -> "Suite":
        """count(DISTINCT col)/count(col) in ppm — 1e6 means no dups."""
        return self._add(
            f"uniqueness_{col}",
            _ppm_tpl(f"count(DISTINCT {col})", f"count({col})"),
            at_least_ppm,
            PPM,
        )

    def values_in(
        self, col: str, allowed: list[str], *, at_least_ppm: int = PPM
    ) -> "Suite":
        lits = ", ".join("'" + v.replace("'", "''") + "'" for v in allowed)
        return self._add(
            f"values_in_{col}",
            _ppm_tpl(
                f"count(*) FILTER (WHERE {col} IN ({lits}))", "count(*)"
            ),
            at_least_ppm,
            PPM,
            kind="ppm",
            args=(f"count(*) FILTER (WHERE {col} IN ({lits}))", "count(*)"),
        )

    def satisfies(
        self, name: str, predicate: str, *, at_least_ppm: int = PPM
    ) -> "Suite":
        """Fraction of rows satisfying an arbitrary (dialect-shared)
        boolean SQL predicate, in ppm."""
        return self._add(
            f"satisfies_{name}",
            _ppm_tpl(f"count(*) FILTER (WHERE {predicate})", "count(*)"),
            at_least_ppm,
            PPM,
            kind="ppm",
            args=(f"count(*) FILTER (WHERE {predicate})", "count(*)"),
        )

    def min_scaled_between(
        self, col: str, lo: int, hi: int, *, scale: int = 1
    ) -> "Suite":
        """floor(min(col)·scale) within [lo, hi] (integer band)."""
        return self._add(
            f"min_{col}", f"CAST(floor(min({col}) * {scale}) AS BIGINT)", lo, hi,
            kind="min", args=(f"CAST(floor(min({col}) * {scale}) AS BIGINT)",),
        )

    def max_scaled_between(
        self, col: str, lo: int, hi: int, *, scale: int = 1
    ) -> "Suite":
        return self._add(
            f"max_{col}", f"CAST(floor(max({col}) * {scale}) AS BIGINT)", lo, hi,
            kind="max", args=(f"CAST(floor(max({col}) * {scale}) AS BIGINT)",),
        )

    def mean_scaled_between(
        self, col: str, lo: int, hi: int, *, scale: int = 100
    ) -> "Suite":
        """Integer mean of floor(col·scale): summing per-row floored
        bigints keeps the aggregate associative and engine-exact
        (a raw double sum is partition-order-dependent)."""
        num = f"CAST(sum(CAST(floor({col} * {scale}) AS BIGINT)) AS BIGINT)"
        return self._add(
            f"mean_{col}",
            f"CASE WHEN count({col}) = 0 THEN NULL"
            f" ELSE {num} {{DIV}} count({col}) END",
            lo,
            hi,
            kind="mean", args=(num, f"count({col})"),
        )

    # -- compilation --------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """(check_name, metric, passed) — one row per check, computed
        from ONE keyless aggregation over `df` (single scan; the only
        single-partition exchange carries one row)."""
        aggs = [
            F.expr(c.metric_tpl.format(DIV="div")).cast("long").alias(f"_m{i}")
            for i, c in enumerate(self.checks)
        ]
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(c.lo).alias("_lo"),
                F.lit(c.hi).alias("_hi"),
            )
            for i, c in enumerate(self.checks)
        ]
        return (
            one.select(F.inline(F.array(*structs)))
            .select(
                "check_name",
                "metric",
                F.when(
                    F.col("metric").isNotNull()
                    & F.col("metric").between(F.col("_lo"), F.col("_hi")),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("passed"),
            )
            .orderBy("check_name")
        )

    def run_grouped(self, df: DataFrame, by: str) -> DataFrame:
        """(grp, check_name, metric, passed) — the suite evaluated PER
        GROUP in one pass (one groupBy aggregation over one scan): the
        per-partition quality report that tells you WHICH source/shard
        violates a constraint, not just that the union does. Same
        check semantics; the group column must be non-null."""
        aggs = [
            F.expr(c.metric_tpl.format(DIV="div")).cast("long").alias(f"_m{i}")
            for i, c in enumerate(self.checks)
        ]
        per = df.groupBy(F.col(by).alias("grp")).agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(c.lo).alias("_lo"),
                F.lit(c.hi).alias("_hi"),
            )
            for i, c in enumerate(self.checks)
        ]
        return (
            per.select("grp", F.inline(F.array(*structs)))
            .select(
                "grp",
                "check_name",
                "metric",
                F.when(
                    F.col("metric").isNotNull()
                    & F.col("metric").between(F.col("_lo"), F.col("_hi")),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("passed"),
            )
            .orderBy("grp", "check_name")
        )

    def oracle_grouped_sql(self, table: str, by: str) -> str:
        """DuckDB twin of run_grouped, generated from the same checks."""
        metrics = ",\n             ".join(
            f"CAST(({c.metric_tpl.format(DIV='//')}) AS BIGINT) AS _m{i}"
            for i, c in enumerate(self.checks)
        )
        rows = "\n    UNION ALL ".join(
            f"SELECT grp, '{c.name}' AS check_name, _m{i} AS metric,"
            f" CASE WHEN _m{i} IS NOT NULL AND _m{i} BETWEEN {c.lo} AND {c.hi}"
            f" THEN 1 ELSE 0 END AS passed FROM m"
            for i, c in enumerate(self.checks)
        )
        return f"""
    WITH m AS (
      SELECT {by} AS grp,
             {metrics}
      FROM {table}
      GROUP BY {by}
    )
    SELECT * FROM ({rows})
    ORDER BY grp, check_name
    """

    # -- streaming (mergeable) compilation ---------------------------------

    def slot_names(self) -> list[tuple[int, int, str]]:
        """(check_idx, slot_idx, column_name) for every partial slot."""
        out = []
        for i, c in enumerate(self.checks):
            for j in range(len(c.slots())):
                out.append((i, j, f"s_{i}_{j}"))
        return out

    def assert_mergeable(self) -> None:
        bad = [c.name for c in self.checks if c.kind == "opaque"]
        if bad:
            raise ValueError(
                f"checks not mergeable across batches (batch-only): {bad}"
            )

    def partial_aggs(self) -> list:
        """Per-batch partial aggregates, one column per slot — the row
        a micro-batch contributes to the streaming metrics store."""
        self.assert_mergeable()
        return [
            F.expr(self.checks[i].slots()[j].format(DIV="div"))
            .cast("long")
            .alias(name)
            for i, j, name in self.slot_names()
        ]

    def merge_aggs(self) -> list:
        """How slot columns combine across partial rows (store merge):
        the per-kind op declared by Check.merge_ops()."""
        ops = {"sum": F.sum, "min": F.min, "max": F.max}
        out = []
        for i, j, name in self.slot_names():
            op = self.checks[i].merge_ops()[j]
            out.append(ops[op](F.col(name)).cast("long").alias(name))
        return out

    def finalize(self, merged: DataFrame) -> DataFrame:
        """(check_name, metric, passed) from a ONE-ROW DataFrame of
        merged slot columns. Runs through Spark SQL expressions — the
        identical integer-division semantics as the batch path and the
        DuckDB oracle (Python // floors negative quotients; SQL div
        truncates, so a driver-side reimplementation would drift on
        negative mean sums)."""
        names = {}
        for i, j, name in self.slot_names():
            names.setdefault(i, []).append(name)
        one = merged.select(
            *[
                F.expr(
                    self.checks[i].final_tpl(tuple(ns)).format(DIV="div")
                )
                .cast("long")
                .alias(f"_m{i}")
                for i, ns in names.items()
            ]
        )
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(c.lo).alias("_lo"),
                F.lit(c.hi).alias("_hi"),
            )
            for i, c in enumerate(self.checks)
        ]
        return (
            one.select(F.inline(F.array(*structs)))
            .select(
                "check_name",
                "metric",
                F.when(
                    F.col("metric").isNotNull()
                    & F.col("metric").between(F.col("_lo"), F.col("_hi")),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("passed"),
            )
            .orderBy("check_name")
        )

    def finalize_grouped(self, merged: DataFrame) -> DataFrame:
        """(grp, check_name, metric, passed) from a per-GROUP DataFrame
        of merged slot columns (one row per grp) — the streaming twin
        of run_grouped's report stage."""
        names = {}
        for i, j, name in self.slot_names():
            names.setdefault(i, []).append(name)
        per = merged.select(
            "grp",
            *[
                F.expr(
                    self.checks[i].final_tpl(tuple(ns)).format(DIV="div")
                )
                .cast("long")
                .alias(f"_m{i}")
                for i, ns in names.items()
            ],
        )
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(c.lo).alias("_lo"),
                F.lit(c.hi).alias("_hi"),
            )
            for i, c in enumerate(self.checks)
        ]
        return (
            per.select("grp", F.inline(F.array(*structs)))
            .select(
                "grp",
                "check_name",
                "metric",
                F.when(
                    F.col("metric").isNotNull()
                    & F.col("metric").between(F.col("_lo"), F.col("_hi")),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("passed"),
            )
            .orderBy("grp", "check_name")
        )

    def oracle_sql(self, table: str) -> str:
        """The DuckDB twin, generated from the same check list."""
        metrics = ",\n             ".join(
            f"CAST(({c.metric_tpl.format(DIV='//')}) AS BIGINT) AS _m{i}"
            for i, c in enumerate(self.checks)
        )
        rows = "\n    UNION ALL ".join(
            f"SELECT '{c.name}' AS check_name, _m{i} AS metric,"
            f" CASE WHEN _m{i} IS NOT NULL AND _m{i} BETWEEN {c.lo} AND {c.hi}"
            f" THEN 1 ELSE 0 END AS passed FROM m"
            for i, c in enumerate(self.checks)
        )
        return f"""
    WITH m AS (
      SELECT {metrics}
      FROM {table}
    )
    SELECT * FROM ({rows})
    ORDER BY check_name
    """
