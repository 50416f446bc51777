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
    must land in. A NULL metric (empty input) fails."""

    name: str
    metric_tpl: str
    lo: int
    hi: int


class Suite:
    """A named set of checks over one table, compiled to one scan."""

    _INT64_MAX = (1 << 63) - 1

    def __init__(self) -> None:
        self.checks: list[Check] = []

    # -- check constructors -------------------------------------------------

    def _add(self, name: str, metric_tpl: str, lo: int, hi: int) -> "Suite":
        assert all(c.name != name for c in self.checks), f"duplicate check {name}"
        self.checks.append(Check(name, metric_tpl, lo, hi))
        return self

    def size_at_least(self, n: int) -> "Suite":
        return self._add("size_at_least", "count(*)", n, self._INT64_MAX)

    def completeness(self, col: str, *, at_least_ppm: int = PPM) -> "Suite":
        """count(col)/count(*) in ppm — non-null fraction."""
        return self._add(
            f"completeness_{col}",
            _ppm_tpl(f"count({col})", "count(*)"),
            at_least_ppm,
            PPM,
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
        )

    def min_scaled_between(
        self, col: str, lo: int, hi: int, *, scale: int = 1
    ) -> "Suite":
        """floor(min(col)·scale) within [lo, hi] (integer band)."""
        return self._add(
            f"min_{col}", f"CAST(floor(min({col}) * {scale}) AS BIGINT)", lo, hi
        )

    def max_scaled_between(
        self, col: str, lo: int, hi: int, *, scale: int = 1
    ) -> "Suite":
        return self._add(
            f"max_{col}", f"CAST(floor(max({col}) * {scale}) AS BIGINT)", lo, hi
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
