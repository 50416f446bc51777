"""Data-profiling operators: fixed-width histograms, exact quantile
thresholds, per-group top-k, and exact-arithmetic anomaly flags.

These are the scans a pipeline runs to understand a corpus before
setting filter thresholds — all single-aggregation plans with map-side
partial combine, no UDFs, each with an exact DuckDB oracle twin in
plans/hygiene_queries.py.

Exactness discipline: anything that *selects rows* (threshold filters,
anomaly flags) is computed so the comparison is bit-exact across
engines — integer arithmetic where possible (`value > k×mean` becomes
``value·n > k·sum`` over integer-scaled values), and interpolated
quantiles use the same closed-form both engines implement. Floating
noise may wiggle a reported statistic's last digit (handled by
rounding) but must never flip row membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    *,
    width: int,
    n_buckets: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width integer histogram: bucket i covers
    [i·width, (i+1)·width), with the last bucket open-ended.

    Pure integer math (``least(value div width, n_buckets-1)``) — one
    hash aggregation, map-side combined; at 100 TB the shuffle carries
    at most groups × n_buckets rows."""
    # integer `div`, not floor(double /): above 2^53 the double quotient
    # rounds before floor and can land a row in the wrong bucket vs the
    # oracle's exact integer division.
    b = F.least(
        F.expr(f"`{value_col}` div {int(width)}"), F.lit(n_buckets - 1)
    ).cast("bigint")
    keys = [F.col(c) for c in (group_cols or [])]
    return (
        df.select(*keys, b.alias("bucket"), F.col(value_col))
        .groupBy(*[c for c in (group_cols or [])], "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * width).cast("bigint"))
    )


def quantile_threshold_filter(
    df: DataFrame, value_col: str, q: float, *, approx: bool = False
) -> DataFrame:
    """Rows strictly above the continuous ``q``-quantile of
    ``value_col``.

    The threshold is a 1-row aggregate broadcast back onto the scan
    (crossJoin(broadcast)) — no driver collect, one job. Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the closed form
    ``v[lo] + frac·(v[hi]−v[lo])`` at index (n−1)·q over the sorted
    values, so the float threshold is identical in both engines; the
    integer-vs-double comparison that selects rows is then exact.

    ``approx=True`` is the 100 TB path: ``approx_percentile`` keeps a
    bounded mergeable sketch per partition instead of buffering every
    value in the exact percentile's aggregation state — use it when a
    small threshold tolerance is acceptable (NOT oracle-portable; the
    catalog entry uses the exact form)."""
    if approx:
        thr = df.agg(
            F.approx_percentile(
                F.col(value_col), F.lit(q), F.lit(10_000)
            ).alias("_thr")
        )
    else:
        thr = df.agg(F.percentile(F.col(value_col), F.lit(q)).alias("_thr"))
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(value_col) > F.col("_thr"))
        .withColumn("threshold", F.round("_thr", 4))
        .drop("_thr")
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` descending, with a
    deterministic total order via ``tiebreak_col``.

    One window shuffle on the group key. At scale Spark pushes the
    rank filter into the sort (WindowGroupLimit), so each partition
    keeps only k rows per group rather than sorting everything."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col)
    )
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def scaled_int(value: Column, scale: int = 100) -> Column:
    """Integer-scale a fixed-point-ish double (e.g. currency) so
    downstream comparisons are exact integer arithmetic."""
    return F.round(value * scale, 0).cast("bigint")


def mean_factor_anomalies(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    factor: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Per-group count of rows exceeding ``factor ×`` the group mean —
    flagged with EXACT integer arithmetic.

    ``x > factor·mean`` is evaluated as ``x̂·n > factor·Σx̂`` over
    integer-scaled values x̂, so row membership never depends on
    float division order and the DuckDB oracle agrees bit-for-bit.
    Two passes over the group (one agg for (n, Σ), one re-join) would
    shuffle twice; instead a single window computes (n, Σ) alongside
    each row, then one hash agg rolls up — one shuffle total."""
    if not 1 <= scale <= 10_000 or 10_000 % scale != 0:
        raise ValueError(
            "scale must divide 10000 (mean is reported at 4dp via the "
            "exact integer multiplier 10000/scale)"
        )
    x = scaled_int(F.col(value_col), scale)
    w = Window.partitionBy(group_col)
    n = F.count(F.lit(1)).over(w)
    s = F.sum(x).over(w)
    flagged = df.select(
        F.col(group_col),
        x.alias("_x"),
        n.alias("_n"),
        s.alias("_s"),
    ).withColumn("_anom", (F.col("_x") * F.col("_n")) > (factor * F.col("_s")))
    # Mean reported via integer truncation at 4 decimals — Σx̂·(10⁴/scale)
    # div n — NOT float round(Σ/n/scale): a mean landing on a .00005
    # boundary rounds differently across engines at the last ulp,
    # whereas integer division is bit-exact everywhere.
    agg = flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("_anom")).alias("n_anomalies"),
        (F.sum("_x") * (10_000 // scale)).alias("_s4"),
    )
    return agg.select(
        F.col(group_col),
        "n_rows",
        "n_anomalies",
        (F.expr("_s4 div n_rows") / F.lit(10_000.0)).alias("mean_value"),
    )


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile in long form: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — the ANALYZE-style scan that
    feeds schema drift checks and null-rate monitors.

    ONE aggregation pass computes every statistic (Spark plans the
    multi-distinct via Expand — still a single shuffle round), then the
    1-row result explodes into one row per column. min/max are emitted
    as strings for a uniform schema; profile integer/string columns —
    float formatting differs across engines."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(c).alias(f"_nn{i}"),
            F.count_distinct(F.col(c)).alias(f"_nd{i}"),
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn{i}")).alias("n_nulls"),
            F.col(f"_nd{i}").alias("n_distinct"),
            F.col(f"_mn{i}").alias("min_value"),
            F.col(f"_mx{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
