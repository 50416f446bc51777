"""Behavioral / sequence analytics over event streams: ordered funnel
conversion, daily cohort retention, and event-transition matrices.

The product-analytics query family (what Amplitude/Mixpanel-style
engines compute) expressed as plain DataFrame plans. Everything here
works in exact integer epoch-microseconds and integer day indexes —
never timezone-dependent dates, never float time arithmetic — so each
operator has a bit-exact DuckDB oracle twin in
plans/behavior_queries.py.

Scale notes (100 TB): every operator partitions by user_id and needs
exactly ONE shuffle — Spark collapses the chained same-partitioning
window frames of the funnel into a single exchange; retention is two
hash aggregations (user-day dedup, then cohort cells); transitions are
one window + one hash aggregation. Skewed power users are bounded by
per-user event counts, not corpus size; the aggregation outputs
(steps, cohort triangle, type×type matrix) are tiny regardless of
input scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_DAY = 86_400_000_000


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: for each step k, how many users
    performed steps 1..k *in order* (each strictly after the previous;
    with ``within_us``, also within that many µs of the previous step —
    the "converted within an hour" product question).

    Per user, t₁ = min ts of step 1, t₂ = min ts of step 2 after t₁,
    … — chained window minimums over the same user partitioning, which
    Spark executes with ONE shuffle (each Window node reuses the
    child's hash partitioning; verify: a single Exchange in .explain).
    Returns (step_idx, step, n_users, conversion) where conversion is
    n_users / step-1 users, rounded 4dp.

    Note the greedy-minimum caveat shared by every windowed-funnel
    engine: each step binds to its EARLIEST admissible occurrence, so
    with a window a user can fail even though some later-starting
    attempt would satisfy it. Integer-µs comparisons keep membership
    exact across engines.
    """
    reached = funnel_user_times(
        events, user_col, ts_col, type_col, steps, within_us=within_us
    )
    counts = reached.agg(
        *[
            F.count(f"_t{i}").cast("bigint").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    # One row per step, exploded from the single 1-row aggregate — a
    # union of per-step selects would re-execute the whole upstream
    # plan once per step.
    structs = []
    for i, step in enumerate(steps):
        denom = F.col(f"_n{i - 1}") if i else F.col("_n0")
        structs.append(
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"_n{i}").alias("n_users"),
                F.round(F.try_divide(F.col(f"_n{i}"), denom), 4).alias(
                    "conversion"
                ),
            )
        )
    return counts.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def funnel_user_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_us: int | None = None,
) -> DataFrame:
    """Per-user ordered-funnel step times: one row per user with
    ``_t0.._tk`` (NULL from the first unreached step on) — the shared
    core of `funnel_steps` (conversion counts) and the step-latency
    profile (gap distributions). Chained window minimums over one user
    partitioning → one shuffle."""
    w = Window.partitionBy("_u")
    df = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
    )
    prev: Column | None = None
    for i, step in enumerate(steps):
        cond = F.col("_ty") == step
        if prev is not None:
            cond = cond & (F.col("_ts") > prev)
            if within_us is not None:
                cond = cond & (F.col("_ts") <= prev + within_us)
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col("_ts"))).over(w))
        prev = F.col(f"_t{i}")
    return df.groupBy("_u").agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )


def user_day_table(
    events: DataFrame, user_col: str, ts_us_col: str
) -> DataFrame:
    """Distinct (user, day_idx) activity pairs, day_idx = epoch-µs div
    µs-per-day — pure integer arithmetic, independent of session
    timezone (a date-cast here would shift rows across engines).

    Dedup runs as a lag-window *within the user partitioning* (keep a
    row when its day differs from the previous), not a global
    `.distinct()` — a distinct would hash on (user, day) and force an
    extra exchange before the user-keyed cohort window; this way the
    dedup, the sort, and the cohort min all share ONE shuffle."""
    days = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"{ts_us_col} div {US_PER_DAY}").alias("day_idx"),
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    return (
        days.withColumn("_prev", F.lag("day_idx", 1).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("day_idx")))
        .drop("_prev")
    )


def cohort_retention(
    events: DataFrame, user_col: str, ts_us_col: str
) -> DataFrame:
    """Classic retention triangle: users grouped by first-active day
    (cohort), counted on each later active day offset.

    One user-keyed shuffle does dedup + cohort assignment (lag and min
    windows over the same partitioning), then one rollup shuffle on
    (cohort, offset). Output is at most days² cells however large the
    input."""
    ud = user_day_table(events, user_col, ts_us_col)
    w = Window.partitionBy("user_id")
    with_cohort = ud.withColumn("cohort_day", F.min("day_idx").over(w))
    return (
        with_cohort.groupBy(
            "cohort_day",
            (F.col("day_idx") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .withColumn(
            "cohort_date",
            F.date_format(
                F.date_add(
                    F.to_date(F.lit("1970-01-01")), F.col("cohort_day").cast("int")
                ),
                "yyyy-MM-dd",
            ),
        )
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    ts_us_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order event-transition counts: for consecutive events of
    each user (ordered by time, tiebroken deterministically), count
    (from_type → to_type) pairs. One window shuffle + one tiny hash
    aggregation (|types|² output rows)."""
    w = Window.partitionBy(user_col).orderBy(ts_us_col, tiebreak_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col, 1).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
