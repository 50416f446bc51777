"""Behavioral-analytics catalog queries over `events` — ordered funnel
conversion, daily cohort retention, event-transition matrix
(operators/behavior.py), each with a bit-exact DuckDB oracle.

All time arithmetic is integer epoch-µs / integer day indexes (via
`T_events_us`), so nothing here depends on the session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import behavior as bh
from power_generation_etl_spark.plans.queries import _register
from power_generation_etl_spark.plans.temporal_queries import T_events_us

FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


@_register(
    "funnel_conversion",
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
    w0 AS (
      SELECT user_id, ts_us, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts_us END)
               OVER (PARTITION BY user_id) AS t0
      FROM e
    ),
    w1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t1
      FROM w0
    ),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    u AS (
      SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM w3 GROUP BY 1
    ),
    c AS (
      SELECT CAST(count(t0) AS BIGINT) AS n0, CAST(count(t1) AS BIGINT) AS n1,
             CAST(count(t2) AS BIGINT) AS n2, CAST(count(t3) AS BIGINT) AS n3
      FROM u
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step, n0 AS n_users,
             CASE WHEN n0 = 0 THEN NULL ELSE round(n0 * 1.0 / n0, 4) END
               AS conversion FROM c
      UNION ALL
      SELECT 2, 'view', n1,
             CASE WHEN n0 = 0 THEN NULL ELSE round(n1 * 1.0 / n0, 4) END FROM c
      UNION ALL
      SELECT 3, 'click', n2,
             CASE WHEN n1 = 0 THEN NULL ELSE round(n2 * 1.0 / n1, 4) END FROM c
      UNION ALL
      SELECT 4, 'purchase', n3,
             CASE WHEN n2 = 0 THEN NULL ELSE round(n3 * 1.0 / n2, 4) END FROM c
    )
    ORDER BY step_idx
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→view→click→purchase funnel: users completing
    each prefix in strict time order, with step-over-step conversion.
    Chained same-partitioning window minimums — one shuffle total."""
    e = T_events_us(spark, sf_dir)
    return bh.funnel_steps(
        e, "user_id", "ts_us", "event_type", FUNNEL_STEPS
    ).orderBy("step_idx")


@_register(
    "daily_cohort_retention",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx FROM events
    ),
    ud AS (SELECT DISTINCT user_id, day_idx FROM e),
    c AS (
      SELECT user_id, day_idx,
             min(day_idx) OVER (PARTITION BY user_id) AS cohort_day
      FROM ud
    )
    SELECT cohort_day,
           day_idx - cohort_day AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           strftime(DATE '1970-01-01' + CAST(cohort_day AS INT), '%Y-%m-%d')
             AS cohort_date
    FROM c
    GROUP BY 1, 2
    ORDER BY cohort_day, day_offset
    """,
)
def daily_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-active day, counted
    at each later active-day offset. Integer day indexes (epoch-µs div
    µs/day) keep the cohort assignment timezone-independent."""
    e = T_events_us(spark, sf_dir)
    return bh.cohort_retention(e, "user_id", "ts_us").orderBy(
        "cohort_day", "day_offset"
    )


@_register(
    "event_transition_matrix",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
    ),
    p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS to_type
      FROM e
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
    FROM p
    WHERE to_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    of each user (time-ordered, event_id tiebreak). One window shuffle
    + a |types|² aggregation."""
    e = T_events_us(spark, sf_dir)
    return bh.transition_matrix(
        e, "user_id", "ts_us", "event_type", "event_id"
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# Seasonal-baseline deviation: compare each (event_type, day)'s actual
# count against that type's weekday-of-week baseline and flag days that
# deviate. The comparison is exact cross-multiplied integer arithmetic
# (actual · baseline_days vs factor-scaled baseline total) — no float
# shares, so a borderline day cannot flip between engines/partitionings.
# Same shape at any scale: two hash aggs + one broadcast join back.
# ---------------------------------------------------------------------------


@_register(
    "seasonal_deviation_days",
    """
    WITH ev AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS d FROM events
    ),
    daily AS (
        SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY event_type, d
    ),
    base AS (
        SELECT event_type, d % 7 AS wd,
               CAST(sum(n) AS BIGINT) AS wd_total,
               CAST(count(*) AS BIGINT) AS wd_days
        FROM daily GROUP BY event_type, d % 7
    )
    SELECT daily.event_type,
           strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m-%d') AS day,
           n, wd_total, wd_days,
           CASE WHEN n * wd_days * 20 > wd_total * 23 THEN 'high'
                WHEN n * wd_days * 23 < wd_total * 20 THEN 'low'
                ELSE 'normal' END AS flag
    FROM daily
    JOIN base ON daily.event_type = base.event_type AND daily.d % 7 = base.wd
    WHERE n * wd_days * 20 > wd_total * 23 OR n * wd_days * 23 < wd_total * 20
    ORDER BY daily.event_type, day
    """,
)
def seasonal_deviation_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume is >1.15× ('high') or <1/1.15× ('low')
    their type's same-weekday baseline — the volume-anomaly screen a
    feed monitor runs. Thresholds are the integer cross-products
    20n·days > 23·total and 23n·days < 20·total (±15%, tuned so
    Poisson-level noise at test scale produces visible flags)."""
    day_us = 86_400_000_000
    ev = T_events_us(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us div {day_us}").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    base = daily.groupBy(
        "event_type", (F.col("d") % 7).alias("wd")
    ).agg(
        F.sum("n").cast("bigint").alias("wd_total"),
        F.count(F.lit(1)).alias("wd_days"),
    )
    j = daily.join(
        F.broadcast(base),
        (daily.event_type == base.event_type) & (daily.d % 7 == base.wd),
    ).drop(base.event_type)
    high = F.col("n") * F.col("wd_days") * 20 > F.col("wd_total") * 23
    low = F.col("n") * F.col("wd_days") * 23 < F.col("wd_total") * 20
    return (
        j.where(high | low)
        .select(
            "event_type",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            "n",
            "wd_total",
            "wd_days",
            F.when(high, "high").when(low, "low").otherwise("normal").alias("flag"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Funnel step latency: for users who completed each step transition, the
# median time between consecutive funnel steps — doubled integer µs so
# the even-count median interpolation stays integral (the exact-median
# idiom shared with `mad_value_outliers` / `session_duration_stats`).
# ---------------------------------------------------------------------------


@_register(
    "funnel_step_latency",
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
    w0 AS (
      SELECT user_id, ts_us, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts_us END)
               OVER (PARTITION BY user_id) AS t0
      FROM e
    ),
    w1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t1
      FROM w0
    ),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2
                         THEN ts_us END) OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    u AS (
      SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM w3 GROUP BY 1
    ),
    gaps AS (
      SELECT 1 AS step_idx, 'signup->view' AS transition,
             (t1 - t0) * 2 AS gap2 FROM u WHERE t1 IS NOT NULL
      UNION ALL
      SELECT 2, 'view->click', (t2 - t1) * 2 FROM u WHERE t2 IS NOT NULL
      UNION ALL
      SELECT 3, 'click->purchase', (t3 - t2) * 2 FROM u WHERE t3 IS NOT NULL
    )
    SELECT CAST(step_idx AS BIGINT) AS step_idx, transition,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(median(gap2) AS BIGINT) AS median_gap2_us,
           CAST(min(gap2) AS BIGINT) AS min_gap2_us,
           CAST(max(gap2) AS BIGINT) AS max_gap2_us
    FROM gaps GROUP BY step_idx, transition
    ORDER BY step_idx
    """,
)
def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T_events_us(spark, sf_dir)
    times = bh.funnel_user_times(
        e, "user_id", "ts_us", "event_type", FUNNEL_STEPS
    )
    structs = []
    for i in range(1, len(FUNNEL_STEPS)):
        structs.append(
            F.struct(
                F.lit(i).cast("bigint").alias("step_idx"),
                F.lit(
                    f"{FUNNEL_STEPS[i - 1]}->{FUNNEL_STEPS[i]}"
                ).alias("transition"),
                ((F.col(f"_t{i}") - F.col(f"_t{i - 1}")) * 2).alias("gap2"),
            )
        )
    gaps = (
        times.select(F.explode(F.array(*structs)).alias("g"))
        .select("g.*")
        .where(F.col("gap2").isNotNull())
    )
    return (
        gaps.groupBy("step_idx", "transition")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.median("gap2").cast("bigint").alias("median_gap2_us"),
            F.min("gap2").cast("bigint").alias("min_gap2_us"),
            F.max("gap2").cast("bigint").alias("max_gap2_us"),
        )
        .orderBy("step_idx")
    )
