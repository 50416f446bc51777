"""Grouped-map Pandas UDF (`applyInPandas`) under the exact oracle.

The catalog already covers the other Python-kernel surfaces under
oracles (mapInPandas — media decode; applyInPandasWithState — pytest
streaming twins). This entry covers DataFrame.groupBy().applyInPandas:
an order-sensitive per-group numpy kernel whose every output is an
integer, so DuckDB can restate it exactly — the run-length statistic
needs a gaps-and-islands double window in SQL, which is precisely the
cross-check that the kernel's sequential logic is right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.operators.grouped import sequence_profile
from power_generation_etl_spark.plans.queries import T, _register
from power_generation_etl_spark.plans.temporal_queries import T_events_us


@_register(
    "user_event_profile",
    """
    WITH c AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL
    ),
    base AS (
      SELECT user_id, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM c GROUP BY 1
    ),
    ranked AS (
      SELECT user_id, cents,
             row_number() OVER (PARTITION BY user_id ORDER BY cents) AS r,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM c
    ),
    med AS (
      SELECT user_id,
             CAST(sum(CASE WHEN n % 2 = 1 AND r = (n + 1) // 2 THEN 2 * cents
                           WHEN n % 2 = 0 AND (r = n // 2 OR r = n // 2 + 1)
                           THEN cents END) AS BIGINT) AS median2x_cents
      FROM ranked GROUP BY 1
    ),
    seq AS (
      SELECT user_id, ts_us, event_id, cents,
             CASE WHEN lag(cents) OVER w IS NULL
                       OR cents <= lag(cents) OVER w THEN 1 ELSE 0 END AS brk
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    isl AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM seq
    ),
    runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2),
    lur AS (
      SELECT user_id, CAST(max(len) AS INTEGER) AS longest_up_run
      FROM runs GROUP BY 1
    )
    SELECT base.user_id, base.n_events, base.sum_cents,
           med.median2x_cents, lur.longest_up_run
    FROM base
    JOIN med USING (user_id)
    JOIN lur USING (user_id)
    ORDER BY user_id
    """,
)
def user_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequential profile via a grouped-map Pandas UDF
    (`operators/grouped.py::sequence_profile`): event count, exact
    floor-cents sum, doubled-integer median, and the longest strictly-
    increasing cents run in (ts, event_id) order. One shuffle on
    user_id; each group (≤ ~100 events/user in the synthetic data,
    bounded per-user sequences in general) is profiled by a single
    numpy kernel. The oracle restates the run statistic with a
    gaps-and-islands double window — integer-exact on both engines."""
    ev = T_events_us(spark, sf_dir).filter(F.col("value").isNotNull())
    cents = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return sequence_profile(
        cents, "user_id", ["ts_us", "event_id"], "cents"
    ).orderBy("user_id")


@_register(
    "user_cross_activity",
    """
    WITH o AS (
      SELECT o_custkey AS k,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_spent,
             max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_day
      FROM orders GROUP BY 1
    ),
    e AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    af AS (
      SELECT ev.user_id AS k, CAST(count(*) AS BIGINT) AS after
      FROM events ev JOIN o ON ev.user_id = o.k
      WHERE (CAST(ev.ts AS DATE) - DATE '1970-01-01') > o.last_day
      GROUP BY 1
    )
    SELECT coalesce(o.k, e.k) AS user_id,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(cents_spent, 0) AS cents_spent,
           coalesce(n_events, 0) AS n_events,
           CASE WHEN o.k IS NULL THEN coalesce(n_events, 0)
                ELSE coalesce(af.after, 0) END AS events_after_last_order
    FROM o FULL JOIN e ON o.k = e.k
    LEFT JOIN af ON coalesce(o.k, e.k) = af.k
    ORDER BY user_id
    """,
)
def user_cross_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map Pandas entry (r11 fourth wave): per-user fusion of
    the orders and events streams in one cogroup kernel — completes
    the Python-kernel API matrix (scalar pandas_udf, mapInPandas,
    applyInPandas, applyInPandasWithState, and now cogroup
    applyInPandas). The oracle restates the kernel as two aggregates +
    a full outer join + an after-last-order join, so a side swapped,
    a group lost on either outer edge, or a tz-shifted day comparison
    breaks the hash."""
    from power_generation_etl_spark.operators.grouped import cogroup_activity

    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("oday"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ev = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("ke"),
        F.unix_date(F.col("ts").cast("date")).cast("long").alias("eday"),
    )
    return cogroup_activity(o, ev, "k", "ke", "oday", "eday", "cents").orderBy(
        "user_id"
    )
