"""Skew-mitigation operators for hot-key workloads.

At 100 TB a handful of hot keys (one giant plant, one dominant
event_type) can stall a stage on a single reducer. AQE's skew-join
splitting handles joins; for *aggregations* the classic fix is salting:
two-phase aggregation through a composite (key, salt) that spreads a
hot key over N reducers, then combines the partials.

Only algebraic aggregates (sum/count/min/max, and avg via sum+count)
can be salted this way — that covers every aggregate the reference
uses (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum/count measures) through a salt column.

    `measures`: output name → SUM-able column expression; a `_count`
    partial is always carried so callers can derive averages
    (avg = sum/_count) from the combined result.
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(expr).alias(f"_p_{name}") for name, expr in measures.items()],
        F.count(F.lit(1)).alias("_p_count"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in measures],
        F.sum("_p_count").alias("_count"),
    )
