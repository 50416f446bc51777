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


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate-and-salt.

    A hot join key lands every matching fact row on ONE reducer; AQE's
    skew split handles this adaptively, but when the skew is known (a
    dominant plant, a bot user) the deterministic fix is: salt the
    FACT side (spreading the hot key over ``n_salts`` reducers) and
    replicate every DIM row once per salt so each (key, salt) shard
    still finds its match. Dim-side cost is ``n_salts ×`` rows —
    appropriate when the dim is far smaller than the fact table but
    too big (or too mid-sized) to broadcast outright.

    The salt is derived from the fact partition/offset — deterministic
    within a run, uniform across reducers, and never part of the
    output. Result equality with the plain join is pytest-asserted.

    Only fact-side-preserving join types are allowed: under right/full
    outer joins an unmatched dim row would surface once PER REPLICA
    (n_salts copies), silently breaking the plain-join equivalence.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicated dim rows would multiply unmatched-dim output"
        )
    salted = facts.withColumn(
        "_salt",
        F.pmod(
            F.spark_partition_id() + F.monotonically_increasing_id(),
            F.lit(n_salts),
        ),
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [key, "_salt"], how).drop("_salt")
