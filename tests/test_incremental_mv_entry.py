"""incremental_mv_parity protocol non-degeneracy: the catalog entry is
only evidence of correct incremental maintenance if (a) the base load
really spans several months (carry-over path exercised) and (b) the
held-out delta month really has rows (the incremental recompute path
exercised). The DuckDB oracle checks the VALUES; these tests pin the
protocol itself so a corpus change can't silently degenerate it."""

from __future__ import annotations

from pyspark.sql import functions as F

from power_generation_etl_spark.plans.lakehouse_queries import (
    incremental_mv_parity,
    mv_facts_from_orders,
)


def test_protocol_non_degenerate(spark, sf_dir):
    facts = mv_facts_from_orders(spark, sf_dir)
    per_month = facts.groupBy("_m").count().collect()
    months = sorted(r["_m"] for r in per_month)
    assert len(months) >= 2, "need >=2 months for a real carry-over"
    counts = {r["_m"]: r["count"] for r in per_month}
    assert counts[months[-1]] > 0  # delta month non-empty
    assert sum(counts[m] for m in months[:-1]) > 0  # base non-empty


def test_incremental_equals_full_recompute(spark, sf_dir):
    """The entry (full-then-incremental maintenance) must equal a plain
    one-shot aggregation of every fact row — the Spark-side restatement
    of the oracle, so a deliberate carry-over mutation here fails even
    without DuckDB."""
    got = incremental_mv_parity(spark, sf_dir)
    want = (
        mv_facts_from_orders(spark, sf_dir)
        .groupBy(
            F.date_format(
                F.timestamp_millis(F.col("timestamp_ms")), "yyyy-MM-01"
            ).alias("month"),
            "fuel_type",
        )
        .agg(F.round(F.sum("generation_mwh"), 2).alias("total_mwh"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
