"""The pluggable lineage-cut strategy (lineage.py) is semantically the
identity: every mode must give identical results on iterative
operators. `local` is the default everywhere else in the suite; here
each mode runs the same fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark import lineage


def _cc_result(spark):
    from power_generation_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], "src bigint, dst bigint"
    )
    return sorted(
        (r["id"], r["component"])
        for r in connected_components(edges).collect()
    )


def _lrs_result(spark):
    from power_generation_etl_spark.operators.suffix import (
        longest_repeated_substrings,
    )

    run = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, run + " x y"), (2, "pad " + run)], "doc_id bigint, text string"
    )
    return [
        tuple(r)
        for r in longest_repeated_substrings(df, "doc_id", "text", top=5).collect()
    ]


def _rank_result(spark):
    from power_generation_etl_spark.operators.rank import with_global_rank

    df = spark.range(100).select(
        (F.col("id") * 37 % 100).alias("k"), "id"
    )
    out = with_global_rank(df, [F.col("k"), F.col("id")], rank_col="r")
    return sorted((r["k"], r["id"], r["r"]) for r in out.collect())


def _lpa_result(spark):
    from power_generation_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "u bigint, v bigint",
    )
    return sorted(
        (r["id"], r["lab"])
        for r in label_propagation(edges, "u", "v", rounds=3).collect()
    )


def _pagerank_result(spark):
    from power_generation_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)], "src bigint, dst bigint"
    )
    return sorted(
        (r["id"], r["rank_scaled"])
        for r in pagerank(edges, iters=3).collect()
    )


class TestLineageModes:
    def test_invalid_mode_rejected(self, monkeypatch):
        monkeypatch.setenv("SPARK_ETL_LINEAGE_CUT", "bogus")
        with pytest.raises(ValueError):
            lineage.mode()

    @pytest.mark.parametrize(
        "fixture",
        [_cc_result, _lrs_result, _rank_result, _lpa_result, _pagerank_result],
    )
    def test_modes_identical(self, spark, monkeypatch, fixture):
        # suffix products must not be reused across modes — the point
        # is to rebuild under each strategy.
        monkeypatch.setenv("SPARK_ETL_SUFFIX_CACHE", "0")
        results = {}
        for m in ("local", "persist", "checkpoint"):
            monkeypatch.setenv("SPARK_ETL_LINEAGE_CUT", m)
            results[m] = fixture(spark)
        assert results["local"] == results["persist"] == results["checkpoint"]
