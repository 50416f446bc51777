"""Distributed two-pass global rank (operators/rank.py) — must be
bit-identical to `row_number()/ntile() OVER (ORDER BY ...)` while
never compiling to an unpartitioned Window over the input."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from power_generation_etl_spark.operators.rank import (
    ntile_of_rank,
    with_global_rank,
)


@pytest.fixture(scope="module")
def data(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 997)) for i in range(20_000)]
    return spark.createDataFrame(rows, "id bigint, v bigint").repartition(13)


def test_rank_matches_row_number(data):
    r = with_global_rank(data, [F.col("v").desc(), F.col("id")], total_col="t")
    got = {x["id"]: (x["rank"], x["t"]) for x in r.collect()}
    w = Window.orderBy(F.col("v").desc(), "id")
    exp = {
        x["id"]: x["rn"]
        for x in data.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert all(got[i] == (exp[i], 20_000) for i in got)


@pytest.mark.parametrize("n", [1, 4, 7, 19_999, 50_000])
def test_ntile_matches_window_ntile(data, n):
    r = with_global_rank(data, [F.col("v"), F.col("id")], total_col="t")
    got = {
        x["id"]: x["b"]
        for x in r.select(
            "id", ntile_of_rank(F.col("rank"), F.col("t"), n).alias("b")
        ).collect()
    }
    w = Window.orderBy("v", "id")
    exp = {
        x["id"]: x["nt"]
        for x in data.select("id", F.ntile(n).over(w).alias("nt")).collect()
    }
    assert got == exp


def test_empty_input_keeps_schema(data):
    emp = with_global_rank(
        data.where(F.lit(False)), [F.col("v")], total_col="t"
    )
    assert emp.count() == 0
    assert emp.columns == ["id", "v", "rank", "t"]


def test_plan_has_no_global_window(data):
    r = with_global_rank(data, [F.col("v"), F.col("id")])
    nodes = json.loads(r._jdf.queryExecution().optimizedPlan().toJSON())
    for nd in nodes:
        if nd.get("class", "").endswith(".Window"):
            assert nd.get("partitionSpec") != [], "rank compiled to a global window"


def test_running_sum_matches_window(data):
    from power_generation_etl_spark.operators.rank import with_running_sum

    r = with_running_sum(
        data, [F.col("v"), F.col("id")], F.col("v") + 1, out_col="rs"
    )
    got = {x["id"]: x["rs"] for x in r.collect()}
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exp = {
        x["id"]: x["rs"]
        for x in data.select(
            "id", F.sum(F.col("v") + 1).over(w).alias("rs")
        ).collect()
    }
    assert got == exp


def test_running_sum_empty_input(data):
    from power_generation_etl_spark.operators.rank import with_running_sum

    emp = with_running_sum(
        data.where(F.lit(False)), [F.col("v")], F.col("v"), out_col="rs"
    )
    assert emp.count() == 0
    assert emp.columns == ["id", "v", "rs"]
