"""Exact positional quantile selection (operators/selection.py) —
histogram-refinement quickselect must match the sort-based positional
definition exactly, including duplicates, narrow ranges, and small
bucket counts that force multiple refinement levels."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators.selection import (
    exact_deciles,
    value_at_ranks,
)


@pytest.fixture(scope="module")
def data(spark):
    random.seed(11)
    # Heavy duplication + a wide outlier tail: stresses tie handling
    # and interval narrowing.
    rows = [(i, random.choice([5, 5, 5, 7, 100, 1000, 10**9])) for i in range(5000)]
    rows += [(5000 + i, random.randint(-(10**6), 10**6)) for i in range(5000)]
    return spark.createDataFrame(rows, "id bigint, v bigint")


def _sorted_vals(data):
    return sorted(r["v"] for r in data.collect())


def test_value_at_ranks_matches_sort(data):
    sv = _sorted_vals(data)
    ranks = [1, 2, 777, 5000, 9999, len(sv)]
    got = value_at_ranks(data, "v", ranks)
    assert got == {k: sv[k - 1] for k in ranks}


def test_small_buckets_force_levels(data):
    sv = _sorted_vals(data)
    got = value_at_ranks(data, "v", [123, 4567], buckets=16)
    assert got == {123: sv[122], 4567: sv[4566]}


def test_out_of_range_ranks_omitted(data):
    got = value_at_ranks(data, "v", [0, -5, 10**9])
    assert got == {}


def test_exact_deciles_match_window(data, spark):
    sv = _sorted_vals(data)
    n = len(sv)
    exp = [(t, sv[(t * n + 9) // 10 - 1]) for t in range(1, 10)]
    got = [(r["tile"], r["value"]) for r in exact_deciles(data, "v").collect()]
    assert got == exp


def test_empty_input(data):
    emp = exact_deciles(data.where(F.lit(False)), "v")
    assert emp.count() == 0
    assert emp.columns == ["tile", "value"]
