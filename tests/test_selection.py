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


def test_huge_range_exact_integer_cells(spark):
    """Values with a spread far beyond 2^53: a float-divided cell index
    ((v-lo)/step rounded to double) can land ranks one cell off the
    driver's exact integer boundaries. The integer `div` path must
    still match the sort-based definition bit-for-bit — including
    adjacent values (2^62, 2^62+1) that a double cannot distinguish."""
    base = 2**62
    neg = -(2**61)  # keep max - min < 2^63 (the documented bound)
    vals = [neg, -7, 0, 1, base - 1, base, base + 1, base + 2]
    random.seed(7)
    vals += [random.randint(neg, base) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v bigint"
    )
    sv = sorted(vals)
    ranks = [1, 2, 250, len(sv) - 1, len(sv)]
    assert value_at_ranks(df, "v", ranks, buckets=16) == {
        k: sv[k - 1] for k in ranks
    }


def test_full_range_rejected(spark):
    """max - min >= 2^63 would overflow v - lo executor-side; the
    documented guard raises instead of silently wrapping."""
    df = spark.createDataFrame(
        [(0, -(2**63)), (1, 2**63 - 1)], "id bigint, v bigint"
    )
    with pytest.raises(ValueError, match="2\\^63"):
        value_at_ranks(df, "v", [1])


class TestBM25:
    def test_hand_computed_scores(self, spark):
        import math

        from power_generation_etl_spark.operators.text import bm25_scores

        docs = spark.createDataFrame(
            [
                (1, "cat dog cat"),
                (2, "dog dog dog dog"),
                (3, "bird"),
                (4, None),
            ],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(docs, "doc_id", "text", ["cat", "dog"]).collect()
        }
        # N=3 (non-null), S=8 tokens, df_cat=1, df_dog=2
        n, s = 3, 8
        idf_cat = math.log((n + 1) / (1 + 0.5))
        idf_dog = math.log((n + 1) / (2 + 0.5))

        def s_t(tf, dl):
            return (44 * s * tf) / (20 * s * tf + 6 * s + 18 * dl * n)

        exp = {
            1: idf_cat * s_t(2, 3) + idf_dog * s_t(1, 3),
            2: idf_dog * s_t(4, 4),
        }
        assert set(got) == {1, 2}  # doc 3 matches nothing, doc 4 is NULL
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-12)

    def test_empty_corpus(self, spark):
        from power_generation_etl_spark.operators.text import bm25_scores

        docs = spark.createDataFrame([], "doc_id bigint, text string")
        out = bm25_scores(docs, "doc_id", "text", ["cat"])
        assert out.count() == 0
        assert out.columns == ["doc_id", "score"]

    def test_empty_corpus_string_id_keeps_schema(self, spark):
        """The empty path must carry the INPUT id type — a hardcoded
        bigint would diverge from the normal path's schema for
        string-typed ids and break empty-input unions downstream."""
        from power_generation_etl_spark.operators.text import bm25_scores

        docs = spark.createDataFrame([], "doc_id string, text string")
        out = bm25_scores(docs, "doc_id", "text", ["cat"])
        assert out.count() == 0
        full = bm25_scores(
            spark.createDataFrame([("a", "cat sat")], "doc_id string, text string"),
            "doc_id",
            "text",
            ["cat"],
        )
        assert [f.dataType for f in out.schema.fields] == [
            f.dataType for f in full.schema.fields
        ]


class TestPlanCheck:
    def test_clean_plan_ok(self, spark, sf_dir):
        from power_generation_etl_spark.plancheck import check_plan
        from power_generation_etl_spark.plans import QUERIES

        rep = check_plan(QUERIES["pricing_summary"](spark, sf_dir))
        assert rep.ok
        assert rep.scans >= 1
        assert rep.global_windows == 0

    def test_global_window_flagged(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from power_generation_etl_spark.plancheck import check_plan

        df = spark.range(100).select(
            F.row_number().over(Window.orderBy("id")).alias("r")
        )
        rep = check_plan(df)
        assert rep.global_windows == 1
        assert not rep.ok
        assert "unpartitioned Window" in rep.warnings[0]

    def test_cartesian_flagged(self, spark):
        from power_generation_etl_spark.plancheck import check_plan

        a, b = spark.range(10), spark.range(10)
        rep = check_plan(a.crossJoin(b))
        assert rep.cartesians + rep.nested_loop_joins >= 1
        assert not rep.ok

    def test_bigtable_broadcast_flagged(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from power_generation_etl_spark.plancheck import (
            bigtable_broadcasts,
            check_plan,
        )

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        # Raw sf-proportional table under a hard hint: flagged even
        # through a filter (filters don't bound size asymptotically).
        bad = o.join(
            F.broadcast(c.where(F.col("c_acctbal") > 0)),
            o.o_custkey == c.c_custkey,
        )
        assert bigtable_broadcasts(bad) == ["customer"]
        rep = check_plan(bad)
        assert any("sf-proportional" in w for w in rep.warnings)

    def test_bounded_broadcast_not_flagged(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from power_generation_etl_spark.plancheck import bigtable_broadcasts

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        n = spark.read.parquet(f"{sf_dir}/nation.parquet")
        # Aggregated sub-result of a big table: bounded, hint allowed.
        top = c.groupBy("c_nationkey").agg(F.count("*").alias("n"))
        ok1 = o.join(F.broadcast(top), o.o_custkey == top.c_nationkey)
        assert bigtable_broadcasts(ok1) == []
        # Constant-cardinality dim: allowed.
        ok2 = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        assert bigtable_broadcasts(ok2) == []
        # limit() bounds too.
        ok3 = o.join(F.broadcast(c.limit(10)), o.o_custkey == c.c_custkey)
        assert bigtable_broadcasts(ok3) == []

    def test_single_partition_exchange_flagged(self, spark):
        from pyspark.sql import functions as F

        from power_generation_etl_spark.plancheck import check_plan

        # repartition(1) funnels row-scale data through one task.
        rep = check_plan(spark.range(1000).repartition(1))
        assert rep.single_partition_exchanges >= 1
        assert any("SinglePartition" in w for w in rep.warnings)
        # The final exchange of a global (no-group-key) aggregate is
        # the benign form: one input row per upstream partition.
        rep2 = check_plan(spark.range(1000).agg(F.sum("id")))
        assert not any("SinglePartition" in w for w in rep2.warnings)
