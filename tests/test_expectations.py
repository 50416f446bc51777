"""Unit tests for the single-pass expectations suite
(operators/expectations.py): metric semantics, pass/fail banding,
NULL-metric failure on empty input, and the generated-oracle
consistency contract."""

from __future__ import annotations

import duckdb

from power_generation_etl_spark.operators.expectations import PPM, Suite


def _report(df):
    return {r["check_name"]: (r["metric"], r["passed"]) for r in df.collect()}


class TestSuite:
    def test_metrics_and_bands(self, spark):
        rows = [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, None, 30.0),
            (3, "a", 40.0),  # duplicate id
        ]
        df = spark.createDataFrame(rows, "id long, tag string, v double")
        suite = (
            Suite()
            .size_at_least(4)
            .completeness("tag")          # 3/4 = 750000 ppm -> fails
            .uniqueness("id")             # 3 distinct / 4 -> fails
            .values_in("tag", ["a", "b"])  # NULL row not counted -> 750000
            .min_scaled_between("v", 1000, 2000, scale=100)
            .max_scaled_between("v", 0, 3000, scale=100)  # 4000 -> fails
            .mean_scaled_between("v", 2500, 2500, scale=100)  # mean 25.0
        )
        rep = _report(suite.run(df))
        assert rep["size_at_least"] == (4, 1)
        assert rep["completeness_tag"] == (750_000, 0)
        assert rep["uniqueness_id"] == (750_000, 0)
        assert rep["values_in_tag"] == (750_000, 0)
        assert rep["min_v"] == (1000, 1)
        assert rep["max_v"] == (4000, 0)
        assert rep["mean_v"] == (2500, 1)

    def test_empty_input_all_fail_null_metrics(self, spark):
        df = spark.createDataFrame([], "id long, tag string, v double")
        suite = (
            Suite()
            .size_at_least(1)
            .completeness("tag")
            .min_scaled_between("v", 0, 10)
        )
        rep = _report(suite.run(df))
        assert rep["size_at_least"] == (0, 0)
        # ppm over zero rows and min of nothing are NULL -> fail, not crash
        assert rep["completeness_tag"] == (None, 0)
        assert rep["min_v"] == (None, 0)

    def test_ppm_matches_exact_rational(self, spark):
        """The staged ×100 long division equals floor(n·1e6/d) on
        awkward fractions (1/3, 2/3, 1/7)."""
        for n, d in [(1, 3), (2, 3), (1, 7), (999_999, 1_000_000)]:
            rows = [(i, "x" if i < n else None) for i in range(d)]
            df = spark.createDataFrame(rows, "id long, tag string")
            rep = _report(Suite().completeness("tag", at_least_ppm=0).run(df))
            assert rep["completeness_tag"][0] == n * PPM // d

    def test_generated_oracle_agrees(self, spark, tmp_path):
        """Suite.run on Spark == Suite.oracle_sql on DuckDB over the
        same parquet — the generation contract, probed directly."""
        rows = [(i, "t" if i % 3 else None, float(i)) for i in range(50)]
        df = spark.createDataFrame(rows, "id long, tag string, v double")
        p = str(tmp_path / "t.parquet")
        df.coalesce(1).write.parquet(p)
        suite = (
            Suite()
            .size_at_least(10)
            .completeness("tag")
            .uniqueness("id")
            .mean_scaled_between("v", 0, 10_000, scale=100)
        )
        got = sorted(
            (r["check_name"], r["metric"], r["passed"])
            for r in suite.run(spark.read.parquet(p)).collect()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
        want = sorted(map(tuple, con.execute(suite.oracle_sql("t")).fetchall()))
        assert got == want


class TestGroupedSuite:
    def test_grouped_localizes_violation(self, spark):
        """A duplicate id in ONE group fails uniqueness there and only
        there — the property that makes the grouped report useful."""
        rows = [
            ("s1", 1, "a"), ("s1", 2, "b"),
            ("s2", 3, "c"), ("s2", 3, "d"),  # dup id in s2 only
        ]
        df = spark.createDataFrame(rows, "src string, id long, tag string")
        rep = {
            (r["grp"], r["check_name"]): (r["metric"], r["passed"])
            for r in Suite().uniqueness("id").run_grouped(df, "src").collect()
        }
        assert rep[("s1", "uniqueness_id")] == (PPM, 1)
        assert rep[("s2", "uniqueness_id")] == (500_000, 0)

    def test_grouped_oracle_agrees(self, spark, tmp_path):
        rows = [(f"s{i % 3}", i, "x" if i % 4 else None) for i in range(60)]
        df = spark.createDataFrame(rows, "src string, id long, tag string")
        p = str(tmp_path / "g.parquet")
        df.coalesce(1).write.parquet(p)
        suite = Suite().size_at_least(10).completeness("tag").uniqueness("id")
        got = sorted(
            map(tuple, suite.run_grouped(spark.read.parquet(p), "src").collect())
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW g AS SELECT * FROM '{p}/*.parquet'")
        want = sorted(
            map(tuple, con.execute(suite.oracle_grouped_sql("g", "src")).fetchall())
        )
        assert got == want
