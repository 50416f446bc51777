"""Z-order clustering: Morton key correctness and the file-skipping
property it exists for — after z-ordering, a selective filter on the
NON-leading column overlaps far fewer files than the lexicographic
layout, where every file spans the full secondary range."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.store import TableStore, morton_key


def _py_morton(vals: list[int], bits: int) -> int:
    key = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * n + j)
    return key


def _file_ranges(table_dir: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(f"{table_dir}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _overlapping(ranges: list[tuple[int, int]], lo: int, hi: int) -> int:
    return sum(1 for mn, mx in ranges if mx >= lo and mn <= hi)


class TestMortonKey:
    def test_interleave_matches_reference(self, spark):
        # values span [0, 4]; with bits=2 normalization maps
        # v -> min(floor(v * 4/4), 3) = min(v, 3)
        rows = [(x, y) for x in range(5) for y in range(5)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = df.select("x", "y", morton_key(df, ["x", "y"], bits=2)
                        .alias("k")).collect()
        for r in got:
            nx, ny = min(r["x"], 3), min(r["y"], 3)
            assert r["k"] == _py_morton([nx, ny], 2), (r["x"], r["y"])

    def test_constant_column_contributes_zero(self, spark):
        df = spark.createDataFrame([(1, 7), (2, 7)], "x long, y long")
        ks = {r["x"]: r["k"] for r in df.select(
            "x", morton_key(df, ["x", "y"], bits=4).alias("k")).collect()}
        # y is constant -> its bits are all zero; key orders by x alone
        assert ks[1] < ks[2]


class TestZorderLayout:
    @pytest.fixture(scope="class")
    def layouts(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("wh")
        grid = [(x, y) for x in range(64) for y in range(64)]

        dirs = {}
        for mode, zo in [("lex", False), ("z", True)]:
            store = TableStore(spark, str(root / mode))
            df = spark.createDataFrame(grid, "x long, y long")
            store.append("grid", df)
            store.cluster("grid", ["x", "y"], zorder=zo, n_files=16)
            dirs[mode] = store.path("grid")
        return dirs

    def test_zorder_skips_on_secondary_column(self, layouts):
        lex_y = _file_ranges(layouts["lex"], "y")
        z_y = _file_ranges(layouts["z"], "y")
        # narrow band on y (the non-leading column)
        lex_hit = _overlapping(lex_y, 8, 11)
        z_hit = _overlapping(z_y, 8, 11)
        # lexicographic files each span ~all of y; z-order files are
        # compact rectangles — at least 2x fewer files touched
        assert lex_hit >= 12, (lex_hit, lex_y)
        assert z_hit * 2 <= lex_hit, (z_hit, lex_hit)

    def test_both_layouts_skip_on_leading_column(self, layouts):
        lex_x = _file_ranges(layouts["lex"], "x")
        z_x = _file_ranges(layouts["z"], "x")
        assert _overlapping(lex_x, 8, 11) <= 4
        # z-order trades a little leading-column selectivity, but must
        # still skip most files
        assert _overlapping(z_x, 8, 11) <= 8

    def test_no_rows_lost(self, spark, layouts):
        for d in layouts.values():
            assert spark.read.parquet(d).count() == 64 * 64


class TestEquidepth:
    def test_skewed_column_spreads_across_buckets(self, spark):
        # 90% of x mass at tiny values, a long tail to 1e6: equi-width
        # normalization crams the mass into bucket 0; equi-depth spreads it.
        rows = [(i % 100, i) for i in range(900)] + [
            (1_000_000 - i, i + 900) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "x long, y long")

        def n_distinct_buckets(equidepth: bool) -> int:
            k = morton_key(df, ["x", "y"], bits=8, equidepth=equidepth)
            # unweave x's bits (even positions) back out of the key
            xs = set()
            for r in df.select(k.alias("k")).collect():
                xb = 0
                for i in range(8):
                    xb |= ((r["k"] >> (2 * i)) & 1) << i
                xs.add(xb)
            return len(xs)

        width = n_distinct_buckets(False)
        depth = n_distinct_buckets(True)
        # equi-width: dense head collapses into very few x-buckets
        assert width <= 4, width
        # equi-depth: the same head spreads over many rank buckets
        assert depth >= 32, depth


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        from power_generation_etl_spark.store import TableStore

        store = TableStore(spark, str(tmp_path / "wh"))
        left = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS a")
        right = spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS b")
        store.write_bucketed("t_bleft", left, ["k"], n_buckets=8)
        store.write_bucketed("t_bright", right, ["k"], n_buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = store.read_bucketed("t_bleft").join(
                store.read_bucketed("t_bright"), "k"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 2000
            # un-bucketed twin of the same join DOES shuffle
            shuffled = left.join(right, "k")
            plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_bleft")
            spark.sql("DROP TABLE IF EXISTS t_bright")

    def test_bucketed_rows_roundtrip(self, spark, tmp_path):
        from power_generation_etl_spark.store import TableStore

        store = TableStore(spark, str(tmp_path / "wh"))
        df = spark.range(0, 100).selectExpr("id AS k", "id % 7 AS v")
        store.write_bucketed("t_bround", df, ["k"], n_buckets=4)
        try:
            got = store.read_bucketed("t_bround")
            assert got.count() == 100
            assert got.agg({"v": "sum"}).collect()[0][0] == sum(i % 7 for i in range(100))
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bround")
