"""Temporal operators (as-of join, bucketed range join, batch
sessionize) and connected components — hand-built frames with known
answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from power_generation_etl_spark.operators.graph import connected_components
from power_generation_etl_spark.operators import temporal as tmp


class TestAsofJoin:
    def test_backward_asof_semantics(self, spark):
        left = spark.createDataFrame(
            [(1, "u1", 100), (2, "u1", 200), (3, "u2", 150), (4, "u3", 50)],
            ["event_id", "user", "ts"],
        )
        right = spark.createDataFrame(
            [("u1", 90, 9.0), ("u1", 150, 15.0), ("u1", 200, 20.0), ("u2", 160, 16.0)],
            ["user", "rts", "val"],
        )
        out = {
            r["event_id"]: (r["val"], r["_matched_ts"])
            for r in tmp.asof_join(
                left, right, on="user", left_ts="ts", right_ts="rts",
                payload_cols=["val"],
            ).collect()
        }
        assert out[1] == (9.0, 90)       # most recent prior
        assert out[2] == (20.0, 200)     # tie at-or-before: right row included
        assert out[3] == (None, None)    # u2's only right row is later
        assert out[4] == (None, None)    # no right rows for u3

    def test_row_count_preserved(self, spark):
        left = spark.createDataFrame(
            [(i, "u", i * 10) for i in range(50)], ["event_id", "user", "ts"]
        )
        right = spark.createDataFrame([("u", 95, 1.0)], ["user", "rts", "val"])
        out = tmp.asof_join(
            left, right, on="user", left_ts="ts", right_ts="rts", payload_cols=["val"]
        )
        assert out.count() == 50
        matched = out.filter(F.col("val").isNotNull()).count()
        assert matched == 40  # ts >= 95 → events 10..49


class TestBucketedRangeJoin:
    def test_window_membership_exact(self, spark):
        probe = spark.createDataFrame(
            [(1, "k", 1000), (2, "k", 5000)], ["pid", "key", "ts"]
        )
        build = spark.createDataFrame(
            [("k", 1000), ("k", 1001), ("k", 1999), ("k", 2000), ("k", 2001),
             ("k", 5500), ("x", 1500)],
            ["key", "bts"],
        )
        out = tmp.bucketed_range_join(
            probe, build, on="key", probe_ts="ts", build_ts="bts", window_sec=1000
        )
        got = sorted((r["pid"], r["bts"]) for r in out.collect())
        # (ts, ts+1000]: strict lower, inclusive upper; key must match
        assert got == [(1, 1001), (1, 1999), (1, 2000), (2, 5500)]


class TestSessionize:
    def test_gap_splits(self, spark):
        df = spark.createDataFrame(
            [("u", 0), ("u", 100), ("u", 5000), ("u", 5050), ("v", 0)],
            ["user", "ts"],
        )
        out = {
            (r["user"], r["ts"]): r["session_id"]
            for r in tmp.sessionize(df, key="user", ts="ts", gap_sec=1000).collect()
        }
        assert out[("u", 0)] == 0 and out[("u", 100)] == 0
        assert out[("u", 5000)] == 1 and out[("u", 5050)] == 1
        assert out[("v", 0)] == 0


class TestConnectedComponents:
    def test_chain_and_isolated_pair(self, spark):
        # chain 1-2-3-4 (transitive), pair 10-11, pair 20-21
        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], ["src", "dst"]
        )
        got = {
            r["id"]: r["component"] for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_long_path_converges(self, spark):
        n = 12  # diameter > a couple of rounds: 0-1-2-...-11
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
        )
        got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {i: 0 for i in range(n)}

    def test_huge_ids_converge_exactly(self, spark):
        # r11: convergence is detected by a decimal(38,0) label sum
        # (labels are element-wise non-increasing). Node ids near 2^62
        # would overflow a BIGINT sum after 2 rows — the decimal probe
        # must stay exact and still detect the fixpoint.
        big = 1 << 62
        edges = spark.createDataFrame(
            [(big, big + 1), (big + 1, big + 2), (7, 8)], ["src", "dst"]
        )
        got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {big: big, big + 1: big, big + 2: big, 7: 7, 8: 7}


class TestStarConnectedComponents:
    """large-star/small-star (the high-diameter scale path) must produce
    the identical labeling as min-label propagation."""

    def test_chain_and_isolated_pair(self, spark):
        from power_generation_etl_spark.operators.graph import (
            connected_components_star,
        )

        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], ["src", "dst"]
        )
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_long_path_few_rounds(self, spark):
        from power_generation_etl_spark.operators.graph import (
            connected_components_star,
        )

        # diameter-40 path: propagation needs ~40 rounds; star converges
        # within the default 20 (O(log^2 n))
        n = 41
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
        )
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(edges, max_iters=10).collect()
        }
        assert got == {i: 0 for i in range(n)}

    def test_matches_propagation_on_random_graph(self, spark):
        import random

        from power_generation_etl_spark.operators.graph import (
            connected_components_star,
        )

        rng = random.Random(13)
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(45)
        ]
        df = spark.createDataFrame(edges, ["src", "dst"])
        a = {r["id"]: r["component"] for r in connected_components(df).collect()}
        b = {
            r["id"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        assert a == b


class TestPlanShapes:
    """Plan-shape guardrails: these operators are only scale-safe if
    Catalyst picks the intended physical strategy."""

    def test_range_join_is_hash_join_not_bnlj(self, spark, sf_dir):
        from power_generation_etl_spark.plans import QUERIES

        plan = (
            QUERIES["range_join_error_clicks"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan  # bucket key makes it an equi-join
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_fixup_chain_scan_prunes_columns(self, spark, sf_dir):
        from power_generation_etl_spark.plans import QUERIES

        plan = (
            QUERIES["entsoe_fixup_chain"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        # only the three raw inputs are read; the wide orders table is pruned
        assert "o_orderkey" in scan and "o_custkey" in scan and "o_orderpriority" in scan
        assert "o_totalprice" not in scan and "o_orderdate" not in scan


def test_asof_payload_collision_rejected(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, "u", 10, 0.0)], ["event_id", "user", "ts", "val"])
    right = spark.createDataFrame([("u", 5, 1.0)], ["user", "rts", "val"])
    with _pytest.raises(ValueError, match="collide"):
        tmp.asof_join(left, right, on="user", left_ts="ts", right_ts="rts",
                      payload_cols=["val"])
