"""Unit tests for operators/behavior.py — ordered funnel, cohort
retention, transition matrix — on hand-computed fixtures, plus the
funnel's one-shuffle plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import behavior as bh

US_DAY = bh.US_PER_DAY


@pytest.fixture(scope="module")
def events(spark):
    # (event_id, user, ts_us, type)
    rows = [
        # user 1 completes the funnel in order
        (1, 1, 100, "signup"),
        (2, 1, 200, "view"),
        (3, 1, 300, "click"),
        (4, 1, 400, "purchase"),
        # user 2: purchase BEFORE click -> stops at view
        (5, 2, 100, "signup"),
        (6, 2, 200, "view"),
        (7, 2, 250, "purchase"),
        (8, 2, 300, "click"),
        # user 3: never signs up -> counts for nothing
        (9, 3, 100, "view"),
        (10, 3, 200, "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    )


class TestFunnel:
    def test_ordered_prefix_semantics(self, events):
        out = {r["step"]: r for r in bh.funnel_steps(
            events, "user_id", "ts_us", "event_type",
            ["signup", "view", "click", "purchase"]).collect()}
        assert out["signup"]["n_users"] == 2
        assert out["view"]["n_users"] == 2
        assert out["click"]["n_users"] == 2   # user 2's click at 300 > view at 200
        # user 2 has no purchase after the click -> only user 1 converts
        assert out["purchase"]["n_users"] == 1
        assert out["purchase"]["conversion"] == 0.5
        assert out["signup"]["conversion"] == 1.0

    def test_out_of_order_event_not_counted(self, events):
        # user 2's purchase(250) precedes click(300): strict ordering
        # must not credit it, even though both events exist.
        out = {r["step"]: r["n_users"] for r in bh.funnel_steps(
            events.filter(F.col("user_id") == 2),
            "user_id", "ts_us", "event_type",
            ["signup", "view", "click", "purchase"]).collect()}
        assert out["click"] == 1 and out["purchase"] == 0

    def test_single_hash_shuffle(self, events):
        plan = (
            bh.funnel_steps(events, "user_id", "ts_us", "event_type",
                            ["signup", "view", "click", "purchase"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # chained windows share the user partitioning: exactly one
        # hash exchange (plus the final single-partition 1-row agg)
        assert plan.count("Exchange hashpartitioning") == 1


class TestRetention:
    def test_triangle(self, spark):
        rows = [
            (1, 0 * US_DAY + 5), (1, 0 * US_DAY + 9), (1, 2 * US_DAY),
            (2, 0 * US_DAY), (2, 1 * US_DAY),
            (3, 2 * US_DAY),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts_us long")
        out = {(r["cohort_day"], r["day_offset"]): r["n_active"]
               for r in bh.cohort_retention(df, "user_id", "ts_us").collect()}
        assert out[(0, 0)] == 2          # users 1+2 first seen day 0
        assert out[(0, 1)] == 1          # user 2 back on day 1
        assert out[(0, 2)] == 1          # user 1 back on day 2
        assert out[(2, 0)] == 1          # user 3's own cohort
        # same-day duplicate activity (user 1 twice on day 0) counts once
        assert sum(v for (c, o), v in out.items() if c == 0 and o == 0) == 2

    def test_cohort_date_rendering(self, spark):
        df = spark.createDataFrame([(1, 19723 * US_DAY)], "user_id long, ts_us long")
        r = bh.cohort_retention(df, "user_id", "ts_us").collect()[0]
        assert r["cohort_date"] == "2024-01-01"  # 19723 days after epoch


class TestTransitions:
    def test_counts_and_tiebreak(self, events):
        out = {(r["from_type"], r["to_type"]): r["n_transitions"]
               for r in bh.transition_matrix(
                   events, "user_id", "ts_us", "event_type", "event_id"
               ).collect()}
        # user1: s->v->c->p; user2: s->v->p->c; user3: v->c
        assert out[("signup", "view")] == 2
        assert out[("view", "click")] == 2
        assert out[("click", "purchase")] == 1
        assert out[("view", "purchase")] == 1
        assert out[("purchase", "click")] == 1
        assert sum(out.values()) == 7  # n_events - n_users


class TestWindowedFunnel:
    def test_step_outside_window_not_counted(self, spark):
        rows = [
            (1, 1, 0, "signup"),
            (2, 1, 100, "view"),
            (3, 1, 10_000_000, "click"),     # 9.9999s after view
            (4, 2, 0, "signup"),
            (5, 2, 100, "view"),
            (6, 2, 60_000_000, "click"),     # ~60s after view: outside 10s
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts_us long, event_type string")
        out = {r["step"]: r["n_users"] for r in bh.funnel_steps(
            df, "user_id", "ts_us", "event_type",
            ["signup", "view", "click"], within_us=10_000_000).collect()}
        assert out["signup"] == 2 and out["view"] == 2
        assert out["click"] == 1  # user 2's click arrived too late

    def test_no_window_keeps_old_semantics(self, spark):
        rows = [(1, 1, 0, "signup"), (2, 1, 10**12, "view")]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts_us long, event_type string")
        out = {r["step"]: r["n_users"] for r in bh.funnel_steps(
            df, "user_id", "ts_us", "event_type", ["signup", "view"]).collect()}
        assert out["view"] == 1
