"""cogroup_activity (cogrouped-map Pandas kernel) edge semantics the
oracle exercises only statistically: events-only keys, orders-only
keys, and the STRICT after-last-order boundary."""

from __future__ import annotations

from power_generation_etl_spark.operators.grouped import cogroup_activity


def _frames(spark):
    o = spark.createDataFrame(
        [(1, 100, 500), (1, 200, 700), (3, 50, 1000)],
        "k long, oday long, cents long",
    )
    e = spark.createDataFrame(
        [(1, 200), (1, 201), (1, 199), (2, 10), (2, 11)],
        "ke long, eday long",
    )
    return o, e


def test_outer_edges_and_strict_boundary(spark):
    o, e = _frames(spark)
    got = {
        r["user_id"]: (
            r["n_orders"], r["cents_spent"], r["n_events"],
            r["events_after_last_order"],
        )
        for r in cogroup_activity(o, e, "k", "ke", "oday", "eday", "cents").collect()
    }
    # key 1: last order day 200; events on 199/200/201 → only 201 is
    # strictly after (the ==200 event must NOT count)
    assert got[1] == (2, 1200, 3, 1)
    # key 2: events only → all events count as after
    assert got[2] == (0, 0, 2, 2)
    # key 3: orders only → zero events
    assert got[3] == (1, 1000, 0, 0)
