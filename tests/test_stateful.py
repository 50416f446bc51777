"""Skew-salted aggregation and custom stateful streaming operators."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators.skew import salted_sum_count
from power_generation_etl_spark.streaming.stateful import sessionize, streaming_dedup


def test_salted_sum_matches_plain_groupby(spark, sf_dir):
    from power_generation_etl_spark.plans.queries import T

    ev = T(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (round(r["total"], 4), r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["event_type"]: (round(r["total"], 4), r["_count"])
        for r in salted_sum_count(
            ev, ["event_type"], {"total": F.col("value")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows1 = [
        {"ts": "2024-01-01T00:00:00", "k": "a", "v": 1.0},
        {"ts": "2024-01-01T00:01:00", "k": "b", "v": 2.0},
        {"ts": "2024-01-01T00:02:00", "k": "a", "v": 99.0},  # dup within batch
    ]
    with open(src / "1.jsonl", "w") as f:
        for r in rows1:
            f.write(json.dumps(r) + "\n")

    out = str(tmp_path / "out")

    def run_pass():
        q = (
            streaming_dedup(
                spark.readStream.schema("ts timestamp, k string, v double").json(
                    str(src)
                ),
                ["k"],
                "ts",
                watermark="1 hour",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    got = {r["k"] for r in spark.read.parquet(out).collect()}
    assert got == {"a", "b"}  # in-batch dup dropped

    # Second micro-batch via checkpoint resume: duplicate key within the
    # watermark window is suppressed by state; only the new key lands.
    with open(src / "2.jsonl", "w") as f:
        f.write(json.dumps({"ts": "2024-01-01T00:30:00", "k": "a", "v": 7.0}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01T00:31:00", "k": "c", "v": 3.0}) + "\n")
    run_pass()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3 and {r["k"] for r in rows} == {"a", "b", "c"}


def test_sessionize_emits_on_timeout(spark, tmp_path):
    src = tmp_path / "sess"
    src.mkdir()
    # Burst of activity for user 1, then a much later event that pushes
    # the watermark beyond start-session + gap → session emitted.
    with open(src / "1.jsonl", "w") as f:
        for minute, v in [(0, 1.0), (5, 2.0), (9, 3.0)]:
            f.write(
                json.dumps(
                    {"ts": f"2024-01-01T00:0{minute}:00" if minute < 10 else None,
                     "user_id": 1, "value": v}
                )
                + "\n"
            )
    with open(src / "2.jsonl", "w") as f:
        f.write(json.dumps({"ts": "2024-01-02T12:00:00", "user_id": 2, "value": 9.0}) + "\n")

    stream = spark.readStream.schema("ts timestamp, user_id long, value double").json(
        str(src)
    )
    q = (
        sessionize(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sessions").collect()
    by_user = {r["user_id"]: r for r in rows}
    assert 1 in by_user
    s = by_user[1]
    assert s["n_events"] == 3 and s["total_value"] == pytest.approx(6.0)
    assert str(s["session_start"]).startswith("2024-01-01 00:00")


def test_stream_transition_counts_across_batches(spark, tmp_path):
    """The boundary transition between micro-batches must be counted
    exactly once via the per-user single-row state."""
    from power_generation_etl_spark.streaming.stateful import stream_transition_counts

    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")

    def run_pass():
        q = (
            stream_transition_counts(
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, event_type string"
                ).json(str(src))
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)

    rows1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "signup"},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "view"},
    ]
    with open(src / "1.jsonl", "w") as f:
        for r in rows1:
            f.write(json.dumps(r) + "\n")
    run_pass()

    # batch 2: the first event continues user 1's sequence (view->click)
    rows2 = [
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 1, "event_type": "click"},
        {"event_id": 4, "ts": "2024-01-01T00:03:00", "user_id": 1, "event_type": "purchase"},
    ]
    with open(src / "2.jsonl", "w") as f:
        for r in rows2:
            f.write(json.dumps(r) + "\n")
    run_pass()

    got = {}
    for r in spark.read.parquet(out).collect():
        k = (r["from_type"], r["to_type"])
        got[k] = got.get(k, 0) + r["n_transitions"]
    assert got == {
        ("signup", "view"): 1,
        ("view", "click"): 1,      # the cross-batch boundary transition
        ("click", "purchase"): 1,
    }


def test_salted_join_matches_plain_join(spark, sf_dir):
    from power_generation_etl_spark.operators.skew import salted_join
    from power_generation_etl_spark.plans.queries import T

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        T(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
        .filter(F.col("user_id") <= 200)
    )
    plain = sorted(
        (r["event_id"], r["c_name"])
        for r in ev.join(dim, "user_id").select("event_id", "c_name").collect()
    )
    salted = sorted(
        (r["event_id"], r["c_name"])
        for r in salted_join(ev, dim, "user_id", n_salts=8)
        .select("event_id", "c_name")
        .collect()
    )
    assert salted == plain and len(plain) > 0


def test_sessionize_splits_gap_separated_runs_within_one_batch(spark, tmp_path):
    """A single micro-batch holding TWO gap-separated runs of one user
    must yield TWO sessions (the old merge-all-batch-rows design fused
    them) — plus exact assembly of a session straddling the checkpoint
    boundary across two availableNow rounds."""
    src = tmp_path / "sess_multi"
    src.mkdir()
    out = str(tmp_path / "sess_out")

    def run_pass():
        q = (
            sessionize(
                spark.readStream.schema(
                    "ts timestamp, user_id long, value double"
                ).json(str(src)),
                watermark="10 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_multi"))
            .start()
        )
        q.awaitTermination(180)

    # round 1: two runs 2h apart in ONE file (one micro-batch), then a
    # straddler: user 1's third run starts near the end of round 1.
    with open(src / "1.jsonl", "w") as f:
        for iso, v in [
            ("2024-01-01T00:00:00", 1.0),
            ("2024-01-01T00:10:00", 2.0),   # run A: 2 events
            ("2024-01-01T02:00:00", 4.0),   # run B: 1 event (gap > 30min)
            ("2024-01-01T05:00:00", 8.0),   # run C starts (will straddle)
        ]:
            f.write(json.dumps({"ts": iso, "user_id": 1, "value": v}) + "\n")
    run_pass()
    # watermark after round 1 = 05:00 - 10min: runs A and B closed
    # (end + gap <= 04:50), run C still open in state.
    rows = spark.read.parquet(out).collect()
    got = sorted((r["n_events"], r["total_value"]) for r in rows)
    assert got == [(1, 4.0), (2, 3.0)], got

    # round 2: continue run C within the gap (straddles the checkpoint),
    # then a far-future event to close everything for user 1.
    with open(src / "2.jsonl", "w") as f:
        for iso, v in [
            ("2024-01-01T05:20:00", 16.0),  # 20min after 05:00 -> same run
            ("2024-01-02T12:00:00", 32.0),  # new far run, pushes watermark
        ]:
            f.write(json.dumps({"ts": iso, "user_id": 1, "value": v}) + "\n")
    run_pass()
    rows = spark.read.parquet(out).collect()
    got = sorted((r["n_events"], r["total_value"]) for r in rows)
    # run C assembled ACROSS the checkpoint: 2 events, 8+16
    assert got == [(1, 4.0), (2, 3.0), (2, 24.0)], got
    sess_c = [r for r in rows if r["n_events"] == 2 and r["total_value"] == 24.0][0]
    assert str(sess_c["session_start"]).startswith("2024-01-01 05:00")
    assert str(sess_c["session_end"]).startswith("2024-01-01 05:20")
