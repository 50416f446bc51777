"""Custom stateful streaming operators.

Beyond-reference streaming surface (the reference is batch-only):

- `streaming_dedup`: cross-micro-batch duplicate dropping with bounded
  state — built-in `dropDuplicatesWithinWatermark`, the streaming form
  of the D2 idempotent-append guarantee (state expires with the
  watermark instead of growing forever).
- `sessionize`: arbitrary per-key state via `applyInPandasWithState` —
  the escape hatch for operators Spark lacks. Groups events into
  activity sessions (gap-based) per user; state is one open session
  per key, timed out by event-time watermark.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys across micro-batches with bounded state."""
    return events.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer: emits a session when the state times out
    (no events past the watermark + gap)."""
    gap_ms = 30 * 60 * 1000  # 30-minute inactivity gap
    if state.hasTimedOut:
        (start_us, end_us, n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs))
    ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
    lo, hi = int(ts_us.min()), int(ts_us.max())
    n_new, total_new = len(rows), float(rows["value"].sum())
    if state.exists:
        start_us, end_us, n, total = state.get
        state.update((min(start_us, lo), max(end_us, hi), n + n_new, total + total_new))
    else:
        state.update((lo, hi, n_new, total_new))
    # Gap semantics: the session closes when the WATERMARK passes
    # last-event + gap. Anchoring on the watermark alone breaks in the
    # first micro-batch (watermark still 0 → timeout in 1970, session
    # closes prematurely); the max() also guards the must-be-after-
    # watermark contract of setTimeoutTimestamp.
    end_ms = int(state.get[1]) // 1000
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs() + 1, end_ms + gap_ms)
    )
    yield pd.DataFrame(
        columns=["user_id", "session_start", "session_end", "n_events", "total_value"]
    ).astype(
        {
            "user_id": "int64",
            "n_events": "int64",
            "total_value": "float64",
        }
    )


def sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user gap sessions over a streaming (ts, user_id, value) frame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Cross-batch event-transition counting — the streaming twin of the
# batch `event_transition_matrix` catalog query.
# ---------------------------------------------------------------------------

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n_transitions", LongType()),
    ]
)

_TRANSITION_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transition_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user transition counter. State is ONE (ts, type) pair — the
    user's latest event — so the boundary transition between micro-
    batches is counted exactly once; state expires via event-time
    timeout for idle users (bounded state)."""
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "from_type": pd.Series([], dtype="object"),
             "to_type": pd.Series([], dtype="object"),
             "n_transitions": pd.Series([], dtype="int64")}
        )
        return

    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    types = list(rows["event_type"])
    ts_us = list(rows["ts"].astype("int64") // 1000)
    if state.exists:
        last_ts, last_type = state.get
        types = [last_type] + types
    counts: dict[tuple[str, str], int] = {}
    for a, b in zip(types, types[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    state.update((int(ts_us[-1]), types[-1]))
    # Anchor the idle-timeout to event time as well as the watermark:
    # in the FIRST micro-batch the watermark is still 0 (epoch), and a
    # watermark-only timeout would land in 1970 — expiring the state
    # before the next batch and silently dropping every cross-batch
    # boundary transition.
    last_ms = int(ts_us[-1]) // 1000
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs(), last_ms) + 60 * 60 * 1000
    )
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(counts),
            "from_type": [a for a, _ in counts],
            "to_type": [b for _, b in counts],
            "n_transitions": list(counts.values()),
        }
    )


def stream_transition_counts(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming first-order transition counts per user over a
    (event_id, ts, user_id, event_type) stream. Emits per-batch partial
    counts (sum downstream for totals); the cross-batch boundary
    transition is captured through the single-row keyed state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_fn,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_TRANSITION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_native(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """Gap sessions via Spark's NATIVE `session_window` aggregation —
    the built-in counterpart of the `applyInPandasWithState`
    sessionizer above. Use this form when the per-session output is
    plain aggregates (count/sum/min/max): state lives in the engine's
    session-window store (merged on overlap, expired by the watermark),
    no Python worker in the loop. Keep the applyInPandas form when the
    session needs custom per-event logic the built-in can't express.

    Input: streaming (ts timestamp, user_id, value). Output one row per
    closed session: user_id, session_start/end, n_events, total_value
    — same shape as `sessionize` so callers can swap implementations.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
