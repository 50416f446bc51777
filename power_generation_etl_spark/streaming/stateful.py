"""Custom stateful streaming operators.

Beyond-reference streaming surface (the reference is batch-only):

- `streaming_dedup`: cross-micro-batch duplicate dropping with bounded
  state — built-in `dropDuplicatesWithinWatermark`, the streaming form
  of the D2 idempotent-append guarantee (state expires with the
  watermark instead of growing forever).
- `sessionize`: arbitrary per-key state via `applyInPandasWithState` —
  the escape hatch for operators Spark lacks. Groups events into
  gap-based activity sessions per user with EXACT batch semantics:
  the state is the full set of still-open sessions for the key, and a
  session emits precisely when the event-time watermark guarantees no
  admissible event can ever extend it — so the emitted set equals the
  batch gap-sessionization (`plans/temporal_queries.py::
  sessionized_events`) filtered to watermark-closed sessions,
  independent of how the stream was micro-batched.
- `sessionize_native` / `stream_transition_counts`: the built-in
  `session_window` counterpart and a cross-batch Markov-transition
  counter.

Timezone safety: the Pandas worker receives TimestampType columns as
SESSION-TIMEZONE-naive datetime64, so `.astype(int64)` on them is
shifted by the session offset. Every stateful function here therefore
reads a `_ts_us` BIGINT column computed JVM-side with `unix_micros`
(timezone-free on instants) and compares it against
`getCurrentWatermarkMs()` (epoch ms, also timezone-free).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, µs


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


# Pandas-side output: pure integers (epoch µs) + a float total; the
# public `sessionize` wrapper rebuilds TimestampType JVM-side.
_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# State = ALL still-open sessions of the key, columnar (parallel arrays)
# so the state row has a fixed struct schema.
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("totals", ArrayType(DoubleType())),
    ]
)


def _empty_sessions_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "start_us": pd.Series([], dtype="int64"),
            "end_us": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "total_value": pd.Series([], dtype="float64"),
        }
    )


def _session_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Exact gap sessionizer.

    Invariants (what makes the emitted set equal batch sessionization):

    * Sessions (open state + this batch's events as degenerate
      [ts, ts] intervals) are merged by the interval form of the gap
      rule — sort by start, coalesce when `next.start − cur.end ≤ gap`
      — which reproduces event-level gap-splitting for any interleaving
      of state and new events (so a batch holding SEVERAL gap-separated
      runs of one user yields several sessions, where a merge-all
      design would fuse them).
    * A session emits iff `end + gap ≤ watermark` — the EXACT predicate
      Spark's native `session_window` append mode uses (probed:
      emission at equality, against the ms-floored watermark). Any
      event that could still extend the session (ts ≤ end + gap) would
      be watermark-late and dropped, so emitted sessions are final.
    * The event-time timeout is anchored at the earliest open session's
      closability instant, NOT the newest (a max-anchored timeout
      strands a closed old session behind a still-open new one), and
      floored at watermark+1 because the first micro-batch's watermark
      is epoch 0 (a watermark-only anchor expires state in 1970).
    """
    w_ms = state.getCurrentWatermarkMs()
    w_us = w_ms * 1000
    sessions: list[list] = []
    if state.exists:
        starts, ends, ns, totals = state.get
        sessions = [
            [int(s), int(e), int(n), float(t)]
            for s, e, n, t in zip(starts, ends, ns, totals)
        ]
    if not state.hasTimedOut:
        rows = pd.concat(list(pdfs))
        if len(rows):
            vals = rows["value"].astype("float64")
            for t, v in zip(rows["_ts_us"].astype("int64"), vals):
                sessions.append([int(t), int(t), 1, float(v)])
    sessions.sort(key=lambda s: (s[0], s[1]))
    merged: list[list] = []
    for s in sessions:
        if merged and s[0] - merged[-1][1] <= GAP_US:
            m = merged[-1]
            m[1] = max(m[1], s[1])
            m[2] += s[2]
            m[3] += s[3]
        else:
            merged.append(list(s))
    closed = [s for s in merged if s[1] + GAP_US <= w_us]
    still_open = [s for s in merged if s[1] + GAP_US > w_us]
    if still_open:
        state.update(
            (
                [s[0] for s in still_open],
                [s[1] for s in still_open],
                [s[2] for s in still_open],
                [s[3] for s in still_open],
            )
        )
        # earliest instant any open session becomes emittable:
        # closable iff end+gap <= w*1000, i.e. w >= ceil((end+gap)/1000)
        # = (end+gap-1)//1000 + 1; the event-time timeout fires when
        # watermark > ts, so ts = (end+gap-1)//1000 fires exactly then.
        nxt = min((s[1] + GAP_US - 1) // 1000 for s in still_open)
        state.setTimeoutTimestamp(max(w_ms + 1, nxt))
    elif state.exists:
        state.remove()
    if closed:
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(closed), dtype="int64"),
                "start_us": pd.Series([s[0] for s in closed], dtype="int64"),
                "end_us": pd.Series([s[1] for s in closed], dtype="int64"),
                "n_events": pd.Series([s[2] for s in closed], dtype="int64"),
                "total_value": pd.Series([s[3] for s in closed], dtype="float64"),
            }
        )
    else:
        yield _empty_sessions_pdf()


def sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user gap sessions over a streaming (ts, user_id, value)
    frame; `ts` must be TimestampType (an instant — the watermark
    rejects NTZ). Output: one row per CLOSED session (user_id,
    session_start, session_end, n_events, total_value), equal to batch
    gap-sessionization restricted to watermark-closed sessions."""
    raw = (
        events.withColumn("_ts_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("start_us").alias("session_start"),
        F.timestamp_micros("end_us").alias("session_end"),
        "n_events",
        "total_value",
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

_IDLE_TTL_MS = 60 * 60 * 1000  # idle users expire after 1h of event time


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
    rows = rows.sort_values(["_ts_us", "event_id"])
    types = list(rows["event_type"])
    ts_us = list(rows["_ts_us"].astype("int64"))
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
        max(state.getCurrentWatermarkMs(), last_ms) + _IDLE_TTL_MS
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
    (event_id, ts, user_id, event_type) stream; `ts` must be an
    instant. Emits per-batch partial counts (sum downstream for
    totals); the cross-batch boundary transition is captured through
    the single-row keyed state, and a user idle for >1h of EVENT time
    (timeout anchored at max(watermark, last event) + TTL, evaluated
    strictly: the state dies when the watermark passes that instant)
    forgets its boundary — the documented bounded-state trade."""
    return (
        events.withColumn("_ts_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", watermark)
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
    NOTE: `session_end` here is the window end (last event + gap), the
    built-in's convention; the stateful twin reports the last event
    itself.
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
