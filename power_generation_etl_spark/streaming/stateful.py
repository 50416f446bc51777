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

# State = ALL still-open sessions of every user hashed into this state
# BUCKET, columnar (parallel arrays) so the state row has a fixed
# struct schema. The state key is pmod(xxhash64(user_id), n_buckets),
# NOT the raw user id: applyInPandasWithState crosses the JVM→Arrow→
# pandas boundary once per KEY per micro-batch (~1 ms each), so keying
# by user paid 15k crossings per batch for <1 s of real work — the
# same disease the grouped-map kernels had (operators/grouped.py).
# Bucketing is invisible to the emitted rows: every user's events land
# in exactly one bucket, the per-user merge/emit algebra runs per user
# inside the bucket, and the bucket's event-time timeout is anchored
# at the EARLIEST closable instant across its sessions, so a session
# emits in exactly the micro-batch it would have emitted in under
# per-user keying (both fire in the first batch whose watermark passes
# the session's anchor). n_buckets is the explicit rows-per-bucket
# memory knob at scale, defaulting to 4× cluster parallelism.
_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
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
    """Exact gap sessionizer over one hash BUCKET of users (see
    `_STATE_SCHEMA` — keying by bucket instead of user cuts the Python
    crossings per micro-batch from n_users to n_buckets without
    changing any emitted row or its emission batch).

    Invariants (what makes the emitted set equal batch sessionization):

    * Sessions (open state + this batch's events as degenerate
      [ts, ts] intervals) are merged PER USER by the interval form of
      the gap rule — sort by (user, start), coalesce same-user
      neighbors when `next.start − cur.end ≤ gap` — which reproduces
      event-level gap-splitting for any interleaving of state and new
      events (so a batch holding SEVERAL gap-separated runs of one
      user yields several sessions, where a merge-all design would
      fuse them).
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
    sessions: list[list] = []  # [user, start, end, n, total]
    if state.exists:
        users, starts, ends, ns, totals = state.get
        sessions = [
            [int(u), int(s), int(e), int(n), float(t)]
            for u, s, e, n, t in zip(users, starts, ends, ns, totals)
        ]
    if not state.hasTimedOut:
        rows = pd.concat(list(pdfs))
        if len(rows):
            vals = rows["value"].astype("float64")
            for u, t, v in zip(
                rows["user_id"].astype("int64"),
                rows["_ts_us"].astype("int64"),
                vals,
            ):
                sessions.append([int(u), int(t), int(t), 1, float(v)])
    sessions.sort(key=lambda s: (s[0], s[1], s[2]))
    merged: list[list] = []
    for s in sessions:
        if (
            merged
            and s[0] == merged[-1][0]
            and s[1] - merged[-1][2] <= GAP_US
        ):
            m = merged[-1]
            m[2] = max(m[2], s[2])
            m[3] += s[3]
            m[4] += s[4]
        else:
            merged.append(list(s))
    closed = [s for s in merged if s[2] + GAP_US <= w_us]
    still_open = [s for s in merged if s[2] + GAP_US > w_us]
    if still_open:
        state.update(
            (
                [s[0] for s in still_open],
                [s[1] for s in still_open],
                [s[2] for s in still_open],
                [s[3] for s in still_open],
                [s[4] for s in still_open],
            )
        )
        # earliest instant any open session becomes emittable:
        # closable iff end+gap <= w*1000, i.e. w >= ceil((end+gap)/1000)
        # = (end+gap-1)//1000 + 1; the event-time timeout fires when
        # watermark > ts, so ts = (end+gap-1)//1000 fires exactly then.
        nxt = min((s[2] + GAP_US - 1) // 1000 for s in still_open)
        state.setTimeoutTimestamp(max(w_ms + 1, nxt))
    elif state.exists:
        state.remove()
    if closed:
        yield pd.DataFrame(
            {
                "user_id": pd.Series([s[0] for s in closed], dtype="int64"),
                "start_us": pd.Series([s[1] for s in closed], dtype="int64"),
                "end_us": pd.Series([s[2] for s in closed], dtype="int64"),
                "n_events": pd.Series([s[3] for s in closed], dtype="int64"),
                "total_value": pd.Series([s[4] for s in closed], dtype="float64"),
            }
        )
    else:
        yield _empty_sessions_pdf()


def sessionize(
    events: DataFrame,
    watermark: str = "10 minutes",
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-user gap sessions over a streaming (ts, user_id, value)
    frame; `ts` must be TimestampType (an instant — the watermark
    rejects NTZ). Output: one row per CLOSED session (user_id,
    session_start, session_end, n_events, total_value), equal to batch
    gap-sessionization restricted to watermark-closed sessions.

    State is keyed by a hash bucket of the user (default 4× cluster
    parallelism), not the raw user id — identical emitted rows in the
    identical micro-batches, n_buckets Python crossings per batch
    instead of n_users (see `_STATE_SCHEMA`). `n_buckets` is the
    rows-per-bucket worker-memory knob at scale."""
    nb = n_buckets or max(
        1, events.sparkSession.sparkContext.defaultParallelism * 4
    )
    raw = (
        events.withColumn("_ts_us", F.unix_micros(F.col("ts")))
        # applyInPandasWithState resolves grouping keys by NAME against
        # its child — materialize the bucket as a real column.
        .withColumn("_b", F.pmod(F.xxhash64(F.col("user_id")), F.lit(nb)))
        .withWatermark("ts", watermark)
        .groupBy("_b")
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

# State = the latest (ts, type) of every user hashed into this BUCKET,
# plus each user's idle-expiry instant (stored explicitly because the
# per-user instant is a function of the watermark AT UPDATE TIME, which
# a later invocation can't reconstruct). Bucket keying instead of
# per-user keying: one Python crossing per bucket per micro-batch
# instead of one per user — same rationale and same emitted rows as
# the sessionizer above.
_TRANSITION_STATE = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("last_ts_us", ArrayType(LongType())),
        StructField("last_type", ArrayType(StringType())),
        StructField("expire_ms", ArrayType(LongType())),
    ]
)

_IDLE_TTL_MS = 60 * 60 * 1000  # idle users expire after 1h of event time


def _transition_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition counter over one hash bucket of users. Per user the
    state is ONE (ts, type) pair — the latest event — so the boundary
    transition between micro-batches is counted exactly once; an idle
    user's entry expires by event-time timeout (bounded state).

    Exact per-user-keying equivalence: under per-user keys, a user's
    timeout fires in the first batch where the watermark passes its
    expiry instant AND the user has no data in that batch (keys with
    data are never timeout-processed in the same batch). The bucket
    therefore expires exactly the stored users whose instant < current
    watermark and who are absent from this batch's rows, and the
    bucket-level timeout is registered at the minimum surviving
    instant (so the bucket is woken no later than its earliest per-user
    expiry would have fired)."""
    w_ms = state.getCurrentWatermarkMs()
    users: list[int] = []
    last_ts: list[int] = []
    last_type: list[str] = []
    expire: list[int] = []
    if state.exists:
        su, st, sy, se = state.get
        users = [int(u) for u in su]
        last_ts = [int(t) for t in st]
        last_type = list(sy)
        expire = [int(x) for x in se]
    rows = None
    batch_users: set[int] = set()
    if not state.hasTimedOut:
        rows = pd.concat(list(pdfs))
        if len(rows):
            rows = rows.sort_values(["_ts_us", "event_id"])
            batch_users = set(int(u) for u in rows["user_id"])
        else:
            rows = None
    # Expire idle users exactly as their per-user timeout would have:
    # strictly-passed instant, and never a user with data in the batch.
    keep = [
        i
        for i in range(len(users))
        if not (expire[i] < w_ms and users[i] not in batch_users)
    ]
    users = [users[i] for i in keep]
    last_ts = [last_ts[i] for i in keep]
    last_type = [last_type[i] for i in keep]
    expire = [expire[i] for i in keep]

    counts: dict[tuple[int, str, str], int] = {}
    if rows is not None:
        idx = {u: i for i, u in enumerate(users)}
        for u, t, ty in zip(
            rows["user_id"].astype("int64"),
            rows["_ts_us"].astype("int64"),
            rows["event_type"],
        ):
            u, t = int(u), int(t)
            i = idx.get(u)
            if i is None:
                idx[u] = len(users)
                users.append(u)
                last_ts.append(t)
                last_type.append(ty)
                expire.append(0)
            else:
                pair = (u, last_type[i], ty)
                counts[pair] = counts.get(pair, 0) + 1
                last_ts[i] = t
                last_type[i] = ty
        # Anchor each touched user's idle-timeout to event time as well
        # as the watermark: in the FIRST micro-batch the watermark is
        # still 0 (epoch), and a watermark-only anchor would land in
        # 1970 — expiring the state before the next batch and silently
        # dropping every cross-batch boundary transition.
        for u in batch_users:
            i = idx[u]
            expire[i] = max(w_ms, last_ts[i] // 1000) + _IDLE_TTL_MS

    if users:
        state.update((users, last_ts, last_type, expire))
        state.setTimeoutTimestamp(max(w_ms + 1, min(expire)))
    elif state.exists:
        state.remove()
    yield pd.DataFrame(
        {
            "user_id": pd.Series([k[0] for k in counts], dtype="int64"),
            "from_type": pd.Series(
                [k[1] for k in counts], dtype="object"
            ),
            "to_type": pd.Series([k[2] for k in counts], dtype="object"),
            "n_transitions": pd.Series(list(counts.values()), dtype="int64"),
        }
    )


def stream_transition_counts(
    events: DataFrame,
    watermark: str = "10 minutes",
    n_buckets: int | None = None,
) -> DataFrame:
    """Streaming first-order transition counts per user over a
    (event_id, ts, user_id, event_type) stream; `ts` must be an
    instant. Emits per-batch partial counts (sum downstream for
    totals); the cross-batch boundary transition is captured through
    the per-user (ts, type) entry in the bucketed state, and a user
    idle for >1h of EVENT time
    (timeout anchored at max(watermark, last event) + TTL, evaluated
    strictly: the state dies when the watermark passes that instant)
    forgets its boundary — the documented bounded-state trade."""
    nb = n_buckets or max(
        1, events.sparkSession.sparkContext.defaultParallelism * 4
    )
    return (
        events.withColumn("_ts_us", F.unix_micros(F.col("ts")))
        .withColumn("_b", F.pmod(F.xxhash64(F.col("user_id")), F.lit(nb)))
        .withWatermark("ts", watermark)
        .groupBy("_b")
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
