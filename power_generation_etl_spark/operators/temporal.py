"""Temporal joins and sessionization — operators Spark lacks natively,
built as compositions of existing DataFrame ops (no UDFs).

The reference has no temporal operators (SURVEY.md §2.7: "no
theta/range/as-of joins"), but a time-series analytics engine at 100 TB
needs them; these are the beyond-reference extensions alongside the
dedup/similarity family.

Scale design notes:
- `asof_join` is the union+ordered-window formulation: ONE shuffle on
  the join key (tag sides, union, `last(..., ignorenulls)` over an
  ordered window), never a range cross-join. At 100 TB both inputs
  shuffle once on the key; a naive `l.ts >= r.ts` join would be a
  per-key cross product.
- `bucketed_range_join` is the band-join trick: quantize time into
  window-width buckets, explode each probe row to the (at most two)
  buckets its window overlaps, then EQUI-join on (key, bucket) and
  re-filter the exact range. Catalyst plans a hash join — without the
  bucket key it would fall back to BroadcastNestedLoopJoin.
- `sessionize` is lag + running conditional sum over one (key, ts)
  window — one shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: every `left` row gains the `payload_cols` of
    the most recent `right` row with ``right_ts <= left_ts`` and the same
    `on` key (nulls when no prior right row exists), plus a
    ``_matched_ts`` column carrying that right row's timestamp.

    Payload names must not collide with `left` columns. Ties on the
    timestamp resolve to the right row (at-or-before semantics, matching
    DuckDB's ``ASOF JOIN`` with ``>=``).
    """
    lcols = left.columns
    clash = sorted(set(payload_cols) & set(lcols))
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
            for c in payload_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        *[
            F.col(on).alias(on) if c == on
            else F.col(right_ts).alias(left_ts) if c == left_ts
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(right_ts).alias("_rts"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(left_ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *lcols,
        "_side",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_matched_ts"),
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def bucketed_range_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    window_sec: int,
) -> DataFrame:
    """Equi-joinable range join: pairs every `probe` row with the `build`
    rows of the same key whose timestamp falls in
    ``(probe_ts, probe_ts + window_sec]``. Returns probe columns +
    build's non-key columns (caller pre-aliases to avoid collisions).

    A window of width W overlaps at most two W-sized buckets, so each
    probe row explodes to 2 bucket keys and the join is a plain hash
    equi-join on (key, bucket) with an exact-range re-filter.
    """
    bucket = lambda ts: (ts.cast("double") / window_sec).cast("bigint")  # noqa: E731
    p = probe.withColumn(
        "_bkt",
        F.explode(F.array(bucket(F.col(probe_ts)), bucket(F.col(probe_ts)) + 1)),
    )
    b = build.withColumn("_bkt", bucket(F.col(build_ts)))
    build_payload = [c for c in build.columns if c != on]
    joined = p.join(b.withColumnRenamed(on, "_bon"), on="_bkt").filter(
        (F.col(on) == F.col("_bon"))
        & (F.col(build_ts) > F.col(probe_ts))
        & (
            F.col(build_ts).cast("double")
            <= F.col(probe_ts).cast("double") + window_sec
        )
    )
    return joined.select(*probe.columns, *build_payload)


def sessionize(
    df: DataFrame, key: str, ts: str, gap_sec: int
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap
    to the key's previous event exceeds `gap_sec`. Adds a `session_id`
    column (0-based per key, ordered by time).

    Batch twin of the streaming sessionizer in
    `streaming/stateful.py` — one window shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    new_session = (
        prev.isNull()
        | ((F.col(ts).cast("double") - prev.cast("double")) > gap_sec)
    ).cast("bigint")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wrun) - 1)
