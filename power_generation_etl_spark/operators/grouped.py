"""Grouped-map Pandas operators (`applyInPandas`) — the per-group
custom-kernel API surface.

`mapInPandas` (media decode), `@pandas_udf` scalar kernels, and
`applyInPandasWithState` (streaming sessionization) are covered
elsewhere; this module covers the remaining sanctioned custom-operator
mechanism: DataFrame.groupBy(...).applyInPandas(fn, schema), where
each GROUP arrives as one pandas DataFrame and the kernel may run
arbitrary order-sensitive / iterative numpy code that plain SQL
windows can't express cleanly.

Scale contract (the part that matters at 100 TB): a grouped-map kernel
materializes the ENTIRE group in one Python worker's memory. It is the
right tool only for keys with bounded group size (per-user event
sequences, per-document token runs) — for unbounded/skewed keys,
pre-aggregate or fall back to window expressions. The group columns
should be pruned to exactly what the kernel reads, so only narrow rows
cross the JVM→Arrow→pandas hop.

Everything emitted is INTEGER (floor-cents, doubled medians), so the
catalog entry sits under the exact DuckDB oracle — the same convention
as the rest of the repo's quantile/median surfaces.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame


def sequence_profile(
    df: DataFrame,
    key_col: str,
    order_cols: Iterable[str],
    cents_col: str,
) -> DataFrame:
    """Per-key sequential profile of an integer series: count, exact
    sum, DOUBLED median (2·mid for odd n, lo+hi for even — stays in
    int64, no float), and the length of the longest strictly-increasing
    consecutive run in `order_cols` order.

    The run statistic is what earns the grouped-map form: it is a
    sequential scan over the ordered group (SQL needs a gaps-and-
    islands double window — the oracle states exactly that, which is
    the cross-check). Sorting happens INSIDE the kernel because Spark
    does not guarantee intra-group row order for grouped-map UDFs.
    """
    order_cols = list(order_cols)
    out_schema = (
        f"{key_col} long, n_events long, sum_cents long, "
        "median2x_cents long, longest_up_run int"
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        key = pdf[key_col].iloc[0]
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        c = pdf[cents_col].to_numpy(dtype=np.int64)
        n = len(c)
        s = np.sort(c, kind="stable")
        if n % 2:
            med2 = 2 * int(s[n // 2])
        else:
            med2 = int(s[n // 2 - 1]) + int(s[n // 2])
        up = np.diff(c) > 0  # strictly increasing steps
        longest = run = 1
        for step in up:
            run = run + 1 if step else 1
            if run > longest:
                longest = run
        return pd.DataFrame(
            [(int(key), n, int(c.sum()), med2, longest)],
            columns=[key_col, "n_events", "sum_cents",
                     "median2x_cents", "longest_up_run"],
        )

    narrow = df.select(key_col, *order_cols, cents_col)
    return narrow.groupBy(key_col).applyInPandas(profile, out_schema)


def cogroup_activity(
    orders: DataFrame,
    events: DataFrame,
    key_order: str,
    key_event: str,
    day_order: str,
    day_event: str,
    cents_col: str,
) -> DataFrame:
    """Cogrouped-map Pandas kernel — the LAST Python-kernel API surface
    (``groupBy(k).cogroup(other.groupBy(k)).applyInPandas``): both
    sides of a key arrive as two pandas frames in ONE worker, the
    full-outer grouped join the engine otherwise expresses as two
    aggregates + a join. The kernel computes, per key: order count,
    exact floor-cents spend, event count, and the count of events
    strictly AFTER the key's last order day (all events when the key
    never ordered) — the co-presence statistic that needs both sides
    at once.

    Inputs carry JVM-computed integer day columns (unix_date), never
    raw timestamps — TimestampType crosses into the Python worker as
    session-tz-naive datetimes and would poison the comparison (the
    stateful-sessionizer lesson). Scale contract as `sequence_profile`:
    per-key groups must be bounded; columns are pruned to exactly what
    the kernel reads."""

    def fn(key, po: pd.DataFrame, pe: pd.DataFrame) -> pd.DataFrame:
        n_orders = len(po)
        cents = int(po[cents_col].sum()) if n_orders else 0
        n_events = len(pe)
        if n_orders:
            last = int(po[day_order].max())
            after = int((pe[day_event] > last).sum()) if n_events else 0
        else:
            after = n_events
        return pd.DataFrame(
            [[int(key[0]), n_orders, cents, n_events, after]],
            columns=[
                "user_id", "n_orders", "cents_spent",
                "n_events", "events_after_last_order",
            ],
        )

    o = orders.select(key_order, day_order, cents_col)
    e = events.select(key_event, day_event)
    return (
        o.groupBy(key_order)
        .cogroup(e.groupBy(key_event))
        .applyInPandas(
            fn,
            "user_id long, n_orders long, cents_spent long, "
            "n_events long, events_after_last_order long",
        )
    )
