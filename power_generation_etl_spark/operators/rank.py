"""Distributed global ranking — the 100 TB form of `row_number()/
ntile() OVER (ORDER BY ...)` with no partition spec.

Spark executes an unpartitioned window by moving EVERY row to one
partition (WindowExec warns "No Partition Defined ... serious
performance degradation") — a non-starter over a row-scale input on a
1000-executor cluster. The classic scalable replacement is a two-pass
rank over a range-partitioned sort:

1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — the
   cluster-wide sort Spark already does for `orderBy`, data stays
   spread across N partitions;
2. a tiny per-partition row-count aggregate (N rows, N = shuffle
   partitions) collected and prefix-summed on the driver — bounded
   driver state, like the k-means centroid constants;
3. `row_number()` *partitioned by* the range-partition id, plus the
   broadcast-joined exclusive offset = the exact global rank.

The per-row ordering must be a total order (include a unique tie-break
key) so the result is deterministic and engine-identical — the same
requirement every oracle-checked window query here already meets.

The sorted base is `localCheckpoint`ed once so the count pass and the
rank pass see the *same materialized* range partitioning (range
boundaries come from sampling; two independent evaluations of the same
lineage are deterministic in practice, but the checkpoint makes it a
guarantee and pays for itself by not re-sorting in pass 2). At real
cluster scale the same pattern runs with `persist(DISK_ONLY)`.

`ntile` then needs no second sort: with `q = total div n`,
`r = total mod n`, SQL ntile gives the first `r` buckets `q+1` rows —
pure integer arithmetic on (rank, total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """`df` + 1-based `rank_col` equal to `row_number() OVER (ORDER BY
    *order)` — computed without a single-partition window. `order`
    must be a total order (unique tie-break). Optionally also attaches
    the total row count as `total_col` (needed by ntile/percent_rank
    derivations) — it rides along on the same tiny broadcast join, no
    extra pass over the data."""
    spark = df.sparkSession
    base = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_rk_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # Per-partition row counts: one tiny job, <= shuffle-partition rows
    # collected to the driver (the same bounded-by-cluster-constant
    # driver state as the k-means centroid pattern). Exclusive prefix
    # sums become the broadcast offset table — no unpartitioned window
    # anywhere, so the ranked plan itself is fully distributed.
    counts = sorted(
        (r["_rk_pid"], r["n"])
        for r in base.groupBy("_rk_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total, rows = 0, []
    for pid, n in counts:
        rows.append((pid, total))
        total += n
    offsets = spark.createDataFrame(
        rows or [(0, 0)], "_rk_pid int, _rk_off bigint"
    )
    if not rows:
        offsets = offsets.where(F.lit(False))
    w_local = Window.partitionBy("_rk_pid").orderBy(*order)
    out = base.join(F.broadcast(offsets), "_rk_pid").withColumn(
        rank_col,
        (F.row_number().over(w_local) + F.col("_rk_off")).cast("bigint"),
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("bigint"))
    return out.drop("_rk_pid", "_rk_off")


def with_global_dense_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
) -> tuple[DataFrame, int]:
    """`df` + 1-based `rank_col` equal to `dense_rank() OVER (ORDER BY
    *order)` — same two-pass range-partitioned shape as
    `with_global_rank`, but rows with equal keys share a rank, so the
    caller gets an order-isomorphic DENSE re-keying of the key domain
    without a `distinct()` + rank + join-back round-trip (three
    shuffles collapse to one range exchange). Correct because Spark's
    RangePartitioner maps a key to its partition as a pure function of
    the key, so equal keys never straddle a partition boundary and the
    per-partition `countDistinct` prefix sums are exact. Returns
    (ranked df, domain size = number of distinct keys)."""
    spark = df.sparkSession
    base = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_rk_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_rk_pid"], r["n"])
        for r in base.groupBy("_rk_pid")
        .agg(F.count_distinct(F.struct(*order)).alias("n"))
        .collect()
    )
    total, rows = 0, []
    for pid, n in counts:
        rows.append((pid, total))
        total += n
    offsets = spark.createDataFrame(rows or [(0, 0)], "_rk_pid int, _rk_off bigint")
    if not rows:
        offsets = offsets.where(F.lit(False))
    w_local = Window.partitionBy("_rk_pid").orderBy(*order)
    out = (
        base.join(F.broadcast(offsets), "_rk_pid")
        .withColumn(
            rank_col,
            (F.dense_rank().over(w_local) + F.col("_rk_off")).cast("bigint"),
        )
        .drop("_rk_pid", "_rk_off")
    )
    return out, total


def with_running_sum(
    df: DataFrame,
    order: list[Column],
    value: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """`df` + `sum(value) OVER (ORDER BY *order ROWS UNBOUNDED
    PRECEDING)` — the global prefix sum, computed without a
    single-partition window. Same two-pass shape as `with_global_rank`:
    range-partitioned sort, per-partition value totals collected and
    exclusive-prefix-summed on the driver (≤ shuffle-partition rows),
    then a partition-local cumulative window + broadcast offset.
    `order` must be a total order; `value` must be integer-typed
    (bigint) so the driver-side prefix sums are exact — float prefix
    sums would depend on partition boundaries."""
    spark = df.sparkSession
    base = (
        df.withColumn("_rk_v", value.cast("bigint"))
        .repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_rk_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_rk_pid"], r["s"])
        for r in base.groupBy("_rk_pid")
        .agg(F.sum("_rk_v").cast("bigint").alias("s"))
        .collect()
    )
    total, rows = 0, []
    for pid, s in counts:
        rows.append((pid, total))
        total += s or 0
    offsets = spark.createDataFrame(
        rows or [(0, 0)], "_rk_pid int, _rk_off bigint"
    )
    if not rows:
        offsets = offsets.where(F.lit(False))
    w_local = (
        Window.partitionBy("_rk_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "_rk_pid")
        .withColumn(
            out_col,
            (F.sum("_rk_v").over(w_local) + F.col("_rk_off")).cast("bigint"),
        )
        .drop("_rk_pid", "_rk_off", "_rk_v")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact nonnegative integer division as a Column expression.
    `(a - a mod b) / b` is an exactly-representable double for
    a < 2^53 — i.e. for any row count below ~9e15, far past 100 TB of
    rows — so the cast back to bigint is lossless."""
    return ((a - a % b) / b).cast("bigint")


def ntile_of_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL `ntile(n)` from a precomputed global rank: with
    `q = total div n` and `r = total mod n`, the first `r` buckets
    hold `q+1` rows and the rest `q`. Pure integer arithmetic on
    (rank, total) — bit-identical to the window function on every
    engine, no second sort. When `total < n` the cut covers every row,
    so the `q`-sized tail branch (guarded against q=0) never fires."""
    nn = F.lit(n).cast("bigint")
    q = _idiv(total, nn)
    r = total % nn
    cut = r * (q + 1)
    head = _idiv(rank - 1, q + 1) + 1
    tail = r + _idiv(rank - 1 - cut, F.greatest(q, F.lit(1))) + 1
    return F.when(rank <= cut, head).otherwise(tail).cast("bigint")
