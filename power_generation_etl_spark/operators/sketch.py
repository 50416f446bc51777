"""Portable distinct-count sketches.

KMV (k-minimum-values) estimates the number of distinct values from the
k smallest hashes of the value set: if the k-th smallest of n uniform
hashes in [0, M) is h_k, then n ≈ (k-1) · M / h_k. Unlike HyperLogLog
the whole computation is expressible in plain SQL with deterministic
integer arithmetic, so the Spark plan and the DuckDB oracle agree
bit-for-bit — a sketch you can ship across engines.

Scale design: the shuffle carries (group, hash) pairs deduplicated by a
map-side-combinable distinct, then ONE window pass ranks hashes within
each group. State per group is O(distinct hashes) at the shuffle and
O(1) in the output; for very high-cardinality groups swap the
row_number for an `approx` two-stage min-k (sort_array(slice)) — same
estimate, bounded memory.

The reference has no sketches; this extends the profiling family
(beyond-reference, alongside `operators/profile.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 48-bit hash domain: 12 hex chars of md5. Small enough that
# (k-1) << 48 stays far below int64 for any practical k, large enough
# that collisions are negligible below ~2^24 distinct values per group.
_HASH_BITS = 48
_HASH_HEX = 12


def hash48(col) -> F.Column:
    """Portable 48-bit non-negative hash: Spark `conv(substr(md5(x),1,12),16,10)`
    ↔ DuckDB `CAST('0x' || substr(md5(x),1,12) AS BIGINT)`."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, _HASH_HEX), 16, 10).cast(
        "bigint"
    )


def kmv_estimate_expr(k: int, n_hashes: str = "n_hashes", h_k: str = "h_k"):
    """The KMV estimate as one expression over a (n_hashes, h_k) pair —
    the single definition shared by the batch sketch and the streaming
    store reader, so hash width / fallback semantics can never drift
    between them."""
    scale = (k - 1) << _HASH_BITS
    return F.expr(
        f"CAST(CASE WHEN {h_k} IS NULL THEN {n_hashes}"
        f" ELSE {scale} div {h_k} END AS BIGINT)"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 32,
    two_stage: bool = False,
) -> DataFrame:
    """Per-group KMV distinct-count estimate with exact integer
    arithmetic: ``estimate = ((k-1) << 48) div h_k`` where ``h_k`` is
    the k-th smallest distinct 48-bit hash. Groups with fewer than k
    distinct hashes report the exact distinct hash count (the standard
    KMV small-set fallback).

    Output: (group, n_rows, n_hashes, kmv_estimate), ordered by group.

    ``two_stage=True`` selects the high-cardinality path: each input
    partition pre-filters to its local k smallest distinct hashes (a
    window over (group, partition_id)) before the global rank, so the
    group-key shuffle carries at most k rows per (group, partition)
    instead of every distinct hash. The k-th smallest of the merged
    local min-k sets IS the global k-th smallest, so the estimate is
    identical — only the shuffle volume changes.
    """
    if not 2 <= k <= 4096:
        raise ValueError("k must be in [2, 4096]")
    hashed = df.select(
        F.col(group_col).alias("grp"), hash48(F.col(value_col)).alias("h")
    )
    per_grp = hashed.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("h")).alias("n_hashes"),
    )
    # NULL values hash to NULL, which Spark would rank FIRST (NULLS
    # FIRST ascending) and DuckDB LAST — drop them from the rank input
    # (count_distinct above already ignores NULLs in both engines).
    ranked_in = hashed.where(F.col("h").isNotNull()).distinct()
    if two_stage:
        lw = Window.partitionBy("grp", "_pid").orderBy("h")
        ranked_in = (
            # distinct() above already shuffled on (grp, h); the local
            # min-k runs on whatever partitioning follows it.
            ranked_in.withColumn("_pid", F.spark_partition_id())
            .withColumn("_lrn", F.row_number().over(lw))
            .where(F.col("_lrn") <= k)
            .select("grp", "h")
        )
    w = Window.partitionBy("grp").orderBy("h")
    kth = (
        ranked_in
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == k)
        .select("grp", F.col("h").alias("h_k"))
    )
    return (
        per_grp.join(kth, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "n_hashes",
            kmv_estimate_expr(k).alias("kmv_estimate"),
        )
        .orderBy(group_col)
    )


def kmv_oracle_sql(
    table: str, group_col: str, value_expr: str, *, k: int = 32
) -> str:
    """DuckDB twin of `kmv_distinct` — identical hash, rank, and
    integer-division estimate."""
    scale = (k - 1) << _HASH_BITS
    return f"""
    WITH hashed AS (
        SELECT {group_col} AS grp,
               CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, {_HASH_HEX}) AS BIGINT) AS h
        FROM {table}
    ),
    per_grp AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT h) AS BIGINT) AS n_hashes
        FROM hashed GROUP BY grp
    ),
    ranked AS (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM (SELECT DISTINCT grp, h FROM hashed WHERE h IS NOT NULL)
    ),
    kth AS (SELECT grp, h AS h_k FROM ranked WHERE rn = {k})
    SELECT per_grp.grp AS {group_col}, n_rows, n_hashes,
           CAST(CASE WHEN h_k IS NULL THEN n_hashes
                     ELSE {scale} // h_k END AS BIGINT) AS kmv_estimate
    FROM per_grp LEFT JOIN kth ON per_grp.grp = kth.grp
    ORDER BY {group_col}
    """


# ---------------------------------------------------------------------------
# Count-Min sketch: frequency estimates in O(d*w) space.
# ---------------------------------------------------------------------------

def cms_position(col, j: int, w: int) -> F.Column:
    """Counter column for depth row ``j``: 48-bit md5 slice of
    ``"{j}:{key}"`` mod w — the same portable primitive as `hash48` /
    the Bloom filter, so the DuckDB oracle reproduces it exactly."""
    return hash48(F.concat(F.lit(f"{j}:"), col.cast("string"))) % w


def cms_position_sql(expr: str, j: int, w: int) -> str:
    """DuckDB twin of `cms_position`."""
    return (
        f"(CAST('0x' || substr(md5('{j}:' || CAST({expr} AS VARCHAR)), 1, 12)"
        f" AS BIGINT) % {w})"
    )


def cms_counters(df: DataFrame, key_col: str, *, w: int, d: int) -> DataFrame:
    """Build the d×w counter table: one projection exploding each row
    into its d (row, counter) cells, then ONE hash aggregation. Map-side
    partial aggregation collapses each input partition to ≤ d*w rows
    before the shuffle, so the shuffle payload is O(d*w) per partition —
    independent of input size. Output: (j, pos, cnt), ≤ d*w rows total.
    """
    if not 1 <= d <= 8:
        raise ValueError("d must be in [1, 8]")
    key = F.col(key_col)
    cells = df.where(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cms_position(key, j, w).alias("pos")
                    )
                    for j in range(d)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.j").alias("j"), F.col("c.pos").alias("pos")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str, *, w: int, d: int
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: join each key's
    d cells against the counter table and take the min — the classic
    CMS upper-bound estimate (est ≥ true count always; overestimates
    come only from hash collisions). The counter table is ≤ d*w rows →
    broadcast; the keys side never shuffles. Output: (key_col, cms_est).
    """
    key = F.col(key_col)
    cells = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cms_position(key, j, w).alias("pos")
                    )
                    for j in range(d)
                ]
            )
        ).alias("c"),
    )
    return (
        cells.join(
            F.broadcast(counters),
            (F.col("c.j") == counters.j) & (F.col("c.pos") == counters.pos),
            "left",
        )
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, AofA 2007). Registers
# are pure integer arithmetic over the same 48-bit md5 hash as KMV:
# bucket = top p bits, rho = leading-zero count of the remaining W-bit
# word (via bit-length, exact in both engines). The indicator sum
# Z = sum(2^-M_j) is carried as the exact bigint sum(2^(50-M_j)) —
# every term is a power of two <= 2^50, m=64 terms, no float addition
# anywhere. The only float ops are one literal/bigint division for the
# raw estimate and the published linear-counting branch, whose
# m*ln(m/V) values are DRIVER-side libm literals indexed by the
# integer V (the cross-engine ln trick from bm25, extended to a LUT) —
# so the whole estimate reproduces bit-for-bit in the DuckDB oracle.
# ---------------------------------------------------------------------------

_HLL_P = 6  # 2^6 = 64 registers
_HLL_M = 1 << _HLL_P
_HLL_W = _HASH_BITS - _HLL_P  # 42-bit rho word
_HLL_ALPHA = 0.709  # alpha_64, Flajolet et al. 2007 fig. 3
# Exact-integer indicator scaling: 2^(50-M) with M in [1, W+1=43].
_HLL_SHIFT = 50


def _hll_literals() -> tuple[str, list[str]]:
    """(alpha*m^2*2^shift, [m*ln(m/V) for V in 1..m]) as repr strings —
    Python's repr round-trips the exact double, and both engines parse
    the same decimal to the same IEEE value."""
    import math as _m

    a = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_SHIFT))
    lc = [repr(_HLL_M * _m.log(_HLL_M / v)) for v in range(1, _HLL_M + 1)]
    return a, lc


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HLL distinct-count estimate: (group, v_empty,
    z_scaled, hll_estimate). hll_estimate applies the published
    small-range correction (linear counting when E <= 2.5m and empty
    registers remain) and truncates to 4 decimals with floor on both
    engines.

    Scale: the shuffle carries at most m=64 (group, bucket, max-rho)
    rows per group after map-side combine — O(m) state per group
    regardless of cardinality, the property KMV's distinct-shuffle
    lacks. Mergeable by construction (max of maxes)."""
    return hll_estimate_from_registers(
        hll_registers(df, group_col, value_col)
    ).withColumnRenamed("grp", group_col)


def hll_registers(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(grp, bucket, mj) HLL register table — the mergeable state:
    sketches of two corpora merge by per-(grp, bucket) max(mj), which
    is what the streaming store does per micro-batch."""
    w_bits = _HLL_W
    h = hash48(F.col(value_col))
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"), h.alias("h")
    )
    buck = base.select(
        "grp",
        F.expr(f"h div {1 << w_bits}").alias("bucket"),
        F.expr(f"h % {1 << w_bits}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        buck.select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """(grp, v_empty, z_scaled, hll_estimate) from a (grp, bucket, mj)
    register table — the single estimate definition shared by the batch
    sketch and the streaming store reader, so the correction policy can
    never drift between them."""
    m = _HLL_M
    per_grp = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SHIFT} - mj)")
        ).alias("z_present"),
    )
    a_lit, lc_lits = _hll_literals()
    v_empty = F.lit(m) - F.col("n_present")
    z_scaled = (
        F.col("z_present")
        + v_empty.cast("bigint") * F.lit(1 << _HLL_SHIFT)
    )
    raw = F.lit(float(a_lit)) / z_scaled.cast("double")
    lc_arr = F.array(*[F.lit(float(x)) for x in lc_lits])
    est = F.when(
        (v_empty > 0) & (raw <= F.lit(2.5 * m)),
        F.element_at(lc_arr, v_empty.cast("int")),
    ).otherwise(raw)
    return per_grp.select(
        "grp",
        v_empty.cast("bigint").alias("v_empty"),
        z_scaled.cast("bigint").alias("z_scaled"),
        (
            F.floor(est * F.lit(10000.0)).cast("bigint") / F.lit(10000.0)
        ).alias("hll_estimate"),
    )


def hll_oracle_sql(
    table_expr: str, group_col: str, value_expr: str
) -> str:
    """DuckDB twin of `hll_distinct` — identical bucket/rho integer
    pipeline, the same driver literals for alpha·m²·2^shift and the
    linear-counting LUT."""
    m, w_bits = _HLL_M, _HLL_W
    a_lit, lc_lits = _hll_literals()
    lc_list = ", ".join(lc_lits)
    return f"""
    WITH b AS (
      SELECT {group_col} AS grp,
             h // {1 << w_bits} AS bucket, h % {1 << w_bits} AS w
      FROM (SELECT {group_col},
                   CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1,
                        {_HASH_HEX}) AS BIGINT) AS h
            FROM {table_expr}
            WHERE {value_expr} IS NOT NULL)
    ),
    regs AS (
      SELECT grp, bucket,
             max(CASE WHEN w = 0 THEN {w_bits + 1}
                 ELSE {w_bits + 1} - length(bin(w)) END) AS mj
      FROM b GROUP BY grp, bucket
    ),
    pg AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_present,
             CAST(sum(1::BIGINT << ({_HLL_SHIFT} - mj)) AS BIGINT)
               AS z_present
      FROM regs GROUP BY grp
    ),
    est AS (
      SELECT grp, {m} - n_present AS v_empty,
             z_present + ({m} - n_present) * {1 << _HLL_SHIFT} AS z_scaled
      FROM pg
    )
    SELECT grp AS {group_col},
           CAST(v_empty AS BIGINT) AS v_empty,
           CAST(z_scaled AS BIGINT) AS z_scaled,
           CAST(floor(
             CASE WHEN v_empty > 0
                       AND {a_lit} / CAST(z_scaled AS DOUBLE) <= {2.5 * m}
                  THEN ([{lc_list}]::DOUBLE[])[CAST(v_empty AS INTEGER)]
                  ELSE {a_lit} / CAST(z_scaled AS DOUBLE) END * 10000.0
           ) AS BIGINT) / 10000.0 AS hll_estimate
    FROM est
    """


# ---------------------------------------------------------------------------
# Bottom-k uniform sample → quantile sketch.
#
# Keep the k rows with the SMALLEST 48-bit hash of a unique row key per
# group: a uniform without-replacement sample whose membership is a pure
# function of the key set — order-independent, split-independent, and
# MERGEABLE (bottom-k of a union = bottom-k of the union of bottom-ks),
# the same property that makes KMV a viable streaming store. Quantiles
# of the retained sample estimate quantiles of the full distribution
# with the usual sqrt(k) sampling error, but unlike t-digest/KLL the
# construction is deterministic integer/hash arithmetic, so the Spark
# plan and the DuckDB oracle agree bit-for-bit.
#
# Scale design: the shuffle carries (grp, key, v) after a map-side
# combinable distinct; ONE window pass per group ranks hashes; store
# state is O(groups × k) forever. For very hot groups the row_number
# can be swapped for a two-stage min-k (per-partition slice then
# global) — same result, bounded memory.
# ---------------------------------------------------------------------------


def bottomk_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    *,
    k: int = 32,
) -> DataFrame:
    """(grp, key, v, h): the k rows with the smallest 48-bit key hash
    per group. `key_col` must be a (per-group) unique row id — ties on
    (h, key, v) are broken deterministically so duplicate feeds
    (streaming replay) collapse under distinct()."""
    base = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).cast("long").alias("key"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(F.col("key").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .withColumn("h", hash48(F.col("key")))
    )
    w = Window.partitionBy("grp").orderBy("h", "key", "v")
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_quantiles(
    sample: DataFrame,
    percents: list[int],
    *,
    value_scale: int = 1,
) -> DataFrame:
    """Type-1 (no-interpolation) quantiles of a bottom-k sample: the
    value at row ceil(p·n/100) when the sample is ordered by (v, key).
    Integer position arithmetic ((p·n + 99) div 100) and floor-scaled
    bigint outputs keep the result exactly portable across engines.
    The single definition shared by the batch sketch entry and the
    streaming store reader, so the two can never drift."""
    n = sample.groupBy("grp").agg(F.count(F.lit(1)).alias("n_sample"))
    w = Window.partitionBy("grp").orderBy("v", "key")
    ranked = sample.withColumn("_vr", F.row_number().over(w)).join(n, "grp")
    aggs = [
        F.max(
            F.when(
                F.col("_vr") == F.expr(f"({p} * n_sample + 99) div 100"),
                F.floor(F.col("v") * F.lit(float(value_scale))).cast("long"),
            )
        ).alias(f"p{p}")
        for p in percents
    ]
    return ranked.groupBy("grp", "n_sample").agg(*aggs).orderBy("grp")


def bottomk_quantile_oracle_sql(
    table: str,
    group_expr: str,
    key_expr: str,
    value_expr: str,
    *,
    k: int,
    percents: list[int],
    value_scale: int = 1,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of bottomk_sample + sample_quantiles — the same
    distinct → hash-rank → truncate → value-rank pipeline restated
    over the raw table, for batch entries AND split-fed streaming
    stores (bottom-k mergeability makes the result feed-independent)."""
    cols = ",\n           ".join(
        f"max(CASE WHEN vr = ({p} * n_sample + 99) // 100"
        f" THEN CAST(floor(v * {value_scale}) AS BIGINT) END) AS p{p}"
        for p in percents
    )
    return f"""
    WITH base AS (
      SELECT DISTINCT {group_expr} AS grp,
             CAST({key_expr} AS BIGINT) AS key,
             CAST({value_expr} AS DOUBLE) AS v
      FROM {table}
      WHERE ({where}) AND {key_expr} IS NOT NULL AND {value_expr} IS NOT NULL
    ),
    hashed AS (
      SELECT grp, key, v,
             CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, {_HASH_HEX})
                  AS BIGINT) AS h
      FROM base
    ),
    kept AS (
      SELECT grp, key, v FROM (
        SELECT grp, key, v,
               row_number() OVER (PARTITION BY grp ORDER BY h, key, v) AS rn
        FROM hashed)
      WHERE rn <= {k}
    ),
    n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_sample FROM kept GROUP BY grp),
    ord AS (
      SELECT grp, key, v,
             row_number() OVER (PARTITION BY grp ORDER BY v, key) AS vr
      FROM kept
    )
    SELECT ord.grp AS grp, n.n_sample AS n_sample,
           {cols}
    FROM ord JOIN n ON ord.grp = n.grp
    GROUP BY 1, 2
    ORDER BY grp
    """
