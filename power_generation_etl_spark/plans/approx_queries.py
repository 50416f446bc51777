"""Approximate-structure catalog queries — Bloom pre-filter join,
Count-Min frequency estimates, KMV set-operation estimates. Every entry
is deterministic integer arithmetic over portable md5-slice hashes, so
each sketch has an exact DuckDB oracle (same construction, same
estimates, bit-for-bit) — approximate with respect to the data, exact
with respect to the algorithm.

Beyond-reference family (the reference has no approximate structures);
extends `operators/sketch.py` / `operators/bloom.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import bloom as bl
from power_generation_etl_spark.operators import sketch as sk
from power_generation_etl_spark.plans.queries import T, _register

# ---------------------------------------------------------------------------
# Bloom pre-filter join: orders probed against a Bloom filter of the
# BUILDING-segment customer keys. At 100 TB the filter is an O(m)-bit
# driver constant compiled into the probe-side scan projection — rows
# that can't match die inside the scan stage with ZERO shuffle/join
# cost; only candidates (members + the ~(1-e^(-kn/m))^k false-positive
# tail) reach the exact join. m/k are sized here to leave a visible
# false-positive count at test scale.
# ---------------------------------------------------------------------------

_BLOOM_M, _BLOOM_K = 3072, 3

_BLOOM_POS = [bl.bloom_position_sql("o_custkey", i, _BLOOM_M) for i in range(_BLOOM_K)]
_BLOOM_KEYPOS = [
    bl.bloom_position_sql("c_custkey", i, _BLOOM_M) for i in range(_BLOOM_K)
]


@_register(
    "bloom_prefilter_orders",
    f"""
    WITH keys AS (
        SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    pos AS (
        SELECT DISTINCT p FROM (
            SELECT {_BLOOM_KEYPOS[0]} AS p FROM keys
            UNION ALL SELECT {_BLOOM_KEYPOS[1]} FROM keys
            UNION ALL SELECT {_BLOOM_KEYPOS[2]} FROM keys
        )
    ),
    flags AS (
        SELECT ({_BLOOM_POS[0]} IN (SELECT p FROM pos)
                AND {_BLOOM_POS[1]} IN (SELECT p FROM pos)
                AND {_BLOOM_POS[2]} IN (SELECT p FROM pos)) AS is_cand,
               (o_custkey IN (SELECT c_custkey FROM keys)) AS is_member
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(count(*) FILTER (is_cand) AS BIGINT) AS n_candidates,
           CAST(count(*) FILTER (is_member) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (is_cand AND NOT is_member) AS BIGINT)
               AS n_false_pos
    FROM flags
    """,
)
def bloom_prefilter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    words = bl.build_bloom_words(keys, "c_custkey", m=_BLOOM_M, k=_BLOOM_K)
    member = keys.withColumn("is_member", F.lit(True))
    flagged = (
        T(spark, sf_dir, "orders")
        .select("o_custkey")
        .withColumn(
            "is_cand",
            bl.bloom_member_expr(F.col("o_custkey"), words, m=_BLOOM_M, k=_BLOOM_K),
        )
        .join(F.broadcast(member), F.col("o_custkey") == member.c_custkey, "left")
        .withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(False)))
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.count_if(F.col("is_cand")).alias("n_candidates"),
        F.count_if(F.col("is_member")).alias("n_members"),
        F.count_if(F.col("is_cand") & ~F.col("is_member")).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# Count-Min heavy hitters: estimate per-customer order counts from a
# d×w counter table (O(d·w) space, independent of key cardinality) and
# compare against the exact counts for the top 20 keys. est ≥ exact
# always; the overcount column makes the collision error visible. The
# counter build is ONE map-side-combined aggregation; the point queries
# join ≤ d·w counters broadcast.
# ---------------------------------------------------------------------------

_CMS_W, _CMS_D = 1024, 3
_CMS_TOP = 20

_CMS_CELLS = " UNION ALL ".join(
    f"SELECT {j} AS j, {sk.cms_position_sql('o_custkey', j, _CMS_W)} AS pos "
    "FROM orders WHERE o_custkey IS NOT NULL"
    for j in range(_CMS_D)
)
_CMS_PROBE = " UNION ALL ".join(
    f"SELECT o_custkey, {j} AS j, {sk.cms_position_sql('o_custkey', j, _CMS_W)} AS pos "
    "FROM top"
    for j in range(_CMS_D)
)


@_register(
    "cms_custkey_counts",
    f"""
    WITH cells AS (
        SELECT j, pos, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_CMS_CELLS}) GROUP BY j, pos
    ),
    exact AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM orders GROUP BY o_custkey
    ),
    top AS (
        SELECT * FROM exact ORDER BY exact_cnt DESC, o_custkey LIMIT {_CMS_TOP}
    ),
    est AS (
        SELECT t.o_custkey, min(c.cnt) AS cms_est
        FROM ({_CMS_PROBE}) t
        JOIN cells c ON c.j = t.j AND c.pos = t.pos
        GROUP BY t.o_custkey
    )
    SELECT top.o_custkey, exact_cnt, cms_est,
           cms_est - exact_cnt AS overcount
    FROM top JOIN est ON top.o_custkey = est.o_custkey
    ORDER BY exact_cnt DESC, top.o_custkey
    """,
)
def cms_custkey_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").select("o_custkey")
    counters = sk.cms_counters(orders, "o_custkey", w=_CMS_W, d=_CMS_D)
    exact = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "o_custkey").limit(_CMS_TOP)
    est = sk.cms_estimate(
        counters, top.select("o_custkey"), "o_custkey", w=_CMS_W, d=_CMS_D
    )
    return (
        top.join(est, "o_custkey")
        .select(
            "o_custkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "o_custkey")
    )


# ---------------------------------------------------------------------------
# KMV set operations: distinct-user overlap between the click and
# purchase audiences estimated from ONE merged k-minimum-values sketch —
# est_union from the k-th smallest hash, est_overlap from the fraction
# of the k minima belonging to both sides (ρ·est_union). The estimate
# state is k hashes + two flag bits each, mergeable across partitions /
# batches; exact counts ride along to make the error visible. At scale
# the global min-k rank runs two-stage (per-partition min-k first,
# `kmv_distinct(two_stage=True)` pattern) — at catalog scale the
# single-window form keeps the oracle one CTE shorter.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SCALE = (_KMV_K - 1) << 48


@_register(
    "kmv_user_overlap",
    f"""
    WITH flags AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
        FROM events
        WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    exact AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_union,
               CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS exact_overlap
        FROM flags
    ),
    hflags AS (
        SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
                   AS h,
               max(in_a) AS in_a, max(in_b) AS in_b
        FROM flags GROUP BY 1
    ),
    ranked AS (
        SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn FROM hflags
    ),
    kstats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_in_k,
               CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS n_both_k,
               max(CASE WHEN rn = {_KMV_K} THEN h END) AS h_k
        FROM ranked WHERE rn <= {_KMV_K}
    ),
    hl AS (SELECT CAST(count(*) AS BIGINT) AS n_hashes FROM hflags)
    SELECT exact_union,
           CAST(CASE WHEN n_hashes < {_KMV_K} THEN n_hashes
                     ELSE {_KMV_SCALE} // h_k END AS BIGINT) AS est_union,
           exact_overlap,
           CAST(CASE WHEN n_in_k = 0 THEN 0
                     ELSE (n_both_k * (CASE WHEN n_hashes < {_KMV_K} THEN n_hashes
                                            ELSE {_KMV_SCALE} // h_k END))
                          // n_in_k END AS BIGINT) AS est_overlap
    FROM exact, kstats, hl
    """,
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
    )
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
    )
    exact = flags.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("bigint")
        .alias("exact_overlap"),
    )
    hflags = flags.groupBy(sk.hash48(F.col("user_id")).alias("h")).agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    # Bottom-k selection via orderBy().limit(K): compiles to
    # TakeOrderedAndProject — each partition keeps a local K-row heap,
    # only K rows per partition reach the driver-side merge. The input
    # to the (implicit) global order is never materialized in one task,
    # unlike a row_number() window over all O(distinct users) hashes.
    # h_k = max(h) of the kept set == the K-th smallest hash whenever
    # n_hashes >= K; when n_hashes < K the estimate's CASE ignores h_k.
    topk = hflags.orderBy("h").limit(_KMV_K)
    kstats = topk.agg(
        F.count(F.lit(1)).alias("n_in_k"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("bigint")
        .alias("n_both_k"),
        F.max("h").alias("h_k"),
    )
    hl = hflags.agg(F.count(F.lit(1)).alias("n_hashes"))
    est_union = F.expr(
        f"CAST(CASE WHEN n_hashes < {_KMV_K} THEN n_hashes"
        f" ELSE {_KMV_SCALE} div h_k END AS BIGINT)"
    )
    est_overlap = F.expr(
        f"CAST(CASE WHEN n_in_k = 0 THEN 0"
        f" ELSE (n_both_k * (CASE WHEN n_hashes < {_KMV_K} THEN n_hashes"
        f"                       ELSE {_KMV_SCALE} div h_k END))"
        f"      div n_in_k END AS BIGINT)"
    )
    return (
        exact.crossJoin(kstats)
        .crossJoin(hl)
        .select(
            "exact_union",
            est_union.alias("est_union"),
            "exact_overlap",
            est_overlap.alias("est_overlap"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type, reported against the
# exact count. Registers are integer-exact; the raw-estimate division
# and linear-counting branch use driver libm literals (sketch.py), so
# the estimate hashes identically across engines.
# ---------------------------------------------------------------------------


@_register(
    "hll_distinct_users",
    f"""
    WITH hll AS ({sk.hll_oracle_sql("events", "event_type", "user_id")}),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT hll.event_type, exact.exact_distinct, hll.v_empty,
           hll.z_scaled, hll.hll_estimate
    FROM hll JOIN exact ON hll.event_type = exact.event_type
    ORDER BY hll.event_type
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("event_type", "user_id")
    hll = sk.hll_distinct(ev, "event_type", "user_id")
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return (
        hll.join(exact, "event_type")
        .select("event_type", "exact_distinct", "v_empty", "z_scaled", "hll_estimate")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Bottom-k sample quantile sketch (r11): the mergeable quantile summary
# that completes the sketch family (KMV distinct / CMS frequency / HLL
# cardinality / MG heavy hitters / bottom-k quantiles). Membership is a
# pure function of the key set (k smallest 48-bit key hashes per
# group), so the estimate is order/split/partitioning-independent and
# the DuckDB oracle reproduces it bit-for-bit. At 100 TB the sketch is
# one map-side-combinable distinct + one per-group window over ≤k
# surviving rows per partition; state is O(groups × k).
# ---------------------------------------------------------------------------

_BKQ_K = 32
_BKQ_PCTS = [25, 50, 75, 90]


@_register(
    "bottomk_quantile_orders",
    sk.bottomk_quantile_oracle_sql(
        "orders",
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        k=_BKQ_K,
        percents=_BKQ_PCTS,
    ),
)
def bottomk_quantile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantile estimates per priority from a bottom-k
    hash sample of order keys — the batch face of the quantile sketch
    whose streaming store twin is `stream_quantile_store`."""
    samp = sk.bottomk_sample(
        T(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        k=_BKQ_K,
    )
    return sk.sample_quantiles(samp, _BKQ_PCTS)


# ---------------------------------------------------------------------------
# Bitmap-index distinct counting (r11 fourth wave) — the roaring-bitmap
# OLAP pattern in pure codegen SQL: user ids land in 62-bit words
# (word = id div 62, bit = id % 62 — 62 keeps the sign bit and the
# 1<<63 overflow out of both engines' shift semantics), per
# (event_type, word) masks fold with the associative/commutative/
# idempotent bit_or, and distinct = Σ bit_count(mask). Masks are
# MERGEABLE state (unlike count(distinct): per-type masks OR together
# into the overall count without re-touching rows) and O(id-domain/62)
# per group — the exact-distinct twin of the KMV/HLL sketch entries,
# the right structure when the id space is dense. The oracle checks
# the mask algebra against plain count(DISTINCT ...) per type AND for
# the cross-type rollup computed by merging the per-type masks.
# ---------------------------------------------------------------------------


@_register(
    "bitmap_distinct_users",
    """
    WITH t AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(count(DISTINCT user_id // 62) AS BIGINT) AS n_words
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type
    ),
    a AS (
      SELECT '__all__' AS event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(count(DISTINCT user_id // 62) AS BIGINT) AS n_words
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT * FROM (SELECT * FROM t UNION ALL SELECT * FROM a WHERE n_words > 0)
    ORDER BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.expr("user_id div 62").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))"
            ).alias("bit"),
        )
    )
    masks = ev.groupBy("event_type", "word").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    per_type = masks.groupBy("event_type").agg(
        F.expr("CAST(sum(bit_count(mask)) AS BIGINT)").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    merged = masks.groupBy("word").agg(F.expr("bit_or(mask)").alias("mask"))
    overall = merged.agg(
        F.lit("__all__").alias("event_type"),
        F.expr("CAST(sum(bit_count(mask)) AS BIGINT)").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    ).where(F.col("n_words") > 0)
    return per_type.unionByName(overall).orderBy("event_type")
