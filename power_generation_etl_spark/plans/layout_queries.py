"""Data-layout catalog queries — the Z-order clustering key under the
exact oracle.

`store.py::morton_key` powers `TableStore.cluster_write` (the
OPTIMIZE ... ZORDER-style maintenance rewrite) and is verified for its
file-skipping effect in tests/test_zorder.py. This entry puts the key
COMPUTATION itself under the DuckDB oracle: both engines normalize the
two dimensions with the same equi-width min/max formula (identical
IEEE double operations, so the floor/bucket boundaries agree
bit-for-bit) and bit-interleave with the same shift/mask algebra.

Why it matters at 100 TB: clustering quality is entirely determined by
this key — a subtly wrong interleave still "works" (files get written,
queries stay correct) while silently destroying min/max pruning on the
secondary dimension. An exact cross-engine oracle over every bucket
count catches that class of bug; the pytest file-range check catches
the layout half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.plans.queries import T, _register
from power_generation_etl_spark.store import morton_key

_BITS = 16
_BUCKET_SHIFT = 2 * _BITS - 6  # 64 buckets over the 32-bit key space


def _sql_interleave(n0: str, n1: str, bits: int) -> str:
    """DuckDB mirror of morton_key's shift/mask interleave: column j's
    bit i lands at key bit i*n + j."""
    terms = []
    for i in range(bits):
        terms.append(f"((({n0} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({n1} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


# Mirrors morton_key's normalization INCLUDING its degenerate-column
# guard (mx <= mn → norm 0): without the CASE, DuckDB computes
# 65536.0/0.0 = NULL and least(NULL, 65535) = 65535, silently putting
# every row of a constant column in the TOP bucket while Spark puts
# them in bucket 0. The NULL arm mirrors morton_key's `mn is None`
# branch (all-NULL column): `NULL <= NULL` is NULL, so without it the
# CASE would fall through and yield NULL keys where Spark yields 0.
_NORM = (
    "CASE WHEN {mn} IS NULL OR {mx} <= {mn} THEN 0 ELSE "
    "least(CAST(floor((CAST({col} AS DOUBLE) - {mn}) * "
    f"({float(1 << _BITS)} / ({{mx}} - {{mn}}))) AS BIGINT), {(1 << _BITS) - 1})"
    " END"
)


@_register(
    "zorder_bucket_stats",
    f"""
    WITH s AS (
      SELECT CAST(min(o_custkey) AS DOUBLE) AS mn0,
             CAST(max(o_custkey) AS DOUBLE) AS mx0,
             CAST(min(o_orderkey) AS DOUBLE) AS mn1,
             CAST(max(o_orderkey) AS DOUBLE) AS mx1
      FROM orders
    ),
    n AS (
      SELECT {_NORM.format(col="o_custkey", mn="s.mn0", mx="s.mx0")} AS n0,
             {_NORM.format(col="o_orderkey", mn="s.mn1", mx="s.mx1")} AS n1
      FROM orders, s
    ),
    k AS (SELECT {_sql_interleave("n0", "n1", _BITS)} AS zkey FROM n)
    SELECT zkey >> {_BUCKET_SHIFT} AS z_bucket,
           count(*) AS n_rows,
           min(zkey) AS min_key,
           max(zkey) AS max_key
    FROM k
    GROUP BY 1
    ORDER BY z_bucket
    """,
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key over (o_custkey, o_orderkey) at 16
    bits/dimension — the exact key `TableStore.cluster_write` range-
    partitions and sorts by — rolled up into 64 key-space buckets.
    The oracle recomputes the equi-width normalization (same IEEE
    double formula, same driver-side min/max) and the full 32-bit
    interleave in SQL, so any drift in the key algebra shows up as a
    value-hash mismatch on every bucket. One stats job + one scan +
    one 64-group aggregate; at 100 TB the stats job is a columnar
    min/max over two pruned columns and everything else is map-side."""
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    key = morton_key(orders, ["o_custkey", "o_orderkey"], bits=_BITS)
    return (
        orders.select(key.alias("zkey"))
        .groupBy(
            F.shiftright(F.col("zkey"), _BUCKET_SHIFT).alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zkey").alias("min_key"),
            F.max("zkey").alias("max_key"),
        )
        .orderBy("z_bucket")
    )
