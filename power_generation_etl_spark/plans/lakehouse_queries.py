"""Lakehouse write-path catalog queries — MERGE upsert + versioned
snapshots + change-data-feed under the exact oracle.

The TableStore's time-travel surface (versioned overwrite archives,
`read_version`, `diff_versions`, `merge_upsert`) is pytest-covered in
tests/test_timetravel.py; this entry runs the WHOLE write path inside
a catalog query so the external DuckDB gate checks it end-to-end:

  base snapshot → MERGE a deterministic change batch (updates +
  inserts) → diff the archived version against the current table →
  aggregate the change feed.

The oracle predicts the change feed from `orders` alone: every row the
MERGE updated must surface as one delete (old image) + one insert (new
image), every inserted key as one insert, and — the half that catches
real bugs — NOTHING ELSE: an unchanged row leaking into the feed
(botched multiset diff), a lost update (tie-break regression), or a
double-applied change all break the counts.

Scale note: `merge_upsert` is one window shuffle on the key + an
atomic overwrite (partition-pruned in the production monthly form);
`diff_versions` is two exceptAll anti-joins — both plain shuffle
shapes. The temp warehouse is per-call and removed before returning;
the returned feed aggregate is ≤ (statuses+2) rows, localized so no
plan references the deleted directory.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.plans.queries import T, _register
from power_generation_etl_spark.store import TableStore

_OUT_SCHEMA = "change string, status string, n long"


@_register(
    "cdc_version_diff",
    """
    SELECT change, status, CAST(n AS BIGINT) AS n FROM (
      SELECT 'delete' AS change, o_orderstatus AS status, count(*) AS n
      FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 2
      UNION ALL
      SELECT 'insert', 'X', count(*) FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT 'insert', 'N', count(*) FROM orders WHERE o_orderkey % 97 = 0
    )
    WHERE n > 0
    ORDER BY change, status
    """,
)
def cdc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned MERGE round-trip: snapshot orders' (key, status) into
    a versioned TableStore, MERGE a change batch (keys %7==0 →
    status 'X'; fresh negative keys for %97==0 → status 'N'), then
    read the change-data-feed between the archived v1 and the current
    table and count rows per (change-tag, status). The update half of
    the MERGE must appear as delete(old status)+insert('X') pairs, the
    insert half as insert('N') — and unchanged rows must NOT appear.
    The feed aggregate is tiny (≤ statuses+2 rows), so it is localized
    and the temp warehouse removed before returning."""
    base = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumn("ver", F.lit(0).cast("long"))
    )
    changes = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .unionByName(
            base.filter(F.col("o_orderkey") % 97 == 0).select(
                # strictly negative (keys are ≥ 0 and include 0, whose
                # bare negation would collide with its own update row)
                (-F.col("o_orderkey") - 1).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("ver"),
            )
        )
        .withColumn("ver", F.lit(1).cast("long"))
    )
    wh = tempfile.mkdtemp(prefix="cdc_wh_")
    try:
        store = TableStore(spark, wh, versioned=True)
        store.overwrite("orders_snap", base)
        store.merge_upsert(
            "orders_snap", changes, keys=["o_orderkey"], order_col="ver"
        )
        if 1 not in store.versions("orders_snap"):  # empty base: no archive
            return spark.createDataFrame([], _OUT_SCHEMA)
        rows = (
            store.diff_versions("orders_snap", 1)
            .groupBy(
                F.col("_change").alias("change"),
                F.col("o_orderstatus").alias("status"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    rows = sorted(
        ((r["change"], r["status"], r["n"]) for r in rows),
        key=lambda t: (t[0], t[1]),
    )
    return spark.createDataFrame(rows, _OUT_SCHEMA)
