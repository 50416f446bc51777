"""Lakehouse write-path catalog queries — MERGE upsert + versioned
snapshots + change-data-feed under the exact oracle.

The TableStore's time-travel surface (versioned overwrite archives,
`read_version`, `diff_versions`, `merge_upsert`) is pytest-covered in
tests/test_timetravel.py; these entries run the WHOLE write path inside
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

Two entries share the oracle byte-for-byte (r10):
  * `cdc_version_diff` applies the change batch with a direct
    `merge_upsert` call (the batch MERGE path);
  * `stream_cdc_apply_feed` stages the SAME change batch as JSON files
    in a landing dir and applies it through a REAL Structured
    Streaming run (`streaming.ingest.stream_cdc_apply`, foreachBatch →
    merge_upsert, availableNow) — proving streamed apply == batch
    MERGE, because both must hit the identical expected feed.

Scale note: `merge_upsert` is one window shuffle on the key + an
atomic overwrite (partition-pruned in the production monthly form);
`diff_versions` is two exceptAll anti-joins — both plain shuffle
shapes. The temp warehouse is per-call and removed before returning;
the returned feed aggregate is ≤ (statuses+2) rows, localized so no
plan references the deleted directory.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.plans.queries import T, _register
from power_generation_etl_spark.store import TableStore

_OUT_SCHEMA = "change string, status string, n long"

_FEED_SQL = """
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
    """


def _base_and_changes(spark: SparkSession, sf_dir: str):
    """The deterministic MERGE scenario both CDC entries share: base =
    orders' (key, status) at ver 0; changes = keys %7==0 → status 'X'
    (updates) plus fresh strictly-negative keys for %97==0 → status 'N'
    (inserts), all at ver 1."""
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
    return base, changes


def _feed_counts(spark: SparkSession, store: TableStore) -> DataFrame:
    """Aggregate the v1→current change feed into the oracle's shape
    (tiny: ≤ statuses+2 rows — localized before the warehouse dies)."""
    rows = (
        store.diff_versions("orders_snap", 1)
        .groupBy(
            F.col("_change").alias("change"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    rows = sorted(
        ((r["change"], r["status"], r["n"]) for r in rows),
        key=lambda t: (t[0], t[1]),
    )
    return spark.createDataFrame(rows, _OUT_SCHEMA)


@_register("cdc_version_diff", _FEED_SQL)
def cdc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned MERGE round-trip: snapshot orders' (key, status) into
    a versioned TableStore, MERGE the shared change batch, then read
    the change-data-feed between the archived v1 and the current table
    and count rows per (change-tag, status). The update half of the
    MERGE must appear as delete(old status)+insert('X') pairs, the
    insert half as insert('N') — and unchanged rows must NOT appear."""
    base, changes = _base_and_changes(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="cdc_wh_")
    try:
        store = TableStore(spark, wh, versioned=True)
        store.overwrite("orders_snap", base)
        store.merge_upsert(
            "orders_snap", changes, keys=["o_orderkey"], order_col="ver"
        )
        if 1 not in store.versions("orders_snap"):  # empty base: no archive
            return spark.createDataFrame([], _OUT_SCHEMA)
        return _feed_counts(spark, store)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


@_register("stream_cdc_apply_feed", _FEED_SQL)
def stream_cdc_apply_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming twin of `cdc_version_diff` under the BYTE-IDENTICAL
    oracle: the same change batch is staged as JSON files in a landing
    dir and applied through a real Structured Streaming run
    (`streaming.ingest.stream_cdc_apply`: file source → foreachBatch →
    `TableStore.merge_upsert`, trigger=availableNow, checkpointed file
    tracking). Because the oracle predicts the exact v1→current change
    feed, any divergence between streamed apply and batch MERGE —
    a double-applied batch, a lost update through the foreachBatch
    boundary, order-tie regression — fails exactly one of the twins.

    Scale note: this is the production CDC intake shape — exactly-once
    per file from the source's checkpoint, idempotent re-apply from
    merge_upsert's change-wins-ties ordering, and each applied batch is
    an archived snapshot (point-in-time recovery comes free)."""
    from power_generation_etl_spark.streaming.ingest import stream_cdc_apply

    base, changes = _base_and_changes(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="cdc_swh_")
    stage = tempfile.mkdtemp(prefix="cdc_stage_")
    landing = tempfile.mkdtemp(prefix="cdc_landing_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    try:
        store = TableStore(spark, wh, versioned=True)
        store.overwrite("orders_snap", base)
        out = os.path.join(stage, "out")  # write.json refuses an existing dir
        changes.select("o_orderkey", "o_orderstatus", "ver").coalesce(
            1
        ).write.json(out)
        for k, f in enumerate(
            sorted(
                f
                for f in os.listdir(out)
                if f.endswith(".json") and not f.startswith((".", "_"))
            )
        ):
            try:
                os.link(os.path.join(out, f), os.path.join(landing, f"c{k}.json"))
            except OSError:
                shutil.copyfile(
                    os.path.join(out, f), os.path.join(landing, f"c{k}.json")
                )
        q = stream_cdc_apply(
            spark,
            landing,
            store,
            "orders_snap",
            keys=["o_orderkey"],
            order_col="ver",
            schema="o_orderkey long, o_orderstatus string, ver long",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()
        q.stop()
        if 1 not in store.versions("orders_snap"):  # empty base: no batch
            return spark.createDataFrame([], _OUT_SCHEMA)
        return _feed_counts(spark, store)
    finally:
        for d in (wh, stage, landing, ckpt):
            shutil.rmtree(d, ignore_errors=True)
