"""Oracle-gated Structured Streaming catalog queries.

The streaming operator layer (`streaming/ingest.py`, `streaming/
stateful.py`) is exercised by pytest end-to-end, but until now no
catalog entry ran a REAL streaming query under the DuckDB oracle gate.
These entries do: each starts an `availableNow` Structured Streaming
job over the driver's parquet tables inside the query function, waits
for it to finish, and returns the sink contents as a DataFrame whose
values are batch-deterministic — so the ordinary exact oracle applies.

Determinism notes (why these shapes and not others):
* `stream_hourly_event_counts` uses COMPLETE output mode — the memory
  sink holds the full aggregation state after the final micro-batch,
  so the result equals the batch GROUP BY no matter how the file
  source split micro-batches, and no watermark/late-data policy can
  drop rows.
* `stream_dedup_event_counts` feeds the file source a landing dir
  with the SAME events file hard-linked twice, streams it through
  stateful `dropDuplicates` (append mode), and aggregates the sink
  batch-side. Without the dedup state every count would double — the
  oracle's plain per-type counts fail; with it the first-occurrence
  set is exactly the distinct event set regardless of batch split.

Scale notes: both plans are the standard cluster shapes — file-source
listing parallelizes per file; the windowed count is a streaming
partial-agg + state-store merge keyed by (window, type) whose state is
bounded by the key domain, and the dedup state is keyed by event_id
(at 100 TB one would add a watermark + event-time bound on the dedup
key TTL, which availableNow replay here doesn't need). The memory sink
is test/driver plumbing only; production sinks are the parquet/
foreachBatch stores in `streaming/ingest.py`.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.plans.queries import (
    _register,
    ntz_epoch_us,
    ts_to_ntz,
)

_MEM_SEQ = itertools.count()


def _landing(src: str, n_links: int) -> str:
    """Stage a temp landing DIRECTORY holding `n_links` hard links to a
    source parquet table — the streaming file source requires a
    directory (`basePath must be a directory`), and the driver tables
    are single files. A Spark-written source (a DIRECTORY of part
    files, e.g. the empty-table mirrors) is handled by linking each
    contained parquet file. Hard links, so no bytes are copied; falls
    back to a real copy on cross-device temp dirs."""
    landing = tempfile.mkdtemp(prefix="stream_landing_")
    if os.path.isdir(src):
        files = sorted(
            f
            for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        srcs = [os.path.join(src, f) for f in files]
    else:
        srcs = [src]
    for i in range(n_links):
        for k, s in enumerate(srcs):
            dst = os.path.join(landing, f"copy{i}_{k}.parquet")
            try:
                os.link(s, dst)
            except OSError:
                shutil.copyfile(s, dst)
    return landing


def _stream_events(spark: SparkSession, sf_dir_or_path: str):
    """readStream over an events parquet path, normalizing `ts` to
    TIMESTAMP_NTZ holding the file's naive wall-clock via the SAME
    shared helper as the batch T() scan (`queries.ts_to_ntz`) —
    independent of session timezone and of whether the session's
    parquet reader produced epoch-ns bigint (vanilla + nanosAsLong) or
    TIMESTAMP_NTZ (ntz-inferring sessions). The streaming source needs
    an explicit schema, so probe it with a static read."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(sf_dir_or_path)
    return ts_to_ntz(
        spark.readStream.schema(static.schema).parquet(sf_dir_or_path)
    )


def _mem_name(prefix: str) -> str:
    return f"{prefix}_{os.getpid()}_{next(_MEM_SEQ)}"


@_register(
    "stream_hourly_event_counts",
    """
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_us, event_type
    """,
)
def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming windowed aggregation, run for real: file
    source over events.parquet → 1-hour tumbling window × event_type
    count → COMPLETE mode memory sink, trigger=availableNow. The sink
    after termination holds the exact batch GROUP BY result (complete
    mode re-emits full state, so micro-batch boundaries are
    invisible), letting the streaming runtime itself sit under the
    exact DuckDB oracle. Window starts are reported as epoch-µs
    BIGINTs — timezone-free on both engines."""
    name = _mem_name("stream_hourly")
    landing = _landing(f"{sf_dir}/events.parquet", 1)
    try:
        agg = (
            _stream_events(spark, landing)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    schema = "hour_us long, event_type string, n_events long"
    if not spark.catalog.tableExists(name):  # zero micro-batches ran
        return spark.createDataFrame([], schema)
    # Localize the (bounded: hours × types) result and DROP the memory
    # sink — otherwise every invocation in a long session (bench reps,
    # oracle sweeps) pins another copy of the aggregation state. The
    # drop sits in a finally: if the aggregation throws, the temp view
    # (holding the full sink state) must not leak for the session.
    try:
        rows = (
            spark.table(name)
            .select(
                ntz_epoch_us(F.col("w.start")).alias("hour_us"),
                "event_type",
                "n_events",
            )
            .orderBy("hour_us", "event_type")
            .collect()
        )
    finally:
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(
        [(r["hour_us"], r["event_type"], r["n_events"]) for r in rows], schema
    )


@_register(
    "stream_dedup_event_counts",
    """
    SELECT event_type, count(*) AS n_unique_events
    FROM events
    GROUP BY 1
    ORDER BY event_type
    """,
)
def stream_dedup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup under the oracle: the landing dir holds
    the SAME events file twice (hard links — no copy), the stream
    applies dropDuplicates(event_id) in append mode, and each
    micro-batch's deduped output is aggregated INSIDE foreachBatch into
    a per-batch {event_type: count} dict — so the driver-side state is
    O(batches × types), never O(rows) (the earlier memory-sink form
    held one row per unique event). Keying by batch_id keeps the sink
    idempotent: a retried batch overwrites its own counts instead of
    double-adding. The dedup state is what's under test — without it
    every per-type count doubles and the oracle's plain counts
    mismatch. This is the catalog twin of the reference's idempotent
    re-ingest contract (`operators/dedupe.py::anti_join_new_rows` —
    reference src/database.py ON CONFLICT DO NOTHING), restated as
    exactly-once streaming intake."""
    landing = _landing(f"{sf_dir}/events.parquet", 2)
    per_batch: dict[int, dict[str, int]] = {}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        per_batch[int(batch_id)] = {
            r["event_type"]: r["n"]
            for r in batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    try:
        deduped = (
            _stream_events(spark, landing)
            .select("event_id", "event_type")
            .dropDuplicates(["event_id"])
        )
        q = (
            deduped.writeStream.outputMode("append")
            .foreachBatch(_sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    finally:
        shutil.rmtree(landing, ignore_errors=True)
    schema = "event_type string, n_unique_events long"
    totals: dict[str, int] = {}
    for counts in per_batch.values():
        for et, n in counts.items():
            totals[et] = totals.get(et, 0) + int(n)
    return spark.createDataFrame(sorted(totals.items()), schema)
