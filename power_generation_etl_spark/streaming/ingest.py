"""Structured Streaming ingestion + incremental MV maintenance.

The reference is batch-only (SURVEY §2.11): its "streaming ingestion"
is bounded line-batch reading, and its incremental orchestration is a
watermark query + month-chunked re-extraction (src/incremental_extract.py).
This module is the Spark-native upgrade path for both:

- `stream_load`: a file-source stream over a landing directory of
  JSONL drops. Each micro-batch runs the SAME validation + idempotent
  append as the batch path (foreachBatch), so semantics are identical
  and exactly-once per file is inherited from the file source's
  checkpointed file tracking. `Trigger.AvailableNow` turns the same
  query into the reference's catch-up batch job.
- `streaming_monthly_rollup`: event-time tumbling-window aggregation
  with a watermark for late data — the incremental version of the
  monthly MVs (A1-A5): at 100 TB you don't recompute 47.5M-row months,
  you update only the open windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from power_generation_etl_spark.schemas import SOURCES


def stream_load(
    engine,
    source: str,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously load JSONL files dropped into `landing_dir`.

    Uses wholetext file streaming so the per-file fixup/validation
    pipeline (first-record-gated injection, first-wins dedup) keeps its
    file-scoped semantics; foreachBatch routes each discovered file
    through Engine.load_jsonl."""
    spark = engine.spark
    stream = (
        spark.readStream.format("text")
        .option("wholetext", True)
        .schema("value string")
        .load(landing_dir)
        .select(F.input_file_name().alias("path"))
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.select("path").distinct().collect():
            engine.load_jsonl(source, row["path"])

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_monthly_rollup(
    spark: SparkSession,
    events: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time tumbling monthly rollup with late-data watermark —
    the incremental form of mv_<source>_monthly (A1/A3). `events` is a
    streaming DataFrame with (timestamp_ms, fuel_type, generation_mwh)."""
    ts = F.timestamp_millis(F.col("timestamp_ms")).alias("event_time")
    return (
        events.select(ts, "fuel_type", "generation_mwh")
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "30 days").alias("w"), "fuel_type")
        .agg(F.sum("generation_mwh").alias("generation_mwh"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "fuel_type",
            "generation_mwh",
        )
    )
