"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every knob here is chosen for the
multi-executor case: AQE for runtime re-planning (skew joins, partition
coalescing), a broadcast threshold that catches dimension tables, and a
UTC session timezone so epoch-ms arithmetic is deterministic across
drivers and executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "power-generation-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for analytic workloads.

    Parameters are overridable for tests; production deployments pass
    ``master=None`` and let spark-submit / the cluster manager decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # the static shuffle-partition count is always wrong for some stage;
        # AQE re-plans from actual map output sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables (nation/region/part, PSR-code maps, crosswalks)
        # must broadcast; 64 MB catches every dim we ship.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deterministic time semantics: the reference stores epoch-ms and
        # treats naive timestamps as UTC (reference src/database.py:633-665).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for the few pandas-interop paths (multimodal UDFs, ANN).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scans: allow vectorized reader + pushdown (defaults, but
        # pinned so a misconfigured cluster profile can't silently disable).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
