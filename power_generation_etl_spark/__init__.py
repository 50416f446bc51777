"""power_generation_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``nicholas-abad/power-generation-etl`` (reference at
/root/reference), re-expressed Spark-first:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes);
- zero row-at-a-time Python UDFs in the hot path;
- partition-aware writes and broadcast-aware joins, designed for a
  multi-executor cluster even though tests run on local[*].

Subpackages
-----------
``schemas``     StructType registry for the 8 power-generation sources
                (reference ``src/validator.py:123-276`` + ``schema/*.sql``).
``validation``  Declarative record validation (reference ``src/validator.py``).
``operators``   Dedup (first-wins / idempotent-append / window), similarity
                search, text analysis, multimodal plumbing.
``sources``     JSONL schema-on-read scans, CSV/JSON sinks.
``plans``       Named analytic queries + materialized-view registry.
``streaming``   Structured Streaming incremental ingest/refresh.
"""

from power_generation_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
