from power_generation_etl_spark.plans.queries import ORACLES, QUERIES
from power_generation_etl_spark.plans import llm_queries  # noqa: F401  (registers entries)
from power_generation_etl_spark.plans import temporal_queries  # noqa: F401
from power_generation_etl_spark.plans import hygiene_queries  # noqa: F401
from power_generation_etl_spark.plans import behavior_queries  # noqa: F401
from power_generation_etl_spark.plans import scale_queries  # noqa: F401
from power_generation_etl_spark.plans import approx_queries  # noqa: F401
from power_generation_etl_spark.plans import tpch_queries  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]
