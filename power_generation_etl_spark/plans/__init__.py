from power_generation_etl_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
