from power_generation_etl_spark.sources.jsonl import read_jsonl_lines, load_and_validate

__all__ = ["read_jsonl_lines", "load_and_validate"]
