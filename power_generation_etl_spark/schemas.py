"""Declarative per-source schemas for the 8 power-generation feeds.

Semantic parity with the reference's validation schemas
(reference src/validator.py:123-276) and SQL DDL (schema/*.sql):
each field carries a JSON-type constraint from the reference's small
type algebra plus an optional value rule; each source declares its
in-file duplicate key (first-wins dedup) and its stored natural key
(idempotent-append uniqueness), including the COALESCE('')
normalization used for nullable key parts
(reference schema/ons_generation.sql:49-50 etc.).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- type algebra (reference src/validator.py:326-362) ----------------------
# 'int'    : JSON integer (bool is NOT int)
# 'float'  : JSON number  (int accepted as float; bool and numeric strings rejected)
# 'str'    : JSON string
# 'bool'   : JSON boolean
# 'int_or_str', '*_or_null', 'str_or_null_or_number' — unions as named.

# --- value rules (reference src/validator.py:364-388) -----------------------
# 'uuid', 'positive_timestamp', 'non_empty', 'state_code',
# 'non_negative', 'positive', 'lat', 'lon'

UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

# 50 states + DC + territories (reference src/validator.py:23-81).
US_STATE_CODES = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
    "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
    "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
    "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
    "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY",
    "DC", "AS", "GU", "MP", "PR", "VI",
]


@dataclass(frozen=True)
class Field:
    name: str
    ftype: str
    required: bool = True
    rule: str | None = None


@dataclass(frozen=True)
class SourceSchema:
    source: str
    table: str
    fields: tuple[Field, ...]
    duplicate_key: tuple[str, ...]
    # natural-key columns; names in null_coalesced are compared through
    # COALESCE(col, '') for stored-uniqueness (D2).
    natural_key: tuple[str, ...] = ()
    null_coalesced: frozenset[str] = field(default_factory=frozenset)

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def fields_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def spark_type(self, f: Field) -> T.DataType:
        base = f.ftype.replace("_or_null", "")
        if base in ("int",):
            return T.LongType()
        if base in ("float",):
            return T.DoubleType()
        if base in ("bool",):
            return T.BooleanType()
        # str, int_or_str, str_or_null_or_number → stored as string
        return T.StringType()

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, self.spark_type(f), True) for f in self.fields]
        )


_META = (
    Field("extraction_run_id", "str", True, "uuid"),
    Field("created_at_ms", "int", True, "positive_timestamp"),
    Field("timestamp_ms", "int", True, "positive_timestamp"),
)

# Reference src/validator.py:123-137; schema/npp_generation.sql:17-40.
NPP = SourceSchema(
    source="npp",
    table="npp_generation",
    fields=_META
    + (
        Field("plant", "str", True, "non_empty"),
        Field("plant_and_unit", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("unit", "str_or_null_or_number", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "plant_and_unit"),
    natural_key=("timestamp_ms", "plant_and_unit"),
)

# Reference src/validator.py:139-159; schema/eia_generation.sql:16-48.
EIA = SourceSchema(
    source="eia",
    table="eia_generation_data",
    fields=_META
    + (
        Field("utility_id", "int_or_str", True),
        Field("plant_code", "int_or_str", True),
        Field("generator_id", "int_or_str", True),
        Field("state", "str", True, "state_code"),
        Field("prime_mover", "str", True, "non_empty"),
        Field("net_generation_mwh", "float", True, "non_negative"),
        Field("fuel_source", "str_or_null", False),
        Field("energy_source", "str_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
        Field("in_gcpt_crosswalk", "bool_or_null", False),
        Field("eia_plant_unit_id", "str_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "plant_code", "generator_id"),
    natural_key=("timestamp_ms", "plant_code", "generator_id"),
)

# Reference src/validator.py:161-176; schema/entsoe_generation.sql:16-42.
ENTSOE = SourceSchema(
    source="entsoe",
    table="entsoe_generation_data",
    fields=_META
    + (
        Field("country_code", "str", True, "non_empty"),
        Field("psr_type", "str", True, "non_empty"),
        Field("plant_name", "str", True, "non_empty"),
        Field("fuel_type", "str", True, "non_empty"),
        Field("data_type", "str", True, "non_empty"),
        Field("generation_mw", "float", True, "non_negative"),
        Field("resolution_minutes", "int", True, "positive"),
    ),
    duplicate_key=("timestamp_ms", "country_code", "psr_type", "plant_name"),
    natural_key=("timestamp_ms", "country_code", "psr_type", "plant_name"),
)

# Reference src/validator.py:178-199; schema/ons_generation.sql:5-36.
ONS = SourceSchema(
    source="ons",
    table="ons_generation_data",
    fields=_META
    + (
        Field("plant", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("ons_plant_id", "str_or_null", False),
        Field("plant_type", "str_or_null", False),
        Field("fuel_type", "str_or_null", False),
        Field("subsystem_id", "str_or_null", False),
        Field("subsystem", "str_or_null", False),
        Field("state", "str_or_null", False),
        Field("state_name", "str_or_null", False),
        Field("operation_mode", "str_or_null", False),
        Field("ceg", "str_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "plant", "ons_plant_id"),
    natural_key=("timestamp_ms", "plant", "ons_plant_id"),
    null_coalesced=frozenset({"ons_plant_id"}),
)

# Reference src/validator.py:201-216; schema/oe_generation.sql:5-31.
OE = SourceSchema(
    source="oe",
    table="oe_generation_data",
    fields=_META
    + (
        Field("network_code", "str", True, "non_empty"),
        Field("fueltech", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("network_region", "str_or_null", False),
        Field("fueltech_group", "str_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "fueltech", "network_code"),
    natural_key=("timestamp_ms", "fueltech", "network_code"),
)

# Reference src/validator.py:238-258; schema/oe_facility_generation.sql:6-50.
OE_FACILITY = SourceSchema(
    source="oe_facility",
    table="oe_facility_generation_data",
    fields=_META
    + (
        Field("network_code", "str", True, "non_empty"),
        Field("facility_code", "str", True, "non_empty"),
        Field("facility_name", "str", True, "non_empty"),
        Field("fueltech", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("network_region", "str_or_null", False),
        Field("fueltech_group", "str_or_null", False),
        Field("latitude", "float_or_null", False, "lat"),
        Field("longitude", "float_or_null", False, "lon"),
        Field("capacity_registered_mw", "float_or_null", False),
        Field("emissions_factor_co2", "float_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "facility_code", "fueltech"),
    natural_key=("timestamp_ms", "facility_code", "fueltech"),
)

# Reference src/validator.py:218-236; schema/occto_generation.sql:7-32.
OCCTO = SourceSchema(
    source="occto",
    table="occto_generation_data",
    fields=_META
    + (
        Field("plant", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("unit", "str_or_null", False),
        Field("plant_code", "str_or_null", False),
        Field("fuel_code", "str_or_null", False),
        Field("fuel_type", "str_or_null", False),
        Field("area_code", "str_or_null", False),
        Field("area_name", "str_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "plant", "unit"),
    natural_key=("timestamp_ms", "plant", "unit"),
    null_coalesced=frozenset({"unit"}),
)

# Reference src/validator.py:260-276; schema/chile_generation.sql:7-31.
CHILE = SourceSchema(
    source="chile",
    table="chile_generation_data",
    fields=_META
    + (
        Field("plant", "str", True, "non_empty"),
        Field("generation_mwh", "float", True, "non_negative"),
        Field("chile_plant_id", "str_or_null", False),
        Field("fuel_type", "str_or_null", False),
        Field("region", "str_or_null", False),
        Field("comuna", "str_or_null", False),
        Field("resolution_minutes", "int_or_null", False),
    ),
    duplicate_key=("timestamp_ms", "plant", "chile_plant_id"),
    natural_key=("timestamp_ms", "plant", "chile_plant_id"),
    null_coalesced=frozenset({"chile_plant_id"}),
)

SOURCES: dict[str, SourceSchema] = {
    s.source: s for s in (NPP, EIA, ENTSOE, ONS, OE, OE_FACILITY, OCCTO, CHILE)
}

KNOWN_TABLES: dict[str, str] = {s.source: s.table for s in SOURCES.values()}

# Lineage table (reference schema/extraction_metadata.sql:15-41).
EXTRACTION_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("extraction_run_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("extraction_timestamp", T.TimestampType(), True),
        T.StructField("start_date", T.DateType(), True),
        T.StructField("end_date", T.DateType(), True),
        T.StructField("total_records", T.LongType(), True),
        T.StructField("failed_count", T.LongType(), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("failed_details", T.StringType(), True),  # JSON
        T.StructField("config_snapshot", T.StringType(), True),  # JSON
        T.StructField("source_urls", T.StringType(), True),  # JSON
        T.StructField("extraction_duration_seconds", T.LongType(), True),
    ]
)

# Dimension tables (reference schema/eia_generator_info.sql:4-13,
# schema/gcpt_coal_metadata.sql:4-15).
EIA_GENERATOR_INFO_SCHEMA = T.StructType(
    [
        T.StructField("plant_code", T.StringType(), False),
        T.StructField("generator_id", T.StringType(), False),
        T.StructField("technology", T.StringType(), True),
        T.StructField("prime_mover", T.StringType(), True),
        T.StructField("energy_source_1", T.StringType(), True),
        T.StructField("nameplate_capacity_mw", T.DoubleType(), True),
    ]
)

GCPT_COAL_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("gcpt_unit_id", T.StringType(), False),
        T.StructField("eia_unit_id", T.StringType(), True),
        T.StructField("plant_name", T.StringType(), True),
        T.StructField("unit_name", T.StringType(), True),
        T.StructField("coal_type", T.StringType(), True),
        T.StructField("technology", T.StringType(), True),
        T.StructField("capacity_mw", T.DoubleType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)
