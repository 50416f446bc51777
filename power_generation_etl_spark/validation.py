"""Declarative record validation over raw JSONL — zero Python UDFs.

Semantic parity with the reference validator (reference
src/validator.py:280-524): per-field JSON-type checks with Python-type
fidelity (bool is not int; a numeric string is not a float; int is
accepted as float), value rules, first-error-per-field short-circuit,
first-wins in-file dedup, and the error-report taxonomy
(error_type = text before the first ':').

JSON type fidelity is achieved with Spark 4 VARIANT:
``schema_of_variant(try_variant_get(v, '$.field'))`` yields the real
JSON type (BIGINT / DECIMAL / DOUBLE / STRING / BOOLEAN / VOID-for-null
/ NULL-for-missing), evaluated JVM-side inside whole-stage codegen —
no row-at-a-time Python, so the validation pass scans at parquet/JSON
reader speed at any scale.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from power_generation_etl_spark.schemas import US_STATE_CODES, UUID_RE, Field, SourceSchema

# 24 h future buffer for timestamps (reference src/validator.py:83-85).
MAX_FUTURE_BUFFER_MS = 24 * 60 * 60 * 1000

ORDER_COL = "_order"
FILE_COL = "_file"
VARIANT_COL = "_v"
SKIP_COL = "_skip_reason"


def typ_col(f: str) -> str:
    return f"_typ_{f}"


# --- JSON-type predicates over schema_of_variant output ---------------------

def _is_int(t: Column) -> Column:
    return t == "BIGINT"


def _is_float(t: Column) -> Column:
    return (t == "BIGINT") | (t == "DOUBLE") | t.startswith("DECIMAL")


def _is_str(t: Column) -> Column:
    return t == "STRING"


def _is_bool(t: Column) -> Column:
    return t == "BOOLEAN"


def _is_null(t: Column) -> Column:
    return t == "VOID"


_TYPE_OK: dict[str, callable] = {
    "int": _is_int,
    "float": _is_float,
    "str": _is_str,
    "bool": _is_bool,
    "int_or_str": lambda t: _is_int(t) | _is_str(t),
    "int_or_null": lambda t: _is_int(t) | _is_null(t),
    "float_or_null": lambda t: _is_float(t) | _is_null(t),
    "str_or_null": lambda t: _is_str(t) | _is_null(t),
    "bool_or_null": lambda t: _is_bool(t) | _is_null(t),
    "str_or_null_or_number": lambda t: _is_str(t) | _is_null(t) | _is_float(t),
}

# Phrases mirror the reference's messages (src/validator.py:326-362).
_EXPECTED = {
    "int": "expected int",
    "float": "expected float",
    "str": "expected string",
    "bool": "expected bool",
    "int_or_str": "expected int or string",
    "int_or_null": "expected int or null",
    "float_or_null": "expected float or null",
    "str_or_null": "expected string or null",
    "bool_or_null": "expected bool or null",
    "str_or_null_or_number": "expected string, number, or null",
}

# Extraction target per type-algebra entry: what the stored column is.
_TARGET = {
    "int": "bigint",
    "float": "double",
    "str": "string",
    "bool": "boolean",
    "int_or_str": "string",  # stringified on load (reference src/database.py:975-983)
    "int_or_null": "bigint",
    "float_or_null": "double",
    "str_or_null": "string",
    "bool_or_null": "boolean",
    "str_or_null_or_number": "string",
}


def _py_type_name(t: Column) -> Column:
    """Python type name of the raw JSON value, for error-message parity."""
    return (
        F.when(t.isNull() | (t == "VOID"), "NoneType")
        .when(t == "BOOLEAN", "bool")
        .when(t == "BIGINT", "int")
        .when((t == "DOUBLE") | t.startswith("DECIMAL"), "float")
        .when(t == "STRING", "str")
        .when(t.startswith("ARRAY"), "list")
        .otherwise("dict")
    )


def _rule_error(f: Field, value: Column, now_ms: int) -> Column | None:
    """Value-rule violation message (null = rule passed).

    Rules run only on required fields after the type check passes
    (reference src/validator.py:396-416) — messages at :364-388.
    """
    if f.rule is None:
        return None
    if f.rule == "uuid":
        bad, msg = ~value.rlike(UUID_RE), "invalid UUID format"
    elif f.rule == "positive_timestamp":
        bad = (value <= 0) | (value > F.lit(now_ms + MAX_FUTURE_BUFFER_MS))
        msg = "invalid timestamp (must be positive and not in future)"
    elif f.rule == "non_empty":
        bad, msg = F.length(F.trim(value)) == 0, "must be non-empty string"
    elif f.rule == "state_code":
        bad = ~F.upper(value).isin(US_STATE_CODES)
        msg = "must be 2-character state code"
    elif f.rule == "non_negative":
        bad, msg = value < 0, "must be non-negative number"
    elif f.rule == "positive":
        bad, msg = value <= 0, "must be a positive number"
    elif f.rule == "lat":
        # Validator-level enforcement of the reference's DB CHECK
        # constraint (schema/oe_facility_generation.sql:45); the
        # reference validator itself has validation=None for lat/lon
        # and relies on the INSERT failing.
        bad, msg = (value < -90) | (value > 90), "latitude out of range [-90, 90]"
    elif f.rule == "lon":
        bad, msg = (value < -180) | (value > 180), "longitude out of range [-180, 180]"
    else:  # pragma: no cover
        raise ValueError(f"unknown rule {f.rule}")
    return F.when(bad, F.lit(f"{f.name}: {msg}"))


@dataclass
class ValidationReport:
    """File-level validation summary (reference src/validator.py:97-119)."""

    source_file: str
    total_count: int = 0
    valid_count: int = 0
    invalid_count: int = 0
    duplicate_count: int = 0
    errors_by_type: dict[str, int] = dc_field(default_factory=dict)
    sample_errors: list[dict] = dc_field(default_factory=list)
    warnings: dict[str, int] = dc_field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "source_file": self.source_file,
            "total_count": self.total_count,
            "valid_count": self.valid_count,
            "invalid_count": self.invalid_count,
            "duplicate_count": self.duplicate_count,
            "errors_by_type": self.errors_by_type,
            "sample_errors": self.sample_errors,
            "warnings": self.warnings,
        }


def parse_fields(raw: DataFrame, schema: SourceSchema, line_col: str = "line") -> DataFrame:
    """Parse raw JSONL lines into (typed value, JSON type) column pairs.

    One variant parse per record; per-field binary extraction after —
    all JVM-side. ``_typ_<f>`` is NULL when the field is missing and
    'VOID' when it is an explicit JSON null (a distinction Python's
    ``record.get`` erases; validation reunifies them where parity
    demands).
    """
    df = raw.withColumn(VARIANT_COL, F.try_parse_json(F.col(line_col)))
    cols = [df["*"]]
    for f in schema.fields:
        path = f"$.{f.name}"
        cols.append(
            F.expr(f"schema_of_variant(try_variant_get({VARIANT_COL}, '{path}'))").alias(
                typ_col(f.name)
            )
        )
        cols.append(
            F.expr(f"try_variant_get({VARIANT_COL}, '{path}', '{_TARGET[f.ftype]}')").alias(
                f.name
            )
        )
    return df.select(*cols)


def _field_error(f: Field, df_typ: Column, value: Column, now_ms: int) -> Column:
    """Single-field error expression — at most one error per field, with
    the reference's precedence: missing → type → rule."""
    type_ok = _TYPE_OK[f.ftype](df_typ)
    got = _py_type_name(df_typ)
    type_err = F.concat(F.lit(f"{f.name}: {_EXPECTED[f.ftype]}, got "), got)

    if f.required:
        # Python's `field not in record` is the only "missing";
        # explicit null reaches the type check as NoneType.
        err = F.when(df_typ.isNull(), F.lit(f"missing required field: {f.name}")).when(
            ~type_ok, type_err
        )
        rule = _rule_error(f, value, now_ms)
        if rule is not None:
            err = err.otherwise(rule)
        return err
    # Optional: type-checked only when present (reference :418-424).
    # Value rules additionally run when present, type-ok, and non-null —
    # this enforces what the reference pushes down to DB CHECK
    # constraints (lat/lon); a null value never trips a rule.
    err = F.when(df_typ.isNotNull() & ~type_ok, type_err)
    rule = _rule_error(f, value, now_ms)
    if rule is not None:
        err = err.otherwise(rule)
    return err


def _dup_key_element(f: Field, df: DataFrame) -> Column:
    """One duplicate-key component with Python tuple-equality semantics:
    numbers (and bools) compare by numeric value across int/float/bool;
    strings compare as strings; null/missing compare equal."""
    t = df[typ_col(f.name)]
    v = df[f.name]
    kind = (
        F.when(t.isNull() | (t == "VOID"), "null")
        .when((t == "BIGINT") | (t == "DOUBLE") | t.startswith("DECIMAL") | (t == "BOOLEAN"), "num")
        .otherwise("str")
    )
    num_repr = F.when(
        t == "BOOLEAN", v.cast("string").cast("boolean").cast("double")
    ).otherwise(v.cast("double"))
    val = (
        F.when(kind == "null", F.lit(""))
        .when(kind == "num", num_repr.cast("string"))
        .otherwise(v.cast("string"))
    )
    return F.struct(kind.alias("k"), val.alias("v"))


def validate(
    parsed: DataFrame,
    schema: SourceSchema,
    source_file: str = "",
    now_ms: int | None = None,
) -> tuple[DataFrame, ValidationReport]:
    """Validate + first-wins-dedup a parsed DataFrame.

    Returns (valid typed rows in schema column order, report). The
    split is computed in one cached pass: error-array projection →
    dedup window over the duplicate key ordered by input order →
    single aggregation for the report counts, plus a small collect for
    the ≤10 sample errors.

    Scope note: dedup here is whole-file. The reference's ENTSOE loader
    dedups per 1000-record insert batch (src/database.py:684-704), so
    for files >1000 records a key recurring across batch boundaries is
    counted by the reference as skipped-at-insert rather than as an
    in-file duplicate; totals agree, the attribution differs. Whole-file
    scope is the stricter (and batch-size-independent) semantics.
    """
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)

    errs = [
        _field_error(f, parsed[typ_col(f.name)], parsed[f.name], now_ms)
        for f in schema.fields
    ]
    df = parsed.withColumn("_errors", F.array_compact(F.array(*errs)))
    if SKIP_COL not in df.columns:
        df = df.withColumn(SKIP_COL, F.lit(None).cast("string"))

    # First-wins dedup among valid records only (reference
    # src/validator.py:494-521): invalid records never claim a key, so a
    # plain row_number over the partition would be wrong (an invalid row
    # earlier in the file would steal rank 1). Instead count *eligible*
    # rows up to and including the current one: the first eligible row in
    # input order has a running count of exactly 1.
    from pyspark.sql.window import Window

    key = [
        _dup_key_element(schema.fields_by_name(k), df) for k in schema.duplicate_key
    ]
    eligible = (F.size("_errors") == 0) & F.col(SKIP_COL).isNull()
    # Multi-file batches: `_order` is per-file, so first-wins across
    # files orders by (file, line) — lexicographic file order, matching
    # the sorted order a sequential loader would process a directory in.
    order_cols = (
        [FILE_COL, ORDER_COL] if FILE_COL in df.columns else [ORDER_COL]
    )
    w = (
        Window.partitionBy(*key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "_eligible_seen", F.sum(F.when(eligible, 1).otherwise(0)).over(w)
    )
    df = df.withColumn(
        "_status",
        F.when(F.col(SKIP_COL).isNotNull(), F.lit("skipped"))
        .when(F.size("_errors") > 0, F.lit("invalid"))
        .when(F.col("_eligible_seen") > 1, F.lit("duplicate"))
        .otherwise(F.lit("valid")),
    ).persist()

    # --- report -------------------------------------------------------------
    counts = {
        r["_status"]: r["n"]
        for r in df.groupBy("_status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report = ValidationReport(
        source_file=source_file,
        total_count=sum(v for k, v in counts.items() if k != "skipped"),
        valid_count=counts.get("valid", 0),
        invalid_count=counts.get("invalid", 0),
        duplicate_count=counts.get("duplicate", 0),
    )
    if counts.get("skipped"):
        report.warnings["skipped_records"] = counts["skipped"]

    # Error taxonomy: one entry per error; duplicates count under
    # 'duplicate' (reference src/validator.py:500-516). The key detail
    # renders as the Python tuple repr the reference emits
    # (f"... = {dup_key}"): strings quoted, None for null/missing,
    # True/False for bools, numbers bare.
    def _dup_val_repr(k: str) -> Column:
        t, v = df[typ_col(k)], df[k].cast("string")
        return (
            F.when(t.isNull() | (t == "VOID"), F.lit("None"))
            .when(t == "BOOLEAN", F.initcap(v))
            .when(t == "STRING", F.concat(F.lit("'"), v, F.lit("'")))
            .otherwise(v)
        )

    dup_msg = F.concat(
        F.lit(f"duplicate key: {tuple(schema.duplicate_key)} = ("),
        F.concat_ws(", ", *[_dup_val_repr(k) for k in schema.duplicate_key]),
        F.lit(")"),
    )
    errored = (
        df.filter(F.col("_status").isin("invalid", "duplicate"))
        .select(
            F.col(ORDER_COL).alias("record_index"),
            F.when(F.col("_status") == "duplicate", F.array(dup_msg)).otherwise(
                F.col("_errors")
            ).alias("errs"),
        )
        .select("record_index", F.explode("errs").alias("error"))
        .withColumn(
            "error_type",
            F.when(
                F.col("error").contains(":"), F.split(F.col("error"), ":").getItem(0)
            ).otherwise(F.col("error")),
        )
        .withColumn(
            "error_type",
            F.when(F.col("error").startswith("duplicate key"), "duplicate").otherwise(
                F.col("error_type")
            ),
        )
    ).persist()
    for r in errored.groupBy("error_type").agg(F.count(F.lit(1)).alias("n")).collect():
        report.errors_by_type[r["error_type"]] = r["n"]
    for r in errored.orderBy("record_index").limit(10).collect():
        report.sample_errors.append(
            {
                "record_index": r["record_index"],
                "error_type": r["error_type"],
                "details": r["error"],
            }
        )
    errored.unpersist()

    valid = df.filter(F.col("_status") == "valid").select(
        *([FILE_COL] if FILE_COL in df.columns else []),
        ORDER_COL,
        *[f.name for f in schema.fields],
    )
    return valid, report


def strict_gate(report: ValidationReport) -> None:
    """--strict mode: any invalid or duplicate fails the load
    (reference src/database_management.py:171-175)."""
    if report.invalid_count > 0 or report.duplicate_count > 0:
        raise ValueError(
            f"strict mode: {report.invalid_count} invalid, "
            f"{report.duplicate_count} duplicate records in {report.source_file}"
        )
