"""Randomized differential test: the Spark validator vs an independent
in-Python model of the documented validation semantics (SURVEY §2.4,
FIXTURES.md) over hundreds of randomized records in one load.

The model is written from the documented rules (type algebra with
bool≠int and int-accepted-as-float, value rules, first-error-per-field,
first-wins dedup among valid records) — any divergence between the two
implementations fails with the offending record."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # validator model fuzz; run with -m "slow or not slow"

import json
import random
import re
import time

from power_generation_etl_spark.schemas import SOURCES, US_STATE_CODES, UUID_RE
from power_generation_etl_spark.sources.jsonl import load_and_validate

NOW = int(time.time() * 1000)
RUN_ID = "12345678-1234-1234-1234-123456789abc"


# --- independent model of the documented semantics --------------------------

def _type_ok(v, ftype):
    is_bool = isinstance(v, bool)
    if ftype == "str":
        return isinstance(v, str)
    if ftype == "int":
        return isinstance(v, int) and not is_bool
    if ftype == "float":
        return isinstance(v, (int, float)) and not is_bool
    if ftype == "bool":
        return is_bool
    if ftype == "int_or_str":
        return (isinstance(v, int) and not is_bool) or isinstance(v, str)
    if ftype == "int_or_null":
        return v is None or (isinstance(v, int) and not is_bool)
    if ftype == "float_or_null":
        return v is None or (isinstance(v, (int, float)) and not is_bool)
    if ftype == "str_or_null":
        return v is None or isinstance(v, str)
    if ftype == "bool_or_null":
        return v is None or is_bool
    if ftype == "str_or_null_or_number":
        return v is None or isinstance(v, str) or (
            isinstance(v, (int, float)) and not is_bool
        )
    raise AssertionError(ftype)


def _rule_ok(v, rule, now_ms):
    if rule == "uuid":
        return isinstance(v, str) and re.match(UUID_RE, v) is not None
    if rule == "positive_timestamp":
        return (
            isinstance(v, (int, float))
            and not isinstance(v, bool)
            and v > 0
            and v <= now_ms + 24 * 3600 * 1000
        )
    if rule == "non_empty":
        return isinstance(v, str) and len(v.strip()) > 0
    if rule == "state_code":
        return isinstance(v, str) and v.upper() in US_STATE_CODES
    if rule == "non_negative":
        return isinstance(v, (int, float)) and not isinstance(v, bool) and v >= 0
    if rule == "positive":
        return isinstance(v, (int, float)) and not isinstance(v, bool) and v > 0
    if rule == "lat":
        return isinstance(v, (int, float)) and not isinstance(v, bool) and -90 <= v <= 90
    if rule == "lon":
        return isinstance(v, (int, float)) and not isinstance(v, bool) and -180 <= v <= 180
    raise AssertionError(rule)


def model_validate(records, schema, now_ms):
    """Returns (statuses, kept_indices): status per record in
    {'valid','invalid','duplicate'}."""
    statuses = []
    seen = set()
    for rec in records:
        errors = 0
        for f in schema.fields:
            if f.required:
                if f.name not in rec:
                    errors += 1
                    continue
                v = rec[f.name]
                if not _type_ok(v, f.ftype):
                    errors += 1
                    continue
                if f.rule and not _rule_ok(v, f.rule, now_ms):
                    errors += 1
            else:
                # Optional: type-checked when present; value rules (the
                # lat/lon CHECK-constraint twins) additionally run when
                # present, type-ok, and non-null.
                if f.name in rec:
                    v = rec[f.name]
                    if not _type_ok(v, f.ftype):
                        errors += 1
                    elif f.rule and v is not None and not _rule_ok(v, f.rule, now_ms):
                        errors += 1
        if errors:
            statuses.append("invalid")
            continue
        key = tuple(
            (str(type(rec.get(k))), json.dumps(rec.get(k)))
            if not isinstance(rec.get(k), bool) and isinstance(rec.get(k), (int, float))
            else rec.get(k)
            for k in schema.duplicate_key
        )
        # numeric key parts compare by value (python tuple semantics):
        key = tuple(
            float(rec.get(k))
            if isinstance(rec.get(k), (int, float)) and not isinstance(rec.get(k), bool)
            else rec.get(k)
            for k in schema.duplicate_key
        )
        if key in seen:
            statuses.append("duplicate")
            continue
        seen.add(key)
        statuses.append("valid")
    return statuses


# --- randomized record generator ---------------------------------------------

def _rand_value(rng, f):
    """Values biased toward edge cases of f's type/rule."""
    pool = [
        None,
        True,
        False,
        0,
        -5,
        100,
        NOW - 1000,
        NOW + 12 * 3600 * 1000,
        NOW + 48 * 3600 * 1000,
        1.5,
        -0.5,
        "",
        "   ",
        "x",
        "100.0",
        "CA",
        "California",
        "tx",
        RUN_ID,
        "not-a-uuid",
        60,
        1440,
    ]
    return rng.choice(pool)


def _gen_record(rng, schema):
    rec = {}
    for f in schema.fields:
        r = rng.random()
        if r < 0.08:
            continue  # missing
        if r < 0.25:
            rec[f.name] = _rand_value(rng, f)  # adversarial
        else:
            # plausible-valid value
            if f.rule == "uuid":
                rec[f.name] = RUN_ID
            elif f.rule == "positive_timestamp":
                rec[f.name] = NOW - rng.randrange(0, 10**9)
            elif f.rule == "state_code":
                rec[f.name] = rng.choice(["CA", "TX", "NY"])
            elif f.ftype.startswith("int"):
                rec[f.name] = rng.randrange(1, 10**6)
            elif f.ftype.startswith("float"):
                rec[f.name] = round(rng.uniform(0, 1000), 3)
            elif f.ftype.startswith("bool"):
                rec[f.name] = rng.random() < 0.5
            else:
                rec[f.name] = rng.choice(["Plant A", "Plant B", "U1", "abc"])
    # force key collisions sometimes
    if rng.random() < 0.3 and schema.duplicate_key[0] == "timestamp_ms":
        rec["timestamp_ms"] = NOW - 777
    return rec


def test_fuzz_validator_against_model(spark, tmp_path):
    rng = random.Random(42)
    # npp/eia/ons have no pre-validation fixups that change validity
    # semantics beyond injection; use run-id+created_at present so
    # injection never triggers.
    for source in ("npp", "eia", "ons", "oe", "oe_facility", "occto", "chile"):
        schema = SOURCES[source]
        records = []
        for _ in range(250):
            rec = _gen_record(rng, schema)
            rec.setdefault("extraction_run_id", RUN_ID)
            rec.setdefault("created_at_ms", NOW)
            records.append(rec)
        path = tmp_path / f"{source}.jsonl"
        with open(path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

        # EIA stringifies ids pre-validation with plain str() — None and
        # bools included (reference src/database.py:975-983).
        model_records = records
        if source == "eia":
            model_records = []
            for r in records:
                r2 = dict(r)
                for k in ("utility_id", "plant_code", "generator_id"):
                    if k in r2 and not isinstance(r2[k], str):
                        r2[k] = str(r2[k])
                model_records.append(r2)

        statuses = model_validate(model_records, schema, NOW)
        expected = {
            "valid": statuses.count("valid"),
            "invalid": statuses.count("invalid"),
            "duplicate": statuses.count("duplicate"),
        }
        _, report = load_and_validate(
            spark, source, str(path), run_id=RUN_ID, now_ms=NOW
        )
        got = {
            "valid": report.valid_count,
            "invalid": report.invalid_count,
            "duplicate": report.duplicate_count,
        }
        assert got == expected, f"{source}: spark={got} model={expected}"
