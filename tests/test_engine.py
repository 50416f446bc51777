"""End-to-end engine tests: the minimum slice of SURVEY §7.2 —
load ENTSOE JSONL → validated, first-wins-deduped, idempotently
appended table → mv_entsoe_monthly — plus maintenance operators."""

from __future__ import annotations

import json
import time

import pytest

from power_generation_etl_spark.engine import Engine

RUN_ID = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
NOW = int(time.time() * 1000)
JAN = 1704067200000  # 2024-01-01T00:00:00Z
FEB = 1706745600000  # 2024-02-01T00:00:00Z


def _entsoe(ts, plant, mw, res=60, **over):
    rec = {
        "extraction_run_id": RUN_ID,
        "created_at_ms": NOW,
        "timestamp_ms": ts,
        "country_code": "DE",
        "psr_type": "B16",
        "plant_name": plant,
        "fuel_type": "Unknown",
        "data_type": "Actual Aggregated",
        "generation_mw": mw,
        "resolution_minutes": res,
    }
    rec.update(over)
    return rec


def _write(tmp_path, records, name="data.jsonl"):
    p = tmp_path / name
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(p)


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


def test_minimum_slice_end_to_end(engine, spark, tmp_path):
    recs = [
        _entsoe(JAN, "P1", 100.0, res=60),
        _entsoe(JAN + 3_600_000, "P1", 50.0, res=30),
        _entsoe(FEB, "P2", 10.0, res=60, psr_type="B14"),
        _entsoe(JAN, "P1", 999.0),  # in-file duplicate of rec 1 → dropped
    ]
    path = _write(tmp_path, recs)

    res = engine.load_jsonl("entsoe", path)
    assert res.inserted == 3
    assert res.report.duplicate_count == 1

    # Idempotent re-load: 0 inserted, all skipped (D2 contract).
    res2 = engine.load_jsonl("entsoe", path)
    assert res2.inserted == 0
    assert res2.skipped_existing == 3

    # MV refresh (A1): mwh = mw * res/60.
    engine.refresh_views("entsoe")
    mv = {
        (r["month"], r["fuel_type"]): r["generation_mwh"]
        for r in engine.table("mv_entsoe_monthly").collect()
    }
    assert mv[("2024-01-01", "Solar")] == pytest.approx(100.0 + 50.0 * 30 / 60)
    assert mv[("2024-02-01", "Nuclear")] == pytest.approx(10.0)

    # Watermark (A10).
    assert engine.get_latest_date("entsoe") == "2024-02-01"
    assert engine.get_latest_date("npp") == "1970-01-01"

    # Lineage (M1): one row, correct date range.
    meta = engine.table("extraction_metadata").collect()
    assert len(meta) == 1
    m = meta[0]
    assert m["source"] == "entsoe" and str(m["start_date"]) == "2024-01-01"
    assert str(m["end_date"]) == "2024-02-01"

    # Stats (A11) + truncate (S11).
    assert engine.stats()["entsoe_generation_data"] == 3
    assert engine.clear_table("entsoe_generation_data") == 3
    assert engine.stats()["entsoe_generation_data"] == 0


def test_cross_run_dedup_partial_overlap(engine, spark, tmp_path):
    p1 = _write(tmp_path, [_entsoe(JAN, "P1", 1.0), _entsoe(JAN, "P2", 2.0)], "a.jsonl")
    p2 = _write(
        tmp_path,
        [_entsoe(JAN, "P2", 999.0), _entsoe(JAN, "P3", 3.0)],
        "b.jsonl",
    )
    assert engine.load_jsonl("entsoe", p1).inserted == 2
    r = engine.load_jsonl("entsoe", p2)
    assert r.inserted == 1 and r.skipped_existing == 1
    rows = {x["plant_name"]: x["generation_mw"] for x in engine.table("entsoe_generation_data").collect()}
    assert rows == {"P1": 1.0, "P2": 2.0, "P3": 3.0}  # first run wins


def test_ons_null_coalesced_natural_key(engine, spark, tmp_path):
    def ons(plant_id, mwh):
        return {
            "extraction_run_id": RUN_ID,
            "created_at_ms": NOW,
            "timestamp_ms": JAN,
            "plant": "PL",
            "generation_mwh": mwh,
            "ons_plant_id": plant_id,
        }

    p1 = _write(tmp_path, [ons(None, 1.0)], "a.jsonl")
    p2 = _write(tmp_path, [ons(None, 2.0)], "b.jsonl")
    assert engine.load_jsonl("ons", p1).inserted == 1
    # COALESCE(ons_plant_id,'') uniqueness: null collides with null.
    assert engine.load_jsonl("ons", p2).inserted == 0


def test_metadata_upsert_updates_subset_only(engine, spark):
    engine.upsert_metadata(
        {
            "extraction_run_id": RUN_ID,
            "source": "entsoe",
            "total_records": 10,
            "failed_count": 0,
            "success": True,
            "config_snapshot": '{"a":1}',
        }
    )
    first = engine.table("extraction_metadata").head()
    engine.upsert_metadata(
        {
            "extraction_run_id": RUN_ID,
            "source": "entsoe",
            "total_records": 20,
            "failed_count": 2,
            "success": False,
            "config_snapshot": '{"a":2}',  # NOT updated on conflict
        }
    )
    rows = engine.table("extraction_metadata").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total_records"] == 20 and r["failed_count"] == 2 and r["success"] is False
    assert r["config_snapshot"] == '{"a":1}'
    assert r["extraction_timestamp"] == first["extraction_timestamp"]


def test_extraction_summary_and_recent(engine, spark):
    for i, ok in enumerate([True, True, False]):
        engine.upsert_metadata(
            {
                "extraction_run_id": f"{i}2345678-1234-1234-1234-123456789abc",
                "source": "npp",
                "total_records": 5,
                "failed_count": 0 if ok else 5,
                "success": ok,
            }
        )
    s = engine.extraction_summary().collect()[0]
    assert s["total_runs"] == 3 and s["successful_runs"] == 2 and s["failed_runs"] == 1
    assert engine.recent_extractions().count() == 3


def test_crosswalk_drift(engine, spark, tmp_path):
    p = _write(
        tmp_path,
        [_entsoe(JAN, "Known Plant", 1.0), _entsoe(JAN, "Mystery Plant", 2.0)],
    )
    engine.load_jsonl("entsoe", p)
    crosswalk = spark.createDataFrame(
        [("ENTSOE", "Known Plant", None)],
        "source_system string, plant_name string, plant_code string",
    )
    rep = engine.check_crosswalk_drift(crosswalk)
    assert rep["total_missing"] == 1
    assert rep["by_source"]["ENTSOE"]["sample"] == ["Mystery Plant"]


def test_aggregate_export(engine, spark, tmp_path):
    p = _write(
        tmp_path,
        [
            _entsoe(JAN, "P1", 100.0),
            _entsoe(JAN + 3_600_000, "P1", 200.0),
            _entsoe(FEB, "P2", 10.0),
        ],
    )
    engine.load_jsonl("entsoe", p)
    out = tmp_path / "export"
    ok, total = engine.aggregate_export(str(out), granularity="country")
    assert ok and total == 2  # two months, one country
    files = sorted(f.name for f in out.iterdir())
    assert files == ["entsoe_monthly_2024.csv"]
    lines = (out / "entsoe_monthly_2024.csv").read_text().strip().splitlines()
    assert lines[0] == "month,country_code,total_generation_mwh,hours_of_data,avg_generation_mw,peak_generation_mw"
    assert lines[1].startswith("2024-01-01,DE,300.0,2,150.0,200.0")


def test_setup_creates_empty_tables(engine):
    created = engine.setup()
    assert "entsoe_generation_data" in created
    assert engine.table("npp_generation").count() == 0
    # Setup is idempotent.
    assert engine.setup() == []


def test_backfill_dates(engine, spark, tmp_path):
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0)])
    res = engine.load_jsonl("entsoe", p, write_metadata=False)
    engine.upsert_metadata(
        {
            "extraction_run_id": res.run_id,
            "source": "entsoe",
            "total_records": 1,
            "failed_count": 0,
            "success": True,
        }
    )
    assert engine.backfill_extraction_dates() == 1
    m = engine.table("extraction_metadata").head()
    assert str(m["start_date"]) == "2024-01-01"


def test_sql_surface(engine, spark, tmp_path):
    p = _write(tmp_path, [_entsoe(JAN, "P1", 100.0), _entsoe(FEB, "P2", 10.0)])
    engine.load_jsonl("entsoe", p)
    engine.refresh_views("entsoe")
    row = engine.sql(
        "SELECT count(*) AS n, round(sum(generation_mw), 2) AS mw "
        "FROM entsoe_generation_data"
    ).head()
    assert row["n"] == 2 and row["mw"] == 110.0
    assert engine.sql("SELECT * FROM mv_entsoe_monthly").count() == 2
    assert engine.sql("SELECT * FROM extraction_summary").head()["source"] == "entsoe"


def test_read_range_partition_pruning(engine, spark, tmp_path):
    """The anti-join's target read must prune _month partition dirs
    (PartitionFilters), not just parquet row groups."""
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0), _entsoe(FEB, "P2", 2.0)])
    engine.load_jsonl("entsoe", p)
    pruned = engine.store.read_range("entsoe_generation_data", JAN, JAN + 1000)
    assert pruned.count() == 1  # only the January row
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_month" in plan


def test_dynamic_partition_pruning_from_dim_join(engine, spark, tmp_path):
    """read_join_months: when the month set comes from a computed
    DataFrame instead of a driver list, the fact scan must still prune
    partition directories — at runtime, via Spark dynamic partition
    pruning (dynamicpruningexpression fed by the reused broadcast),
    with no driver-side collect of the month list."""
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0), _entsoe(FEB, "P2", 2.0)])
    engine.load_jsonl("entsoe", p)
    jan_month = __import__("datetime").datetime.utcfromtimestamp(
        JAN / 1000
    ).strftime("%Y-%m")
    feb_month = __import__("datetime").datetime.utcfromtimestamp(
        FEB / 1000
    ).strftime("%Y-%m")
    # NB: the filter must be one Spark's isLikelySelective() recognizes
    # (comparison/IN/LIKE — a bare boolean attribute is not), or the
    # DPP rule declines to insert the pruning subquery.
    months = spark.createDataFrame(
        [(jan_month, "yes"), (feb_month, "no")], ["month", "wanted"]
    ).filter("wanted = 'yes'").select("month")
    pruned = engine.store.read_join_months("entsoe_generation_data", months)
    assert pruned.count() == 1  # only the January row survives the join
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan, plan  # runtime dir-level pruning


def test_retry_backoff():
    from power_generation_etl_spark.incremental import retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("transient")
        return "ok"

    assert retry(flaky, base_wait=0.01) == "ok"
    assert len(calls) == 3

    def hopeless():
        raise OSError("down")

    import pytest as _pytest

    with _pytest.raises(OSError):
        retry(hopeless, base_wait=0.01)


def test_in_batch_stored_key_collision(engine, spark, tmp_path):
    """A null and an empty-string ons_plant_id at the same (ts, plant)
    are distinct for in-file dedup (null-kind vs str-kind) but collide
    on the COALESCE('') stored natural key — only the first inserts."""
    def ons(plant_id, mwh):
        rec = {
            "extraction_run_id": RUN_ID,
            "created_at_ms": NOW,
            "timestamp_ms": JAN,
            "plant": "PL",
            "generation_mwh": mwh,
            "ons_plant_id": plant_id,
        }
        return rec

    p = _write(tmp_path, [ons(None, 1.0), ons("", 2.0)])
    r = engine.load_jsonl("ons", p)
    assert r.report.valid_count == 2 and r.report.duplicate_count == 0
    assert r.inserted == 1 and r.skipped_existing == 1
    rows = engine.table("ons_generation_data").collect()
    assert len(rows) == 1 and rows[0]["generation_mwh"] == 1.0  # first wins


def test_glob_path_load(engine, tmp_path):
    """Wildcard paths are legal reader input: the missing-file guard
    must probe them with glob, not os.path.exists."""
    _write(tmp_path, [_entsoe(JAN, "P1", 1.0)], name="a.jsonl")
    _write(tmp_path, [_entsoe(FEB, "P2", 2.0)], name="b.jsonl")
    r = engine.load_jsonl("entsoe", str(tmp_path / "*.jsonl"))
    assert r.success and r.inserted == 2
    # a glob matching nothing is still the graceful-failure case
    r2 = engine.load_jsonl("entsoe", str(tmp_path / "nope" / "*.jsonl"))
    assert not r2.success and r2.inserted == 0


def test_truncate_preserves_sidecar_schema(engine, tmp_path):
    """Truncate must keep the setup-time sidecar verbatim — re-deriving
    from a parquet read would drop non-null flags (all-nullable reads)."""
    engine.setup()
    store = engine.store
    with open(store._schema_file("entsoe_generation_data")) as f:
        before = f.read()
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0)])
    assert engine.load_jsonl("entsoe", p).inserted == 1
    engine.clear_table("entsoe_generation_data")
    with open(store._schema_file("entsoe_generation_data")) as f:
        after = f.read()
    assert after == before


def test_truncate_keeps_table_registered(engine, spark, tmp_path):
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0)])
    assert engine.load_jsonl("entsoe", p).inserted == 1
    assert engine.clear_table("entsoe_generation_data") == 1
    # Table still exists, reads empty (reference TRUNCATE leaves the
    # empty table in place).
    assert engine.store.exists("entsoe_generation_data")
    assert engine.table("entsoe_generation_data").count() == 0
    ok, n = engine.aggregate_export(str(tmp_path / "out"))
    assert (ok, n) == (True, 0)


def test_aggregate_export_missing_table_is_error(engine, tmp_path):
    ok, n = engine.aggregate_export(str(tmp_path / "out"))
    assert (ok, n) == (False, 0)


def test_unified_monthly_cross_source(engine, spark, tmp_path):
    """The cross-source harmonized rollup unions the fuel-level monthly
    MVs with a source tag (NPP carries null fuel_type) and registers as
    the unified_monthly SQL view."""
    assert engine.unified_monthly() is None  # nothing refreshed yet

    epath = _write(tmp_path, [_entsoe(JAN, "P1", 60.0, res=60)], "e.jsonl")
    engine.load_jsonl("entsoe", epath)
    npath = _write(
        tmp_path,
        [{
            "extraction_run_id": RUN_ID,
            "created_at_ms": NOW,
            "timestamp_ms": JAN,
            "plant": "NP",
            "plant_and_unit": "NP U1",
            "generation_mwh": 7.0,
        }],
        "n.jsonl",
    )
    engine.load_jsonl("npp", npath)
    engine.refresh_views("entsoe")
    engine.refresh_views("npp")

    rows = engine.unified_monthly().collect()
    by_src = {(r["source"], r["fuel_type"]): r["generation_mwh"] for r in rows}
    assert by_src[("entsoe", "Solar")] == pytest.approx(60.0)
    assert by_src[("npp", None)] == pytest.approx(7.0)

    sql_rows = engine.sql(
        "SELECT source, sum(generation_mwh) AS s FROM unified_monthly GROUP BY 1"
    ).collect()
    assert {r["source"]: r["s"] for r in sql_rows} == {
        "entsoe": pytest.approx(60.0), "npp": pytest.approx(7.0)
    }


MAR = 1709251200000  # 2024-03-01T00:00:00Z


def test_incremental_view_refresh_matches_full(engine, spark, tmp_path):
    """refresh_views_incremental([touched months]) must produce the
    same MV contents as a full recompute, while its input scan prunes
    to the touched _month partitions."""
    engine.load_jsonl(
        "entsoe",
        _write(tmp_path, [
            _entsoe(JAN, "P1", 100.0),
            _entsoe(FEB, "P2", 20.0),
        ], "m1.jsonl"),
    )
    engine.refresh_views("entsoe")

    # A March feed arrives, plus a late-January correction row.
    engine.load_jsonl(
        "entsoe",
        _write(tmp_path, [
            _entsoe(MAR, "P3", 7.0),
            _entsoe(JAN + 7_200_000, "P1", 30.0),
        ], "m2.jsonl"),
    )
    engine.refresh_views_incremental(["2024-01", "2024-03"], "entsoe")
    incr = sorted(
        tuple(r) for r in engine.sql(
            "SELECT month, fuel_type, round(generation_mwh, 4) AS mwh "
            "FROM mv_entsoe_monthly").collect()
    )

    engine.refresh_views("entsoe")  # full recompute ground truth
    full = sorted(
        tuple(r) for r in engine.sql(
            "SELECT month, fuel_type, round(generation_mwh, 4) AS mwh "
            "FROM mv_entsoe_monthly").collect()
    )
    assert incr == full
    assert len(full) == 3  # Jan, Feb, Mar rows


def test_incremental_refresh_from_empty_mv(engine, spark, tmp_path):
    """An existing-but-EMPTY MV (truncated, or created before any
    refresh) must incremental-refresh to exactly the full recompute —
    the empty carried-over frame unions away. (r11: the pre-count job
    that special-cased this was removed; the read path must keep the
    semantics.)"""
    engine.load_jsonl(
        "entsoe",
        _write(tmp_path, [
            _entsoe(JAN, "P1", 100.0),
            _entsoe(FEB, "P2", 20.0),
        ], "e1.jsonl"),
    )
    engine.refresh_views("entsoe")
    engine.store.truncate("mv_entsoe_monthly")  # exists, zero rows
    engine.refresh_views_incremental(["2024-01"], "entsoe")
    got = sorted(
        tuple(r) for r in engine.sql(
            "SELECT month, fuel_type, round(generation_mwh, 4) AS mwh "
            "FROM mv_entsoe_monthly").collect()
    )
    # Only the touched month is recomputed; the February row was lost
    # with the truncate (nothing to carry over), so exactly January.
    assert got == [("2024-01-01", "Solar", 100.0)]


def test_read_months_partition_pruning(engine, spark, tmp_path):
    """The incremental refresh's input scan must prune _month
    partition directories, not post-filter a full read."""
    p = _write(tmp_path, [_entsoe(JAN, "P1", 1.0), _entsoe(FEB, "P2", 2.0),
                          _entsoe(MAR, "P3", 3.0)])
    engine.load_jsonl("entsoe", p)
    pruned = engine.store.read_months("entsoe_generation_data", ["2024-02"])
    assert pruned.count() == 1
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_month" in plan


def test_incremental_refresh_bootstraps_missing_view(engine, spark, tmp_path):
    """Incremental refresh on a warehouse whose MV was never built
    falls back to building it from the given months."""
    engine.load_jsonl(
        "entsoe", _write(tmp_path, [_entsoe(JAN, "P1", 100.0)]))
    out = engine.refresh_views_incremental(["2024-01"], "entsoe")
    assert "mv_entsoe_monthly" in out
    assert engine.sql("SELECT * FROM mv_entsoe_monthly").count() == 1


def test_sanity_gate_passes_and_fails(engine, spark):
    cw = spark.createDataFrame(
        [("npp", "coal")] * 5 + [("npp", "gas")] * 2 + [("eia", "coal")],
        "source_system string, fuel string",
    )
    counts = engine.sanity_gate(cw, [
        ("npp coal plants", "source_system = 'npp' AND fuel = 'coal'", 3),
        ("any eia rows", "source_system = 'eia'", 1),
    ])
    assert counts == {"npp coal plants": 5, "any eia rows": 1}
    with pytest.raises(ValueError, match="npp coal plants: 5 < 200"):
        engine.sanity_gate(cw, [
            ("npp coal plants", "source_system = 'npp' AND fuel = 'coal'", 200),
        ])
