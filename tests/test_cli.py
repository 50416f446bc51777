"""CLI verb-parity probes (reference src/database_management.py:262-422
verb surface: setup [table_type], update-schema [table_type], load-data,
stats, aggregate-export, clear-table — plus the database.py bootstrap
and connection-probe entry points)."""

from __future__ import annotations

import json
import time

from power_generation_etl_spark import cli

NOW = int(time.time() * 1000)


def _wh(tmp_path):
    return str(tmp_path / "wh")


def _run(tmp_path, *argv) -> int:
    return cli.main(["--warehouse", _wh(tmp_path), *argv])


def test_create_database_and_test_connection(tmp_path, spark, capsys):
    assert _run(tmp_path, "test-connection") == 0
    assert "connection OK" in capsys.readouterr().out
    assert _run(tmp_path, "create-database") == 0
    assert "already exists" in capsys.readouterr().out  # Engine init made it


def test_setup_scoped_to_table_type(tmp_path, spark, capsys):
    assert _run(tmp_path, "setup", "npp") == 0
    out = capsys.readouterr().out
    assert "npp_generation" in out
    assert "entsoe_generation_data" not in out
    # default = all: creates the rest, idempotent for npp
    assert _run(tmp_path, "setup") == 0
    out = capsys.readouterr().out
    assert "entsoe_generation_data" in out and "npp_generation," not in out


def test_update_schema_refreshes_existing_sidecars(tmp_path, spark, capsys):
    assert _run(tmp_path, "setup", "entsoe") == 0
    capsys.readouterr()
    assert _run(tmp_path, "update-schema") == 0  # default entsoe
    assert "entsoe_generation_data" in capsys.readouterr().out
    # tables that don't exist aren't "updated"
    assert _run(tmp_path, "update-schema", "ons") == 0
    assert "(none)" in capsys.readouterr().out


def test_load_stats_clear_roundtrip(tmp_path, spark, capsys):
    p = tmp_path / "npp.jsonl"
    rec = {
        "extraction_run_id": "12345678-1234-1234-1234-123456789abc",
        "created_at_ms": NOW,
        "timestamp_ms": NOW - 1000,
        "plant": "P",
        "plant_and_unit": "P U1",
        "generation_mwh": 1.0,
    }
    p.write_text(json.dumps(rec) + "\n")
    assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    assert "inserted 1 rows" in capsys.readouterr().out
    assert _run(tmp_path, "stats") == 0
    assert "npp_generation" in capsys.readouterr().out
    assert _run(tmp_path, "clear-table", "npp_generation") == 0
    assert "cleared 1 rows" in capsys.readouterr().out


def test_compact_table_merges_small_files(tmp_path, spark, capsys):
    """Three separate loads → ≥3 files; compaction rewrites to fewer
    files with identical contents."""
    import json as _json

    for i in range(3):
        p = tmp_path / f"npp{i}.jsonl"
        rec = {
            "extraction_run_id": f"12345678-1234-1234-1234-12345678900{i}",
            "created_at_ms": NOW,
            "timestamp_ms": NOW - 1000 - i,
            "plant": "P",
            "plant_and_unit": f"P U{i}",
            "generation_mwh": float(i),
        }
        p.write_text(_json.dumps(rec) + "\n")
        assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()

    from power_generation_etl_spark.engine import Engine
    from power_generation_etl_spark.session import get_spark

    eng = Engine(get_spark("t"), _wh(tmp_path))
    assert eng.store.file_count("npp_generation") >= 3
    rows_before = sorted(
        (r["plant_and_unit"], r["generation_mwh"])
        for r in eng.table("npp_generation").collect()
    )
    assert _run(tmp_path, "compact-table", "npp_generation") == 0
    out = capsys.readouterr().out
    assert "compacted npp_generation" in out
    assert eng.store.file_count("npp_generation") < 3
    rows_after = sorted(
        (r["plant_and_unit"], r["generation_mwh"])
        for r in eng.table("npp_generation").collect()
    )
    assert rows_after == rows_before


def test_compact_unknown_table_rejected(tmp_path, spark):
    assert _run(tmp_path, "compact-table", "nope; DROP TABLE") == 1


def test_load_missing_file_graceful(tmp_path, spark, capsys):
    """Missing input file: error + exit 1, no exception (reference
    load_data logs and returns False)."""
    assert _run(tmp_path, "load-data", "npp", str(tmp_path / "nope.jsonl")) == 1
    assert "file not found" in capsys.readouterr().err


def test_sql_verb_over_loaded_table(tmp_path, spark, capsys):
    p = tmp_path / "npp.jsonl"
    recs = [
        {
            "extraction_run_id": "12345678-1234-1234-1234-123456789abc",
            "created_at_ms": NOW,
            "timestamp_ms": NOW - 1000 * (i + 1),
            "plant": "P",
            "plant_and_unit": f"P U{i}",
            "generation_mwh": float(i),
        }
        for i in range(3)
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()
    assert (
        _run(
            tmp_path,
            "sql",
            "SELECT count(*) AS n, sum(generation_mwh) AS s FROM npp_generation",
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "n\ts" in out and "3\t3.0" in out


def test_sql_verb_limit(tmp_path, spark, capsys):
    _run(tmp_path, "setup", "npp")
    capsys.readouterr()
    assert _run(tmp_path, "sql", "SELECT * FROM range(10)", "--limit", "4") == 0
    out = capsys.readouterr().out
    assert len([l for l in out.strip().splitlines() if l and not l.startswith("id")]) == 4


def test_cluster_table_sorts_within_files(tmp_path, spark, capsys):
    """cluster-table must leave every parquet file physically sorted by
    the requested columns (what makes parquet min/max stats selective),
    preserve all rows, and keep the table readable."""
    import glob

    p = tmp_path / "npp.jsonl"
    # two months, shuffled timestamps within each
    jan = 1704067200000
    feb = 1706745600000
    recs = []
    for i, ts in enumerate([jan + 5000, jan + 1000, jan + 3000,
                            feb + 4000, feb + 2000, feb + 6000]):
        recs.append({
            "extraction_run_id": "12345678-1234-1234-1234-123456789abc",
            "created_at_ms": NOW,
            "timestamp_ms": ts,
            "plant": f"P{i}",
            "plant_and_unit": f"P{i} U1",
            "generation_mwh": 1.0,
        })
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()

    assert _run(tmp_path, "cluster-table", "npp_generation",
                "--by", "timestamp_ms") == 0
    assert "clustered npp_generation" in capsys.readouterr().out

    files = glob.glob(str(tmp_path / "wh" / "npp_generation" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    total = 0
    for f in files:
        rows = [r["timestamp_ms"] for r in spark.read.parquet(f).collect()]
        assert rows == sorted(rows), f"file not sorted: {f}"
        total += len(rows)
    assert total == 6


def test_cluster_table_rejects_unknown_column(tmp_path, spark, capsys):
    p = tmp_path / "npp.jsonl"
    p.write_text(json.dumps({
        "extraction_run_id": "12345678-1234-1234-1234-123456789abc",
        "created_at_ms": NOW, "timestamp_ms": NOW - 1000,
        "plant": "P", "plant_and_unit": "P U1", "generation_mwh": 1.0,
    }) + "\n")
    assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()
    assert _run(tmp_path, "cluster-table", "npp_generation",
                "--by", "nope") == 1
    assert "unknown sort column" in capsys.readouterr().err


def test_prep_shards_verb(tmp_path, spark, capsys):
    assert _run(
        tmp_path, "prep-shards", "/root/testdata/sf0.001/documents.parquet",
        str(tmp_path / "shards"),
    ) == 0
    out = capsys.readouterr().out
    assert "sequences=" in out and "tokens=" in out
    assert spark.read.json(str(tmp_path / "shards")).count() > 0


def test_compact_preserves_schema_sidecar(tmp_path, spark):
    """overwrite-based maintenance (compact/refresh) must carry the
    _schema.json sidecar across the swap: without it a later truncate
    re-derives an all-nullable schema from parquet and drifts from the
    setup-time DDL."""
    import os

    from power_generation_etl_spark.engine import Engine

    eng = Engine(spark, _wh(tmp_path))
    p = tmp_path / "npp.jsonl"
    p.write_text(json.dumps({
        "extraction_run_id": "12345678-1234-1234-1234-123456789abc",
        "created_at_ms": NOW, "timestamp_ms": NOW - 1000,
        "plant": "P", "plant_and_unit": "P U1", "generation_mwh": 1.0,
    }) + "\n")
    eng.load_jsonl("npp", str(p))
    sidecar = os.path.join(_wh(tmp_path), "npp_generation", "_schema.json")
    assert os.path.exists(sidecar)
    before = open(sidecar).read()
    eng.compact_table("npp_generation")
    assert os.path.exists(sidecar), "compact dropped the schema sidecar"
    assert open(sidecar).read() == before
    # truncate after compact keeps the original (non-nullable) schema
    eng.clear_table("npp_generation")
    assert open(sidecar).read() == before


def test_scan_pii_report(tmp_path, spark, capsys):
    docs = spark.createDataFrame(
        [
            (1, "reach me at alice@example.com please"),
            (2, "clean text with nothing sensitive"),
            (3, "server 10.0.0.1 and backup 10.0.0.2"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "pii.json")
    rc = _run(tmp_path, "scan-pii", src, out)
    assert rc == 1  # nonzero exit signals PII found (CI gate style)
    import json as _json

    rep = _json.load(open(out))
    assert rep["n_docs"] == 3 and rep["n_docs_with_pii"] == 2
    assert rep["total_email"] == 1 and rep["total_ipv4"] == 2
    assert rep["sample_doc_ids"] == [1, 3]

    clean = spark.createDataFrame([(9, "all clear here")], "doc_id long, text string")
    src2 = str(tmp_path / "clean.parquet")
    clean.write.parquet(src2)
    assert _run(tmp_path, "scan-pii", src2, str(tmp_path / "c.json")) == 0


def test_corpus_report(tmp_path, spark, capsys):
    good = "the quick brown fox jumps over the lazy dog and runs on " * 4
    docs = spark.createDataFrame(
        [(1, good), (2, good), (3, "x"), (4, good + " unique tail here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "report.json")
    assert _run(tmp_path, "corpus-report", src, out) == 0
    import json as _json

    rep = _json.load(open(out))
    assert rep["n_docs"] == 4
    assert rep["n_unique"] == 3  # docs 1 and 2 identical
    assert rep["exact_dup_rate"] == 0.25
    assert rep["quality_pass_rate"] == 0.75  # doc 3 too short
    assert rep["predicted_langs"].get("en", 0) >= 3
    assert rep["chars"]["min"] == 1


def test_score_docs_verb(spark, tmp_path, capsys):
    from power_generation_etl_spark.cli import main

    docs = spark.createDataFrame(
        [(1, "spark spark query query join"), (2, "fail error slow")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "scored.parquet")
    assert main(["--warehouse", str(tmp_path / "wh"), "score-docs", src, out]) == 0
    printed = capsys.readouterr().out
    assert "scored 2 docs: keep=1 drop=1" in printed
    got = {r["doc_id"]: r["label"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "keep", 2: "drop"}


def test_list_and_run_query_verbs(spark, tmp_path, capsys):
    from power_generation_etl_spark.cli import main

    wh = str(tmp_path / "wh")
    assert main(["--warehouse", wh, "list-queries"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "oracle" in out
    assert main([
        "--warehouse", wh, "run-query", "distinct_years",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    out = capsys.readouterr().out
    assert "year" in out.splitlines()[0]
    assert main(["--warehouse", wh, "run-query", "nope"]) == 1


def test_run_query_explain_flag(spark, tmp_path, capsys):
    from power_generation_etl_spark.cli import main

    assert main([
        "--warehouse", str(tmp_path / "wh"), "run-query", "pricing_summary",
        "--sf-dir", "/root/testdata/sf0.001", "--explain",
    ]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "PushedFilters" in out


def test_bloom_index_verb(tmp_path, spark, capsys):
    for i in range(2):
        p = tmp_path / f"npp_b{i}.jsonl"
        rec = {
            "extraction_run_id": f"12345678-1234-1234-1234-12345678901{i}",
            "created_at_ms": NOW,
            "timestamp_ms": NOW - 5000 - i,
            "plant": f"P{i}",
            "plant_and_unit": f"P{i} U",
            "generation_mwh": float(i),
        }
        p.write_text(json.dumps(rec) + "\n")
        assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()
    assert _run(tmp_path, "bloom-index", "npp_generation", "--column", "plant") == 0
    out = capsys.readouterr().out
    assert "bloom-indexed" in out and "npp_generation" in out

    from power_generation_etl_spark.engine import Engine
    from power_generation_etl_spark.session import get_spark

    eng = Engine(get_spark("pytest"), _wh(tmp_path))
    kept, total = eng.store.bloom_prune_paths("npp_generation", "plant", "P0")
    assert total >= 2 and 1 <= len(kept) <= total
    assert (
        eng.store.read_bloom_pruned("npp_generation", "plant", "P0")
        .where("plant = 'P0'")
        .count()
        == 1
    )


def test_describe_partitions_verb(tmp_path, spark, capsys):
    months = ["2023-01-15", "2023-02-20"]
    for i, day in enumerate(months):
        import datetime as _dt

        ts = int(
            _dt.datetime.fromisoformat(day + "T00:00:00+00:00").timestamp() * 1000
        )
        p = tmp_path / f"npp_dp{i}.jsonl"
        rec = {
            "extraction_run_id": f"12345678-1234-1234-1234-12345678902{i}",
            "created_at_ms": NOW,
            "timestamp_ms": ts,
            "plant": "P",
            "plant_and_unit": f"P U{i}",
            "generation_mwh": 1.0,
        }
        p.write_text(json.dumps(rec) + "\n")
        assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()
    assert _run(tmp_path, "describe-partitions", "npp_generation") == 0
    out = capsys.readouterr().out
    assert "2023-01" in out and "2023-02" in out and "2 partition(s)" in out
    assert "1 rows" in out


def test_audit_table_verb(tmp_path, spark, capsys):
    """Clean load → exit 0; an out-of-band write that bypasses the
    idempotent append (direct store append of a duplicate + a null
    required field) → exit 1 with both violations reported."""
    p = tmp_path / "npp_audit.jsonl"
    rec = {
        "extraction_run_id": "12345678-1234-1234-1234-123456789030",
        "created_at_ms": NOW,
        "timestamp_ms": NOW - 9000,
        "plant": "P",
        "plant_and_unit": "P U",
        "generation_mwh": 1.0,
    }
    p.write_text(json.dumps(rec) + "\n")
    assert _run(tmp_path, "load-data", "npp", str(p)) == 0
    capsys.readouterr()
    assert _run(tmp_path, "audit-table", "npp") == 0
    assert '"ok": true' in capsys.readouterr().out

    from power_generation_etl_spark.engine import Engine
    from power_generation_etl_spark.session import get_spark

    eng = Engine(get_spark("pytest"), _wh(tmp_path))
    good = eng.store.read("npp_generation")
    bad = good.limit(1).withColumn("plant", F_lit_none_string())
    eng.store.append("npp_generation", good.limit(1))  # duplicate key
    eng.store.append("npp_generation", bad)  # null required field
    capsys.readouterr()
    assert _run(tmp_path, "audit-table", "npp") == 1
    out = capsys.readouterr().out
    assert '"ok": false' in out
    assert '"plant": 1' in out
    assert '"duplicate_key_rows"' in out


def F_lit_none_string():
    from pyspark.sql import functions as F

    return F.lit(None).cast("string")


def test_train_bpe_and_encode_verbs(tmp_path, spark, capsys):
    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "ab ab new")],
        "doc_id long, text string",
    )
    src = tmp_path / "docs.parquet"
    docs.write.parquet(str(src))
    out = tmp_path / "bpe"
    assert _run(tmp_path, "train-bpe", str(src), "--out", str(out),
                "--rounds", "2") == 0
    printed = capsys.readouterr().out
    assert "wrote merges" in printed
    merges = spark.read.parquet(str(out / "merges.parquet"))
    assert merges.count() == 2
    # encode the same corpus plus an OOV word against the frozen vocab
    docs2 = spark.createDataFrame(
        [(9, "low unseen")], "doc_id long, text string"
    )
    src2 = tmp_path / "docs2.parquet"
    docs2.write.parquet(str(src2))
    assert _run(tmp_path, "bpe-encode", str(src2), str(out)) == 0
    enc_out = capsys.readouterr().out
    # 'low' after 2 merges ((l,o) then (lo,w)) is 1 symbol; 'unseen'
    # is OOV -> 6 char symbols: 2 words -> 7 symbols.
    assert "2 words -> 7 symbols" in enc_out


def test_train_bpe_empty_and_degenerate_corpus(tmp_path, spark, capsys):
    """train-bpe on a corpus with no pairs writes an empty merge table;
    bpe-encode against that vocab still works (char fallback covers
    every word, vocab join contributes nothing)."""
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    src = tmp_path / "docs1ch.parquet"
    docs.write.parquet(str(src))
    out = tmp_path / "bpe_empty"
    assert _run(tmp_path, "train-bpe", str(src), "--out", str(out),
                "--rounds", "3") == 0
    capsys.readouterr()
    merges = spark.read.parquet(str(out / "merges.parquet"))
    assert merges.count() == 0
    assert _run(tmp_path, "bpe-encode", str(src), str(out)) == 0
    assert "3 words -> 3 symbols" in capsys.readouterr().out


def test_probe_media_verb(spark, tmp_path, capsys):
    from tests.test_video_containers import _FRAMES, _make_mkv, _make_mp4

    src = str(tmp_path / "media.parquet")
    out = str(tmp_path / "probe.parquet")
    spark.createDataFrame(
        [
            (1, "video", None, _make_mp4(_FRAMES), None, None, None),
            (2, "video", None, _make_mkv(), None, None, None),
            (3, "video", None, b"mystery-bytes", None, None, None),
            (4, "audio", None, b"not probed", None, None, None),
        ],
        "media_id bigint, kind string, mime string, content binary,"
        " width int, height int, duration_ms bigint",
    ).write.parquet(src)
    assert cli.main(["--warehouse", str(tmp_path / "wh"), "probe-media", src, out]) == 0
    printed = capsys.readouterr().out
    assert "probed 3 videos" in printed and "mp4=1" in printed and "mkv=1" in printed
    rows = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["codec"] == "mp4v" and rows[2]["width"] == 640
    assert rows[3]["container"] is None and 4 not in rows
