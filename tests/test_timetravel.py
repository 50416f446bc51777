"""Time travel (versioned snapshots + vacuum) and MERGE-style upsert
on the parquet TableStore."""

from __future__ import annotations

import pytest

from power_generation_etl_spark.store import TableStore


@pytest.fixture()
def vstore(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh"), versioned=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ord long")


class TestTimeTravel:
    def test_overwrite_archives_previous_version(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        vstore.overwrite("t", _df(spark, [(1, "b", 2)]))
        assert vstore.versions("t") == [1]
        old = vstore.read_version("t", 1).collect()
        assert [(r["k"], r["v"]) for r in old] == [(1, "a")]
        assert vstore.read("t").collect()[0]["v"] == "b"

    def test_restore_rolls_back_and_archives_current(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        vstore.overwrite("t", _df(spark, [(1, "b", 2)]))
        vstore.restore("t", 1)
        assert vstore.read("t").collect()[0]["v"] == "a"
        # restore archived the pre-restore state as v2
        assert vstore.versions("t") == [1, 2]
        assert vstore.read_version("t", 2).collect()[0]["v"] == "b"

    def test_vacuum_keeps_newest(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        for i in range(3):
            vstore.overwrite("t", _df(spark, [(1, f"x{i}", i + 2)]))
        assert vstore.versions("t") == [1, 2, 3]
        removed = vstore.vacuum("t", keep=1)
        assert removed == 2 and vstore.versions("t") == [3]

    def test_unversioned_store_keeps_no_history(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "wh2"))
        store.overwrite("t", _df(spark, [(1, "a", 1)]))
        store.overwrite("t", _df(spark, [(1, "b", 2)]))
        assert store.versions("t") == []

    def test_read_missing_version_raises(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        with pytest.raises(ValueError):
            vstore.read_version("t", 5)


class TestMergeUpsert:
    def test_insert_update_and_untouched(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "wh"))
        store.overwrite("t", _df(spark, [(1, "a", 1), (2, "b", 1)]))
        store.merge_upsert(
            "t", _df(spark, [(2, "b2", 2), (3, "c", 2)]), ["k"], "ord"
        )
        got = {r["k"]: r["v"] for r in store.read("t").collect()}
        assert got == {1: "a", 2: "b2", 3: "c"}

    def test_reapply_same_batch_is_idempotent(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "wh"))
        store.overwrite("t", _df(spark, [(1, "a", 1)]))
        batch = _df(spark, [(1, "a2", 2)])
        store.merge_upsert("t", batch, ["k"], "ord")
        store.merge_upsert("t", batch, ["k"], "ord")
        rows = store.read("t").collect()
        assert len(rows) == 1 and rows[0]["v"] == "a2"

    def test_stale_change_does_not_regress(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "wh"))
        store.overwrite("t", _df(spark, [(1, "new", 5)]))
        store.merge_upsert("t", _df(spark, [(1, "old", 2)]), ["k"], "ord")
        assert store.read("t").collect()[0]["v"] == "new"

    def test_change_wins_order_tie(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "wh"))
        store.overwrite("t", _df(spark, [(1, "cur", 3)]))
        store.merge_upsert("t", _df(spark, [(1, "chg", 3)]), ["k"], "ord")
        assert store.read("t").collect()[0]["v"] == "chg"


class TestDiffVersions:
    def test_diff_tags_inserts_and_deletes(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1), (2, "b", 1)]))
        vstore.overwrite("t", _df(spark, [(1, "a", 1), (2, "b2", 2), (3, "c", 1)]))
        diff = vstore.diff_versions("t", 1)
        got = {(r["k"], r["v"], r["_change"]) for r in diff.collect()}
        assert got == {
            (2, "b2", "insert"),
            (3, "c", "insert"),
            (2, "b", "delete"),
        }

    def test_diff_empty_when_identical(self, spark, vstore):
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        assert vstore.diff_versions("t", 1).count() == 0


class TestTimeTravelCLI:
    def test_cli_version_verbs(self, spark, tmp_path, capsys):
        from power_generation_etl_spark.cli import main

        wh = str(tmp_path / "wh")
        store = TableStore(spark, wh, versioned=True)
        store.overwrite("npp_generation_data", _df(spark, [(1, "a", 1)]))
        store.overwrite("npp_generation_data", _df(spark, [(1, "b", 2)]))
        assert main(["--warehouse", wh, "--versioned", "list-versions",
                     "npp_generation_data"]) == 0
        out = capsys.readouterr().out
        assert "v1" in out and "1 archived" in out
        assert main(["--warehouse", wh, "--versioned", "diff-versions",
                     "npp_generation_data", "1"]) == 0
        out = capsys.readouterr().out
        assert "inserts=1 deletes=1" in out
        assert main(["--warehouse", wh, "--versioned", "restore-table",
                     "npp_generation_data", "1"]) == 0
        capsys.readouterr()
        assert store.read("npp_generation_data").collect()[0]["v"] == "a"
        assert main(["--warehouse", wh, "--versioned", "vacuum-table",
                     "npp_generation_data", "--keep", "0"]) == 0
        assert store.versions("npp_generation_data") == []


class TestReviewRegressions:
    def test_restore_archives_even_unversioned(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        vstore = TableStore(spark, wh, versioned=True)
        vstore.overwrite("t", _df(spark, [(1, "a", 1)]))
        vstore.overwrite("t", _df(spark, [(1, "b", 2)]))
        # user forgets --versioned on the restore call
        plain = TableStore(spark, wh)
        plain.restore("t", 1)
        assert plain.read("t").collect()[0]["v"] == "a"
        # the pre-restore state ("b") must still exist as a snapshot
        vs = plain.versions("t")
        assert vs and plain.read_version("t", max(vs)).collect()[0]["v"] == "b"

    def test_schema_only_state_is_not_archived(self, spark, tmp_path):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        vstore = TableStore(spark, str(tmp_path / "wh"), versioned=True)
        schema = StructType(
            [StructField("k", LongType()), StructField("v", StringType())]
        )
        vstore.create("t", schema)
        vstore.overwrite(
            "t", spark.createDataFrame([(1, "a")], "k long, v string")
        )
        # the parquet-less create() state must not become a version:
        # read_version could never scan it and list-versions would crash
        assert vstore.versions("t") == []
        vstore.overwrite(
            "t", spark.createDataFrame([(1, "b")], "k long, v string")
        )
        for v in vstore.versions("t"):
            vstore.read_version("t", v).count()  # every version readable

    def test_merge_upsert_same_key_same_ord_deterministic(self, spark, tmp_path):
        batch_rows = [(1, "a", 2), (1, "b", 2)]
        winners = []
        for i in range(2):
            store = TableStore(spark, str(tmp_path / f"wh{i}"))
            store.overwrite("t", _df(spark, [(1, "z", 1)]))
            store.merge_upsert("t", _df(spark, batch_rows), ["k"], "ord")
            rows = store.read("t").collect()
            assert len(rows) == 1
            winners.append(rows[0]["v"])
        assert winners[0] == winners[1]  # content-hash tiebreak, not partition order


class TestDeleteWhere:
    def test_delete_semantics_and_versioning(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from power_generation_etl_spark.store import TableStore

        st = TableStore(spark, str(tmp_path / "wh"), versioned=True)
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 30), (4, 40)], "k long, v long"
        )
        st.overwrite("t", df)
        # NULL predicate keeps its row (SQL DELETE semantics)
        n = st.delete_where("t", F.col("v") > 25)
        assert n == 2
        assert sorted(r["k"] for r in st.read("t").collect()) == [1, 2]
        # pre-delete snapshot archived; restore brings all rows back
        vs = st.versions("t")
        assert vs, "versioned store must archive the pre-delete state"
        st.restore("t", vs[-1])
        assert st.count("t") == 4

    def test_no_match_no_rewrite(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from power_generation_etl_spark.store import TableStore

        st = TableStore(spark, str(tmp_path / "wh"), versioned=True)
        st.overwrite("t", spark.createDataFrame([(1,)], "k long"))
        n_versions = len(st.versions("t"))
        assert st.delete_where("t", F.col("k") > 99) == 0
        assert len(st.versions("t")) == n_versions  # untouched
        assert st.delete_where("missing", F.lit(True)) == 0
