"""Bloom file-skipping sidecar: per-file membership bits for secondary
columns (complementing min/max range skipping from `cluster`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from power_generation_etl_spark.operators import bloom as bl
from power_generation_etl_spark.store import TableStore


def _store_with_table(spark, tmp_path, n_files=8, rows=400):
    st = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(rows).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # Range-partition by k so each file owns a disjoint k-range — the
    # realistic post-cluster() layout where bloom probes shine.
    df.repartitionByRange(n_files, "k").write.parquet(st.path("t"))
    return st


class TestBloomPositionsParity:
    def test_python_equals_spark_expression(self, spark):
        m, k = 1536, 3
        vals = [0, 7, 123456789, "abc"]
        for v in vals:
            df = spark.createDataFrame([(str(v),)], "key string")
            got = df.select(
                *[bl.bloom_position(F.col("key"), i, m).alias(f"p{i}") for i in range(k)]
            ).collect()[0]
            assert [got[f"p{i}"] for i in range(k)] == bl.bloom_positions_py(
                v, m, k
            )


class TestBloomIndex:
    def test_prune_keeps_matching_rows_and_skips_files(self, spark, tmp_path):
        st = _store_with_table(spark, tmp_path)
        n = st.build_bloom_index("t", "k")
        assert n == st.file_count("t") > 1
        kept, total = st.bloom_prune_paths("t", "k", 123)
        assert 0 < len(kept) < total  # real skipping
        got = (
            st.read_bloom_pruned("t", "k", 123)
            .where(F.col("k") == 123)
            .collect()
        )
        full = st.read("t").where(F.col("k") == 123).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in full]

    def test_absent_value_prunes_everything(self, spark, tmp_path):
        st = _store_with_table(spark, tmp_path)
        st.build_bloom_index("t", "k")
        kept, total = st.bloom_prune_paths("t", "k", 10_000_000)
        # A few false-positive files are possible; all-but-a-few skip.
        assert len(kept) <= total // 2
        assert (
            st.read_bloom_pruned("t", "k", 10_000_000)
            .where(F.col("k") == 10_000_000)
            .count()
            == 0
        )

    def test_unindexed_appends_always_scanned(self, spark, tmp_path):
        st = _store_with_table(spark, tmp_path)
        st.build_bloom_index("t", "k")
        late = spark.createDataFrame([(99999, 1)], "k long, v long")
        late.coalesce(1).write.mode("append").parquet(st.path("t"))
        # 99999 is in no indexed file, but the new unindexed file must
        # still be read — stale sidecars may skip nothing they've seen,
        # never data they haven't.
        rows = (
            st.read_bloom_pruned("t", "k", 99999)
            .where(F.col("k") == 99999)
            .collect()
        )
        assert len(rows) == 1

    def test_missing_sidecar_reads_everything(self, spark, tmp_path):
        st = _store_with_table(spark, tmp_path)
        kept, total = st.bloom_prune_paths("t", "k", 5)
        assert len(kept) == total
