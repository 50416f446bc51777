"""Approximate-structure operators: Bloom filter and Count-Min sketch
semantics (the catalog entries in `plans/approx_queries.py` are
oracle-checked end-to-end; these tests pin the structural guarantees —
no false negatives, upper-bound estimates, bounded error)."""

from __future__ import annotations

from pyspark.sql import functions as F

from power_generation_etl_spark.operators import bloom as bl
from power_generation_etl_spark.operators import sketch as sk


class TestBloom:
    M, K = 1536, 3

    def _words(self, spark, keys):
        df = spark.createDataFrame([(k,) for k in keys], "key bigint")
        return bl.build_bloom_words(df, "key", m=self.M, k=self.K)

    def test_no_false_negatives(self, spark):
        keys = list(range(0, 400, 4))
        words = self._words(spark, keys)
        probe = spark.createDataFrame([(k,) for k in keys], "key bigint")
        hits = probe.where(
            bl.bloom_member_expr(F.col("key"), words, m=self.M, k=self.K)
        ).count()
        assert hits == len(keys)  # every member passes, always

    def test_false_positive_rate_bounded(self, spark):
        members = list(range(0, 400, 4))
        words = self._words(spark, members)
        non_members = [k for k in range(1, 2000, 2)]  # odd → disjoint
        probe = spark.createDataFrame([(k,) for k in non_members], "key bigint")
        fp = probe.where(
            bl.bloom_member_expr(F.col("key"), words, m=self.M, k=self.K)
        ).count()
        # n=100, m=1536, k=3 → theoretical fp ≈ 0.6%; allow 10x slack.
        assert fp / len(non_members) < 0.06

    def test_empty_key_set_rejects_everything(self, spark):
        words = self._words(spark, [])
        assert words == [0] * (self.M // bl.WORD_BITS)
        probe = spark.createDataFrame([(k,) for k in range(50)], "key bigint")
        assert (
            probe.where(
                bl.bloom_member_expr(F.col("key"), words, m=self.M, k=self.K)
            ).count()
            == 0
        )

    def test_parameter_validation(self, spark):
        import pytest

        df = spark.createDataFrame([(1,)], "key bigint")
        with pytest.raises(ValueError):
            bl.build_bloom_words(df, "key", m=1000, k=3)  # not mult of 48
        with pytest.raises(ValueError):
            bl.build_bloom_words(df, "key", m=1536, k=0)


class TestCountMin:
    W, D = 256, 3

    def test_estimate_is_upper_bound(self, spark):
        # Skewed multiset: key i appears i+1 times, i in [0, 50).
        rows = [(i,) for i in range(50) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "key bigint")
        counters = sk.cms_counters(df, "key", w=self.W, d=self.D)
        keys = spark.createDataFrame([(i,) for i in range(50)], "key bigint")
        est = {
            r["key"]: r["cms_est"]
            for r in sk.cms_estimate(
                counters, keys, "key", w=self.W, d=self.D
            ).collect()
        }
        for i in range(50):
            assert est[i] >= i + 1  # CMS never undercounts

    def test_exact_when_no_collisions(self, spark):
        # 5 keys in a 256-wide sketch: collisions are possible but a
        # min over 3 independent rows colliding on ALL rows for ANY of
        # 5 keys is ~impossible; assert exactness.
        rows = [(i,) for i in range(5) for _ in range(10 * (i + 1))]
        df = spark.createDataFrame(rows, "key bigint")
        counters = sk.cms_counters(df, "key", w=self.W, d=self.D)
        keys = spark.createDataFrame([(i,) for i in range(5)], "key bigint")
        est = {
            r["key"]: r["cms_est"]
            for r in sk.cms_estimate(
                counters, keys, "key", w=self.W, d=self.D
            ).collect()
        }
        assert est == {i: 10 * (i + 1) for i in range(5)}

    def test_counter_table_bounded(self, spark):
        rows = [(i % 1000,) for i in range(5000)]
        df = spark.createDataFrame(rows, "key bigint")
        counters = sk.cms_counters(df, "key", w=self.W, d=self.D)
        assert counters.count() <= self.W * self.D
        # Each depth row partitions the full input: per-row counts sum
        # to the input size.
        per_row = {
            r["j"]: r["total"]
            for r in counters.groupBy("j")
            .agg(F.sum("cnt").alias("total"))
            .collect()
        }
        assert per_row == {j: 5000 for j in range(self.D)}
