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


class TestBottomKQuantiles:
    """Bottom-k hash-sample quantile sketch (r11): mergeability,
    partitioning-independence, and bounded-size — the properties that
    make it a viable streaming store at 100 TB."""

    def _df(self, spark, keys):
        rows = [("g1", k, float(k) * 1.5 + 0.25) for k in keys] + [
            ("g2", k, float(1000 - k)) for k in keys
        ]
        return spark.createDataFrame(rows, "grp string, key long, v double")

    def test_merge_equals_union(self, spark):
        """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) —
        the mergeability contract the streaming store relies on."""
        a = self._df(spark, range(0, 300))
        b = self._df(spark, range(200, 500))  # 100-key overlap
        union = a.unionByName(b)
        direct = sk.bottomk_sample(union, "grp", "key", "v", k=16)
        merged = sk.bottomk_sample(
            sk.bottomk_sample(a, "grp", "key", "v", k=16).unionByName(
                sk.bottomk_sample(b, "grp", "key", "v", k=16)
            ).select("grp", "key", "v"),
            "grp", "key", "v", k=16,
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_partitioning_independent(self, spark):
        df = self._df(spark, range(0, 400))
        q1 = sk.sample_quantiles(
            sk.bottomk_sample(df, "grp", "key", "v", k=32), [25, 50, 90]
        ).collect()
        q2 = sk.sample_quantiles(
            sk.bottomk_sample(df.repartition(13), "grp", "key", "v", k=32),
            [25, 50, 90],
        ).collect()
        assert sorted(map(tuple, q1)) == sorted(map(tuple, q2))

    def test_small_group_exact(self, spark):
        """n < k: the sample IS the group, quantiles are exact type-1."""
        rows = [("g", i, float(v)) for i, v in enumerate([5, 1, 9, 3])]
        df = spark.createDataFrame(rows, "grp string, key long, v double")
        out = sk.sample_quantiles(
            sk.bottomk_sample(df, "grp", "key", "v", k=16), [25, 50, 75, 100]
        ).collect()[0]
        # sorted values [1,3,5,9]; ceil(p*4/100)-th: p25->1st, p50->2nd,
        # p75->3rd, p100->4th
        assert (out["n_sample"], out["p25"], out["p50"], out["p75"], out["p100"]) == (
            4, 1, 3, 5, 9,
        )

    def test_sample_is_bounded(self, spark):
        df = self._df(spark, range(0, 1000))
        samp = sk.bottomk_sample(df, "grp", "key", "v", k=8)
        counts = {r["grp"]: r["n"] for r in samp.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"g1": 8, "g2": 8}


class TestBitmapDistinct:
    def test_word_boundaries_and_merge(self, spark, tmp_path):
        import shutil as _sh

        from power_generation_etl_spark.plans.approx_queries import (
            bitmap_distinct_users,
        )

        # ids straddling word boundaries incl. bit 61 (the top bit the
        # 62-bit layout ever sets) and a cross-type shared user whose
        # merged count must not double.
        rows = [
            (1, "a", 0), (2, "a", 61), (3, "a", 62), (4, "a", 123),
            (5, "b", 61), (6, "b", 124), (7, "b", 124),
        ]
        ev = spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", u, t, 1.0, None)
             for i, t, u in rows],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts",
                     "user_id", "event_type", "value", "props")
        sf = tmp_path / "sf"
        sf.mkdir()
        ev.write.parquet(str(sf / "events.parquet"))
        got = {r["event_type"]: (r["n_users"], r["n_words"])
               for r in bitmap_distinct_users(spark, str(sf)).collect()}
        _sh.rmtree(sf, ignore_errors=True)
        assert got["a"] == (4, 2)   # users {0,61,62,123}; words {0,1}
        assert got["b"] == (2, 2)   # users 61, 124; words {0, 2}
        assert got["__all__"] == (5, 3)  # users {0,61,62,123,124}, words {0,1,2}
