"""Unit tests for operators/hygiene.py and operators/profile.py —
decontamination, PII scan/redaction, histograms, quantile thresholds,
per-group top-k, exact-arithmetic anomalies, int8 quantization — plus
the I4 retry/backoff contract (reference src/database.py:63-82)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark import incremental as inc
from power_generation_etl_spark.operators import hygiene as hg
from power_generation_etl_spark.operators import profile as pr
from power_generation_etl_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "contact me at alice@example.com or bob.smith@mail.co.uk thanks"),
        (2, "server at 192.168.1.100 and 10.0.0.1 went down"),
        (3, "call +1 555 123-4567 right now"),
        (4, "nothing sensitive in this one at all"),
        (5, "alice@example.com from 10.0.0.1 dialed 555 123 4567 8900"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPii:
    def test_counts(self, pii_docs):
        out = {r["doc_id"]: r for r in
               hg.pii_scan(pii_docs, "doc_id", "text").collect()}
        assert out[1]["n_email"] == 2 and out[1]["has_pii"]
        assert out[2]["n_ipv4"] == 2
        assert out[3]["n_phone"] == 1
        assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0
        assert not out[4]["has_pii"]
        assert out[5]["n_email"] == 1 and out[5]["n_ipv4"] == 1

    def test_redaction_replaces_every_kind(self, pii_docs):
        red = {r["doc_id"]: r["red"] for r in pii_docs.select(
            "doc_id", hg.redact_pii(F.col("text")).alias("red")).collect()}
        assert red[1] == "contact me at [EMAIL] or [EMAIL] thanks"
        assert red[2] == "server at [IP] and [IP] went down"
        assert "[PHONE]" in red[3] and "555" not in red[3]
        assert red[4] == "nothing sensitive in this one at all"

    def test_email_not_double_claimed_by_phone(self, pii_docs):
        # Ordering contract: the email is consumed before the phone
        # pattern can bite on its digit runs.
        red = pii_docs.filter(F.col("doc_id") == 5).select(
            hg.redact_pii(F.col("text")).alias("r")).first()["r"]
        assert red.startswith("[EMAIL] from [IP] dialed [PHONE]")


class TestDecontaminate:
    def test_overlapping_doc_flagged(self, spark):
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "we say the quick brown fox jumps high today"),  # 5-gram hit
                (2, "completely unrelated text with no overlap at all"),
                (3, "brown fox jumps over the lazy dog indeed"),      # hit
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               hg.decontaminate(corpus, bench, "doc_id", "text", n=5).collect()}
        assert set(out) == {1, 3}
        # doc 1 shares exactly 'the quick brown fox jumps'
        assert out[1]["n_hit_ngrams"] == 1 and out[1]["n_bench_docs"] == 1
        # doc 3 shares 3 aligned 5-grams of the tail ('brown fox jumps
        # over the', 'fox jumps over the lazy', 'jumps over the lazy dog')
        assert out[3]["n_hit_ngrams"] == 3

    def test_short_docs_produce_no_shingles(self, spark):
        bench = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        corpus = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
        assert hg.decontaminate(corpus, bench, "doc_id", "text", n=5).count() == 0


class TestProfile:
    def test_histogram_buckets_and_clamp(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in [0, 49, 50, 99, 5000]], "n long")
        out = {r["bucket"]: r for r in pr.fixed_width_histogram(
            df, "n", width=50, n_buckets=20).collect()}
        assert out[0]["n_rows"] == 2 and out[0]["min_value"] == 0
        assert out[1]["n_rows"] == 2 and out[1]["bucket_lo"] == 50
        # open-ended last bucket catches the outlier
        assert out[19]["n_rows"] == 1 and out[19]["max_value"] == 5000

    def test_quantile_threshold_strictly_above(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1, 11)], "v long")
        out = pr.quantile_threshold_filter(df, "v", 0.8).collect()
        # exact q80 of 1..10 = 8.2 -> rows 9, 10
        assert sorted(r["v"] for r in out) == [9, 10]
        assert out[0]["threshold"] == 8.2

    def test_topk_per_group_deterministic_ties(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 5), ("g", 2, 5), ("g", 3, 5), ("g", 4, 1)],
            "grp string, id long, score long",
        )
        out = pr.topk_per_group(df, "grp", "score", "id", 2).collect()
        assert [(r["id"], r["rn"]) for r in sorted(out, key=lambda r: r["rn"])] \
            == [(1, 1), (2, 2)]

    def test_anomaly_flag_exact(self, spark):
        # user 1: values [1, 1, 10] -> mean 4, 10 > 12 is False.
        # user 2: nine 1.0s + one 100.0 -> mean 10.9, 100 > 32.7 True.
        rows = [(1, 1.0), (1, 1.0), (1, 10.0)]
        rows += [(2, 1.0)] * 9 + [(2, 100.0)]
        df = spark.createDataFrame(rows, "user_id long, value double")
        out = {r["user_id"]: r for r in pr.mean_factor_anomalies(
            df, "user_id", "value", factor=3, scale=100).collect()}
        assert out[1]["n_anomalies"] == 0
        assert out[2]["n_anomalies"] == 1
        assert out[2]["mean_value"] == pytest.approx(10.9, abs=1e-4)

    def test_anomaly_boundary_is_strict(self, spark):
        # x == 3*mean exactly must NOT flag: values [1, 1, 1, 9]: mean 3, 9 == 9.
        df = spark.createDataFrame(
            [(1, 1.0), (1, 1.0), (1, 1.0), (1, 9.0)], "user_id long, value double")
        out = pr.mean_factor_anomalies(df, "user_id", "value").collect()[0]
        assert out["n_anomalies"] == 0


class TestInt8Quant:
    def test_report_bounds(self, spark):
        rows = [(1, [1.0, -0.5, 0.25, 0.0], 0), (2, [0.1, 0.2, -0.3, 0.4], 1)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        out = {r["vec_id"]: r for r in sim.int8_quantize_report(
            df, "vec_id", "embedding", "label").collect()}
        # scale = 1.0; worst-case err of round-to-127ths is 1/254
        for r in out.values():
            assert 0.0 <= r["max_abs_err"] <= 1.0 / 254 + 1e-9
            assert 0.99 <= r["cos_orig_quant"] <= 1.0
        # exact grid points quantize losslessly: 1.0*127/1 = 127 exactly
        assert out[1]["max_abs_err"] <= 1.0 / 254

    def test_zero_vector_survives(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0], 0), (2, [0.0, 0.0], 0)],
            "vec_id long, embedding array<double>, label int")
        out = {r["vec_id"]: r for r in sim.int8_quantize_report(
            df, "vec_id", "embedding", "label").collect()}
        assert out[2]["max_abs_err"] == 0.0
        assert out[2]["cos_orig_quant"] is None  # 0/0 -> null, not a crash


class TestRetry:
    def test_transient_failure_then_success(self, monkeypatch):
        monkeypatch.setattr(inc.time, "sleep", lambda s: None)
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ConnectionError("transient")
            return "ok"

        assert inc.retry(flaky, attempts=3, base_wait=0.01) == "ok"
        assert len(calls) == 3

    def test_exhausted_attempts_reraise(self, monkeypatch):
        sleeps: list[float] = []
        monkeypatch.setattr(inc.time, "sleep", sleeps.append)

        def always_down():
            raise OSError("down")

        with pytest.raises(OSError):
            inc.retry(always_down, attempts=3, base_wait=1.0, max_wait=10.0)
        # exponential backoff: 1s then 2s, no sleep after the last try
        assert sleeps == [1.0, 2.0]

    def test_non_transient_not_retried(self):
        calls = []

        def broken():
            calls.append(1)
            raise ValueError("logic bug")

        with pytest.raises(ValueError):
            inc.retry(broken, attempts=3)
        assert len(calls) == 1


class TestApproxThreshold:
    def test_approx_path_close_to_exact(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1, 1001)], "v long")
        exact = pr.quantile_threshold_filter(df, "v", 0.9)
        approx = pr.quantile_threshold_filter(df, "v", 0.9, approx=True)
        ne, na = exact.count(), approx.count()
        # sketch accuracy 10k: within 1% of the exact selection on 1k rows
        assert abs(ne - na) <= 10
        assert "approx_percentile" in approx._jdf.queryExecution().toString()


class TestTableProfile:
    def test_nulls_distincts_minmax(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, tag string")
        out = {r["column"]: r for r in pr.table_profile(df, ["id", "tag"]).collect()}
        assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
        assert out["id"]["n_distinct"] == 4
        assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"
        assert out["tag"]["n_nulls"] == 1
        assert out["tag"]["n_distinct"] == 2  # nulls don't count
        assert out["tag"]["min_value"] == "a" and out["tag"]["max_value"] == "b"

    def test_single_aggregation_pass(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, tag string")
        plan = pr.table_profile(df, ["id", "tag"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1


class TestEncodingQuality:
    def _counts(self, spark, text):
        df = spark.createDataFrame([(text,)], "text string")
        ev = hg.encoding_quality(F.col("text"))
        return df.select(*[c.alias(n) for n, c in ev.items()]).collect()[0]

    def test_clean_ascii(self, spark):
        r = self._counts(spark, "perfectly clean text")
        assert (r["n_control"], r["n_replacement"], r["n_mojibake"]) == (0, 0, 0)
        assert r["has_nonascii"] == 0

    def test_mojibake_counted_per_digraph(self, spark):
        # 'é' double-encoded twice + one 'ü' → 3 mojibake digraphs.
        r = self._counts(spark, "cafÃ© naÃ¯ve glÃ¼hwein")
        assert r["n_mojibake"] == 3
        assert r["has_nonascii"] == 1

    def test_control_and_replacement_chars(self, spark):
        r = self._counts(spark, "a\x01b\x02c�� tab\tok\nline")
        assert r["n_control"] == 2  # \t and \n are NOT damage
        assert r["n_replacement"] == 2

    def test_clean_unicode_is_not_mojibake(self, spark):
        # Properly encoded accents must not trip the mojibake pattern.
        r = self._counts(spark, "café naïve glühwein — ok")
        assert r["n_mojibake"] == 0
        assert r["has_nonascii"] == 1
