"""Property-based invariants for corpus operators (hypothesis, small
example counts — every example runs Spark jobs) plus empty-input
robustness."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # randomized property battery; run with -m "slow or not slow"

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import corpus as cp
from power_generation_etl_spark.operators import minhash as mh

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestPackingProperties:
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
        budget=st.integers(min_value=5, max_value=40),
    )
    @settings(**_SETTINGS)
    def test_conservation_and_monotonicity(self, spark, toks, budget):
        rows = [("s", i, t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
        out = cp.pack_sequences(df, "source", "doc_id", "n_tok", budget=budget)
        got = sorted(out.collect(), key=lambda r: r["seq_id"])
        # conservation: every token and every doc lands in exactly one seq
        assert sum(r["seq_tokens"] for r in got) == sum(toks)
        assert sum(r["n_docs"] for r in got) == len(toks)
        # first sequence starts at 0; doc ranges don't overlap and ascend
        assert got[0]["seq_id"] == 0
        for a, b in zip(got, got[1:]):
            assert a["seq_id"] < b["seq_id"]
            assert a["last_doc"] < b["first_doc"]
        # exact binning invariant: a sequence's first doc has exclusive
        # token prefix inside [seq_id*budget, (seq_id+1)*budget) — and
        # since docs are consecutive, that prefix is the sum of all
        # earlier sequences' tokens
        prefix = 0
        for r in got:
            assert r["seq_id"] * budget <= prefix < (r["seq_id"] + 1) * budget
            prefix += r["seq_tokens"]

    @given(
        sizes=st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=1, max_value=30),
            min_size=1,
        ),
        frac_pct=st.integers(min_value=1, max_value=99),
    )
    @settings(**_SETTINGS)
    def test_stratified_exact_share(self, spark, sizes, frac_pct):
        frac = frac_pct / 100.0
        rows = []
        i = 0
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        hk = mh.portable_hash32(F.col("doc_id").cast("string"))
        out = cp.stratified_sample(df, "lang", "doc_id", hk, fraction=frac)
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for g, n in sizes.items():
            assert counts.get(g, 0) == math.ceil(n * frac)


class TestEmptyInputs:
    def test_empty_docs_everywhere(self, spark):
        empty = spark.createDataFrame(
            [], "doc_id long, text string, source string, lang string"
        )
        assert cp.tfidf_top_terms(empty, "doc_id", "text").count() == 0
        assert cp.repetition_metrics(empty, "doc_id", "text").count() == 0
        assert cp.pack_sequences(
            empty.withColumn("n_tok", F.lit(1).cast("long")),
            "source", "doc_id", "n_tok",
        ).count() == 0
        hk = mh.portable_hash32(F.col("doc_id").cast("string"))
        assert cp.stratified_sample(empty, "lang", "doc_id", hk).count() == 0


class TestChunkDedupProperties:
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=6,
        ),
        chunk=st.integers(min_value=1, max_value=5),
    )
    @settings(**_SETTINGS)
    def test_counts_conserve_and_bound(self, spark, docs, chunk):
        rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in cp.chunk_dedup_stats(
            df, "doc_id", "text", chunk=chunk
        ).collect()}
        assert set(out) == set(range(len(docs)))
        for i, words in enumerate(docs):
            r = out[i]
            expected_chunks = -(-len(words) // chunk)  # ceil
            assert r["n_chunks"] == expected_chunks
            assert r["n_kept"] + r["n_dup"] == r["n_chunks"]
            assert r["n_kept"] >= 0 and r["n_dup"] >= 0
        # corpus-wide: kept chunks == distinct chunk hashes
        total_kept = sum(r["n_kept"] for r in out.values())
        distinct = (
            cp.chunk_hashes(df, "doc_id", "text", chunk=chunk)
            .select("chunk_hash")
            .distinct()
            .count()
        )
        assert total_kept == distinct
