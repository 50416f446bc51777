"""Unit tests for operators/corpus.py — TF-IDF, repetition metrics,
sequence packing, stratified sampling — on hand-computed fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import corpus as cp
from power_generation_etl_spark.operators import minhash as mh
from power_generation_etl_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a", "s1"),       # 5 tokens, bigrams: ab ba ab ba
        (2, "a b c d e", "s1"),       # all-distinct bigrams
        (3, "x x x x", "s1"),         # maximally repetitive
        (4, "unique words only here", "s2"),
        (5, "b c", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestTfidf:
    def test_rare_term_outranks_common(self, docs):
        out = cp.tfidf_top_terms(docs, "doc_id", "text", top_n=100).collect()
        scores = {r["term"]: r["tfidf"] for r in out}
        # 'a' is in 2/5 docs (tf 4), 'x' in 1/5 (tf 4): same total_tf,
        # rarer doc frequency must score higher.
        assert scores["x"] > scores["a"]

    def test_exact_value(self, docs):
        out = {r["term"]: r for r in
               cp.tfidf_top_terms(docs, "doc_id", "text", top_n=100).collect()}
        r = out["x"]
        assert r["df_docs"] == 1 and r["total_tf"] == 4
        assert r["tfidf"] == round(4 * math.log(5 / 1), 4)


class TestRepetition:
    def test_metrics(self, docs):
        out = {r["doc_id"]: r for r in
               cp.repetition_metrics(docs, "doc_id", "text").collect()}
        # doc 1: bigrams [ab, ba, ab, ba] -> 4 total, 2 distinct, top 2
        assert out[1]["n_bigrams"] == 4
        assert out[1]["n_distinct"] == 2
        assert out[1]["top_count"] == 2
        assert out[1]["dup_bigram_frac"] == 0.5
        assert out[1]["top_bigram_frac"] == 0.5
        # doc 2: all distinct
        assert out[2]["dup_bigram_frac"] == 0.0
        # doc 3: 'x x' * 3 -> top fraction 1.0
        assert out[3]["top_bigram_frac"] == 1.0

    def test_single_token_doc_omitted(self, spark):
        one = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
        assert cp.repetition_metrics(one, "doc_id", "text").count() == 0


class TestPacking:
    def test_exclusive_prefix_binning(self, spark):
        # budget 10; source s: tokens 4,4,4 -> prefix 0,4,8 -> seqs 0,0,0
        # then 5 -> prefix 12 -> seq 1
        rows = [("s", 1, 4), ("s", 2, 4), ("s", 3, 4), ("s", 4, 5)]
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
        out = {r["seq_id"]: r for r in
               cp.pack_sequences(df, "source", "doc_id", "n_tok", budget=10).collect()}
        assert out[0]["n_docs"] == 3 and out[0]["seq_tokens"] == 12
        assert out[0]["first_doc"] == 1 and out[0]["last_doc"] == 3
        assert out[1]["n_docs"] == 1 and out[1]["seq_tokens"] == 5

    def test_partitions_pack_independently(self, spark):
        rows = [("a", 1, 12), ("b", 2, 12), ("a", 3, 12), ("b", 4, 12)]
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
        out = cp.pack_sequences(df, "source", "doc_id", "n_tok", budget=10).collect()
        # second doc of each source starts at exclusive prefix 12 >= budget,
        # so each source packs into 2 sequences (numbering is per-source)
        assert len(out) == 4

    def test_catalog_token_counts(self, docs):
        toks = docs.select(
            "doc_id", "source", tx.token_count(F.col("text")).alias("n_tok")
        )
        out = cp.pack_sequences(toks, "source", "doc_id", "n_tok", budget=8)
        total = sum(r["seq_tokens"] for r in out.collect())
        assert total == 5 + 5 + 4 + 4 + 2


class TestStratifiedSample:
    def test_exact_per_stratum_share(self, spark):
        rows = [(i, "en" if i < 80 else "de") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        hk = mh.portable_hash32(F.col("doc_id").cast("string"))
        out = cp.stratified_sample(df, "lang", "doc_id", hk, fraction=0.25)
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"en": 20, "de": 5}

    def test_deterministic(self, spark):
        rows = [(i, "x") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        hk = mh.portable_hash32(F.col("doc_id").cast("string"))
        a = sorted(r["doc_id"] for r in
                   cp.stratified_sample(df, "lang", "doc_id", hk, 0.1).collect())
        b = sorted(r["doc_id"] for r in
                   cp.stratified_sample(df, "lang", "doc_id", hk, 0.1).collect())
        assert a == b and len(a) == 5
