"""End-to-end pretraining-data prep pipeline: quality -> exact dedup ->
near-dup dedup -> language tag -> packing -> JSONL shards."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # end-to-end shard pipeline; run with -m "slow or not slow"

from pyspark.sql import functions as F

from power_generation_etl_spark.pipelines.pretrain import prepare_pretraining_shards


def test_prepare_pretraining_shards(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    s = prepare_pretraining_shards(docs, out, neardup_threshold=0.5)

    # monotone funnel, nothing fully emptied
    assert s.n_input >= s.n_after_quality >= s.n_after_exact_dedup >= s.n_after_neardup
    assert s.n_after_neardup > 0 and s.n_sequences > 0

    shards = spark.read.json(out)
    assert shards.count() == s.n_after_neardup
    # hive partitioning by source survived
    assert "source" in shards.columns
    assert shards.select("source").distinct().count() > 1
    # token conservation: shard rows sum to the reported total
    assert shards.agg(F.sum("n_tok")).head()[0] == s.total_tokens
    # every doc got a language tag
    assert shards.filter(F.col("predicted_lang").isNull()).count() == 0

    # no exact duplicates survive
    assert (
        shards.groupBy(F.md5(F.col("text").cast("binary"))).count()
        .filter(F.col("count") > 1).count() == 0
    )

    # no verified near-dup pairs survive at the pipeline threshold
    from power_generation_etl_spark.operators import minhash as mh

    left = mh.minhash_lsh_pairs(shards, "doc_id", "text", threshold=0.5)
    assert left.count() == 0


def test_pipeline_deterministic(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = prepare_pretraining_shards(docs, str(tmp_path / "a"))
    b = prepare_pretraining_shards(docs, str(tmp_path / "b"))
    assert a == b
    ra = sorted(
        (r["doc_id"], r["seq_id"])
        for r in spark.read.json(str(tmp_path / "a")).collect()
    )
    rb = sorted(
        (r["doc_id"], r["seq_id"])
        for r in spark.read.json(str(tmp_path / "b")).collect()
    )
    assert ra == rb


def test_pipeline_decontam_and_redaction(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today " * 3, "s1"),
            (2, "an entirely different document about data engineering "
                "pipelines with plenty of ordinary words to pass quality "
                "reach me at alice@example.com for details and questions", "s1"),
            (3, "another clean document describing spark catalyst plans "
                "joins aggregates windows shuffles partitions and scans "
                "nothing sensitive appears anywhere in this text at all", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "we know the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    s = prepare_pretraining_shards(
        docs, str(tmp_path / "shards"), benchmark=bench, decontam_n=5
    )
    assert s.n_after_neardup == 3
    assert s.n_after_decontam == 2  # doc 1 leaks benchmark 5-grams
    shards = spark.read.json(str(tmp_path / "shards"))
    ids = {r["doc_id"] for r in shards.collect()}
    assert ids == {2, 3}
    # the email was redacted in the written shard
    texts = {r["doc_id"]: r["text"] for r in shards.collect()}
    assert "[EMAIL]" in texts[2] and "alice@example.com" not in texts[2]

    # redaction off and no benchmark: funnel unchanged, text untouched
    s2 = prepare_pretraining_shards(
        docs, str(tmp_path / "shards2"), redact_pii=False
    )
    assert s2.n_after_decontam == s2.n_after_neardup == 3
    t2 = {r["doc_id"]: r["text"]
          for r in spark.read.json(str(tmp_path / "shards2")).collect()}
    assert "alice@example.com" in t2[2]


def test_pipeline_bpe_budgeted_packing(spark, tmp_path):
    """With a trained BPE vocab, n_tok is the post-merge symbol count
    (so packing budgets match tokenizer output), with char-level
    fallback for OOV words."""
    from power_generation_etl_spark.operators import bpe

    train = spark.createDataFrame(
        [(1, "low low low lower", "s0")],
        "doc_id long, text string, source string",
    )
    vocab = bpe.trained_segmentation(train, "text", rounds=2)
    # after (l,o) and (lo,w): 'low' -> 1 symbol, 'lower' -> low+e+r = 3
    docs = spark.createDataFrame(
        [
            (1, "low low lower " + "spark query join window " * 10, "s0"),
            (2, "low zz " + "table scan filter value " * 10, "s0"),
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "bpe_shards")
    s = prepare_pretraining_shards(
        docs, out, budget=64, neardup_threshold=0.9, bpe_vocab=vocab
    )
    shards = spark.read.json(out)
    got = {r["doc_id"]: r["n_tok"] for r in shards.collect()}
    # doc 1: low(1)+low(1)+lower(3) + 40 OOV words x word-length chars
    d1_oov = sum(len(w) for w in ("spark query join window ".split() * 10))
    assert got[1] == 1 + 1 + 3 + d1_oov
    d2_oov = sum(len(w) for w in ("table scan filter value ".split() * 10)) + 2
    assert got[2] == 1 + d2_oov
    assert s.total_tokens == got[1] + got[2]


def test_pipeline_repetition_filter(spark, tmp_path):
    """repetition_filter drops Gopher-flagged looping docs; clean docs
    of the same length survive."""
    loop = "click here menu home " * 30
    clean = " ".join(f"word{i} item{i} part{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, loop, "s0"), (2, clean, "s0")],
        "doc_id long, text string, source string",
    )
    out1 = str(tmp_path / "rep_on")
    s_on = prepare_pretraining_shards(
        docs, out1, neardup_threshold=0.9, repetition_filter=True
    )
    out2 = str(tmp_path / "rep_off")
    s_off = prepare_pretraining_shards(
        docs, out2, neardup_threshold=0.9, repetition_filter=False
    )
    assert s_off.n_after_quality == 2
    assert s_on.n_after_quality == 1
    kept = spark.read.json(out1)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_pipeline_c4_clean_rewrites_text(spark, tmp_path):
    good = "This sentence is long enough and ends properly. " * 2
    docs = spark.createDataFrame(
        [
            (1, good + "\nEnable javascript now", "a"),
            (2, "{ nav menu\nshort.", "a"),  # every line dropped -> empty
            (3, good, "b"),
        ],
        "doc_id bigint, text string, source string",
    )
    s = prepare_pretraining_shards(
        docs, str(tmp_path / "s"), c4_clean=True, redact_pii=False
    )
    shards = spark.read.json(str(tmp_path / "s"))
    texts = {r["doc_id"]: r["text"] for r in shards.collect()}
    # doc 1 survives with the javascript line stripped
    assert "javascript" not in texts[1]
    # doc 2's cleaned form is empty -> dies at the quality gate
    assert 2 not in texts
    assert s.n_after_quality < s.n_input


def test_pipeline_gopher_filter(spark, tmp_path):
    stop = "the be to of and that have with "
    good = stop + " ".join(["content"] * 60) + "."
    bullets = "\n".join(["- item one two"] * 30)
    docs = spark.createDataFrame(
        [(1, good, "a"), (2, bullets, "a")],
        "doc_id bigint, text string, source string",
    )
    s = prepare_pretraining_shards(
        docs, str(tmp_path / "s"), gopher_filter=True, redact_pii=False
    )
    kept = {r["doc_id"] for r in spark.read.json(str(tmp_path / "s")).collect()}
    assert kept == {1}
    assert s.n_after_quality == 1


def test_pipeline_surprisal_gate_drops_novel_doc(spark, tmp_path):
    # 30 docs repeating the same bigrams train a confident LM; the one
    # all-novel doc scores far above their mean surprisal.
    common = ("alpha beta gamma delta " * 10).strip()
    novel = "zk1 zk2 zk3 zk4 zk5 zk6 zk7 zk8 zk9 zk10"
    rows = [(i, common + f" tail{i % 3}", "a") for i in range(30)]
    rows.append((99, novel, "a"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    from power_generation_etl_spark.operators.scoring import (
        bigram_lm_surprisal,
    )

    scored = {
        r["doc_id"]: r["mean_unats"]
        for r in bigram_lm_surprisal(docs, "doc_id", "text").collect()
    }
    cut = (max(v for k, v in scored.items() if k != 99) + scored[99]) // 2
    s = prepare_pretraining_shards(
        docs,
        str(tmp_path / "s"),
        max_mean_surprisal=int(cut),
        neardup_threshold=0.99,
        redact_pii=False,
    )
    kept = {r["doc_id"] for r in spark.read.json(str(tmp_path / "s")).collect()}
    assert 99 not in kept
    assert s.n_after_quality == 30


def test_pipeline_semantic_decontam(spark, tmp_path):
    good = "This document has plenty of ordinary words to survive quality. " * 3
    docs = spark.createDataFrame(
        [(1, good + "alpha", "a"), (2, good + "beta", "a"), (3, good + "gamma", "a")],
        "doc_id bigint, text string, source string",
    )
    corpus_emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.98, 0.1]), (3, [0.0, 1.0])],
        "doc_id bigint, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(900, [1.0, 0.0])], "doc_id bigint, embedding array<double>"
    )
    s = prepare_pretraining_shards(
        docs,
        str(tmp_path / "s"),
        neardup_threshold=0.99,
        redact_pii=False,
        corpus_embeddings=corpus_emb,
        benchmark_embeddings=bench_emb,
        semantic_tau=0.95,
    )
    kept = {r["doc_id"] for r in spark.read.json(str(tmp_path / "s")).collect()}
    # docs 1 and 2 embed too close to the benchmark vector; 3 is orthogonal
    assert kept == {3}
    assert s.n_after_decontam == 1
