"""Hand-computed tests for the Gopher repetition screen
(operators/text.py::repetition_stats) and the BPE pair-count stage
(plans/llm_queries.py::bpe_pair_stage core)."""

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import text as tx


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in tx.repetition_stats(df, "doc_id", "text").collect()
    }


class TestRepetitionStats:
    def test_fully_repetitive_doc_flagged(self, spark):
        # "a b" * 5: 10 tokens, 2 types, bigrams = 'a b'x5 + 'b a'x4,
        # 5-grams: 'a b a b a'x3, 'b a b a b'x3 -> all counts >= 2.
        out = _stats(spark, [(1, "a b a b a b a b a b")])
        s = out[1]
        assert s["n_tokens"] == 10
        assert s["ttr_ppm"] == 200_000  # 2 div 10
        assert s["top_bigram_ppm"] == 5 * 1_000_000 // 9
        assert s["dup_5gram_ppm"] == 1_000_000
        assert s["repetitive"] is True

    def test_all_distinct_doc_not_flagged(self, spark):
        text = " ".join(f"w{i}" for i in range(12))
        out = _stats(spark, [(2, text)])
        s = out[2]
        assert s["n_tokens"] == 12
        assert s["ttr_ppm"] == 1_000_000
        assert s["top_bigram_ppm"] == 1_000_000 // 11  # every bigram once
        assert s["dup_5gram_ppm"] == 0
        assert s["repetitive"] is False

    def test_doc_without_5grams_dropped(self, spark):
        # 4 tokens -> no 5-gram rows -> inner join drops the doc,
        # matching the SQL oracle's inner joins.
        out = _stats(spark, [(3, "a b c d"), (4, "a b c d e")])
        assert 3 not in out
        assert 4 in out

    def test_case_folded(self, spark):
        out = _stats(spark, [(5, "A a A a A a A a A a")])
        assert out[5]["ttr_ppm"] == 100_000  # one type after lower()


class TestBpePairStage:
    def test_pair_counts_weighted_by_word_freq(self, spark):
        from power_generation_etl_spark.plans.llm_queries import (
            bpe_pair_stage,
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            docs = spark.createDataFrame(
                [(1, "ab ab cd", "en", "s0", 8), (2, "abc x", "en", "s0", 5)],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            docs.write.parquet(os.path.join(d, "documents.parquet"))
            out = {
                (r["sym_a"], r["sym_b"]): r["pair_count"]
                for r in bpe_pair_stage(spark, d).collect()
            }
        # 'ab' f=2 -> (a,b)+2 ; 'cd' f=1 -> (c,d)+1 ;
        # 'abc' f=1 -> (a,b)+1, (b,c)+1 ; 'x' len 1 -> no pairs.
        assert out == {("a", "b"): 3, ("b", "c"): 1, ("c", "d"): 1}


class TestBpeTrainer:
    def _merges(self, spark, texts, rounds=3):
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        from power_generation_etl_spark.operators import bpe

        return [
            (r["round"], r["merge"], r["pair_count"])
            for r in bpe.train_merges(df, "text", rounds=rounds).collect()
        ]

    def test_learned_merges_hand_corpus(self, spark):
        # corpus: 'low' x3, 'lower' x1 -> round 1 pair (l,o) f=4;
        # round 2: (lo,w) f=4; round 3: (low,e) 1 vs ... 'low' fully
        # merged: remaining pairs (low,e)=1,(e,r)=1 -> tie broken by
        # gram string: 'e r' < 'low e'.
        m = self._merges(spark, ["low low low lower"])
        assert m[0] == (1, "l o", 4)
        assert m[1] == (2, "lo w", 4)
        assert m[2] == (3, "e r", 1)

    def test_alternating_chain_two_pass_merge(self, spark):
        # 'ababab...': after (a,b) is learned, every disjoint (a,b)
        # occurrence must merge in ONE round — the two-pass fixed
        # point. 'abababab' segments to a b a b a b a b; merging (a,b)
        # leaves ab ab ab ab, so round 2's top pair is (ab,ab) f=3.
        m = self._merges(spark, ["abababab"], rounds=2)
        assert m[0][1] == "a b"
        assert m[1] == (2, "ab ab", 3)

    def test_same_symbol_run_leftmost_nonoverlap(self, spark):
        # 'aaaaa' -> pairs (a,a) x4 -> merge leftmost non-overlapping:
        # aa aa a. Round 2 counts: (aa,aa)=1, (aa,a)=1 -> tie on gram
        # string: 'aa a' < 'aa aa'.
        m = self._merges(spark, ["aaaaa"], rounds=2)
        assert m[0] == (1, "a a", 4)
        assert m[1] == (2, "aa a", 1)

    def test_early_stop_when_no_pairs(self, spark):
        # single-char words only -> no adjacent pairs at all.
        m = self._merges(spark, ["a b c", "a"], rounds=3)
        assert m == []

    def test_encode_lengths_compress(self, spark):
        # After learning on 'abab abab ab': merges (a,b) then (ab,ab).
        # 'abab' -> 1 symbol, 'ab' -> 1 symbol.
        from power_generation_etl_spark.operators import bpe

        df = spark.createDataFrame([("abab abab ab",)], "text string")
        seg = bpe.trained_segmentation(df, "text", rounds=2)
        got = {r["w"]: r["seg"] for r in seg.collect()}
        assert got["abab"].split() == ["abab"]
        assert got["ab"].split() == ["ab"]


def _py_bpe(texts, rounds):
    """Reference classic BPE (symbol-level greedy leftmost merge) —
    the semantics operators/bpe.py claims to reproduce via the
    double-space string encoding."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] += 1
    segs = {w: list(w) for w in wf}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, f in wf.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((r, f"{a} {b}", cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


@pytest.mark.slow  # randomized differential battery; run with -m "slow or not slow"
class TestBpeDifferentialFuzz:
    def test_random_corpora_match_reference_bpe(self, spark):
        import random

        from power_generation_etl_spark.operators import bpe

        rng = random.Random(20260814)
        for case in range(6):
            alphabet = "ab" if case < 3 else "abc"
            texts = [
                " ".join(
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(1, 7))
                    )
                    for _ in range(rng.randint(1, 12))
                )
                for _ in range(rng.randint(1, 5))
            ]
            rounds = rng.randint(1, 4)
            want_merges, want_segs = _py_bpe(texts, rounds)
            df = spark.createDataFrame([(t,) for t in texts], "text string")
            got_merges = [
                (r["round"], r["merge"], r["pair_count"])
                for r in bpe.train_merges(df, "text", rounds=rounds)
                .orderBy("round")
                .collect()
            ]
            assert got_merges == want_merges, (case, texts, rounds)
            got_segs = {
                r["w"]: r["seg"].split()
                for r in bpe.trained_segmentation(
                    df, "text", rounds=rounds
                ).collect()
            }
            assert got_segs == want_segs, (case, texts, rounds)
