"""Persisted inverted text index: lookup correctness vs direct scan,
partition pruning in the compiled plan, AND/OR search semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import textindex as ti


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("tix") / "idx"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_terms = ti.build_inverted_index(
        docs, "doc_id", "text", str(out), n_buckets=16
    )
    assert n_terms > 0
    return str(out)


def _direct_postings(spark, sf_dir, term):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") == term)
    )
    return {
        r["doc_id"]: r["tf"]
        for r in toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    }


class TestInvertedIndex:
    def test_lookup_matches_direct_scan(self, spark, sf_dir, index_dir):
        want = _direct_postings(spark, sf_dir, "table")
        got = {
            r["doc_id"]: r["tf"]
            for r in ti.lookup_term(spark, index_dir, "table", n_buckets=16).collect()
        }
        assert got == want and len(got) > 0

    def test_lookup_plan_prunes_partitions(self, spark, index_dir):
        plan = (
            ti.lookup_term(spark, index_dir, "table", n_buckets=16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [isnotnull(bucket" in plan.replace(
            "#", ""
        ) or "PartitionFilters" in plan
        # the bucket equality must appear inside the partition filters,
        # not as a post-scan filter
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "bucket" in pf and "=" in pf

    def test_missing_term_empty(self, spark, index_dir):
        assert (
            ti.lookup_term(spark, index_dir, "zzzmissing", n_buckets=16).count()
            == 0
        )

    def test_and_or_search(self, spark, sf_dir, index_dir):
        a = set(_direct_postings(spark, sf_dir, "table"))
        b = set(_direct_postings(spark, sf_dir, "merge"))
        got_and = {
            r["doc_id"]
            for r in ti.search_terms(
                spark, index_dir, ["table", "merge"], mode="and", n_buckets=16
            ).collect()
        }
        got_or = {
            r["doc_id"]
            for r in ti.search_terms(
                spark, index_dir, ["table", "merge"], mode="or", n_buckets=16
            ).collect()
        }
        assert got_and == (a & b)
        assert got_or == (a | b)

    def test_search_rejects_bad_input(self, spark, index_dir):
        with pytest.raises(ValueError):
            ti.search_terms(spark, index_dir, ["x"], mode="xor")
        with pytest.raises(ValueError):
            ti.search_terms(spark, index_dir, ["  "])


def test_cli_text_index_and_search(spark, sf_dir, tmp_path, capsys):
    from power_generation_etl_spark import cli

    out = str(tmp_path / "cli_idx")
    rc = cli.main(
        ["--warehouse", str(tmp_path / "wh"), "text-index",
         f"{sf_dir}/documents.parquet", "--out", out, "--buckets", "8"]
    )
    assert rc == 0
    assert "indexed" in capsys.readouterr().out
    rc = cli.main(
        ["--warehouse", str(tmp_path / "wh"), "text-search", out,
         "table", "merge", "--mode", "or", "--buckets", "8", "--limit", "5"]
    )
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "match(es)" in out_text


class TestPhraseSearch:
    def test_counts_adjacency_with_multiplicity(self, spark):
        from power_generation_etl_spark.operators import textindex as ti

        rows = [
            (1, "red fox red fox red"),   # "red fox" x2, "fox red" x2
            (2, "red fox jumps"),          # "red fox" x1
            (3, "fox red"),                # only the rival bigram
            (4, "red and fox"),            # terms present, NOT adjacent
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [tuple(r) for r in ti.phrase_search(df, "doc_id", "text").collect()]
        # "fox red" and "red fox" tie at 3 -> lexicographically smaller
        # "fox red" wins; doc 4's non-adjacent terms never count
        assert got == [(1, 2), (3, 1)]

    def test_empty_and_single_token_docs(self, spark):
        from power_generation_etl_spark.operators import textindex as ti

        df = spark.createDataFrame(
            [(1, "solo"), (2, None)], "doc_id long, text string"
        )
        assert ti.phrase_search(df, "doc_id", "text").collect() == []


class TestPmiCollocations:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_lift_hand_computed(self, spark):
        from power_generation_etl_spark.operators.textindex import (
            pmi_collocations,
        )

        # "a b" ×5 in one doc, "c d" ×5 across docs, plus "b a" fillers
        # between repetitions: bigrams of "a b a b ..." are
        # [a b, b a, a b, ...] — 5×"a b", 4×"b a".
        df = self._df(
            spark,
            [(1, "a b a b a b a b a b"), (2, "c d"), (3, "c d"),
             (4, "c d"), (5, "c d"), (6, "c d")],
        )
        out = {
            r["bigram"]: (r["n_pair"], r["n_left"], r["n_right"], r["lift_ppm"])
            for r in pmi_collocations(df, "doc_id", "text", min_count=4).collect()
        }
        # N = 9 + 5 = 14 total bigrams.
        # "c d": c=5, left-marginal c_c•=5, right c_•d=5 → lift = 5*14/25
        assert out["c d"] == (5, 5, 5, 5 * 14 * 1_000_000 // 25)
        # "a b": c=5, c_a•=5, c_•b=5 → same score; "b a" (c=4) filtered
        # by min_count=4? no — kept: check value
        assert out["a b"] == (5, 5, 5, 5 * 14 * 1_000_000 // 25)
        assert out["b a"] == (4, 4, 4, 4 * 14 * 1_000_000 // 16)

    def test_min_count_filters(self, spark):
        from power_generation_etl_spark.operators.textindex import (
            pmi_collocations,
        )

        df = self._df(spark, [(1, "x y"), (2, "p q p q")])
        out = pmi_collocations(df, "doc_id", "text", min_count=2).collect()
        assert {r["bigram"] for r in out} == {"p q"}

    def test_tie_break_and_k(self, spark):
        from power_generation_etl_spark.operators.textindex import (
            pmi_collocations,
        )

        # two bigrams with identical counts/marginals → identical lift;
        # k=1 must keep the lexicographically smaller.
        df = self._df(spark, [(1, "a b"), (2, "a b"), (3, "c d"), (4, "c d")])
        out = pmi_collocations(df, "doc_id", "text", min_count=2, k=1).collect()
        assert len(out) == 1 and out[0]["bigram"] == "a b"

    def test_empty_and_null_text(self, spark):
        from power_generation_etl_spark.operators.textindex import (
            pmi_collocations,
        )

        df = self._df(spark, [(1, None), (2, "one")])
        assert pmi_collocations(df, "doc_id", "text").collect() == []
