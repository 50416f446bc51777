"""Distributed suffix array by prefix doubling (Manber & Myers 1990;
the doubling formulation of Larsson-Sadakane) — the classic
variable-length complement to the fixed-L ExactSubstr screen
(`corpus.py::exact_substring_spans`): a corpus-wide lexicographic
order of every within-document token suffix, built in O(log maxlen)
rounds of joins + distributed dense ranks.

Per round with span ``delta``: pair each position's current rank with
the rank ``delta`` positions ahead (end-of-suffix = rank 0, sorting
first), then dense-rank the (r, r2) pairs corpus-wide. After
``delta >= max_doc_tokens`` the rank order equals full token-wise
suffix order. Every global ranking runs through
`operators/rank.py::with_global_rank` over the DISTINCT key set —
two-pass range-partitioned row_number, never a single-partition
window; per-round lineage is cut with localCheckpoint (the
`graph.py` iterative-operator pattern).

Scale notes (100 TB): suffixes are per-document, so the pair join is
a (doc_id, pos) equi-join that never crosses documents, and the round
count is ceil(log2(max DOC length)) — independent of corpus size
(20 rounds for 1M-token documents). Each round shuffles
position-scale (doc, pos, rank) triples — the O(n log maxlen) total
that makes suffix-array construction heavier than the L-gram digest
screen, which is why ExactSubstr is the dedup workhorse and the
suffix array the variable-length analysis tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rank import with_global_rank


def suffix_array(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, sa_rank) for every within-document token suffix:
    sa_rank is the 1-based position in the corpus-wide lexicographic
    order of suffixes (token-wise comparison, end-of-suffix before any
    token; ties between byte-identical suffixes — duplicate documents —
    break by (doc_id, pos), making the order total and the output
    deterministic)."""
    spark = df.sparkSession
    ex = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("_t")), r"\s+")).alias("p0", "t"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "t")
        .localCheckpoint()
    )
    row = ex.agg(F.max("pos").alias("m")).collect()[0]
    maxlen = row["m"] or 0
    if maxlen == 0:  # empty corpus
        return spark.createDataFrame([], "doc_id bigint, pos int, sa_rank bigint")
    # Round 0: dense rank of each suffix's first INIT tokens, joined
    # with ' '. Because tokens contain no whitespace and ' ' orders
    # below every token character, string order on the joined form
    # equals token-wise order with end-of-suffix first (concat_ws
    # skips the null leads of tail windows, so short suffixes join
    # only their remaining tokens and sort as prefixes — first). One
    # window of leads replaces log2(INIT) doubling rounds.
    init = 8
    wl = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("t", j).over(wl) for j in range(1, init)]
    pref = ex.select(
        "doc_id", "pos", F.concat_ws(" ", F.col("t"), *leads).alias("p0")
    )
    keys0 = with_global_rank(
        pref.select("p0").distinct(), [F.col("p0")], rank_col="r"
    )
    ranks = (
        pref.join(keys0, "p0").select("doc_id", "pos", "r").localCheckpoint()
    )
    delta = init
    while delta < maxlen:
        ahead = ranks.select(
            "doc_id", (F.col("pos") - delta).alias("pos"), F.col("r").alias("_r2")
        )
        paired = (
            ranks.join(ahead, ["doc_id", "pos"], "left")
            .select(
                "doc_id",
                "pos",
                "r",
                F.coalesce("_r2", F.lit(0)).alias("r2"),  # end sorts first
            )
        )
        keys = with_global_rank(
            paired.select("r", "r2").distinct(),
            [F.col("r"), F.col("r2")],
            rank_col="nr",
        )
        ranks = (
            paired.join(keys, ["r", "r2"])
            .select("doc_id", "pos", F.col("nr").alias("r"))
            .localCheckpoint()
        )
        delta *= 2
    return with_global_rank(
        ranks, [F.col("r"), F.col("doc_id"), F.col("pos")], rank_col="sa_rank"
    ).select("doc_id", "pos", F.col("sa_rank").cast("bigint").alias("sa_rank"))


def longest_repeated_substrings(
    df: DataFrame, id_col: str, text_col: str, *, top: int = 10
) -> DataFrame:
    """Top-``top`` longest repeated token substrings in the corpus —
    the classic suffix-array application: in suffix order, every
    repeated substring is a prefix of two ADJACENT suffixes, so the
    maximum LCP over adjacent pairs finds the longest repeat without
    comparing all O(n²) suffix pairs.

    LCP of an adjacent pair is computed in one codegen-free pass over
    the pair's token arrays: zip_with null-safe equality, first-false
    position (O(suffix length) per pair, and only adjacent pairs are
    joined — O(n) pairs total). Pairing suffixes by consecutive
    sa_rank is an equi-join on rank, not a window. Output:
    (lcp, doc_a, pos_a, doc_b, pos_b, repeat_preview) ordered by
    (lcp desc, doc_a, pos_a), preview = first min(lcp, 8) tokens of
    the repeated substring.
    """
    sa = suffix_array(df, id_col, text_col)
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("_tk"),
    )
    suf = sa.join(toks, "doc_id").select(
        "sa_rank",
        "doc_id",
        "pos",
        F.slice(
            F.col("_tk"), F.col("pos"), F.size("_tk") - F.col("pos") + 1
        ).alias("_suf"),
    )
    left = suf.select(
        F.col("sa_rank"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        F.col("_suf").alias("_sa"),
    )
    right = suf.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("_suf").alias("_sb"),
    )
    pairs = left.join(right, "sa_rank")
    eqs = F.zip_with("_sa", "_sb", lambda x, y: x.eqNullSafe(y))
    first_false = F.array_position(eqs, F.lit(False))
    lcp = F.coalesce(
        F.nullif(first_false, F.lit(0)) - 1,
        F.least(F.size("_sa"), F.size("_sb")),
    ).cast("int")
    return (
        pairs.select(
            lcp.alias("lcp"),
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.array_join(
                F.slice(F.col("_sa"), 1, F.least(lcp, F.lit(8))), " "
            ).alias("repeat_preview"),
        )
        .where(F.col("lcp") >= 1)
        .orderBy(F.col("lcp").desc(), "doc_a", "pos_a")
        .limit(top)
    )
