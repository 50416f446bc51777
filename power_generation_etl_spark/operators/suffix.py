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
