"""Corpus-level statistics and training-batch assembly operators.

Training-data pipelines need more than per-document scoring: corpus
term weighting (TF-IDF), within-document repetition signals (the
Gopher repetition filters), token-budget sequence packing, and
stratified sampling. Everything here is pure DataFrame ops — explode +
codegen aggregates and windows, no Python UDFs — and each has an exact
DuckDB oracle twin in plans/llm_queries.py.

Scale notes (100 TB): TF-IDF shuffles (doc_id, term) then (term) —
both standard hash aggregations with map-side combine; repetition is
one per-doc window plus two doc-keyed aggregations; packing windows
inside a partition column (never a global ordering); stratified
sampling is two windows over the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_freq_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — lowercase whitespace terms, empties dropped.

    The explode output shuffles once on (doc_id, term) with map-side
    combine, so shuffle volume is bounded by distinct terms per doc."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 40, min_df: int = 1
) -> DataFrame:
    """Corpus top terms by summed TF-IDF (natural-log IDF, ln(N/df)).

    Two hash aggregations; the corpus size N is a 1-row broadcast, not
    a driver collect, so the whole thing is one job. TakeOrdered gives
    the top-n without a global sort."""
    tf = term_freq_table(df, id_col, text_col)
    st = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    if min_df > 1:
        st = st.filter(F.col("df_docs") >= min_df)
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    out = st.crossJoin(F.broadcast(n)).select(
        "term",
        "df_docs",
        "total_tf",
        F.round(
            F.col("total_tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df_docs")),
            4,
        ).alias("tfidf"),
    )
    return out.orderBy(F.col("tfidf").desc(), "term").limit(top_n)


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition over word bigrams:
    duplicate-bigram fraction and most-common-bigram fraction. A
    document whose content loops (boilerplate, listings, scraped nav
    bars) scores high and gets filtered before training.

    Bigrams are built with posexplode + window lead (all codegen, one
    window shuffle on doc_id); documents with fewer than two tokens
    produce no bigrams and are omitted."""
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "t"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("t", 1).over(w)
    bg = (
        ex.select("doc_id", F.concat_ws(" ", F.col("t"), nxt).alias("bg"),
                  nxt.alias("_l"))
        .filter(F.col("_l").isNotNull())
        .drop("_l")
    )
    per = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    rep = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_count"),
    )
    return rep.select(
        "doc_id",
        "n_bigrams",
        "n_distinct",
        "top_count",
        F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_bigrams"), 4).alias(
            "dup_bigram_frac"
        ),
        F.round(F.col("top_count") / F.col("n_bigrams"), 4).alias(
            "top_bigram_frac"
        ),
    )


def assign_sequences(
    df: DataFrame,
    part_col: str,
    id_col: str,
    tok_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Per-document training-sequence assignment: adds `seq_id` by
    integer-dividing the exclusive prefix token sum within `part_col`
    (see `pack_sequences` for semantics). Returns the input columns
    plus `seq_id` — the row-level form shard writers consume."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = df.withColumn("_cum", F.sum(tok_col).over(w).cast("bigint"))
    return c.withColumn(
        "seq_id", F.expr(f"(_cum - {tok_col}) div {int(budget)}")
    ).drop("_cum")


def pack_sequences(
    df: DataFrame,
    part_col: str,
    id_col: str,
    tok_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Token-budget sequence packing: assign documents (ordered by id
    within a partition column) to training sequences of ~`budget`
    tokens, by integer-dividing the exclusive prefix token sum. A
    document straddling a boundary starts the next-numbered sequence's
    overflow — deterministic, closed-form, and identical in any engine,
    unlike greedy first-fit which needs a sequential scan.

    The running sum windows WITHIN `part_col` (source shard), never
    globally — at 100 TB a global ordering would serialize into one
    task; per-shard packing is also what distributed tokenizers do."""
    c = assign_sequences(df, part_col, id_col, tok_col, budget)
    return (
        c.groupBy(F.col(part_col), F.col("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).cast("bigint").alias("seq_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .orderBy(part_col, "seq_id")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    hash_col,
    fraction: float = 0.2,
) -> DataFrame:
    """Deterministic stratified sample: within each stratum take the
    ceil(fraction * stratum_size) rows with the lowest portable hash.
    Unlike a global hash-mod filter, every stratum — however small —
    contributes its exact proportional share, which is what balanced
    training mixtures need. Two windows over the stratum key, no joins.

    `hash_col` must be a deterministic, engine-portable Column (e.g.
    minhash.portable_hash32 of the id) so two pipelines agree
    row-for-row."""
    wr = Window.partitionBy(stratum_col).orderBy(hash_col, F.col(id_col))
    wc = Window.partitionBy(stratum_col)
    r = df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_n"),
    )
    keep = F.ceil(F.col("_n") * F.lit(float(fraction))).cast("bigint")
    return r.filter(F.col("_rn") <= keep).select(id_col, stratum_col)


def chunk_hashes(
    df: DataFrame, id_col: str, text_col: str, *, chunk: int = 20
) -> DataFrame:
    """(doc_id, chunk_id, chunk_hash) — the document split into
    fixed-size word windows of `chunk` tokens (last window ragged),
    each hashed with portable md5.

    This is the Spark-shaped stand-in for suffix-array substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): exact long-substring matches are detected at chunk
    granularity, which distributes as a plain hash shuffle instead of a
    global suffix sort. The chunk slicing runs as one higher-order
    `transform` per document over n_chunks elements — O(doc_len) work
    per doc, and only the 32-char hashes travel to the shuffle, never
    chunk text.
    """
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    # NULL text yields zero chunks (matching the SQL twin, where
    # generate_series(0, NULL) unnests to no rows) — without the filter
    # size(NULL) = -1 would fabricate one NULL-hash chunk per null doc
    # and cross-count every null doc as a duplicate of the first.
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks"),
    )
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(_toks) - 1) div {chunk}),"
                f" i -> md5(array_join(slice(_toks, i * {chunk} + 1, {chunk}), ' ')))"
            )
        ).alias("chunk_id", "chunk_hash"),
    )


def chunk_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, *, chunk: int = 20
) -> DataFrame:
    """Per-document survival stats under corpus-wide first-wins chunk
    dedup: (doc_id, n_chunks, n_kept, n_dup). A chunk survives iff no
    earlier (doc_id, chunk_id) produced the same hash — the keep/drop
    decision a substring-dedup pass would apply before re-assembly.

    One shuffle on chunk_hash (window ranks duplicates), one hash agg
    back to doc_id. Deterministic: ties break on (doc_id, chunk_id).
    """
    c = chunk_hashes(df, id_col, text_col, chunk=chunk)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_id")
    ranked = c.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .withColumn("n_dup", (F.col("n_chunks") - F.col("n_kept")).cast("bigint"))
        .orderBy("doc_id")
    )


def vocab_oov(
    df: DataFrame, id_col: str, text_col: str, *, vocab_size: int
) -> DataFrame:
    """Tokenizer-coverage profile: build the top-``vocab_size`` corpus
    vocabulary by token frequency (deterministic (freq desc, token)
    tiebreak) and report each document's out-of-vocabulary token count
    and rate (integer ppm — no float division). The real-pipeline use
    is sizing a tokenizer vocab / spotting shards that would explode
    into byte-fallback tokens.

    Shape: one (token) aggregation for the vocab, vocab broadcast back
    onto the token stream, one (doc) aggregation. The corpus text never
    shuffles — tokens carry (doc_id, token) pairs, the standard TF-IDF
    shuffle profile."""
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        freq.orderBy(F.desc("c"), "tok")
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("_in_vocab").isNull()).alias("n_oov"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.expr("CAST(n_oov * 1000000 div n_tokens AS BIGINT)").alias("oov_ppm"),
    )


def exact_substring_spans(
    df: DataFrame, id_col: str, text_col: str, *, length: int = 50
) -> DataFrame:
    """ExactSubstr duplicated-span report (Lee et al., 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): every ``length``-token window whose token sequence occurs
    at least twice anywhere in the corpus (any document, any offset —
    including elsewhere in the same document) marks its
    ``[pos, pos+length)`` span as duplicated; overlapping/adjacent
    marked spans merge into maximal islands. Per-document output:
    (doc_id, n_tokens, n_dup_grams, n_spans, dup_tokens, dup_ppm) —
    the report a substring-dedup pass consumes to cut the spans out.

    The published implementation builds a corpus suffix array; since
    any repeated substring of length >= L contains a repeated L-token
    window, the union of repeated L-gram spans equals the union of
    repeated >=L substrings — so the Spark-idiomatic plan needs no
    suffix array and no global sort:

      1. per-doc posexplode + (length-1) window ``lead``s build each
         position's L-gram, hashed to a 128-bit md5 immediately (all
         whole-stage codegen; the wide concat never materializes),
      2. duplicated grams come from a digest-only groupBy (map-side
         combine; shuffle rows are 16-byte digests + a count),
      3. a left-semi join marks duplicated positions (token-scale
         shuffle of (digest, doc, pos) triples — the irreducible cost
         of corpus-wide exact substring matching),
      4. a per-doc interval merge (running-max window, island sums —
         same single window pass as sessionization) yields the merged
         span coverage.

    Exactness is modulo md5(128-bit) collisions (~n²/2¹²⁹ — negligible
    at any corpus size). dup_ppm stays in int64 for docs up to ~9e12
    tokens (dup_tokens * 1e6).
    """
    from .minhash import _par

    ex = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .repartition(_par(df), "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("_t")), r"\s+")).alias("p0", "t"),
        )
    )
    ntok = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.partitionBy("doc_id").orderBy("p0")
    leads = [F.lead("t", j).over(w) for j in range(1, length)]
    grams = (
        ex.select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),  # 1-based, oracle-aligned
            F.concat_ws(" ", F.col("t"), *leads).alias("_g"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())  # full windows only
        .select("doc_id", "pos", F.md5(F.col("_g")).alias("g"))
    )
    dup = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_c")).filter(
        F.col("_c") >= 2
    )
    hits = grams.join(dup.select("g"), "g", "left_semi")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + length).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "new_iv", F.when(prev_end >= F.col("pos"), F.lit(0)).otherwise(F.lit(1))
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_iv").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("n_pos"),
        (F.max("pos") + length - F.min("pos")).alias("covered"),
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.sum("n_pos").cast("bigint").alias("n_dup_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("covered").cast("bigint").alias("dup_tokens"),
    )
    return (
        ntok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        )
        .withColumn(
            "dup_ppm", F.expr("CAST(dup_tokens * 1000000 div n_tokens AS BIGINT)")
        )
        .orderBy("doc_id")
    )


def chunk_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/embedding-prep
    primitive: chunk k covers tokens [k·stride + 1, k·stride + size]
    (1-based, stride = size - overlap), the final chunk truncating at
    the document end. Output: (doc_id, chunk_id, start_pos, n_tokens,
    chunk_md5) with chunk_md5 hashing the space-joined window — the
    verifiable span identity an embedding pipeline stores alongside the
    vector.

    One projection builds the token array, one posexplode over the
    chunk-index sequence, everything codegen (F.slice is an ordinary
    expression, not a lambda HOF). Chunks per doc = ceil((n - overlap)
    / stride) — document-local, no shuffle at all until a consumer
    aggregates."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.col(text_col)), r"\s+").alias("_tk"),
        )
        .withColumn("_n", F.size("_tk"))
        .where(F.col("_n") >= 1)
    )
    ks = base.select(
        "doc_id",
        "_tk",
        "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.expr(f"(_n - 1) div {stride}"))
        ).alias("_i", "k"),
    )
    start = F.col("k") * stride + 1
    return ks.select(
        "doc_id",
        F.col("k").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_pos"),
        F.least(F.lit(size), F.col("_n") - F.col("k") * stride)
        .cast("int")
        .alias("n_tokens"),
        F.md5(F.array_join(F.slice(F.col("_tk"), start, size), " ")).alias(
            "chunk_md5"
        ),
    ).orderBy("doc_id", "chunk_id")
