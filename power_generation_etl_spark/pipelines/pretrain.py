"""End-to-end pretraining-data preparation pipeline.

Composes the operator families into the pipeline a training-data team
actually runs: quality filter → exact dedup → MinHash near-dup dedup →
benchmark decontamination → PII redaction → language tagging → token
counting → per-shard sequence packing → JSONL shard files. Every stage
is the same oracle-checked operator the catalog exposes individually;
this module only wires them together.

Scale shape: one quality/projection scan, one digest groupBy (exact
dedup), the banded LSH candidate join (near-dup), one broadcast
semi-join against the benchmark shingle set (decontamination), a
codegen regexp rewrite (redaction), one explode+groupBy (language),
one window (packing), one partitioned write. Nothing collects document
bodies to the driver; the returned summary holds seven counters.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from power_generation_etl_spark.operators import bpe
from power_generation_etl_spark.operators import corpus as cp
from power_generation_etl_spark.operators import hygiene as hg
from power_generation_etl_spark.operators import minhash as mh
from power_generation_etl_spark.operators import scoring
from power_generation_etl_spark.operators import text as tx


@dataclass
class PrepSummary:
    n_input: int
    n_after_quality: int
    n_after_exact_dedup: int
    n_after_neardup: int
    n_after_decontam: int
    n_sequences: int
    total_tokens: int


def prepare_pretraining_shards(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    budget: int = 2048,
    neardup_threshold: float = 0.5,
    benchmark: DataFrame | None = None,
    decontam_n: int = 5,
    redact_pii: bool = True,
    bpe_vocab: DataFrame | None = None,
    repetition_filter: bool = False,
    c4_clean: bool = False,
    gopher_filter: bool = False,
    max_mean_surprisal: int | None = None,
    corpus_embeddings: DataFrame | None = None,
    benchmark_embeddings: DataFrame | None = None,
    semantic_tau: float = 0.9,
) -> PrepSummary:
    """Run the full prep pipeline and write training shards.

    Output layout: JSONL hive-partitioned by `shard_col`, one row per
    document with (doc_id, seq_id, predicted_lang, n_tok, text) — the
    hand-off format for a downstream tokenizer, which consumes whole
    sequences by reading each shard in (seq_id, doc_id) order.

    Dedup policy matches the catalog: exact dedup keeps the lowest
    doc_id per content digest; near-dup drops the higher doc_id of
    every verified pair (`neardup_dedup_docs` semantics).

    When ``benchmark`` is given, documents sharing any word
    ``decontam_n``-gram with it are dropped (eval-set leak removal);
    when ``redact_pii`` is set, emails/IPs/phone numbers are replaced
    with typed placeholders in the written shards.

    ``repetition_filter`` adds the Gopher within-document repetition
    screen (operators/text.py::repetition_stats thresholds) to the
    quality stage.

    ``c4_clean`` rewrites each document to its C4 line-cleaned form
    BEFORE any filtering (operators/hygiene.py::c4_cleaned_text) —
    documents whose every line is dropped become empty and fall to the
    quality gate. ``gopher_filter`` adds the Rae et al. A1.1 document
    rule bundle (operators/text.py::gopher_quality_flags) to the
    quality stage. ``max_mean_surprisal`` (integer micro-nats) adds the
    CCNet-style perplexity gate: the bigram LM trains on the
    quality-passed corpus itself and documents whose mean surprisal
    exceeds the bound are dropped (operators/scoring.py::
    bigram_lm_surprisal); all three compose with the existing stages
    in funnel order.

    When ``corpus_embeddings`` + ``benchmark_embeddings`` are given
    (both (doc_id, embedding)), the decontamination stage ALSO drops
    documents whose embedding reaches ``semantic_tau`` cosine to any
    benchmark embedding (operators/similarity.py::semantic_decontam) —
    the paraphrase-robust complement of the n-gram screen.

    When ``bpe_vocab`` is given (a `train-bpe` segmented vocab —
    operators/bpe.py::trained_segmentation output), `n_tok` is the
    document's BPE symbol count (broadcast vocab join, char-fallback
    for OOV words) instead of the whitespace token count, so the
    packing budget matches what the downstream tokenizer will actually
    emit.
    """
    n_input = docs.count()

    # 0. optional C4 line-level rewrite — the corpus the rest of the
    # funnel sees is the cleaned text (empty-cleaned docs die at the
    # quality gate, C4's own behavior for pages with no kept lines)
    if c4_clean:
        cleaned = hg.c4_cleaned_text(docs, id_col, text_col).select(
            F.col("doc_id").alias(id_col), F.col("cleaned")
        )
        docs = (
            docs.join(cleaned, id_col, "left")
            .withColumn(text_col, F.coalesce("cleaned", F.col(text_col)))
            .drop("cleaned")
        )

    # 1. quality filter — one projection scan; optionally also the
    # Gopher repetition screen and document rule bundle (both are
    # join-shaped, so they run as doc-keyed anti-/semi-joins rather
    # than Column predicates; docs too short to have 5-grams are never
    # repetition-flagged)
    m = tx.quality_metrics(F.col(text_col))
    q = docs.filter(tx.quality_pass(m))
    if repetition_filter:
        flagged = (
            tx.repetition_stats(q, id_col, text_col)
            .where(F.col("repetitive"))
            .select(F.col("doc_id").alias(id_col))
        )
        q = q.join(flagged, id_col, "left_anti")
    if gopher_filter:
        passing = (
            tx.gopher_quality_flags(q, id_col, text_col)
            .where(F.col("gopher_pass"))
            .select(F.col("doc_id").alias(id_col))
        )
        q = q.join(passing, id_col, "left_semi")
    if max_mean_surprisal is not None:
        # CCNet-style gate: LM trained on the surviving corpus itself;
        # docs with <2 tokens have no bigrams and pass untested.
        noisy = (
            scoring.bigram_lm_surprisal(q, id_col, text_col)
            .where(F.col("mean_unats") > max_mean_surprisal)
            .select(F.col("doc_id").alias(id_col))
        )
        q = q.join(noisy, id_col, "left_anti")
    n_quality = q.count()

    # 2. exact dedup — keep lowest id per digest (digest-only shuffle)
    wd = Window.partitionBy(tx.exact_dup_key(F.col(text_col))).orderBy(id_col)
    exact = (
        q.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()  # feeds the near-dup pair join twice
    )
    n_exact = exact.count()

    # 3. near-dup dedup — banded LSH candidates, exact-Jaccard verify
    pairs = mh.minhash_lsh_pairs(
        exact, id_col, text_col, threshold=neardup_threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = exact.join(drop, id_col, "left_anti")
    n_neardup = kept.count()

    # 3b. benchmark decontamination — broadcast semi-join on hashed
    # n-grams; the corpus side never shuffles its text
    if benchmark is not None:
        contaminated = hg.decontaminate(
            kept, benchmark, id_col, text_col, n=decontam_n
        ).select(F.col("doc_id").alias(id_col))
        kept = kept.join(contaminated, id_col, "left_anti")

    # 3b'. semantic decontamination — embedding-cosine screen against
    # the benchmark's embeddings (broadcast benchmark, one scan of the
    # surviving docs' embeddings)
    if corpus_embeddings is not None and benchmark_embeddings is not None:
        from power_generation_etl_spark.operators import similarity as sim

        flagged = sim.semantic_decontam(
            corpus_embeddings.join(
                kept.select(F.col(id_col).alias("doc_id")), "doc_id"
            ),
            "doc_id",
            "embedding",
            benchmark_embeddings,
            "doc_id",
            "embedding",
            threshold=semantic_tau,
        ).select(F.col("id").alias(id_col))
        kept = kept.join(flagged, id_col, "left_anti")
    n_decontam = (
        kept.count()
        if benchmark is not None
        or (corpus_embeddings is not None and benchmark_embeddings is not None)
        else n_neardup
    )

    # 3c. PII redaction — codegen regexp rewrite in the same projection
    if redact_pii:
        kept = kept.withColumn(text_col, hg.redact_pii(F.col(text_col)))

    # 4. language tag + token counts (explode once, codegen aggregates).
    # With a trained BPE vocab, n_tok = post-merge symbol count — the
    # real sequence-length currency of the downstream tokenizer.
    langs = tx.score_langs(kept, id_col, text_col)
    enriched = kept.join(langs, id_col)
    if bpe_vocab is not None:
        lens = bpe.encode_with_vocab(
            enriched, bpe_vocab, id_col, text_col
        ).select(id_col, F.col("n_symbols").alias("n_tok"))
        enriched = enriched.join(lens, id_col, "left").withColumn(
            "n_tok", F.coalesce(F.col("n_tok"), F.lit(0))
        )
    else:
        enriched = enriched.withColumn(
            "n_tok", tx.token_count(F.col(text_col))
        )

    # 5. per-shard sequence assignment (windowed inside the shard)
    packed = cp.assign_sequences(enriched, shard_col, id_col, "n_tok", budget)

    # 6. shard write — partitioned JSONL, no driver collection
    out = packed.select(
        shard_col, id_col, "seq_id", "predicted_lang", "n_tok", text_col
    )
    out.write.mode("overwrite").partitionBy(shard_col).json(out_dir)

    stats = packed.agg(
        F.countDistinct(shard_col, "seq_id").alias("n_seq"),
        F.sum("n_tok").cast("bigint").alias("tot"),
    ).head()
    return PrepSummary(
        n_input=n_input,
        n_after_quality=n_quality,
        n_after_exact_dedup=n_exact,
        n_after_neardup=n_neardup,
        n_after_decontam=n_decontam,
        n_sequences=int(stats["n_seq"]),
        total_tokens=int(stats["tot"] or 0),
    )
