"""Corpus-hygiene and data-profiling catalog queries — benchmark
decontamination, PII scanning, quantile-threshold filtering, fixed
histograms, per-group top-k, exact-arithmetic anomaly flags, and int8
embedding quantization. All oracle-checked against DuckDB.

Exactness notes mirror the operator modules: row-selecting predicates
use integer arithmetic or identical closed-form quantiles; reported
float statistics are rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import hygiene as hg
from power_generation_etl_spark.operators import profile as pr
from power_generation_etl_spark.operators import similarity as sim
from power_generation_etl_spark.operators import text as tx
from power_generation_etl_spark.plans.queries import T, _register

# ---------------------------------------------------------------------------
# Benchmark decontamination: drop training docs that leak the eval set.
# Benchmark stand-in = the 'src0' shard; corpus = everything else.
# Word 5-grams, portable-hashed, benchmark side broadcast.
# ---------------------------------------------------------------------------


@_register(
    "decontam_ngram_hits",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, source,
             CAST(('0x' || substr(md5(array_to_string(t[i.i:i.i+4], ' ')), 1, 8))
                  AS BIGINT) AS h
      FROM toks, unnest(range(1, len(t) - 3)) AS i(i)
    ),
    c AS (SELECT doc_id, h FROM sh WHERE source <> 'src0'),
    b AS (SELECT DISTINCT doc_id AS bench_id, h FROM sh WHERE source = 'src0')
    SELECT c.doc_id,
           count(DISTINCT c.h) AS n_hit_ngrams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM c JOIN b ON c.h = b.h
    GROUP BY 1
    ORDER BY doc_id
    """,
)
def decontam_ngram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing any word 5-gram with the benchmark shard
    (source='src0'). Benchmark shingle hashes broadcast; the corpus
    side never shuffles its text — the GPT-3-style decontamination
    sweep as one broadcast semi-join + one doc-keyed aggregation."""
    d = T(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    return hg.decontaminate(corpus, bench, "doc_id", "text", n=5).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# PII scan: one codegen regexp pass per pattern; zero shuffles.
# ---------------------------------------------------------------------------

_PII_SQL = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone": "\\+?\\d[\\d -]{7,}\\d",
}


@_register(
    "pii_scan_docs",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_SQL["email"]}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_SQL["ipv4"]}')) AS BIGINT)
             AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{_PII_SQL["phone"]}')) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(text, '{_PII_SQL["email"]}'))
              + len(regexp_extract_all(text, '{_PII_SQL["ipv4"]}'))
              + len(regexp_extract_all(text, '{_PII_SQL["phone"]}')) > 0
             AS BOOLEAN) AS has_pii
    FROM documents
    ORDER BY doc_id
    """,
)
def pii_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII occurrence counts (email / IPv4 / phone) with
    RE2-and-Java-compatible patterns so both engines compile the same
    regex. The synthetic corpus is PII-free (all-zero counts verify the
    negative path); redaction behavior is pytest-checked on a seeded
    fixture."""
    d = T(spark, sf_dir, "documents")
    return hg.pii_scan(d, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Exact-quantile threshold filter: keep docs above the corpus P80 of
# whitespace token count. Threshold is a broadcast 1-row aggregate.
# ---------------------------------------------------------------------------


@_register(
    "doc_token_threshold_filter",
    """
    WITH tok AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens
      FROM documents
    ),
    thr AS (SELECT quantile_cont(ws_tokens, 0.8) AS t FROM tok)
    SELECT doc_id, ws_tokens, round(t, 4) AS threshold
    FROM tok, thr
    WHERE ws_tokens > t
    ORDER BY doc_id
    """,
)
def doc_token_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs strictly above the exact continuous 80th percentile of
    token count. Spark `percentile` and DuckDB `quantile_cont` share
    the same interpolation closed form, so the double threshold —
    and therefore row membership — is identical across engines."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tx.token_count(F.col("text")).alias("ws_tokens")
    )
    return pr.quantile_threshold_filter(toks, "ws_tokens", 0.8).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Fixed-width per-language length histogram — pure integer bucketing.
# ---------------------------------------------------------------------------


@_register(
    "doc_length_histogram",
    """
    SELECT lang,
           least(n_chars // 50, 19) AS bucket,
           CAST(least(n_chars // 50, 19) * 50 AS BIGINT) AS bucket_lo,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY lang, bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length histogram (50-char buckets, last
    bucket open-ended). One map-side-combined hash aggregation; the
    shuffle carries at most languages × 20 rows regardless of corpus
    size."""
    d = T(spark, sf_dir, "documents")
    h = pr.fixed_width_histogram(
        d, "n_chars", width=50, n_buckets=20, group_cols=["lang"]
    )
    return h.select(
        "lang",
        "bucket",
        "bucket_lo",
        F.col("n_rows").alias("n_docs"),
        F.col("min_value").alias("min_chars"),
        F.col("max_value").alias("max_chars"),
    ).orderBy("lang", "bucket")


# ---------------------------------------------------------------------------
# Per-user anomaly flags over events — exact integer arithmetic
# (x·n > 3·Σx over cent-scaled values), so membership can't float-drift.
# ---------------------------------------------------------------------------


@_register(
    "user_value_anomalies",
    """
    WITH x AS (
      SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS xv FROM events
    ),
    w AS (
      SELECT user_id, xv,
             count(*) OVER (PARTITION BY user_id) AS n,
             sum(xv) OVER (PARTITION BY user_id) AS s
      FROM x
    )
    SELECT user_id,
           count(*) AS n_rows,
           CAST(count(*) FILTER (WHERE xv * n > 3 * s) AS BIGINT) AS n_anomalies,
           CAST((sum(xv) * 100) // count(*) AS BIGINT) / 10000.0 AS mean_value
    FROM w
    GROUP BY 1
    ORDER BY user_id
    """,
)
def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count of events exceeding 3× the user's mean value.
    The flag is exact integer arithmetic over cent-scaled values —
    one window shuffle + one hash aggregation, no re-join."""
    e = T(spark, sf_dir, "events").select("user_id", "value")
    return pr.mean_factor_anomalies(
        e, "user_id", "value", factor=3, scale=100
    ).select(
        "user_id",
        "n_rows",
        "n_anomalies",
        "mean_value",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Per-group top-k (longest docs per source) — WindowGroupLimit shape.
# ---------------------------------------------------------------------------


@_register(
    "topk_docs_per_source",
    """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source, doc_id, n_chars, rn
    FROM r WHERE rn <= 3
    ORDER BY source, rn
    """,
)
def topk_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per source shard. Spark rewrites the
    rank-filter into WindowGroupLimit, keeping k rows per group
    per partition before the window sort — per-group top-k without a
    global sort."""
    d = T(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return (
        pr.topk_per_group(d, "source", "n_chars", "doc_id", 3)
        .select("source", "doc_id", "n_chars", "rn")
        .orderBy("source", "rn")
    )


# ---------------------------------------------------------------------------
# Symmetric int8 embedding quantization quality report.
# ---------------------------------------------------------------------------


@_register(
    "embedding_int8_quant",
    """
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (
      SELECT max(list_aggregate(list_transform(e, x -> abs(x)), 'max')) AS am
      FROM v
    ),
    q AS (
      SELECT vec_id, label, e, am,
             list_transform(e, x ->
               greatest(-127.0, least(127.0, round(x * 127.0 / am, 0)))) AS qv
      FROM v, s
    ),
    d AS (
      SELECT vec_id, label, e,
             list_transform(qv, x -> x * am / 127.0) AS dq
      FROM q
    )
    SELECT vec_id, label,
           round(list_aggregate(
             list_transform(range(1, len(e) + 1), i -> abs(e[i] - dq[i])),
             'max'), 6) AS max_abs_err,
           round(
             list_aggregate(
               list_transform(range(1, len(e) + 1), i -> e[i] * dq[i]), 'sum')
             / (sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
                * sqrt(list_aggregate(list_transform(dq, x -> x * x), 'sum'))),
             6) AS cos_orig_quant
    FROM d
    ORDER BY vec_id
    """,
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization report: worst-element
    reconstruction error and original-vs-dequantized cosine per vector
    (the recall proxy an ANN index cares about). The global scale is a
    broadcast 1-row aggregate; every per-element op is a deterministic
    scalar double expression, so the oracle matches bit-for-bit before
    rounding."""
    e = T(spark, sf_dir, "embeddings")
    return sim.int8_quantize_report(e, "vec_id", "embedding", "label").select(
        "vec_id", "label", "max_abs_err", "cos_orig_quant"
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# ANALYZE-style per-column table profile.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def _profile_cte(c: str) -> str:
    return (
        f"SELECT '{c}' AS \"column\", n AS n_rows,"
        f" CAST(n - nn_{c} AS BIGINT) AS n_nulls,"
        f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
        f" mn_{c} AS min_value, mx_{c} AS max_value FROM a"
    )


@_register(
    "documents_profile",
    f"""
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {', '.join(
                 f'count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c},'
                 f' CAST(min({c}) AS VARCHAR) AS mn_{c},'
                 f' CAST(max({c}) AS VARCHAR) AS mx_{c}'
                 for c in _PROFILE_COLS
             )}
      FROM documents
    )
    SELECT * FROM ({' UNION ALL '.join(_profile_cte(c) for c in _PROFILE_COLS)})
    ORDER BY "column"
    """,
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style profile of the documents table: null counts,
    distinct counts, min/max per column — one multi-distinct
    aggregation pass, 1-row result exploded to long form. Strings/
    integers only (float min/max formatting is not engine-portable)."""
    d = T(spark, sf_dir, "documents")
    return pr.table_profile(d, _PROFILE_COLS).orderBy("column")


# ---------------------------------------------------------------------------
# Encoding hygiene rollup: UTF-8 damage tells (control bytes,
# replacement chars, latin1→utf8 mojibake digraphs) aggregated per
# source shard. One codegen regexp pass + one hash aggregation — no
# shuffle of text. The synthetic corpus is clean (all-zero damage
# verifies the negative path, like `pii_scan_docs`); the positive path
# is pytest-checked on seeded mojibake fixtures.
# ---------------------------------------------------------------------------


@_register(
    "encoding_hygiene_docs",
    f"""
    WITH per_doc AS (
        SELECT source,
               CAST(length(text) - length(regexp_replace(text,
                    '{hg.CONTROL_RE}', '', 'g')) AS BIGINT) AS n_control,
               CAST(length(text) - length(regexp_replace(text,
                    '{hg.REPLACEMENT_RE}', '', 'g')) AS BIGINT) AS n_replacement,
               CAST((length(text) - length(regexp_replace(text,
                    '{hg.MOJIBAKE_RE}', '', 'g'))) // 2 AS BIGINT) AS n_mojibake,
               CASE WHEN regexp_matches(text, '[^\\x00-\\x7f]') THEN 1 ELSE 0 END
                   AS has_nonascii
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_control) AS BIGINT) AS total_control,
           CAST(sum(n_replacement) AS BIGINT) AS total_replacement,
           CAST(sum(n_mojibake) AS BIGINT) AS total_mojibake,
           CAST(sum(has_nonascii) AS BIGINT) AS n_nonascii_docs,
           CAST(count(*) FILTER (n_control + n_replacement + n_mojibake > 0)
                AS BIGINT) AS n_damaged_docs
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def encoding_hygiene_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    ev = hg.encoding_quality(F.col("text"))
    per_doc = d.select("source", *[c.alias(n) for n, c in ev.items()])
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_control").cast("bigint").alias("total_control"),
            F.sum("n_replacement").cast("bigint").alias("total_replacement"),
            F.sum("n_mojibake").cast("bigint").alias("total_mojibake"),
            F.sum("has_nonascii").cast("bigint").alias("n_nonascii_docs"),
            F.count_if(
                F.col("n_control") + F.col("n_replacement") + F.col("n_mojibake")
                > 0
            ).alias("n_damaged_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: how identifying is a quasi-identifier tuple?
# Groups rows by (nation, segment, balance-bucket) and counts the
# equivalence classes below each k threshold — the release-gate check
# run before publishing "anonymized" data. One hash aggregation on the
# quasi-identifier + one tiny summary agg; thresholds are integer
# counts, no notion of noise (this audits, it does not anonymize).
# ---------------------------------------------------------------------------


@_register(
    "k_anonymity_audit",
    """
    WITH q AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 500.0) AS BIGINT) AS bal_bucket
        FROM customer
    ),
    g AS (
        SELECT c_nationkey, c_mktsegment, bal_bucket,
               CAST(count(*) AS BIGINT) AS sz
        FROM q GROUP BY c_nationkey, c_mktsegment, bal_bucket
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(min(sz) AS BIGINT) AS min_group,
           CAST(max(sz) AS BIGINT) AS max_group,
           CAST(count(*) FILTER (sz < 2) AS BIGINT) AS groups_lt_2,
           CAST(coalesce(sum(sz) FILTER (sz < 2), 0) AS BIGINT) AS rows_lt_2,
           CAST(count(*) FILTER (sz < 5) AS BIGINT) AS groups_lt_5,
           CAST(coalesce(sum(sz) FILTER (sz < 5), 0) AS BIGINT) AS rows_lt_5,
           CAST(count(*) FILTER (sz < 10) AS BIGINT) AS groups_lt_10,
           CAST(coalesce(sum(sz) FILTER (sz < 10), 0) AS BIGINT) AS rows_lt_10
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = T(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal / 500.0) AS BIGINT)").alias("bal_bucket"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.min("sz").cast("bigint").alias("min_group"),
        F.max("sz").cast("bigint").alias("max_group"),
    ]
    for k in (2, 5, 10):
        aggs.append(F.count_if(F.col("sz") < k).alias(f"groups_lt_{k}"))
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("sz") < k, F.col("sz"))), F.lit(0))
            .cast("bigint")
            .alias(f"rows_lt_{k}")
        )
    return g.agg(*aggs)


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher repetition filters, count-based):
# all ratios exact integer ppm; every shuffle keyed by doc_id.
# ---------------------------------------------------------------------------


@_register(
    "gopher_repetition_flags",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    tstat AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT w.w) AS BIGINT) AS n_types
      FROM toks, unnest(t) AS w(w)
      GROUP BY doc_id, len(t)
    ),
    bic AS (
      SELECT doc_id, array_to_string(t[i.i:i.i+1], ' ') AS gram,
             CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(range(1, len(t))) AS i(i)
      GROUP BY 1, 2
    ),
    bi AS (
      SELECT doc_id, max(c) AS top2, sum(c) AS tot2 FROM bic GROUP BY 1
    ),
    g5c AS (
      SELECT doc_id, array_to_string(t[i.i:i.i+4], ' ') AS gram,
             CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(range(1, len(t) - 3)) AS i(i)
      GROUP BY 1, 2
    ),
    g5 AS (
      SELECT doc_id,
             sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup5,
             sum(c) AS tot5
      FROM g5c GROUP BY 1
    )
    SELECT tstat.doc_id, n_tokens,
           CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
           CAST(top2 * 1000000 // tot2 AS BIGINT) AS top_bigram_ppm,
           CAST(dup5 * 1000000 // tot5 AS BIGINT) AS dup_5gram_ppm,
           (top2 * 1000000 // tot2 > 200000
            OR dup5 * 1000000 // tot5 > 150000) AS repetitive
    FROM tstat JOIN bi USING (doc_id) JOIN g5 USING (doc_id)
    ORDER BY doc_id
    """,
)
def gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screen per document: type-token ratio,
    top-bigram concentration, duplicate-5-gram share (exact integer
    ppm) and the published-threshold `repetitive` flag. See
    operators/text.py::repetition_stats for the 100 TB plan notes."""
    d = T(spark, sf_dir, "documents")
    return tx.repetition_stats(d, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Gopher document-quality rule bundle (Rae et al., 2021, appendix
# A1.1): the filter set MassiveText-style pipelines apply before
# training. Every ratio threshold is a cross-multiplied exact integer
# comparison on both engines (operators/text.py::gopher_quality_flags).
# ---------------------------------------------------------------------------

_GOPHER_STOP_SQL = " + ".join(
    "CAST(list_contains(string_split_regex(lower(text), '\\s+'), "
    f"'{w}') AS INTEGER)"
    for w in tx.GOPHER_REQUIRED_WORDS
)


@_register(
    "gopher_quality_flags",
    f"""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN replace(base, 'hash', '# #')
                    ELSE base END AS text
        FROM (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN regexp_replace(text, ' (line|row) ',
                                            ' ...' || chr(10) || '- ', 'g')
                             || ' of that have with'
                        ELSE regexp_replace(text, ' (line|row) ',
                                            ' ...' || chr(10) || '- ', 'g')
                   END AS base
            FROM documents WHERE text IS NOT NULL
        )
    ),
    lines AS (
        SELECT doc_id, l.l AS l
        FROM raw, unnest(string_split(text, chr(10))) AS l(l)
    ),
    stats AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(len(regexp_extract_all(l, '\\S+'))) AS BIGINT)
                   AS n_words,
               CAST(sum(length(regexp_replace(l, '\\s', '', 'g'))) AS BIGINT)
                   AS word_chars,
               CAST(sum(len(regexp_extract_all(l, '\\S*[A-Za-z]\\S*')))
                    AS BIGINT) AS alpha_words,
               CAST(sum((length(l) - length(replace(l, '#', '')))
                        + (length(l) - length(replace(l, '...', ''))) // 3
                        + (length(l) - length(replace(l, '…', ''))))
                    AS BIGINT) AS n_symbols,
               CAST(sum(CASE WHEN substr(ltrim(l), 1, 1) IN ('-', '*', '•')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bullet_lines,
               CAST(sum(CASE WHEN right(rtrim(l), 3) = '...'
                              OR right(rtrim(l), 1) = '…'
                             THEN 1 ELSE 0 END) AS BIGINT) AS ellipsis_lines
        FROM lines GROUP BY doc_id
    ),
    doc AS (
        SELECT doc_id, CAST({_GOPHER_STOP_SQL} AS BIGINT) AS stop_hits
        FROM raw
    )
    SELECT s.doc_id, n_lines, n_words,
           (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
           (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
               AS flag_word_length,
           (n_symbols * 10 <= n_words) AS flag_symbol_ratio,
           (bullet_lines * 10 <= n_lines * 9) AS flag_bullet_lines,
           (ellipsis_lines * 10 <= n_lines * 3) AS flag_ellipsis_lines,
           (alpha_words * 5 >= n_words * 4) AS flag_alpha_words,
           (stop_hits >= 2) AS flag_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
            AND (n_symbols * 10 <= n_words)
            AND (bullet_lines * 10 <= n_lines * 9)
            AND (ellipsis_lines * 10 <= n_lines * 3)
            AND (alpha_words * 5 >= n_words * 4)
            AND (stop_hits >= 2)) AS gopher_pass
    FROM stats s JOIN doc USING (doc_id)
    ORDER BY doc_id
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher quality rule flags + the conjunction
    (operators/text.py::gopher_quality_flags). The synthetic corpus is
    single-line and stopword-poor, so line structure, ellipsis/bullet
    lines, required stopwords, and symbol noise are synthesized
    DETERMINISTICALLY from the text + doc_id (the entsoe_fixup_chain
    precedent) so every rule exercises both branches; the operator is
    applied to the synthesized column unchanged."""
    d = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    base = F.regexp_replace(F.col("text"), r" (line|row) ", " ...\n- ")
    with_stops = F.when(
        F.col("doc_id") % 3 == 0, F.concat(base, F.lit(" of that have with"))
    ).otherwise(base)
    synth = F.when(
        F.col("doc_id") % 7 == 0,
        F.replace(with_stops, F.lit("hash"), F.lit("# #")),
    ).otherwise(with_stops)
    prepared = d.select("doc_id", synth.alias("text"))
    return tx.gopher_quality_flags(prepared, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4-style line cleaning (Raffel et al., 2020 §2.2): keep lines ending
# in terminal punctuation with >= 3 words and no javascript/lorem-
# ipsum/brace content; report per-doc funnel counts plus an md5
# fingerprint of the cleaned text (kept lines re-joined in order).
# ---------------------------------------------------------------------------


@_register(
    "c4_line_cleaning",
    """
    WITH raw AS (
        SELECT doc_id,
               regexp_replace(replace(replace(text, 'spark', 'javascript'),
                                      'vector', 'vec {'),
                              ' (table|agg|window) ', '.' || chr(10), 'g')
                   AS text
        FROM documents WHERE text IS NOT NULL
    ),
    split AS (
        SELECT doc_id, string_split(text, chr(10)) AS ls FROM raw
    ),
    lines AS (
        SELECT doc_id, i.i AS pos, ls[i.i] AS l
        FROM split, unnest(range(1, len(ls) + 1)) AS i(i)
    ),
    flagged AS (
        SELECT doc_id, pos, l,
               (right(rtrim(l), 1) IN ('.', '!', '?', '"', '”')
                AND len(regexp_extract_all(l, '\\S+')) >= 3
                AND NOT contains(lower(l), 'javascript')
                AND NOT contains(lower(l), 'lorem ipsum')
                AND NOT contains(l, '{')) AS keep
        FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(length(l)) FILTER (WHERE keep), 0) AS BIGINT)
               AS kept_chars,
           md5(coalesce(string_agg(l, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '')) AS cleaned_md5
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document C4 line-cleaning funnel + cleaned-text fingerprint
    (operators/hygiene.py::c4_line_clean). Sentence lines, javascript
    poison, and brace content are synthesized deterministically from
    the single-line synthetic corpus (the entsoe_fixup_chain
    precedent), so keep and drop branches of every rule fire; the
    operator runs on the synthesized column unchanged."""
    d = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    synth = F.regexp_replace(
        F.replace(
            F.replace(F.col("text"), F.lit("spark"), F.lit("javascript")),
            F.lit("vector"),
            F.lit("vec {"),
        ),
        r" (table|agg|window) ",
        ".\n",
    )
    prepared = d.select("doc_id", synth.alias("text"))
    return hg.c4_line_clean(prepared, "doc_id", "text")


# ---------------------------------------------------------------------------
# Declarative expectations suites (r11, operators/expectations.py):
# dataset-level quality constraints compiled into ONE keyless
# aggregation per table — the Deequ shape. The oracle SQL is GENERATED
# from the same suite definition, so engine and oracle can never
# disagree on what a check means. Each suite includes at least one
# deliberately failing check so the fail path is oracle-verified too.
# ---------------------------------------------------------------------------

from power_generation_etl_spark.operators.expectations import Suite as _Suite

_B62 = 1 << 62


def _orders_suite() -> _Suite:
    return (
        _Suite()
        .size_at_least(1)
        .completeness("o_custkey")
        .uniqueness("o_orderkey")
        .values_in("o_orderstatus", ["O", "F", "P"])
        .min_scaled_between("o_totalprice", 0, _B62, scale=100)
        .max_scaled_between("o_totalprice", 0, 60_000_000, scale=100)
        .mean_scaled_between("o_totalprice", 10_000, 60_000_000, scale=100)
        # deliberately failing: URGENT orders are ~1/5 of rows, not 50%+
        .satisfies(
            "urgent_majority",
            "o_orderpriority = '1-URGENT'",
            at_least_ppm=500_000,
        )
    )


def _documents_suite() -> _Suite:
    return (
        _Suite()
        .size_at_least(1)
        .completeness("text")
        .uniqueness("doc_id")
        .values_in("lang", ["en", "zh", "fr", "es", "de"])
        # cross-column consistency: the recorded n_chars must equal the
        # actual codepoint length of text on every row
        .satisfies("n_chars_consistent", "n_chars = length(text)")
        .min_scaled_between("n_chars", 1, _B62)
        .mean_scaled_between("n_chars", 1, _B62, scale=1)
        # deliberately failing at shipped SFs: not 95%+ of docs are 500+
        # chars (oracle computes the same verdict whatever the corpus)
        .satisfies("mostly_long_docs", "n_chars >= 500", at_least_ppm=950_000)
    )


@_register("expectations_orders", _orders_suite().oracle_sql("orders"))
def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over orders in ONE scan: completeness,
    key uniqueness, domain membership, value bands, and an integer
    mean — the dataset-level constraints the reference's row validator
    has no analogue for."""
    return _orders_suite().run(T(spark, sf_dir, "orders"))


@_register("expectations_documents", _documents_suite().oracle_sql("documents"))
def expectations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations over the documents corpus, including a cross-column
    consistency check (n_chars == length(text)) — the pre-training
    intake gate you run before any expensive dedup/scoring pass."""
    return _documents_suite().run(T(spark, sf_dir, "documents"))


def _doc_source_suite() -> _Suite:
    # size/uniqueness/consistency PER SOURCE SHARD — the grouped form
    # localizes a violation to the shard that caused it.
    return (
        _Suite()
        .size_at_least(1)
        .completeness("text")
        .uniqueness("doc_id")
        .satisfies("n_chars_consistent", "n_chars = length(text)")
        .mean_scaled_between("n_chars", 1, 1 << 62, scale=1)
    )


@_register(
    "expectations_docs_by_source",
    _doc_source_suite().oracle_grouped_sql("documents", "source"),
)
def expectations_docs_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectations suite evaluated PER SOURCE SHARD in one
    groupBy pass — at 100 TB the report that says WHICH of 10k intake
    shards broke a constraint, without a per-shard scan loop."""
    return _doc_source_suite().run_grouped(T(spark, sf_dir, "documents"), "source")


# ---------------------------------------------------------------------------
# l-diversity audit (r11 fourth wave) — the companion release gate to
# k_anonymity_audit: k-anonymity bounds re-identification but not the
# HOMOGENEITY attack (a class where every record shares one sensitive
# value discloses it without re-identification). Records are orders;
# the quasi-identifier is the customer's (nation, segment,
# balance-bucket) tuple; the sensitive attribute is o_orderpriority.
# Per equivalence class: distinct-sensitive count ("distinct
# l-diversity") and the dominant value's exact ppm share (the
# disclosure probability an attacker gets by guessing the mode).
# One join + two hash aggregations; the summary is one row.
# ---------------------------------------------------------------------------


@_register(
    "l_diversity_audit",
    """
    WITH r AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / 500.0) AS BIGINT) AS bal_bucket,
             o.o_orderpriority AS sens
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    v AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket, sens,
             CAST(count(*) AS BIGINT) AS vc
      FROM r GROUP BY 1, 2, 3, 4
    ),
    g AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             CAST(sum(vc) AS BIGINT) AS sz,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(vc) AS BIGINT) AS max_vc
      FROM v GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(min(n_distinct) AS BIGINT) AS min_distinct,
           CAST(count(*) FILTER (n_distinct < 2) AS BIGINT) AS classes_lt_2,
           CAST(coalesce(sum(sz) FILTER (n_distinct < 2), 0) AS BIGINT)
             AS rows_lt_2,
           CAST(count(*) FILTER (n_distinct < 3) AS BIGINT) AS classes_lt_3,
           CAST(coalesce(sum(sz) FILTER (n_distinct < 3), 0) AS BIGINT)
             AS rows_lt_3,
           CAST(max(max_vc * 1000000 // sz) AS BIGINT) AS max_dominance_ppm
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal / 500.0) AS BIGINT)").alias("bal_bucket"),
    )
    r = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_nationkey",
        "c_mktsegment",
        "bal_bucket",
        F.col("o_orderpriority").alias("sens"),
    )
    v = r.groupBy("c_nationkey", "c_mktsegment", "bal_bucket", "sens").agg(
        F.count(F.lit(1)).alias("vc")
    )
    g = v.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.sum("vc").alias("sz"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("vc").alias("max_vc"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.min("n_distinct").cast("bigint").alias("min_distinct"),
    ]
    for l in (2, 3):
        aggs.append(
            F.count_if(F.col("n_distinct") < l).alias(f"classes_lt_{l}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("n_distinct") < l, F.col("sz"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"rows_lt_{l}")
        )
    aggs.append(
        F.max(F.expr("max_vc * 1000000 div sz")).cast("bigint").alias(
            "max_dominance_ppm"
        )
    )
    return g.agg(*aggs)
