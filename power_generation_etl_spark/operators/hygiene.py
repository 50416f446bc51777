"""Corpus-hygiene operators: benchmark decontamination and PII
scanning/redaction.

A pretraining pipeline must (a) remove documents that leak evaluation
benchmarks into the training set (n-gram overlap decontamination, as
popularized by the GPT-3/PaLM appendices) and (b) find and redact
personally identifiable information before the corpus ships. Both are
pure DataFrame ops — regexp/codegen expressions and one broadcast
semi-join — with exact DuckDB oracle twins in plans/hygiene_queries.py.

Scale notes (100 TB): benchmark suites are small (≤ millions of
n-grams) while the corpus is huge, so decontamination broadcasts the
benchmark shingle set and the corpus side never shuffles for the probe
— a map-side hash semi-join per partition; only the per-doc hit
aggregation shuffles, carrying (doc_id, hits) pairs. Shingles travel
as 32-bit portable hashes (8-byte longs), not strings, so the
broadcast is ~3× smaller than raw text. PII scanning is a single
regexp pass inside whole-stage codegen — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import minhash as mh

# RE2-and-Java-compatible patterns (no backrefs / lookaround), so the
# Spark plan and the DuckDB oracle compile the identical regex.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII occurrence counts — one codegen'd regexp pass per
    pattern, no UDFs, no shuffle."""
    return {
        kind: F.regexp_count(text, F.lit(pat)).cast("bigint")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace each PII match with a typed placeholder token.

    Order matters: emails first (an email contains digit runs a phone
    pattern could claim), then IPs, then phones."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_RE, "[IP]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, has_pii) per document."""
    counts = pii_counts(F.col(text_col))
    cols = [F.col(id_col)]
    total = None
    for kind, c in counts.items():
        cols.append(c.alias(f"n_{kind}"))
        total = c if total is None else total + c
    cols.append((total > 0).alias("has_pii"))
    return df.select(*cols)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Documents sharing at least one word ``n``-gram with a benchmark
    set: (doc_id, n_hit_ngrams, n_bench_docs).

    The benchmark shingle table is hashed (portable 32-bit) and
    broadcast; the corpus probe is a map-side hash join, so the corpus
    never shuffles its text. A row appearing here should be dropped (or
    flagged) before training; callers anti-join on doc_id.

    At true 100 TB scale, when the benchmark set outgrows the broadcast
    threshold, the identical plan degrades gracefully to a shuffle hash
    join on the 8-byte shingle hash — still never moving document
    bodies.
    """
    c_sh = mh.shingle_table(corpus, id_col, text_col, n=n).select(
        "doc_id", mh.portable_hash32(F.col("s")).alias("h")
    )
    b_sh = (
        mh.shingle_table(benchmark, id_col, text_col, n=n)
        .select(
            F.col("doc_id").alias("bench_id"),
            mh.portable_hash32(F.col("s")).alias("h"),
        )
        .distinct()
    )
    # No forced broadcast hint: benchmark suites are usually far under
    # the auto-broadcast threshold, so AQE broadcasts them anyway — but
    # a hard F.broadcast() on an unexpectedly large benchmark would
    # force-collect it to the driver and OOM at exactly the scale the
    # graceful-degradation story promises a shuffle-join fallback for.
    hits = c_sh.join(b_sh, "h")
    return hits.groupBy("doc_id").agg(
        F.count_distinct("h").alias("n_hit_ngrams"),
        F.count_distinct("bench_id").alias("n_bench_docs"),
    )


# ---------------------------------------------------------------------------
# Encoding hygiene: UTF-8 damage detection (mojibake, replacement
# chars, stray control bytes). Web-scale corpora are full of
# double-encoded latin1→utf8 text; these are the standard cheap
# tells, all RE2-and-Java-safe so the DuckDB oracle runs the identical
# patterns. Counting uses the length-difference idiom
# (len(x) − len(replace(x, pat, ''))), which both engines evaluate
# identically for single-codepoint patterns.
# ---------------------------------------------------------------------------

# C0 control characters except tab/newline/carriage-return.
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
# U+FFFD REPLACEMENT CHARACTER — the decoder already gave up here.
REPLACEMENT_RE = r"[\x{FFFD}]"
# Classic latin1-read-as-utf8 mojibake: 'Ã' followed by a byte from the
# latin-1 supplement continuation range (é → 'Ã©', ü → 'Ã¼', …).
MOJIBAKE_RE = r"Ã[\x{80}-\x{BF}]"


def _count_matches(text: Column, pattern: str, width: int = 1) -> Column:
    """Occurrences of a fixed-width pattern via length difference —
    codegen-only, no regexp_count (DuckDB lacks it)."""
    return (
        (F.length(text) - F.length(F.regexp_replace(text, pattern, "")))
        / width
    ).cast("bigint")


def encoding_quality(text: Column) -> dict[str, Column]:
    """Per-document encoding-damage evidence columns. NULL text yields
    NULL counts (callers filter or coalesce explicitly — the size(NULL)
    class of silent-wrong-answer is documented in the verify notes)."""
    return {
        "n_control": _count_matches(text, CONTROL_RE),
        "n_replacement": _count_matches(text, REPLACEMENT_RE),
        "n_mojibake": _count_matches(text, MOJIBAKE_RE, width=2),
        "has_nonascii": text.rlike(r"[^\x00-\x7f]").cast("int"),
    }


def _c4_flagged_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, l, keep) — every line of every document with its
    C4 keep/drop verdict. Shared by the stats report (`c4_line_clean`)
    and the text rewriter (`c4_cleaned_text`), so the rule set cannot
    drift between them."""
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    lines = base.select(
        "doc_id", F.posexplode(F.split(F.col("_t"), r"\n")).alias("pos", "l")
    )
    li = F.col("l")
    low = F.lower(li)
    keep = (
        F.expr("right(rtrim(l), 1)").isin(".", "!", "?", '"', "”")
        & (F.size(F.regexp_extract_all(li, F.lit(r"\S+"), F.lit(0))) >= 3)
        & ~low.contains("javascript")
        & ~low.contains("lorem ipsum")
        & ~li.contains("{")
    )
    return lines.select("doc_id", "pos", "l", keep.alias("keep"))


def c4_cleaned_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, cleaned) — each document's surviving lines re-joined in
    original order (same array_sort-inside-aggregate as the md5
    fingerprint in `c4_line_clean`, so `md5(cleaned)` equals that
    report's `cleaned_md5` by construction). Documents whose every
    line is dropped yield an empty string — downstream quality gates
    remove them."""
    flagged = _c4_flagged_lines(df, id_col, text_col)
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct(F.col("pos"), F.col("l")),
                        )
                    )
                ),
                lambda x: x["l"],
            ),
            "\n",
        ).alias("cleaned")
    )


def c4_line_clean(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al., 2020, "Exploring
    the Limits of Transfer Learning..." §2.2 — the rule set behind the
    C4 corpus): keep only lines that

      * end in terminal punctuation (. ! ? or a closing quote),
      * have at least 3 words,
      * contain neither "javascript" nor "lorem ipsum" nor a '{'
        (case-insensitive).

    Returns per-document (doc_id, n_lines, n_kept, kept_chars,
    cleaned_md5) where cleaned_md5 hashes the kept lines re-joined in
    original order with newlines — the verifiable fingerprint of the
    cleaned text without shipping the text itself (pipelines that want
    the cleaned string select the same array_join directly).

    Shape for 100 TB: one line explode (posexplode of split-on-newline)
    with codegen per-line predicates, one doc-keyed aggregation. Line
    order is restored inside the aggregate by array_sort on (pos, line)
    structs — document-local, no window, no driver state.
    """
    flagged = _c4_flagged_lines(df, id_col, text_col)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("keep"), F.length("l"))), F.lit(0)
            )
            .cast("bigint")
            .alias("kept_chars"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("keep"),
                                    F.struct(F.col("pos"), F.col("l")),
                                )
                            )
                        ),
                        lambda x: x["l"],
                    ),
                    "\n",
                )
            ).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )
