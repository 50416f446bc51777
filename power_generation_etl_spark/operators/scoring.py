"""Linear text classifiers as broadcast-join scoring — the fasttext /
DataTrove-quality-classifier shape (a bag-of-words linear model) run as
a pure Spark plan.

Model = {term: integer_weight} + integer bias, all weights scaled by
1000 so the logit is an exact bigint sum: scoring never depends on
float summation order and the DuckDB oracle matches bit-for-bit. A real
trained model drops in by replacing the literal weight table.

Scale design: the corpus is tokenized ONCE (explode stays in codegen);
the model ships as a broadcast hash table (a few thousand terms at
most); scoring is one broadcast join + one map-side-combinable sum per
doc. No Python UDFs, no per-term corpus passes. At 100 TB this is scan
+ explode + broadcast-HashJoin + partial agg — the same plan family as
any dimension join.

Beyond-reference extension (the reference has no ML-scoring surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Demo model: quality-ish signal over the synthetic vocabulary
# (weights ×1000; positive = keep-ish). Deterministic and public.
DEMO_WEIGHTS: dict[str, int] = {
    "spark": 900,
    "query": 600,
    "join": 500,
    "window": 450,
    "agg": 400,
    "table": 250,
    "column": 200,
    "stream": 150,
    "slow": -700,
    "fail": -900,
    "error": -800,
    "null": -300,
    "skew": -250,
    "retry": -200,
}
DEMO_BIAS = -1500
DEMO_THRESHOLD = 0  # keep when logit > 0


def score_documents(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    weights: dict[str, int] | None = None,
    bias: int | None = None,
    threshold: int | None = None,
) -> DataFrame:
    """(id, logit, label) for every input doc. logit = bias + Σ
    count(term)·weight[term] over whitespace-lowercased tokens; label =
    'keep' when logit > threshold else 'drop'. Docs with no scored
    terms still appear (bias-only logit)."""
    weights = DEMO_WEIGHTS if weights is None else weights
    bias = DEMO_BIAS if bias is None else bias
    threshold = DEMO_THRESHOLD if threshold is None else threshold
    model = spark.createDataFrame(
        sorted(weights.items()), schema="term string, w long"
    )
    toks = df.select(
        F.col(id_col),
        F.explode_outer(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    )
    scored = (
        toks.join(F.broadcast(model), "term", "left")
        .groupBy(id_col)
        .agg((F.lit(bias) + F.sum(F.coalesce(F.col("w"), F.lit(0)))).alias("logit"))
    )
    return scored.select(
        F.col(id_col),
        F.col("logit").cast("bigint").alias("logit"),
        F.when(F.col("logit") > threshold, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    ).orderBy(id_col)


def score_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    *,
    weights: dict[str, int] | None = None,
    bias: int | None = None,
    threshold: int | None = None,
) -> str:
    """DuckDB twin: same tokenization, same literal weight table, same
    integer logit."""
    weights = DEMO_WEIGHTS if weights is None else weights
    bias = DEMO_BIAS if bias is None else bias
    threshold = DEMO_THRESHOLD if threshold is None else threshold
    values = ", ".join(
        f"('{t}', {w})" for t, w in sorted(weights.items())
    )
    return f"""
    WITH model(term, w) AS (VALUES {values}),
    toks AS (
        SELECT {id_col}, unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
        FROM {table}
    ),
    scored AS (
        SELECT {id_col},
               CAST({bias} + CAST(sum(COALESCE(w, 0)) AS BIGINT) AS BIGINT) AS logit
        FROM toks LEFT JOIN model USING (term)
        GROUP BY {id_col}
    )
    SELECT {id_col}, logit,
           CASE WHEN logit > {threshold} THEN 'keep' ELSE 'drop' END AS label
    FROM scored
    ORDER BY {id_col}
    """


def logit_expr(
    text_col,
    *,
    weights: dict[str, int] | None = None,
    bias: int | None = None,
):
    """Per-row logit as a single Column expression — no explode, no
    aggregation — so it composes into STREAMING filters and projections
    where a grouped aggregation would force watermark semantics.

    One `filter` higher-order function per model term over one shared
    tokenization; per-document cost is O(tokens × terms), interpreted.
    For whole-corpus batch scoring prefer `score_documents` (one
    codegen broadcast join); for a row-at-a-time gate this form is
    exact-equal (pytest-asserted) and streaming-safe."""
    weights = DEMO_WEIGHTS if weights is None else weights
    bias = DEMO_BIAS if bias is None else bias
    toks = F.split(F.lower(text_col), r"\s+")
    total = F.lit(bias)
    for term, w in sorted(weights.items()):
        total = total + F.lit(w) * F.size(
            F.filter(toks, lambda t: t == F.lit(term))
        )
    # NULL text: size(NULL) = -1 would subtract every weight; match
    # score_documents' bias-only contract instead.
    return (
        F.when(text_col.isNull(), F.lit(bias)).otherwise(total).cast("bigint")
    )
