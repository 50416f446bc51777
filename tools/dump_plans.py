"""Regenerate PLANS.md: the formatted physical plan of each headline
catalog query, with a one-line verdict of the scale-relevant property
the plan must show. Run after changing any headline query:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINES = {
    "pricing_summary": "filter pushed to parquet scan; 7-column pruned read; "
    "two-phase hash agg (map-side partial) with one 6-group shuffle",
    "regional_revenue": "every dimension joined as BroadcastHashJoin — no "
    "shuffle on the fact side until the final tiny agg",
    "cosine_neardup_pairs": "LSH band keys bound the candidate join "
    "(O(Σ bucket²)); exact cosine verification touches candidates only",
    "minhash_lsh_pairs": "signatures via codegen min-aggregates; candidates "
    "shuffle (band,id) pairs only; verification joins are equi-keyed",
    "fuzzy_part_name_pairs": "edit distance evaluated on the distinct-name "
    "domain (broadcast), expanded back through equi-joins",
    "chunk_dedup_stats": "one shuffle on the 32-char chunk hash; chunk text "
    "never travels",
    "asof_clicks_errors": "union + ordered window — ONE shuffle, no range "
    "cross-join",
    "rolling_7d_user_value": "RANGE window over integer day index inside one "
    "(user) shuffle",
    "pagerank_trade_nations": "per-iteration equi-join + map-side-combined "
    "sum; lineage cut via localCheckpoint",
    "bloom_prefilter_orders": "bloom membership is a literal-bitmap "
    "projection inside the scan stage — no join/shuffle to pre-filter; "
    "the only joins are the broadcast exact-verify and the final 1-row agg",
    "cms_custkey_counts": "counter build is one map-side-combined hash agg "
    "(≤ d·w groups); point estimates join broadcast counters",
    "merged_user_intervals": "one (user) window shuffle — interval merge "
    "without pairwise interval joins",
    "small_quantity_revenue": "correlated per-part AVG decorrelated to one "
    "keyed aggregate + equi-join — no per-row re-scan of lineitem",
    "nation_pair_trade_volume": "nation dim broadcast under two roles; both "
    "fact inputs semi-reduced to the pair before the fact⋈fact shuffle",
    "khop_trade_nations": "each hop one frontier⋈edges hash join + "
    "distinct; no cartesian anywhere",
    "equi_depth_order_values": "two-pass global rank: range-partitioned "
    "sort + pid-partitioned row_number + broadcast offsets — NO "
    "unpartitioned Window node",
    "running_order_value": "distributed prefix sum: same two-pass shape, "
    "cumulative window partitioned by range-partition id only",
    "order_value_exact_deciles": "quickselect: aggregation-only passes "
    "(tiny histogram shuffles), result materializes as a 9-row local "
    "relation — no sort of the data anywhere",
    "bm25_doc_scores": "one explode+groupBy over matching tokens "
    "(map-side combined); top-20 via TakeOrderedAndProject, no global sort",
    "customer_spend_gini": "row-scale rank via the two-pass distributed "
    "rank; staged ×100 long division keeps the ppm ratio in int64 — "
    "no unpartitioned Window, no overflow",
    "triangle_count_trade": "degree-oriented wedge join: two shuffles "
    "(node, then pair); no cartesian",
    "cusum_peak_days": "clamped CUSUM as prefix-sum minus running min — "
    "two windows PARTITIONED by event_type, no recurrence loop",
    "gopher_repetition_flags": "one doc-partitioned lead window feeding "
    "three doc-keyed aggregates; exact integer ppm, no global window",
    "bpe_train_rounds": "corpus touched once (word-frequency groupBy); "
    "every merge round is vocab-scale with a 1-row driver collect",
    "bpe_encode_doc_lengths": "frozen merges applied as a BROADCAST vocab "
    "join — corpus side never shuffles its text",
    "exact_substring_dup_spans": "duplicated L-grams from a digest-only "
    "groupBy (16-byte shuffle rows); positions re-join by digest; span "
    "merge is one doc-partitioned window — no suffix array, no sort",
    "semdedup_embeddings": "k-means cells bound the pair join to "
    "O(Σ cluster²); assignment is a projection; every training round is "
    "one map-side-combined aggregate",
    "ivfpq_adc_topk": "probed-cell filter is a projection predicate; ADC "
    "ranking is literal-LUT lookups + TakeOrderedAndProject — float "
    "vectors never shuffle",
    "bigram_lm_surprisal": "two count aggregations + count-keyed joins "
    "(TF-IDF shuffle profile); ln only on the DISTINCT count domain via "
    "a joined driver LUT",
    "hll_distinct_users": "register build is one map-side-combined "
    "aggregate (≤ 64 rows per group at the shuffle); estimate is pure "
    "projection arithmetic",
    "suffix_array_topk": "each doubling round: per-doc equi-join + "
    "two-pass dense rank of the DISTINCT pair set — no unpartitioned "
    "Window, round count bounded by log2(max doc length)",
    "doc_chunk_spans": "token-array projection + posexplode over the "
    "chunk-index sequence — zero shuffle before the ordered output",
    "ivfpq_residual_topk": "residual = one staged centroid-map lookup "
    "per row; per-probed-cell LUTs are literal maps — float vectors "
    "never shuffle",
    "binary_sign_topk": "bit-packed words in one projection; Hamming "
    "shortlist and exact re-rank are both TakeOrderedAndProject",
    "longest_repeated_substrings": "adjacent-rank equi-join (no window); "
    "LCP is one zip_with pass per O(n) pair",
    "prefix_jaccard_pairs": "candidate join equi-keyed on shingle over "
    "df-ranked PREFIX postings only (rarest-first window); the r9 runtime "
    "guard has already bounded Σ p·(p−1) below the ceiling before this "
    "plan is shaped; exact verification touches candidates only",
    "zorder_bucket_stats": "Morton key is pure shift/mask codegen over "
    "driver-literal min/max (one 1-row stats job); then one map-side-"
    "combined 64-group aggregate — no wide shuffle, no sort",
    "image_decode_luma": "synthesis (md5→unhex→concat codegen) and decode "
    "share ONE MapInPandas stage — the binary column is born and dies in "
    "the Python worker; only narrow scalars reach the final order-by "
    "exchange (plus a narrow pre-synthesis round-robin on single-file "
    "inputs)",
    "user_event_profile": "one (user_id) shuffle into FlatMapGroupsInPandas "
    "over a 4-column narrow projection — bounded groups cross the Arrow "
    "hop, nothing else",
}


def main() -> int:
    from power_generation_etl_spark.plans import QUERIES
    from power_generation_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump-plans")
    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at sf dir `{sf_dir}`.",
        "Regenerate after changing any of these queries; the verdict line",
        "states the scale property the plan must keep showing.",
        "",
    ]
    import contextlib
    import io

    for name, verdict in HEADLINES.items():
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        # keep the operator tree, drop the verbose per-node detail dump
        tree = plan.split("\n\n")[0]
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Must show:** {verdict}")
        out.append("")
        out.append("```")
        out.append(tree.strip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINES)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
