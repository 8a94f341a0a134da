"""Query registry package: every operator exposed through the driver
contract, split by family (VERDICT r9 item 3 — the single 8k-line
queries.py was the one file every round touched).

Importing this package is equivalent to importing the old module: the
part modules register their entries into the shared ``QUERIES`` /
``ORACLE_SQL`` dicts in definition order, every top-level name of every
part is hoisted into this namespace (tests and callers keep addressing
``queries.<fn>``), and the driver-window ordering is applied last.
"""

from __future__ import annotations

from tabular_cdc_bootstrapper_spark.queries import _registry
from tabular_cdc_bootstrapper_spark.queries._registry import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
    query,
)
from tabular_cdc_bootstrapper_spark.queries import (  # noqa: F401  (registration order)
    cdc_state,
    relational,
    text_ann,
    tpch,
    text_quality,
)

# hoist every part's top-level names so ``queries.<name>`` keeps working
# exactly as in the single-file layout (later definitions win, matching
# single-file semantics)
for _m in (_registry, cdc_state, relational, text_ann, tpch, text_quality):
    for _k in list(vars(_m)):
        if not _k.startswith("__"):
            globals()[_k] = vars(_m)[_k]
del _m, _k


# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness gate records exactly the FIRST
# 50 registry entries each round, so entry order decides which queries get a
# fresh driver-side correctness row. Round-10 rotation (policy: keep every
# query <= 3 rounds stale; VERDICT r9 #8: after r10 no row may be older
# than r8):
#
# - IN (new r10, 4): wap_anomaly_gate (WAP on the bucketed mirror with
#   AnomalyRules in the publish gate), snapshot_refs_report (tags +
#   expiry + shallow clone + clone-side purge composition),
#   snapshot_branch_publish (writable branch staged via audited WAP,
#   fast-forward publish), bucket_compaction_roundtrip
#   (rewrite_data_files: manifest-aware small-file compaction).
# - IN (changed code this round, 4 + flagship): cdc_anomaly_report
#   (check_anomalies_vs_previous now resolves readable baselines),
#   merge_table_time_travel (merge meta threaded through the bucketed
#   commit), pagerank_dangling_directed (static dangling set hoisted
#   out of the iteration loop), passage_ann_topk (vec_id overflow guard
#   in chunk_vectors), cdc_latest (flagship, in-window every round).
# - IN (the full r7 cohort, 41): every row whose latest driver check is
#   r7 — at the 3-round staleness ceiling after r10 (computed from
#   CORRECTNESS_r07/08/09: r7-green minus the r8/r9 windows).
# - OUT (tail): the 44 r8 rows (2 rounds stale, scheduled to rotate in
#   r11) and the r9 rows (1 round stale). Every family keeps an
#   in-window representative, and every oracle-backed entry is ALSO
#   re-executed against DuckDB locally every round by
#   tests/test_oracle_parity.py, so tail regressions cannot hide
#   between driver rotations.
# ---------------------------------------------------------------------------

_DRIVER_CHECK_PRIORITY = [
    "cdc_latest",
    "wap_anomaly_gate",
    "snapshot_refs_report",
    "snapshot_branch_publish",
    "bucket_compaction_roundtrip",
    "cdc_anomaly_report",
    "merge_table_time_travel",
    "pagerank_dangling_directed",
    "passage_ann_topk",
    "ann_ivf_topk",
    "bm25_topk",
    "brand_name_distance",
    "cdc_ops_histogram",
    "corpus_dedup_summary",
    "cosine_topk",
    "customer_order_window_stats",
    "customer_order_years",
    "dedup_exact_groups",
    "distinct_count_dims",
    "embedding_near_duplicates",
    "events_json_extract",
    "hash_split_counts",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "outer_join_order_fill",
    "pii_redaction_by_source",
    "pivot_revenue_by_status",
    "price_percentiles",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_brand_supplier_count",
    "q19_disjunctive_revenue",
    "q22_idle_balance",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_region_revenue",
    "q7_nation_volume",
    "referential_integrity_report",
    "repetition_stats_by_lang",
    "rollup_revenue",
    "set_ops_part_coverage",
    "simhash_near_duplicates",
    "stats_price_quantity",
    "string_funcs_parts",
    "text_stats_by_lang",
    "top3_orders_per_customer",
    "uniform_per_group_sample",
    "user_sessions",
    "window_navigation",
    # --- tail (51+): green driver rows on current code, family
    # representative in window, still oracle-checked locally every round ---
    "incremental_join_maintenance",
    "cdc_purge_history",
    "price_quartile_bins",
    "orders_constraint_report",
    "ann_prebuilt_ivfpq_topk",
    "ann_index_maintained_topk",
    "ann_batch_shuffle_topk",
    "ann_index_purged_topk",
    "purchase_graph_pagerank",
    "semantic_dedup_summary",
    "array_hof_embedding_stats",
    "benchmark_contamination",
    "cluster_balanced_sample",
    "duplicated_span_hashes",
    "event_mix_drift",
    "events_sliding_10min",
    "grouping_sets_revenue",
    "hybrid_retrieval_topk",
    "orders_above_global_avg",
    "orders_by_month",
    "q10_returned_revenue",
    "q11_value_share_shape",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q20_excess_share_shape",
    "q21_sole_late_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "rolling_30d_revenue",
    "salted_nation_revenue",
    "session_stats",
    "set_ops_multiset",
    "skewed_priority_agg",
    "source_token_drift",
    "span_dedup_retention",
    "temperature_mixture_quota",
    "tfidf_top_terms",
    "top_terms",
    "unigram_surprisal_quality",
    "winsorized_length_stats",
    "q1_pricing_summary",
    "minhash_near_duplicates",
    "lang_id_confusion",
    "cdc_mirror_time_travel",
    "cdc_change_feed",
    "merge_orders_corrections",
    "temporal_split_embargo",
    "mad_price_outliers",
    "table_profile_orders_approx",
    "table_profile_lineitem",
    "table_profile_orders",
    "ivf_pq_topk",
    "pq_adc_topk",
    "ann_ivf_kmeans_topk",
    "incremental_cluster_maintenance",
    "multimodal_features",
    "video_frame_samples",
    "cube_order_stats",
    "semi_join_active_customers",
    "anti_join_no_open_orders",
    "orders_by_year",
    "events_tumbling_10min",
    "ann_lsh_topk",
    "doc_fingerprints",
    "q17_small_quantity_revenue",
    "brand_having_filter",
    "nations_with_presence",
    "quality_score_histogram",
    "bpe_token_counts",
    "document_chunks",
    "sequence_packing",
    "weighted_mixture_sample",
    "leakage_safe_split",
    "kmeans_embedding_clusters",
    "zorder_layout_stats",
    "rocchio_lang_confusion",
    "int8_quantized_topk",
    "heavy_hitter_terms",
    "hll_distinct_counts",
    "approx_price_percentiles",
    "snapshot_diff_changelog",
    "incremental_agg_maintenance",
    "cdc_scd2_history",
    "event_funnel",
    "cohort_retention",
    "range_join_click_attribution",
    "asof_purchase_signup",
]

def _reorder_registry() -> None:
    known = set(QUERIES)
    listed = set(_DRIVER_CHECK_PRIORITY)
    assert listed == known, (
        f"priority list out of sync: missing={known - listed}, "
        f"stale={listed - known}"
    )
    for d in (QUERIES, ORACLE_SQL):
        ordered = {n: d[n] for n in _DRIVER_CHECK_PRIORITY if n in d}
        d.clear()
        d.update(ordered)

_reorder_registry()
