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
# fresh driver-side correctness row. Round-15 rotation (policy: keep every
# query <= 3 rounds stale; new entries go in-window the round they land):
#
# - IN (flagship, 1): cdc_latest, every round.
# - IN (r15-new, 3): mirror_regrain_roundtrip (partition-spec evolution
#   across transform grains, VERDICT r14 #3), sql_optimize_zorder
#   (OPTIMIZE ... ZORDER BY through the dialect, VERDICT r14 #7), and
#   sql_refs_changes (branch/tag DDL + tag reads + TABLE_CHANGES + aged
#   VACUUM through the dialect — the r15 refs/changes SQL surface).
# - IN (r15-changed, 1): sql_pruned_dml — it gained the IN-list point-set
#   prune statements (VERDICT r14 #4), so its r14 row no longer covers it.
# - IN (r11 staleness tail, 9): sequence_packing .. zorder_layout_stats —
#   4 rounds stale (r14's deliberate ceiling breach); VERDICT r14 #1 says
#   close them first.
# - IN (r12 cohort, fills to 50): 36 of the 49 rows last driver-checked in
#   r12 (alphabetical), at the 3-round ceiling now. The remaining 13
#   (salted_nation_revenue .. winsorized_length_stats) HEAD THE TAIL and
#   must open the r16 window — the same deliberate one-round breach every
#   round since r13 has taken (160 queries / 50 slots makes the steady-
#   state cycle ~3.2 rounds).
# - OUT: r13 rows (2 stale), then the r14 window's rows (1 stale, freshest
#   last). Every out-of-window entry is still re-executed against DuckDB
#   locally each round by tests/test_oracle_parity.py, so regressions cannot
#   hide between driver rotations.
# ---------------------------------------------------------------------------
_DRIVER_CHECK_PRIORITY = [
    "cdc_latest",
    "mirror_regrain_roundtrip",
    "sql_optimize_zorder",
    "sql_pruned_dml",
    "sql_refs_changes",
    "sequence_packing",
    "snapshot_diff_changelog",
    "table_profile_lineitem",
    "table_profile_orders",
    "table_profile_orders_approx",
    "temporal_split_embargo",
    "video_frame_samples",
    "weighted_mixture_sample",
    "zorder_layout_stats",
    "ann_batch_shuffle_topk",
    "ann_index_maintained_topk",
    "ann_index_purged_topk",
    "ann_prebuilt_ivfpq_topk",
    "array_hof_embedding_stats",
    "benchmark_contamination",
    "cdc_purge_history",
    "cluster_balanced_sample",
    "column_generation_masking",
    "duplicated_span_hashes",
    "event_mix_drift",
    "events_sliding_10min",
    "grouping_sets_revenue",
    "hybrid_retrieval_topk",
    "incremental_join_maintenance",
    "join_feed_availablenow",
    "lang_id_confusion",
    "minhash_near_duplicates",
    "mor_merge_fold_roundtrip",
    "orders_above_global_avg",
    "orders_by_month",
    "orders_constraint_report",
    "price_quartile_bins",
    "purchase_graph_pagerank",
    "q10_returned_revenue",
    "q11_value_share_shape",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q1_pricing_summary",
    "q20_excess_share_shape",
    "q21_sole_late_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "rolling_30d_revenue",
    "salted_nation_revenue",  # <- r16 tail head (displaced by sql_refs_changes)
    "semantic_dedup_summary",
    "session_stats",
    "set_ops_multiset",
    "skewed_priority_agg",
    "snapshot_table_ddl",
    "source_token_drift",
    "span_dedup_retention",
    "temperature_mixture_quota",
    "tfidf_top_terms",
    "top_terms",
    "unigram_surprisal_quality",
    "winsorized_length_stats",
    "ann_ivf_topk",
    "auto_discovered_mirrors",
    "bm25_topk",
    "brand_name_distance",
    "bucket_compaction_roundtrip",
    "cdc_anomaly_report",
    "cdc_ops_histogram",
    "change_feed_datasource_stream",
    "corpus_dedup_summary",
    "cosine_topk",
    "customer_order_window_stats",
    "customer_order_years",
    "declarative_agg_view",
    "dedup_exact_groups",
    "distinct_count_dims",
    "embedding_near_duplicates",
    "events_json_extract",
    "hash_split_counts",
    "merge_table_time_travel",
    "mirror_dml_delete_update",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "outer_join_order_fill",
    "pagerank_dangling_directed",
    "partition_transform_pruning",
    "passage_ann_topk",
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
    "sink_datasource_stream",
    "snapshot_branch_publish",
    "snapshot_refs_report",
    "table_constraints_gate",
    "table_sql_lifecycle",
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
    "change_feed_stream_fold",
    "cohort_retention",
    "concurrent_merge_serialization",
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
    "mirror_alter_schema_ddl",
    "mirror_rebucket_roundtrip",
    "multimodal_features",
    "nations_with_presence",
    "orders_by_year",
    "pq_adc_topk",
    "q17_small_quantity_revenue",
    "quality_score_histogram",
    "range_join_click_attribution",
    "rocchio_lang_confusion",
    "schema_drift_discovery",
    "semi_join_active_customers",
    "stats_price_quantity",
    "string_funcs_parts",
    "text_stats_by_lang",
    "top3_orders_per_customer",
    "uniform_per_group_sample",
    "user_sessions",
    "wap_anomaly_gate",
    "window_navigation",
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
