"""Declared query surface: every operator from SURVEY.md §2 as a named query.

Importing this package registers all queries into ``catalog.QUERIES`` /
``catalog.ORACLES`` (the driver contract in ``__spark_entry__.py`` re-exports
them).
"""

# Registration order == the driver's verification order, and the driver's
# verify budget truncates at ~50 queries per round. CORRECTNESS_r01 ∪ r02
# covers 95 of the 129 round-2 queries; the 34 that have never had a
# driver-verified row are pinned FIRST (explicit list below — module import
# order alone can't interleave families), followed by everything else in
# module registration order.
from . import (  # noqa: F401  (import for registration side effects)
    dedup_q,
    similarity_q,
    streaming_q,
    sql_q,
    udf_q,
    scalar_q,
    events_q,
    textstats_q,
    multimodal_q,
    wordcount_q,
    relational_q,
    aggregates_q,
    windows_q,
    setops_q,
)
from . import catalog as _catalog

# Never driver-verified as of CORRECTNESS_r01 ∪ CORRECTNESS_r02 (34 names);
# new queries added in round 3+ follow right behind so they also land inside
# the budget before the already-double-verified back catalog.
_VERIFY_FIRST = [
    "ev_asof_last_purchase",
    "ev_multires_rollup",
    "ev_user_rollup",
    "ev_gap_fill",
    "join_asof_two_table",
    "text_langid",
    "text_quality",
    "text_token_counts",
    "text_bigrams_top",
    "text_tfidf_top_terms",
    "sample_train_test_split",
    "text_fingerprint",
    "sample_domain_mixture",
    "pack_sequences",
    "text_repetition_ratio",
    "curation_filter_funnel",
    "mm_metadata",
    "mm_featurize",
    "mm_frame_sample",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_suppliers_kept_waiting",
    "q22_dormant_customers",
    "agg_salted_two_phase",
    "window_cume_percent",
    "setop_union_by_name",
]

# Queries with a green row in CORRECTNESS_r01 ∪ CORRECTNESS_r02 (95 names) —
# already driver-verified, safe to starve if the budget truncates. Any query
# in neither list (i.e. added in round 3+) slots in right behind the 34.
_DRIVER_VERIFIED = frozenset({
    "agg_basic_stats", "agg_collect_sorted", "agg_corr_covar",
    "agg_count_distinct", "agg_cube", "agg_filtered", "agg_grouping_sets",
    "agg_having", "agg_quantile_disc", "agg_rollup",
    "approx_distinct_quantile", "dedup_cluster_representatives",
    "dedup_embed_cosine", "dedup_exact", "dedup_exact_hash",
    "dedup_keep_list", "dedup_minhash_verified", "dedup_ngram_jaccard",
    "distinct_on_subset", "distinct_pairs", "embed_cosine_topk",
    "embed_norm_stats", "ev_funnel", "ev_pivot_types", "ev_session_window",
    "ev_sliding_window", "ev_tumbling_hour", "fn_array", "fn_bitwise",
    "fn_date", "fn_json", "fn_map", "fn_math", "fn_nulls", "fn_regex",
    "fn_string", "join_anti", "join_cross", "join_full_outer", "join_inner",
    "join_left_outer", "join_range", "join_right_outer", "join_semi",
    "join_theta", "lsh_cosine_candidates", "lsh_ivf_topk",
    "lsh_minhash_candidates", "lsh_simhash64", "merge_upsert",
    "q10_returned_items", "q14_promo_revenue", "q18_large_volume_customers",
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "setop_except", "setop_except_all", "setop_intersect", "setop_union_all",
    "setop_union_distinct", "sort_multi_key", "sql_cte_top_supplier",
    "sql_exists_correlated", "sql_in_subquery", "sql_q12_priority_lines",
    "sql_scalar_subquery", "sql_unpivot", "stream_dedup_keys",
    "stream_events_tumbling", "stream_sentences_golden",
    "stream_session_window", "stream_sliding_window", "stream_static_join",
    "stream_stream_join", "stream_wordcount_file",
    "stream_wordcount_stateful", "topk_global", "udf_grouped_agg",
    "udf_pandas_scalar", "udf_rowwise", "udf_sql_registered",
    "udtf_token_positions", "window_first_last", "window_lag_lead",
    "window_range_frame", "window_rank_dense_ntile", "window_running_sum",
    "window_topk_per_group", "wordcount_per_doc_topk", "wordcount_stats",
    "wordcount_top100",
})


def _reorder() -> None:
    front = [n for n in _VERIFY_FIRST if n in _catalog.QUERIES]
    new = [
        n for n in _catalog.QUERIES
        if n not in front and n not in _DRIVER_VERIFIED
    ]
    back = [n for n in _catalog.QUERIES if n in _DRIVER_VERIFIED]
    order = front + new + back
    _catalog.QUERIES = {n: _catalog.QUERIES[n] for n in order}
    _catalog.ORACLES = {
        n: _catalog.ORACLES[n] for n in order if n in _catalog.ORACLES
    }


_reorder()
ORACLES = _catalog.ORACLES
QUERIES = _catalog.QUERIES
