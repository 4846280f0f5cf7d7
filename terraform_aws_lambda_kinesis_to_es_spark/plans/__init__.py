"""Declared query surface.

Each submodule exposes ``QUERIES: dict[name -> fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> DuckDB SQL]``; ``__spark_entry__`` merges them.
Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Queries the round-1..3 drivers already verified green (union of
# CORRECTNESS_r01/r02/r03.json, every match field true).
# The driver checks ~50 queries per round in declaration order, so the
# surface is re-ordered each round to put unverified (or just-fixed)
# queries first; proven ones go last and get re-checked when budget allows.
_PROVEN = frozenset(
    {
        # r3-green (CORRECTNESS_r03.json, all 50 match)
        "q_pivot_priority", "q_clean_corpus", "q_dedup_keep_best",
        "q_ann_lsh", "q_ann_ivf", "q_quantize", "q_temperature_mix",
        "q_contamination", "q_pack_sequences", "q_stratified_sample",
        "q_token_budget", "q_source_mix", "q_unigram_ppl", "q_centroid_sim",
        "q_set_ops", "q_percentiles", "q_cube_orders", "q_corr_stats",
        "q_grouping_sets", "q_array_math", "q_date_functions",
        "q_string_functions", "q_dup_clusters_chain", "q_semdedup",
        "q_interval_join_binned", "q_gopher_filters", "q_incremental_dedup",
        "q_embed_normalize", "q_media_audio_stats", "q_mad_outliers",
        "q_repeat_upsample", "q_phrase_search", "q_profile_columns",
        "q_text_normalize", "q_dup_method_agreement", "q_embed_dims",
        "q_value_buckets", "q_cooccurrence", "q_key_skew_profile",
        "q_difficulty_buckets", "q_minhash_est", "q_matryoshka",
        "q_ewma_daily", "q_salted_agg", "q_keyphrase", "q_dup_source_matrix",
        "q_bucket_occupancy", "q_percent_change", "q_cdc_latest",
        "q_graph_degree",
        # r1/r2-green
        "q_above_avg_orders", "q_anomaly_days", "q_approx_distinct",
        "q_asof_join", "q_big_spenders", "q_bigram_lm", "q_bigram_topk",
        "q_blame_supplier", "q_bm25", "q_boilerplate_strip", "q_bpe_pairs",
        "q_c4_filters", "q_chunk_count", "q_clean_stream",
        "q_cust_order_dist", "q_customer_order_semi", "q_daily_counts",
        "q_dead_letter_fmt", "q_dedup", "q_disjunctive_join",
        "q_doc_entropy", "q_doc_stats", "q_dup_clusters", "q_embed_near_dup",
        "q_embed_near_dup_lsh", "q_es_actions", "q_event_transitions",
        "q_exact_dedup", "q_fingerprint", "q_forecast_revenue", "q_funnel",
        "q_hash_split", "q_importance_sample", "q_index_name",
        "q_keyword_search", "q_knn_classify", "q_knn_cosine", "q_langid",
        "q_length_histogram", "q_map_functions", "q_market_share",
        "q_media_decode", "q_media_features", "q_media_frames",
        "q_media_resize", "q_minhash_dedup", "q_ngram_jaccard",
        "q_order_gaps", "q_order_priority_rollup", "q_parse_props",
        "q_part_size_dist", "q_part_supplier_variety", "q_passage_dedup",
        "q_pii_redact", "q_posexplode", "q_price_deciles",
        "q_pricing_summary", "q_priority_flag", "q_promo_revenue",
        "q_props_typed", "q_quality", "q_range_join", "q_rank_functions",
        "q_repetition", "q_retention", "q_returned_items",
        "q_revenue_by_nation", "q_rolling_hour", "q_running_total",
        "q_semdedup_bucketed", "q_session_window", "q_sessionize",
        "q_simhash", "q_simhash_pairs", "q_sliding_window",
        "q_small_qty_orders", "q_span_mask", "q_supplier_rank", "q_tfidf",
        "q_tokens", "q_top_doc_per_source", "q_top_orders", "q_top_supplier",
        "q_topk_users", "q_type_value_pivot", "q_unknown_route",
        "q_unpivot_part", "q_user_stats", "q_validate_route",
        "q_valuable_parts", "q_volume_shipping", "q_wealthy_inactive",
        "q_whitelist", "q_wordcount",
    }
)

# Round 4 is a close-the-loop round (VERDICT r3 #1): the head is EXACTLY the
# 39 queries that have never received a driver verdict — the 25 declared
# late in round 3 (after that round's head-50 order was frozen) plus the 14
# mid-list names the r1-r3 windows never reached — followed by the two
# ADVICE-reworked queries (q_rollup_merge now splits on event_id parity so
# the merge is genuinely exercised; q_duplicate_payloads digests through
# explicit NULL sentinels on both engines) and this round's single addition,
# q_profile_columns_approx. 40 names, inside the driver's ~50 budget.
# The round's five NEW queries (q_ann_pq, q_shingle_containment,
# q_lsh_eval, q_tokenizer_fertility, q_label_balance) are declared
# immediately AFTER the head via the module interleave below — positions
# 42-46, still inside the window — so they get verdicts this round without
# displacing any never-checked query; remaining window slack re-verifies
# proven queries.
_HEAD = (
    # ADVICE-fix re-verifies first (semantics changed this round)
    "q_rollup_merge", "q_duplicate_payloads",
    # the round-3 _LATE tranche (23 remaining)
    "q_quality_classifier", "q_doc_chunks", "q_oov_rate",
    "q_skyline", "q_graph_triangles", "q_zorder_layout",
    "q_orphan_check", "q_approx_quantiles",
    "q_entity_match", "q_k_anonymity", "q_gap_fill", "q_ann_recall",
    "q_media_patchify", "q_hll_merge", "q_entity_clusters",
    "q_expectations", "q_value_drift", "q_inverted_index", "q_top_paths",
    "q_winsorize", "q_forget_users", "q_functional_deps", "q_benford",
    # mid-list queries never reached by the r1-r3 driver windows (14)
    "q_attribution", "q_cohort_orders", "q_compaction_plan",
    "q_data_freshness", "q_dead_hours", "q_doc_manifest",
    "q_json_schema_infer", "q_out_of_order", "q_pagerank", "q_rate_limit",
    "q_reservoir_sample", "q_salted_join", "q_shard_assignment",
    "q_trending_parts",
    # this round's one addition (VERDICT r3 #6)
    "q_profile_columns_approx",
    # reworked after the 10x sweep (count-derived codebook — sf0.01
    # results unchanged, but the contract changed, so re-verify)
    "q_semdedup_bucketed",
)


def collect_surface() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from terraform_aws_lambda_kinesis_to_es_spark.plans import (
        dedup_queries,
        events_analytics,
        multimodal_queries,
        pipeline_queries,
        reference_queries,
        relational_ext,
        search_queries,
        similarity_queries,
        stats_queries,
        text_queries,
        tpch_queries,
        training_queries,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    modules = (
        reference_queries,
        events_analytics,
        tpch_queries,
        text_queries,
        dedup_queries,
        similarity_queries,
        multimodal_queries,
        relational_ext,
        stats_queries,
        training_queries,
        search_queries,
        pipeline_queries,
    )
    for mod in modules:
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise RuntimeError(f"oracle without query: {missing}")

    # Declaration order = driver check order. Head: this round's fixes.
    # Then unverified queries, round-robin INTERLEAVED across modules so a
    # per-round driver cap still lands >= 1 verdict on every component
    # family. Proven round-1 queries last.
    ordered: dict[str, QueryFn] = {}
    for name in _HEAD:
        if name in queries:
            ordered[name] = queries[name]
    pending = [
        [n for n in mod.QUERIES if n not in _PROVEN and n not in ordered]
        for mod in modules
    ]
    while any(pending):
        for family in pending:
            if family:
                name = family.pop(0)
                ordered[name] = queries[name]
    for name in queries:
        if name not in ordered:
            ordered[name] = queries[name]
    return ordered, oracles
