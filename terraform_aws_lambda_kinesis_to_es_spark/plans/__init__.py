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

# Verdict-age tiers (latest green round per query, from the union of
# CORRECTNESS_r01-r04 — all 189 are green; see VERDICT r4). The driver
# checks ~50 queries per round in declaration order, so the surface is
# ordered oldest-verdict-first after the per-round _HEAD: the r1-only
# cohort IS the head this round, then the r2 tier, then r3; the 50
# r4-fresh names go last.
_R2_ERA = (
    "q_anomaly_days", "q_approx_distinct", "q_asof_join", "q_bigram_lm",
    "q_bigram_topk", "q_bm25", "q_boilerplate_strip", "q_bpe_pairs",
    "q_c4_filters", "q_clean_stream", "q_dup_clusters", "q_embed_near_dup",
    "q_embed_near_dup_lsh", "q_exact_dedup", "q_fingerprint",
    "q_forecast_revenue", "q_funnel", "q_hash_split", "q_importance_sample",
    "q_keyword_search", "q_knn_classify", "q_knn_cosine",
    "q_length_histogram", "q_map_functions", "q_market_share",
    "q_media_decode", "q_media_features", "q_media_frames", "q_media_resize",
    "q_minhash_dedup", "q_ngram_jaccard", "q_order_gaps", "q_pii_redact",
    "q_posexplode", "q_priority_flag", "q_range_join", "q_rank_functions",
    "q_rolling_hour", "q_running_total", "q_sessionize", "q_simhash",
    "q_simhash_pairs", "q_span_mask", "q_tfidf", "q_tokens",
    "q_top_doc_per_source", "q_unpivot_part",
)
_R3_ERA = (
    "q_ann_ivf", "q_ann_lsh", "q_array_math", "q_bucket_occupancy",
    "q_cdc_latest", "q_centroid_sim", "q_clean_corpus", "q_contamination",
    "q_cooccurrence", "q_corr_stats", "q_cube_orders", "q_date_functions",
    "q_dedup_keep_best", "q_difficulty_buckets", "q_dup_clusters_chain",
    "q_dup_source_matrix", "q_embed_dims", "q_embed_normalize",
    "q_ewma_daily", "q_gopher_filters", "q_graph_degree", "q_grouping_sets",
    "q_incremental_dedup", "q_interval_join_binned", "q_key_skew_profile",
    "q_keyphrase", "q_mad_outliers", "q_matryoshka", "q_media_audio_stats",
    "q_minhash_est", "q_pack_sequences", "q_percent_change", "q_percentiles",
    "q_phrase_search", "q_pivot_priority", "q_profile_columns", "q_quantize",
    "q_repeat_upsample", "q_salted_agg", "q_semdedup", "q_set_ops",
    "q_source_mix", "q_stratified_sample", "q_string_functions",
    "q_temperature_mix", "q_text_normalize", "q_token_budget",
    "q_unigram_ppl", "q_value_buckets",
)

# The full r4 tier in its CORRECTNESS_r04 verdict order. [:26] filled
# the round-8 window (green in CORRECTNESS_r08); [26:] is the 20-name
# leftover the round-9 head clears.
_R4_FRESH = (
    "q_parse_props", "q_validate_route", "q_whitelist", "q_unknown_route",
    "q_rollup_merge", "q_duplicate_payloads", "q_quality_classifier",
    "q_doc_chunks", "q_oov_rate", "q_skyline", "q_zorder_layout",
    "q_orphan_check", "q_approx_quantiles", "q_entity_match",
    "q_k_anonymity", "q_gap_fill", "q_ann_recall", "q_media_patchify",
    "q_hll_merge", "q_entity_clusters", "q_expectations", "q_value_drift",
    "q_inverted_index", "q_top_paths", "q_winsorize", "q_forget_users",
    "q_functional_deps", "q_benford", "q_attribution", "q_cohort_orders",
    "q_compaction_plan", "q_data_freshness", "q_dead_hours",
    "q_doc_manifest", "q_json_schema_infer", "q_out_of_order",
    "q_pagerank", "q_rate_limit", "q_reservoir_sample", "q_salted_join",
    "q_shard_assignment", "q_trending_parts", "q_profile_columns_approx",
    "q_tokenizer_fertility", "q_ann_pq", "q_label_balance",
)
# The full r5 tier (47 names whose latest green verdict is round 5,
# judge-recomputed from the CORRECTNESS_r01-r08 union) in its
# CORRECTNESS_r05 verdict order. [:18] fills the rest of the round-9
# window (q_ann_ivfpq .. q_es_actions); [18:] (29 names,
# q_event_transitions .. q_wordcount) is the queued round-10 rotation
# debt — see the round-10 head plan below.
_R5_TIER = (
    "q_ann_ivfpq", "q_shingle_containment", "q_exact_jaccard_pairs",
    "q_minhash_dedup", "q_graph_triangles", "q_above_avg_orders",
    "q_big_spenders", "q_blame_supplier", "q_chunk_count",
    "q_cust_order_dist", "q_customer_order_semi", "q_daily_counts",
    "q_dead_letter_fmt", "q_dedup", "q_disjunctive_join",
    "q_doc_entropy", "q_doc_stats", "q_es_actions",
    "q_event_transitions", "q_index_name", "q_langid",
    "q_order_priority_rollup", "q_part_size_dist",
    "q_part_supplier_variety", "q_passage_dedup", "q_price_deciles",
    "q_pricing_summary", "q_promo_revenue", "q_props_typed", "q_quality",
    "q_repetition", "q_retention", "q_returned_items",
    "q_revenue_by_nation", "q_session_window", "q_sliding_window",
    "q_small_qty_orders", "q_supplier_rank", "q_top_orders",
    "q_top_supplier", "q_topk_users", "q_type_value_pivot",
    "q_user_stats", "q_valuable_parts", "q_volume_shipping",
    "q_wealthy_inactive", "q_wordcount",
)

# The full r6 tier (50 names whose latest green verdict is round 6,
# recomputed from the CORRECTNESS_r01-r09 union) in its
# CORRECTNESS_r06 verdict order. [:9] fills the rest of the round-10
# window; [9:] (41 names, q_boilerplate_strip .. q_incremental_dedup)
# is the queued round-11 rotation debt — see the round-11 head plan
# below.
_R6_TIER = (
    "q_ann_ivfpq_rerank", "q_semdedup_sampled", "q_embed_near_dup_sampled",
    "q_anomaly_days", "q_approx_distinct", "q_asof_join", "q_bigram_lm",
    "q_bigram_topk", "q_bm25",
    "q_boilerplate_strip", "q_bpe_pairs", "q_c4_filters", "q_clean_stream",
    "q_dup_clusters", "q_embed_near_dup", "q_embed_near_dup_lsh",
    "q_exact_dedup", "q_fingerprint", "q_forecast_revenue", "q_funnel",
    "q_hash_split", "q_importance_sample", "q_keyword_search",
    "q_knn_classify", "q_knn_cosine", "q_length_histogram",
    "q_map_functions", "q_market_share", "q_media_decode",
    "q_media_features", "q_media_frames", "q_media_resize",
    "q_ngram_jaccard", "q_order_gaps", "q_pii_redact", "q_posexplode",
    "q_priority_flag", "q_range_join", "q_rank_functions",
    "q_rolling_hour", "q_running_total", "q_sessionize", "q_simhash",
    "q_simhash_pairs", "q_span_mask", "q_tfidf", "q_tokens",
    "q_top_doc_per_source", "q_unpivot_part", "q_incremental_dedup",
)

# Round 10 (VERDICT r9 #1, the plan written at round-9 end, executed
# name-for-name): head, exactly 50 =
#   (a) the 12 PROMOTED hygiene_queries names (built + staged in r9 as
#       plans/staged_r10.py with two-SF driver-protocol pytest and 100x
#       scale evidence; renamed plans/hygiene_queries.py on promotion);
#   (b) the 29-name r5-tier leftover (_R5_TIER[18:], latest verdicts
#       round 5, five rounds old — clears the r5 tier entirely);
#   (c) the first 9 names of the r6 tier (_R6_TIER[:9]), oldest-first
#       in their r6 verdict order.
_R10_PROMOTED = (
    "q_index_probe_delta", "q_mg_sketch_agreement", "q_token_compression",
    "q_selfrep_spans", "q_quality_sweep", "q_cross_lang_dup",
    "q_boilerplate_hubs", "q_recrawl_schedule", "q_rejection_mix",
    "q_pii_density", "q_audio_dynamic_range", "q_image_entropy",
)

# Round 11 (VERDICT r10 #1, the plan written at round-10 end, executed
# name-for-name): head, exactly 50 =
#   (a) the 12 PROMOTED diagnostics_queries names (built + staged in
#       r10 as plans/staged_r11.py with two-SF driver-protocol pytest
#       and 100x scale evidence; renamed plans/diagnostics_queries.py
#       on promotion);
#   (b) the first 38 names of the r6-tier leftover (_R6_TIER[9:47],
#       latest verdicts round 6, five rounds old), oldest-first in
#       their r6 verdict order — leaves a 3-name r6 residue
#       (_R6_TIER[47:]) for the round-12 head.
_R11_PROMOTED = (
    "q_index_churn", "q_band_yield", "q_minhash_ablation",
    "q_dedup_cascade", "q_hard_negatives", "q_embed_norm_audit",
    "q_filter_overlap", "q_rater_kappa", "q_langid_confusion",
    "q_pack_efficiency", "q_image_border_uniformity",
    "q_growth_accounting",
)
# Round-12 head (VERDICT r11 #1, the plan written at round-11
# promotion time per VERDICT r10 #7, executed name-for-name; the r7
# tier is fixed — its 50 names' latest green verdicts are round 7 in
# the CORRECTNESS_r01-r11 union, and the r11 window re-checked only
# r11-promoted + r6-tier names, so the r7 tier could not shift):
# head, exactly 50 =
#   (a) the 4 PROMOTED index_queries names (built + staged in r10 as
#       plans/staged_r12.py with two-SF driver-protocol pytest and
#       100x scale evidence; renamed plans/index_queries.py on
#       promotion);
#   (b) the 3-name r6 residue (_R6_TIER[47:]);
#   (c) the first 43 r7-tier names in their CORRECTNESS_r07 order.
# That leaves the last 7 r7 names (q_pack_sequences, q_percent_change,
# q_percentiles, q_phrase_search, q_pivot_priority, q_profile_columns,
# q_quantize) plus the 50-name r8 tier for round 13.
_R12_HEAD = (
    # (a) promoted index_queries tranche
    "q_ivf_balance", "q_pq_distortion", "q_ann_probe_curve",
    "q_dup_transitivity",
    # (b) r6 residue
    "q_top_doc_per_source", "q_unpivot_part", "q_incremental_dedup",
    # (c) r7 tier, CORRECTNESS_r07 order, first 43
    "q_hybrid_rrf", "q_heavy_hitters", "q_sorted_neighborhood",
    "q_substring_spans", "q_substring_strip", "q_domain_cap",
    "q_dataset_card", "q_hist_quantiles", "q_scd2_intervals",
    "q_semdedup_assign_agreement", "q_bloom_semijoin",
    "q_semdedup_bucketed", "q_lsh_eval", "q_dup_method_agreement",
    "q_minhash_est", "q_ann_ivf", "q_ann_lsh", "q_array_math",
    "q_bucket_occupancy", "q_cdc_latest", "q_centroid_sim",
    "q_clean_corpus", "q_contamination", "q_cooccurrence",
    "q_corr_stats", "q_cube_orders", "q_date_functions",
    "q_dedup_keep_best", "q_difficulty_buckets", "q_dup_clusters_chain",
    "q_dup_source_matrix", "q_embed_dims", "q_embed_normalize",
    "q_ewma_daily", "q_gopher_filters", "q_graph_degree",
    "q_grouping_sets", "q_interval_join_binned", "q_key_skew_profile",
    "q_keyphrase", "q_mad_outliers", "q_matryoshka",
    "q_media_audio_stats",
)
_HEAD = _R12_HEAD

# Round-13 head plan (explicit, written at round-11 end; the r8 tier is
# fixed — its 50 names' latest green verdicts are round 8 in the
# CORRECTNESS_r01-r10 union, and neither the r11 window (r11-promoted +
# r6 tier) nor the executed r12 window (_R12_HEAD above) touches
# them, so the tier cannot shift before round 13): head, exactly 50 =
#   (a) the 12 staged round-13 names from plans/staged_r13.py
#       (the evaluation & operational-tuning tranche — built and
#       two-SF driver-protocol-tested in round 11; promote on
#       schedule, renamed to its promoted module);
#   (b) the 7-name r7 residue (q_pack_sequences .. q_quantize, the
#       tail of the r7 tier _R12_HEAD leaves);
#   (c) the first 31 r8-tier names in their CORRECTNESS_r08 order.
# That leaves the last 19 r8 names (q_doc_chunks .. q_forget_users)
# plus the r9 tier for round 14.
_R13_HEAD_PLAN = (
    # (a) staged r13 tranche
    "q_split_leakage", "q_retrieval_eval", "q_contamination_sweep",
    "q_prefix_sharing", "q_cusum_changepoint", "q_watermark_sizing",
    "q_session_gap_curve", "q_media_integrity", "q_readability",
    "q_mojibake", "q_poisson_bootstrap", "q_hubness",
    # (b) r7 residue
    "q_pack_sequences", "q_percent_change", "q_percentiles",
    "q_phrase_search", "q_pivot_priority", "q_profile_columns",
    "q_quantize",
    # (c) r8 tier, CORRECTNESS_r08 order, first 31
    "q_url_canonical", "q_weighted_reservoir", "q_layout_skipping",
    "q_linear_quality", "q_lsh_tuning", "q_time_decay", "q_media_phash",
    "q_kmv_overlap", "q_audio_fingerprint", "q_mmr_diversify",
    "q_ngram_novelty", "q_join_size_est", "q_repeat_upsample",
    "q_salted_agg", "q_semdedup", "q_set_ops", "q_source_mix",
    "q_stratified_sample", "q_string_functions", "q_temperature_mix",
    "q_text_normalize", "q_token_budget", "q_unigram_ppl",
    "q_value_buckets", "q_parse_props", "q_validate_route",
    "q_whitelist", "q_unknown_route", "q_rollup_merge",
    "q_duplicate_payloads", "q_quality_classifier",
)

# Round-14 head arithmetic (write the explicit _R14_HEAD_PLAN tuple at
# round-13 promotion time, per the standing pattern): head, exactly
# 50 = the 12 staged round-14 names from plans/staged_r14.py + the
# 19-name r8 residue (q_doc_chunks .. q_forget_users, the tail of the
# r8 tier _R13_HEAD_PLAN leaves) + the first 19 r9-tier names in their
# CORRECTNESS_r09 order. That leaves the last 31 r9 names for round 15.
#
# Round-15 head arithmetic (tuple written at round-14 promotion time):
# head, exactly 50 = the 12 staged round-15 names from
# plans/staged_r15.py (built + two-SF driver-protocol-tested + 100x
# evidenced in round 12) + the 31-name r9 residue + the first 7
# r10-tier names in their CORRECTNESS_r10 order. That leaves 43 r10
# names plus the r11 tier for round 16.
#
# Round-16 head arithmetic (tuple written at round-15 promotion time):
# head, exactly 50 = the 12 staged round-16 names from
# plans/staged_r16.py (the training-operations & estimation tranche —
# built + two-SF driver-protocol-tested + 100x evidenced in round 12)
# + the first 38 of the 43-name r10 residue in their CORRECTNESS_r10
# order. That leaves 5 r10 names plus the r11/r12 tiers for round 17.
#
# Round-17 head arithmetic (tuple written at round-16 promotion time):
# head, exactly 50 = the 12 staged round-17 names from
# plans/staged_r17.py (the drift & stability monitoring tranche —
# built + two-SF driver-protocol-tested + 100x evidenced in round 12)
# + the 5-name r10 residue + the first 33 r11-tier names in their
# CORRECTNESS_r11 order. That leaves 17 r11 names plus the r12 tier
# for round 18.


def collect_surface() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from terraform_aws_lambda_kinesis_to_es_spark.plans import (
        audit_queries,
        corpus_queries,
        curation_queries,
        dedup_queries,
        diagnostics_queries,
        events_analytics,
        hygiene_queries,
        index_queries,
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
        curation_queries,
        corpus_queries,
        audit_queries,
        hygiene_queries,
        diagnostics_queries,
        index_queries,
    )
    for mod in modules:
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise RuntimeError(f"oracle without query: {missing}")

    # Declaration order = driver check order. Head: this round's new /
    # changed queries plus the oldest-verdict cohort. Tail: remaining
    # queries oldest-verdict-first (the r6-tier leftover, then the old
    # era lists for residual ordering, then module order) so the
    # driver's ~50-query window keeps every verdict's age bounded
    # across rounds.
    ordered: dict[str, QueryFn] = {}
    for name in _HEAD + _R6_TIER + _R2_ERA + _R3_ERA:
        if name in queries and name not in ordered:
            ordered[name] = queries[name]
    for name in queries:
        if name not in ordered:
            ordered[name] = queries[name]
    return ordered, oracles
