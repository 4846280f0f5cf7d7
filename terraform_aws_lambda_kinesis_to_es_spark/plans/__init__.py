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

# Round 5: every one of the 189 declared queries is cumulatively
# driver-green (VERDICT r4), so the window's job is now verdict-AGE
# rotation (VERDICT r5 ask #2). Head = (a) queries that are NEW or whose
# contract CHANGED this round — q_ann_ivfpq (new composed IVF+PQ index),
# q_lsh_eval / q_dup_method_agreement (zero-guarded ratio legs on both
# engines, r4 ADVICE) — then (b) the 42-name cohort whose only verdict is
# from round 1 (oldest-first by construction: everything r2+ re-proved is
# excluded), predating the NTZ normalization and session changes. 45
# names, inside the driver's ~50 budget; slack re-verifies r2-era names
# via the interleave below.
_HEAD = (
    # new this round
    "q_ann_ivfpq",
    # changed this round: degenerate-corpus zero guards (both engines) on
    # the first two; union-free exact Jaccard (|A∪B| = |A|+|B|−|A∩B| on
    # set arrays — same values, new plan) on all five; exact
    # prefix-filter candidate generation (AllPairs/PPJoin) on the first
    # three (plan-only — candidate superset proven, values unchanged)
    "q_lsh_eval", "q_dup_method_agreement", "q_shingle_containment",
    # new late in round 5: the exact set-similarity join (prefix filter
    # as a first-class detector; exhaustive oracle, recall-1 contract)
    "q_exact_jaccard_pairs",
    "q_minhash_dedup", "q_incremental_dedup",
    # changed this round: persisted edge list (plan-only; values proven
    # unchanged locally, re-verify for the record)
    "q_graph_triangles",
    # the r1-only cohort (42) — latest verdict is CORRECTNESS_r01
    "q_above_avg_orders", "q_big_spenders", "q_blame_supplier",
    "q_chunk_count", "q_cust_order_dist", "q_customer_order_semi",
    "q_daily_counts", "q_dead_letter_fmt", "q_dedup",
    "q_disjunctive_join", "q_doc_entropy", "q_doc_stats", "q_es_actions",
    "q_event_transitions", "q_index_name", "q_langid",
    "q_order_priority_rollup", "q_part_size_dist",
    "q_part_supplier_variety", "q_passage_dedup", "q_price_deciles",
    "q_pricing_summary", "q_promo_revenue", "q_props_typed", "q_quality",
    "q_repetition", "q_retention", "q_returned_items",
    "q_revenue_by_nation", "q_session_window", "q_sliding_window",
    "q_small_qty_orders", "q_supplier_rank", "q_top_orders",
    "q_top_supplier", "q_topk_users", "q_type_value_pivot", "q_user_stats",
    "q_valuable_parts", "q_volume_shipping", "q_wealthy_inactive",
    "q_wordcount",
    # positions 51-52: union-free-Jaccard plan-only sites already
    # driver-proven on identical values in r2/r3 — first in line if the
    # window stretches past 50, lowest cost if it doesn't
    "q_ngram_jaccard", "q_minhash_est",
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

    # Declaration order = driver check order. Head: this round's new /
    # changed queries plus the oldest-verdict cohort. Tail: remaining
    # queries oldest-verdict-first (r2 tier, r3 tier, then the r4-fresh
    # names in module order) so the driver's ~50-query window keeps every
    # verdict's age bounded across rounds.
    ordered: dict[str, QueryFn] = {}
    for name in _HEAD + _R2_ERA + _R3_ERA:
        if name in queries and name not in ordered:
            ordered[name] = queries[name]
    for name in queries:
        if name not in ordered:
            ordered[name] = queries[name]
    return ordered, oracles
