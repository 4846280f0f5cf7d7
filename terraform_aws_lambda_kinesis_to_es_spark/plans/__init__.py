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

# Queries the round-1/round-2 drivers already verified green (union of
# CORRECTNESS_r01.json + CORRECTNESS_r02.json, every match field true).
# The driver checks ~50 queries per round in declaration order, so the
# surface is re-ordered each round to put unverified (or just-fixed)
# queries first; proven ones go last and get re-checked when budget allows.
_PROVEN = frozenset(
    {
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
        # q_semdedup was green in r2 but its contract is reworked this round
        # (cluster count now derived from corpus size) — re-verify first.
    }
)

# Added LATE in round 3, after the head-50 declaration order was frozen
# against the driver's ~50-query/round budget. Declared at the TAIL so they
# cannot displace a never-checked query from the driver's window; they are
# parity-tested locally (pytest + sf0.01 sweep) and queue for a round-4
# driver verdict.
_LATE = frozenset(
    {
        "q_quality_classifier", "q_doc_chunks", "q_oov_rate",
        "q_skyline", "q_graph_triangles", "q_zorder_layout",
        "q_orphan_check", "q_rollup_merge", "q_approx_quantiles",
        "q_entity_match", "q_k_anonymity", "q_gap_fill", "q_ann_recall",
        "q_media_patchify", "q_hll_merge", "q_entity_clusters",
        "q_expectations", "q_value_drift", "q_inverted_index", "q_top_paths",
        "q_winsorize", "q_forget_users", "q_functional_deps",
        "q_benford", "q_duplicate_payloads",
    }
)

# Fixed/reworked this round — need fresh driver verdicts before anything else.
# q_pivot_priority: oracle HUGEINT->BIGINT cast fix; q_semdedup: scale-honest
# cluster-count contract; the rest: never driver-checked through round 2.
_HEAD = (
    "q_pivot_priority", "q_clean_corpus", "q_dedup_keep_best", "q_ann_lsh",
    "q_ann_ivf", "q_quantize", "q_temperature_mix", "q_contamination",
    "q_pack_sequences", "q_stratified_sample", "q_token_budget",
    "q_source_mix", "q_unigram_ppl", "q_centroid_sim", "q_set_ops",
    "q_percentiles", "q_cube_orders", "q_corr_stats", "q_grouping_sets",
    "q_array_math", "q_date_functions", "q_string_functions",
    "q_dup_clusters_chain", "q_semdedup",
    # round-3 scale-technique showcase — worth a driver verdict this round
    "q_interval_join_binned",
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
        [
            n
            for n in mod.QUERIES
            if n not in _PROVEN and n not in ordered and n not in _LATE
        ]
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
