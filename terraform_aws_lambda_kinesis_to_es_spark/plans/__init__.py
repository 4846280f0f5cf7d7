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

# Queries the round-1 driver already verified green (CORRECTNESS_r01.json).
# The driver checks ~50 queries per round in declaration order, so the
# surface is re-ordered each round to put unverified (or just-fixed)
# queries first; proven ones go last and get re-checked when budget allows.
_PROVEN_R01 = frozenset(
    {
        "q_parse_props", "q_validate_route", "q_whitelist", "q_unknown_route",
        "q_index_name", "q_daily_counts", "q_chunk_count", "q_dead_letter_fmt",
        "q_es_actions", "q_dedup", "q_retention", "q_event_transitions",
        "q_props_typed", "q_topk_users", "q_user_stats", "q_type_value_pivot",
        "q_session_window", "q_sliding_window", "q_above_avg_orders",
        "q_cust_order_dist", "q_valuable_parts", "q_part_supplier_variety",
        "q_blame_supplier", "q_small_qty_orders", "q_wealthy_inactive",
        "q_returned_items", "q_promo_revenue", "q_top_supplier",
        "q_disjunctive_join", "q_volume_shipping", "q_big_spenders",
        "q_price_deciles", "q_pricing_summary", "q_revenue_by_nation",
        "q_top_orders", "q_order_priority_rollup", "q_supplier_rank",
        "q_customer_order_semi", "q_part_size_dist", "q_wordcount",
        "q_repetition", "q_passage_dedup", "q_doc_entropy", "q_doc_stats",
        "q_langid", "q_quality",
    }
)

# Fixed/reworked this round — need fresh driver verdicts before anything else.
_HEAD = ("q_sessionize", "q_funnel", "q_priority_flag", "q_approx_distinct")


def collect_surface() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from terraform_aws_lambda_kinesis_to_es_spark.plans import (
        dedup_queries,
        events_analytics,
        multimodal_queries,
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
        [n for n in mod.QUERIES if n not in _PROVEN_R01 and n not in ordered]
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
