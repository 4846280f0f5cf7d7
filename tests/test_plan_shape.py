"""Plan-shape regression guards: the physical plans that make these
queries scale must not silently degrade. These assert on the executed
plan, not timings — partition-count-independent and cheap."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint

from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S

QUERIES = entrypoint.queries()


def plan_of(spark, sf_dir, name: str) -> str:
    # display-only confs: without them long field lists and FileScan
    # metadata (PushedFilters!) truncate and substring assertions
    # silently test the ellipsis
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_whitelist_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_whitelist")
    assert "PushedFilters: [In(event_type" in plan
    # map-only: no exchange at all
    assert "Exchange" not in plan


def test_forecast_revenue_all_filters_pushed(spark, sf_dir):
    # Q6 shape: every range predicate must reach the parquet scan, and a
    # global no-group aggregate needs exactly one (single-row) exchange
    plan = plan_of(spark, sf_dir, "q_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan
    assert plan.count("Exchange") == 1


def test_market_share_single_fact_exchange(spark, sf_dir):
    # Q8 shape: all dimension chains broadcast; lineitem |><| orders is
    # the only data shuffle besides the final small aggregation
    plan = plan_of(spark, sf_dir, "q_market_share")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_pricing_summary_single_shuffle_with_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_pricing_summary")
    assert plan.count("Exchange") == 1
    assert "LessThanOrEqual(l_shipdate" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    assert "TakeOrdered" in plan_of(spark, sf_dir, "q_topk_users")
    assert "TakeOrdered" in plan_of(spark, sf_dir, "q_top_orders")


def test_scan_prunes_columns(spark, sf_dir):
    # q_index_name touches only event_id/event_type/ts; props (the widest
    # column) must not be read
    plan = plan_of(spark, sf_dir, "q_index_name")
    assert "props" not in plan


def test_sessionize_reuses_one_exchange(spark, sf_dir):
    # both windows + both aggregations share the user_id partitioning
    plan = plan_of(spark, sf_dir, "q_sessionize")
    assert plan.count("Exchange") <= 2


def test_no_python_udf_in_relational_queries(spark, sf_dir):
    # the reference hot path and relational analytics must stay JVM-side;
    # Python appears only in the isolated decode/multimodal stages
    for name in (
        "q_validate_route",
        "q_daily_counts",
        "q_pricing_summary",
        "q_minhash_dedup",
        "q_simhash",
        "q_knn_cosine",
        "q_wordcount",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_returned_items_fact_shrink_then_take_ordered(spark, sf_dir):
    # Q10 shape: aggregate before the customer join (broadcast), top-20
    # via TakeOrdered — no global sort
    plan = plan_of(spark, sf_dir, "q_returned_items")
    assert "TakeOrdered" in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_promo_revenue_broadcasts_part(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_promo_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_doc_per_source_is_pure_aggregate(spark, sf_dir):
    # argmax via struct MAX: a two-phase (partial + final) aggregate with
    # no window machinery. Struct max lowers to SortAggregate (struct
    # comparisons aren't hash-aggregable) — still map-side combined.
    plan = plan_of(spark, sf_dir, "q_top_doc_per_source")
    assert "Window" not in plan
    assert "Aggregate" in plan
    assert plan.count("Exchange") == 1


def test_bpe_pairs_take_ordered(spark, sf_dir):
    assert "TakeOrdered" in plan_of(spark, sf_dir, "q_bpe_pairs")


def test_knn_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_knn_cosine")
    assert "Broadcast" in plan


# Queries whose semantics REQUIRE an all-pairs product against a small
# broadcast side (vector scoring); everything else must stay keyed.
_INTENTIONAL_PRODUCT = {
    "q_knn_cosine",      # corpus x broadcast(5 query vecs)
    # pre-whitelisted staged-r12 shapes (promotion precedent, r8/r9):
    "q_ann_probe_curve",   # knn_bruteforce_l2 truth leg + 1-row total attach
    "q_dup_transitivity",  # three 1-row aggregates broadcast-joined
    # pre-whitelisted staged-r13 shapes (same precedent):
    "q_hubness",           # knn_bruteforce_l2 truth leg + 1-row totals attach
    "q_cusum_changepoint",  # day spine x broadcast(single-row totals)
    # pre-whitelisted staged-r14 shapes (same precedent):
    "q_jl_distortion",       # 20-vector panel non-equi self-join (190 pairs)
    "q_event_bursts",        # window spine x broadcast(1-row median/total)
    "q_mixture_rebalance",   # lang rollup x broadcast(single-row totals)
    "q_dedup_survivor_bias",  # source rollup x broadcast(single-row totals)
    # pre-whitelisted staged-r17 shapes (same precedent — the time-
    # midpoint split and pooled totals are 1-row broadcast attaches):
    "q_psi_drift",
    "q_ks_drift",
    "q_mix_drift_chi2",
    "q_dispersion_drift",
    "q_tost_equivalence",
    "q_schema_drift",
    "q_cadence_drift",
    "q_quality_drift_decomp",
    "q_dup_rate_drift",
    # pre-whitelisted staged-r16 shapes (same precedent — all 1-row
    # totals/threshold attaches except where noted):
    "q_bin_packing",         # shard rollup x broadcast(1-row token total)
    "q_shuffle_locality",    # source rollup x broadcast(1-row corpus count)
    "q_backlog_drain",       # hour spine x broadcast(1-row capacity)
    "q_source_influence",    # source rollup x broadcast(1-row totals)
    "q_ips_estimate",        # source rollup x broadcast(1-row harmonic stats)
    "q_confident_learning",  # corpus x broadcast(1-row class thresholds)
    "q_representation_parity",  # nation rollup x broadcast(1-row totals)
    "q_dedup_window_curve",  # ladder spine x broadcast(1-row dup total)
    "q_curriculum_mix",      # ranked corpus x broadcast(1-row count)
    # pre-whitelisted staged-r15 shapes (same precedent):
    "q_metric_agreement",    # corpus x broadcast(5 query vecs), both metric legs
    "q_t_closeness",         # class rollup x broadcast(|sources| global shares)
    "q_chi2_independence",   # lang marginals x broadcast(source marginals) grid
    "q_revenue_pareto",      # decile rollup x broadcast(single-row total)
    "q_ndcg_eval",           # inherits q_bm25's 1-row corpus-stats attach
    "q_slo_burn",            # hour spine from broadcast(1-row min/max span)
    "q_knn_classify",    # same knn_bruteforce core x broadcast queries
    "q_embed_near_dup",  # exact baseline: corpus x corpus (declared)
    "q_ann_ivf",         # corpus x broadcast(16 centroids)
    "q_centroid_sim",    # corpus x broadcast(10 centroids)
    "q_semdedup",        # corpus x broadcast(count-derived seed vecs) assignment pass
    "q_semdedup_bucketed",  # orphan fallback: seedless-bucket vecs x broadcast codebook
    "q_tfidf",           # x broadcast(single-row N)
    "q_keyphrase",       # q_tfidf core x broadcast(single-row N)
    "q_source_mix",      # x broadcast(single-row totals)
    "q_temperature_mix", # x broadcast(single-row totals)
    "q_unigram_ppl",     # x broadcast(single-row corpus total)
    "q_bm25",            # x broadcast(single-row corpus stats)
    "q_wealthy_inactive",  # x broadcast(single-row avg-balance threshold)
    "q_valuable_parts",    # x broadcast(single-row global revenue total)
    "q_key_skew_profile",  # top-k rows x broadcast(single-row total)
    "q_difficulty_buckets",  # x broadcast(single-row total + quartile row)
    "q_cooccurrence",      # pair counts x broadcast(single-row doc count)
    "q_repeat_upsample",   # per-source rollup x broadcast(single-row max)
    "q_dead_hours",        # type set x broadcast(single-row hour span)
    "q_matryoshka",        # corpus x broadcast(5 query vecs) — knn family
    "q_interval_join_binned",  # campaign spine x broadcast(single-row span)
    "q_data_freshness",    # per-type rollup x broadcast(single-row hwm)
    "q_trending_parts",    # x broadcast(single-row latest-year)
    "q_pagerank",          # node set x broadcast(single-row node count)
    "q_profile_columns_approx",  # 1-row approx agg x broadcast(1-row exact agg)
    "q_lsh_eval",          # three 1-row count legs broadcast-joined
    "q_label_balance",     # per-label rollup x broadcast(single-row totals)
    "q_dup_method_agreement",  # three single-row count aggregates joined
    "q_gap_fill",          # type set x broadcast(single-row hour span)
    "q_ann_recall",        # ground-truth leg IS knn_bruteforce (corpus x
                           # broadcast query vecs); both LSH legs stay keyed
    "q_value_drift",       # bucket shares x broadcast(single-row totals)
    "q_benford",           # digit counts x broadcast(single-row total)
    "q_embed_near_dup_sampled",  # corpus x broadcast(bounded id-hash anchors)
    "q_semdedup_sampled",  # bounded sample x broadcast(rank-based seeds)
    # promoted round 7 (was plans/staged_r7.py; see test_curation_queries)
    "q_hybrid_rrf",        # x broadcast(1-row bm25 stats) + x broadcast(1 query vec)
    "q_semdedup_assign_agreement",  # bounded id-hash sample x broadcast(seeds), both legs
    # promoted round 8 (was plans/staged_r8.py; see test_corpus_queries)
    "q_mmr_diversify",     # x broadcast(1 query vec); 20-row shortlist self-product (sims)
    "q_kmv_overlap",       # 20-row sketch frames joined on source < source
    "q_layout_skipping",   # x broadcast(single-row extents)
    "q_time_decay",        # x broadcast(single-row high-water mark)
    "q_lsh_tuning",        # three 1-row count legs broadcast-attached
    "q_join_size_est",     # 1-row CMS estimate x 1-row exact-count combine
    # promoted round 9 (was plans/staged_r9.py; see test_audit_queries)
    "q_js_divergence",     # |sources| x vocab-index grid + source < source pairs
    "q_split_balance",     # cells x broadcast(1-row grand total)
    "q_media_dominant_color",  # bucket rollup x broadcast(1-row total)
    # promoted round 10 (was plans/staged_r10.py; see
    # test_hygiene_queries):
    "q_quality_sweep",     # bounded ttr histogram x broadcast(10 cuts + 1-row totals)
    "q_rejection_mix",     # |sources| rates x broadcast(1-row min / total)
    "q_mg_sketch_agreement",  # summary rows x broadcast(1-row total err)
    # promoted round 11 (was plans/staged_r11.py; see
    # test_diagnostics_queries):
    "q_hard_negatives",    # corpus x broadcast(bounded id-hash anchor panel)
    "q_dedup_cascade",     # four 1-row stage counts crossJoin-attached
}


def test_volume_shipping_broadcasts_all_dims(spark, sf_dir):
    # the Q7-shape tree: every dimension side (nation x2, supplier,
    # customer chain) must come in as a broadcast hash join — the only
    # permitted exchange is the lineitem-orders key shuffle (which AQE
    # may itself convert to broadcast at small SF)
    plan = plan_of(spark, sf_dir, "q_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_semdedup_pair_pass_is_cluster_keyed(spark, sf_dir):
    # the intra-cluster pair join must be an equi-join on cluster, never
    # an all-pairs product over the corpus (the broadcast seed scoring is
    # the only nested-loop allowed; it appears once — the assignment is
    # persisted, so its subtree is not replicated per consumer)
    plan = plan_of(spark, sf_dir, "q_semdedup")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_no_forced_broadcast_on_sf_proportional_sides():
    """100×-robustness guard: `F.broadcast` must only pin genuinely
    bounded relations. customer/supplier/part (and anything derived from
    them, filtered or not) are SF-proportional — a forced hint on them
    OOMs the executors at extreme SF, while the planner broadcasts them
    anyway at small SF (asserted physically by the companion test below).
    Source-level check: the only F.broadcast targets allowed in the TPC-H
    surface are nation (25 rows), region (5 rows), and single-row scalar
    aggregates."""
    import inspect
    import re

    from terraform_aws_lambda_kinesis_to_es_spark.plans import tpch_queries

    src = inspect.getsource(tpch_queries)
    targets = re.findall(r"F\.broadcast\((\w+)", src)
    allowed = {"nation", "region", "avg_bal", "total"}
    assert targets, "expected bounded-dim hints to remain"
    assert set(targets) <= allowed, f"forced broadcast on unbounded side: {set(targets) - allowed}"


def test_planner_broadcasts_sf_proportional_dims_hint_free(spark, sf_dir):
    """The flip side of the guard above: with the explicit hints gone,
    the customer/supplier/part joins must STILL come in as broadcast hash
    joins at test scale — via the static planner's size estimate or AQE's
    runtime re-plan — proving the hint was redundant where it was safe."""
    for name in ("q_top_orders", "q_big_spenders", "q_returned_items",
                 "q_promo_revenue", "q_top_supplier"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: planner no longer broadcasts"
        assert "CartesianProduct" not in plan, name


def test_contamination_broadcasts_eval_grams(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_contamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_profile_columns_one_scan_one_exchange(spark, sf_dir):
    # every per-column stat comes from ONE FileScan: the multi-distinct
    # agg is planned as a single Expand (gid) + two aggregations — a
    # per-column rescan (4 scans) would show here. Exactly the expand
    # shuffle + the single-row final exchange; unprofiled columns pruned.
    plan = plan_of(spark, sf_dir, "q_profile_columns")
    assert plan.count("FileScan") == 1
    assert "Expand" in plan
    assert plan.count("Exchange") == 2
    assert "o_totalprice" not in plan


def test_ann_pq_joins_all_broadcast(spark, sf_dir):
    # PQ encode joins the corpus subvector stream to the CONSTANT-size
    # codebook, and ADC joins the codes to the broadcast query LUT — the
    # corpus must never be shuffle-joined (no SortMergeJoin anywhere;
    # codebook + LUT arrive as broadcast hash joins)
    plan = plan_of(spark, sf_dir, "q_ann_pq")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_jaccard_verify_is_union_free(spark, sf_dir):
    # exact Jaccard on set arrays must use |A∪B| = |A|+|B|−|A∩B| — no
    # array_union materialization per candidate pair (r5: 3.1x on the
    # method-agreement verify leg at 10x). Intersect count stays bounded:
    # predicate pushdown may inline the hoisted alias into the filter,
    # but codegen subexpression elimination dedupes within the operator.
    for name in ("q_ngram_jaccard", "q_minhash_dedup", "q_lsh_eval"):
        plan = plan_of(spark, sf_dir, name)
        assert "array_union" not in plan, name


def test_ann_ivfpq_one_index_shuffle_no_smj(spark, sf_dir):
    # the composed index: the ONLY corpus-keyed exchange is the
    # ivfpq_index groupBy(id) — assignment and codes come out of the same
    # collected structs, so there is no corpus-sized codes-to-lists join
    # (zero SortMergeJoins anywhere in the plan). The probe pruning is a
    # broadcast hash join of the index against the tiny probe set, and
    # the ADC LUT arrives broadcast too.
    plan = plan_of(spark, sf_dir, "q_ann_ivfpq")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # codebook, probes, LUT
    # the codebook subtree carries its pushed seed filter to the scan
    assert f"LessThan(vec_id,{S.PQ_K})" in plan


def test_ann_ivfpq_rerank_only_shortlist_reads_vectors(spark, sf_dir):
    # the FAISS-refine contract at plan level (VERDICT r5 #3): the exact
    # leg must fetch true vectors ONLY through broadcast hash joins of
    # the bounded shortlist/query relations against the corpus scan —
    # no SortMergeJoin, no cartesian anywhere. The ADC/index subtree
    # keeps its one keyed shuffle (groupBy id); the shortlist join adds
    # zero corpus-keyed exchanges.
    plan = plan_of(spark, sf_dir, "q_ann_ivfpq_rerank")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # codebook, probes, LUT, shortlist->vectors, queries->vectors
    assert plan.count("BroadcastHashJoin") >= 5
    assert f"LessThan(vec_id,{S.PQ_K})" in plan


def test_profile_columns_approx_agg_has_no_expand(spark, sf_dir):
    # the scale point of the sketch profile: multiple approx_count_distinct
    # aggregates accumulate as independent HLL++ states in ONE pass — no
    # Expand, so scanned rows are never multiplied by the distinct-agg
    # count (q_profile_columns' exact plan pays a 4x Expand)
    from terraform_aws_lambda_kinesis_to_es_spark.plans.pipeline_queries import (
        profile_columns_approx_agg,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    agg = profile_columns_approx_agg(load(spark, sf_dir, "orders"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("FileScan") == 1
    assert "o_totalprice" not in plan  # unprofiled columns pruned


def test_key_skew_profile_take_ordered(spark, sf_dir):
    # hot-key top-k must be TakeOrdered (per-partition heads + k-row
    # merge), never a global sort of the key histogram
    plan = plan_of(spark, sf_dir, "q_key_skew_profile")
    assert "TakeOrdered" in plan


def test_salted_agg_is_two_stage(spark, sf_dir):
    # the whole point of the rewrite: a (key, salt) partial shuffle then a
    # key-only re-aggregation — exactly two exchanges, no window
    plan = plan_of(spark, sf_dir, "q_salted_agg")
    assert plan.count("Exchange") == 2
    assert "Window" not in plan


def test_cdc_latest_single_exchange(spark, sf_dir):
    # one shuffle on the compaction key serves the row_number window
    plan = plan_of(spark, sf_dir, "q_cdc_latest")
    assert plan.count("Exchange") == 1


def test_difficulty_buckets_no_corpus_window(spark, sf_dir):
    # bucketing is threshold-comparison against a broadcast quartile row —
    # a global ntile window (single-partition sort of the corpus) must
    # never reappear here
    plan = plan_of(spark, sf_dir, "q_difficulty_buckets")
    assert "Window" not in plan


def test_cooccurrence_pairs_expand_row_local(spark, sf_dir):
    # pair generation must be a row-local Generate (HOF expansion +
    # explode), aggregated once; top-k via TakeOrdered. A corpus-keyed
    # self-join here would be the quadratic scale-killer.
    plan = plan_of(spark, sf_dir, "q_cooccurrence")
    assert "Generate" in plan
    assert "TakeOrdered" in plan


def test_gopher_and_phrase_stay_map_side(spark, sf_dir):
    # rule filters and phrase search are scan + project only (the one
    # permitted exchange is load_split's round-robin re-parallelization)
    for name in ("q_gopher_filters", "q_phrase_search", "q_text_normalize"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("Exchange") <= 1, name
        assert "Join" not in plan and "Window" not in plan, name


def test_late_tranche_plan_shapes(spark, sf_dir):
    # q_quality_classifier: hashed linear scoring is scan + HOF project
    # only (one permitted load_split re-parallelization exchange)
    plan = plan_of(spark, sf_dir, "q_quality_classifier")
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan and "Window" not in plan

    # q_doc_chunks: chunking is a pipelined row-local Generate — no
    # shuffle, no join
    plan = plan_of(spark, sf_dir, "q_doc_chunks")
    assert "Generate" in plan
    assert "Join" not in plan and "Window" not in plan

    # q_oov_rate: the vocab cut must compile to TakeOrdered (bounded,
    # never a global sort) and membership must be a broadcast hash join
    plan = plan_of(spark, sf_dir, "q_oov_rate")
    assert "TakeOrdered" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # q_skyline: the ONLY window runs over the bounded per-quality
    # relation; the corpus-side verdict is a broadcast join, and the
    # O(n^2) NOT-EXISTS shape of the oracle must never appear here
    plan = plan_of(spark, sf_dir, "q_skyline")
    assert plan.count("Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # q_zorder_layout: key derivation is map-side arithmetic; exactly the
    # one aggregation exchange
    plan = plan_of(spark, sf_dir, "q_zorder_layout")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan

    # q_orphan_check: every leg is a keyed join after a child-side key
    # rollup — the oracle's O(n^2) NOT-EXISTS shape must never appear
    plan = plan_of(spark, sf_dir, "q_orphan_check")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # q_rollup_merge: pure aggregation algebra, no join anywhere
    plan = plan_of(spark, sf_dir, "q_rollup_merge")
    assert "Join" not in plan

    # q_approx_quantiles: one grouped aggregation (sketch + exact share the
    # same shuffle), no join
    plan = plan_of(spark, sf_dir, "q_approx_quantiles")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan

    # q_entity_match: names collapse to distinct BEFORE the pair join and
    # the self-join is keyed on the block token, never all-pairs
    plan = plan_of(spark, sf_dir, "q_entity_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan

    # q_k_anonymity: one grouped aggregation over a bounded QI space
    plan = plan_of(spark, sf_dir, "q_k_anonymity")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan

    # q_gap_fill: the only product is the single-row span attach; the
    # carry-forward window runs over the bounded spine join, and the raw
    # events feed exactly one aggregation
    plan = plan_of(spark, sf_dir, "q_gap_fill")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1

    # q_inverted_index: vocab cut compiles to TakeOrdered, term membership
    # is a broadcast semi join — never a sort-merge of the word explosion
    plan = plan_of(spark, sf_dir, "q_inverted_index")
    assert "TakeOrdered" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan

    # q_top_paths: the first-K filter must prune inside the window
    # (WindowGroupLimit), and the final cut is TakeOrdered — no global sort
    plan = plan_of(spark, sf_dir, "q_top_paths")
    assert "WindowGroupLimit" in plan
    assert "TakeOrdered" in plan


def test_runtime_bloom_filter_fires_on_selective_fact_join(spark, sf_dir):
    """100 TB posture: when a selective dimension predicate feeds a SHUFFLE
    join, Spark injects a bloom filter built from the filtered side into the
    fact-side scan (runtime row-level filtering) — at scale this is the
    difference between shuffling the whole fact table and shuffling only
    rows that can possibly match. Nothing in the engine session may disable
    the rewrite; this pins that with the size thresholds scaled down to
    fixture bytes (app-side scan threshold defaults to 10GB), the canonical
    selective-dim ⋈ fact shape gets bloom_filter_agg + might_contain
    injected."""
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force the shuffle-join regime the optimization targets (at real
        # scale neither side broadcasts)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        orders = load(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        li = load(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt and "might_contain" in opt
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_no_accidental_cartesian_anywhere(spark, sf_dir):
    """Sweep: no query may contain an unkeyed join product unless its
    semantics require one against a broadcast side. Catches the classic
    scale-killer (a join that silently degraded to NLJ)."""
    for name in QUERIES:
        plan = plan_of(spark, sf_dir, name)
        if name in _INTENTIONAL_PRODUCT:
            continue
        assert "CartesianProduct" not in plan, name
        # BroadcastNestedLoopJoin is legitimate only for the tiny
        # broadcast-side scoring patterns whitelisted above
        assert "BroadcastNestedLoopJoin" not in plan, name
