"""Quickstart: the LLM training-data pipeline surface end to end —
clean a corpus (dedup + quality + language), scan it for benchmark
contamination, cut a stratified mix, pack it into token-budget bins,
and export the result as deterministic training shards.

    python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.plans import collect_surface


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-data-pipeline")
    queries, _ = collect_surface()
    # corpus-tranche ops join the demo from their promoted module
    # (the round-6 curation tranche graduated into collect_surface in
    # round 7; corpus_queries was promoted in round 8)
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        QUERIES,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
        QUERIES as R9_QUERIES,
    )

    queries = {**queries, **QUERIES, **R9_QUERIES}

    stages = (
        ("URL canonicalization dedup key (corpus tranche)", "q_url_canonical"),
        ("crawl-frontier politeness schedule (staged r9)", "q_crawl_frontier"),
        ("snapshot delta vs last crawl (staged r9)", "q_snapshot_delta"),
        ("code/prose modality gate (staged r9)", "q_code_detect"),
        ("clean corpus (exact+near dedup, quality, langid)", "q_clean_corpus"),
        ("ExactSubstr duplicated-span removal", "q_substring_strip"),
        ("per-domain document capping", "q_domain_cap"),
        ("model-based quality gate (corpus tranche)", "q_linear_quality"),
        ("quality-score calibration audit (staged r9)", "q_score_calibration"),
        ("semantic dedup over embeddings", "q_semdedup"),
        ("contamination scan vs held-out eval set", "q_contamination"),
        ("repetition quality signals", "q_repetition"),
        ("source divergence matrix (staged r9)", "q_js_divergence"),
        ("stratified source downsample", "q_stratified_sample"),
        ("weighted sample w/o replacement (corpus tranche)", "q_weighted_reservoir"),
        ("split stratification audit (staged r9)", "q_split_balance"),
        ("WRR epoch ordering (staged r9)", "q_epoch_schedule"),
        ("token-budget sequence packing", "q_pack_sequences"),
    )
    for label, name in stages:
        df = queries[name](spark, sf_dir)
        print(f"== {label} [{name}] ==")
        df.show(5, truncate=False)
        print(f"   rows: {df.count()}")

    # final mile: lay the cleaned corpus down as training shards —
    # stable shard membership, reproducible epoch order, bounded files
    import tempfile

    from terraform_aws_lambda_kinesis_to_es_spark.sinks.dataset import (
        read_training_shards,
        write_training_shards,
    )

    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        write_training_shards(
            queries["q_clean_corpus"](spark, sf_dir),
            out,
            "doc_id",
            n_shards=4,
            records_per_file=100,
            order_seed="epoch-0",
        )
        back = read_training_shards(spark, out)
        print("== training-shard export [sinks/dataset.py] ==")
        back.groupBy("shard_id").count().orderBy("shard_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
