"""Quickstart: the LLM training-data pipeline surface end to end —
clean a corpus (dedup + quality + language), scan it for benchmark
contamination, cut a stratified mix, and pack it into token-budget bins.

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

    stages = (
        ("clean corpus (exact+near dedup, quality, langid)", "q_clean_corpus"),
        ("semantic dedup over embeddings", "q_semdedup"),
        ("contamination scan vs held-out eval set", "q_contamination"),
        ("repetition quality signals", "q_repetition"),
        ("stratified source downsample", "q_stratified_sample"),
        ("token-budget sequence packing", "q_pack_sequences"),
    )
    for label, name in stages:
        df = queries[name](spark, sf_dir)
        print(f"== {label} [{name}] ==")
        df.show(5, truncate=False)
        print(f"   rows: {df.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
