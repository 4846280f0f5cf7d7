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
    for mod in (
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
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    if missing:
        raise RuntimeError(f"oracle without query: {missing}")
    return queries, oracles
