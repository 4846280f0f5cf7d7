"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-index routing query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared surface from
SURVEY.md §7.3 plus the training-data extensions (dedup, similarity
search, text analysis). Every declared query ships a DuckDB oracle —
as of round 3 the rows-only class is empty (the two former members,
q_centroid_sim and q_ann_ivf, were made value-checkable with
order-pinned folds and explicit tiebreaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from terraform_aws_lambda_kinesis_to_es_spark.plans import collect_surface

_QUERIES, _ORACLES = collect_surface()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-to-end hot path in batch form —
    validate -> route -> event-time daily index derivation -> per-index
    action and chunk accounting (reference lambda/main.py:96-147)."""
    return _QUERIES["q_chunk_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
