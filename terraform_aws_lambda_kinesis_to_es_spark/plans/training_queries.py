"""Training-data pipeline operations beyond dedup/similarity: splits,
token budgeting, and source mixing — the bread-and-butter ops of
assembling a training mix at 100 TB, each deterministic and oracle-checked.

* ``q_hash_split``: hash-based train/val/test assignment. NOT sampling —
  a content-stable hash split is reproducible across runs, cluster sizes,
  and partitionings, which `df.sample()` is not. Portable md5-based hash.
* ``q_token_budget``: greedy document packing to a token budget via a
  cumulative-sum window in a deterministic order (the "take docs until
  N tokens" selection used to cut a corpus to size).
* ``q_source_mix``: per-source share of documents/tokens in exact basis
  points — mixture-weight accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60, hash60_sql
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import _TOKS_RAW
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

TOKEN_BUDGET = 20_000


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split on hash60(doc_id) mod 100 — stable
    under repartitioning and re-runs (map-only, no shuffle)."""
    docs = load(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string")) % F.lit(100)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs selected in doc_id order until the running token count passes
    TOKEN_BUDGET (first crossing doc included). Single global-ordered
    cumsum window; at 100 TB the order key would be a hash for balance
    and the window a per-partition pass + prefix sums, same semantics."""
    docs = load(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    toks = F.size(tokens(F.col("text"))).cast("bigint")
    return (
        docs.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture accounting: per source, document and token counts plus the
    exact share in basis points (integer DIV against broadcast totals)."""
    docs = load(spark, sf_dir, "documents")
    per_source = docs.withColumn(
        "n_tokens", F.size(tokens(F.col("text"))).cast("bigint")
    ).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    totals = per_source.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("n_tokens").alias("tot_tokens")
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("CAST((10000 * n_docs) DIV tot_docs AS BIGINT)").alias("doc_share_bp"),
            F.expr("CAST((10000 * n_tokens) DIV tot_tokens AS BIGINT)").alias("token_share_bp"),
        )
    )


QUERIES = {
    "q_hash_split": q_hash_split,
    "q_token_budget": q_token_budget,
    "q_source_mix": q_source_mix,
}

_H = hash60_sql("CAST(doc_id AS VARCHAR)")

ORACLES = {
    "q_hash_split": f"""
        SELECT doc_id,
               ({_H}) % 100 AS bucket,
               CASE WHEN ({_H}) % 100 < 90 THEN 'train'
                    WHEN ({_H}) % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "q_token_budget": f"""
        WITH t AS (
          SELECT doc_id, CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens FROM documents
        ), c AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t
        )
        SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
    """,
    "q_source_mix": f"""
        WITH per_source AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len({_TOKS_RAW})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), totals AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
          FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               CAST((10000 * n_docs) // tot_docs AS BIGINT) AS doc_share_bp,
               CAST((10000 * n_tokens) // tot_tokens AS BIGINT) AS token_share_bp
        FROM per_source CROSS JOIN totals
    """,
}
