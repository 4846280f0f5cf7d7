"""Multimodal query surface: the binary-payload / mapInPandas plumbing
verified against a relational oracle.

The oracle computes the same features directly in SQL (octet_length, md5
of the head) — valid because the fake payloads are UTF-8 text, so DuckDB's
VARCHAR md5/substring agree byte-for-byte with Spark's binary path for
this ASCII corpus. The Spark side still exercises the REAL multimodal
machinery (encode -> binary column -> Arrow batches -> pandas -> typed
schema); the oracle checks its output exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.extract_features(with_payload)


QUERIES = {"q_media_features": q_media_features}

ORACLES = {
    "q_media_features": """
        SELECT doc_id,
               'text/plain' AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               md5(substring(text, 1, 16)) AS head_md5
        FROM documents
    """,
}
