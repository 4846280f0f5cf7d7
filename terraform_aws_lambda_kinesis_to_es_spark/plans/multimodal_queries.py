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
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.extract_features(with_payload)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1->N row explosion through mapInPandas
    (every 4th 64-byte chunk of the payload stands in for a video frame —
    deterministic fake decode, real Arrow/schema/partitioning). The
    oracle derives each sampled frame's index and byte count
    arithmetically from the payload length."""
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.sample_frame_features(with_payload)


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payload through an Arrow-batched 1->1
    mapInPandas transform (every 4th byte stands in for the downsample —
    deterministic fake, real schema/batching). The oracle reconstructs
    the downsampled bytes character-wise (ASCII corpus ⇒ char == byte)."""
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.resize_features(with_payload)


QUERIES = {
    "q_media_features": q_media_features,
    "q_media_frames": q_media_frames,
    "q_media_resize": q_media_resize,
}

_STEP = M.FRAME_SIZE * M.FRAME_EVERY_N

ORACLES = {
    "q_media_resize": f"""
        WITH ds AS (
          SELECT doc_id, octet_length(text::BLOB) AS orig,
                 array_to_string(list_transform(
                   generate_series(1, length(text), {M.RESIZE_FACTOR}),
                   i -> text[i]), '') AS r
          FROM documents
        )
        SELECT doc_id,
               CAST(orig AS BIGINT) AS orig_bytes,
               CAST(length(r) AS BIGINT) AS resized_bytes,
               lower(hex(substring(r, 1, 8)::BLOB)) AS resized_head_hex
        FROM ds
    """,
    "q_media_features": """
        SELECT doc_id,
               'text/plain' AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               md5(substring(text, 1, 16)) AS head_md5
        FROM documents
    """,
    "q_media_frames": f"""
        WITH t AS (
          SELECT doc_id, octet_length(text::BLOB) AS total FROM documents
        ), k AS (
          SELECT doc_id, total,
                 unnest(generate_series(0, (total - 1) // {_STEP})) AS frame_idx
          FROM t
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(least({M.FRAME_SIZE}, total - frame_idx * {_STEP}) AS BIGINT) AS n_bytes
        FROM k
    """,
}
