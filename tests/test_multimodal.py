from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M


def test_payload_roundtrip_and_features(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100)], "doc_id long, text string"
    )
    feats = {r.doc_id: r for r in M.extract_features(M.attach_payload(df)).collect()}
    assert feats[1].n_bytes == 11
    assert feats[1].head_md5 == hashlib.md5(b"hello world").hexdigest()
    assert feats[2].n_bytes == 100
    assert feats[2].head_md5 == hashlib.md5(b"x" * 16).hexdigest()
    assert feats[1].media_type == "text/plain"


def test_metadata_struct(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    row = M.attach_payload(df, media_type="image/png").select("media_meta").collect()[0]
    assert row.media_meta.format == "image/png" and row.media_meta.n_chars == 3


def test_decode_stubs_are_gated():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"RIFF")
    with pytest.raises(NotImplementedError):
        M.sample_frames(b"\x00")


def test_binary_column_type(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    schema = M.attach_payload(df).schema
    assert schema["payload"].dataType.typeName() == "binary"
