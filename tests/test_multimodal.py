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


def test_frame_sampling_explosion(spark):
    # 600 bytes -> chunks of 64 at 0,64,...,576; sampled every 4th:
    # starts 0, 256, 512 -> sizes 64, 64, 64; plus a short doc (1 frame)
    df = spark.createDataFrame(
        [(1, "a" * 600), (2, "b" * 10)], "doc_id long, text string"
    )
    rows = M.sample_frame_features(M.attach_payload(df)).collect()
    got = {(r.doc_id, r.frame_idx): r.n_bytes for r in rows}
    assert got == {(1, 0): 64, (1, 1): 64, (1, 2): 64, (2, 0): 10}


def test_fake_decode_frame_content():
    payload = bytes(range(256)) * 3  # 768 bytes
    frames = M.fake_decode_frames(payload)
    # every 4th 64-byte chunk: offsets 0, 256, 512
    assert frames == [payload[0:64], payload[256:320], payload[512:576]]
