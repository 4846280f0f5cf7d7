"""Decode-stage tests: every envelope variant from FIXTURES.md §A must
yield the same logical records the reference's parser produces
(reference lambda/main.py:89, README.md:10)."""

from __future__ import annotations

import base64
import gzip
import json

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.functions import kpl
from terraform_aws_lambda_kinesis_to_es_spark.sources import decode

CFG = PipelineConfig()

RECORD = {"log_type": "app", "time": "2024-03-01T10:00:00Z", "log_id": "u1", "k": 1}


def b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def cwl_envelope(messages: list[str], message_type: str = "DATA_MESSAGE") -> bytes:
    env = {
        "messageType": message_type,
        "owner": "123",
        "logGroup": "g",
        "logStream": "s",
        "subscriptionFilters": ["f"],
        "logEvents": [
            {"id": str(i), "timestamp": 1700000000000 + i, "message": m}
            for i, m in enumerate(messages)
        ],
    }
    return gzip.compress(json.dumps(env).encode())


def _decode(spark, datas: list[str]) -> list[str]:
    df = spark.createDataFrame([(d,) for d in datas], "data string")
    return [r.payload for r in decode.decode_records(df).select("payload").collect()]


def test_plain_json(spark):
    out = _decode(spark, [b64(json.dumps(RECORD).encode())])
    assert json.loads(out[0]) == RECORD


def test_gzip_payload(spark):
    out = _decode(spark, [b64(gzip.compress(json.dumps(RECORD).encode()))])
    assert json.loads(out[0]) == RECORD


def test_cwl_envelope_explodes_messages(spark):
    msgs = [json.dumps({**RECORD, "log_id": f"id{i}"}) for i in range(3)]
    out = _decode(spark, [b64(cwl_envelope(msgs))])
    assert sorted(json.loads(p)["log_id"] for p in out) == ["id0", "id1", "id2"]


def test_cwl_control_message_dropped(spark):
    out = _decode(spark, [b64(cwl_envelope(["ignored"], "CONTROL_MESSAGE"))])
    assert out == []


def test_kpl_aggregate_deaggregates(spark):
    recs = [json.dumps({**RECORD, "log_id": f"k{i}"}).encode() for i in range(4)]
    out = _decode(spark, [b64(kpl.encode_aggregate(recs))])
    assert sorted(json.loads(p)["log_id"] for p in out) == ["k0", "k1", "k2", "k3"]


def test_kpl_aggregate_of_gzipped_records(spark):
    recs = [gzip.compress(json.dumps({**RECORD, "log_id": f"g{i}"}).encode()) for i in range(2)]
    out = _decode(spark, [b64(kpl.encode_aggregate(recs))])
    assert sorted(json.loads(p)["log_id"] for p in out) == ["g0", "g1"]


def test_undecodable_binary_dropped(spark):
    out = _decode(spark, [b64(b"\x00\xff\xfe garbage \x80")])
    assert out == []


def test_kpl_roundtrip_unit():
    payloads = [b"a", b"hello world", json.dumps(RECORD).encode(), b""]
    assert kpl.decode_aggregate(kpl.encode_aggregate(payloads)) == payloads


def test_kpl_checksum_rejected():
    blob = bytearray(kpl.encode_aggregate([b"x"]))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError):
        kpl.decode_aggregate(bytes(blob))


def test_non_json_payload_silently_dropped(spark):
    df = spark.createDataFrame(
        [(b64(b"plain text, not json"),), (b64(json.dumps(RECORD).encode()),)],
        "data string",
    )
    out = decode.parse_json_contract(decode.decode_records(df), CFG)
    rows = out.collect()
    assert len(rows) == 1  # non-JSON dropped silently (main.py:92-94)
    assert rows[0].log_type == "app"


def test_contract_fields_extracted(spark):
    df = spark.createDataFrame([(b64(json.dumps(RECORD).encode()),)], "data string")
    row = decode.parse_json_contract(decode.decode_records(df), CFG).collect()[0]
    assert row.log_type == "app" and row.log_id == "u1"
    assert row.log_ts is not None and row.log_ts.year == 2024


def test_configurable_field_names(spark):
    cfg = PipelineConfig(log_type_field="kind", log_timestamp_field="at", log_id_field="uid")
    rec = {"kind": "x", "at": "2024-01-05 00:00:00", "uid": "9"}
    df = spark.createDataFrame([(b64(json.dumps(rec).encode()),)], "data string")
    row = decode.parse_json_contract(decode.decode_records(df), cfg).collect()[0]
    assert (row.log_type, row.log_id) == ("x", "9")
