"""Permissive timestamp-parse ladder (P1): the documented formats must
parse; garbage must yield NULL (feeding the failed route, never raising)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators.routing import parse_timestamp

CASES = [
    ("2024-03-01T10:00:00Z", "2024-03-01 10:00:00"),
    ("2024-03-01T10:00:00.123Z", "2024-03-01 10:00:00"),
    ("2024-03-01 10:00:00", "2024-03-01 10:00:00"),
    ("2024-03-01T10:00:00+09:00", "2024-03-01 01:00:00"),  # UTC session
    ("2024/03/01 10:00:00", "2024-03-01 10:00:00"),
    ("01/Mar/2024:10:00:00 +0000", "2024-03-01 10:00:00"),  # CLF
    ("20240301T100000Z", "2024-03-01 10:00:00"),
    ("03/01/2024 10:00:00", "2024-03-01 10:00:00"),  # US
    ("not-a-timestamp", None),
    ("", None),
    ("2024-13-45", None),
]


def test_parse_ladder(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "raw string")
    out = df.select(
        "raw", F.date_format(parse_timestamp(F.col("raw")), "yyyy-MM-dd HH:mm:ss").alias("p")
    ).collect()
    got = {r.raw: r.p for r in out}
    for raw, expect in CASES:
        assert got[raw] == expect, (raw, got[raw])


def test_whitelist_does_not_swallow_invalid_records(spark, tmp_path):
    """Records failing validation bypass the whitelist into the dead
    letter (the whitelist silently drops only VALID records, README.md:76
    + the documented DLQ contract README.md:11)."""
    import base64
    import json

    from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
    from terraform_aws_lambda_kinesis_to_es_spark.streaming.pipeline import transform_records

    recs = [
        {"log_type": "spam", "time": "2024-03-01T10:00:00Z", "log_id": "1"},  # valid, not whitelisted
        {"time": "2024-03-01T10:00:00Z", "log_id": "2"},  # invalid: no type
    ]
    df = spark.createDataFrame(
        [(base64.b64encode(json.dumps(r).encode()).decode(),) for r in recs],
        "data string",
    )
    cfg = PipelineConfig(log_type_whitelist=frozenset({"app"}))
    out = transform_records(df, cfg).collect()
    assert len(out) == 1  # 'spam' silently dropped
    assert out[0].is_valid is False and out[0].log_type == "unknown"


DATEUTIL_ONLY = [
    ("March 5, 2024 10:00:00", "2024-03-05 10:00:00"),
    ("5 Mar 2024 10:00", "2024-03-05 10:00:00"),
    ("Tue, 05 Mar 2024 10:00:00 GMT", "2024-03-05 10:00:00"),
]


def test_dateutil_path_superset_of_ladder(spark):
    """The flag-gated dateutil parser must handle the ladder formats that
    are in dateutil's contract AND the wild formats only dateutil accepts
    (the reference's actual contract is exactly dateutil, README.md:14);
    garbage still yields NULL. Apache CLF is the one ladder format
    dateutil itself rejects — the ladder is deliberately wider there."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.routing import (
        parse_timestamp_dateutil,
    )

    cases = [c for c in CASES if "Mar/2024" not in c[0]] + DATEUTIL_ONLY
    df = spark.createDataFrame([(s,) for s, _ in cases], "raw string")
    out = df.select(
        "raw",
        F.date_format(parse_timestamp_dateutil(F.col("raw")), "yyyy-MM-dd HH:mm:ss").alias("p"),
    ).collect()
    got = {r.raw: r.p for r in out}
    for raw, expect in cases:
        assert got[raw] == expect, (raw, got[raw])


def test_contract_uses_configured_parser(spark):
    """parse_json_contract honors timestamp_parser='dateutil': a payload
    timestamp only dateutil can read validates instead of dead-lettering."""
    from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
    from terraform_aws_lambda_kinesis_to_es_spark.sources.decode import parse_json_contract

    payload = '{"log_type": "app", "time": "March 5, 2024 10:00:00", "log_id": "x1"}'
    df = spark.createDataFrame([(payload,)], "payload string")
    ladder = parse_json_contract(df, PipelineConfig()).collect()[0]
    assert ladder.log_ts is None
    dateutil_row = parse_json_contract(
        df, PipelineConfig(timestamp_parser="dateutil")
    ).collect()[0]
    assert str(dateutil_row.log_ts) == "2024-03-05 10:00:00"


def test_events_ts_normalized_regardless_of_parquet_writer(spark, tmp_path):
    """The driver's events.parquet has arrived as TIMESTAMP(NANOS)-as-long
    in one round and TIMESTAMP_NTZ in another; load() must hand every
    consumer plain session-TZ TIMESTAMP either way (NTZ broke
    q_sessionize/q_funnel in round 1: Spark 4 refuses NTZ in CAST-to-
    BIGINT and unix_micros)."""
    import datetime

    from pyspark.sql import types as T

    from terraform_aws_lambda_kinesis_to_es_spark.sources import tables

    wall = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    ntz_df = spark.createDataFrame(
        [(1, wall)],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
            ]
        ),
    )
    ntz_dir = str(tmp_path / "ntz")
    ntz_df.write.parquet(f"{ntz_dir}/events.parquet")
    loaded = tables.load(spark, ntz_dir, "events")
    assert isinstance(loaded.schema["ts"].dataType, T.TimestampType)
    row = loaded.select(
        F.col("ts").cast("long").alias("epoch"),
        F.unix_micros("ts").alias("us"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("wall"),
    ).collect()[0]
    # wall clock preserved exactly (UTC session), NTZ-illegal exprs now legal
    assert row.wall == "2024-03-01 12:30:45"
    assert row.us == row.epoch * 1_000_000 + 123456


def test_config_rejects_unknown_parser():
    import pytest as _pytest

    from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig

    with _pytest.raises(ValueError):
        PipelineConfig(timestamp_parser="magic")
