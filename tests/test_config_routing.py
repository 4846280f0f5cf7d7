"""Config semantics + routing unit tests — the reference's intended
behavior, including the bug-fixed paths (SURVEY.md §0.1)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig, parse_whitelist
from terraform_aws_lambda_kinesis_to_es_spark.engine import Pipeline
from terraform_aws_lambda_kinesis_to_es_spark.operators import routing


def test_empty_whitelist_means_all_types():
    # intended semantics of reference README.md:76 (the reference's own
    # empty branch is dead code - bug B2): unset/empty => process ALL
    assert parse_whitelist(None) == frozenset()
    assert parse_whitelist("") == frozenset()
    assert parse_whitelist("a,b") == {"a", "b"}
    assert parse_whitelist(" a , b ,") == {"a", "b"}


def test_config_validation():
    with pytest.raises(ValueError):
        PipelineConfig(bulk_chunk_size=0)
    with pytest.raises(ValueError):
        PipelineConfig(batch_size=-1)
    with pytest.raises(ValueError):
        PipelineConfig(index_name_prefix="")


def test_from_env_style_mirrors_reference_names():
    cfg = PipelineConfig.from_env_style(
        {
            "LOG_TYPE_FIELD": "kind",
            "LOG_TIMESTAMP_FIELD": "at",
            "LOG_ID_FIELD": "uid",
            "LOG_TYPE_WHITELIST": "a,b",
            "INDEX_NAME_PREFIX": "px",
            "TZ": "Asia/Tokyo",
        }
    )
    assert cfg.log_type_field == "kind"
    assert cfg.log_type_whitelist == {"a", "b"}
    assert cfg.timezone == "Asia/Tokyo"


def test_whitelist_noop_when_empty(spark):
    df = spark.createDataFrame([("a",), ("b",)], "log_type string")
    cfg = PipelineConfig()
    assert routing.apply_whitelist(df, cfg).count() == 2


def test_index_name_timezone_sensitivity(spark):
    # event at 23:30 UTC on Mar 1 = Mar 2 in Tokyo: the daily index must
    # follow the configured timezone (reference TZ, SURVEY.md P8)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        df = spark.createDataFrame([("app",)], "log_type string").withColumn(
            "time", F.to_timestamp(F.lit("2024-03-01 23:30:00"))
        )
        cfg = PipelineConfig(index_name_prefix="logs", timezone="Asia/Tokyo")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_name = routing.with_index_name(df, cfg).collect()[0].index_name
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo_name = routing.with_index_name(df, cfg).collect()[0].index_name
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc_name == "logs-app-20240301"
    assert tokyo_name == "logs-app-20240302"


def test_pipeline_facade_batch_roundtrip(spark):
    pipe = Pipeline.from_env(
        {"INDEX_NAME_PREFIX": "logs", "LOG_TYPE_WHITELIST": "app"}
    )
    recs = [
        {"log_type": "app", "time": "2024-03-01T10:00:00Z", "log_id": "1"},
        {"log_type": "spam", "time": "2024-03-01T10:00:00Z", "log_id": "2"},
        {"time": "2024-03-01T10:00:00Z", "log_id": "3"},
    ]
    df = spark.createDataFrame(
        [(base64.b64encode(json.dumps(r).encode()).decode(),) for r in recs],
        "data string",
    )
    transformed = pipe.transform_batch(df)
    valid, failed = pipe.split(transformed)
    actions = pipe.to_es_actions(valid).collect()
    assert len(actions) == 1 and actions[0]._index == "logs-app-20240301"
    assert json.loads(actions[0]._source)["log_id"] == "1"  # verbatim passthrough
    failed_rows = failed.collect()
    assert len(failed_rows) == 1 and failed_rows[0].log_type == "unknown"


def test_kinesis_option_contract():
    """Pin the exact connector option map (S1/T2). The connector jar is
    absent in this sandbox, so the spelling contract — documented
    spark-sql-kinesis option names and lowercase position values — is the
    only guard against silent drift in the untestable path."""
    from terraform_aws_lambda_kinesis_to_es_spark.sources.kinesis import (
        kinesis_options,
    )

    cfg = PipelineConfig(index_name_prefix="logs", batch_size=100)
    assert kinesis_options("raw-logs", "ap-northeast-1", cfg) == {
        "streamName": "raw-logs",
        "region": "ap-northeast-1",
        "startingPosition": "trim_horizon",
        "maxFetchRecordsPerShard": "100",
    }
    assert kinesis_options(
        "raw-logs",
        "us-east-1",
        cfg,
        endpoint_url="https://kinesis.local:4566",
        starting_position="LATEST",
    ) == {
        "streamName": "raw-logs",
        "region": "us-east-1",
        "startingPosition": "latest",
        "maxFetchRecordsPerShard": "100",
        "endpointUrl": "https://kinesis.local:4566",
    }
    with pytest.raises(ValueError, match="starting_position"):
        kinesis_options("raw-logs", "us-east-1", cfg, starting_position="AT_TIMESTAMP")
