"""Stream-record decode stages: base64 -> [KPL deagg] -> [gzip] ->
[CloudWatch Logs envelope] -> JSON payload strings.

Reference behavior (lambda/main.py:89 via amazon_kinesis_utils; contract at
README.md:10): each Kinesis record's data may be plain JSON text, gzipped,
a CloudWatch Logs subscription envelope (gzipped JSON with ``logEvents``),
or a KPL protobuf aggregate of user records; non-JSON payloads are later
dropped silently (main.py:91-94).

Division of labor, per the "UDFs are the slow path" rule:
* base64 decode is JVM-side (``unbase64``);
* gzip + KPL need Python — ONE Arrow-batched pandas UDF handles both in a
  single pass over the binary column (bytes -> list of payload strings),
  isolated before any relational logic;
* the CloudWatch envelope is pure JSON — handled relationally with
  ``from_json`` + ``explode`` (no Python);
* the final JSON-contract parse is ``get_json_object`` / ``from_json``.

At scale the pandas UDF stage is map-only and Arrow-vectorized; everything
downstream is Catalyst expressions with full codegen.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.functions import kpl
from terraform_aws_lambda_kinesis_to_es_spark.operators.routing import parse_timestamp

# CloudWatch Logs subscription-filter envelope (README.md:10; public CWL
# subscription format).
CWL_SCHEMA = T.StructType(
    [
        T.StructField("messageType", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("logGroup", T.StringType()),
        T.StructField("logStream", T.StringType()),
        T.StructField("subscriptionFilters", T.ArrayType(T.StringType())),
        T.StructField(
            "logEvents",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _expand_one(blob: bytes | None) -> list[str]:
    """bytes -> payload strings: KPL deagg (recursively gunzipping each
    user record), else gunzip, else raw; undecodable -> empty list."""
    if blob is None:
        return []
    out: list[str] = []
    try:
        parts = kpl.decode_aggregate(blob) if kpl.is_aggregate(blob) else [blob]
    except ValueError:
        parts = [blob]
    for part in parts:
        if part[:2] == b"\x1f\x8b":  # gzip magic
            try:
                part = gzip.decompress(part)
            except OSError:
                continue
        try:
            out.append(part.decode("utf-8"))
        except UnicodeDecodeError:
            continue
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def expand_payloads(data: pd.Series) -> pd.Series:
    """Arrow-batched: binary blob -> list of UTF-8 payload strings."""
    return data.map(_expand_one)


def decode_records(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Kinesis-style records -> one row per logical payload string.

    ``data_col`` may be a base64 string column (Kinesis event JSON shape,
    reference main.py:69) or already-binary. Output column: ``payload``.
    """
    col = df.schema[data_col].dataType
    raw: Column
    if isinstance(col, T.StringType):
        raw = F.unbase64(F.col(data_col))  # S2, JVM-side
    else:
        raw = F.col(data_col)
    exploded = df.withColumn("_payloads", expand_payloads(raw)).withColumn(
        "payload", F.explode("_payloads")
    )
    return unwrap_cloudwatch(exploded.drop("_payloads"))


def unwrap_cloudwatch(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """CloudWatch Logs envelope unwrap (S5), fully relational:
    DATA_MESSAGE -> one row per logEvents[i].message; CONTROL_MESSAGE ->
    dropped; non-envelope payloads pass through unchanged."""
    parsed = df.withColumn("_cwl", F.from_json(F.col(payload_col), CWL_SCHEMA))
    is_envelope = F.col("_cwl.messageType").isNotNull() & F.col("_cwl.logEvents").isNotNull()
    # Split relationally: envelope rows explode, the rest pass through.
    parsed = parsed.withColumn("_is_env", F.coalesce(is_envelope, F.lit(False)))
    plain = parsed.filter(~F.col("_is_env")).drop("_cwl", "_is_env")
    data_msgs = (
        parsed.filter(F.col("_is_env") & (F.col("_cwl.messageType") == "DATA_MESSAGE"))
        .withColumn("_evt", F.explode("_cwl.logEvents"))
        .withColumn(payload_col, F.col("_evt.message"))
        .drop("_cwl", "_is_env", "_evt")
    )
    return plain.unionByName(data_msgs)


def parse_json_contract(
    df: DataFrame, cfg: PipelineConfig, payload_col: str = "payload"
) -> DataFrame:
    """Schema-on-read contract extraction (S6 + F1 inputs): parse the
    payload as JSON; non-JSON rows are dropped SILENTLY (reference
    main.py:91-94 — only field-validation failures dead-letter, not parse
    failures). Extracts the three contract fields, keeps the raw payload
    string for opaque passthrough to the sink (main.py:116)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.routing import (
        timestamp_parser_for,
    )

    ts_parse = timestamp_parser_for(cfg)
    is_json = F.try_parse_json(F.col(payload_col)).isNotNull()
    out = df.filter(is_json)
    return (
        out.withColumn("log_type", F.get_json_object(F.col(payload_col), f"$.{cfg.log_type_field}"))
        .withColumn(
            "log_ts",
            ts_parse(F.get_json_object(F.col(payload_col), f"$.{cfg.log_timestamp_field}")),
        )
        .withColumn("log_id", F.get_json_object(F.col(payload_col), f"$.{cfg.log_id_field}"))
    )
