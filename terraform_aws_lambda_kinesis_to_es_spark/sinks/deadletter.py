"""Dead-letter sinks: gzipped NDJSON, two layouts, two time domains.

Reference semantics (SURVEY.md §0.2 "two time domains"):
* validation failures -> ``{log_type}/YYYY-MM/DD/`` partitioned by EVENT
  time (lambda/main.py:118-120, layout README.md:13) — written once (the
  reference writes twice, bug B3; we implement the intent);
* ES bulk rejects -> ``{prefix}/YYYY-MM/DD/YYYY-MM-DD-HH:MM:SS.gz`` keyed
  by PROCESSING time (main.py:163-172).

Spark shape: ``partitionBy`` on derived event-time columns gives the hive
layout with one pass and no driver involvement; the reject blob keeps the
reference's single-object-per-flush shape via coalesce(1) — rejects are
rare by construction, so the single writer is not a bottleneck (and at
scale you would drop the coalesce and accept many objects per flush).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig


def write_validation_failures(
    failed_df: DataFrame,
    cfg: PipelineConfig,
    base_path: str,
    *,
    type_col: str = "log_type",
    ts_col: str = "log_ts",
    payload_col: str = "payload",
) -> None:
    """Failed records as gzipped NDJSON under {log_type}/{Y-M}/{D}/.

    Records missing an event time bucket under the PROCESSING date —
    the reference formats ``datetime.now()`` when the time field failed
    to parse (implied by main.py:118-120 writing failed records whose
    ``time`` never became a datetime; bucketing must still be total).
    """
    ts = F.coalesce(F.col(ts_col), F.current_timestamp())
    (
        failed_df.select(
            F.col(payload_col).alias("value"),
            F.col(type_col).alias("log_type"),
            F.date_format(ts, "yyyy-MM").alias("y_m"),
            F.date_format(ts, "dd").alias("d"),
        )
        .write.mode("append")
        .partitionBy("log_type", "y_m", "d")
        .option("compression", "gzip")
        .text(base_path)
    )


def read_dead_letters(spark: SparkSession, base_path: str) -> DataFrame:
    """Read the validation-failure layout back: (payload, log_type, y_m, d).

    The reference leaves dead letters as opaque S3 objects; re-ingest is a
    manual download. Here the hive layout written by
    :func:`write_validation_failures` is directly a partitioned text
    table, so partition pruning applies to any (log_type, y_m, d) filter —
    replaying one bad day touches only that directory. The ``d`` partition
    value is re-padded to two digits (partition-type inference reads "07"
    as the int 7)."""
    df = spark.read.text(base_path)
    return df.select(
        F.col("value").alias("payload"),
        F.col("log_type").cast("string").alias("log_type"),
        F.col("y_m").cast("string").alias("y_m"),
        F.lpad(F.col("d").cast("string"), 2, "0").alias("d"),
    )


def replay_dead_letters(
    spark: SparkSession, base_path: str, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """Re-run dead-lettered payloads through the contract pipeline under a
    (presumably fixed) config: returns (valid, still_failed). This closes
    the reference's operational loop — its README leaves S3 re-ingest to
    the operator; here the replay is the same parse/validate plan the live
    stream runs, so a config fix (e.g. corrected field names) immediately
    reclassifies old failures."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.routing import (
        split_valid_failed,
        with_validation,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.decode import (
        parse_json_contract,
    )

    raw = read_dead_letters(spark, base_path).select("payload")
    parsed = parse_json_contract(raw, cfg)
    flagged = with_validation(parsed, cfg, type_col="log_type", ts_col="log_ts")
    return split_valid_failed(flagged)


def write_es_rejects(
    rejects_df: DataFrame,
    cfg: PipelineConfig,
    base_path: str,
    *,
    now: datetime | None = None,
) -> str:
    """ES bulk rejects as one gzipped NDJSON object keyed by processing
    time: {prefix}/YYYY-MM/DD/YYYY-MM-DD-HH:MM:SS.gz (main.py:163-172).
    Returns the directory written (Spark writes a directory; the single
    part file inside is the reference's single S3 object)."""
    now = now or datetime.now()
    key = (
        f"{cfg.failed_log_prefix}/{now:%Y-%m}/{now:%d}/{now:%Y-%m-%d-%H:%M:%S}"
    )
    path = f"{base_path}/{key}"
    (
        rejects_df.select(F.col("_source").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(path)
    )
    return path
