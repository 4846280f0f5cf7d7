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

from pyspark.sql import DataFrame
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
