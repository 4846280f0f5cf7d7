"""Kinesis streaming source configuration (S1).

The reference binds a Lambda event-source mapping to the stream with
``batch_size`` and ``starting_position`` (reference main.tf:58-64,
variables.tf:16-18,54-57). With Structured Streaming the same contract is
a ``readStream`` source; the Spark Kinesis connector (e.g. the
spark-sql-kinesis package) is not bundled in this environment, so this
module only *builds* the configured reader — the file source in
``streaming.pipeline.start_stream`` is the swap-in stand-in used by tests
(identical downstream plan either way; that is the point of the shared
transform chain)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig

# reference starting_position values map 1:1 (variables.tf:54-57)
_POSITIONS = {"TRIM_HORIZON": "trim_horizon", "LATEST": "latest"}


def kinesis_reader(
    spark: SparkSession,
    stream_name: str,
    region: str,
    cfg: PipelineConfig,
    *,
    endpoint_url: str | None = None,
    starting_position: str = "TRIM_HORIZON",
) -> DataStreamReader:
    """Configured (unloaded) Kinesis reader. Call ``.load()`` where the
    connector jar is on the classpath. ``batch_size`` maps to the
    per-fetch record cap (the trigger interval completes the reference's
    one-invocation-per-batch semantics)."""
    if starting_position not in _POSITIONS:
        raise ValueError(f"starting_position must be one of {sorted(_POSITIONS)}")
    reader = (
        spark.readStream.format("kinesis")
        .option("streamName", stream_name)
        .option("region", region)
        .option("startingPosition", _POSITIONS[starting_position])
        .option("maxFetchRecordsPerShard", str(cfg.batch_size))
    )
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    return reader
