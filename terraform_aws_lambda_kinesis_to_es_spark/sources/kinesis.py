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


def kinesis_options(
    stream_name: str,
    region: str,
    cfg: PipelineConfig,
    *,
    endpoint_url: str | None = None,
    starting_position: str = "TRIM_HORIZON",
) -> dict[str, str]:
    """The exact connector option map, as a pure function so the spelling
    contract is testable without the (sandbox-absent) connector jar.
    Option names follow the public spark-sql-kinesis connector docs:
    ``streamName``, ``region``, ``endpointUrl``, ``startingPosition``
    (lowercase values ``trim_horizon``/``latest``), and
    ``maxFetchRecordsPerShard`` for the per-fetch cap (reference
    ``batch_size``, main.tf:58-64). tests/test_config_routing.py pins this
    map verbatim so it cannot drift silently."""
    if starting_position not in _POSITIONS:
        raise ValueError(f"starting_position must be one of {sorted(_POSITIONS)}")
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": _POSITIONS[starting_position],
        "maxFetchRecordsPerShard": str(cfg.batch_size),
    }
    if endpoint_url:
        opts["endpointUrl"] = endpoint_url
    return opts


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
    reader = spark.readStream.format("kinesis")
    for k, v in kinesis_options(
        stream_name,
        region,
        cfg,
        endpoint_url=endpoint_url,
        starting_position=starting_position,
    ).items():
        reader = reader.option(k, v)
    return reader
