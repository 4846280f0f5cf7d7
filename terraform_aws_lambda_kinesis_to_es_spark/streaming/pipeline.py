"""The end-to-end streaming pipeline: the reference's Lambda, Spark-style.

One declarative transform chain shared by batch and streaming (the
DataFrame API is identical); the streaming entry wraps it in
``readStream -> foreachBatch`` with checkpointing, which reproduces the
reference's delivery model exactly:

* micro-batch = one ``foreachBatch`` call (reference: one Lambda
  invocation, main.tf:58-64); trigger/maxFilesPerTrigger caps batch size
  (reference ``batch_size``);
* at-least-once: checkpointed source offsets + retried batches (reference:
  Kinesis event-source-mapping retries, SURVEY.md T3);
* event-time daily index routing, NO watermark — late data lands in old
  indices forever (SURVEY.md T4/T5), the pipeline is stateless;
* per-batch: valid records -> chunked ES bulk with reject capture; reject
  + validation dead letters -> gzipped NDJSON (two time domains).

The Kinesis connector is a config swap (``format("kinesis")``); tests use
the file source as the stream stand-in (SURVEY.md §7.2 Phase 3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.operators import routing
from terraform_aws_lambda_kinesis_to_es_spark.sinks import deadletter, es
from terraform_aws_lambda_kinesis_to_es_spark.sources import decode


def transform_records(raw: DataFrame, cfg: PipelineConfig, data_col: str = "data") -> DataFrame:
    """The full record transform: decode -> parse -> validate -> whitelist
    -> unknown-routing -> index naming. Pure narrow ops + one pandas-UDF
    decode stage; identical in batch and streaming."""
    payloads = decode.decode_records(raw, data_col)
    parsed = decode.parse_json_contract(payloads, cfg)
    validated = parsed.withColumn(
        "is_valid", F.col("log_type").isNotNull() & F.col("log_ts").isNotNull()
    )
    # Whitelist: silent drop of non-whitelisted VALID records (reference
    # main.py:104 — failed records bypass the whitelist into dead-letter).
    if cfg.log_type_whitelist:
        validated = validated.filter(
            ~F.col("is_valid") | F.col("log_type").isin(*sorted(cfg.log_type_whitelist))
        )
    routed = validated.withColumn(
        "log_type", F.coalesce(F.col("log_type"), F.lit(cfg.log_type_unknown_prefix))
    )
    return routing.with_index_name(routed, cfg, type_col="log_type", ts_col="log_ts")


@dataclass
class BatchResult:
    """Observability accounting for one micro-batch (reference X-Ray
    annotations total_actions/chunk_number, main.py:122-140)."""

    epoch_id: int
    n_valid: int = 0
    n_failed: int = 0
    n_rejected: int = 0


@dataclass
class StreamingEtl:
    """foreachBatch orchestrator. ``client_factory`` builds the bulk
    client on executors (pluggable: in-memory stub or real HTTPS+SigV4)."""

    cfg: PipelineConfig
    client_factory: object
    dlq_base: str
    history: list = field(default_factory=list)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> BatchResult:
        res = BatchResult(epoch_id)
        if batch_df.isEmpty():  # reference "Nothing to flush" (main.py:157-158)
            self.history.append(res)
            return res
        transformed = transform_records(batch_df, self.cfg).persist()
        valid = transformed.filter(F.col("is_valid"))
        failed = transformed.filter(~F.col("is_valid"))

        # _source is the whole original record, not a re-serialized
        # projection (reference main.py:116): pass the raw payload through.
        action_cols = [
            F.col("index_name").alias("_index"),
            F.lit("_doc").alias("_type"),
            F.col("payload").alias("_source"),
        ]
        if self.cfg.use_log_id_as_doc_id:
            # effectively-once extension: retried batches upsert (T3)
            action_cols.append(F.col("log_id").alias("_id"))
        actions = valid.select(*action_cols)
        rejects = es.bulk_index(actions, self.client_factory, self.cfg).persist()

        res.n_valid = valid.count()
        res.n_failed = failed.count()
        res.n_rejected = rejects.count()

        if res.n_failed:
            deadletter.write_validation_failures(
                failed, self.cfg, f"{self.dlq_base}/validation"
            )
        if res.n_rejected:
            deadletter.write_es_rejects(rejects, self.cfg, f"{self.dlq_base}/rejects")
        transformed.unpersist()
        rejects.unpersist()
        self.history.append(res)
        return res


def start_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    etl: StreamingEtl,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """File-source streaming entry (Kinesis stand-in). ``schema`` is the
    DDL of the staged records (e.g. ``data string``)."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger or 10)
        .json(source_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(etl.process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
