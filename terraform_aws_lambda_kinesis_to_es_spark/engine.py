"""User-facing engine facade.

A user of the reference deploys a Terraform module whose variables become
Lambda env vars; here the same knobs construct a :class:`Pipeline` that
exposes the reference's full capability surface in both batch (replay /
backfill) and streaming mode, plus the engine's analytics operators.

    from terraform_aws_lambda_kinesis_to_es_spark import PipelineConfig
    from terraform_aws_lambda_kinesis_to_es_spark.engine import Pipeline

    pipe = Pipeline(PipelineConfig(index_name_prefix="logs",
                                   log_type_whitelist=frozenset({"app"})))
    actions = pipe.to_es_actions(pipe.transform_batch(raw_df))   # batch
    query = pipe.start(spark, src, "data string", client_factory,
                       dlq_base, checkpoint)                      # stream
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.sinks import es
from terraform_aws_lambda_kinesis_to_es_spark.streaming import pipeline as streaming_pipeline


@dataclass(frozen=True)
class Pipeline:
    cfg: PipelineConfig

    @classmethod
    def from_env(cls, env: dict[str, str]) -> "Pipeline":
        """Reference-style construction from env-var names (main.py:33-48)."""
        return cls(PipelineConfig.from_env_style(env))

    def configure_session(self, spark: SparkSession) -> None:
        """Apply session-level knobs (timezone — reference TZ, main.tf:43)."""
        spark.conf.set("spark.sql.session.timeZone", self.cfg.timezone)

    # -- batch surface ----------------------------------------------------
    def transform_batch(self, raw: DataFrame, data_col: str = "data") -> DataFrame:
        """decode -> parse -> validate -> whitelist -> route -> index name;
        identical logic to the streaming path (shared transform chain)."""
        return streaming_pipeline.transform_records(raw, self.cfg, data_col)

    def split(self, transformed: DataFrame) -> tuple[DataFrame, DataFrame]:
        valid = transformed.filter(F.col("is_valid"))
        failed = transformed.filter(~F.col("is_valid"))
        return valid, failed

    def to_es_actions(self, valid: DataFrame) -> DataFrame:
        """Bulk-action shape with the verbatim record as _source
        (reference main.py:116); with ``use_log_id_as_doc_id`` the log_id
        becomes the document _id (effectively-once upsert extension)."""
        cols = [
            F.col("index_name").alias("_index"),
            F.lit("_doc").alias("_type"),
            F.col("payload").alias("_source"),
        ]
        if self.cfg.use_log_id_as_doc_id:
            cols.append(F.col("log_id").alias("_id"))
        return valid.select(*cols)

    def bulk_index(self, actions: DataFrame, client_factory) -> DataFrame:
        return es.bulk_index(actions, client_factory, self.cfg)

    # -- streaming surface ------------------------------------------------
    def etl(self, client_factory, dlq_base: str) -> streaming_pipeline.StreamingEtl:
        return streaming_pipeline.StreamingEtl(self.cfg, client_factory, dlq_base)

    def start(
        self,
        spark: SparkSession,
        source_dir: str,
        schema: str,
        client_factory,
        dlq_base: str,
        checkpoint_dir: str,
        **kw,
    ):
        self.configure_session(spark)
        return streaming_pipeline.start_stream(
            spark, source_dir, schema, self.etl(client_factory, dlq_base), checkpoint_dir, **kw
        )
