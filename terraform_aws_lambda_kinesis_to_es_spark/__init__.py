"""PySpark-native streaming-ETL engine.

A from-scratch re-expression of the capability surface of the reference
pipeline (baikonur-oss/terraform-aws-lambda-kinesis-to-es, a Lambda that
ships Kinesis JSON log records into Elasticsearch with S3 dead-letter
channels) as an idiomatic Spark engine:

* batch + Structured Streaming share one declarative transform chain
  (decode -> parse -> validate/route -> event-time daily bucketing),
* sinks are `foreachBatch` writers with per-action reject capture,
* on top, the large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference never had.

Everything is DataFrame/Catalyst-first; Python UDFs appear only on the
binary-decode slow path, and then as Arrow-batched pandas UDFs.
"""

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
