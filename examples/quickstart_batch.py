"""Quickstart: batch replay of Kinesis-style records through the full
pipeline — what a user of the reference runs to backfill or audit.

    python examples/quickstart_batch.py
"""

from __future__ import annotations

import base64
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark import PipelineConfig, get_spark
from terraform_aws_lambda_kinesis_to_es_spark.engine import Pipeline
from terraform_aws_lambda_kinesis_to_es_spark.sinks.es import InMemoryElasticsearch


def main() -> None:
    spark = get_spark("quickstart-batch")
    # reference-style configuration (Terraform variables -> env vars)
    pipe = Pipeline.from_env(
        {
            "INDEX_NAME_PREFIX": "logs",
            "LOG_TYPE_FIELD": "log_type",
            "LOG_TIMESTAMP_FIELD": "time",
            "LOG_ID_FIELD": "log_id",
            "LOG_TYPE_WHITELIST": "",  # empty => all types (intended semantics)
        }
    )
    records = [
        {"log_type": "app", "time": "2024-03-01T10:00:00Z", "log_id": "a1", "msg": "hello"},
        {"log_type": "web", "time": "2024-03-02T09:30:00Z", "log_id": "w1", "path": "/"},
        {"time": "2024-03-01T10:00:00Z", "log_id": "x1"},  # missing type -> dead letter
    ]
    raw = spark.createDataFrame(
        [(base64.b64encode(json.dumps(r).encode()).decode(),) for r in records],
        "data string",
    )
    transformed = pipe.transform_batch(raw)
    valid, failed = pipe.split(transformed)

    print("valid routing:")
    valid.select("log_type", "index_name", "payload").show(truncate=False)
    print("failed (dead-letter bound):")
    failed.select("log_type", "payload").show(truncate=False)

    # direct (driver-side) bulk indexing demo with the in-memory double
    client = InMemoryElasticsearch()
    actions = [
        {"_index": r["_index"], "_type": "_doc", "_source": json.loads(r["_source"])}
        for r in pipe.to_es_actions(valid).collect()
    ]
    client.bulk(actions)
    print("indexed per index:", {k: len(v) for k, v in client.indexed.items()})
    spark.stop()


if __name__ == "__main__":
    main()
