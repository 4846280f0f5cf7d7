"""Quickstart: the streaming pipeline end-to-end — staged file source
(Kinesis stand-in), foreachBatch ES sink with reject capture, gzipped
NDJSON dead letters.

    python examples/quickstart_streaming.py
"""

from __future__ import annotations

import base64
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark import PipelineConfig, get_spark
from terraform_aws_lambda_kinesis_to_es_spark.engine import Pipeline
from terraform_aws_lambda_kinesis_to_es_spark.sinks.es import FileSystemElasticsearch


def main() -> None:
    spark = get_spark("quickstart-stream")
    work = tempfile.mkdtemp(prefix="quickstart_")
    src, esdir = f"{work}/src", f"{work}/es"
    os.makedirs(src)

    records = [
        {"log_type": "app", "time": "2024-03-01T10:00:00Z", "log_id": f"id{i}"}
        for i in range(5)
    ] + [{"log_id": "bad", "time": "2024-03-01T10:00:00Z"}]
    with open(f"{src}/batch.json", "w") as f:
        for r in records:
            f.write(json.dumps({"data": base64.b64encode(json.dumps(r).encode()).decode()}) + "\n")

    from terraform_aws_lambda_kinesis_to_es_spark.streaming.pipeline import start_stream

    pipe = Pipeline(PipelineConfig(index_name_prefix="logs", use_log_id_as_doc_id=True))
    etl = pipe.etl(lambda: FileSystemElasticsearch(esdir), f"{work}/dlq")
    query = start_stream(spark, src, "data string", etl, f"{work}/ckpt")
    query.awaitTermination(120)

    indexed = FileSystemElasticsearch.read_indexed(esdir)
    print("indexed:", {k: len(v) for k, v in indexed.items()})
    print("dead letters:", glob.glob(f"{work}/dlq/**/*.gz", recursive=True))
    print("batch history:", [(h.epoch_id, h.n_valid, h.n_failed) for h in etl.history])
    spark.stop()


if __name__ == "__main__":
    main()
