"""Streaming-path throughput benchmark (PERF.md 'streaming e2e' row).

Stages N base64(JSON) records as file-source micro-batches (the Kinesis
stand-in, pipeline.py header) and drives the FULL reference-parity chain —
decode -> parse -> validate -> whitelist -> index-name -> chunked bulk
index with reject capture — through StreamingEtl.process_batch under
``trigger(availableNow)`` with a checkpoint, exactly the e2e-test wiring
but at bench scale. The ES double is InMemoryElasticsearch (per-executor,
no disk/network), so the number is the engine's cost, not the sink's.

Run: python examples/stream_bench.py [n_records] [n_files] [files_per_trigger]
Prints one JSON line: records, batches, seconds, records_per_sec.

Reference envelope for comparison (BASELINE.md): ~100 records per
single-threaded Lambda invocation, ~1,000 rec/s/shard Kinesis ceiling.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.sinks import es
from terraform_aws_lambda_kinesis_to_es_spark.streaming import pipeline


def stage(src_dir: str, n_records: int, n_files: int) -> None:
    per_file = n_records // n_files
    i = 0
    for f in range(n_files):
        with open(f"{src_dir}/batch{f:04d}.json", "w") as fh:
            for _ in range(per_file):
                rec = {
                    "log_type": ("app", "web", "api")[i % 3],
                    "time": f"2024-03-{1 + i % 28:02d}T10:00:00Z",
                    "log_id": f"id{i}",
                    "value": i,
                }
                fh.write(
                    json.dumps(
                        {"data": base64.b64encode(json.dumps(rec).encode()).decode()}
                    )
                    + "\n"
                )
                i += 1


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = f"{work}/src"
    os.makedirs(src)
    stage(src, n_records, n_files)

    cfg = PipelineConfig(index_name_prefix="logs", bulk_chunk_size=500)
    etl = pipeline.StreamingEtl(
        cfg, lambda: es.InMemoryElasticsearch(), f"{work}/dlq"
    )
    t0 = time.time()
    q = pipeline.start_stream(
        spark,
        src,
        "data string",
        etl,
        f"{work}/ckpt",
        max_files_per_trigger=per_trigger,
    )
    q.awaitTermination(600)
    secs = time.time() - t0
    n_valid = sum(h.n_valid for h in etl.history)
    n_batches = len([h for h in etl.history if h.n_valid or h.n_failed])
    print(
        json.dumps(
            {
                "records": n_records,
                "indexed": n_valid,
                "batches": n_batches,
                "seconds": round(secs, 2),
                "records_per_sec": round(n_records / secs),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
