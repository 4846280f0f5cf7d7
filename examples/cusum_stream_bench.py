"""Throughput benchmark for the streaming CUSUM alarm
(stateful.cusum_stream) — the PERF.md 'streaming CUSUM' row.

Stages N synthetic observation rows (GROUPS keys, a deterministic
sawtooth value series with a level shift injected into half the keys,
so the fold does real work and some alarms actually latch) as
file-source micro-batches, then drives the operator end-to-end with
availableNow and reports wall + rec/s. State is three longs per key,
so throughput tracks the per-batch overhead model, not the corpus.

Run: python examples/cusum_stream_bench.py [n_rows] [n_files]
One JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.streaming import stateful

GROUPS = 32
TARGET = 50
ALARM_AT = 5_000


def stage(src_dir: str, n_rows: int, n_files: int) -> int:
    per_file = n_rows // n_files
    base = time.time() - n_files - 10
    i = 0
    for f in range(n_files):
        path = f"{src_dir}/b{f:05d}.json"
        with open(path, "w") as fh:
            for _ in range(per_file):
                g = i % GROUPS
                # sawtooth around the target; even groups get a +10
                # level shift so their CUSUM drifts up and latches
                v = TARGET - 5 + (i % 11) + (10 if g % 2 == 0 else 0)
                row = {
                    "log_id": str(i),
                    "log_type": f"g{g}",
                    "log_ts": "2024-03-01T10:00:00",
                    "v": v,
                }
                fh.write(json.dumps(row) + "\n")
                i += 1
        os.utime(path, (base + f, base + f))
    return i


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "cusum_stream_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    src = tempfile.mkdtemp(prefix="cusum_src_")
    ck = tempfile.mkdtemp(prefix="ck_cusum_")
    staged = stage(src, n_rows, n_files)
    stream = (
        spark.readStream.schema(
            "log_id string, log_type string, log_ts timestamp, v long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    t0 = time.perf_counter()
    q = (
        stateful.cusum_stream(stream, target=TARGET, alarm_at=ALARM_AT)
        .writeStream.format("memory")
        .queryName("cusum_bench")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    wall = time.perf_counter() - t0
    if not finished:
        q.stop()
        raise RuntimeError("cusum_stream did not finish within 600s")
    rows = spark.table("cusum_bench").collect()
    latched = {r.key for r in rows if r.alarm}
    print(
        json.dumps(
            {
                "op": "cusum_stream",
                "records": staged,
                "files": n_files,
                "seconds": round(wall, 1),
                "records_per_sec": int(staged / wall),
                "keys": GROUPS,
                "alarmed_keys": len(latched),
            }
        )
    )
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
