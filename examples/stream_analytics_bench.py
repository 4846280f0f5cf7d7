"""Throughput benchmark for the round-8 streaming analytics operators
(heavy_hitters_stream, anomaly_stream) — PERF.md 'streaming analytics'
rows.

Stages N synthetic log rows (Zipf-ish item skew across GROUPS group
keys, so the heavy-hitter tables have real work) as file-source
micro-batches, then drives each operator end-to-end with availableNow
and reports wall + rec/s. Both operators keep CONSTANT state per key
(cap counter triples / window longs), so throughput should track the
near-dup bench's per-batch overhead model, not the corpus.

Run: python examples/stream_analytics_bench.py [n_rows] [n_files]
e.g.  python examples/stream_analytics_bench.py 200000 8
One JSON line per operator.
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
ITEMS = 10_000


def _item(i: int) -> str:
    # skewed: ~10% of rows hit item 0 of the group, long tail elsewhere
    if i % 10 == 0:
        return "hot"
    return f"u{(i * 131) % ITEMS}"


def stage(src_dir: str, n_rows: int, n_files: int) -> int:
    per_file = n_rows // n_files
    base = time.time() - n_files - 10
    i = 0
    for f in range(n_files):
        path = f"{src_dir}/b{f:05d}.json"
        with open(path, "w") as fh:
            for _ in range(per_file):
                row = {
                    "log_id": _item(i),
                    "log_type": f"g{i % GROUPS}",
                    "log_ts": "2024-03-01T10:00:00",
                }
                fh.write(json.dumps(row) + "\n")
                i += 1
        os.utime(path, (base + f, base + f))
    return i  # actual staged rows (n_files * per_file, not n_rows)


def drive(spark, src_dir: str, op, name: str, n_rows: int) -> dict:
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    stream = (
        spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    t0 = time.perf_counter()
    q = (
        op(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    wall = time.perf_counter() - t0
    if not finished:
        # a timed-out stream would otherwise report inflated rec/s,
        # have its live checkpoint deleted, and contend with the next
        # benchmark — stop it and fail loudly instead
        q.stop()
        raise RuntimeError(f"{name} did not finish within 600s")
    shutil.rmtree(ck, ignore_errors=True)
    return {
        "op": name,
        "records": n_rows,
        "seconds": round(wall, 1),
        "records_per_sec": int(n_rows / wall),
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "stream_analytics_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    src = tempfile.mkdtemp(prefix="stream_analytics_src_")
    staged_rows = stage(src, n_rows, n_files)
    print(
        json.dumps(
            drive(
                spark,
                src,
                lambda s: stateful.heavy_hitters_stream(s, cap=16, topn=5),
                "heavy_hitters_stream",
                staged_rows,
            )
        ),
        flush=True,
    )
    print(
        json.dumps(
            drive(spark, src, stateful.anomaly_stream, "anomaly_stream", staged_rows)
        ),
        flush=True,
    )
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
