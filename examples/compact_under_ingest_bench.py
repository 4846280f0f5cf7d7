"""Compact-under-ingest cost profile (VERDICT r10 #6's PERF row): the
per-batch overhead the file-count auto-compaction policy adds to the
two streaming ingests, measured on the standing 100x corpora.

For each ingest twin, a seed index is built, then N batches are
ingested twice — once with auto-compaction OFF (the pre-r11
append-forever behavior) and once with ``compact_after_files=1``
(every batch triggers a compaction, the worst-case cadence) — and the
per-batch walls are printed. The delta is the full compaction cost the
policy amortizes over whatever cadence the file-count threshold
actually picks in production.

LSH leg: seed = 100k family100x docs, batches = 4 x 5k.
ANN leg: seed = 100k family100x vectors, batches = 4 x 5k.

Run: python examples/compact_under_ingest_bench.py
One JSON line per (leg, mode, batch) + a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.streaming import ann_ingest
from terraform_aws_lambda_kinesis_to_es_spark.streaming import index_ingest

BIG = "/tmp/sf_family100x"
SEED_N = 100_000
BATCH_N = 5_000
N_BATCHES = 4


def lsh_leg(spark, docs, mode: str, compact_after_files):
    root = f"/tmp/cui_lsh_{mode}"
    shutil.rmtree(root, ignore_errors=True)
    seed = docs.filter(F.col("doc_id") < SEED_N)
    t0 = time.perf_counter()
    D.save_lsh_index(seed, f"{root}/idx")
    build_s = round(time.perf_counter() - t0, 2)
    rows = []
    for b in range(N_BATCHES):
        lo = SEED_N + b * BATCH_N
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + BATCH_N)
        )
        t0 = time.perf_counter()
        n = index_ingest.ingest_batch(
            batch,
            f"{root}/idx",
            f"{root}/acc",
            compact_after_files=compact_after_files,
        )
        rows.append(
            {
                "leg": "lsh",
                "mode": mode,
                "batch": b,
                "accepted": n,
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    ver = D.lsh_index_info(spark, f"{root}/idx")["version"]
    return build_s, rows, ver


def ann_leg(spark, vecs, mode: str, compact_after_files):
    root = f"/tmp/cui_ann_{mode}"
    shutil.rmtree(root, ignore_errors=True)
    seed = vecs.filter(F.col("vec_id") < SEED_N)
    t0 = time.perf_counter()
    ann_ingest.ingest_batch(seed, f"{root}/idx")
    build_s = round(time.perf_counter() - t0, 2)
    rows = []
    for b in range(N_BATCHES):
        lo = SEED_N + b * BATCH_N
        batch = vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + BATCH_N)
        )
        t0 = time.perf_counter()
        n = ann_ingest.ingest_batch(
            batch, f"{root}/idx", compact_after_files=compact_after_files
        )
        rows.append(
            {
                "leg": "ann",
                "mode": mode,
                "batch": b,
                "indexed": n,
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    ver = ann_store.ann_index_info(spark, f"{root}/idx")["version"]
    return build_s, rows, ver


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "compact_under_ingest", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = spark.read.parquet(f"{BIG}/documents.parquet").select(
        "doc_id", "text"
    )
    vecs = spark.read.parquet(f"{BIG}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = {}
    for mode, caf in (("off", None), ("every_batch", 1)):
        build_s, rows, ver = lsh_leg(spark, docs, mode, caf)
        out[f"lsh_{mode}"] = {
            "build_s": build_s,
            "batch_walls": [r["wall_s"] for r in rows],
            "final_version": ver,
        }
    for mode, caf in (("off", None), ("every_batch", 1)):
        build_s, rows, ver = ann_leg(spark, vecs, mode, caf)
        out[f"ann_{mode}"] = {
            "build_s": build_s,
            "batch_walls": [r["wall_s"] for r in rows],
            "final_version": ver,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
