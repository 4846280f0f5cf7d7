"""ANN (IVF+PQ) index lifecycle measured on the standing 100x vector
corpus — the similarity-search twin of the LSH lifecycle table
(PERF.md round-9): build -> extend -> probe -> compact -> probe, all
through the versioned-manifest commit protocol (operators/ann_store.py).

Corpus: /tmp/sf_family100x embeddings (200,000 vectors, collision-free
realistic near-dup density — `python examples/materialize_corpora.py`
rebuilds it). The extend batch is a 5,000-vector slice re-keyed into a
fresh id range (new ids, as the ingest contract requires); compaction
replays that batch once and tombstones half of it, so it exercises
both the replay-collapse and drop_ids paths while it rewrites.

Run: python examples/ann_lifecycle_bench.py [index_dir]
One JSON line per step + a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store, similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

CORPUS = "/tmp/sf_family100x/embeddings.parquet"
BATCH_N = 5_000
NEW_ID_BASE = 10_000_000
N_QUERIES = 100


def main() -> None:
    if not os.path.isdir(CORPUS):
        sys.exit(f"missing {CORPUS} — run examples/materialize_corpora.py first")
    index_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="ann_idx_"
    )
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        shutil.rmtree(index_dir)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "ann_lifecycle_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    vecs = spark.read.parquet(CORPUS).select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    n_corpus = vecs.count()
    # the extend batch: an existing slice re-keyed into a fresh id range
    batch = (
        vecs.orderBy("vec_id")
        .limit(BATCH_N)
        .withColumn("vec_id", F.col("vec_id") + F.lit(NEW_ID_BASE))
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES)
    rows = []

    def step(name: str, fn, n_runs: int = 1) -> None:
        singles = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn()
            singles.append(round(time.perf_counter() - t0, 2))
        rows.append({"step": name, "s": min(singles), "runs": singles, "out": out})
        print(json.dumps(rows[-1]), flush=True)

    # warm the codegen the way bench.py does (session cost, not protocol
    # cost): one throwaway build on a 2k slice
    warm = vecs.limit(2000)
    ann_store.save_ann_index(warm, f"{index_dir}_warm")
    shutil.rmtree(f"{index_dir}_warm", ignore_errors=True)

    step(
        f"save_ann_index ({n_corpus} vecs)",
        lambda: ann_store.save_ann_index(vecs, index_dir),
    )
    step(
        f"extend_ann_index ({BATCH_N} batch)",
        lambda: ann_store.extend_ann_index(batch, index_dir),
    )

    def probe() -> int:
        idx, cb = ann_store.load_ann_index(spark, index_dir)
        return ann_store.knn_ivfpq_indexed(idx, cb, queries, k=10).count()

    step(f"probe ({N_QUERIES} queries, top-10, count-forced)", probe, n_runs=3)

    # replay the batch once (at-least-once duplicates), tombstone half
    ann_store.extend_ann_index(batch, index_dir)
    drop = batch.select("vec_id").filter(
        F.col("vec_id") % 2 == 0
    )
    step(
        "compact_ann_index (replay collapse + tombstones + GC)",
        lambda: ann_store.compact_ann_index(spark, index_dir, drop_ids=drop),
    )
    step("probe after compact", probe, n_runs=3)

    idx, _cb = ann_store.load_ann_index(spark, index_dir)
    n_final = idx.count()
    print(
        json.dumps(
            {
                "corpus": n_corpus,
                "final_index_rows": n_final,
                "expected": n_corpus + BATCH_N - drop.count(),
                "version": ann_store.ann_index_info(spark, index_dir)["version"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
