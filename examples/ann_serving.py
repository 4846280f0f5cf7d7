"""ANN index serving: build the IVF+PQ index ONCE, persist it through
the versioned-manifest commit protocol, answer query batches from the
artifacts without ever rescanning the corpus, then run the incremental
half of the lifecycle — extend with a new vector batch and compact —
the FAISS write_index/read_index/add/remove_ids workflow re-expressed
as tables (operators/ann_store.py over operators/index_store.py).

    python examples/ann_serving.py [index_dir]

At rest the codes are hive-partitioned by inverted list, so the
broadcast probe join dynamic-partition-prunes the index scan: a query
batch that probes p of k lists reads ~p/k of the index files. The
exact re-rank leg touches true vectors only for the ADC shortlist
(n_queries x shortlist rows).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    N_QUERY_VECS,
    _vec,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

SPLIT = 400  # base corpus vs the later "newly embedded" batch


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    index_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="ivfpq_"
    )
    spark = get_spark("ann-serving")

    corpus = _vec(spark, sf_dir)
    base = corpus.filter(F.col("vec_id") < SPLIT)
    batch = corpus.filter(F.col("vec_id") >= SPLIT)
    queries = corpus.filter(F.col("vec_id") < N_QUERY_VECS)

    t0 = time.time()
    ann_store.save_ann_index(base, index_dir)
    info = ann_store.ann_index_info(spark, index_dir)
    print(
        f"index generation {info['version']} committed to {index_dir} "
        f"in {time.time()-t0:.1f}s"
    )
    lists = [
        d for d in os.listdir(info["codes"]) if d.startswith("list_id=")
    ]
    print(f"codes partitions (inverted lists): {len(lists)}")

    index, codebook = ann_store.load_ann_index(spark, index_dir)

    t0 = time.time()
    adc = ann_store.knn_ivfpq_indexed(index, codebook, queries, k=5)
    n_adc = adc.count()
    print(f"ADC top-5 from artifacts: {n_adc} rows in {time.time()-t0:.1f}s")

    t0 = time.time()
    rr = ann_store.knn_ivfpq_rerank_indexed(index, codebook, base, queries, k=5)
    n_rr = rr.count()
    print(f"re-ranked top-5: {n_rr} rows in {time.time()-t0:.1f}s")

    # incremental ingest: new vectors encode against the frozen
    # quantizer and append — no manifest change, no corpus rescan
    t0 = time.time()
    ann_store.extend_ann_index(batch, index_dir)
    print(f"extended with {batch.count()} vectors in {time.time()-t0:.1f}s")

    # compaction collapses replayed appends / applies tombstones into a
    # new self-contained generation (commit = one manifest create)
    t0 = time.time()
    ann_store.compact_ann_index(spark, index_dir)
    info = ann_store.ann_index_info(spark, index_dir)
    print(
        f"compacted into generation {info['version']} in {time.time()-t0:.1f}s"
    )

    index, codebook = ann_store.load_ann_index(spark, index_dir)
    rr = ann_store.knn_ivfpq_rerank_indexed(index, codebook, corpus, queries, k=5)
    rr.orderBy("query_id", "rank").show(10, truncate=False)


if __name__ == "__main__":
    main()
