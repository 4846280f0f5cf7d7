"""ANN index serving: build the IVF+PQ index ONCE, persist it as
parquet artifacts, and answer query batches from the artifacts without
ever rescanning the corpus — the FAISS write_index/read_index workflow
re-expressed as tables (operators/similarity.py: save_ivfpq_index /
load_ivfpq_index / knn_ivfpq_indexed / knn_ivfpq_rerank_indexed).

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

from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    N_QUERY_VECS,
    _vec,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    index_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="ivfpq_"
    )
    spark = get_spark("ann-serving")

    corpus = _vec(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < N_QUERY_VECS)

    t0 = time.time()
    S.save_ivfpq_index(corpus, index_dir)
    print(f"index built + persisted to {index_dir} in {time.time()-t0:.1f}s")
    lists = [
        d for d in os.listdir(f"{index_dir}/codes") if d.startswith("list_id=")
    ]
    print(f"codes partitions (inverted lists): {len(lists)}")

    index, codebook = S.load_ivfpq_index(spark, index_dir)

    t0 = time.time()
    adc = S.knn_ivfpq_indexed(index, codebook, queries, k=5)
    n_adc = adc.count()
    print(f"ADC top-5 from artifacts: {n_adc} rows in {time.time()-t0:.1f}s")

    t0 = time.time()
    rr = S.knn_ivfpq_rerank_indexed(index, codebook, corpus, queries, k=5)
    n_rr = rr.count()
    print(f"re-ranked top-5: {n_rr} rows in {time.time()-t0:.1f}s")
    rr.orderBy("query_id", "rank").show(10, truncate=False)


if __name__ == "__main__":
    main()
