"""Incremental near-dup ingest: build the MinHash-LSH index over the
standing corpus ONCE, persist it as parquet artifacts, then screen each
new document batch against it without ever re-shingling the corpus —
the text-side sibling of examples/ann_serving.py
(operators/dedup.py: save_lsh_index / load_lsh_index / probe_lsh_index /
extend_lsh_index).

    python examples/near_dup_serving.py [index_dir]

At rest the bucket rows are hive-partitioned by band; each batch probe
is one (band, bkey) equi-join against them plus the batch's own
in-batch banding — candidate-bounded, never corpus-rescanned. After
screening, the batch appends to the index (extend_lsh_index) and the
next batch sees it: the standing dedup service loop.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("near-dup-serving")
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lsh_idx_")
    path = os.path.join(workdir, "lsh")

    docs = load_split(spark, SF_DIR, "documents")
    # corpus = 80% of docs; two ingest batches arrive afterwards
    corpus = docs.filter(F.col("doc_id") % 10 >= 2)
    batches = [
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 == 1),
    ]

    t0 = time.time()
    D.save_lsh_index(corpus, path)
    print(f"index built over {corpus.count()} docs in {time.time() - t0:.1f}s -> {path}")

    for i, batch in enumerate(batches):
        buckets, shingles = D.load_lsh_index(spark, path)
        t0 = time.time()
        reg = []  # standing loop: release the probe's cached frames per batch
        hits = D.probe_lsh_index(buckets, shingles, batch, cache_registry=reg)
        n_pairs = hits.count()
        dup_ids = hits.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
        batch_dups = batch.join(dup_ids, "doc_id", "left_semi").count()
        print(
            f"batch {i}: {batch.count()} docs screened in {time.time() - t0:.1f}s — "
            f"{n_pairs} near-dup pairs, {batch_dups} batch docs flagged"
        )
        hits.show(5, truncate=False)
        t0 = time.time()
        D.extend_lsh_index(batch, path)
        print(f"batch {i} appended to the index in {time.time() - t0:.1f}s")
        for f in reg:
            f.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
