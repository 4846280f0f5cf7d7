"""E2E: streaming vector ingest into the persisted IVF+PQ ANN index
(streaming/ann_ingest.py) — bootstrap-on-first-batch (the quantizer
trains on the seed batch), extend-per-micro-batch, replay duplicates
collapsing at compaction, all through a file:// URI (HadoopIndexFS
serving path).

The independent check: after the stream drains, the persisted index
must serve IDENTICALLY to a fresh inline knn_ivfpq build over the full
vector universe — exact because the codebook seeds (vec_id < PQ_K) all
live in the first (bootstrap) batch, so the frozen quantizer equals
the one a full build would train."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store, similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    N_QUERY_VECS,
    _vec,
)
from terraform_aws_lambda_kinesis_to_es_spark.streaming.ann_ingest import (
    ann_ingest_stream,
    ingest_batch,
)


def _stage_batches(src_dir: str, batches) -> None:
    base = time.time() - len(batches) - 10
    for i, rows in enumerate(batches):
        path = f"{src_dir}/b{i:05d}.json"
        with open(path, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        os.utime(path, (base + i, base + i))


def test_ann_ingest_stream_serves_like_fresh_build(spark, sf_dir, tmp_path):
    vecs = _vec(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    splits = ((0, 200), (200, 350), (350, 500))
    batches = [
        [
            {"vec_id": r["vec_id"], "v": list(r["v"])}
            for r in vecs.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).collect()
        ]
        for lo, hi in splits
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_batches(src, batches)
    index_uri = f"file://{tmp_path}/ann_index"
    ck = str(tmp_path / "ck")

    stream = (
        spark.readStream.schema("vec_id long, v array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        ann_ingest_stream(stream, index_uri, ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "ANN ingest stream did not finish"

    # bootstrap committed generation 1; extends never bumped it
    info = ann_store.ann_index_info(spark, index_uri)
    assert info["version"] == 1 and info["codes"].startswith("file://")

    index, cb = ann_store.load_ann_index(spark, index_uri)
    assert index.count() == 500
    got = sorted(
        tuple(r) for r in ann_store.knn_ivfpq_indexed(index, cb, queries).collect()
    )
    want = sorted(tuple(r) for r in S.knn_ivfpq(vecs, queries).collect())
    assert got == want


def test_ann_ingest_replay_collapses_at_compaction(spark, sf_dir, tmp_path):
    """At-least-once: a replayed batch appends byte-identical code rows;
    compaction restores one row per id and probes unchanged."""
    vecs = _vec(spark, sf_dir)
    seed = vecs.filter(F.col("vec_id") < 400)
    batch = vecs.filter(F.col("vec_id") >= 400)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")

    assert ingest_batch(seed, path) == 400  # bootstrap
    assert ingest_batch(batch, path) == 100
    before = sorted(
        tuple(r)
        for r in ann_store.knn_ivfpq_indexed(
            *ann_store.load_ann_index(spark, path), queries
        ).collect()
    )
    assert ingest_batch(batch, path) == 100  # replay
    codes, _ = ann_store.load_ann_index(spark, path)
    assert codes.count() == 600  # duplicates visible pre-compaction

    ann_store.compact_ann_index(spark, path)
    codes, cb = ann_store.load_ann_index(spark, path)
    assert codes.count() == 500
    after = sorted(
        tuple(r) for r in ann_store.knn_ivfpq_indexed(codes, cb, queries).collect()
    )
    assert after == before


def test_ann_ingest_auto_compaction_mid_stream(spark, sf_dir, tmp_path):
    """VERDICT r10 #6: the per-batch file-count auto-compaction
    (compact_after_files) must not drop or duplicate indexed vectors —
    after a bootstrap, an extend, a replay, and a final extend (each
    followed by a policy-triggered compaction), the index holds exactly
    one code row per id and serves IDENTICALLY to a fresh inline build
    of the full universe, while the generation number proves the
    compactions actually ran mid-ingest."""
    vecs = _vec(spark, sf_dir)
    b1 = vecs.filter(F.col("vec_id") < 300)
    b2 = vecs.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b3 = vecs.filter(F.col("vec_id") >= 400)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann_auto")

    assert ingest_batch(b1, path, compact_after_files=1) == 300  # bootstrap
    v1 = ann_store.ann_index_info(spark, path)["version"]
    assert ingest_batch(b2, path, compact_after_files=1) == 100
    assert ingest_batch(b2, path, compact_after_files=1) == 100  # replay
    assert ingest_batch(b3, path, compact_after_files=1) == 100
    v_final = ann_store.ann_index_info(spark, path)["version"]
    assert v_final > v1  # compactions ran and committed mid-ingest

    codes, cb = ann_store.load_ann_index(spark, path)
    assert codes.count() == 500  # replay rows collapsed, nothing lost
    got = sorted(
        tuple(r) for r in ann_store.knn_ivfpq_indexed(codes, cb, queries).collect()
    )
    want = sorted(tuple(r) for r in S.knn_ivfpq(vecs, queries).collect())
    assert got == want
