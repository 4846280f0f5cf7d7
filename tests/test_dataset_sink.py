"""Training-shard export layout contract (sinks/dataset.py).

The write-side twin of the query-surface guarantees: stable shard
membership, reproducible epoch order, bounded file sizes — all asserted
against the actual parquet files on disk, not just the plan.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from terraform_aws_lambda_kinesis_to_es_spark.sinks.dataset import (
    ORDER_COL,
    SHARD_COL,
    read_training_shards,
    with_shard_layout,
    write_training_shards,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

N_SHARDS = 4


@pytest.fixture()
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "source", "text")


def _shard_files(path: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for d in glob.glob(os.path.join(path, f"{SHARD_COL}=*")):
        sid = int(d.rsplit("=", 1)[1])
        out[sid] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def test_roundtrip_and_shard_count(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", n_shards=N_SHARDS)
    back = read_training_shards(spark, path)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    assert set(_shard_files(path)) == set(range(N_SHARDS))
    # membership matches the declared pure-plan assignment
    layout = {
        r.doc_id: r[SHARD_COL]
        for r in with_shard_layout(docs, "doc_id", n_shards=N_SHARDS).collect()
    }
    for r in back.select("doc_id", SHARD_COL).collect():
        assert layout[r.doc_id] == r[SHARD_COL]


def test_files_bounded_and_sorted(docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(
        docs, path, "doc_id", n_shards=N_SHARDS, records_per_file=40
    )
    seen_multi_file_shard = False
    for files in _shard_files(path).values():
        seen_multi_file_shard = seen_multi_file_shard or len(files) > 1
        prev_max = None
        for f in files:
            t = pq.read_table(f, columns=[ORDER_COL])
            assert t.num_rows <= 40
            keys = t.column(ORDER_COL).to_pylist()
            assert keys == sorted(keys), f"file not in epoch order: {f}"
            # files are contiguous slices of the shard's epoch order
            if prev_max is not None and keys:
                assert keys[0] >= prev_max
            if keys:
                prev_max = keys[-1]
    assert seen_multi_file_shard, "records_per_file cap never exercised"


def test_epoch_reshuffle_is_deterministic(spark, docs, tmp_path):
    p1, p2, p3 = (str(tmp_path / n) for n in ("e0a", "e0b", "e1"))
    for p, seed in ((p1, "epoch-0"), (p2, "epoch-0"), (p3, "epoch-1")):
        write_training_shards(
            docs, p, "doc_id", n_shards=N_SHARDS, order_seed=seed
        )

    def order(path: str) -> dict[int, list[int]]:
        return {
            sid: [
                x
                for f in files
                for x in pq.read_table(f, columns=["doc_id"])
                .column("doc_id")
                .to_pylist()
            ]
            for sid, files in _shard_files(path).items()
        }

    o1, o2, o3 = order(p1), order(p2), order(p3)
    assert o1 == o2, "same seed must replay bit-identical layout"
    assert o1 != o3, "new epoch seed must permute the order"
    # shard MEMBERSHIP is seed-independent (stable across epochs)
    assert {s: sorted(v) for s, v in o1.items()} == {
        s: sorted(v) for s, v in o3.items()
    }


def test_curriculum_order_export(spark, docs, tmp_path):
    """order_col: each shard's files must be sorted by the caller's
    curriculum column (here: text length ascending), with membership
    unchanged from the default layout."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "curriculum")
    scored = docs.withColumn("difficulty", F.length("text"))
    write_training_shards(
        scored, path, "doc_id", n_shards=N_SHARDS, order_col="difficulty"
    )
    for files in _shard_files(path).values():
        prev_max = None
        for f in files:
            vals = pq.read_table(f, columns=["difficulty"]).column(
                "difficulty"
            ).to_pylist()
            assert vals == sorted(vals), f
            if prev_max is not None and vals:
                assert vals[0] >= prev_max
            if vals:
                prev_max = vals[-1]
    # membership identical to the default (order never moves a record)
    back = read_training_shards(spark, path)
    layout = {
        r.doc_id: r[SHARD_COL]
        for r in with_shard_layout(docs, "doc_id", n_shards=N_SHARDS).collect()
    }
    for r in back.select("doc_id", SHARD_COL).collect():
        assert layout[r.doc_id] == r[SHARD_COL]


def test_streaming_incremental_export(spark, docs, tmp_path):
    """shard_sink appends micro-batches into a stable shard layout: every
    record lands exactly once, in the shard the pure hash assigns it,
    regardless of which batch delivered it."""
    import json

    from terraform_aws_lambda_kinesis_to_es_spark.sinks.dataset import shard_sink

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"doc_id": r.doc_id, "source": r.source} for r in docs.collect()
    ]
    # two micro-batches via maxFilesPerTrigger=1
    half = len(rows) // 2
    for name, chunk in (("b0", rows[:half]), ("b1", rows[half:])):
        with open(src / f"{name}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in chunk))
    out = str(tmp_path / "shards")
    q = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(
            shard_sink(out, "doc_id", n_shards=N_SHARDS)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = read_training_shards(spark, out)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in rows
    )
    layout = {
        r.doc_id: r[SHARD_COL]
        for r in with_shard_layout(docs, "doc_id", n_shards=N_SHARDS).collect()
    }
    for r in back.select("doc_id", SHARD_COL).collect():
        assert layout[r.doc_id] == r[SHARD_COL]


def test_shard_sink_replay_is_idempotent(spark, docs, tmp_path):
    """foreachBatch is at-least-once: a batch re-delivered with the same
    batch_id (failure between sink write and checkpoint commit) must not
    duplicate shard rows. shard_sink records committed batch ids under
    _batches/ and skips replays."""
    from terraform_aws_lambda_kinesis_to_es_spark.sinks.dataset import (
        committed_batch_ids,
        shard_sink,
    )

    out = str(tmp_path / "shards")
    sink = shard_sink(out, "doc_id", n_shards=N_SHARDS)
    batch = docs.select("doc_id", "source")
    sink(batch, 0)
    n_once = read_training_shards(spark, out).count()
    sink(batch, 0)  # replay of the SAME batch id — must be a no-op
    assert read_training_shards(spark, out).count() == n_once
    sink(batch, 1)  # a genuinely new batch still appends
    assert read_training_shards(spark, out).count() == 2 * n_once
    assert committed_batch_ids(spark, out) == {0, 1}


def test_subset_read_prunes_partitions(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", n_shards=N_SHARDS)
    sub = read_training_shards(spark, path, shards=[1, 2])
    assert set(r[SHARD_COL] for r in sub.select(SHARD_COL).distinct().collect()) == {1, 2}
    # the shard filter must reach the scan as a partition filter, not a
    # post-scan row filter
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard_id" in plan
