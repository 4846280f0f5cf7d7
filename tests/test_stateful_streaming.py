"""Stateful streaming extension tests: watermarked dedup, session windows,
custom applyInPandasWithState operator — driven through real streaming
queries over a staged file source."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.streaming import stateful


def _write_batch(src, name: str, rows: list[dict]) -> None:
    with open(f"{src}/{name}.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def _stream(spark, src: str):
    return (
        spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def _run_to_memory(df, name: str, ckpt: str, output_mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedup_drops_duplicate_ids(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "a", "log_type": "app", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "a", "log_type": "app", "log_ts": "2024-03-01T10:00:01"},
            {"log_id": "b", "log_type": "app", "log_ts": "2024-03-01T10:00:02"},
        ],
    )
    # duplicate arriving in a LATER micro-batch is also dropped (state)
    _write_batch(src, "b2", [{"log_id": "a", "log_type": "app", "log_ts": "2024-03-01T10:00:03"}])
    out = stateful.dedup_stream(_stream(spark, src))
    _run_to_memory(out, "dedup_t", str(tmp_path / "ck"))
    ids = sorted(r.log_id for r in spark.table("dedup_t").collect())
    assert ids == ["a", "b"]


def test_stream_sessionize_gap_split(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "u1", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "2", "log_type": "u1", "log_ts": "2024-03-01T10:10:00"},
            # > 30 min gap => new session
            {"log_id": "3", "log_type": "u1", "log_ts": "2024-03-01T11:30:00"},
            # watermark driver: far-future event closes earlier sessions
            {"log_id": "4", "log_type": "u2", "log_ts": "2024-03-02T00:00:00"},
        ],
    )
    out = stateful.sessionize_stream(_stream(spark, src), key_col="log_type")
    _run_to_memory(out, "sess_t", str(tmp_path / "ck"))
    rows = [r for r in spark.table("sess_t").collect() if r.log_type == "u1"]
    assert sorted(r.n_events for r in rows) == [1, 2]


def test_running_counts_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "app", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "2", "log_type": "app", "log_ts": "2024-03-01T10:00:01"},
            {"log_id": "3", "log_type": "web", "log_ts": "2024-03-01T10:00:02"},
        ],
    )
    _write_batch(
        src,
        "b2",
        [{"log_id": "4", "log_type": "app", "log_ts": "2024-03-01T10:00:03"}],
    )
    out = stateful.running_type_counts(_stream(spark, src))
    _run_to_memory(out, "run_t", str(tmp_path / "ck"), output_mode="update")
    rows = spark.table("run_t").collect()
    app = sorted((r.n_batch, r.n_total) for r in rows if r.log_type == "app")
    # two updates for 'app': first batch total 2, second batch total 3
    assert (1, 3) in app and any(t == 2 for _, t in app)
    web = [(r.n_batch, r.n_total) for r in rows if r.log_type == "web"]
    assert (1, 1) in web
