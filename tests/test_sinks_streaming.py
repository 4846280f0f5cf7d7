"""Sink + end-to-end streaming tests: chunking, reject capture, dead-letter
layouts, at-least-once smoke (SURVEY.md §5.4).

The ES double is file-backed (sinks.es.FileSystemElasticsearch): Spark
Python closures run in worker processes, so the filesystem is the shared
medium. Client factories are lambdas (cloudpickle serializes them by
value — a test-module top-level function would pickle by reference and
fail to import on workers)."""

from __future__ import annotations

import base64
import glob
import gzip
import json

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.sinks import deadletter, es
from terraform_aws_lambda_kinesis_to_es_spark.streaming import pipeline

CFG = PipelineConfig(index_name_prefix="logs", bulk_chunk_size=500)
FSES = es.FileSystemElasticsearch


def rec(i: int, log_type: str = "app", **kw) -> dict:
    r = {"log_type": log_type, "time": "2024-03-01T10:00:00Z", "log_id": f"id{i}"}
    r.update(kw)
    return r


def b64(obj: dict) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def test_inmemory_stub_unit():
    client = es.InMemoryElasticsearch(reject_if=lambda a: a["_source"].get("bad"))
    rejects = client.bulk(
        [
            {"_index": "i", "_type": "_doc", "_source": {"x": 1}},
            {"_index": "i", "_type": "_doc", "_source": {"x": 2, "bad": True}},
        ]
    )
    assert [r["_source"]["x"] for r in rejects] == [2]
    assert client.indexed["i"] == [{"x": 1}] and client.calls == [2]


def test_chunking_500_per_request(spark, tmp_path):
    base = str(tmp_path / "es")
    df = spark.range(1234).select(
        F.lit("logs-app-20240301").alias("_index"),
        F.lit("_doc").alias("_type"),
        F.to_json(F.struct(F.col("id"))).alias("_source"),
    ).coalesce(1)
    rejects = es.bulk_index(df, lambda: FSES(base), CFG)
    assert rejects.count() == 0
    sizes = FSES.read_call_sizes(base)
    # one partition => ceil(1234/500) == 3 requests (main.py:30,132)
    assert sorted(sizes) == [234, 500, 500]
    assert len(FSES.read_indexed(base)["logs-app-20240301"]) == 1234


def test_reject_capture(spark, tmp_path):
    base = str(tmp_path / "es")
    df = spark.createDataFrame(
        [("i1", json.dumps({"x": 1})), ("i1", json.dumps({"x": 2, "bad": True}))],
        ["_index", "_source"],
    )
    rejects = es.bulk_index(
        df.withColumn("_type", F.lit("_doc")),
        lambda: FSES(base, reject_if=lambda a: a["_source"].get("bad", False)),
        CFG,
    )
    rows = rejects.collect()
    assert len(rows) == 1
    assert json.loads(rows[0]._source)["x"] == 2
    assert [d["x"] for ds in FSES.read_indexed(base).values() for d in ds] == [1]


def test_validation_dlq_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("unknown", '{"no_type": 1}')], "log_type string, payload string"
    ).withColumn("log_ts", F.to_timestamp(F.lit("2024-03-05 01:02:03")))
    base = str(tmp_path / "dlq")
    deadletter.write_validation_failures(df, CFG, base)
    files = glob.glob(f"{base}/log_type=unknown/y_m=2024-03/d=05/*.gz")
    assert files
    assert gzip.open(files[0]).read().decode().strip() == '{"no_type": 1}'


def test_dead_letter_reingest_roundtrip(spark, tmp_path):
    # three failures: one missing the type field, two missing/bad time —
    # written with the real sink, then read back and replayed
    df = spark.createDataFrame(
        [
            ("unknown", '{"time": "2024-03-05T01:02:03", "val": 1}', "2024-03-05 01:02:03"),
            ("app", '{"log_type": "app", "val": 2}', None),
            ("app", '{"log_type": "app", "time": "not a time", "val": 3}', None),
        ],
        "log_type string, payload string, raw_ts string",
    ).withColumn("log_ts", F.to_timestamp("raw_ts")).drop("raw_ts")
    base = str(tmp_path / "dlq")
    deadletter.write_validation_failures(df, CFG, base)

    back = deadletter.read_dead_letters(spark, base)
    rows = {r.payload: r for r in back.collect()}
    assert set(rows) == {
        '{"time": "2024-03-05T01:02:03", "val": 1}',
        '{"log_type": "app", "val": 2}',
        '{"log_type": "app", "time": "not a time", "val": 3}',
    }
    r1 = rows['{"time": "2024-03-05T01:02:03", "val": 1}']
    assert (r1.log_type, r1.y_m, r1.d) == ("unknown", "2024-03", "05")

    # replay under the same config: all three still fail (nothing fixed)
    valid, failed = deadletter.replay_dead_letters(spark, base, CFG)
    assert valid.count() == 0 and failed.count() == 3

    # replay under a FIXED config (the type lives in "val" now — simulates
    # a corrected field mapping): the first record becomes valid
    fixed = PipelineConfig(index_name_prefix="logs", log_type_field="val")
    valid, failed = deadletter.replay_dead_letters(spark, base, fixed)
    assert valid.count() == 1 and failed.count() == 2


def test_es_reject_blob_layout(spark, tmp_path):
    from datetime import datetime

    df = spark.createDataFrame([("i", '{"a":1}'), ("i", '{"b":2}')], ["_index", "_source"])
    base = str(tmp_path / "rej")
    path = deadletter.write_es_rejects(df, CFG, base, now=datetime(2024, 3, 5, 1, 2, 3))
    assert path.endswith("failed/2024-03/05/2024-03-05-01:02:03")
    lines = set()
    for f in glob.glob(f"{path}/*.gz"):
        lines |= set(gzip.open(f).read().decode().strip().splitlines())
    assert lines == {'{"a":1}', '{"b":2}'}


@pytest.fixture()
def staged_stream(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    records = (
        [{"data": b64(rec(i))} for i in range(20)]
        + [{"data": b64({"time": "2024-03-01T10:00:00Z", "log_id": "no-type"})}]
        + [{"data": b64({"log_type": "app", "log_id": "no-time"})}]
        + [{"data": b64(rec(99, log_type="spam"))}]
        + [{"data": base64.b64encode(b"not json").decode()}]
        + [{"data": b64(rec(7, log_type="late", time="2020-01-01T00:00:00Z"))}]
    )
    with open(src / "batch1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in records))
    return str(src)


def test_streaming_end_to_end(spark, tmp_path, staged_stream):
    esbase = str(tmp_path / "es")
    cfg = PipelineConfig(
        index_name_prefix="logs",
        log_type_whitelist=frozenset({"app", "late", "unknown"}),
    )
    etl = pipeline.StreamingEtl(cfg, lambda: FSES(esbase), str(tmp_path / "dlq"))
    q = pipeline.start_stream(
        spark, staged_stream, "data string", etl, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    indexed = FSES.read_indexed(esbase)
    # 20 valid 'app' records -> daily index from EVENT time
    assert len(indexed["logs-app-20240301"]) == 20
    # late record lands in its old daily index, never dropped (T5)
    assert len(indexed["logs-late-20200101"]) == 1
    # whitelist: 'spam' silently dropped; non-JSON silently dropped
    assert not any("spam" in k for k in indexed)
    # _source is the VERBATIM original record (main.py:116)
    assert {"log_type": "app", "time": "2024-03-01T10:00:00Z", "log_id": "id0"} in [
        json.loads(s) if isinstance(s, str) else s for s in indexed["logs-app-20240301"]
    ]
    # validation failures dead-lettered by type (README.md:13 layout)
    assert glob.glob(str(tmp_path / "dlq/validation/log_type=unknown/**/*.gz"), recursive=True)
    assert glob.glob(str(tmp_path / "dlq/validation/log_type=app/**/*.gz"), recursive=True)
    done = [h for h in etl.history if h.n_valid or h.n_failed]
    assert done and done[0].n_valid == 21 and done[0].n_failed == 2


def test_streaming_reject_dead_letter(spark, tmp_path, staged_stream):
    esbase = str(tmp_path / "es")
    cfg = PipelineConfig(index_name_prefix="logs")
    etl = pipeline.StreamingEtl(
        cfg,
        lambda: FSES(esbase, reject_if=lambda a: a["_source"]["log_id"] == "id3"),
        str(tmp_path / "dlq"),
    )
    q = pipeline.start_stream(
        spark, staged_stream, "data string", etl, str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    rej = glob.glob(str(tmp_path / "dlq/rejects/**/*.gz"), recursive=True)
    assert rej
    contents = b"".join(gzip.open(f).read() for f in rej).decode()
    assert '"id3"' in contents
    assert any(h.n_rejected == 1 for h in etl.history)


def test_streaming_resume_no_reprocess(spark, tmp_path, staged_stream):
    """Checkpoint semantics: a second availableNow run over the same
    source must not re-index already-processed files (T3 bookkeeping)."""
    esbase = str(tmp_path / "es")
    etl = pipeline.StreamingEtl(CFG, lambda: FSES(esbase), str(tmp_path / "dlq"))
    ckpt = str(tmp_path / "ckpt3")
    q = pipeline.start_stream(spark, staged_stream, "data string", etl, ckpt)
    q.awaitTermination(120)
    n_first = len(FSES.read_indexed(esbase).get("logs-app-20240301", []))
    q2 = pipeline.start_stream(spark, staged_stream, "data string", etl, ckpt)
    q2.awaitTermination(120)
    n_second = len(FSES.read_indexed(esbase).get("logs-app-20240301", []))
    assert n_first == n_second == 20


def test_doc_id_upsert_effectively_once(spark, tmp_path):
    """Extension T3: with use_log_id_as_doc_id, a record re-delivered in a
    retried/duplicated batch upserts instead of duplicating — delivery
    upgrades from at-least-once to effectively-once."""
    src = tmp_path / "src"
    src.mkdir()
    dup = rec(1)
    _rows = [dup, rec(2), dup]  # duplicate within the stream
    with open(src / "a.json", "w") as f:
        f.write("\n".join(json.dumps({"data": b64(r)}) for r in _rows))
    esbase = str(tmp_path / "es")
    cfg = PipelineConfig(index_name_prefix="logs", use_log_id_as_doc_id=True)
    etl = pipeline.StreamingEtl(cfg, lambda: FSES(esbase), str(tmp_path / "dlq"))
    q = pipeline.start_stream(spark, str(src), "data string", etl, str(tmp_path / "ck"))
    q.awaitTermination(120)
    # deliberately re-run with a FRESH checkpoint: an at-least-once replay
    q2 = pipeline.start_stream(spark, str(src), "data string", etl, str(tmp_path / "ck_replay"))
    q2.awaitTermination(120)
    docs = FSES.read_indexed(esbase)["logs-app-20240301"]
    ids = sorted(
        (json.loads(d) if isinstance(d, str) else d)["log_id"] for d in docs
    )
    assert ids == ["id1", "id2"]  # upserted, not duplicated


def test_failed_batch_replays_effectively_once(spark, tmp_path):
    """The other half of the reference's T3 contract (main.tf:58-64): a
    batch that FAILS mid-flight is re-delivered. Inject a client that dies
    AFTER its first bulk write (the worst spot: data landed in ES, offset
    not committed), assert the stream run fails, then restart on the SAME
    checkpoint: the failed batch replays, and _id-keyed indexing makes the
    partially-written records upsert — effectively-once despite the
    at-least-once redelivery."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    for fname, lo, hi in (("a.json", 0, 10), ("b.json", 10, 20)):
        with open(src / fname, "w") as f:
            f.write(
                "\n".join(json.dumps({"data": b64(rec(i))}) for i in range(lo, hi))
            )
    esbase = str(tmp_path / "es")
    flag = str(tmp_path / "poison")
    open(flag, "w").close()

    class OutageFSES(FSES):
        """Indexes the chunk, THEN dies while the poison flag exists —
        simulating an ES-side failure after a partial bulk landed."""

        def bulk(self, actions):
            rejects = super().bulk(actions)
            if os.path.exists(self.flag):
                try:
                    os.remove(self.flag)  # fail exactly once
                except FileNotFoundError:
                    pass
                raise RuntimeError("injected ES outage after bulk write")
            return rejects

    def factory(base=esbase, flag=flag):
        c = OutageFSES(base)
        c.flag = flag
        return c

    cfg = PipelineConfig(index_name_prefix="logs", use_log_id_as_doc_id=True)
    etl = pipeline.StreamingEtl(cfg, factory, str(tmp_path / "dlq"))
    ckpt = str(tmp_path / "ckpt")
    q = pipeline.start_stream(
        spark, str(src), "data string", etl, ckpt, max_files_per_trigger=1
    )
    with pytest.raises(Exception, match="injected ES outage"):
        q.awaitTermination(120)
        raise AssertionError("query should have failed on the injected outage")
    assert not os.path.exists(flag)  # the outage fired (and cleared)

    # restart on the SAME checkpoint: the uncommitted batch re-delivers
    q2 = pipeline.start_stream(
        spark, str(src), "data string", etl, ckpt, max_files_per_trigger=1
    )
    q2.awaitTermination(120)

    docs = FSES.read_indexed(esbase)["logs-app-20240301"]
    ids = sorted(
        (json.loads(d) if isinstance(d, str) else d)["log_id"] for d in docs
    )
    assert ids == sorted(f"id{i}" for i in range(20))  # all, exactly once

    # and the redelivery really happened: the raw call log carries the
    # replayed batch's records twice (at-least-once), absorbed by _id upsert
    raw_ids = []
    for p in glob.glob(f"{esbase}/call-*.ndjson"):
        with open(p) as f:
            raw_ids += [
                json.loads(line)["_id"]
                for line in f
                if "_call_size" not in line
            ]
    assert len(raw_ids) > 20  # some record delivered more than once
    assert set(raw_ids) == set(ids)


def test_streaming_dateutil_parser_end_to_end(spark, tmp_path):
    """The timestamp_parser='dateutil' config driven through the FULL
    streaming path (decode -> parse -> validate -> route -> bulk): wild
    formats the JVM ladder can't parse (RFC 2822, '%d %b %Y') must land in
    their event-time daily indices, and garbage must dead-letter."""
    src = tmp_path / "src"
    src.mkdir()
    records = [
        rec(1, time="Fri, 01 Mar 2024 10:00:00 +0000"),  # RFC 2822
        rec(2, time="05 March 2024 01:02:03"),           # %d %B %Y
        rec(3, time="2024-03-07T10:00:00Z"),             # ISO still fine
        rec(4, time="not a timestamp at all"),           # -> dead letter
    ]
    with open(src / "a.json", "w") as f:
        f.write("\n".join(json.dumps({"data": b64(r)}) for r in records))
    esbase = str(tmp_path / "es")
    cfg = PipelineConfig(index_name_prefix="logs", timestamp_parser="dateutil")
    etl = pipeline.StreamingEtl(cfg, lambda: FSES(esbase), str(tmp_path / "dlq"))
    q = pipeline.start_stream(
        spark, str(src), "data string", etl, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    indexed = FSES.read_indexed(esbase)
    assert len(indexed["logs-app-20240301"]) == 1  # RFC 2822 parsed
    assert len(indexed["logs-app-20240305"]) == 1  # verbose date parsed
    assert len(indexed["logs-app-20240307"]) == 1
    assert etl.history[0].n_valid == 3 and etl.history[0].n_failed == 1
    assert glob.glob(
        str(tmp_path / "dlq/validation/log_type=app/**/*.gz"), recursive=True
    )


def test_empty_batch_short_circuits(spark, tmp_path):
    esbase = str(tmp_path / "es")
    etl = pipeline.StreamingEtl(CFG, lambda: FSES(esbase), str(tmp_path / "dlq"))
    empty = spark.createDataFrame([], "data string")
    res = etl.process_batch(empty, 0)
    assert res.n_valid == 0 and FSES.read_call_sizes(esbase) == []
