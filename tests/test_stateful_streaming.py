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


def _stage_quota_batches(src) -> None:
    # 'app' sends 2 then 2 rows (quota 3 -> 2 + 1 admitted); 'web' sends 1
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
        [
            {"log_id": "4", "log_type": "app", "log_ts": "2024-03-01T10:00:03"},
            {"log_id": "5", "log_type": "app", "log_ts": "2024-03-01T10:00:04"},
        ],
    )


def _assert_quota_output(rows) -> None:
    by_type: dict[str, list[str]] = {}
    for r in rows:
        by_type.setdefault(r.log_type, []).append(r.log_id)
    assert len(by_type["app"]) == 3
    assert sorted(by_type["web"]) == ["3"]
    # admission is in arrival order: batch-1 rows always make it
    assert {"1", "2"} <= set(by_type["app"])


def test_latest_per_key_absorbs_late_arrivals(spark, tmp_path):
    # streaming CDC: the late batch-2 record (11:00) must NOT displace the
    # stored 12:00 winner; the emitted view converges to the true latest
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "app", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "2", "log_type": "app", "log_ts": "2024-03-01T12:00:00"},
            {"log_id": "3", "log_type": "web", "log_ts": "2024-03-01T10:30:00"},
        ],
    )
    _write_batch(
        src,
        "b2",
        [
            {"log_id": "4", "log_type": "app", "log_ts": "2024-03-01T11:00:00"},
            {"log_id": "5", "log_type": "web", "log_ts": "2024-03-01T13:00:00"},
        ],
    )
    out = stateful.latest_per_key(_stream(spark, src))
    _run_to_memory(out, "latest_t", str(tmp_path / "ck"), output_mode="update")
    rows = spark.table("latest_t").collect()
    # update mode re-emits per batch: the LAST row per key is the view
    latest = {}
    for r in rows:
        latest[r.log_type] = r.log_id
    assert latest == {"app": "2", "web": "5"}
    # and the absorbed late row never surfaced as a winner
    assert all(r.log_id != "4" for r in rows)


def test_quota_per_key_caps_rows_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _stage_quota_batches(src)
    out = stateful.quota_per_key(
        _stream(spark, src),
        "log_type",
        3,
        "log_id string, log_type string, log_ts timestamp",
    )
    _run_to_memory(out, "quota_t", str(tmp_path / "ck"))
    _assert_quota_output(spark.table("quota_t").collect())


def test_quota_per_key_tws_variant(spark, tmp_path):
    # transformWithStateInPandas speaks protobuf to the JVM state server;
    # without the protobuf wheel the Python runner crashes at init
    pytest.importorskip("google.protobuf")
    src = tmp_path / "src"
    src.mkdir()
    _stage_quota_batches(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = stateful.quota_per_key_tws(
            _stream(spark, src),
            "log_type",
            3,
            "log_id string, log_type string, log_ts timestamp",
        )
        _run_to_memory(out, "quota_tws_t", str(tmp_path / "ck"))
        _assert_quota_output(spark.table("quota_tws_t").collect())
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_static_enrichment(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "app", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "2", "log_type": "db", "log_ts": "2024-03-01T10:00:01"},
        ],
    )
    dim = spark.createDataFrame(
        [("app", "team-a"), ("db", "team-b")], "log_type string, owner string"
    )
    out = stateful.enrich_with_static(_stream(spark, src), dim, "log_type")
    _run_to_memory(out, "enrich_t", str(tmp_path / "ck"))
    owners = {r.log_id: r.owner for r in spark.table("enrich_t").collect()}
    assert owners == {"1": "team-a", "2": "team-b"}


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """purchase joins clicks of the same key within 1 hour AFTER the
    click; a click 2h earlier must not join."""
    import json as _json

    lsrc = tmp_path / "clicks"
    rsrc = tmp_path / "purchases"
    lsrc.mkdir()
    rsrc.mkdir()
    clicks = [
        {"log_id": "c1", "log_type": "u1", "log_ts": "2024-03-01T10:00:00"},
        {"log_id": "c_old", "log_type": "u1", "log_ts": "2024-03-01T07:30:00"},
    ]
    purchases = [{"log_id": "p1", "log_type": "u1", "log_ts": "2024-03-01T10:30:00"}]
    (lsrc / "a.json").write_text("\n".join(_json.dumps(r) for r in clicks))
    (rsrc / "a.json").write_text("\n".join(_json.dumps(r) for r in purchases))

    def stream_of(d):
        return (
            spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
            .json(str(d))
        )

    left = stream_of(lsrc).select(
        "log_type", F.col("log_id").alias("click_id"), F.col("log_ts").alias("click_ts")
    )
    right = stream_of(rsrc).select(
        "log_type", F.col("log_id").alias("purchase_id"), F.col("log_ts").alias("purchase_ts")
    )
    joined = stateful.join_streams_within(
        left, right, key="log_type", left_ts="click_ts", right_ts="purchase_ts"
    )
    _run_to_memory(joined, "ssj_t", str(tmp_path / "ck"))
    rows = spark.table("ssj_t").collect()
    assert [(r.click_id, r.purchase_id) for r in rows] == [("c1", "p1")]


def test_clean_stream_filters_and_dedups_across_batches(spark, tmp_path):
    """Streaming corpus cleaning: quality/langid filters are map-only;
    a duplicate text arriving in a LATER micro-batch is dropped by the
    watermarked digest state."""
    src = tmp_path / "docs_src"
    src.mkdir()
    good = "the cat and the dog run to the house and the tree is tall"
    _write_batch(
        src,
        "b1",
        [
            {"doc_id": 1, "text": good, "doc_ts": "2024-03-01T10:00:00"},
            {"doc_id": 2, "text": "zz", "doc_ts": "2024-03-01T10:00:01"},  # low quality
            {"doc_id": 3, "text": "le chat et le chien vont vers les arbres et le la le",
             "doc_ts": "2024-03-01T10:00:02"},  # french
        ],
    )
    _write_batch(
        src,
        "b2",
        [
            {"doc_id": 4, "text": good, "doc_ts": "2024-03-01T10:00:03"},  # cross-batch dup
            {"doc_id": 5, "text": "a big dog is in the house and the cat is of the tree here",
             "doc_ts": "2024-03-01T10:00:04"},
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stateful.clean_stream(stream, min_quality=0.2)
    _run_to_memory(out, "clean_t", str(tmp_path / "ck_clean"))
    ids = sorted(r.doc_id for r in spark.table("clean_t").collect())
    assert ids == [1, 5]


def test_clean_stream_state_expires_past_watermark(spark, tmp_path):
    """The bounded-state contract, both directions: a duplicate INSIDE
    the 1 h watermark horizon is dropped, and the same text re-arriving
    AFTER the digest's state has aged out past the watermark is
    re-admitted — state is bounded by the horizon, so dedup is
    horizon-scoped by design (exactly the documented tradeoff vs the
    batch near-dup compaction job)."""
    import os
    import time as _time

    src = tmp_path / "docs_exp_src"
    src.mkdir()
    good = "the cat and the dog run to the house and the tree is tall"

    def _stamp(name: str, offset: int) -> None:
        # file-source batch order follows modification time; rapid writes
        # tie on mtime granularity, so pin an explicit increasing stamp
        t = _time.time() - 100 + offset
        os.utime(f"{src}/{name}.json", (t, t))

    _write_batch(
        src, "b1", [{"doc_id": 1, "text": good, "doc_ts": "2024-03-01T10:00:00"}]
    )
    _stamp("b1", 0)
    # inside-horizon duplicate (watermark still below 10:00): dropped
    _write_batch(
        src,
        "b2",
        [
            {"doc_id": 2, "text": good, "doc_ts": "2024-03-01T10:30:00"},
            {"doc_id": 3, "text": "a big dog is in the house and the cat is of the tree here",
             "doc_ts": "2024-03-01T12:30:00"},  # advances watermark to 11:30
        ],
    )
    _stamp("b2", 10)
    # watermark is now 11:30 > the 10:00 digest's event time, but dedup
    # state eviction runs at END of batch — a dup in THIS batch is still
    # matched and dropped...
    _write_batch(
        src, "b3", [{"doc_id": 4, "text": good, "doc_ts": "2024-03-01T12:31:00"}]
    )
    _stamp("b3", 20)
    # ...and once the aged-out digest has been evicted, the same text
    # re-arriving in the NEXT batch is admitted again (bounded state)
    _write_batch(
        src, "b4", [{"doc_id": 5, "text": good, "doc_ts": "2024-03-01T12:32:00"}]
    )
    _stamp("b4", 30)
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stateful.clean_stream(stream, min_quality=0.2)
    _run_to_memory(out, "clean_exp_t", str(tmp_path / "ck_clean_exp"))
    ids = sorted(r.doc_id for r in spark.table("clean_exp_t").collect())
    assert ids == [1, 3, 5]


def test_near_dup_stream_matches_within_horizon(spark, tmp_path):
    """Streaming near-dup: an identical doc arriving in a LATER
    micro-batch within the watermark horizon is reported against the
    earlier one (identical => hamming 0, matched in all 4 simhash blocks
    => dedup the pair on (doc_id, dup_of)); an unrelated doc matches
    nothing."""
    src = tmp_path / "nd_src"
    src.mkdir()
    text = "the cat and the dog run to the house and the tree is tall today"
    other = "completely different words about spark shuffles and parquet row groups"
    _write_batch(
        src, "b1", [{"doc_id": 1, "text": text, "doc_ts": "2024-03-01T10:00:00"}]
    )
    _write_batch(
        src,
        "b2",
        [
            {"doc_id": 2, "text": text, "doc_ts": "2024-03-01T10:10:00"},
            {"doc_id": 3, "text": other, "doc_ts": "2024-03-01T10:11:00"},
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stateful.near_dup_stream(stream)
    _run_to_memory(out, "nd_t", str(tmp_path / "ck_nd"))
    rows = spark.table("nd_t").collect()
    pairs = {(r.doc_id, r.dup_of) for r in rows}
    assert pairs == {(2, 1)}
    assert all(r.hamming == 0 for r in rows)
    assert len(rows) == 4  # identical docs share all 4 blocks


def test_near_dup_stream_state_expires_past_watermark(spark, tmp_path):
    """Bounded-state contract: a duplicate arriving after the original's
    event time has fallen behind the watermark does NOT match it (state
    evicted), but matches a fresh in-horizon copy."""
    import os
    import time as _time

    src = tmp_path / "nd_exp_src"
    src.mkdir()
    text = "the cat and the dog run to the house and the tree is tall today"
    other = "completely different words about spark shuffles and parquet row groups"

    def _stamp(name: str, offset: int) -> None:
        t = _time.time() - 100 + offset
        os.utime(f"{src}/{name}.json", (t, t))

    _write_batch(
        src, "b1", [{"doc_id": 1, "text": text, "doc_ts": "2024-03-01T10:00:00"}]
    )
    _stamp("b1", 0)
    # advances the 1h watermark to 12:00 — doc1's bucket entries age out
    _write_batch(
        src, "b2", [{"doc_id": 2, "text": other, "doc_ts": "2024-03-01T13:00:00"}]
    )
    _stamp("b2", 10)
    # same text as doc1, but doc1's state is gone: no pair vs 1
    _write_batch(
        src, "b3", [{"doc_id": 3, "text": text, "doc_ts": "2024-03-01T13:01:00"}]
    )
    _stamp("b3", 20)
    # fresh in-horizon copy: pairs with doc3 only
    _write_batch(
        src, "b4", [{"doc_id": 4, "text": text, "doc_ts": "2024-03-01T13:02:00"}]
    )
    _stamp("b4", 30)
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stateful.near_dup_stream(stream)
    _run_to_memory(out, "nd_exp_t", str(tmp_path / "ck_nd_exp"))
    pairs = {(r.doc_id, r.dup_of) for r in spark.table("nd_exp_t").collect()}
    assert pairs == {(4, 3)}


def _with_rocksdb(spark):
    """Context helper for the transformWithStateInPandas variants: the
    TWS operator requires the RocksDB state store provider."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )

    return cm()


def test_latest_per_key_tws_variant(spark, tmp_path):
    """latest_per_key on transformWithStateInPandas (VERDICT r5 #7): the
    same late-arrival absorption contract as the legacy-API test."""
    pytest.importorskip("google.protobuf")
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "app", "log_ts": "2024-03-01T10:00:00"},
            {"log_id": "2", "log_type": "app", "log_ts": "2024-03-01T12:00:00"},
            {"log_id": "3", "log_type": "web", "log_ts": "2024-03-01T10:30:00"},
        ],
    )
    _write_batch(
        src,
        "b2",
        [
            {"log_id": "4", "log_type": "app", "log_ts": "2024-03-01T11:00:00"},
            {"log_id": "5", "log_type": "web", "log_ts": "2024-03-01T13:00:00"},
        ],
    )
    with _with_rocksdb(spark):
        out = stateful.latest_per_key_tws(_stream(spark, src))
        _run_to_memory(out, "latest_tws_t", str(tmp_path / "ck"), output_mode="update")
    rows = spark.table("latest_tws_t").collect()
    latest = {}
    for r in rows:
        latest[r.log_type] = r.log_id
    assert latest == {"app": "2", "web": "5"}
    assert all(r.log_id != "4" for r in rows)


def test_near_dup_stream_tws_variant(spark, tmp_path):
    """near_dup_stream on transformWithStateInPandas (VERDICT r5 #7):
    identical match semantics to the legacy-API e2e — a later identical
    doc within the horizon pairs with the earlier one in all 4 blocks."""
    pytest.importorskip("google.protobuf")
    src = tmp_path / "nd_tws_src"
    src.mkdir()
    text = "the cat and the dog run to the house and the tree is tall today"
    other = "completely different words about spark shuffles and parquet row groups"
    _write_batch(
        src, "b1", [{"doc_id": 1, "text": text, "doc_ts": "2024-03-01T10:00:00"}]
    )
    _write_batch(
        src,
        "b2",
        [
            {"doc_id": 2, "text": text, "doc_ts": "2024-03-01T10:10:00"},
            {"doc_id": 3, "text": other, "doc_ts": "2024-03-01T10:11:00"},
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    with _with_rocksdb(spark):
        out = stateful.near_dup_stream_tws(stream)
        _run_to_memory(out, "nd_tws_t", str(tmp_path / "ck_nd_tws"))
    rows = spark.table("nd_tws_t").collect()
    pairs = {(r.doc_id, r.dup_of) for r in rows}
    assert pairs == {(2, 1)}
    assert all(r.hamming == 0 for r in rows)
    assert len(rows) == 4


def test_near_dup_stream_tws_state_expires(spark, tmp_path):
    """Bounded-state contract on the TWS variant: entries behind the
    watermark are evicted, so an old duplicate does not match."""
    import os
    import time as _time

    pytest.importorskip("google.protobuf")
    src = tmp_path / "nd_tws_exp_src"
    src.mkdir()
    text = "the cat and the dog run to the house and the tree is tall today"
    other = "completely different words about spark shuffles and parquet row groups"

    def _stamp(name: str, offset: int) -> None:
        t = _time.time() - 100 + offset
        os.utime(f"{src}/{name}.json", (t, t))

    _write_batch(
        src, "b1", [{"doc_id": 1, "text": text, "doc_ts": "2024-03-01T10:00:00"}]
    )
    _stamp("b1", 0)
    _write_batch(
        src, "b2", [{"doc_id": 2, "text": other, "doc_ts": "2024-03-01T13:00:00"}]
    )
    _stamp("b2", 10)
    _write_batch(
        src, "b3", [{"doc_id": 3, "text": text, "doc_ts": "2024-03-01T13:01:00"}]
    )
    _stamp("b3", 20)
    _write_batch(
        src, "b4", [{"doc_id": 4, "text": text, "doc_ts": "2024-03-01T13:02:00"}]
    )
    _stamp("b4", 30)
    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    with _with_rocksdb(spark):
        out = stateful.near_dup_stream_tws(stream)
        _run_to_memory(out, "nd_tws_exp_t", str(tmp_path / "ck_nd_tws_exp"))
    pairs = {(r.doc_id, r.dup_of) for r in spark.table("nd_tws_exp_t").collect()}
    assert pairs == {(4, 3)}


def test_heavy_hitters_stream_space_saving(spark, tmp_path):
    """Space-Saving guarantees through a real 3-batch stream: with
    cap=4 counters and N=15 'app' rows, every item with true count >
    N/cap (u1=7, u2=4 > 3.75) must sit in the final top list; estimates
    overcount by at most max_err, and est - err never exceeds the true
    count."""
    src = tmp_path / "src"
    src.mkdir()

    def rows(items, t0):
        return [
            {"log_id": it, "log_type": "app", "log_ts": f"2024-03-01T10:00:{t0 + i:02d}"}
            for i, it in enumerate(items)
        ]

    _write_batch(src, "b1", rows(["u1"] * 4 + ["u2"] * 2 + ["u3", "u4"], 0))
    _write_batch(src, "b2", rows(["u1"] * 3 + ["u5", "u6", "u7"], 10))
    _write_batch(src, "b3", rows(["u2"] * 2 + ["u8"], 20))
    out = stateful.heavy_hitters_stream(_stream(spark, src), cap=4, topn=3)
    _run_to_memory(out, "hh_t", str(tmp_path / "ck"))
    all_rows = spark.table("hh_t").collect()
    assert all_rows
    last_v = max(r.version for r in all_rows)
    final = {r.item: r for r in all_rows if r.version == last_v}
    true = {"u1": 7, "u2": 4}
    for it, cnt in true.items():
        assert it in final, f"{it} (true {cnt} > N/cap) must be present"
        r = final[it]
        assert r.est_count >= cnt
        assert r.est_count - r.max_err <= cnt
    # top list is count-descending with deterministic item tie-break
    ordered = sorted(final.values(), key=lambda r: (-r.est_count, r.item))
    assert [r.item for r in ordered][0] == "u1"


def test_heavy_hitters_null_items_counted_under_sentinel():
    """Null items must not silently vanish from the heavy-hitter totals
    (pandas value_counts drops NaN by default — ADVICE r8): they count
    under the '<null>' sentinel, so N in the est <= true + N/cap bound
    is the full row count, consistent with anomaly_stream counting every
    row."""
    import pandas as pd

    counts = stateful._batch_item_counts(
        iter(
            [
                pd.DataFrame({"item": ["a", None, "a", None, None]}),
                pd.DataFrame({"item": [None, "b"]}),
            ]
        )
    )
    assert counts == {"a": 2, "b": 1, "<null>": 4}
    assert sum(counts.values()) == 7, "N must be the full row count"


def test_anomaly_stream_flags_volume_spike(spark, tmp_path):
    """Four steady 2-row batches build history, then a 9-row batch must
    flag for 'app'; the steady 'web' key never flags (zero-variance
    history + matching count). The z-test is the exact integer
    inequality, so this is bit-deterministic."""
    src = tmp_path / "src"
    src.mkdir()

    def batch(name, n_app, n_web, t0):
        rows = [
            {"log_id": f"a{t0+i}", "log_type": "app", "log_ts": f"2024-03-01T10:{t0:02d}:{i:02d}"}
            for i in range(n_app)
        ] + [
            {"log_id": f"w{t0+i}", "log_type": "web", "log_ts": f"2024-03-01T10:{t0:02d}:{30+i:02d}"}
            for i in range(n_web)
        ]
        _write_batch(src, name, rows)
        # the file source orders same-mtime files arbitrarily — pin
        # strictly increasing mtimes so batch order is the staged order
        import os

        os.utime(f"{src}/{name}.json", (1700000000 + t0, 1700000000 + t0))

    for i, name in enumerate(["b1", "b2", "b3", "b4"]):
        batch(name, 2, 2, i)
    batch("b5", 9, 2, 4)
    out = stateful.anomaly_stream(_stream(spark, src), window=8, min_hist=3)
    _run_to_memory(out, "anom_t", str(tmp_path / "ck"))
    rows = spark.table("anom_t").collect()
    app = sorted((r for r in rows if r.grp == "app"), key=lambda r: r.version)
    web = [r for r in rows if r.grp == "web"]
    assert len(app) == 5
    assert [r.batch_n for r in app] == [2, 2, 2, 2, 9]
    assert [r.spike for r in app] == [False, False, False, False, True]
    assert all(not r.spike for r in web)


def test_silence_stream_flags_dead_producer(spark, tmp_path):
    """'app' appears only in batch 1, 'web' in all three: with a 1 ms
    silence window, app's processing-time timer fires on a later batch
    boundary (timer-driven invocation WITHOUT input for the key) and
    emits exactly ONE silent=true row carrying its lifetime count — and
    the availableNow drain's final timer pass then fires web's expired
    timer too (end-of-input means every key has gone silent, the
    correct reading of a drained stream). State removal on firing is
    pinned by the exactly-once flag per key."""
    import os

    src = tmp_path / "src"
    src.mkdir()

    def batch(name, types, order):
        rows = [
            {"log_id": f"{t}{i}", "log_type": t, "log_ts": "2024-03-01T10:00:00"}
            for i, t in enumerate(types)
        ]
        _write_batch(src, name, rows)
        os.utime(f"{src}/{name}.json", (1700000000 + order, 1700000000 + order))

    batch("b1", ["app", "app", "web"], 0)
    batch("b2", ["web"], 1)
    batch("b3", ["web"], 2)
    out = stateful.silence_stream(_stream(spark, src), silence_ms=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sil_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    # an availableNow query with ProcessingTimeTimeout timers can stay
    # alive polling for further expirations after the drain — wait for
    # the four data/timer batches, then poll the sink for the two
    # silent rows and stop the query (it has nothing left to do)
    import time as _time

    deadline = _time.time() + 90
    while _time.time() < deadline:
        if q.awaitTermination(5):
            break
        done = [r for r in spark.table("sil_t").collect() if r.silent]
        if len(done) >= 2:
            break
    if q.isActive:
        q.stop()
    rows = spark.table("sil_t").collect()
    app_silent = [r for r in rows if r.grp == "app" and r.silent]
    web_silent = [r for r in rows if r.grp == "web" and r.silent]
    assert len(app_silent) == 1, "exactly one alert per silent key"
    assert app_silent[0].n_seen == 2
    assert len(web_silent) == 1
    assert web_silent[0].n_seen == 3
    # presence rows flow for both keys on every batch they appear in
    assert len([r for r in rows if r.grp == "app" and not r.silent]) == 1
    assert len([r for r in rows if r.grp == "web" and not r.silent]) == 3


def test_heavy_hitters_stream_tws_variant(spark, tmp_path):
    """Same Space-Saving contract through the transformWithState port
    (shared merge/emit logic with the legacy form). Skips without the
    protobuf wheel, like the other _tws e2e tests."""
    pytest.importorskip("google.protobuf")
    import os

    src = tmp_path / "src"
    src.mkdir()

    def rows(items, t0):
        return [
            {"log_id": it, "log_type": "app", "log_ts": f"2024-03-01T10:00:{t0 + i:02d}"}
            for i, it in enumerate(items)
        ]

    _write_batch(src, "b1", rows(["u1"] * 4 + ["u2"] * 2 + ["u3", "u4"], 0))
    _write_batch(src, "b2", rows(["u1"] * 3 + ["u5", "u6", "u7"], 10))
    _write_batch(src, "b3", rows(["u2"] * 2 + ["u8"], 20))
    for i, n in enumerate(["b1", "b2", "b3"]):
        os.utime(f"{src}/{n}.json", (1700000000 + i, 1700000000 + i))
    with _with_rocksdb(spark):
        out = stateful.heavy_hitters_stream_tws(_stream(spark, src), cap=4, topn=3)
        _run_to_memory(out, "hh_tws_t", str(tmp_path / "ck"))
    all_rows = spark.table("hh_tws_t").collect()
    last_v = max(r.version for r in all_rows)
    final = {r.item: r for r in all_rows if r.version == last_v}
    for it, cnt in {"u1": 7, "u2": 4}.items():
        assert it in final
        assert final[it].est_count >= cnt
        assert final[it].est_count - final[it].max_err <= cnt


def test_anomaly_stream_tws_variant(spark, tmp_path):
    """Same exact-integer z-test through the transformWithState port."""
    pytest.importorskip("google.protobuf")
    import os

    src = tmp_path / "src"
    src.mkdir()
    for i, (name, n_app) in enumerate(
        [("b1", 2), ("b2", 2), ("b3", 2), ("b4", 2), ("b5", 9)]
    ):
        _write_batch(
            src,
            name,
            [
                {"log_id": f"a{i}{j}", "log_type": "app",
                 "log_ts": f"2024-03-01T10:{i:02d}:{j:02d}"}
                for j in range(n_app)
            ],
        )
        os.utime(f"{src}/{name}.json", (1700000000 + i, 1700000000 + i))
    with _with_rocksdb(spark):
        out = stateful.anomaly_stream_tws(_stream(spark, src), window=8, min_hist=3)
        _run_to_memory(out, "anom_tws_t", str(tmp_path / "ck"))
    app = sorted(spark.table("anom_tws_t").collect(), key=lambda r: r.version)
    assert [r.batch_n for r in app] == [2, 2, 2, 2, 9]
    assert [r.spike for r in app] == [False, False, False, False, True]


def test_silence_stream_detection_latency_bound(spark, tmp_path):
    """Detection-latency contract (VERDICT r8 #4): with a live
    processingTime trigger, a key's silent=true row must land within
    silence_ms + one trigger interval + batch-processing slack of its
    last row — and NEVER before silence_ms has elapsed. 'dead' stops
    after the first file; 'live' keeps producing so micro-batches (and
    timer sweeps) keep firing."""
    import os
    import time as _time

    src = tmp_path / "src"
    src.mkdir()
    silence_ms = 1_500

    def write(idx, types):
        rows = [
            {"log_id": f"{t}{idx}", "log_type": t, "log_ts": "2024-03-01T10:00:00"}
            for t in types
        ]
        _write_batch(src, f"b{idx:03d}", rows)
        os.utime(
            f"{src}/b{idx:03d}.json", (1700000000 + idx, 1700000000 + idx)
        )
        return _time.time()

    t_dead_last = write(0, ["dead", "live"])
    out = stateful.silence_stream(_stream(spark, src), silence_ms=silence_ms)
    q = (
        out.writeStream.format("memory")
        .queryName("sil_lat_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    t_detect = None
    deadline = _time.time() + 60
    idx = 1
    while _time.time() < deadline and t_detect is None:
        write(idx, ["live"])
        idx += 1
        _time.sleep(0.4)
        for r in spark.table("sil_lat_t").collect():
            if r.grp == "dead" and r.silent:
                t_detect = _time.time()
                break
    q.stop()
    assert t_detect is not None, "silent key never detected within 60s"
    latency = t_detect - t_dead_last - silence_ms / 1000.0
    # the timer is registered when the batch CONTAINING the last row is
    # processed (>= write time), so detection can never undercut the
    # silence window measured from the write
    assert latency >= 0.0, f"fired {-latency:.2f}s before the window elapsed"
    # contract: one trigger interval (0.5s) + batch processing; 20s is
    # the generous contended-host slack, still far below the 60s rail
    assert latency <= 20.0, f"detection took {latency:.2f}s past the window"


def test_silence_stream_tws_variant(spark, tmp_path):
    """Same one-alert-per-silent-key contract through the
    transformWithState port (processing-time timers)."""
    pytest.importorskip("google.protobuf")
    import os
    import time as _time

    src = tmp_path / "src"
    src.mkdir()
    for i, (name, types) in enumerate(
        [("b1", ["app", "app", "web"]), ("b2", ["web"]), ("b3", ["web"])]
    ):
        _write_batch(
            src,
            name,
            [
                {"log_id": f"{t}{j}", "log_type": t, "log_ts": "2024-03-01T10:00:00"}
                for j, t in enumerate(types)
            ],
        )
        os.utime(f"{src}/{name}.json", (1700000000 + i, 1700000000 + i))
    with _with_rocksdb(spark):
        out = stateful.silence_stream_tws(_stream(spark, src), silence_ms=1)
        q = (
            out.writeStream.format("memory")
            .queryName("sil_tws_t")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if q.awaitTermination(5):
                break
            if len([r for r in spark.table("sil_tws_t").collect() if r.silent]) >= 2:
                break
        if q.isActive:
            q.stop()
    rows = spark.table("sil_tws_t").collect()
    app_silent = [r for r in rows if r.grp == "app" and r.silent]
    assert len(app_silent) == 1 and app_silent[0].n_seen == 2


def test_tws_expired_timer_signatures_match_framework():
    """Regression (round-8 review): pyspark invokes handleExpiredTimer
    with KEYWORD arguments (stateful_processor_util calls
    handleExpiredTimer(key=..., timerValues=..., expiredTimerInfo=...)),
    so a processor naming them snake_case raises TypeError at the first
    expiry and kills the query. The bug is invisible here because the
    TWS e2e tests protobuf-skip — this signature pin is the
    environment-independent guard, checked for every timer-bearing
    processor in the module."""
    import inspect

    for proc_cls in (stateful._NearDupProcessor, stateful._SilenceProcessor):
        params = list(
            inspect.signature(proc_cls.handleExpiredTimer).parameters
        )
        assert params[:3] == ["self", "key", "timerValues"], proc_cls
        assert params[3] == "expiredTimerInfo", proc_cls


_CUSUM_TARGET, _CUSUM_ALARM = 5, 10


def _stage_cusum_batches(src) -> None:
    _write_batch(
        src,
        "b1",
        [
            {"log_id": "1", "log_type": "app", "log_ts": "2024-03-01T10:00:00", "v": 9},
            {"log_id": "2", "log_type": "app", "log_ts": "2024-03-01T10:00:01", "v": 3},
            {"log_id": "3", "log_type": "web", "log_ts": "2024-03-01T10:00:02", "v": 12},
        ],
    )
    _write_batch(
        src,
        "b2",
        [
            {"log_id": "4", "log_type": "app", "log_ts": "2024-03-01T10:00:03", "v": 11},
            {"log_id": "5", "log_type": "app", "log_ts": "2024-03-01T10:00:04", "v": 10},
            # malformed record (no value field): must be DROPPED by the
            # fold (and excluded from n_obs), never poison the query
            {"log_id": "6", "log_type": "app", "log_ts": "2024-03-01T10:00:05"},
        ],
    )


def _cusum_stream_input(spark, src):
    return (
        spark.readStream.schema(
            "log_id string, log_type string, log_ts timestamp, v long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def _assert_cusum_trace(rows) -> None:
    def fold(vals):
        c, peak, trace = 0, 0, []
        for v in vals:
            c = max(0, c + v - _CUSUM_TARGET)
            peak = max(peak, c)
            trace.append((c, peak))
        return trace

    # 'app' over both batches: values 9,3 then 11,10
    app_trace = fold([9, 3, 11, 10])
    app_rows = sorted([r for r in rows if r.key == "app"], key=lambda r: r.n_obs)
    assert [(r.cusum, r.peak_cusum) for r in app_rows] == [
        app_trace[1],
        app_trace[3],
    ]
    # alarm is latched on the PEAK, not the end-of-batch value
    assert [r.alarm for r in app_rows] == [
        app_trace[1][1] >= _CUSUM_ALARM,
        app_trace[3][1] >= _CUSUM_ALARM,
    ]
    # n_obs counts only non-null observations (the malformed b2 record
    # is dropped, not folded and not counted)
    assert [r.n_obs for r in app_rows] == [2, 4]
    web = [r for r in rows if r.key == "web"]
    assert [(r.n_obs, r.cusum, r.alarm) for r in web] == [(1, 7, False)]


def test_cusum_stream_matches_recursive_fold(spark, tmp_path):
    """The streaming CUSUM trace must equal the textbook recursion
    folded over the same observations in (ts, id) order, across
    micro-batch boundaries (state carries C/n/peak), and the alarm
    must fire exactly when C >= alarm_at."""
    src = tmp_path / "src"
    src.mkdir()
    _stage_cusum_batches(src)
    out = stateful.cusum_stream(
        _cusum_stream_input(spark, src),
        target=_CUSUM_TARGET,
        alarm_at=_CUSUM_ALARM,
    )
    _run_to_memory(out, "cusum_t", str(tmp_path / "ck"), output_mode="update")
    _assert_cusum_trace(spark.table("cusum_t").collect())


def test_cusum_stream_tws_variant(spark, tmp_path):
    """The transformWithState port must emit the identical trace (the
    fold body is shared; this pins the wrapper/state plumbing)."""
    pytest.importorskip("google.protobuf")
    src = tmp_path / "src"
    src.mkdir()
    _stage_cusum_batches(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = stateful.cusum_stream_tws(
            _cusum_stream_input(spark, src),
            target=_CUSUM_TARGET,
            alarm_at=_CUSUM_ALARM,
        )
        _run_to_memory(out, "cusum_tws_t", str(tmp_path / "ck"), output_mode="update")
        _assert_cusum_trace(spark.table("cusum_tws_t").collect())
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_cusum_fold_input_guards():
    """The shared fold is integer-only by contract: integral floats
    (1.0) fold fine, fractional input raises instead of silently
    truncating, and a residual mass near the int64 ceiling raises
    instead of wrapping the cumulative sum (ADVICE r11)."""
    import pandas as pd
    import pytest as _pytest

    def fold(values, c=0, target=0):
        pdf = pd.DataFrame(
            {"v": values, "ts": range(len(values)), "id": range(len(values))}
        )
        return stateful._cusum_fold(c, 0, iter([pdf]), target, "v", "ts", "id")

    # integral floats are accepted (parquet often lands counts as double)
    # residuals [1,-1,2] -> CUSUM trace [1,0,2]
    c, peak, n = fold([3.0, 1.0, 4.0], target=2)
    assert (c, peak, n) == fold([3, 1, 4], target=2) == (2, 2, 3)
    # fractional input fails loudly, never truncates
    with _pytest.raises(ValueError, match="integer-only"):
        fold([1.5, 2.0])
    # residual mass at the int64 ceiling fails loudly, never wraps
    with _pytest.raises(OverflowError, match="wrap"):
        fold([2**62, 2**62])
