"""E2E: streaming near-dup ingest against the persisted LSH index
(streaming/index_ingest.py) — VERDICT r9 #5's named candidates:
foreachBatch dedup consulting the durable index, AND the serving-path
probe against a REMOTE-SCHEME (file:// URI -> HadoopIndexFS) manifest
index, in one pipeline.

The independent oracle is a driver-side greedy simulation over the
EXACT verified near-dup pair set (minhash_dedup_pairs over the whole
doc universe): process batches in stream order; a doc is rejected iff
it pairs with an indexed doc, or with a lower-id doc of its own batch;
accepted docs join the index only after their batch."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
from terraform_aws_lambda_kinesis_to_es_spark.streaming.index_ingest import (
    ingest_batch,
    neardup_ingest_stream,
)


def _stage_batches(src_dir: str, batches: list[list[dict]]) -> None:
    base = time.time() - len(batches) - 10
    for i, rows in enumerate(batches):
        path = f"{src_dir}/b{i:05d}.json"
        with open(path, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        os.utime(path, (base + i, base + i))


def _simulate(seed_ids, batches, pair_set):
    """Greedy replay of the ingest decision rule on the exact pair set:
    pair_set holds frozenset({a, b}) for every verified near-dup pair."""
    indexed = set(seed_ids)
    accepted_all = []
    for rows in batches:
        ids = sorted(r["doc_id"] for r in rows)
        batch_ids = set(ids)
        accepted = []
        for d in ids:
            vs_index = any(frozenset((d, s)) in pair_set for s in indexed)
            vs_batch = any(
                frozenset((d, a)) in pair_set for a in batch_ids if a < d
            )
            if not vs_index and not vs_batch:
                accepted.append(d)
        indexed |= set(accepted)
        accepted_all.extend(accepted)
    return set(accepted_all), indexed


def test_neardup_ingest_stream_matches_greedy_oracle(spark, sf_dir, tmp_path):
    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    # exact verified pair universe, engine-side (the recall-1 banded
    # detector minhash_dedup_pairs — probe_lsh_index's proven twin)
    pair_set = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in D.minhash_dedup_pairs(docs).collect()
    }
    seed_ids = [r["doc_id"] for r in seed.collect()]
    batches = [
        [{"doc_id": r["doc_id"], "text": r["text"]} for r in b.collect()]
        for b in (b1, b2)
    ]
    want_accepted, want_indexed = _simulate(seed_ids, batches, pair_set)
    assert want_accepted and len(want_accepted) < len(batches[0]) + len(
        batches[1]
    ), "fixture must reject some docs and accept others"

    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_batches(src, batches)
    index_uri = f"file://{tmp_path}/index"  # remote-scheme serving path
    accept_dir = str(tmp_path / "accepted")
    ck = str(tmp_path / "ck")

    D.save_lsh_index(seed, index_uri)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        neardup_ingest_stream(stream, index_uri, accept_dir, ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "ingest stream did not finish"

    got_accepted = {
        r["doc_id"] for r in spark.read.parquet(accept_dir).collect()
    }
    assert got_accepted == want_accepted

    # the index now serves exactly seed + accepted (shingled docs only:
    # sub-shingle-length docs never enter any LSH index generation)
    _b, s = D.load_lsh_index(spark, index_uri)
    got_indexed = {r["doc_id"] for r in s.select("doc_id").distinct().collect()}
    shingled = {
        r["doc_id"]
        for r in D.with_hashed_shingles(docs)
        .filter(F.size("sh_hashes") > 0)
        .select("doc_id")
        .collect()
    }
    assert got_indexed == want_indexed & shingled

    # extend never bumps the generation; the seed's save committed v1
    assert D.lsh_index_info(spark, index_uri)["version"] == 1


def test_ingest_batch_replay_is_decision_idempotent(spark, sf_dir, tmp_path):
    """The module contract (strengthened in the round-10 review):
    replaying a batch whose accepted docs the index already contains
    recognizes every shingled doc as redelivered-or-rejected and
    accepts NOTHING new — the index gets no duplicate rows, the sink
    no duplicate files. (Sub-shingle-length docs never enter any index
    generation, so they are re-accepted on replay — the documented
    sink-side at-least-once mode.)"""
    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)

    path = str(tmp_path / "idx")
    acc1 = str(tmp_path / "a1")
    D.save_lsh_index(seed, path)
    n1 = ingest_batch(batch, path, acc1)
    first = {r["doc_id"] for r in spark.read.parquet(acc1).collect()}
    assert n1 == len(first)
    _b, s1 = D.load_lsh_index(spark, path)
    rows_before = s1.count()

    acc2 = str(tmp_path / "a2")
    n2 = ingest_batch(batch, path, acc2)  # replay after its own extend
    unshingled = {
        r["doc_id"]
        for r in D.with_hashed_shingles(batch)
        .filter(F.size("sh_hashes") == 0)
        .select("doc_id")
        .collect()
    }
    assert n2 == len(first & unshingled)  # only sub-shingle docs re-accept
    _b, s2 = D.load_lsh_index(spark, path)
    assert s2.count() == rows_before  # no duplicate index rows from replay


def test_ingest_redelivered_doc_never_loses_to_a_new_near_dup(
    spark, sf_dir, tmp_path
):
    """Round-10 review regression: an already-indexed doc redelivered in
    a later batch alongside a NEW lower-id near-dup must win — the old
    rule left both ids 'in batch', rejected the INDEXED doc via the
    within-batch lower-id tiebreak, and accepted its near-dup, planting
    a permanent duplicate pair in the standing corpus."""
    text = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd watches in silence under grey skies"
    )
    seed = spark.createDataFrame([(9, text)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(5, text + " extra"), (9, text)], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    D.save_lsh_index(seed, path)

    n = ingest_batch(batch, path, acc)
    assert n == 0  # doc 5 rejected against the index; doc 9 recognized
    _b, s = D.load_lsh_index(spark, path)
    got = [(r["doc_id"],) for r in s.select("doc_id").collect()]
    assert got == [(9,)]  # exactly one generation row, no near-dup pair


def test_ingest_batch_bootstraps_fresh_index(spark, sf_dir, tmp_path):
    """First batch on an empty path: intra-batch dedup only, then the
    accepted set becomes generation 1."""
    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 3 == 1)
    path = str(tmp_path / "fresh")
    acc = str(tmp_path / "acc")
    assert not D.lsh_index_exists(spark, path)
    n = ingest_batch(batch, path, acc)
    assert n > 0
    assert D.lsh_index_exists(spark, path)
    pairs = D.minhash_dedup_pairs(batch)
    rejected = {r["doc_b"] for r in pairs.collect()}
    batch_ids = {r["doc_id"] for r in batch.collect()}
    assert {
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    } == batch_ids - rejected


def test_ingest_stream_auto_compaction_matches_greedy_oracle(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 #6: with the per-batch file-count auto-compaction
    armed (compact_after_files=1 — every micro-batch triggers one), the
    stream's accept set and final served index must STILL equal the
    greedy oracle's (nothing dropped, nothing duplicated), and the
    generation number must prove compactions committed mid-stream."""
    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    pair_set = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in D.minhash_dedup_pairs(docs).collect()
    }
    seed_ids = [r["doc_id"] for r in seed.collect()]
    batches = [
        [{"doc_id": r["doc_id"], "text": r["text"]} for r in b.collect()]
        for b in (b1, b2)
    ]
    want_accepted, want_indexed = _simulate(seed_ids, batches, pair_set)

    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_batches(src, batches)
    index_uri = f"file://{tmp_path}/index"  # remote-scheme serving path
    accept_dir = str(tmp_path / "accepted")
    ck = str(tmp_path / "ck")

    D.save_lsh_index(seed, index_uri)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        neardup_ingest_stream(
            stream, index_uri, accept_dir, ck, compact_after_files=1
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "ingest stream did not finish"

    got_accepted = {
        r["doc_id"] for r in spark.read.parquet(accept_dir).collect()
    }
    assert got_accepted == want_accepted

    _b, s = D.load_lsh_index(spark, index_uri)
    got_indexed = {r["doc_id"] for r in s.select("doc_id").distinct().collect()}
    shingled = {
        r["doc_id"]
        for r in D.with_hashed_shingles(docs)
        .filter(F.size("sh_hashes") > 0)
        .select("doc_id")
        .collect()
    }
    assert got_indexed == want_indexed & shingled
    # no duplicate rows survive the final compaction: one bucket-row set
    # per (doc, band) — distinct equals raw count on (doc_id, band)
    b_rows, _sh = D.load_lsh_index(spark, index_uri)
    assert b_rows.count() == b_rows.distinct().count()

    # seed save committed v1; each micro-batch's policy compaction
    # committed a new generation on top
    assert D.lsh_index_info(spark, index_uri)["version"] > 1


def test_auto_compaction_growth_trigger_and_lock_skip(spark, sf_dir, tmp_path):
    """Round-11 review fixes on the policy itself: (a) the trigger is
    GROWTH past the learned post-compaction floor, not absolute count —
    the band-partitioned buckets artifact floors at >=32 files, so an
    absolute threshold <= 32 would re-trigger a full index rewrite on
    every batch forever; (b) a live compact.lock (e.g. left by a
    crashed compactor, stale for up to its timeout) SKIPS the policy
    compaction instead of failing the micro-batch whose sink/extend are
    already durable."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import (
        dedup as D,
        index_store as ix,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    from terraform_aws_lambda_kinesis_to_es_spark.streaming.index_ingest import (
        maybe_compact_lsh_index,
    )

    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    D.save_lsh_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    D.extend_lsh_index(docs.filter(F.col("doc_id") % 3 == 1), path)

    floor = maybe_compact_lsh_index(spark, path, 1, floor=0)
    assert floor is not None and floor >= 1  # compacted, floor learned
    v_after = D.lsh_index_info(spark, path)["version"]

    # (a) zero growth since the compaction: count >= an absolute
    # threshold of 1, but growth past the floor is 0 -> must NOT run
    assert maybe_compact_lsh_index(spark, path, 1, floor=floor) is None
    assert D.lsh_index_info(spark, path)["version"] == v_after

    # (b) growth armed again, but a live lock is held: skip, not raise
    D.extend_lsh_index(docs.filter(F.col("doc_id") % 3 == 2), path)
    fs = ix.index_fs(spark, path)
    assert fs.write_text_exclusive(ix.LOCK_NAME, "{}")
    assert maybe_compact_lsh_index(spark, path, 1, floor=floor) is None
    assert D.lsh_index_info(spark, path)["version"] == v_after
    fs.delete(ix.LOCK_NAME)

    # lock released: the same call now compacts
    assert maybe_compact_lsh_index(spark, path, 1, floor=floor) is not None
    assert D.lsh_index_info(spark, path)["version"] == v_after + 1
