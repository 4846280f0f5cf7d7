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

Delivery contract: at-least-once, idempotent-by-construction on the
DECISION (a replayed batch re-probes an index that already contains
its accepted docs; re-accepted docs are the same set because a doc
never near-duplicates itself out — its own shingle set is already
indexed under its own id, and probe's id-inequality guard skips the
self-pair). Replay can append DUPLICATE index/parquet rows for those
docs; the index collapses them at the next
:func:`~...operators.dedup.compact_lsh_index` (distinct by
construction), and downstream readers of ``accept_dir`` dedupe on
``doc_id`` exactly as the ES sink dedupes on ``_id`` (the reference's
log_id idempotency, reference lambda/main.py:84-101). Run ONE ingest
stream per index path — extend-vs-extend concurrency is the standard
append-only-table exclusion ``extend_lsh_index`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D


def ingest_batch(
    batch_df: DataFrame,
    index_path: str,
    accept_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = 5000,
) -> int:
    """One micro-batch of the ingest protocol (probe → accept → extend
    → sink); returns the accepted-row count. Exposed separately so
    batch backfills and tests drive the exact code the stream runs."""
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col).persist()
    caches: list[DataFrame] = [batch]
    try:
        if D.lsh_index_exists(spark, index_path):
            buckets, shingles = D.load_lsh_index(spark, index_path)
            pairs = D.probe_lsh_index(
                buckets,
                shingles,
                batch,
                text_col=text_col,
                id_col=id_col,
                threshold_bp=threshold_bp,
                cache_registry=caches,
            )
            ids = batch.select(F.col(id_col).alias("_bid"))
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
            accepted = batch.join(rejected, id_col, "left_anti").persist()
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
            if D.lsh_index_exists(spark, index_path):
                D.extend_lsh_index(
                    accepted, index_path, text_col=text_col, id_col=id_col
                )
            else:
                D.save_lsh_index(
                    accepted, index_path, text_col=text_col, id_col=id_col
                )
            accepted.write.mode("append").parquet(accept_dir)
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
):
    """Wire :func:`ingest_batch` behind ``foreachBatch`` and return the
    (unstarted) ``DataStreamWriter`` — callers pick the trigger and
    call ``.start()``. The checkpoint makes batch replay the ONLY
    duplication mode (see the module contract above)."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch_df,
            index_path,
            accept_dir,
            text_col=text_col,
            id_col=id_col,
            threshold_bp=threshold_bp,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
