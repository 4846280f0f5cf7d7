"""Training-shard export: deterministic output-layout control.

The batch analytics surface decides WHAT goes into a training set
(dedup/quality/mixing queries); this sink controls HOW it lands on disk,
which at 100 TB is as load-bearing as the query plan:

* **Stable sharding** — each record routes to ``hash60(id) % n_shards``,
  so shard membership is a pure function of the id: re-exports, resumed
  jobs, and incremental appends all agree on where a document lives, and
  a downstream trainer can address shard ``i`` of ``n`` without a
  manifest.
* **Deterministic epoch order** — within a shard, rows are laid down in
  ``hash60(seed || ':' || id)`` order: a reproducible global permutation
  (change ``order_seed`` per epoch to reshuffle, keep it to replay a run
  bit-identically). No ``rand()`` anywhere, so the layout is independent
  of partitioning, task retries, and speculative execution.
* **Bounded files** — ``maxRecordsPerFile`` caps file size so a shard
  never degenerates into one multi-GB parquet file; because rows arrive
  at the writer already sorted, every file is a contiguous slice of the
  epoch order (file N of a shard holds permutation positions before
  file N+1's).

Scale shape: one hash-repartition on the shard id (the only shuffle) +
a per-partition sort. ``partitionBy`` emits one directory per shard;
the writer's required partition-column-prefix ordering is already
satisfied by our ``sortWithinPartitions``, so no second sort is planned.

Reference parity note: the reference (lambda/main.py:76-84) controls its
output layout only via the ES index name and S3 failed-log key; shard
layout for training corpora is engine-supplied capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60

SHARD_COL = "shard_id"
ORDER_COL = "epoch_order"


def with_shard_layout(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    order_seed: str = "epoch-0",
) -> DataFrame:
    """Attach the layout columns (pure plan, no write): stable shard id and
    the per-epoch permutation key. Split out from :func:`write_training_shards`
    so tests and audits can assert the assignment without touching disk."""
    sid = F.col(id_col).cast("string")
    return df.withColumn(
        SHARD_COL, (hash60(sid) % F.lit(n_shards)).cast("int")
    ).withColumn(
        ORDER_COL, hash60(F.concat(F.lit(f"{order_seed}:"), sid))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    n_shards: int = 8,
    records_per_file: int | None = None,
    order_seed: str = "epoch-0",
    order_col: str | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``n_shards`` shard directories of size-bounded parquet
    files in deterministic epoch order (see module docstring).

    ``order_col`` overrides the seeded-permutation order with a caller
    column — the curriculum-export path (e.g. sort each shard by a
    difficulty score so the trainer reads easy-to-hard). Ties break on the
    permutation key, so the layout stays fully deterministic either way."""
    out = with_shard_layout(df, id_col, n_shards=n_shards, order_seed=order_seed)
    sort_cols = (
        [SHARD_COL, order_col, ORDER_COL] if order_col else [SHARD_COL, ORDER_COL]
    )
    out = out.repartition(n_shards, SHARD_COL).sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", records_per_file)
    writer.partitionBy(SHARD_COL).parquet(path)


def _hadoop_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf — works
    on any Spark-supported filesystem (local, HDFS, object stores)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def committed_batch_ids(spark: SparkSession, path: str) -> set[int]:
    """Batch ids :func:`shard_sink` has durably committed under ``path``."""
    fs, markers = _hadoop_path(spark, f"{path}/_batches")
    if not fs.exists(markers):
        return set()
    return {
        int(st.getPath().getName())
        for st in fs.listStatus(markers)
        if st.getPath().getName().isdigit()
    }


def shard_sink(
    path: str,
    id_col: str,
    *,
    n_shards: int = 8,
    records_per_file: int | None = None,
    order_seed: str = "epoch-0",
):
    """``foreachBatch`` adapter for INCREMENTAL shard export — the
    standing-ingest twin of :func:`write_training_shards`. Each micro-batch
    appends into the same shard directories; because membership is a pure
    hash of the id, a document lands in the same shard no matter which
    batch delivers it, so downstream shard-addressed consumers never need
    re-export. Within a batch the epoch order applies; across batches the
    order is arrival order (per-file sortedness still holds — each file is
    one batch's contiguous slice).

    **Replay idempotence**: ``foreachBatch`` is at-least-once — a batch that
    succeeded but crashed before the checkpoint commit is re-delivered with
    the SAME ``batch_id``. Each committed batch drops a marker under
    ``{path}/_batches/{batch_id}``; a replayed id is skipped, so replays do
    not duplicate shard rows. Caveat (inherent to append-mode sinks without
    a transaction log): a crash in the narrow window between the parquet
    append finishing and the marker creation still duplicates that one
    batch on replay — for exactly-once under that failure too, land shards
    in a table format with atomic commits and make the marker part of the
    same transaction.

    Usage::

        stream.writeStream.foreachBatch(
            shard_sink(path, "doc_id", n_shards=8)
        ).trigger(availableNow=True).start()
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        fs, marker = _hadoop_path(spark, f"{path}/_batches/{batch_id}")
        if fs.exists(marker):
            return  # replayed batch — already durably written, skip
        write_training_shards(
            df,
            path,
            id_col,
            n_shards=n_shards,
            records_per_file=records_per_file,
            order_seed=order_seed,
            mode="append",
        )
        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()

    return write_batch


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read an exported shard set; ``shards`` selects a subset via partition
    pruning (the filter hits the directory listing, not row groups)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin(shards))
    return df
