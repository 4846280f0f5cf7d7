"""Streaming vector ingest into the persisted IVF+PQ ANN index — the
similarity-search sibling of :mod:`~...streaming.index_ingest` (which
feeds the LSH near-dup index).

Per micro-batch: encode the batch's vectors against the index's
committed codebook and append their ~50-byte code rows to the current
generation (:func:`~...operators.ann_store.extend_ann_index`); a fresh
path bootstraps with :func:`~...operators.ann_store.save_ann_index`
(the first batch trains the quantizer — pick the trigger so that batch
is representative, exactly like training any IVF index on a sample).
Bootstrap hard requirement (r10 ADVICE): the deterministic seed
codebook trains on ids 0..PQ_K-1, so the FIRST batch must contain all
PQ_K seed ids — an arbitrary streaming id space (offsets, hashes,
re-keyed replicas) won't satisfy that, and ``save_ann_index`` now
REFUSES to commit the dead index it would produce. Streams over such
id spaces must bootstrap the index out-of-band (a batch
``save_ann_index`` on a re-keyed training sample) and let the stream
start in extend mode against that committed quantizer.
There is no accept/reject decision here: every vector is indexed, and
dedup/curation happen on the DOCUMENT path (index_ingest) before
embeddings exist.

Delivery contract: at-least-once; a replayed batch re-encodes against
the SAME frozen codebook, so its appended rows are byte-identical
duplicates that the next :func:`~...operators.ann_store.compact_ann_index`
collapses (one code row per id). Queries served meanwhile can see a
replayed id twice with identical codes — ADC scores tie and the
rank-by-(adist, neighbor_id) contract dedupes nothing, so serving
readers should run after compaction or dedupe on neighbor_id, the same
read discipline as any append-only table. Run ONE ingest stream per
index path (extend-vs-extend concurrency is the standard append-only
exclusion; compaction takes the cadence into the scheduler)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store
from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store


def maybe_compact_ann_index(
    spark, index_path: str, compact_after_files: int, floor: int = 0
) -> int | None:
    """Auto-compaction policy, the ANN twin of
    :func:`~...streaming.index_ingest.maybe_compact_lsh_index`
    (VERDICT r10 #6; one shared body —
    ``index_store.maybe_compact_index`` — so the twins cannot drift):
    compact when the active generation's codes artifact has grown
    ``compact_after_files`` data files past ``floor`` (growth-based:
    the list_id-partitioned codes table has an irreducible >=16-file
    floor an absolute threshold would re-trigger on forever). Every
    extend adds up to |written lists| files, and replayed batches add
    files without adding distinct ids, so growth captures both
    fragmentation and replay bloat. One listing per check, no Spark
    job; a live compact.lock skips rather than failing the batch.
    Returns the new post-compaction count (the next floor) when a
    compaction ran, else None. Safe inside ``foreachBatch`` — the
    stream is the single writer, so extend and compact are strictly
    sequential; readers stay on the previous generation until the
    manifest commit."""
    return index_store.maybe_compact_index(
        spark,
        index_path,
        compact_after_files,
        info_fn=ann_store.ann_index_info,
        artifact_key="codes",
        compact_fn=ann_store.compact_ann_index,
        floor=floor,
    )


def ingest_batch(
    batch_df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
    compact_after_files: int | None = None,
    compact_state: dict | None = None,
) -> int:
    """One micro-batch of the ANN ingest protocol; returns the indexed
    row count. Exposed separately so batch backfills and tests drive
    the exact code the stream runs. ``compact_after_files`` arms
    :func:`maybe_compact_ann_index` after the extend (None = manual
    compaction, the pre-r11 behavior); ``compact_state`` carries the
    learned post-compaction file floor across batches (the stream
    wrapper owns one per query)."""
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, vec_col).persist()
    try:
        n = batch.count()
        if not n:
            return 0
        if ann_store.ann_index_exists(spark, index_path):
            ann_store.extend_ann_index(
                batch, index_path, id_col=id_col, vec_col=vec_col
            )
        else:
            ann_store.save_ann_index(
                batch, index_path, id_col=id_col, vec_col=vec_col
            )
        if compact_after_files is not None:
            state = compact_state if compact_state is not None else {}
            new_floor = maybe_compact_ann_index(
                spark,
                index_path,
                compact_after_files,
                floor=state.get("floor", 0),
            )
            if new_floor is not None:
                state["floor"] = new_floor
        return n
    finally:
        batch.unpersist()


def ann_ingest_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
    compact_after_files: int | None = None,
):
    """Wire :func:`ingest_batch` behind ``foreachBatch`` and return the
    (unstarted) ``DataStreamWriter`` — callers pick the trigger and
    call ``.start()``. The checkpoint makes batch replay the ONLY
    duplication mode (see the module contract above).
    ``compact_after_files`` arms per-batch auto-compaction
    (:func:`maybe_compact_ann_index`); the closure owns the mutable
    floor state, so the growth-based trigger survives across this
    query's micro-batches."""
    compact_state: dict = {}

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch_df,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            compact_after_files=compact_after_files,
            compact_state=compact_state,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
