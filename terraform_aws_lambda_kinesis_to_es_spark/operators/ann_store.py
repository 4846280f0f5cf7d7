"""Persisted IVF+PQ ANN index over the versioned-manifest commit
protocol — the similarity-search sibling of the LSH near-dup index
(``operators/dedup.py`` save/extend/compact/probe), sharing the same
``operators/index_store.py`` metadata-log (numbered immutable artifact
generations, commit = one exclusive manifest create, object-store-safe
on any Spark-writable URI).

Reference parity note: the reference engine has no vector index at all
(its only data path is the 174-line dict loop in lambda/main.py); this
is part of the repo's large-scale training-data layer. The index
format itself is :func:`~...operators.similarity.ivfpq_index`'s
(id, list_id, codes) table hive-partitioned by inverted list plus the
constant PQ_M x PQ_K codebook — see similarity.py for the FAISS-style
ADC math (Jégou et al. 2011).

Lifecycle:

* :func:`save_ann_index` — build codes + codebook in one corpus scan,
  stage both into a fresh versioned generation, commit.
* :func:`extend_ann_index` — encode a NEW batch of vectors against the
  committed generation's codebook (the frozen quantizer — standard IVF
  practice: assignment must use the same centroids the standing codes
  used, or probe recall silently degrades) and append its code rows to
  the current codes artifact. Appends add parquet files without
  touching committed ones, so no manifest change is needed. Ids must
  be new (no tombstones; replacing = compact with ``drop_ids``).
* :func:`compact_ann_index` — collapse replayed appends (one code row
  per id), drop tombstoned ids, rewrite into a NEW self-contained
  generation (codes AND codebook — a generation never references a
  prior generation's dirs, so GC stays per-generation), commit, GC.
  Retraining the quantizer is NOT compaction — that changes every
  list assignment, i.e. it is a fresh :func:`save_ann_index` build.
* :func:`load_ann_index` / probe — resolve the newest parseable
  manifest; serve with
  :func:`~...operators.similarity.knn_ivfpq_indexed` (ADC over probed
  lists, dynamic partition pruning on list_id) or the re-rank variant.

Pre-manifest indexes written by the retired plain-parquet layout
(bare ``codes``/``codebook`` dirs) keep loading (version 0, legacy);
the first compaction migrates them into generation 1. The legacy
writer was ``mode("overwrite")`` — it had NO crash window to heal
(a writer that died mid-overwrite left unreadable parquet, which is
exactly why the manifest protocol exists), so unlike the LSH index
there is no legacy cutover-heal path here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store
from terraform_aws_lambda_kinesis_to_es_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    ivfpq_index,
    knn_ivfpq_indexed,
    knn_ivfpq_rerank_indexed,
    pq_codebook,
)

ANN_KINDS = ("codes", "codebook")

__all__ = [
    "ann_index_exists",
    "ann_index_info",
    "compact_ann_index",
    "extend_ann_index",
    "knn_ivfpq_indexed",
    "knn_ivfpq_rerank_indexed",
    "load_ann_index",
    "save_ann_index",
]


def ann_index_info(spark, path: str) -> dict:
    """Resolve the index's current committed state: ``{"version": int,
    "codes": dir-URI, "codebook": dir-URI, "legacy": bool}``. Version 0
    + legacy=True is the retired unversioned plain-parquet layout —
    it keeps loading, and the first compaction migrates it."""
    fs = index_store.index_fs(spark, path)
    ver, arts, _corrupt = index_store.read_manifest(fs, ANN_KINDS)
    if arts is None:
        return {
            "version": 0,
            "codes": f"{path}/codes",
            "codebook": f"{path}/codebook",
            "legacy": True,
        }
    return {
        "version": ver,
        "codes": f"{path}/{arts['codes']}",
        "codebook": f"{path}/{arts['codebook']}",
        "legacy": False,
    }


def ann_index_exists(spark, path: str) -> bool:
    """True when ``path`` holds a loadable ANN index (a committed
    manifest generation or the legacy layout) — the control-plane
    bootstrap probe, mirroring ``dedup.lsh_index_exists``."""
    fs = index_store.index_fs(spark, path)
    _ver, arts, _corrupt = index_store.read_manifest(fs, ANN_KINDS)
    if arts is not None:
        return True
    return fs.exists("codes") and fs.exists("codebook")


def save_ann_index(
    corpus: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "v"
) -> None:
    """Materialize the IVF+PQ index as a fresh versioned generation
    under ``path``, committed by one exclusive manifest create:

    * ``codes-{N}`` — (id, list_id, codes), PARTITIONED BY list_id: a
      probe that touches p of k lists reads p/k of the files (dynamic
      partition pruning from the broadcast probe join), so serving cost
      scales with probe coverage, not corpus size — on top of the ~50
      bytes/vector the codes already are.
    * ``codebook-{N}`` — the constant PQ_M x PQ_K (m, code, cv) table:
      always broadcastable, and the frozen quantizer every later
      :func:`extend_ann_index` batch must encode against.

    The codebook subtree (a corpus scan) is built once and feeds both
    the index build and the codebook artifact write (the r6 ADVICE
    single-scan rule save_ivfpq_index established). Staged dirs are
    invisible until the manifest commit; saving over an existing index
    supersedes it (the old generation's dirs are collected by the next
    compaction's GC).

    Seed-id requirement (r10 ADVICE): :func:`pq_codebook`'s
    deterministic seed rule trains on the corpus vectors with
    ``id_col`` values 0..PQ_K-1, so all PQ_K seed ids must be present
    in ``corpus``. A corpus keyed by an arbitrary id space (hashes,
    offsets, re-keyed streams) that misses them would yield a partial
    or empty codebook — every later extend would encode to nothing and
    probes would silently return nothing — so this raises at build
    time instead of committing a dead index. Re-key the seed batch
    (dense 0..n-1 ids) or swap in
    :func:`~...operators.similarity.pq_codebook_refined` seeded from a
    re-keyed sample."""
    spark = corpus.sparkSession
    fs = index_store.index_fs(spark, path)
    ver = index_store.next_version(fs)
    arts = index_store.artifact_names(ver, ANN_KINDS)
    cb = pq_codebook(corpus, id_col, vec_col).persist()
    try:
        # one job, two facts: total rows AND distinct (m, code) keys.
        # Distinct matters (round-11 review): duplicate ids inside the
        # seed range would keep the TOTAL at PQ_M*PQ_K while a seed id
        # is missing — and duplicate (m, code) rows fan out the ADC
        # broadcast join, silently corrupting every probe's ranking.
        stats = cb.agg(
            F.count("*").alias("n"),
            F.count_distinct("m", "code").alias("nd"),
        ).first()
        want = PQ_M * PQ_K
        if stats["n"] != want or stats["nd"] != want:
            raise ValueError(
                f"pq_codebook is malformed: {stats['n']} rows / "
                f"{stats['nd']} distinct (m, code) keys, need exactly "
                f"{want} of each — the corpus must hold each of the "
                f"PQ_K={PQ_K} seed ids ({id_col} in 0..{PQ_K - 1}) "
                "exactly once. Committing would produce a dead or "
                "ranking-corrupting index (missing seeds: extends encode "
                "to nothing, probes return nothing; duplicate seeds: the "
                "ADC join fans out). Re-key the seed batch to a dense "
                "0-based id space or train on a re-keyed sample."
            )
        idx = ivfpq_index(corpus, id_col, vec_col, codebook=cb)
        idx.write.partitionBy("list_id").mode("overwrite").parquet(
            f"{path}/{arts['codes']}"
        )
        cb.write.mode("overwrite").parquet(f"{path}/{arts['codebook']}")
    finally:
        cb.unpersist()
    index_store.commit_manifest(fs, ver, arts)


def load_ann_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read back (codes, codebook) — the generation named by the newest
    parseable manifest, or the legacy unversioned layout."""
    info = ann_index_info(spark, path)
    return (
        spark.read.parquet(info["codes"]),
        spark.read.parquet(info["codebook"]),
    )


def extend_ann_index(
    new_vecs: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "v"
) -> None:
    """Append a new batch of vectors to a saved index: encode the batch
    against the CURRENT generation's committed codebook (never a fresh
    one — quantizer drift between codes rows breaks the single-metric
    ADC contract) and append its (id, list_id, codes) rows to the
    current codes artifact. One artifact, one append — no multi-file
    failure window (the LSH index's shingles-before-buckets ordering
    concern has no analogue here). Ids must be new; replayed appends
    produce byte-identical rows that the next compaction collapses.

    Do not append concurrently with :func:`compact_ann_index` — the
    compactor snapshots the current generation, so rows appended during
    its rewrite vanish at its commit (the standard append-vs-rewrite
    exclusion of any append-only table)."""
    spark = new_vecs.sparkSession
    info = ann_index_info(spark, path)
    cb = spark.read.parquet(info["codebook"])
    ivfpq_index(new_vecs, id_col, vec_col, codebook=cb).write.partitionBy(
        "list_id"
    ).mode("append").parquet(info["codes"])


def compact_ann_index(
    spark,
    path: str,
    drop_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    lock_timeout_s: float = 3600.0,
) -> None:
    """Rewrite the index to its canonical minimal form — one code row
    per id (replayed :func:`extend_ann_index` appends collapse) minus
    every id in ``drop_ids`` (a one-column tombstone frame) — into a
    NEW versioned generation, commit, GC. After compaction, probes are
    IDENTICAL to probing a fresh :func:`save_ann_index` build of the
    surviving corpus WHEN the codebook seeds survive (the codebook is
    carried, not retrained — dropping a seed vector's id drops its
    code rows but keeps the trained quantizer, exactly like FAISS
    remove_ids). A legacy plain-parquet index migrates into
    generation 1 here; its bare dirs are collected one cycle later.

    ``compact.lock`` (exclusive create, mtime staleness) keeps this
    single-writer; the manifest's exclusive create is the correctness
    backstop if a lock is force-broken. Cost shape: one
    dropDuplicates keyed by id (map-side combining) over the ~50
    byte/vector codes plus a broadcast anti-join on the tombstones —
    band-parallel off the list_id partitioning at 100 TB scale."""
    fs = index_store.index_fs(spark, path)
    index_store.acquire_compact_lock(fs, lock_timeout_s)
    try:
        codes, cb = load_ann_index(spark, path)
        if drop_ids is not None:
            keep = F.broadcast(
                drop_ids.select(F.col(drop_ids.columns[0]).alias(id_col)).distinct()
            )
            codes = codes.join(keep, id_col, "left_anti")
        ver = index_store.next_version(fs)
        arts = index_store.artifact_names(ver, ANN_KINDS)
        codes.dropDuplicates([id_col]).write.partitionBy("list_id").mode(
            "overwrite"
        ).parquet(f"{path}/{arts['codes']}")
        cb.write.mode("overwrite").parquet(f"{path}/{arts['codebook']}")
        index_store.commit_manifest(fs, ver, arts)
        index_store.gc_index(fs, ver, ANN_KINDS)
    finally:
        index_store.release_compact_lock(fs)
