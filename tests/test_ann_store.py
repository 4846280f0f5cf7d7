"""Persisted ANN (IVF+PQ) index lifecycle over the versioned-manifest
commit protocol — save / extend / compact / probe, crash and legacy
behavior, and the file:// HadoopIndexFS serving path. Mirrors the LSH
index's lifecycle pins in test_components.py / test_index_store.py on
the similarity-search sibling."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store, similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    N_QUERY_VECS,
    _vec,
)

SPLIT = 400  # base = vec_id < SPLIT (holds all PQ_K codebook seeds), batch = rest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _probe(spark, path, queries, k=5):
    index, cb = ann_store.load_ann_index(spark, path)
    return _rows(ann_store.knn_ivfpq_indexed(index, cb, queries, k=k))


def test_ann_extend_then_probe_equals_fresh_build(spark, sf_dir, tmp_path):
    """save(base) + extend(batch) must probe IDENTICALLY to a fresh
    inline build over base+batch: the batch ids are all >= PQ_K, so the
    fresh build's codebook seeds equal the persisted generation's and
    the comparison is exact — the incremental-ingest contract (new
    vectors encode against the frozen quantizer)."""
    vecs = _vec(spark, sf_dir)
    base = vecs.filter(F.col("vec_id") < SPLIT)
    batch = vecs.filter(F.col("vec_id") >= SPLIT)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")

    ann_store.save_ann_index(base, path)
    assert ann_store.ann_index_exists(spark, path)
    info = ann_store.ann_index_info(spark, path)
    assert info["version"] == 1 and not info["legacy"]

    ann_store.extend_ann_index(batch, path)
    # appends never move the committed generation
    assert ann_store.ann_index_info(spark, path)["version"] == 1

    assert _probe(spark, path, queries) == _rows(S.knn_ivfpq(vecs, queries, k=5))


def test_ann_crash_garbage_is_invisible_and_collected(spark, sf_dir, tmp_path):
    """Orphan staged dirs (writer died before its manifest create) and
    a truncated manifest (writer died mid-create) must not move the
    resolved generation; the next compaction collects both."""
    vecs = _vec(spark, sf_dir).filter(F.col("vec_id") < SPLIT)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")
    ann_store.save_ann_index(vecs, path)
    before = _probe(spark, path, queries)

    os.makedirs(f"{path}/codes-000002-deadbeef/list_id=0", exist_ok=True)
    os.makedirs(f"{path}/codebook-000002-deadbeef", exist_ok=True)
    with open(f"{path}/manifest-000002.json", "w", encoding="utf-8") as f:
        f.write('{"version": 2, "arti')  # truncated mid-create

    info = ann_store.ann_index_info(spark, path)
    assert info["version"] == 1
    assert _probe(spark, path, queries) == before

    # compaction claims the next free number (2 is occupied by the dead
    # writer's truncated file), then GC sweeps the garbage
    ann_store.compact_ann_index(spark, path)
    info = ann_store.ann_index_info(spark, path)
    assert info["version"] == 3
    names = set(os.listdir(path))
    assert "manifest-000002.json" not in names
    assert "codes-000002-deadbeef" not in names
    assert "codebook-000002-deadbeef" not in names
    assert _probe(spark, path, queries) == before


def test_ann_compact_collapses_replays_and_drops_tombstones(
    spark, sf_dir, tmp_path
):
    """A replayed extend appends byte-identical rows; compaction must
    collapse them to one code row per id, remove tombstoned ids, and
    probe identically to a fresh build of the surviving corpus (the
    tombstones are non-seed ids, so the fresh build's codebook
    matches the carried one)."""
    vecs = _vec(spark, sf_dir)
    base = vecs.filter(F.col("vec_id") < SPLIT)
    batch = vecs.filter(F.col("vec_id") >= SPLIT)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")

    ann_store.save_ann_index(base, path)
    ann_store.extend_ann_index(batch, path)
    ann_store.extend_ann_index(batch, path)  # replay (at-least-once ingest)
    codes, _cb = ann_store.load_ann_index(spark, path)
    assert codes.count() == 500 + 100  # replay rows present pre-compaction

    drop = spark.createDataFrame(
        [(i,) for i in range(450, 500)], "vec_id bigint"
    )
    ann_store.compact_ann_index(spark, path, drop_ids=drop)

    codes, _cb = ann_store.load_ann_index(spark, path)
    assert codes.count() == 450
    assert codes.filter(F.col("vec_id") >= 450).count() == 0
    survivors = vecs.filter(F.col("vec_id") < 450)
    assert _probe(spark, path, queries) == _rows(
        S.knn_ivfpq(survivors, queries, k=5)
    )


def test_ann_legacy_layout_loads_and_migrates(spark, sf_dir, tmp_path):
    """A pre-manifest index (bare codes/ + codebook/ dirs, the retired
    plain-parquet layout) keeps loading as version 0; the first
    compaction migrates it into generation 1, keeping the bare dirs one
    cycle for in-flight readers; the second collects them."""
    vecs = _vec(spark, sf_dir).filter(F.col("vec_id") < SPLIT)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")
    cb = S.pq_codebook(vecs)
    S.ivfpq_index(vecs, codebook=cb).write.partitionBy("list_id").parquet(
        f"{path}/codes"
    )
    cb.write.parquet(f"{path}/codebook")

    assert ann_store.ann_index_exists(spark, path)
    info = ann_store.ann_index_info(spark, path)
    assert info["legacy"] and info["version"] == 0
    want = _rows(S.knn_ivfpq(vecs, queries, k=5))
    assert _probe(spark, path, queries) == want

    ann_store.compact_ann_index(spark, path)
    info = ann_store.ann_index_info(spark, path)
    assert info["version"] == 1 and not info["legacy"]
    assert os.path.isdir(f"{path}/codes")  # previous generation kept

    ann_store.compact_ann_index(spark, path)
    assert not os.path.isdir(f"{path}/codes")
    assert not os.path.isdir(f"{path}/codebook")
    assert _probe(spark, path, queries) == want


def test_ann_gc_keeps_exactly_one_previous_generation(spark, sf_dir, tmp_path):
    """A superseding save leaves the old generation on disk (saves never
    GC); compaction's GC then keeps the immediately-previous generation
    for in-flight readers and collects everything older."""
    vecs = _vec(spark, sf_dir).filter(F.col("vec_id") < SPLIT)
    path = str(tmp_path / "ann")
    ann_store.save_ann_index(vecs, path)
    ann_store.save_ann_index(vecs, path)  # supersede -> version 2

    def gens(kind):
        return sorted(
            n for n in os.listdir(path) if n.startswith(f"{kind}-")
        )

    assert len(gens("codes")) == 2 and len(gens("codebook")) == 2

    ann_store.compact_ann_index(spark, path)  # -> version 3, GC
    assert ann_store.ann_index_info(spark, path)["version"] == 3
    assert {g.split("-")[1] for g in gens("codes")} == {"000002", "000003"}


def test_ann_index_hadoop_fs_adapter(spark, sf_dir, tmp_path):
    """The full lifecycle through a scheme:// URI (file:// exercises the
    HadoopIndexFS control plane end-to-end, same as the LSH index's
    adapter test): save, extend, compact, probe — results identical to
    the local-path run."""
    vecs = _vec(spark, sf_dir)
    base = vecs.filter(F.col("vec_id") < SPLIT)
    batch = vecs.filter(F.col("vec_id") >= SPLIT)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    uri = f"file://{tmp_path}/ann_remote"

    ann_store.save_ann_index(base, uri)
    ann_store.extend_ann_index(batch, uri)
    ann_store.compact_ann_index(spark, uri)
    info = ann_store.ann_index_info(spark, uri)
    assert info["version"] == 2 and info["codes"].startswith("file://")
    assert _probe(spark, uri, queries) == _rows(S.knn_ivfpq(vecs, queries, k=5))

def test_ann_save_refuses_dead_index_when_seed_ids_missing(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE: a corpus whose id space misses the PQ_K codebook
    seed ids (0..PQ_K-1) — e.g. a re-keyed streaming batch — must fail
    LOUDLY at build time, not commit an index whose empty codebook
    makes every later extend encode nothing and every probe return
    nothing. Nothing may be committed: the path must still read as
    index-absent afterwards."""
    import pytest

    vecs = _vec(spark, sf_dir).filter(F.col("vec_id") < SPLIT)
    rekeyed = vecs.withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )  # the bench's NEW_ID_BASE-style shift: no id < PQ_K survives
    path = str(tmp_path / "ann_dead")
    with pytest.raises(ValueError, match="seed ids"):
        ann_store.save_ann_index(rekeyed, path)
    assert not ann_store.ann_index_exists(spark, path)


def test_ann_serving_recall_floor_and_rerank_rule(spark, sf_dir, tmp_path):
    """VERDICT r10 #4: the q_ann_probe_curve finding, pinned on the
    SERVING path. Measured on the test embeddings (deterministic seed
    codebook): pure-ADC recall@10 vs exact-L2 truth DEGRADES as probes
    widen (0.40 @ 2 -> 0.34 @ 8 — quantized-distance impostors
    displace true neighbors), while the rerank path converts the wider
    candidate coverage into recall (0.88 @ 4 -> 0.94 @ 8). Pins:
    (a) the recall-oriented serving default knn_ivfpq_rerank_indexed
    at its RERANK_PROBES default holds a 0.90 recall floor;
    (b) rerank beats pure ADC at the same probe width (the reason the
    rerank stage exists); (c) the ADC non-monotonicity itself (narrow
    probes >= wide probes on this corpus) — if a code change makes ADC
    monotone, the docstring rule needs re-deriving, so fail loudly."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.similarity import (
        RERANK_PROBES,
    )

    vecs = _vec(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ann")
    ann_store.save_ann_index(vecs, path)
    index, cb = ann_store.load_ann_index(spark, path)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_bruteforce_l2(vecs, queries, k=10).collect()
    }

    def recall(df) -> float:
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(got & truth) / len(truth)

    adc_narrow = recall(
        ann_store.knn_ivfpq_indexed(index, cb, queries, k=10, n_probes=2)
    )
    adc_wide = recall(
        ann_store.knn_ivfpq_indexed(index, cb, queries, k=10, n_probes=8)
    )
    rerank_default = recall(
        ann_store.knn_ivfpq_rerank_indexed(
            index, cb, vecs, queries, k=10, n_probes=RERANK_PROBES
        )
    )
    assert rerank_default >= 0.90, rerank_default  # (a) serving floor
    assert rerank_default > adc_wide  # (b) rerank converts coverage
    assert adc_narrow >= adc_wide  # (c) the non-monotonicity the rule cites


def test_ann_save_refuses_duplicate_seed_ids(spark, sf_dir, tmp_path):
    """Round-11 review: a corpus with a DUPLICATE id inside the seed
    range (and therefore a missing one) keeps the codebook's raw row
    count at PQ_M*PQ_K while the (m, code) key set is short — the
    row-count-only guard would commit a codebook whose duplicate keys
    fan out the ADC join and silently corrupt every probe's ranking.
    The distinct-keyed guard must refuse it."""
    import pytest

    from terraform_aws_lambda_kinesis_to_es_spark.operators.similarity import PQ_K

    vecs = _vec(spark, sf_dir).filter(F.col("vec_id") < SPLIT)
    dup = vecs.withColumn(
        "vec_id",
        F.when(F.col("vec_id") == PQ_K - 1, F.lit(0)).otherwise(
            F.col("vec_id")
        ),
    )
    path = str(tmp_path / "ann_dup")
    with pytest.raises(ValueError, match="exactly once"):
        ann_store.save_ann_index(dup, path)
    assert not ann_store.ann_index_exists(spark, path)
