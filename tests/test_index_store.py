"""Property and unit tests for the versioned-manifest commit protocol
(operators/index_store.py) on the LocalIndexFS adapter — mostly
Spark-free (milliseconds, so the randomized state-machine sweeps are
affordable), EXCEPT the two call-sequence contract tests at the bottom
(RecordingIndexFS through the real save/compact lifecycles), which use
the spark fixture. The other Spark-integrated paths
(save/extend/compact/load, Hadoop adapter) are covered in
tests/test_components.py."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store as ix


def _fs(tmp_path):
    return ix.LocalIndexFS(str(tmp_path))


def _write_manifest(fs, ver: int, arts=None, corrupt=False) -> None:
    name = f"manifest-{ver:06d}.json"
    if corrupt:
        assert fs.write_text_exclusive(name, '{"version": %d, "artif' % ver)
    else:
        arts = arts or ix.artifact_names(ver)
        assert fs.write_text_exclusive(
            name, json.dumps({"version": ver, "artifacts": arts})
        )


def test_read_manifest_empty(tmp_path):
    ver, arts, corrupt = ix.read_manifest(_fs(tmp_path))
    assert (ver, arts, corrupt) == (0, None, [])


def test_exclusive_create_is_exclusive(tmp_path):
    fs = _fs(tmp_path)
    assert fs.write_text_exclusive("x", "a")
    assert not fs.write_text_exclusive("x", "b")
    assert fs.read_text("x") == "a"


def test_newest_parseable_manifest_wins(tmp_path):
    fs = _fs(tmp_path)
    a1 = ix.artifact_names(1)
    a2 = ix.artifact_names(2)
    _write_manifest(fs, 1, a1)
    _write_manifest(fs, 2, a2)
    _write_manifest(fs, 3, corrupt=True)
    ver, arts, corrupt = ix.read_manifest(fs)
    assert ver == 2 and arts == a2
    assert corrupt == ["manifest-000003.json"]
    # the dead number stays occupied
    assert ix.next_version(fs) == 4


def test_artifact_names_unique_and_versioned():
    # default (LSH) kinds and an alternate kind set (the ANN index) both
    # produce parseable names: group(1) = kind, group(2) = version
    a, b = ix.artifact_names(7), ix.artifact_names(7)
    assert a != b
    for arts in (a, b, ix.artifact_names(7, ("codes", "codebook"))):
        for kind, name in arts.items():
            m = ix._ARTIFACT_RE.match(name)
            assert m and m.group(1) == kind and int(m.group(2)) == 7
            assert name.startswith(kind)


@settings(max_examples=50, deadline=None)
@given(
    committed=st.lists(
        st.integers(min_value=1, max_value=30), min_size=1, max_size=8, unique=True
    ),
    corrupt=st.lists(
        st.integers(min_value=1, max_value=30), max_size=4, unique=True
    ),
)
def test_reader_always_resolves_newest_parseable(tmp_path_factory, committed, corrupt):
    """For ANY interleaving of parseable and corrupt manifest files, the
    reader returns the highest parseable version and next_version is
    strictly above every file present."""
    tmp = tmp_path_factory.mktemp("prop")
    fs = ix.LocalIndexFS(str(tmp))
    arts_by_ver = {}
    for v in committed:
        arts_by_ver[v] = ix.artifact_names(v)
        _write_manifest(fs, v, arts_by_ver[v])
    for v in corrupt:
        if v not in committed:
            _write_manifest(fs, v, corrupt=True)
    ver, arts, seen_corrupt = ix.read_manifest(fs)
    assert ver == max(committed)
    assert arts == arts_by_ver[ver]
    # corrupt files ABOVE the winner are reported (readers skipped them)
    assert set(seen_corrupt) == {
        f"manifest-{v:06d}.json" for v in corrupt if v not in committed and v > ver
    }
    assert ix.next_version(fs) == max(committed + [v for v in corrupt]) + 1


@settings(max_examples=30, deadline=None)
@given(
    n_generations=st.integers(min_value=2, max_value=6),
    orphan_versions=st.lists(
        st.integers(min_value=1, max_value=5), max_size=3, unique=True
    ),
    kinds=st.sampled_from(
        [("shingles", "buckets"), ("codes", "codebook"), ("segments",)]
    ),
)
def test_gc_keeps_exactly_two_generations(
    tmp_path_factory, n_generations, orphan_versions, kinds
):
    """After GC at the newest commit: the committed and previous
    generations' dirs survive, everything older (and every orphan dir
    below the committed version) is gone, and exactly the previous +
    committed manifests remain — for ANY artifact-kind set (the
    protocol is generic: LSH shingles/buckets, ANN codes/codebook, or
    a single-kind index)."""
    tmp = tmp_path_factory.mktemp("gc")
    fs = ix.LocalIndexFS(str(tmp))
    arts_by_ver = {}
    for v in range(1, n_generations + 1):
        arts_by_ver[v] = ix.artifact_names(v, kinds)
        for d in arts_by_ver[v].values():
            os.makedirs(f"{tmp}/{d}")
        _write_manifest(fs, v, arts_by_ver[v])
    orphans = []
    for v in orphan_versions:
        if v <= n_generations:  # an orphan below or at existing versions
            name = f"{kinds[0]}-{v:06d}-feedf00d"
            os.makedirs(f"{tmp}/{name}")
            orphans.append((v, name))
    # a foreign-kind dir must NEVER be collected, whatever its version
    # (a miswired root cannot lose another index type's data)
    os.makedirs(f"{tmp}/foreignkind-000001-deadbeef")

    top = n_generations
    ix.gc_index(fs, top, kinds)
    names = set(os.listdir(tmp))
    for v, arts in arts_by_ver.items():
        for d in arts.values():
            assert (d in names) == (v >= top - 1), (v, d)
    for v, name in orphans:
        assert (name in names) == (v >= top), (v, name)
    assert "foreignkind-000001-deadbeef" in names
    manifests = {n for n in names if n.startswith("manifest-")}
    want = {f"manifest-{top:06d}.json"}
    if top >= 2:
        want.add(f"manifest-{top - 1:06d}.json")
    assert manifests == want


def test_gc_spares_concurrent_higher_staging(tmp_path):
    """Dirs staged for a HIGHER version than the committed one (a
    concurrent writer mid-flight) must never be collected."""
    fs = _fs(tmp_path)
    a1 = ix.artifact_names(1)
    for d in a1.values():
        os.makedirs(f"{tmp_path}/{d}")
    _write_manifest(fs, 1, a1)
    future = f"buckets-{2:06d}-cafebabe"
    os.makedirs(f"{tmp_path}/{future}")
    ix.gc_index(fs, 1)
    assert os.path.isdir(f"{tmp_path}/{future}")
    for d in a1.values():
        assert os.path.isdir(f"{tmp_path}/{d}")


def test_gc_never_touches_the_lock(tmp_path):
    fs = _fs(tmp_path)
    a1 = ix.artifact_names(1)
    for d in a1.values():
        os.makedirs(f"{tmp_path}/{d}")
    _write_manifest(fs, 1, a1)
    ix.acquire_compact_lock(fs, 3600.0)
    ix.gc_index(fs, 1)
    assert os.path.exists(f"{tmp_path}/{ix.LOCK_NAME}")
    ix.release_compact_lock(fs)
    assert not os.path.exists(f"{tmp_path}/{ix.LOCK_NAME}")


def test_lock_live_blocks_stale_breaks(tmp_path):
    fs = _fs(tmp_path)
    ix.acquire_compact_lock(fs, 3600.0)
    with pytest.raises(RuntimeError, match="already running"):
        ix.acquire_compact_lock(fs, 3600.0)
    # stale: timeout 0 treats any lock as dead and re-takes it
    ix.acquire_compact_lock(fs, 0.0)
    body = json.loads(fs.read_text(ix.LOCK_NAME))
    assert "token" in body and "acquired_unix" in body


def test_commit_conflict_raises(tmp_path):
    fs = _fs(tmp_path)
    ix.commit_manifest(fs, 1, ix.artifact_names(1))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        ix.commit_manifest(fs, 1, ix.artifact_names(1))


def test_gc_version_guard_protects_committed_generation(tmp_path):
    """The committed generation survives GC via the artifact VERSION
    guard, not name matching (ADVICE r9: the retired live-set seeding
    minted fresh random tokens that matched nothing on disk) — and a
    same-version losing racer's orphan dir likewise survives until a
    later commit passes it."""
    fs = _fs(tmp_path)
    a1, a2 = ix.artifact_names(1), ix.artifact_names(2)
    for arts in (a1, a2):
        for d in arts.values():
            os.makedirs(f"{tmp_path}/{d}")
    _write_manifest(fs, 1, a1)
    _write_manifest(fs, 2, a2)
    racer = "shingles-000002-0ddba110"
    os.makedirs(f"{tmp_path}/{racer}")
    ix.gc_index(fs, 2)
    names = set(os.listdir(tmp_path))
    for arts in (a1, a2):
        assert set(arts.values()) <= names
    assert racer in names


def _stage_crashed_legacy(path: str, artifacts=("shingles", "buckets")) -> None:
    """A legacy index that died mid-cutover: the only intact artifact
    copies sit in .old_compact, with a half-cut-over empty fake in
    place that must LOSE to the backup."""
    os.makedirs(f"{path}/.old_compact")
    for art in artifacts:
        os.makedirs(f"{path}/.old_compact/{art}")
        with open(f"{path}/.old_compact/{art}/part-0.parquet", "w") as f:
            f.write("INTACT")
    os.makedirs(f"{path}/{artifacts[0]}")  # empty half-cut-over fake


def test_heal_concurrent_readers_never_destroy_the_backup(tmp_path):
    """ADVICE r9 (medium): two readers of a crashed-cutover legacy index
    heal concurrently; the claim-by-rename protocol must guarantee the
    restored artifacts survive every interleaving — before the claim,
    reader B could rmtree the artifact reader A had just restored."""
    import threading

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    for trial in range(20):
        p = str(tmp_path / f"t{trial}")
        _stage_crashed_legacy(p)
        errs: list[Exception] = []

        def heal(path=p):
            try:
                D._heal_legacy_cutover_crash(path)
            except Exception as e:  # noqa: BLE001 — the test asserts none
                errs.append(e)

        threads = [threading.Thread(target=heal) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[0]
        for art in ("shingles", "buckets"):
            with open(f"{p}/{art}/part-0.parquet") as f:
                assert f.read() == "INTACT", (trial, art)
        leftovers = [n for n in os.listdir(p) if n.startswith(".old_compact")]
        assert not leftovers, (trial, leftovers)


def test_heal_adopts_stale_claim_but_not_a_fresh_one(tmp_path):
    """A healer that crashed MID-restore leaves its claim dir behind;
    a later heal adopts it once it is older than the staleness bound
    (birth time is in the NAME — dir mtimes survive rename). A FRESH
    claim is a live healer and must be left alone."""
    import time

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    p = str(tmp_path / "stale")
    os.makedirs(p)
    stale = f"{p}/.old_compact.healing-{int(time.time() - 3600)}-deadbeef"
    os.makedirs(f"{stale}/buckets")
    with open(f"{stale}/buckets/part-0.parquet", "w") as f:
        f.write("INTACT")
    D._heal_legacy_cutover_crash(p)
    with open(f"{p}/buckets/part-0.parquet") as f:
        assert f.read() == "INTACT"
    assert not [n for n in os.listdir(p) if n.startswith(".old_compact")]

    p2 = str(tmp_path / "fresh")
    os.makedirs(p2)
    fresh = f"{p2}/.old_compact.healing-{int(time.time())}-deadbeef"
    os.makedirs(f"{fresh}/buckets")
    with open(f"{fresh}/buckets/part-0.parquet", "w") as f:
        f.write("INTACT")
    D._heal_legacy_cutover_crash(p2)
    assert os.path.isdir(fresh)  # live healer's claim untouched
    assert not os.path.exists(f"{p2}/buckets")


def test_version_width_is_future_proof(tmp_path):
    """Version 1,000,000 (7 digits) must still commit, resolve, and
    order above six-digit versions."""
    fs = _fs(tmp_path)
    _write_manifest(fs, 999_999)
    ix.commit_manifest(fs, 1_000_000, ix.artifact_names(1_000_000))
    ver, _arts, _ = ix.read_manifest(fs)
    assert ver == 1_000_000
    assert ix.next_version(fs) == 1_000_001


def test_gc_rejects_kind_incomplete_prev_manifest(tmp_path):
    """Round-10 review: GC must apply the same manifest-validity rule
    readers do. A parseable manifest missing a required kind is one
    readers SKIP (they fall back to the legacy dirs), so it must not
    count as the protected previous generation — otherwise GC would
    collect the legacy layout in-flight readers actually resolved to,
    one cycle early."""
    import os

    fs = ix.LocalIndexFS(str(tmp_path))
    # legacy layout readers resolve to (manifest 1 is kind-incomplete)
    os.makedirs(f"{tmp_path}/shingles")
    os.makedirs(f"{tmp_path}/buckets")
    _write_manifest(fs, 1, {"shingles": "shingles-000001-aa"})
    os.makedirs(f"{tmp_path}/shingles-000001-aa")
    ver, arts, _corrupt = ix.read_manifest(fs)
    assert arts is None  # readers skip the incomplete manifest

    # a compaction (reading the legacy layout) commits version 2
    a2 = ix.artifact_names(2)
    for d in a2.values():
        os.makedirs(f"{tmp_path}/{d}")
    _write_manifest(fs, 2, a2)
    ix.gc_index(fs, 2)

    names = set(os.listdir(tmp_path))
    # the legacy dirs ARE the previous generation — they survive this
    # cycle; the incomplete manifest and its orphan dir are collected
    assert {"shingles", "buckets"} <= names
    assert "manifest-000001.json" not in names
    assert "shingles-000001-aa" not in names
    for d in a2.values():
        assert d in names


# ---------------------------------------------------------------------
# Commit-point call-sequence contract through a RECORDING adapter
# (VERDICT r10 #5): the file:// e2e runs prove the protocol works on
# two Hadoop FileSystem implementations, but they cannot prove WHICH
# calls carry the correctness burden. This mock — the same six-method
# adapter surface index_fs() returns — records every control-plane
# call and delegates to the local adapter, so the tests below pin the
# EXACT sequence any new scheme adapter must honor: the commit is ONE
# write_text_exclusive of the next manifest (never exists-then-write,
# never delete+rewrite of a manifest name), staged data precedes the
# commit, and GC deletes strictly AFTER it.


class RecordingIndexFS:
    def __init__(self, inner) -> None:
        self.inner = inner
        self.calls: list[tuple[str, str]] = []
        self.root = inner.root

    def _rec(self, op: str, rel: str = ""):
        self.calls.append((op, rel))

    def exists(self, rel):
        self._rec("exists", rel)
        return self.inner.exists(rel)

    def listdir(self):
        self._rec("listdir")
        return self.inner.listdir()

    def read_text(self, rel):
        self._rec("read_text", rel)
        return self.inner.read_text(rel)

    def write_text_exclusive(self, rel, text):
        self._rec("write_text_exclusive", rel)
        return self.inner.write_text_exclusive(rel, text)

    def delete(self, rel):
        self._rec("delete", rel)
        self.inner.delete(rel)

    def mtime(self, rel):
        self._rec("mtime", rel)
        return self.inner.mtime(rel)

    def count_files(self, rel):
        self._rec("count_files", rel)
        return self.inner.count_files(rel)


def test_save_commit_sequence_is_one_exclusive_create(
    spark, sf_dir, tmp_path, monkeypatch
):
    """save_lsh_index through the recording adapter: exactly ONE
    exclusive manifest create, it is the LAST control-plane mutation,
    no manifest is ever deleted or probed-then-written, and the staged
    artifact dirs exist on disk BEFORE the commit call fires."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rec: dict[str, RecordingIndexFS] = {}
    real_index_fs = ix.index_fs

    def spy(spark_arg, path):
        fs = RecordingIndexFS(real_index_fs(spark_arg, path))
        rec["fs"] = fs
        return fs

    monkeypatch.setattr(ix, "index_fs", spy)
    # make the commit-time staging check possible: wrap commit_manifest
    # to snapshot the staged dirs at the moment of the create
    staged_at_commit: dict[str, bool] = {}
    real_commit = ix.commit_manifest

    def commit_spy(fs, version, artifacts):
        staged_at_commit["all_staged"] = all(
            os.path.isdir(os.path.join(fs.root, d)) for d in artifacts.values()
        )
        real_commit(fs, version, artifacts)

    monkeypatch.setattr(ix, "commit_manifest", commit_spy)
    monkeypatch.setattr(D.index_store, "index_fs", spy, raising=False)
    monkeypatch.setattr(
        D.index_store, "commit_manifest", commit_spy, raising=False
    )

    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    D.save_lsh_index(docs.filter(F.col("doc_id") % 7 == 0), str(tmp_path / "idx"))

    calls = rec["fs"].calls
    creates = [c for c in calls if c[0] == "write_text_exclusive"]
    assert len(creates) == 1 and creates[0][1] == "manifest-000001.json"
    assert staged_at_commit["all_staged"]  # data staged before commit
    deletes = [c for c in calls if c[0] == "delete"]
    assert deletes == []  # a save never deletes anything
    # the exclusive create is the FINAL mutation — nothing writes after
    assert calls.index(creates[0]) == len(calls) - 1 or all(
        op in ("exists", "listdir", "read_text", "mtime", "count_files")
        for op, _ in calls[calls.index(creates[0]) + 1 :]
    )


def test_compact_sequence_locks_then_commits_then_gcs(
    spark, sf_dir, tmp_path, monkeypatch
):
    """compact_lsh_index through the recording adapter: the exact order
    any adapter must support is lock-create -> (rewrite) -> manifest
    exclusive-create -> GC deletes -> lock release. Deleting anything
    BEFORE the manifest create would destroy the live generation on a
    crash; releasing the lock before GC would let a second compactor
    race the deletes."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    D.save_lsh_index(docs.filter(F.col("doc_id") % 7 == 0), path)
    D.extend_lsh_index(docs.filter(F.col("doc_id") % 7 == 1), path)

    rec: dict[str, RecordingIndexFS] = {}
    real_index_fs = ix.index_fs

    def spy(spark_arg, p):
        fs = RecordingIndexFS(real_index_fs(spark_arg, p))
        rec.setdefault("fs", fs)
        return rec["fs"] if rec["fs"].root == fs.root else fs

    monkeypatch.setattr(ix, "index_fs", spy)
    monkeypatch.setattr(D.index_store, "index_fs", spy, raising=False)

    D.compact_lsh_index(spark, path)

    calls = rec["fs"].calls
    creates = [
        (i, rel)
        for i, (op, rel) in enumerate(calls)
        if op == "write_text_exclusive"
    ]
    # exactly two exclusive creates: the lock, then the next manifest
    assert [rel for _i, rel in creates] == [
        ix.LOCK_NAME,
        "manifest-000002.json",
    ]
    lock_i, manifest_i = creates[0][0], creates[1][0]
    deletes = [
        (i, rel) for i, (op, rel) in enumerate(calls) if op == "delete"
    ]
    assert deletes, "GC must run"
    first_delete = deletes[0][0]
    assert lock_i < manifest_i < first_delete  # lock -> commit -> GC
    # the lock release is the LAST delete (GC never touches the lock;
    # pinned separately above) and happens after every GC delete
    assert deletes[-1][1] == ix.LOCK_NAME
    assert all(rel != ix.LOCK_NAME for _i, rel in deletes[:-1])


# ------------------------------------------- concurrent reader window


def test_lsh_reader_survives_concurrent_compaction(spark, sf_dir, tmp_path):
    """A reader that resolved the index BEFORE a compaction commits must
    keep working and see a coherent single generation (VERDICT r11 #8):
    the manifest is read once, both artifacts come from that generation,
    GC keeps exactly one previous generation alive for in-flight
    readers, and the old-generation probe equals the new-generation
    probe (collapse-only compaction is semantics-preserving). A SECOND
    compaction is the retention boundary: generation 1's dirs are gone."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
    path = str(tmp_path / "lsh_live")
    D.save_lsh_index(docs, path)
    # replayed append -> duplicate rows, so the compaction really rewrites
    D.extend_lsh_index(docs.filter(F.col("doc_id") % 7 == 0), path)

    # in-flight reader: resolves generation 1 and BUILDS its plan now
    info_old = D.lsh_index_info(spark, path)
    b_old, s_old = D.load_lsh_index(spark, path)
    plan_old = D.probe_lsh_index(b_old, s_old, batch)

    # a compaction commits generation 2 mid-window (collapse only)
    D.compact_lsh_index(spark, path)
    info_new = D.lsh_index_info(spark, path)
    assert info_new["version"] == info_old["version"] + 1
    # the reader's generation is retained for in-flight use...
    assert os.path.isdir(info_old["buckets"]) and os.path.isdir(
        info_old["shingles"]
    )
    # ...and both its artifacts are from the SAME (old) generation —
    # never a mix of generations (names are <kind>-<ver>-<suffix>)
    ver_tag = f"-{info_old['version']:06d}-"
    assert ver_tag in os.path.basename(info_old["buckets"])
    assert ver_tag in os.path.basename(info_old["shingles"])

    got_old = {tuple(r) for r in plan_old.collect()}  # executes NOW
    b_new, s_new = D.load_lsh_index(spark, path)
    got_new = {
        tuple(r) for r in D.probe_lsh_index(b_new, s_new, batch).collect()
    }
    assert got_old == got_new
    assert got_new, "fixture must exercise near-dups across the window"

    # retention boundary: the NEXT compaction GCs generation 1
    D.compact_lsh_index(spark, path)
    assert not os.path.exists(info_old["buckets"])
    assert not os.path.exists(info_old["shingles"])


def test_ann_reader_survives_concurrent_compaction(spark, sf_dir, tmp_path):
    """The ANN twin of the LSH concurrent-reader pin: a serving plan
    built on generation 1 artifacts executes correctly after a
    compaction commits generation 2, its results equal the fresh-load
    serving path, and the frozen-quantizer contract means the codebook
    is IDENTICAL across the window."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store as A
    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    emb = load_split(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    queries = vecs.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ann_live")
    A.save_ann_index(vecs, path)
    # replayed append -> duplicate code rows for the compactor to collapse
    A.extend_ann_index(vecs.filter(F.col("vec_id") % 9 == 0), path)

    info_old = A.ann_index_info(spark, path)
    codes_old, cb_old = A.load_ann_index(spark, path)
    plan_old = S.knn_ivfpq_rerank_indexed(codes_old, cb_old, vecs, queries)

    A.compact_ann_index(spark, path)
    info_new = A.ann_index_info(spark, path)
    assert info_new["version"] == info_old["version"] + 1
    assert os.path.isdir(info_old["codes"])

    got_old = {tuple(r) for r in plan_old.collect()}
    codes_new, cb_new = A.load_ann_index(spark, path)
    got_new = {
        tuple(r)
        for r in S.knn_ivfpq_rerank_indexed(
            codes_new, cb_new, vecs, queries
        ).collect()
    }
    assert got_old == got_new and got_new
    # frozen quantizer: the codebook is byte-identical across generations
    cb_a = sorted(map(tuple, cb_old.collect()))
    cb_b = sorted(map(tuple, cb_new.collect()))
    assert cb_a == cb_b
