"""connected_components: min-label propagation over near-dup pair lists."""

from __future__ import annotations

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
    connected_components,
    connected_components_star,
    minhash_dedup_pairs,
    near_dup_clusters,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.u: r.label for r in connected_components(df, **kw).collect()}


def test_two_components_and_clique(spark):
    # component {1,2,3} (clique), component {10,11}
    got = _run(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_propagation(spark):
    # a 6-vertex path: the min label must travel 5 hops
    got = _run(spark, [(5, 6), (6, 7), (7, 8), (8, 9), (9, 10)])
    assert got == {v: 5 for v in range(5, 11)}


def test_direction_invariance(spark):
    # undirected: reversed edge lists give identical clusters
    edges = [(3, 1), (2, 3), (9, 4)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 4, 9: 4}


def test_max_iter_falls_back_to_star(spark):
    # a chain longer than max_iter can't converge by label propagation;
    # the call must hand off to the star algorithm and still return
    # EXACT labels, not a partial propagation
    got = _run(spark, [(5, 6), (6, 7), (7, 8), (8, 9)], max_iter=1)
    assert got == {v: 5 for v in range(5, 10)}


@pytest.mark.parametrize("n", [0, 1])
def test_tiny_edge_lists(spark, n):
    edges = [(1, 2)][:n]
    got = _run(spark, edges)
    assert got == ({1: 1, 2: 1} if n else {})


def _run_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.u: r.label for r in connected_components_star(df, **kw).collect()}


def test_star_matches_label_propagation_on_small_graphs(spark):
    cases = [
        [(1, 2), (2, 3), (1, 3), (10, 11)],          # clique + pair
        [(5, 6), (6, 7), (7, 8), (8, 9), (9, 10)],   # path
        [(3, 1), (2, 3), (9, 4)],                    # reversed edges
        [(1, 2)],
        [],
    ]
    for edges in cases:
        assert _run_star(spark, edges) == _run(spark, edges), edges


def test_star_long_chain_logarithmic_rounds(spark):
    # an 80-node path: label propagation would need ~80 rounds; the star
    # algorithm must close it well inside its round bound and EXACTLY
    got = _run_star(spark, [(i, i + 1) for i in range(80)], max_rounds=12)
    assert got == {v: 0 for v in range(81)}


def test_star_random_graph_agrees(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_star(spark, edges) == _run(spark, edges, max_iter=60)


def test_collapsed_clusters_equal_raw_pipeline(spark, sf_dir):
    """near_dup_clusters (digest-collapse before LSH/CC) must be
    OUTPUT-IDENTICAL to running LSH + connected components on the raw
    corpus — the optimization's core claim. Covers exact-dup groups with
    and without external near-dup edges, and short-doc exclusion."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold_bp=5000)
    raw = sorted(
        (r.u, r.label)
        for r in connected_components(pairs, src="doc_a", dst="doc_b").collect()
    )
    collapsed = sorted(
        (r.doc_id, r.cluster_id)
        for r in near_dup_clusters(docs, threshold_bp=5000).collect()
    )
    assert collapsed == raw


def test_collapsed_clusters_synthetic_shapes(spark):
    """Edge cases the scale-factor corpus may not contain: an exact-dup
    group with NO external edge (grp_n fallback), an exact-dup group
    bridged to a near-dup neighbor, and short docs (no shingles) that
    must never cluster even when byte-identical."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (1, base), (2, base), (3, base),        # exact clique...
        (4, near),                              # ...bridged by near-dup
        (10, "one two three four five six"),    # isolated exact pair,
        (11, "one two three four five six"),    # no external edge
        (20, "tiny doc"), (21, "tiny doc"),     # <5 tokens: excluded
        (30, "completely different words entirely unrelated content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(docs, threshold_bp=5000).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    raw_pairs = minhash_dedup_pairs(docs, threshold_bp=5000)
    raw = {
        r.u: r.label
        for r in connected_components(raw_pairs, src="doc_a", dst="doc_b").collect()
    }
    assert raw == got


def test_containment_detects_subset_jaccard_misses(spark):
    """A doc fully contained in a much longer doc must score containment
    10000 bp while its Jaccard stays under the dedup threshold — the case
    q_shingle_containment exists for."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], "doc_id long, text string"
    )
    sh = D.with_shingles(docs)
    a, b = (
        {r.doc_id: set(r.shingles) for r in sh.collect()}[1],
        {r.doc_id: set(r.shingles) for r in sh.collect()}[2],
    )
    inter, union = len(a & b), len(a | b)
    assert 10000 * inter // len(a) == 10000  # fully contained
    assert 10000 * inter // union < 5000  # Jaccard-threshold dedup misses it


def test_prefix_filter_superset_of_overlap_pairs(spark):
    """prefix_filtered_pairs must contain EVERY pair meeting the overlap
    bound |A∩B| >= ceil(overlap_bp*min/10000) — exactness of the AllPairs/
    PPJoin prefix scheme on a randomized corpus with hot shared shingles,
    partial overlaps, and subset relations."""
    import itertools
    import random

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        k = rng.randint(1, 12)
        # bias toward low-index words -> hot shingles + frequent overlap
        words = sorted({vocab[min(rng.randint(0, 39), rng.randint(0, 39))] for _ in range(k)})
        docs.append((i, words))
    sdf = spark.createDataFrame(docs, "doc_id long, shingles array<string>")

    sets = dict(docs)
    for overlap_bp, cap in ((5000, None), (6666, 5000)):
        got = {
            (r.id_a, r.id_b)
            for r in D.prefix_filtered_pairs(
                sdf, overlap_bp=overlap_bp, size_cap_bp=cap
            ).collect()
        }
        for a, b in itertools.combinations(sets, 2):
            sa, sb = set(sets[a]), set(sets[b])
            if not sa or not sb:
                continue
            mn = min(len(sa), len(sb))
            need = -(-overlap_bp * mn // 10000)  # ceil
            ok_size = cap is None or cap * max(len(sa), len(sb)) <= 10000 * mn
            if len(sa & sb) >= need and ok_size:
                assert (min(a, b), max(a, b)) in got, (a, b, sa, sb)
        # and no self-pairs / ordering violations
        assert all(x < y for x, y in got)


def test_prefix_filter_query_equality_unfiltered(spark, sf_dir):
    """The prefix-filtered q_shingle_containment and exact-Jaccard truth
    set must equal the share-ANY-shingle generation on real data — the
    filter prunes only candidates the threshold would reject anyway."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
        CONTAIN_MIN_BP,
        JACCARD_THRESHOLD_BP,
        q_shingle_containment,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    shingled = D.with_shingles(docs).persist()
    ex = shingled.select("doc_id", F.explode("shingles").alias("g"))
    share_all = D.pairs_within_buckets(ex, ["g"], "doc_id")

    # containment leg
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    old = {
        tuple(r)
        for r in share_all.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .filter(
            F.expr(
                f"greatest((10000 * inter) DIV size(sh_a),"
                f" (10000 * inter) DIV size(sh_b)) >= {CONTAIN_MIN_BP}"
            )
        )
        .select("id_a", "id_b")
        .collect()
    }
    new = {
        (r.doc_a, r.doc_b) for r in q_shingle_containment(spark, sf_dir).collect()
    }
    assert new == old

    # exact-Jaccard truth leg (the q_lsh_eval / q_dup_method_agreement form)
    t = JACCARD_THRESHOLD_BP
    truth_old = {
        (r.doc_a, r.doc_b)
        for r in D.verify_pairs_jaccard(share_all, shingled, threshold_bp=t).collect()
    }
    pref = D.prefix_filtered_pairs(
        shingled, overlap_bp=20000 * t // (10000 + t), size_cap_bp=t
    )
    truth_new = {
        (r.doc_a, r.doc_b)
        for r in D.verify_pairs_jaccard(pref, shingled, threshold_bp=t).collect()
    }
    assert truth_new == truth_old
    shingled.unpersist()


def test_prefix_filter_window_df_equals_joinback_df(spark, sf_dir):
    """r12 optimization pin: prefix_filtered_pairs computes per-gram
    document frequency with a count window over the gram partition
    (one exchange) instead of the former groupBy+join-back (two). The
    candidate pair set must be IDENTICAL to the join-back form — the
    completeness proof depends on df, so any drift here silently voids
    the superset guarantee."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split as ls

    docs = ls(spark, sf_dir, "documents")
    shingled = D.with_shingles(docs).persist()
    got = {
        (r.id_a, r.id_b)
        for r in D.prefix_filtered_pairs(
            shingled, overlap_bp=6666, size_cap_bp=5000
        ).collect()
    }
    # join-back reference implementation (the pre-r12 form), inline
    ex = shingled.select(
        F.col("doc_id").alias("_id"),
        F.explode("shingles").alias("g"),
        F.size("shingles").alias("sz"),
    )
    dfreq = ex.groupBy("g").agg(F.count("*").alias("df"))
    ranked = ex.join(dfreq, "g").withColumn(
        "rn", F.expr("row_number() OVER (PARTITION BY _id ORDER BY df, g)")
    )
    flagged = ranked.withColumn(
        "in_pref",
        F.expr("rn <= sz - ((CAST(6666 AS BIGINT) * sz + 9999) DIV 10000) + 1"),
    ).filter(F.col("df") > 1)
    grouped = flagged.groupBy("g").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("sz").alias("s"),
                    F.col("_id").alias("i"),
                    F.col("in_pref").alias("p"),
                )
            )
        ).alias("ms")
    )
    ref = {
        (r.id_a, r.id_b)
        for r in grouped.filter(F.size("ms") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, k) -> CASE WHEN x.p THEN"
                    " transform(filter(slice(ms, k + 2, size(ms)),"
                    "                  y -> 5000 * y.s <= 10000 * x.s),"
                    " y -> struct(least(x.i, y.i) AS id_a, greatest(x.i, y.i) AS id_b))"
                    " ELSE CAST(array() AS array<struct<id_a: bigint, id_b: bigint>>) END))"
                )
            ).alias("pr")
        )
        .select(F.col("pr.id_a"), F.col("pr.id_b"))
        .distinct()
        .collect()
    }
    shingled.unpersist()
    assert got == ref and got


def test_prefix_filter_collapses_boilerplate_hot_buckets(spark):
    """The regime prefix filtering exists for: a boilerplate sentence
    shared by EVERY doc makes each of its shingles an n-sized hot bucket,
    so share-ANY-shingle candidates are Θ(n²) while true near-dups are
    rare. Frequency-ordered prefixes sort df=n shingles last, so docs
    with enough distinct content never index them — candidates collapse
    to ~the true pairs while the verified output stays identical."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    n = 200
    boiler = "this website uses cookies to improve your experience okay"
    rows = []
    for i in range(n):
        body = " ".join(f"tok{i}x{j}" for j in range(10))
        rows.append((i, f"{boiler} {body}"))
    # plant 5 true near-dup pairs (same body, one token appended)
    for i in range(5):
        base = rows[i][1]
        rows.append((n + i, base + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingled = D.with_shingles(docs).persist()
    ex = shingled.select("doc_id", F.explode("shingles").alias("g"))
    n_share = D.pairs_within_buckets(ex, ["g"], "doc_id").count()
    t = 5000
    pref = D.prefix_filtered_pairs(
        shingled, overlap_bp=20000 * t // (10000 + t), size_cap_bp=t
    )
    n_pref = pref.count()
    assert n_share > (n * (n - 1)) // 2  # the boilerplate quadratic
    assert n_pref < n_share / 50  # collapsed: candidates track true dups
    # and the verified truth is unchanged
    all_truth = {
        (r.doc_a, r.doc_b)
        for r in D.verify_pairs_jaccard(
            D.pairs_within_buckets(ex, ["g"], "doc_id"), shingled, threshold_bp=t
        ).collect()
    }
    pref_truth = {
        (r.doc_a, r.doc_b)
        for r in D.verify_pairs_jaccard(pref, shingled, threshold_bp=t).collect()
    }
    assert pref_truth == all_truth
    assert len(pref_truth) >= 5
    shingled.unpersist()


def test_ivfpq_index_persistence_roundtrip(spark, sf_dir, tmp_path):
    """save_ivfpq_index -> load_ivfpq_index -> knn_ivfpq_indexed must
    rank IDENTICALLY to the build-inline knn_ivfpq (and likewise for the
    re-rank pair) — the production build-once/serve-many contract. Also
    pins the at-rest layout: codes are hive-partitioned by list_id, so
    probe-selective reads prune files."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        N_QUERY_VECS,
        _vec,
    )

    from terraform_aws_lambda_kinesis_to_es_spark.operators import ann_store

    vecs = _vec(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    path = str(tmp_path / "ivfpq")
    S.save_ivfpq_index(vecs, path)

    # since round 10 the save commits a versioned-manifest generation
    # (ann_store); resolve the live codes dir through it
    info = ann_store.ann_index_info(spark, path)
    assert not info["legacy"] and info["version"] == 1
    parts = [d for d in os.listdir(info["codes"]) if d.startswith("list_id=")]
    assert parts, "codes must be hive-partitioned by list_id"

    index, codebook = S.load_ivfpq_index(spark, path)
    served = S.knn_ivfpq_indexed(index, codebook, queries)
    # the broadcast probe join on the partition column plants a dynamic
    # partition pruning subquery on the codes scan — only probed lists'
    # files are read (the at-rest form of probe selectivity)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in S.knn_ivfpq(vecs, queries).collect())
    assert got == want

    got_rr = sorted(
        tuple(r)
        for r in S.knn_ivfpq_rerank_indexed(
            index, codebook, vecs, queries
        ).collect()
    )
    want_rr = sorted(tuple(r) for r in S.knn_ivfpq_rerank(vecs, queries).collect())
    assert got_rr == want_rr


def test_exhaustive_rail_blocks_oversized_corpus(spark, sf_dir):
    """VERDICT r6 #5: the exhaustive baselines are bounded-audit
    contracts — above the documented row rail they must refuse with a
    pointer to the scale sibling, and the rail must be conf-overridable
    (and disabled by 0). Driver values at fixture SFs are unchanged:
    every fixture corpus is far below the default rail (pinned here)."""
    import pytest
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _vec,
    )

    vecs = _vec(spark, sf_dir)
    assert vecs.count() < S.EXHAUSTIVE_MAX_ROWS  # fixtures stay railed-in

    # tiny synthetic frame + a tiny conf rail: proves the refusal without
    # materializing 100k rows
    small = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("v"),
    )
    spark.conf.set(S._EXHAUSTIVE_CONF, "10")
    try:
        with pytest.raises(ValueError, match="exhaustive-baseline rail"):
            S.near_dup_pairs_exact(small, 0.5)
        with pytest.raises(ValueError, match="knn_ivfpq"):
            S.knn_bruteforce(small, small.limit(2))
        with pytest.raises(ValueError, match="assign_bucketed_seeds"):
            S.assign_exhaustive(
                small.withColumn("nrm", S.norm(F.col("v"))),
                small.limit(2).select(
                    F.col("vec_id").alias("cluster"), F.col("v").alias("sv")
                ),
            )
        # 0 disables the rail entirely
        spark.conf.set(S._EXHAUSTIVE_CONF, "0")
        assert S.near_dup_pairs_exact(small, 0.99).count() >= 0
    finally:
        spark.conf.unset(S._EXHAUSTIVE_CONF)


def test_ivfpq_adc_requires_corpus_or_artifacts(spark, sf_dir):
    """r6 ADVICE: corpus=None without BOTH persisted artifacts must fail
    at the API boundary with a clear message, not deep in ivfpq_index."""
    import pytest
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _vec,
    )

    queries = _vec(spark, sf_dir).filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="corpus=None requires BOTH"):
        S._ivfpq_adc(None, queries)
    with pytest.raises(ValueError, match="corpus=None requires BOTH"):
        S._ivfpq_adc(None, queries, index=queries)  # codebook missing


def test_suggest_files_per_trigger_model():
    """VERDICT r6 #7: the cadence helper reproduces the measured-best
    8-file trigger for the r6 bench shape (5,000 records/file with the
    fitted host constants), scales inversely with file size, and
    validates its inputs."""
    import pytest

    from terraform_aws_lambda_kinesis_to_es_spark.streaming.stateful import (
        suggest_files_per_trigger,
    )

    assert suggest_files_per_trigger(5000) == 8
    # bigger files -> fewer files per trigger; tiny files -> many
    assert suggest_files_per_trigger(40000) == 1
    assert suggest_files_per_trigger(500) == 71
    # stricter overhead budget -> bigger batches
    assert suggest_files_per_trigger(
        5000, max_overhead_fraction=0.25
    ) > suggest_files_per_trigger(5000, max_overhead_fraction=0.5)
    with pytest.raises(ValueError):
        suggest_files_per_trigger(0)
    with pytest.raises(ValueError):
        suggest_files_per_trigger(5000, max_overhead_fraction=1.5)


def test_lsh_index_probe_equals_batch(spark, sf_dir, tmp_path):
    """save_lsh_index -> probe_lsh_index must emit EXACTLY the pairs the
    full-batch minhash_dedup_pairs over (corpus + batch) emits for pairs
    involving a batch doc — the build-once/serve-many contract of the
    incremental ingest path (banding is per-doc, so bucket co-membership
    is identical whether the corpus was banded now or at save time).
    Also pins the at-rest layout (buckets hive-partitioned by band) and
    extend_lsh_index equivalence with a from-scratch rebuild."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "lsh")
    D.save_lsh_index(old, path)

    info = D.lsh_index_info(spark, path)
    assert info["version"] == 1 and not info["legacy"]
    parts = [d for d in os.listdir(info["buckets"]) if d.startswith("band=")]
    assert parts, "buckets must be hive-partitioned by band"

    buckets, shingles = D.load_lsh_index(spark, path)
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in D.probe_lsh_index(buckets, shingles, new).collect()
    }

    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in D.minhash_dedup_pairs(docs).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert got == want
    assert want, "fixture must exercise cross-batch near-dups"
    # both legs fire: at least one pair crosses old<->new
    assert any((a in new_ids) != (b in new_ids) for a, b, _ in want)

    # extend: appending the batch makes the index equal a from-scratch
    # rebuild over the union (same rows, any order)
    D.extend_lsh_index(new, path)
    b2, s2 = D.load_lsh_index(spark, path)
    path_full = str(tmp_path / "lsh_full")
    D.save_lsh_index(docs, path_full)
    bf, sf = D.load_lsh_index(spark, path_full)
    assert sorted(map(tuple, b2.collect())) == sorted(map(tuple, bf.collect()))
    assert (
        sorted((r["doc_id"], tuple(r["sh_hashes"])) for r in s2.collect())
        == sorted((r["doc_id"], tuple(r["sh_hashes"])) for r in sf.collect())
    )


def test_lsh_index_compaction_equals_fresh(spark, sf_dir, tmp_path):
    """compact_lsh_index contract (VERDICT r7 #6): after replayed
    appends (duplicate rows) and tombstoned ids, compaction rewrites the
    index to the canonical minimal form — probe results equal probing a
    FRESH build of the surviving corpus, duplicate rows are gone, no
    stale id remains, and the hive band partitioning survives the
    rewrite. Also pins crash-safety plumbing: no staging dir left."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    keep = docs.filter(F.col("doc_id") % 7 != 0)
    dead = docs.filter(F.col("doc_id") % 7 == 0)
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
    path = str(tmp_path / "lsh_dirty")
    D.save_lsh_index(docs, path)
    # a replayed append: every row now exists twice for the dead cohort
    D.extend_lsh_index(dead, path)
    b_dirty, s_dirty = D.load_lsh_index(spark, path)
    n_dirty_b, n_dirty_s = b_dirty.count(), s_dirty.count()

    D.compact_lsh_index(spark, path, drop_ids=dead.select("doc_id"))
    buckets, shingles = D.load_lsh_index(spark, path)

    dead_ids = {r["doc_id"] for r in dead.select("doc_id").collect()}
    assert not set(
        r["doc_id"] for r in shingles.select("doc_id").distinct().collect()
    ) & dead_ids
    assert not set(
        r["doc_id"] for r in buckets.select("doc_id").distinct().collect()
    ) & dead_ids
    assert buckets.count() < n_dirty_b and shingles.count() < n_dirty_s
    assert buckets.count() == buckets.distinct().count()
    assert shingles.select("doc_id").distinct().count() == shingles.count()
    info = D.lsh_index_info(spark, path)
    assert info["version"] == 2, "compaction must commit a new generation"
    assert any(
        d.startswith("band=") for d in os.listdir(info["buckets"])
    ), "band partitioning must survive compaction"
    assert not os.path.exists(f"{path}/compact.lock"), "lock must be released"

    got = {
        tuple(r)
        for r in D.probe_lsh_index(buckets, shingles, probe_batch).collect()
    }
    fresh = str(tmp_path / "lsh_fresh")
    D.save_lsh_index(keep, fresh)
    bf, sf_ = D.load_lsh_index(spark, fresh)
    want = {
        tuple(r) for r in D.probe_lsh_index(bf, sf_, probe_batch).collect()
    }
    assert got == want
    assert want, "fixture must exercise post-compaction near-dups"

    # appends keep working AFTER compaction (they land in the committed
    # versioned generation): re-adding the dropped cohort makes the
    # index equal a fresh build over the full corpus again
    D.extend_lsh_index(dead, path)
    b3, s3 = D.load_lsh_index(spark, path)
    full = str(tmp_path / "lsh_full_again")
    D.save_lsh_index(docs, full)
    bf2, sf2 = D.load_lsh_index(spark, full)
    got = {tuple(r) for r in D.probe_lsh_index(b3, s3, probe_batch).collect()}
    want = {tuple(r) for r in D.probe_lsh_index(bf2, sf2, probe_batch).collect()}
    assert got == want


def test_lsh_index_manifest_crash_recovery(spark, sf_dir, tmp_path):
    """Crash-point contract of the manifest commit protocol (VERDICT r8
    #3): a compactor killed BEFORE the manifest create leaves the old
    generation live (its staged dirs are orphans the next compaction
    GCs); killed DURING it leaves a truncated manifest that readers
    skip; killed AFTER it has committed (stale dirs GC'd next
    compaction). Probe results at every point equal a clean build's."""
    import json
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    docs = load_split(spark, sf_dir, "documents")
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
    clean = str(tmp_path / "clean")
    D.save_lsh_index(docs, clean)
    bc, sc = D.load_lsh_index(spark, clean)
    want = {tuple(r) for r in D.probe_lsh_index(bc, sc, probe_batch).collect()}
    assert want, "fixture must exercise near-dups"

    # (a) crash BEFORE the manifest create: staged v2 artifact dirs
    # exist but manifest-000002.json does not -> readers still see v1;
    # the next compaction commits v2 itself and GCs the orphans
    p = str(tmp_path / "a")
    D.save_lsh_index(docs, p)
    os.makedirs(f"{p}/shingles-000002")  # empty orphan = dead staged write
    os.makedirs(f"{p}/buckets-000002")
    assert D.lsh_index_info(spark, p)["version"] == 1
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want
    D.compact_lsh_index(spark, p)
    info = D.lsh_index_info(spark, p)
    assert info["version"] == 2
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want

    # (b) crash DURING the manifest create (truncated JSON): readers
    # must fall back to the newest parseable manifest; the next
    # compaction must not collide with the dead file's number and must
    # GC it once it is two generations stale
    p = str(tmp_path / "b")
    D.save_lsh_index(docs, p)
    with open(f"{p}/manifest-000002.json", "w") as f:
        f.write('{"version": 2, "artifa')  # truncated mid-write
    assert D.lsh_index_info(spark, p)["version"] == 1
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want
    D.compact_lsh_index(spark, p)
    info = D.lsh_index_info(spark, p)
    assert info["version"] == 3, "dead manifest number must stay occupied"
    assert not os.path.exists(f"{p}/manifest-000002.json"), "corrupt GC'd"
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want

    # (c) crash AFTER the commit (GC never ran): the committed
    # generation is live immediately; the next compaction collects the
    # two-generations-stale dirs while keeping one previous generation
    # for in-flight readers. (Artifact dirs carry writer-unique token
    # suffixes, so assertions glob by version prefix.)
    def gens(p, art, ver):
        return [
            d for d in os.listdir(p) if d.startswith(f"{art}-{ver:06d}")
        ]

    p = str(tmp_path / "c")
    D.save_lsh_index(docs, p)     # v1
    D.compact_lsh_index(spark, p)  # v2 (keeps v1 dirs for readers)
    assert gens(p, "shingles", 1), "previous gen must survive"
    D.compact_lsh_index(spark, p)  # v3 (collects v1)
    assert not gens(p, "shingles", 1)
    assert not gens(p, "buckets", 1)
    assert gens(p, "shingles", 2), "one gen kept for readers"
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want

    # commit is an EXCLUSIVE create: a racing writer that lost must get
    # a conflict error, never a silent overwrite
    fs = index_store.index_fs(spark, p)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        index_store.commit_manifest(
            fs, D.lsh_index_info(spark, p)["version"], {"shingles": "x", "buckets": "y"}
        )

    # single-writer lock (ADVICE r8): a live lock blocks a second
    # compactor; a stale one (crashed compactor) is broken by timeout
    with open(f"{p}/compact.lock", "w") as f:
        json.dump({"acquired_unix": 0}, f)
    with pytest.raises(RuntimeError, match="already running"):
        D.compact_lsh_index(spark, p, lock_timeout_s=3600.0)
    D.compact_lsh_index(spark, p, lock_timeout_s=0.0)  # stale -> broken
    assert not os.path.exists(f"{p}/compact.lock")
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want


def test_lsh_index_losing_writer_leaves_committed_data_intact(
    spark, sf_dir, tmp_path
):
    """Commit-conflict semantics end-to-end: a writer that stages a
    full generation but loses the manifest race must (a) raise, (b)
    leave the winner's committed index byte-identical, and (c) leave
    only orphan dirs that the next compaction GCs."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    docs = load_split(spark, sf_dir, "documents")
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
    p = str(tmp_path / "race")
    D.save_lsh_index(docs, p)  # committed v1
    v1 = D.lsh_index_info(spark, p)
    b, s = D.load_lsh_index(spark, p)
    want = {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()}

    # two writers race to version 2: the winner commits a v2 manifest
    # that (for the test) re-points at v1's dirs; the loser has already
    # staged its own uniquely-named v2 dir and must fail its commit
    fs = index_store.index_fs(spark, p)
    loser_arts = index_store.artifact_names(2)
    docs.limit(0).write.mode("overwrite").parquet(f"{p}/{loser_arts['shingles']}")
    winner_arts = {
        "shingles": v1["shingles"].rsplit("/", 1)[1],
        "buckets": v1["buckets"].rsplit("/", 1)[1],
    }
    index_store.commit_manifest(fs, 2, winner_arts)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        index_store.commit_manifest(fs, 2, loser_arts)
    # the loser's staged dir is an orphan on disk; the winner's
    # committed index is untouched and still serves the same pairs
    assert os.path.isdir(f"{p}/{loser_arts['shingles']}")
    assert D.lsh_index_info(spark, p)["version"] == 2
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want


def test_lsh_index_staging_is_writer_unique():
    """Two writers racing to the same version stage into DIFFERENT dirs
    (token suffix), so a losing writer's overwrite can never clobber
    the dirs a winner's manifest committed — the correctness backstop
    the compaction lock is NOT (round-9 review finding)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    a = index_store.artifact_names(2)
    b = index_store.artifact_names(2)
    assert a != b
    for arts in (a, b):
        for name in arts.values():
            assert index_store._ARTIFACT_RE.match(name)
    # and the width is future-proof: version 1,000,000 still parses
    assert index_store._MANIFEST_RE.match("manifest-1000000.json")
    assert index_store._ARTIFACT_RE.match("shingles-1000000-deadbeef")


def test_lsh_index_legacy_midcutover_crash_heals(spark, sf_dir, tmp_path):
    """A PRE-MANIFEST index that crashed inside the retired rename
    protocol's cutover window (.old_compact backup present) must heal
    on first read under the manifest code: artifacts restore from the
    backup (shingles first), a half-cut-over fake loses to the backup,
    and a .deleting trash dir is garbage, never restored — the round-8
    recovery semantics, re-proven against the round-9 layout (round-9
    review finding: the upgrade had dropped this path entirely)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    docs = load_split(spark, sf_dir, "documents")
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)

    def legacy_index(name):
        """Build a legacy (unversioned, manifest-less) layout."""
        p = str(tmp_path / name)
        D.save_lsh_index(docs, p)
        info = D.lsh_index_info(spark, p)
        os.rename(info["shingles"], f"{p}/shingles")
        os.rename(info["buckets"], f"{p}/buckets")
        for f_ in os.listdir(p):
            if f_.startswith("manifest-"):
                os.remove(f"{p}/{f_}")
        return p

    clean = legacy_index("heal_clean")
    bc, sc = D.load_lsh_index(spark, clean)
    want = {tuple(r) for r in D.probe_lsh_index(bc, sc, probe_batch).collect()}
    assert want

    # (a) crash after moving shingles out; (b) both out; (c) both out
    # plus a half-cut-over empty fake that must LOSE to the backup
    def crashed(name, crash):
        p = legacy_index(name)
        os.makedirs(f"{p}/.old_compact")
        crash(p, f"{p}/.old_compact")
        return p

    p = crashed(
        "heal_a", lambda p, o: os.rename(f"{p}/shingles", f"{o}/shingles")
    )
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want
    assert not os.path.exists(f"{p}/.old_compact")

    def both_out(p, o):
        os.rename(f"{p}/shingles", f"{o}/shingles")
        os.rename(f"{p}/buckets", f"{o}/buckets")

    p = crashed("heal_b", both_out)
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want

    def half_cutover(p, o):
        both_out(p, o)
        os.makedirs(f"{p}/buckets")  # empty fake: observably wrong if kept

    p = crashed("heal_c", half_cutover)
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want

    # (d) trash leftover from a COMMITTED legacy run: garbage, never
    # restored over the live index; compaction then migrates cleanly
    p = legacy_index("heal_d")
    os.makedirs(f"{p}/.old_compact.deleting")
    shutil.copytree(f"{clean}/shingles", f"{p}/.old_compact.deleting/shingles")
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want
    assert not os.path.exists(f"{p}/.old_compact.deleting")
    D.compact_lsh_index(spark, p)
    assert D.lsh_index_info(spark, p)["version"] == 1
    b, s = D.load_lsh_index(spark, p)
    assert {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()} == want


def test_lsh_index_legacy_layout_migration(spark, sf_dir, tmp_path):
    """A round-8 (pre-manifest) index — unversioned shingles/buckets
    dirs, no manifest — must keep loading, accept appends, and be
    migrated to the manifest layout by its first compaction (legacy dirs
    survive one generation for in-flight readers, gone after two)."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    docs = load_split(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    probe_batch = docs.filter(F.col("doc_id") % 3 == 0).limit(40)

    # build a legacy layout by relocating a fresh build's artifacts
    p = str(tmp_path / "legacy")
    D.save_lsh_index(old, p)
    info = D.lsh_index_info(spark, p)
    os.rename(info["shingles"], f"{p}/shingles")
    os.rename(info["buckets"], f"{p}/buckets")
    os.remove(f"{p}/manifest-000001.json")

    assert D.lsh_index_info(spark, p)["legacy"]
    D.extend_lsh_index(new, p)  # appends must land in the legacy dirs
    b, s = D.load_lsh_index(spark, p)
    full = str(tmp_path / "full")
    D.save_lsh_index(docs, full)
    bf, sf_ = D.load_lsh_index(spark, full)
    want = {tuple(r) for r in D.probe_lsh_index(bf, sf_, probe_batch).collect()}
    got = {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()}
    assert got == want and want

    D.compact_lsh_index(spark, p)
    info = D.lsh_index_info(spark, p)
    assert info["version"] == 1 and not info["legacy"]
    assert os.path.isdir(f"{p}/shingles"), "legacy = previous gen, kept once"
    D.compact_lsh_index(spark, p)
    assert not os.path.isdir(f"{p}/shingles"), "legacy GC'd on 2nd compaction"
    assert not os.path.isdir(f"{p}/buckets")
    b, s = D.load_lsh_index(spark, p)
    got = {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()}
    assert got == want


def test_lsh_index_hadoop_fs_adapter(spark, sf_dir, tmp_path):
    """The scheme:// control-plane branch: the whole
    save/extend/compact/load lifecycle against a file:// URI exercises
    the Hadoop FileSystem adapter (exists/list/read/exclusive-create/
    delete through the JVM) end-to-end — the code path an s3a:// or
    hdfs:// index takes, on the only scheme this sandbox serves."""
    import os

    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    docs = load_split(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    probe_batch = docs.filter(F.col("doc_id") % 3 == 0).limit(40)

    local = str(tmp_path / "uri")
    uri = f"file://{local}"
    assert index_store.is_remote(uri)
    assert isinstance(
        index_store.index_fs(spark, uri), index_store.HadoopIndexFS
    )

    D.save_lsh_index(old, uri)
    assert os.path.exists(f"{local}/manifest-000001.json")
    D.extend_lsh_index(new, uri)
    D.compact_lsh_index(spark, uri)
    info = D.lsh_index_info(spark, uri)
    assert info["version"] == 2 and info["buckets"].startswith("file://")
    b, s = D.load_lsh_index(spark, uri)
    got = {tuple(r) for r in D.probe_lsh_index(b, s, probe_batch).collect()}

    plain = str(tmp_path / "plain")
    D.save_lsh_index(docs, plain)
    bf, sf_ = D.load_lsh_index(spark, plain)
    want = {tuple(r) for r in D.probe_lsh_index(bf, sf_, probe_batch).collect()}
    assert got == want and want

    # the exclusive-create primitive itself, through the JVM
    fs = index_store.index_fs(spark, uri)
    assert fs.write_text_exclusive("probe.txt", "x")
    assert not fs.write_text_exclusive("probe.txt", "y")
    assert fs.read_text("probe.txt") == "x"
    fs.delete("probe.txt")
    assert not fs.exists("probe.txt")


def test_write_text_exclusive_adapter_contract(spark, tmp_path):
    """VERDICT r9 #4: the commit point is create-if-absent; pin that
    contract PER ADAPTER, including a second Hadoop FileSystem
    implementation.

    * ``LocalIndexFS``: O_EXCL — one atomic syscall; returns False on
      an existing file and leaves its content untouched.
    * ``HadoopIndexFS`` through the DEFAULT ``file://`` FileSystem
      (checksummed LocalFileSystem) is pinned by
      test_lsh_index_hadoop_fs_adapter above; here the SAME adapter
      code runs against a SECOND implementation, RawLocalFileSystem
      (forced via ``fs.file.impl`` + ``fs.file.impl.disable.cache``,
      the documented Hadoop override) — ``create(path, overwrite=
      false)`` must likewise refuse an existing file.
    * S3A caveat (cross-referenced at index_store.py module docs): the
      exclusive create maps to a CONDITIONAL PUT (If-None-Match) only
      on Hadoop 3.4.1+ S3A (HADOOP-19256); older releases implement
      create(overwrite=false) as check-then-write, so two racing
      commits there are best-effort — run compaction single-writer
      (the compact.lock default) on pre-3.4.1 object stores.
    """
    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    lfs = index_store.LocalIndexFS(str(tmp_path / "local"))
    assert lfs.write_text_exclusive("m.json", "a")
    assert not lfs.write_text_exclusive("m.json", "b")
    assert lfs.read_text("m.json") == "a"

    conf = spark._jsc.hadoopConfiguration()
    old_impl = conf.get("fs.file.impl")
    old_cache = conf.get("fs.file.impl.disable.cache")
    conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    conf.set("fs.file.impl.disable.cache", "true")
    try:
        root = str(tmp_path / "raw")
        hfs = index_store.HadoopIndexFS(spark, f"file://{root}")
        impl = hfs._fs.getClass().getName()
        assert "RawLocalFileSystem" in impl, impl
        assert hfs.write_text_exclusive("m.json", "a")
        assert not hfs.write_text_exclusive("m.json", "b")
        assert hfs.read_text("m.json") == "a"
        hfs.delete("m.json")
        assert not hfs.exists("m.json")
    finally:
        if old_impl is None:
            conf.unset("fs.file.impl")
        else:
            conf.set("fs.file.impl", old_impl)
        if old_cache is None:
            conf.unset("fs.file.impl.disable.cache")
        else:
            conf.set("fs.file.impl.disable.cache", old_cache)


def test_count_files_adapter_contract(spark, tmp_path):
    """Round-11: ``count_files`` (the auto-compaction trigger's input)
    pinned per adapter — recursive through hive-partition subdirs,
    marker/hidden files excluded, 0 for a missing dir — on LocalIndexFS
    AND HadoopIndexFS (file://), whose listFiles RemoteIterator path
    differs from os.walk."""
    import os as _os

    from terraform_aws_lambda_kinesis_to_es_spark.operators import index_store

    root = str(tmp_path / "idx")
    _os.makedirs(f"{root}/art-000001/band=0")
    _os.makedirs(f"{root}/art-000001/band=1")
    for p in (
        "art-000001/part-0.parquet",
        "art-000001/band=0/part-1.parquet",
        "art-000001/band=1/part-2.parquet",
        "art-000001/band=1/part-3.parquet",
        "art-000001/_SUCCESS",
        "art-000001/.part-4.crc",
    ):
        with open(f"{root}/{p}", "w") as fh:
            fh.write("x")

    lfs = index_store.LocalIndexFS(root)
    assert lfs.count_files("art-000001") == 4
    assert lfs.count_files("absent-dir") == 0

    hfs = index_store.HadoopIndexFS(spark, f"file://{root}")
    assert hfs.count_files("art-000001") == 4
    assert hfs.count_files("absent-dir") == 0


def test_clean_corpus_exact_leg_redundant(spark, tmp_path):
    """r13 optimization pin: q_clean_corpus no longer runs its own
    exact-dup anti-join leg (full-corpus md5 groupBy + membership join +
    anti-join). The removal is sound because (a) a non-min exact dup
    with an ELIGIBLE text (>= 5 tokens) is already dropped by the
    near-dup leg (identical texts share a digest group inside
    near_dup_clusters, so cluster_id <= rep_id < doc_id), and (b) a doc
    with < 5 tokens cannot reach QUALITY_MIN_BP — bound:
    (least(4,100)*100*5 + 10000*3 + 10000*2) DIV 10 = 5200 < 6000.
    This test pins BOTH bounds on an adversarial corpus (short exact
    dups, long exact dups, near dups, all-stopword shorties) and
    asserts the committed query equals the pre-r13 two-anti-join form
    row-for-row."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.plans import text_queries
    from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
        JACCARD_THRESHOLD_BP,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.training_queries import (
        CLEAN_LANG,
        QUALITY_MIN_BP,
        q_clean_corpus,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        predicted_lang,
        tokens,
    )

    good = (
        "the cat is a friend of the dog and the bird is to the left "
        "of the tree and the sun is a lamp of the sky and all is well"
    )
    near = good + " extra tail words here"
    rows = [
        # exact-dup clique of ELIGIBLE text: 11/12 must drop (near leg)
        (10, good, "en", "srcA"),
        (11, good, "en", "srcA"),
        (12, good, "en", "srcB"),
        # near-dup of the clique: shares most 5-gram shingles
        (30, near, "en", "srcA"),
        # exact dups of a SHORT text (< 5 tokens): invisible to the
        # near-dup leg, must be excluded by the quality floor alone
        (20, "the a of and", "en", "srcA"),
        (21, "the a of and", "en", "srcA"),
        (22, "tiny", "en", "srcA"),
        # passes quality but not the language gate
        (40, "der hund und die katze und der vogel und das haus und "
             "der baum und die sonne und das licht und der tag nicht", "de", "srcA"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {tuple(r) for r in q_clean_corpus(spark, d).collect()}

    # pre-r13 reference: the same query WITH the exact-dup anti-join leg
    ref_docs = load_split(spark, d, "documents")
    scored = text_queries.with_quality(
        ref_docs.withColumn(
            "pred_lang", predicted_lang(tokens(F.lower(F.col("text"))))
        ),
        extra_cols=("source", "pred_lang"),
    )
    comps = D.near_dup_clusters(ref_docs, threshold_bp=JACCARD_THRESHOLD_BP)
    dropped_near = comps.filter(F.col("cluster_id") < F.col("doc_id")).select(
        "doc_id"
    )
    exact_keep = ref_docs.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").alias("keep_id")
    )
    dropped_exact = (
        ref_docs.select("doc_id", F.md5("text").alias("k"))
        .join(exact_keep, "k")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    ref = {
        tuple(r)
        for r in scored.filter(
            (F.col("quality_bp") >= QUALITY_MIN_BP)
            & (F.col("pred_lang") == CLEAN_LANG)
        )
        .join(dropped_near, "doc_id", "left_anti")
        .join(dropped_exact, "doc_id", "left_anti")
        .select("doc_id", "source", "n_tokens", "quality_bp")
        .collect()
    }
    assert got == ref
    # the short exact dups never surface in either form
    assert not {t[0] for t in got} & {20, 21, 22}
    # bound (b): NO doc under 5 tokens can reach the quality floor —
    # pin the arithmetic at its worst case (all-stopword, zero punct)
    short_max = (
        text_queries.with_quality(ref_docs)
        .filter(F.size(tokens(F.col("text"))) < 5)
        .agg(F.max("quality_bp"))
        .collect()[0][0]
    )
    assert short_max is not None and short_max < QUALITY_MIN_BP
    assert (4 * 500 + 10000 * 3 + 10000 * 2) // 10 < QUALITY_MIN_BP


def test_lsh_index_legacy_string_bkey_still_serves(spark, sf_dir, tmp_path):
    """r13 bkey-format-bump compat pin: indexes saved BEFORE the bump
    embed '_'-joined decimal STRING bucket keys; new code keys buckets
    with a 64-bit xxhash64. probe_lsh_index and extend_lsh_index sniff
    the committed artifact's schema and band the batch side with the
    matching legacy form — a long-keyed probe against a string-keyed
    index would silently match nothing, and a long-keyed append would
    corrupt the artifact. Probe results over a legacy index must equal
    the full-batch detector, before AND after an extend."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    docs = load_split(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "lsh_legacy")
    D.save_lsh_index(old, path)
    info = D.lsh_index_info(spark, path)
    # rewrite the committed buckets artifact in the pre-r13 string-key
    # format (same signatures, legacy banding) to simulate an old index
    sh = spark.read.parquet(info["shingles"])
    sig = D.with_minhash_signature(sh, shingle_col="sh_hashes", prehashed=True)
    D.banded_keys(sig, legacy_str=True).write.partitionBy("band").mode(
        "overwrite"
    ).parquet(info["buckets"])

    buckets, shingles = D.load_lsh_index(spark, path)
    assert dict(buckets.dtypes)["bkey"] == "string"

    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in D.minhash_dedup_pairs(docs).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert want, "fixture must exercise cross-batch near-dups"
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in D.probe_lsh_index(buckets, shingles, new).collect()
    }
    assert got == want

    # extend must append STRING keys (format sniffed from the artifact);
    # a re-probe over the reloaded index still serves the same pairs
    D.extend_lsh_index(new, path)
    b2, s2 = D.load_lsh_index(spark, path)
    assert dict(b2.dtypes)["bkey"] == "string"
    got2 = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in D.probe_lsh_index(b2, s2, new).collect()
    }
    assert got2 == want
