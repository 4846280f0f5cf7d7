"""Sanity bounds for the estimate-typed (rows-only) queries."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrypoint


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = entrypoint.queries()["q_approx_distinct"](spark, sf_dir).collect()
    got = {r.event_type: (r.exact_users, r.within_rsd) for r in rows}
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert got[t][0] == n, (t, got[t][0], n)
        # the HLL estimate itself is asserted inside the query output
        assert got[t][1] is True, t


def test_centroid_sim_agrees_with_numpy(spark, sf_dir):
    import numpy as np

    rows = entrypoint.queries()["q_centroid_sim"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    vecs = {}
    for r in emb:
        v = np.array(r.embedding, dtype=np.float64)
        vecs[r.vec_id] = (r.label, v)
        by_label.setdefault(r.label, []).append(v)
    cents = {l: np.mean(np.stack(vs), axis=0) for l, vs in by_label.items()}
    for r in rows[:50]:
        label, v = vecs[r.vec_id]
        c = cents[label]
        expect = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert abs(r.sim_to_centroid - expect) < 1e-3, r.vec_id


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with 4/16 probes must recover a solid fraction of the true
    top-10 (random 64-dim data is the hard case for IVF; the bound here
    guards the plumbing, not state-of-the-art recall)."""
    exact = {}
    for r in entrypoint.queries()["q_knn_cosine"](spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = {}
    for r in entrypoint.queries()["q_ann_ivf"](spark, sf_dir).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ivf) == set(exact)
    recalls = [len(ivf[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_ann_recall_audit_shows_probe_lift(spark, sf_dir):
    """The dual-detector recall audit must (a) agree with the definition —
    multi-probe candidates are a superset of single-bucket candidates, so
    per-query probe recall >= bucket recall — and (b) be non-vacuous: the
    radius-2 probe actually recovers ground-truth neighbors on driver
    data."""
    rows = entrypoint.queries()["q_ann_recall"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_true > 0
        assert r.recall_probe_bp >= r.recall_bucket_bp, r
    assert sum(r.n_hit_probe for r in rows) > 0
    # the lift is the point of multi-probe: strictly better in aggregate
    assert sum(r.n_hit_probe for r in rows) > sum(r.n_hit_bucket for r in rows)


def test_simhash_pairs_verified_by_bruteforce(spark, sf_dir):
    """The banded simhash join must find exactly the pairs a brute-force
    hamming scan finds (pigeonhole guarantees recall for distance<=3)."""
    sig = {r.doc_id: r.simhash for r in entrypoint.queries()["q_simhash"](spark, sf_dir).collect()}
    expected = set()
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sig[a] ^ sig[b]).count("1") <= 3:
                expected.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in entrypoint.queries()["q_simhash_pairs"](spark, sf_dir).collect()
    }
    assert got == expected


def test_minhash_short_docs_no_ansi_crash(spark):
    """Docs with <5 tokens (empty shingle sets) must be excluded, not
    crash the ANSI-mode integer division; exact dups must pair at 10000bp."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "a b"),
            (3, ""),
            (4, "one two three four five six seven"),
            (5, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_dedup_pairs(df).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard_bp) for r in rows] == [(4, 5, 10000)]


def test_kmeans_refine_improves_clustering(spark, sf_dir):
    """Lloyd refinement must not worsen mean similarity-to-assigned-
    centroid, and must agree with a numpy reference on the final
    assignment for most points."""
    import numpy as np
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    init = S.ivf_centroids(vecs)
    refined = S.kmeans_refine(vecs, init, n_iter=2)

    def mean_sim(cents_df):
        a = S.with_ivf_list(vecs, cents_df)
        joined = a.join(
            cents_df.select("list_id", F.col("v").alias("cv")), "list_id"
        )
        return joined.select(
            F.avg(S.cosine(F.col("v"), F.col("cv"))).alias("m")
        ).collect()[0].m

    before = mean_sim(init.select("list_id", "v"))
    after = mean_sim(refined)
    assert after >= before - 1e-9, (before, after)
    assert after > before  # on random data one Lloyd step strictly helps


def test_bucketed_seed_assignment_covers_and_agrees(spark, sf_dir):
    """assign_bucketed_seeds must assign every vector exactly once, and
    must agree with exhaustive assignment whenever the vector's true
    argmax seed shares its hyperplane bucket (the approximation only
    kicks in across bucket boundaries — the IVF/LSH recall contract)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S

    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    )
    seeds = vecs.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("sv")
    )
    n = vecs.count()
    bucketed = S.assign_bucketed_seeds(vecs, seeds)
    rows = bucketed.collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n

    exhaustive = {
        r.vec_id: r.cluster
        for r in S.semdedup(vecs, 32, 2.0).collect()  # tau=2.0: no drops, pure assignment
    }
    vec_bucket = {
        r.vec_id: r.bucket for r in S.with_bucket(vecs).select("vec_id", "bucket").collect()
    }
    seed_bucket = {
        r.cluster: r.bucket
        for r in S.with_bucket(seeds, "sv").select("cluster", "bucket").collect()
    }
    agree = checked = 0
    for r in rows:
        true_cluster = exhaustive[r.vec_id]
        if seed_bucket[true_cluster] == vec_bucket[r.vec_id]:
            checked += 1
            agree += int(r.cluster == true_cluster)
    assert checked > 0
    assert agree == checked, f"{agree}/{checked}"


def test_bucketed_seed_cache_registry_releases_cache(spark, sf_dir):
    """The cache_registry hook (VERDICT r4 #8): callers get the persisted
    codebook frame back and can release it deterministically after the
    terminal action, instead of relying on LRU eviction or a global
    clearCache in long-lived sessions."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    seeds = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("sv")
    )
    reg: list = []
    out = S.assign_bucketed_seeds(vecs, seeds, cache_registry=reg)
    assert out.count() == vecs.count()
    # two persisted frames since r12: the bucketed corpus (vb — feeds the
    # scoring join AND the orphan anti-join) and the seed frame (sb)
    assert len(reg) == 2
    for f in reg:
        assert f.storageLevel.useMemory  # persisted while in use
    for f in reg:
        f.unpersist(blocking=True)
    for f in reg:
        assert not f.storageLevel.useMemory


def test_pq_adc_recall_against_exact_l2(spark, sf_dir):
    """PQ/ADC must (a) encode each codebook vector to its own code in
    every subspace (distance-0 argmin, the basic encode sanity) and
    (b) recover a solid fraction of the true L2 top-10 from codes alone
    (random 64-dim data with a 16-code codebook is the hard case; the
    bound guards the plumbing, not state-of-the-art recall)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        N_QUERY_VECS,
        TOP_K,
        _vec,
    )

    vecs = _vec(spark, sf_dir)
    cb = S.pq_codebook(vecs)
    codes = S.pq_encode(vecs, cb)
    self_codes = codes.filter(
        (F.col("vec_id") < S.PQ_K) & (F.col("vec_id") != F.col("code"))
    )
    assert self_codes.count() == 0

    # exact squared-L2 top-k (brute force, test-only ground truth)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            S.sq_l2(F.col("v"), F.col("qv")).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact = {}
    for r in scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    adc = {}
    for r in entrypoint.queries()["q_ann_pq"](spark, sf_dir).collect():
        adc.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(adc) == set(exact)
    recalls = [len(adc[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_pq_refined_codebook_cuts_distortion_keeps_recall(spark, sf_dir):
    """k-means-refined PQ codebook (pq_codebook_refined — the production
    FAISS training step) vs the seed rule. The k-means OBJECTIVE is
    quantization distortion, so that is the hard assertion: mean
    per-subspace squared error must drop >= 15% (measured -25% after 3
    iterations on this fixture: 0.094 -> 0.070). Recall@10 vs the exact
    L2 top-10, measured over a 50-query panel (the 5-query panel is too
    noisy to order codebooks: it showed 0.34 vs 0.26 while the 50-query
    panel shows seed 0.234 -> refined 0.28, +20% relative — PERF.md r5),
    must not degrade beyond noise. The codebook must also keep exactly
    PQ_M x PQ_K entries (empty codes retain their previous centroid)."""
    from pyspark.sql import Window

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        TOP_K,
        _vec,
    )

    vecs = _vec(spark, sf_dir)
    n_queries = 50
    queries = vecs.filter(F.col("vec_id") < n_queries)

    def distortion(cb):
        subs = S.pq_subvectors(vecs, "vec_id")
        return (
            subs.join(F.broadcast(cb), "m")
            .select("vec_id", "m", S.sq_l2(F.col("sub"), F.col("cv")).alias("d"))
            .groupBy("vec_id", "m")
            .agg(F.min("d").alias("d"))
            .agg(F.avg("d"))
            .collect()[0][0]
        )

    qs = queries.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    sc = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", S.sq_l2(F.col("v"), F.col("qv")).alias("d")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact: dict[int, set[int]] = {}
    for r in (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .collect()
    ):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def adc_recall(cb):
        codes = S.pq_encode(vecs, cb)
        got: dict[int, set[int]] = {}
        for r in S.pq_adc_topk(codes, cb, queries, k=TOP_K).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        rs = [len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    seed_cb = S.pq_codebook(vecs)
    refined_cb = S.pq_codebook_refined(vecs, n_iter=3)
    assert refined_cb.count() == S.PQ_M * S.PQ_K
    d_seed, d_refined = distortion(seed_cb), distortion(refined_cb)
    assert d_refined <= 0.85 * d_seed, (d_seed, d_refined)
    r_seed, r_refined = adc_recall(seed_cb), adc_recall(refined_cb)
    assert r_refined >= r_seed - 0.03, (r_seed, r_refined)


def test_ivfpq_recall_and_pruning(spark, sf_dir):
    """Composed IVF+PQ index: (a) the one-shuffle index build assigns
    every vector to exactly one list and candidates really are pruned to
    the probed lists (strictly less than the corpus); (b) ADC over codes
    from pruned lists recovers a useful fraction of the exact L2 top-10.
    The bound is 0.25: with the r5 metric-consistency fix (squared L2 for
    assignment + probing + ranking, the FAISS METRIC_L2 contract) mean
    recall@10 measured 0.36 on this fixture vs ~0.15 for the old
    cosine-prune/L2-rank mix the r4 ADVICE flagged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        N_QUERY_VECS,
        TOP_K,
        _vec,
    )

    vecs = _vec(spark, sf_dir)
    n_corpus = vecs.count()
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)

    # structural pruning: the index covers the corpus exactly once and
    # every probed-list candidate set is a strict subset of the corpus
    idx = S.ivfpq_index(vecs)
    assert idx.count() == n_corpus
    sizes = {
        r.list_id: r.n
        for r in idx.groupBy("list_id").agg(F.count("*").alias("n")).collect()
    }
    assert sum(sizes.values()) == n_corpus
    max_probed = sum(sorted(sizes.values(), reverse=True)[: S.N_IVF_PROBES])
    assert max_probed < n_corpus
    # every row carries exactly PQ_M codes in ascending-m order
    bad = idx.filter(
        (F.size("codes") != S.PQ_M)
        | (
            F.exists(
                F.zip_with(
                    "codes",
                    F.sequence(F.lit(0), F.lit(S.PQ_M - 1)),
                    lambda c, i: c["m"] != i,
                ),
                lambda x: x,
            )
        )
    ).count()
    assert bad == 0

    # exact L2 ground truth
    qs = queries.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    sc = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", S.sq_l2(F.col("v"), F.col("qv")).alias("d")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact = {}
    for r in sc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    got = {}
    for r in S.knn_ivfpq(vecs, queries, k=TOP_K).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact)
    recalls = [len(got[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_ivfpq_rerank_recovers_recall(spark, sf_dir):
    """The FAISS-refine contract (VERDICT r5 #3): exact re-rank of the ADC
    shortlist must recover recall@10 well above ADC-only ranking and
    toward the probe-coverage ceiling. Measured on the 50-query panel
    (PERF.md r6: ADC-only 0.226 -> rerank 0.712 at 500 vecs); the floor
    here is deliberately below the measured value to absorb fixture
    regeneration, not run-to-run noise (the pipeline is deterministic)."""
    from pyspark.sql import Window

    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        TOP_K,
        _vec,
    )

    vecs = _vec(spark, sf_dir).persist()
    queries = vecs.filter(F.col("vec_id") < 50)
    qs = queries.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    sc = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", S.sq_l2(F.col("v"), F.col("qv")).alias("d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact: dict[int, set[int]] = {}
    for r in (
        sc.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K).collect()
    ):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(df):
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        rs = [len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    r_adc = recall(S.knn_ivfpq(vecs, queries, k=TOP_K))
    r_rr = recall(S.knn_ivfpq_rerank(vecs, queries, k=TOP_K))
    vecs.unpersist()
    assert r_rr >= r_adc + 0.2, (r_adc, r_rr)
    assert r_rr >= 0.6, r_rr


def test_embed_near_dup_sampled_exact_on_sample(spark, sf_dir):
    """The sample-bounded near-dup audit must be EXACT on its anchor set:
    every (anchor, partner) row agrees with the exhaustive q_embed_near_dup
    pair set (same sim, as an unordered pair), the anchored subset of the
    exhaustive pairs is fully covered, and the sample is PROPER (K > 1
    activates at the 500-row fixture)."""
    import hashlib

    import __spark_entry__ as entrypoint

    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        ND_SAMPLE_TARGET,
    )

    QUERIES = entrypoint.queries()
    full = {}
    for r in QUERIES["q_embed_near_dup"](spark, sf_dir).collect():
        full[(r.vec_a, r.vec_b)] = r.sim
    sampled = QUERIES["q_embed_near_dup_sampled"](spark, sf_dir).collect()
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    n = load(spark, sf_dir, "embeddings").count()
    k_mod = max(1, n // ND_SAMPLE_TARGET)
    assert k_mod > 1  # the sampling path is actually active at fixture SF

    def h60(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    anchors = set()
    for r in sampled:
        assert h60(r.anchor_id) % k_mod == 0, r
        anchors.add(r.anchor_id)
        key = (min(r.anchor_id, r.partner_id), max(r.anchor_id, r.partner_id))
        assert full.get(key) == r.sim, (key, r.sim, full.get(key))
    # completeness: every exhaustive pair with a sampled endpoint is anchored
    got_keys = {
        (min(r.anchor_id, r.partner_id), max(r.anchor_id, r.partner_id))
        for r in sampled
    }
    for (a, b), _ in full.items():
        if h60(a) % k_mod == 0 or h60(b) % k_mod == 0:
            assert (a, b) in got_keys, (a, b)
