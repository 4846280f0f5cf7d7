"""Invariant tests for the round-3 pipeline-ops surface: properties the
DuckDB oracle equality cannot express — partition invariance, estimator
accuracy, structural monotonicity."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint

QUERIES = entrypoint.queries()


def test_reservoir_sample_partition_invariant(spark):
    """The md5-rank sample must pick the SAME rows no matter how the
    input is partitioned — the reproducibility claim that separates it
    from rand()/sampleBy."""
    rows = [(i, f"g{i % 3}") for i in range(300)]
    picks = []
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(
            nparts
        )
        rk = F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
            )
        )
        got = (
            df.withColumn("rk", rk)
            .filter(F.col("rk") <= 20)
            .select("doc_id", "lang", "rk")
            .collect()
        )
        picks.append(sorted(map(tuple, got)))
    assert picks[0] == picks[1] == picks[2]
    per_group = {}
    for _, lang, _ in picks[0]:
        per_group[lang] = per_group.get(lang, 0) + 1
    assert all(v == 20 for v in per_group.values())


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    """64-permutation estimate vs exact Jaccard on every LSH candidate
    pair: |est - exact| must stay within 9 sigma of the binomial error
    (sd <= 0.0625 at p=0.5, so 0.35 absolute — a failure means the
    signature fold or the permutation family is broken, not bad luck)."""
    rows = QUERIES["q_minhash_est"](spark, sf_dir).collect()
    assert rows, "expected candidate pairs at this SF"
    for r in rows:
        assert abs(r.est_bp - r.jaccard_bp) <= 3500, r


def test_compaction_bins_monotone_and_bounded(spark, sf_dir):
    """Bins must be non-decreasing in source order and each bin's
    CONTENT must start below the target (first-fit by running size)."""
    rows = sorted(
        QUERIES["q_compaction_plan"](spark, sf_dir).collect(),
        key=lambda r: r.source,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.pipeline_queries import (
        COMPACTION_TARGET_CHARS,
    )

    cum = 0
    prev_bin = -1
    for r in rows:
        assert r.bin >= prev_bin
        assert r.bin == cum // COMPACTION_TARGET_CHARS
        cum += r.sum_chars
        prev_bin = r.bin


def test_register_views_sql_passthrough(spark, sf_dir):
    """Ad-hoc SQL entry point: after register_views, arbitrary spark.sql
    over the normalized tables must agree with the DataFrame path."""
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import (
        load,
        register_views,
    )

    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT d.source, COUNT(*) AS n
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        GROUP BY d.source ORDER BY d.source
        """
    ).collect()
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    want = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("source")
        .count()
        .orderBy("source")
        .collect()
    )
    assert [(r.source, r.n) for r in got] == [(r.source, r["count"]) for r in want]
    assert len(got) > 0


def test_interval_join_binned_is_hash_join(spark, sf_dir):
    """The whole point of the binned rewrite: the events-side join must be
    a hash join on the hour bucket, never a nested-loop theta join over
    the fact table (the single-row span attach is the only NLJ)."""
    from tests.test_plan_shape import plan_of

    plan = plan_of(spark, sf_dir, "q_interval_join_binned")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_round3_queries_nonvacuous(spark, sf_dir):
    """Oracle equality is trivially satisfied by empty outputs — pin that
    the round-3 surface actually exercises data at the test SF."""
    for name in (
        "q_minhash_est",
        "q_dup_source_matrix",
        "q_phrase_search",
        "q_graph_degree",
        "q_pagerank",
        "q_dead_hours",
        "q_cooccurrence",
        "q_gopher_filters",
        "q_cdc_latest",
        "q_trending_parts",
    ):
        assert QUERIES[name](spark, sf_dir).count() > 0, name
    agree = QUERIES["q_dup_method_agreement"](spark, sf_dir).collect()[0]
    assert agree.n_truth > 0 and agree.n_detected > 0
    inc = QUERIES["q_incremental_dedup"](spark, sf_dir)
    assert inc.filter("near_dup").count() > 0
    assert inc.filter("admit").count() > 0


def test_late_tranche_nonvacuous(spark, sf_dir):
    """Same guard for the round-3 late tranche (declared after the
    driver's head-50 window): empty outputs would make the oracle
    equality vacuous."""
    for name in (
        "q_quality_classifier",
        "q_doc_chunks",
        "q_oov_rate",
        "q_skyline",
        "q_graph_triangles",
        "q_zorder_layout",
    ):
        assert QUERIES[name](spark, sf_dir).count() > 0, name
    # the classifier must actually separate: both predicted classes occur
    cls = QUERIES["q_quality_classifier"](spark, sf_dir)
    assert cls.filter("pred_keep").count() > 0
    assert cls.filter("NOT pred_keep").count() > 0
    # chunking must produce multi-chunk docs (the overlap path is exercised)
    chunks = QUERIES["q_doc_chunks"](spark, sf_dir)
    assert chunks.filter("chunk_idx >= 1").count() > 0


def test_integrity_rollup_sketch_nonvacuous(spark, sf_dir):
    """Second late-tranche wave: the audits must exercise their interesting
    branches, not just return rows."""
    ri = QUERIES["q_orphan_check"](spark, sf_dir)
    rows = {r.relation: r for r in ri.collect()}
    assert set(rows) == {"lineitem->orders", "orders->customer", "lineitem->part"}
    # the fixture ships orders with no lineitems (27 at sf0.001) — the
    # childless-parent branch must actually fire
    assert rows["lineitem->orders"].n_childless_parents > 0
    # clean fixture: no orphans (a nonzero here would mean broken testdata)
    assert all(r.n_orphan_rows == 0 for r in rows.values())

    rm = QUERIES["q_rollup_merge"](spark, sf_dir)
    merged = rm.collect()
    assert len(merged) > 0
    # both halves of the parity split must be populated, else the merge
    # degenerates to a plain rollup and proves nothing
    assert any(int(r.day[8:10]) % 2 == 0 for r in merged)
    assert any(int(r.day[8:10]) % 2 == 1 for r in merged)

    aq = QUERIES["q_approx_quantiles"](spark, sf_dir).collect()
    assert len(aq) > 0
    assert all(r.within_rank_bound for r in aq)


def test_entity_anon_gapfill_nonvacuous(spark, sf_dir):
    """Third late-tranche wave: matching, privacy, and fill branches must
    actually fire on driver data."""
    em = QUERIES["q_entity_match"](spark, sf_dir).collect()
    assert len(em) > 0
    # names are distinct by construction, so every candidate is a FUZZY
    # match (lev >= 1) — the interesting branch, not exact-dup noise
    assert all(1 <= r.lev <= 3 for r in em)

    ka = QUERIES["q_k_anonymity"](spark, sf_dir)
    assert ka.filter("at_risk").count() > 0
    assert ka.filter("NOT at_risk").count() > 0

    gf = QUERIES["q_gap_fill"](spark, sf_dir)
    # real holes exist at hourly grain, and carry-forward (not just the
    # leading-zero default) must fill some of them
    assert gf.filter("was_gap").count() > 0
    assert gf.filter("was_gap AND n_filled > 0").count() > 0


def test_expectations_and_drift_nonvacuous(spark, sf_dir):
    ex = {r.expectation: r for r in QUERIES["q_expectations"](spark, sf_dir).collect()}
    assert set(ex) == {
        "o_orderkey_not_null", "o_custkey_not_null", "o_totalprice_positive",
        "o_orderstatus_in_set", "o_orderdate_in_range", "o_orderkey_unique",
    }
    assert all(r.n_checked > 0 for r in ex.values())
    # clean fixture: every declared expectation holds (a failure here means
    # broken testdata, not a broken query)
    assert all(r.n_failed == 0 and r.__getattr__("pass") for r in ex.values())

    vd = QUERIES["q_value_drift"](spark, sf_dir).collect()
    assert len(vd) == 10  # payload values 0..99 over bucket width 10
    assert all(0 <= r.old_bp <= 10000 and 0 <= r.new_bp <= 10000 for r in vd)
    # the halves genuinely differ — drift signal is non-trivial
    assert any(r.shift_bp != 0 for r in vd)
    # shares sum to ~100% on each side (DIV truncation: <= 10000)
    assert 9900 <= sum(r.old_bp for r in vd) <= 10000
    assert 9900 <= sum(r.new_bp for r in vd) <= 10000


def test_benford_and_retry_audit_nonvacuous(spark, sf_dir):
    bf = QUERIES["q_benford"](spark, sf_dir).collect()
    assert {r.digit for r in bf} <= set(range(1, 10)) and len(bf) > 0
    # shares sum to ~100% (DIV truncation)
    assert 9900 <= sum(r.observed_bp for r in bf) <= 10000
    assert all(abs(r.benford_expected - 0.301) < 1e-3 for r in bf if r.digit == 1)

    dp = QUERIES["q_duplicate_payloads"](spark, sf_dir).collect()
    assert len(dp) > 0
    # the injected retry storm must be detected: duplicates exist and the
    # surplus equals the injected row count exactly
    from terraform_aws_lambda_kinesis_to_es_spark.plans.pipeline_queries import RETRY_MOD
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    injected = (
        load(spark, sf_dir, "events")
        .filter(f"event_id % {RETRY_MOD} = 0")
        .count()
    )
    assert injected > 0
    assert sum(r.n_surplus_rows for r in dp) == injected
    assert sum(r.n_dup_groups for r in dp) > 0


def test_functional_deps_both_branches(spark, sf_dir):
    fd = {r.fd: r for r in QUERIES["q_functional_deps"](spark, sf_dir).collect()}
    assert set(fd) == {
        "o_orderkey->o_custkey",
        "o_custkey->o_orderpriority",
        "o_orderstatus->o_orderpriority",
    }
    # the PK-backed FD holds; the behavioral ones are violated — both
    # verdict branches fire
    assert fd["o_orderkey->o_custkey"].holds
    assert not fd["o_custkey->o_orderpriority"].holds
    assert fd["o_custkey->o_orderpriority"].n_violating_keys > 0
    assert all(r.n_keys > 0 for r in fd.values())


def test_winsorize_and_forget_nonvacuous(spark, sf_dir):
    wz = QUERIES["q_winsorize"](spark, sf_dir).collect()
    assert len(wz) > 0
    for r in wz:
        assert r.p01 < r.p99
        # both tails actually clip (1% of each class is >= 1 row here)
        assert r.n_clipped_low >= 1 and r.n_clipped_high >= 1
        assert r.n_clipped_low + r.n_clipped_high < r.n

    fu = QUERIES["q_forget_users"](spark, sf_dir).collect()
    assert len(fu) > 0
    assert sum(r.n_purged for r in fu) > 0
    assert sum(r.n_retained for r in fu) > 0
    assert all(r.bytes_purged > 0 for r in fu if r.n_purged > 0)
    assert all(r.users_purged <= r.n_purged for r in fu)


def test_index_and_paths_nonvacuous(spark, sf_dir):
    inv = QUERIES["q_inverted_index"](spark, sf_dir).collect()
    # full vocab cut, bounded by the corpus's distinct-word count (31 at
    # sf0.001)
    assert 0 < len(inv) <= 200
    assert all(r.ttf >= r.df >= 1 for r in inv)
    # posting lists genuinely differ across terms
    assert len({r.postings_h for r in inv}) == len(inv)

    tp = QUERIES["q_top_paths"](spark, sf_dir).collect()
    assert 0 < len(tp) <= 20
    # multi-event journeys dominate — the sequence assembly is exercised
    assert any(">" in r.path for r in tp)
    assert all(r.n_users >= 1 for r in tp)


def test_hll_merge_and_entity_clusters_nonvacuous(spark, sf_dir):
    hll = QUERIES["q_hll_merge"](spark, sf_dir).collect()
    assert len(hll) > 0
    assert all(r.within_tol for r in hll)
    # the union path must actually merge multiple daily sketches
    assert all(r.n_days > 1 for r in hll)

    ec = QUERIES["q_entity_clusters"](spark, sf_dir).collect()
    assert len(ec) > 0
    # every entity groups at least two matched names, and the canonical
    # name belongs to the corpus
    assert all(r.n_names >= 2 for r in ec)
    assert all(r.n_parts >= r.n_names for r in ec)


def test_attribution_matches_window_form(spark, sf_dir):
    """The aggregate (min_by/max_by) form must equal the
    row_number-window formulation it replaces."""
    agg = {
        (r.user_id): (r.first_type, r.last_type, r.n_events)
        for r in QUERIES["q_attribution"](spark, sf_dir).collect()
    }
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.withColumn("rn", F.row_number().over(w)).withColumn(
        "rmax", F.max("rn").over(Window.partitionBy("user_id"))
    )
    first = {
        r.user_id: r.event_type for r in ranked.filter("rn = 1").collect()
    }
    last = {
        r.user_id: r.event_type for r in ranked.filter("rn = rmax").collect()
    }
    assert set(agg) == set(first)
    for u, (ft, lt, _) in agg.items():
        assert first[u] == ft and last[u] == lt, u


def test_incremental_dedup_short_docs_match_oracle(spark, tmp_path):
    """r5 ADVICE regression: docs under 5 tokens have EMPTY shingle sets;
    before the fix they all shared the sentinel MinHash signature,
    band-collided into candidates, and the cross-multiplied Jaccard test
    evaluated 0 >= 0 = TRUE — near_dup=true/admit=false while the oracle
    (len(list_intersect) > 0) admits them. Corpus with short docs on BOTH
    snapshot sides must agree with the oracle."""
    import duckdb

    long_a = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (0, "yo", "en", "s0", 2),              # existing, short
        (1, "hi", "en", "s1", 2),              # new, short — must be admitted
        (2, long_a, "en", "s0", len(long_a)),  # existing, long
        (3, long_a + "extra tail words", "en", "s1", len(long_a) + 17),  # new, near-dup of 2
        (5, "completely different unique content with many novel tokens never repeated", "en", "s1", 74),
        (7, "tiny", "en", "s1", 4),            # new, short — must be admitted
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    doc_path = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(doc_path)

    got = {
        r.doc_id: (r.exact_dup, r.near_dup, r.admit)
        for r in QUERIES["q_incremental_dedup"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{doc_path}'")
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(entrypoint.oracle_sql()["q_incremental_dedup"]).fetchall()
    }
    assert got == want
    # the short new docs are admitted, the near-dup long one is not
    assert got[1] == (False, False, True)
    assert got[7] == (False, False, True)
    assert got[3][1] is True and got[3][2] is False


def test_lsh_eval_truth_sampling_exact_on_sample(spark, sf_dir, monkeypatch):
    """The sample-bounded truth leg (TRUTH_SAMPLE_TARGET) must be EXACT on
    the sampled pair universe: with the target forced low enough that
    K > 1 at fixture SF, q_lsh_eval's counts must equal the hash-sampled
    restriction of the independently computed truth (q_exact_jaccard_pairs,
    recall-1 by construction) and LSH candidate sets."""
    import hashlib

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.plans import dedup_queries as DQ
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    n = load_split(spark, sf_dir, "documents").count()
    monkeypatch.setattr(DQ, "TRUTH_SAMPLE_TARGET", max(1, n // 5))
    k_mod = DQ._truth_sample_mod(load_split(spark, sf_dir, "documents"))
    assert k_mod == 5

    def h60(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    truth_all = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q_exact_jaccard_pairs"](spark, sf_dir).collect()
    }
    docs = load_split(spark, sf_dir, "documents")
    sig = D.with_minhash_signature(
        D.with_shingles(docs).filter(F.size("shingles") > 0).select(
            "doc_id", "shingles"
        ),
        portable=True,
    )
    cand_all = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig).collect()}

    truth_s = {p for p in truth_all if h60(p[0]) % k_mod == 0}
    cand_s = {p for p in cand_all if h60(p[0]) % k_mod == 0}
    got = DQ.QUERIES["q_lsh_eval"](spark, sf_dir).collect()[0]
    assert got.n_true_pairs == len(truth_s)
    assert got.n_lsh_candidates == len(cand_s)
    assert got.n_true_found == len(truth_s & cand_s)
    # non-vacuous: the sample keeps some truth pairs at fixture SF
    assert got.n_true_pairs > 0


def test_sample_quantile_buckets_agree_with_exact_ntile(spark, sf_dir):
    """The scale path q_score_calibration's docstring promises: bucket
    assignment from broadcast sample boundaries must (a) produce k
    near-equal populations, (b) keep score ranges monotone across
    buckets, and (c) agree with the exact global NTILE cut on the vast
    majority of rows (disagreement is confined to sampling error around
    each boundary)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators.quantiles import (
        assign_sample_quantile_buckets,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", F.col("n_chars").cast("bigint").alias("score")
    )
    assigned = assign_sample_quantile_buckets(
        scored, "score", "doc_id", n_buckets=10, sample_bp=2000,
        descending=True,
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    exact = scored.withColumn("exact_b", F.ntile(10).over(w))
    joined = assigned.join(exact, ["doc_id", "score"]).select(
        "doc_id", "score", "bucket", "exact_b"
    )
    rows = joined.collect()
    n = len(rows)
    assert n > 100
    # (a) populations within 2x of n/10 (hash-sample boundaries wobble,
    # ties collapse into one bucket — never more than a small factor)
    from collections import Counter

    pops = Counter(r["bucket"] for r in rows)
    assert set(pops) <= set(range(1, 11))
    for b, cnt in pops.items():
        assert cnt <= 2 * (n // 10) + 10, (b, cnt)
    # (b) monotone: a lower bucket index never holds a lower score than
    # a higher bucket's maximum (descending orientation)
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["score"])
    buckets = sorted(by_bucket)
    for lo_b, hi_b in zip(buckets, buckets[1:]):
        assert min(by_bucket[lo_b]) >= max(by_bucket[hi_b]), (lo_b, hi_b)
    # (c) bulk agreement with the exact NTILE assignment
    agree = sum(1 for r in rows if r["bucket"] == r["exact_b"])
    assert agree / n >= 0.80, f"only {agree}/{n} agree"
    # determinism: a second run assigns identical buckets
    again = {
        (r["doc_id"], r["bucket"])
        for r in assign_sample_quantile_buckets(
            scored, "score", "doc_id", n_buckets=10, sample_bp=2000,
            descending=True,
        ).collect()
    }
    assert again == {(r["doc_id"], r["bucket"]) for r in rows}


def test_sample_quantile_buckets_null_scores(spark):
    """Round-10 review: NULL scores must neither crash the driver-side
    boundary sort (a NULL landing on a boundary rank made
    sorted([None, ...]) TypeError) nor be silently binned — they get a
    NULL bucket on both the sampled and the NTILE-fallback paths, and
    non-null rows keep a full 1..k bucket spread."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.quantiles import (
        assign_sample_quantile_buckets,
    )

    # sample_bp=10000: every row sampled, so plenty of NULLs hit
    # boundary ranks without the isNotNull guard
    scored = spark.range(400).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 3 == 0, (F.col("id") * 7 % 101))
        .cast("bigint")
        .alias("score"),
    )
    for sample_bp in (10000, 1):  # sampled path and NTILE fallback
        rows = assign_sample_quantile_buckets(
            scored, "score", "doc_id", n_buckets=4, sample_bp=sample_bp
        ).collect()
        null_buckets = {r["bucket"] for r in rows if r["score"] is None}
        assert null_buckets == {None}, (sample_bp, null_buckets)
        nonnull = [r["bucket"] for r in rows if r["score"] is not None]
        assert set(nonnull) == {1, 2, 3, 4}, (sample_bp, set(nonnull))


def test_sample_quantile_buckets_degenerate_sample_falls_back(spark):
    """ADVICE r9: a sample below n_buckets rows (here: empty, tiny
    corpus at 1bp) must NOT silently put every row in one bucket — the
    operator falls back to the exact NTILE cut, honoring the n/k
    population guarantee."""
    from collections import Counter

    from terraform_aws_lambda_kinesis_to_es_spark.operators.quantiles import (
        assign_sample_quantile_buckets,
    )

    scored = spark.range(40).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") * 7 % 101).cast("bigint").alias("score"),
    )
    for descending in (False, True):
        rows = assign_sample_quantile_buckets(
            scored, "score", "doc_id", n_buckets=4, sample_bp=1,
            descending=descending,
        ).collect()
        pops = Counter(r["bucket"] for r in rows)
        assert pops == {1: 10, 2: 10, 3: 10, 4: 10}, (descending, pops)
        top = {r["bucket"] for r in rows if r["score"] >= 70}
        assert top == ({4} if not descending else {1})
