"""Corpus-queries tranche vs their DuckDB oracles — the driver's compare
protocol, kept running after the round-8 promotion (these names are now
declared in plans/__init__.py _HEAD). Also pins the declaration contract
(every name registered with an oracle) plus per-query semantic
invariants and plan-shape scale pins."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
    ORACLES,
    QUERIES,
)
from tests.oracle_harness import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_staged_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    res = compare(df, duck, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_promotion_contract():
    """Post-promotion: every tranche name is declared through the driver
    entrypoint WITH its oracle. (The tranche filled the round-8 verdict
    head and went driver-green in CORRECTNESS_r08; later rotations move
    it out of the 50-name window by design, so head membership is NOT
    asserted here.)"""
    assert set(QUERIES) == set(ORACLES)
    declared = entrypoint.queries()
    declared_oracles = entrypoint.oracle_sql()
    for name in QUERIES:
        assert name in declared
        assert declared_oracles[name] == ORACLES[name]


def test_url_canonical_collapses_variants(spark, sf_dir):
    """Four consecutive doc_ids share one canonical URL by construction,
    so every domain's dup rate must be positive and n_canonical must be
    ~n_urls/4 (exactly, when the id range covers whole variant groups)."""
    rows = QUERIES["q_url_canonical"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_canonical"] < r["n_urls"]
        assert r["dup_bp"] > 0
        # canonical count can never drop below the base-id group count
        assert r["n_canonical"] * 4 >= r["n_urls"]


def test_canonical_url_unit(spark):
    """The canonicalizer itself, on handwritten URLs: case, www, default
    ports, tracking params, param order, fragment, trailing slash all
    normalize; non-default port and real params survive."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        canonical_url,
    )

    cases = [
        ("HTTP://WWW.A.Example.COM:80/x/?b=2&utm_source=s&a=1#f",
         "http://a.example.com/x?a=1&b=2"),
        ("https://a.example.com:443/x", "https://a.example.com/x"),
        ("https://a.example.com:8443/x?fbclid=z", "https://a.example.com:8443/x"),
        ("http://b.example.com/y/", "http://b.example.com/y"),
        ("http://b.example.com/y?gclid=1&utm_medium=m", "http://b.example.com/y"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_weighted_reservoir_is_aes(spark, sf_dir):
    """A-ES invariants: exactly K rows, keys descending, and the
    selection equals a local recomputation of top-K by the contract's
    coarse integer key floor(ln(u)/w * 1e6) (ties to lowest doc_id) over
    the whole corpus — the fixed-precision rule that makes the ranking
    robust to 1-ulp JVM-vs-libm log() disagreement."""
    import math

    from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        RESERVOIR_K,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    from pyspark.sql import functions as F

    rows = QUERIES["q_weighted_reservoir"](spark, sf_dir).collect()
    assert len(rows) == RESERVOIR_K
    keys = [r["key_e6"] for r in rows]
    assert keys == sorted(keys, reverse=True)

    docs = load_split(spark, sf_dir, "documents")
    local = docs.select(
        "doc_id",
        "n_chars",
        hash60(F.col("doc_id").cast("string")).alias("h"),
    ).collect()
    want = sorted(
        local,
        key=lambda r: (
            -math.floor(
                math.log((r["h"] + 1) / float(1 << 60)) / r["n_chars"] * 1e6
            ),
            r["doc_id"],
        ),
    )[:RESERVOIR_K]
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in want}


def test_zorder_prunes_linear_does_not(spark, sf_dir):
    """The point of the layout: under the audited 2-D predicate the
    Z-order layout must make a strictly larger fraction of files
    prunable than the date-linear layout, while both layouts hold the
    same row total. Also pins zone-map sanity (min <= max)."""
    rows = QUERIES["q_layout_skipping"](spark, sf_dir).collect()
    z = [r for r in rows if r["layout"] == "zorder"]
    lin = [r for r in rows if r["layout"] == "linear"]
    assert z and lin
    assert sum(r["n_rows"] for r in z) == sum(r["n_rows"] for r in lin)
    for r in rows:
        assert r["cx_min"] <= r["cx_max"] and r["dy_min"] <= r["dy_max"]
    z_frac = sum(1 for r in z if r["prunable"]) / len(z)
    lin_frac = sum(1 for r in lin if r["prunable"]) / len(lin)
    assert z_frac > lin_frac
    assert z_frac >= 0.5  # the 32-of-256-bucket predicate prunes most z-files


def test_linear_quality_score_bounds(spark, sf_dir):
    """Scores are mean-of-weights: |score| <= 1000 by construction,
    n_feats <= distinct dims (1024), and every doc with text appears."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import LQ_DIMS
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_linear_quality"](spark, sf_dir).collect()
    n_docs = load_split(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert -1000 <= r["score"] <= 1000
        assert 1 <= r["n_feats"] <= LQ_DIMS


def test_lsh_tuning_scurve_monotonicity(spark, sf_dir):
    """The banding S-curve tradeoff the query exists to measure: more
    rows per band => candidate volume never increases and precision
    never decreases; the production (32, 2) config appears and its
    candidate count bounds the others. True pairs are a subset of
    candidates in every config."""
    rows = {r["rows_per_band"]: r for r in QUERIES["q_lsh_tuning"](spark, sf_dir).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2]["n_candidates"] >= rows[4]["n_candidates"] >= rows[8]["n_candidates"]
    assert rows[2]["precision_bp"] <= rows[4]["precision_bp"] <= rows[8]["precision_bp"]
    for r in rows.values():
        assert 0 <= r["n_true"] <= r["n_candidates"]
    assert rows[2]["n_candidates"] > 0  # the production config finds work


def test_time_decay_integer_halving(spark, sf_dir):
    """Exact-arithmetic invariants: decayed_bp <= 10000 * n_events, both
    positive, and a synthetic two-event frame decays exactly by shift
    (7-day-old event = 5000 bp, 70-day-old = 10000 >> 10 = 9 bp)."""
    from pyspark.sql import functions as F

    rows = QUERIES["q_time_decay"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["decayed_bp"] <= 10000 * r["n_events"]

    synth = spark.createDataFrame(
        [(1, "2024-03-11 00:00:00", "a"),
         (2, "2024-03-04 00:00:00", "a"),
         (3, "2024-01-01 00:00:00", "b")],
        "event_id long, ts string, event_type string",
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    import tempfile, os

    d = tempfile.mkdtemp(prefix="decay_")
    synth.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["event_type"]: r for r in QUERIES["q_time_decay"](spark, d).collect()}
    # type a: fresh event 10000 + 7-day-old 5000; type b: 70 days -> >>10
    assert got["a"]["decayed_bp"] == 15000
    assert got["b"]["decayed_bp"] == 10000 >> 10
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_staged_r8_plan_shapes(spark, sf_dir):
    """Scale pins, pre-promotion (mirrors tests/test_plan_shape.py):

    - q_url_canonical / q_linear_quality / q_time_decay / q_layout_skipping:
      map-only expression work + keyed (or single-row-broadcast)
      aggregates — no products, no NLJ beyond the single-row extent
      broadcasts, no global single-partition windows.
    - q_weighted_reservoir: the top-k is a distributed TakeOrdered,
      never a global sort or single-partition window.
    - q_lsh_tuning: every candidate join is equi-keyed; the only
      products are the whitelisted 1-row count attaches."""
    res = _plan_of(spark, sf_dir, "q_weighted_reservoir")
    assert "TakeOrderedAndProject" in res
    assert "CartesianProduct" not in res

    for name in ("q_url_canonical", "q_linear_quality"):
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    for name in ("q_layout_skipping", "q_time_decay"):
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        # single-row extent attach is the only permitted NLJ
        assert plan.count("BroadcastNestedLoopJoin") <= 2, name

    tuning = _plan_of(spark, sf_dir, "q_lsh_tuning")
    assert "CartesianProduct" not in tuning


def test_media_phash_groups_exact_image_dups(spark, sf_dir):
    """aHash invariants through the REAL decoder: identical first-96-byte
    texts MUST share a hash (exact-dup images collapse), n_same counts
    group size exactly, and the hash uses only the low 32 bits."""
    from collections import Counter

    rows = QUERIES["q_media_phash"](spark, sf_dir).collect()
    assert rows
    by_hash = Counter(r["ahash"] for r in rows)
    for r in rows:
        assert r["n_same"] == by_hash[r["ahash"]]
        assert 0 <= r["ahash"] < (1 << 32)
    # the fixture corpus carries exact text dups -> image dups exist
    assert any(n > 1 for n in by_hash.values())


def test_media_phash_brightness_invariance(spark):
    """The perceptual property that distinguishes aHash from a byte
    hash: a uniformly brightened copy of an image keeps the SAME hash
    (bits compare each pixel to the image mean), while a byte-level
    digest of the payload changes."""
    import numpy as np

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        PH_PIXELS,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 200, size=(4, 8, 3)).astype(np.uint8)
    bright = (base.astype(np.int64) + 40).clip(0, 255).astype(np.uint8)

    def ahash(px):
        gray = px.astype("int64").sum(axis=2).reshape(-1)
        total = int(gray.sum())
        return sum(1 << p for p, g in enumerate(gray.tolist()) if PH_PIXELS * g > total)

    a1 = ahash(M.decode_image(M.encode_ppm(base)))
    a2 = ahash(M.decode_image(M.encode_ppm(bright)))
    assert a1 == a2
    assert M.encode_ppm(base) != M.encode_ppm(bright)


def test_kmv_overlap_estimates_track_exact(spark, sf_dir):
    """The estimator contract: every pair's union estimate lands within
    the KMV error envelope (~1/sqrt(K) ~ 6.25% at K=256; allow 3x for
    the inclusion-exclusion amplification on jaccard), sketches never
    exceed K values, and exact legs obey set algebra."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import KMV_K

    rows = QUERIES["q_kmv_overlap"](spark, sf_dir).collect()
    assert len(rows) == 190  # 20 sources -> C(20,2) pairs
    for r in rows:
        assert r["exact_union"] > 0
        assert 0 <= r["exact_jaccard_bp"] <= 10000
        # union estimate within 3 standard errors of exact
        assert r["union_err_bp"] <= 3 * 10000 // int(KMV_K ** 0.5)
    # the estimator must track the exact jaccard ORDER on average:
    # correlation proxy — mean absolute jaccard error bounded
    errs = [abs(r["est_jaccard_bp"] - r["exact_jaccard_bp"]) for r in rows]
    assert sum(errs) / len(errs) < 1500


def test_kmv_overlap_reports_disjoint_pairs(spark, tmp_path):
    """Regression (round-8 ADVICE): a source pair sharing ZERO 3-grams
    must still appear, with exact_jaccard_bp = 0 and exact_union =
    na + nb — an inner join on the exact-intersection leg silently
    dropped exactly the fully-disjoint pairs the audit exists to
    surface. Three synthetic sources: a/b disjoint, a/c overlapping;
    the DuckDB oracle is pinned on the same corpus (the fixture corpus
    can't cover this — every fixture source pair overlaps)."""
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "src_a", "alpha beta gamma delta epsilon"),
            (2, "src_b", "one two three four five six"),
            (3, "src_c", "alpha beta gamma delta zeta"),
        ],
        "doc_id long, source string, text string",
    )
    d = str(tmp_path / "kmv_disjoint")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in QUERIES["q_kmv_overlap"](spark, d).collect()
    }
    assert set(rows) == {
        ("src_a", "src_b"),
        ("src_a", "src_c"),
        ("src_b", "src_c"),
    }
    ab = rows[("src_a", "src_b")]
    assert ab["exact_jaccard_bp"] == 0
    assert ab["exact_union"] == 3 + 4  # 3 + 4 distinct 3-grams, no overlap
    ac = rows[("src_a", "src_c")]
    assert ac["exact_jaccard_bp"] > 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS"
        f" SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    res = compare(QUERIES["q_kmv_overlap"](spark, d), con, ORACLES["q_kmv_overlap"])
    con.close()
    assert res["ok"], res


def test_audio_fingerprint_gain_tolerance(spark, sf_dir):
    """Energy-profile invariants through the REAL WAV decoder: groups
    count exactly; the fingerprint is 8-bit; and a gain-scaled copy of
    a clip keeps the SAME fingerprint (above-mean bits are scale
    invariant) while the payload bytes differ — the property a byte
    digest lacks."""
    from collections import Counter

    import numpy as np
    import struct

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        _wav_header,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        AF_WINDOWS,
    )

    rows = QUERIES["q_audio_fingerprint"](spark, sf_dir).collect()
    by_fp = Counter(r["afp"] for r in rows)
    for r in rows:
        assert r["n_same"] == by_fp[r["afp"]]
        assert 0 <= r["afp"] < (1 << AF_WINDOWS)
    assert any(n > 1 for n in by_fp.values())

    def fp_of(samples):
        payload = _wav_header(len(samples) * 2) + struct.pack(
            f"<{len(samples)}h", *samples
        )
        s, _ = M.decode_audio(payload)
        win = np.abs(s.astype(np.int64)).reshape(AF_WINDOWS, -1).sum(axis=1)
        total = int(win.sum())
        return sum(1 << w for w, e in enumerate(win.tolist()) if AF_WINDOWS * e > total)

    rng = np.random.RandomState(3)
    base = rng.randint(-3000, 3000, size=32).tolist()
    doubled = [2 * x for x in base]
    assert fp_of(base) == fp_of(doubled)


def test_mmr_diversify_tradeoff(spark, sf_dir):
    """MMR invariants: exactly K ranked rows from the POOL shortlist;
    rank 1 is the relevance argmax; every later score <= lambda * its
    rel (the penalty only subtracts); scores are non-increasing in rank
    (greedy argmax over a shrinking candidate set of a submodular-style
    objective... pinned empirically on the fixed fixtures); and the
    selection diversifies: it is NOT simply the top-K by relevance
    (otherwise the penalty term did nothing on this corpus)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        MMR_QUERY_VEC_ID,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _vec,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from pyspark.sql import functions as F

    rows = sorted(
        QUERIES["q_mmr_diversify"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
    assert rows[0]["score"] == round(rows[0]["rel"], 5)
    # score = lambda*rel - (1-lambda)*maxsim with maxsim in [-1, 1]
    # (cosines go NEGATIVE, so the penalty term can ADD up to 1-lambda)
    for r in rows[1:]:
        assert r["score"] <= MMR_LAMBDA * r["rel"] + (1 - MMR_LAMBDA) + 1e-9
        assert r["score"] >= MMR_LAMBDA * r["rel"] - (1 - MMR_LAMBDA) - 1e-9
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    vecs = _vec(spark, sf_dir)
    qv = vecs.filter(F.col("vec_id") == MMR_QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    top_rel = [
        r["doc_id"]
        for r in vecs.filter(F.col("vec_id") != MMR_QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(S.cosine(F.col("v"), F.col("qv")), 4).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("doc_id"))
        .limit(MMR_K)
        .collect()
    ]
    assert [r["doc_id"] for r in rows] != top_rel
    assert len({r["doc_id"] for r in rows}) == MMR_K


def test_ngram_novelty_set_algebra(spark, sf_dir):
    """Novelty invariants: n_novel <= n_grams per source; summing
    n_novel over sources equals the count of grams with exactly one
    source (each novel gram counted once); rates in [0, 10000]."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert 0 <= r["novelty_bp"] <= 10000
    docs = load_split(spark, sf_dir, "documents")
    singletons = (
        D.with_shingles(docs)
        .select("source", F.explode("shingles").alias("g"))
        .distinct()
        .groupBy("g")
        .count()
        .filter(F.col("count") == 1)
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == singletons


def test_join_size_est_overestimates_only(spark, sf_dir):
    """The CMS inner-product estimator can only overcount (collision
    cross terms add, never subtract) and must be within the textbook
    error envelope on this key distribution: err <= exact + N_a*N_b/W
    per row, and the min-over-rows should land well under one full
    extra width-collision budget."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        JSE_WIDTH,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    row = QUERIES["q_join_size_est"](spark, sf_dir).collect()[0]
    assert row["est_join"] >= row["exact_join"]
    assert row["err_bp"] >= 0
    n_a = load_split(spark, sf_dir, "orders").count()
    n_b = load_split(spark, sf_dir, "customer").count()
    assert row["est_join"] - row["exact_join"] <= n_a * n_b // JSE_WIDTH + 1


def _replicate_docs(spark, sf_dir, tmp_path, replicas, verbatim):
    """Collision-free R-replica corpus under the family-sweep id rule
    (doc_id*R+r; r=0 participates). verbatim=True keeps every replica's
    text identical (planted near-dup cliques); verbatim=False suffixes
    EVERY token with the replica id — a bijective per-replica shingle
    relabeling, so intra-replica Jaccard structure is preserved exactly
    while replicas share ZERO shingles (a partial mutation like a
    single-vowel translate leaves vowel-free shingles intact, and at
    the permissive 32x2 banding that residual cross-replica similarity
    floods the candidate set)."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    reps = [docs.withColumn("doc_id", F.col("doc_id") * replicas)]
    for r in range(1, replicas):
        text = (
            F.col("text")
            if verbatim
            else F.regexp_replace(F.col("text"), r"(\S+)", f"$1{r}")
        )
        reps.append(
            docs.withColumn("text", text).withColumn(
                "doc_id", F.col("doc_id") * replicas + F.lit(r)
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    d = str(tmp_path / f"rep{replicas}_{'v' if verbatim else 'm'}")
    out.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_lsh_tuning_candidates_track_dup_structure(spark, tmp_path):
    """The count-tracking claim behind q_lsh_tuning's 100x wall ratio
    (VERDICT r7 #3): candidate volume follows the corpus's planted DUP
    STRUCTURE, not an algorithmic corpus^2 term. Replicating the corpus
    3x with MUTATED text (no cross-replica dups) grows candidates
    ~linearly (each replica re-finds its own intra-replica pairs);
    replicating VERBATIM (3-clique per doc) grows candidates
    super-linearly — at least the 3x-diagonal + cross-replica-pair
    floor — exactly the clique mode the 100x family corpus plants."""
    base_dir = "/root/testdata/sf0.001"
    m3 = _replicate_docs(spark, base_dir, tmp_path, 3, verbatim=False)
    v3 = _replicate_docs(spark, base_dir, tmp_path, 3, verbatim=True)

    def cands(d):
        return {
            r["rows_per_band"]: r["n_candidates"]
            for r in QUERIES["q_lsh_tuning"](spark, d).collect()
        }

    base = cands(base_dir)
    mut = cands(m3)
    verb = cands(v3)
    assert base[2] > 0
    for rows in (2, 4, 8):
        # mutated replicas: intra-replica structure repeats ~3x (the
        # relabeling preserves every pairwise Jaccard exactly), with
        # small symmetric slack because relabeled shingles re-sample
        # the banding collisions (measured: base 28 -> mut 81-85
        # across all three bandings)
        assert mut[rows] >= 3 * base[rows] - 10
        assert mut[rows] <= 3 * base[rows] + 50
        # verbatim replicas: every base candidate pair becomes 3x3 copies
        # and every doc with a non-empty shingle set adds its own
        # C(3,2)=3 clique pairs -> strictly super-linear in the replicas
        assert verb[rows] >= 9 * base[rows]
        assert verb[rows] > mut[rows]


def test_linear_quality_features_track_corpus(spark, tmp_path):
    """The count-tracking claim behind q_linear_quality's 100x wall
    ratio: per-doc features are a pure function of text, so verbatim
    3x replication multiplies total feature memberships EXACTLY 3x
    (wall tracks feature rows, which track corpus tokens), while the
    distinct dim space stays bounded by LQ_DIMS regardless of scale."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        LQ_DIMS,
    )

    base_dir = "/root/testdata/sf0.001"
    v3 = _replicate_docs(spark, base_dir, tmp_path, 3, verbatim=True)

    def stats(d):
        df = QUERIES["q_linear_quality"](spark, d)
        r = df.agg(
            F.count("*").alias("n_docs"), F.sum("n_feats").alias("feats")
        ).collect()[0]
        return r["n_docs"], r["feats"]

    n1, f1 = stats(base_dir)
    n3, f3 = stats(v3)
    assert n3 == 3 * n1
    assert f3 == 3 * f1
    assert f1 / n1 <= LQ_DIMS
