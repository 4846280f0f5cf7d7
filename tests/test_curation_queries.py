"""Curation-tranche queries (promoted round 7) vs their DuckDB oracles —
the driver's compare protocol, kept as a local pre-check even though the
names are now declared. Also pins the promotion contract: every name is
declared exactly once, leads the round-7 head, and has an oracle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import (
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
    """Round 7 (VERDICT r6 #1): all 11 curation names are DECLARED and
    carry oracles. They occupied the round-7 50-name verdict window
    (declaration order = check order) and went driver-green there
    (CORRECTNESS_r07); the round-8 rotation then correctly evicted them
    for the corpus tranche + verdict-age rotation, so head membership is
    no longer asserted — only the standing declaration contract is.
    q_semdedup_hashseed stays gone — its rule became
    q_semdedup_bucketed's declared contract (VERDICT r6 #2)."""
    assert set(QUERIES) == set(ORACLES)
    declared = entrypoint.queries()
    declared_oracles = entrypoint.oracle_sql()
    for name in QUERIES:
        assert name in declared, name
        assert name in declared_oracles, name
    assert "q_semdedup_hashseed" not in declared


def test_heavy_hitters_overestimates_only(spark, sf_dir):
    """CMS estimates can only overcount (collisions add, never subtract)."""
    rows = QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    assert rows, "expected a non-empty heavy-hitter report"
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_hybrid_rrf_pool_shape(spark, sf_dir):
    """Each leg contributes exactly RRF_POOL ranks (corpus >> pool at all
    fixture SFs) and rrf is maximal when both legs rank a doc first."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import (
        RRF_K,
        RRF_POOL,
    )

    rows = QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    lex = [r for r in rows if r["lex_rank"] is not None]
    vec = [r for r in rows if r["vec_rank"] is not None]
    assert len(lex) == RRF_POOL and len(vec) == RRF_POOL
    assert sorted(r["lex_rank"] for r in lex) == list(range(1, RRF_POOL + 1))
    assert sorted(r["vec_rank"] for r in vec) == list(range(1, RRF_POOL + 1))
    top = max(rows, key=lambda r: r["rrf"])
    assert top["rrf"] <= round(2.0 / (RRF_K + 1), 6)


def _plan_of(spark, sf_dir, name: str) -> str:
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_staged_plan_shapes(spark, sf_dir):
    """Scale pins, pre-promotion (mirrors tests/test_plan_shape.py):

    - q_hybrid_rrf: each leg's corpus-wide top-k is a distributed
      TakeOrdered, never a global single-partition Window; the only
      unkeyed products are the two broadcast-side scoring patterns
      (bm25's single-row stats, the single query vector) — when promoted
      the name joins _INTENTIONAL_PRODUCT with that note.
    - q_heavy_hitters: the probe->sketch join is a broadcast hash join
      (2048-cell side), no product anywhere.
    - q_sorted_neighborhood: the neighbor join is EQUI-keyed (no
      products, no NLJ) so block size never induces in-block n^2."""
    rrf = _plan_of(spark, sf_dir, "q_hybrid_rrf")
    assert "TakeOrderedAndProject" in rrf
    assert "CartesianProduct" not in rrf

    hh = _plan_of(spark, sf_dir, "q_heavy_hitters")
    assert "BroadcastHashJoin" in hh
    assert "CartesianProduct" not in hh
    assert "BroadcastNestedLoopJoin" not in hh

    snm = _plan_of(spark, sf_dir, "q_sorted_neighborhood")
    assert "CartesianProduct" not in snm
    assert "BroadcastNestedLoopJoin" not in snm


def test_sorted_neighborhood_subset_of_exact(spark, sf_dir):
    """SNM is a blocking HEURISTIC: every pair it emits must be a true
    near-dup pair under the same threshold (verify is exact), i.e. a
    subset of the exhaustive-Jaccard truth at SNM_THRESHOLD_BP."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import (
        SNM_THRESHOLD_BP,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    from pyspark.sql import functions as F

    got = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q_sorted_neighborhood"](spark, sf_dir).collect()
    }
    docs = load_split(spark, sf_dir, "documents")
    sh = D.with_shingles(docs).select("doc_id", "shingles")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    truth_df = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.size(F.array_intersect("sh_a", "sh_b")) > 0)
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST((10000 * size(array_intersect(sh_a, sh_b)))"
                " DIV (size(sh_a) + size(sh_b)"
                "      - size(array_intersect(sh_a, sh_b))) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= SNM_THRESHOLD_BP)
    )
    truth = {(r["doc_a"], r["doc_b"]) for r in truth_df.collect()}
    assert got <= truth


def test_staged_plan_shapes_r6_additions(spark, sf_dir):
    """Scale pins for the round-6 staged additions: all joins equi-keyed
    (gram hash / doc_id / source), windows partitioned (doc_id / source)
    — never a global single-partition window, never a product."""
    for name in (
        "q_substring_spans",
        "q_substring_strip",
        "q_domain_cap",
        "q_dataset_card",
        "q_hist_quantiles",
        "q_bloom_semijoin",
    ):
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_duplicated_spans_merge_geometry(spark):
    """duplicated_token_spans on a synthetic corpus with known geometry:

    - an 8-token sequence shared by two docs -> one [0, 8) span in each;
    - a 9-token shared sequence -> its two overlapping dup windows MERGE
      into one [0, 9) span;
    - two dup regions in one doc separated by > K tokens stay SEPARATE;
    - an immediately repeated 8-seq inside one doc: dup windows at pos 0
      and 8 are exactly K apart -> adjacent spans merge to [0, 16)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        duplicated_token_spans,
    )

    dup8 = " ".join(f"t{i}" for i in range(8))
    dup9 = " ".join(f"u{i}" for i in range(9))
    gap9 = " ".join(f"g{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, dup8),
            (2, f"{dup8} {gap9} {dup9}"),
            (3, dup9),
            (4, f"{dup8} {dup8}"),
            # sub-K edge (r5-ADVICE lesson — pin the short-doc contract):
            # identical docs SHORTER than K are never windowed, so they
            # produce NO spans — on the engine AND the oracle (DuckDB
            # generate_series(1, <=0) is empty, Spark's shifted-slice
            # n-grams are an empty array). ExactSubstr semantics: dups
            # below the window length are invisible by design.
            (5, "a b c"),
            (6, "a b c"),
            (7, ""),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in duplicated_token_spans(docs, 8).collect():
        spans[r["doc_id"]].add((r["s"], r["e"]))
    assert spans[1] == {(0, 8)}
    # doc 2: dup8 at [0,8); dup9 at tokens 17..25 -> merged [17, 26);
    # the 9-token gap (> K) keeps the two spans separate
    assert spans[2] == {(0, 8), (17, 26)}
    assert spans[3] == {(0, 9)}
    # doc 4: the repeated 8-seq — dup windows at pos 0 and 8 (the seam
    # windows occur once and don't count); 8 - 0 = K means adjacent
    # spans [0,8) and [8,16) merge into one
    assert spans[4] == {(0, 16)}
    assert spans[5] == set() and spans[6] == set() and spans[7] == set()


def test_domain_cap_binds_exactly(spark, sf_dir):
    """The cap keeps exactly min(CAP_N, n_docs) per source, and kept
    token mass is consistent (0 < tokens_kept <= tokens_total when the
    cap binds)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import CAP_N

    rows = QUERIES["q_domain_cap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(CAP_N, r["n_docs"])
        assert 0 < r["tokens_kept"] <= r["tokens_total"]
        assert 0 < r["kept_bp"] <= 10000


def test_hist_quantiles_bracket_exact(spark, sf_dir):
    """The sketch's chosen bin must CONTAIN the true order statistic:
    for each pct, exact k-th smallest totalprice (k = ceil(pct*n/100))
    falls in [bin*W, (bin+1)*W) — the at-most-one-bin-width error
    contract. Exact leg computed by sorting the fixture locally."""
    import math

    from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import (
        HQ_BIN_W,
        HQ_PCTS,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    got = {
        r["pct"]: r
        for r in QUERIES["q_hist_quantiles"](spark, sf_dir).collect()
    }
    assert set(got) == set(HQ_PCTS)
    vals = sorted(
        r["o_totalprice"]
        for r in load_split(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    for pct in HQ_PCTS:
        k = math.ceil(pct * n / 100)
        exact = vals[k - 1]
        r = got[pct]
        assert r["n_rows"] == n
        assert r["bin"] * HQ_BIN_W <= exact < (r["bin"] + 1) * HQ_BIN_W
        assert r["q_upper"] == (r["bin"] + 1) * HQ_BIN_W


def test_scd2_intervals_chain(spark, sf_dir):
    """SCD2 invariants per user: versions are 1..n contiguous; intervals
    chain exactly (valid_to == next interval's valid_from); only the
    last interval is open (valid_to NULL); consecutive intervals never
    carry the same event_type (change points only); one exchange plan
    (both window passes share the user_id partitioning)."""
    from collections import defaultdict

    df = QUERIES["q_scd2_intervals"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    by_user = defaultdict(list)
    for r in df.collect():
        by_user[r["user_id"]].append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]
        assert rows[-1]["valid_to"] is None
        assert all(r["valid_to"] is not None for r in rows[:-1])


def test_substring_strip_consistent_with_spans(spark, sf_dir):
    """Strip executes exactly what spans report: per doc, n_removed ==
    the summed length of its merged spans, n_kept + n_removed ==
    n_tokens, and the cleaned text has exactly n_kept tokens (no dup
    window of the original corpus survives verbatim at span boundaries
    is NOT asserted — stripping can create new k-grams, which is the
    documented one-pass semantics)."""
    spans_rows = QUERIES["q_substring_spans"](spark, sf_dir).collect()
    strip_rows = QUERIES["q_substring_strip"](spark, sf_dir).collect()
    spans_by_doc = {r["doc_id"]: r for r in spans_rows}
    assert len(strip_rows) == len(spans_rows)
    n_stripped = 0
    for r in strip_rows:
        s = spans_by_doc[r["doc_id"]]
        assert r["n_removed"] == s["dup_tokens"]
        assert r["n_kept"] + r["n_removed"] == s["n_tokens"]
        n_toks = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert n_toks == r["n_kept"]
        n_stripped += 1 if r["n_removed"] > 0 else 0
    assert n_stripped >= 5, "fixture should exercise real removals"


def test_hashseed_codebook_survives_id_clustered_corpus(spark, sf_dir):
    """The failure mode q_semdedup_bucketed's re-contracted hash-ranked
    seed rule exists for (VERDICT r6 #2), reproduced small:
    a corpus whose ids are ordered by content (10 base directions x 50
    near-identical replicas, id = base*50 + r — the crawl-ordered /
    replicated-shard shape). First-k-id seeds draw the whole codebook
    from ONE direction; hash-ranked seeds re-diversify it. Pins the
    direction diversity and the intra-cluster pair-pass cost driver
    (max cluster size: the replica-group size vs 5x over it).
    Deterministic: fixed md5 hash, fixed fixture vectors."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60
    from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _vec,
    )

    base = _vec(spark, sf_dir).filter(F.col("vec_id") < 10)
    reps = spark.range(50).withColumnRenamed("id", "r")
    corpus = base.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") * 50 + F.col("r")).alias("vec_id"),
        F.transform(
            "v", lambda x: x + (F.col("r") % 7).cast("double") * F.lit(1e-4)
        ).alias("v"),
    )
    n_seeds = 32
    first = corpus.filter(F.col("vec_id") < n_seeds).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("sv")
    )
    hashed = (
        corpus.orderBy(
            hash60(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
        )
        .limit(n_seeds)
        .select(F.col("vec_id").alias("cluster"), F.col("v").alias("sv"))
    )

    def profile(seeds):
        dirs = (
            seeds.select((F.col("cluster") / 50).cast("int").alias("b"))
            .distinct()
            .count()
        )
        assigned = S.assign_bucketed_seeds(corpus, seeds)
        occ = assigned.groupBy("cluster").count()
        return dirs, occ.agg(F.max("count")).collect()[0][0]

    first_dirs, first_max = profile(first)
    hash_dirs, hash_max = profile(hashed)
    assert first_dirs == 1  # the degenerate codebook
    assert hash_dirs == 10  # every direction represented
    assert hash_max == 50  # clusters land exactly on replica groups
    assert first_max >= 4 * hash_max  # the pair-pass cost driver


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom contract, both directions that matter: every exact member
    key PASSES the filter (no false negatives — per-key checked, not
    just counted), and false positives are nonnegative with a sane rate
    at the 4032-bit/3-hash sizing."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.plans.curation_queries import (
        _bloom_bits,
        _bloom_words,
        BLOOM_BAL,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    row = QUERIES["q_bloom_semijoin"](spark, sf_dir).collect()[0]
    assert row["n_pass"] >= row["n_exact"]
    assert row["n_false_pos"] == row["n_pass"] - row["n_exact"]
    # ~10 bits/member at k=3 puts the theoretical FP near 1.7%; a fixed
    # 4032-bit filter measured 67% at sf0.1 before count-derived sizing
    assert 0 <= row["fp_bp"] < 500, "FP rate far above the sizing math"

    # per-key no-false-negative check: every member key's own bits are
    # set by construction (it contributed them to the bit_or)
    cust = load_split(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_acctbal") > BLOOM_BAL).select(
        F.col("c_custkey").alias("key")
    )
    words = _bloom_words(members.count())
    bloom = (
        _bloom_bits(members, F.col("key"), words)
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), pos))").alias("bm"))
    )
    missing = (
        _bloom_bits(members, F.col("key"), words)
        .join(bloom, "word")
        .filter(F.expr("(shiftright(bm, pos) & CAST(1 AS BIGINT)) = 0"))
        .count()
    )
    assert missing == 0
