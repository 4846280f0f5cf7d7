"""Staged round-13 queries vs their DuckDB oracles — the driver's
compare protocol applied BEFORE declaration (plans/staged_r13.py stays
out of the declared registry until the round-13 head opens). The
oracle compare runs at BOTH sf0.001 and sf0.01, plus the staging
contract and per-query semantic pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r13 import (
    BOOT_B,
    CONTAM_NS,
    GAP_THRESHOLDS_S,
    HUB_PANEL,
    ORACLES,
    PREFIX_LEN,
    QUERIES,
    RETR_K,
    WM_THRESHOLDS_S,
)
from tests.oracle_harness import compare, duck_connect

# sf0.01 — the driver's own correctness scale factor (the sf_dir fixture
# default is sf0.001; overriding TEST_SF_DIR to sf0.01 collapses the
# two-SF coverage into one corpus — keep the override off for staging)
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck01():
    con = duck_connect(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_staged_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    res = compare(df, duck, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_staged_query_matches_oracle_sf001(name, spark, duck01):
    """The same compare at the driver's own correctness scale factor."""
    df = QUERIES[name](spark, SF01)
    res = compare(df, duck01, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_staging_contract():
    assert set(QUERIES) == set(ORACLES)
    assert not set(QUERIES) & set(entrypoint.queries())


# ------------------------------------------------------ semantic pins


def test_split_leakage_covers_cross_split_pairs(spark):
    """The audit must see cross-split pairs, and every unordered pair
    class it emits must be internally consistent (lo <= hi)."""
    rows = QUERIES["q_split_leakage"](spark, SF01).collect()
    assert rows, "detector found no near-dup pairs at sf0.01"
    assert all(r.split_lo <= r.split_hi for r in rows)
    # train is 90% of mass, so same-split train pairs must exist
    assert any(r.split_lo == "train" and r.split_hi == "train" for r in rows)


def test_retrieval_eval_mrr_bounds(spark):
    """MRR is a rational in [0, 10000]; hits <= k; and MRR is positive
    exactly when a relevant doc made the top k (a theorem of the
    definition, unlike ranker-vs-ranker orderings, which depend on the
    corpus)."""
    rows = {r.query_term: r for r in QUERIES["q_retrieval_eval"](spark, SF01).collect()}
    assert "all" in rows and len(rows) == 4
    for r in rows.values():
        assert 0 <= r.mrr_bp <= 10_000
        assert 0 <= r.n_hits_at_k <= RETR_K
        assert (r.mrr_bp > 0) == (r.n_hits_at_k > 0)


def test_contamination_sweep_monotone(spark):
    """Larger n can only shrink the contaminated set: every n-gram
    shared at size n+Δ contains a shared n-gram at size n."""
    rows = {r.n: r for r in QUERIES["q_contamination_sweep"](spark, SF01).collect()}
    ns = sorted(rows)
    assert list(ns) == sorted(CONTAM_NS)
    for a, b in zip(ns, ns[1:]):
        assert rows[a].n_contam_docs >= rows[b].n_contam_docs


def test_cusum_nonnegative_with_single_peak_value(spark):
    rows = QUERIES["q_cusum_changepoint"](spark, SF01).collect()
    assert all(r.cusum_scaled >= 0 for r in rows)
    peak = max(r.cusum_scaled for r in rows)
    assert all((r.cusum_scaled == peak) == bool(r.is_peak) for r in rows)


def test_watermark_curve_monotone(spark):
    """A wider watermark can only drop fewer events."""
    rows = sorted(
        QUERIES["q_watermark_sizing"](spark, SF01).collect(),
        key=lambda r: r.threshold_s,
    )
    assert [r.threshold_s for r in rows] == list(WM_THRESHOLDS_S)
    for a, b in zip(rows, rows[1:]):
        assert a.n_dropped >= b.n_dropped
    # the jitter model must actually produce disorder to size against
    assert rows[0].n_dropped > 0


def test_session_gap_curve_monotone(spark):
    rows = sorted(
        QUERIES["q_session_gap_curve"](spark, SF01).collect(),
        key=lambda r: r.gap_s,
    )
    assert [r.gap_s for r in rows] == list(GAP_THRESHOLDS_S)
    for a, b in zip(rows, rows[1:]):
        assert a.n_sessions >= b.n_sessions
    # n_sessions >= n_users always
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    nu = ev.select("user_id").distinct().count()
    assert all(r.n_sessions >= nu for r in rows)


def test_media_integrity_counts_match_corrupt_rule(spark):
    """The audit's flags must recover exactly the injected subsets."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    expect_trunc = docs.filter(F.col("doc_id") % 7 == 0).count()
    expect_magic = docs.filter(F.col("doc_id") % 11 == 0).count()
    rows = QUERIES["q_media_integrity"](spark, SF01).collect()
    assert sum(r.n_truncated for r in rows) == expect_trunc
    assert sum(r.n_bad_magic for r in rows) == expect_magic
    assert all(0 <= r.ok_bp <= 10_000 for r in rows)


def test_mojibake_recovers_injected_noise(spark):
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    rows = QUERIES["q_mojibake"](spark, SF01).collect()
    assert sum(r.n_mojibake for r in rows) == docs.filter(
        F.col("doc_id") % 13 == 0
    ).count()
    assert sum(r.n_replacement for r in rows) == docs.filter(
        F.col("doc_id") % 17 == 0
    ).count()
    assert sum(r.n_ctrl for r in rows) == docs.filter(
        F.col("doc_id") % 19 == 0
    ).count()


def test_poisson_bootstrap_replicates_and_weights(spark):
    """All BOOT_B replicates present; each reweighted mean is close to
    the population mean (Poisson(1) weights are unbiased) — a sanity
    band, not an exact pin."""
    rows = QUERIES["q_poisson_bootstrap"](spark, SF01).collect()
    assert len(rows) == BOOT_B
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    pop_milli = (
        docs.agg(F.expr("CAST((1000 * SUM(n_chars)) DIV COUNT(*) AS BIGINT)"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.n_eff > 0
        assert abs(r.mean_milli - pop_milli) < pop_milli * 0.25


def test_hubness_mass_conservation(spark):
    """sum(k_occurrence * n_vectors) == panel * k retrieved slots, and
    sum(n_vectors) == corpus size (every vector lands in exactly one
    histogram bucket, including the zero bucket)."""
    rows = QUERIES["q_hubness"](spark, SF01).collect()
    vecs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = vecs.count()
    assert sum(r.n_vectors for r in rows) == n
    assert sum(r.k_occurrence * r.n_vectors for r in rows) == HUB_PANEL * RETR_K


def test_readability_bands_partition_the_corpus(spark):
    df = QUERIES["q_readability"](spark, SF01)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    assert df.count() == docs.count()
    bands = {r.band for r in df.select("band").distinct().collect()}
    assert bands <= {"easy", "standard", "hard", "very_hard"}


def test_prefix_sharing_groups_are_real(spark):
    """Every reported group's saving arithmetic holds, and group sizes
    are >= 2 by contract."""
    rows = QUERIES["q_prefix_sharing"](spark, SF01).collect()
    assert rows, "corpus has shared prefixes at sf0.01 (measured 23)"
    for r in rows:
        assert r.n_docs >= 2
        assert r.tokens_saved == PREFIX_LEN * (r.n_docs - 1)


def test_r13_head_plan_consistent():
    """The written round-13 head plan: exactly 50 names = the 12 staged
    names + 38 already-declared rotation names, no duplicates, no
    overlap with the round-12 head plan (each name gets exactly one
    promotion window)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans import (
        _R12_HEAD,
        _R13_HEAD_PLAN,
    )

    assert len(_R13_HEAD_PLAN) == 50
    assert len(set(_R13_HEAD_PLAN)) == 50
    assert set(_R13_HEAD_PLAN[:12]) == set(QUERIES)
    declared = set(entrypoint.queries())
    assert set(_R13_HEAD_PLAN[12:]) <= declared
    assert not set(_R13_HEAD_PLAN) & set(_R12_HEAD)
