"""Staged round-14 queries vs their DuckDB oracles — the driver's
compare protocol applied BEFORE declaration (plans/staged_r14.py stays
out of the declared registry until the round-14 head opens). The
oracle compare runs at BOTH sf0.001 and sf0.01, plus the staging
contract and per-query semantic pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r14 import (
    CACHE_SIZES,
    DUP_THRESHOLDS_BP,
    JL_PANEL,
    LDIV_L,
    MASE_EVAL_DAYS,
    ORACLES,
    QUERIES,
)
from tests.oracle_harness import compare, duck_connect

# sf0.01 — the driver's own correctness scale factor (the sf_dir fixture
# default is sf0.001; keep TEST_SF_DIR off so the two-SF coverage holds)
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
def test_staged_query_matches_oracle_sf01(name, spark, duck01):
    """The same compare at the driver's own correctness scale factor."""
    df = QUERIES[name](spark, SF01)
    res = compare(df, duck01, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_staging_contract():
    assert set(QUERIES) == set(ORACLES)
    assert not set(QUERIES) & set(entrypoint.queries())
    # must also stay disjoint from the sibling staged tranche (r13)
    from terraform_aws_lambda_kinesis_to_es_spark.plans import staged_r13

    assert not set(QUERIES) & set(staged_r13.QUERIES)


# ------------------------------------------------------ semantic pins


def test_l_diversity_flags_consistent(spark):
    rows = QUERIES["q_l_diversity"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert r.l_distinct <= r.k_rows
        assert bool(r.at_risk) == (r.l_distinct < LDIV_L)


def test_mase_forecast_arithmetic(spark):
    (r,) = QUERIES["q_mase_forecast"](spark, SF01).collect()
    assert r.n_eval_days == MASE_EVAL_DAYS
    assert r.mase_bp == (10_000 * r.mae_sn) // max(r.mae_naive, 1)


def test_event_bursts_arithmetic(spark):
    (r,) = QUERIES["q_event_bursts"](spark, SF01).collect()
    assert r.n_windows > 0 and r.median_count > 0
    assert r.burst_bp == (10_000 * r.n_bursts) // r.n_windows


def test_cache_hit_curve_monotone(spark):
    rows = sorted(
        QUERIES["q_cache_hit_curve"](spark, SF01).collect(),
        key=lambda r: r.cache_size,
    )
    assert [r.cache_size for r in rows] == list(CACHE_SIZES)
    for a, b in zip(rows, rows[1:]):
        assert a.hit_bp <= b.hit_bp  # a bigger cache can only hit more
    assert all(0 < r.hit_bp <= 10_000 for r in rows)


def test_mixture_rebalance_caps_and_targets(spark):
    rows = QUERIES["q_mixture_rebalance"](spark, SF01).collect()
    for r in rows:
        assert 0 < r.rate_bp <= 10_000
        assert r.kept_tokens <= r.n_tokens
        if r.share_bp <= r.target_bp:
            # under-represented languages keep everything
            assert r.rate_bp == 10_000


def test_dup_threshold_curve_monotone(spark):
    rows = {
        r.threshold_bp: r
        for r in QUERIES["q_dup_threshold_sensitivity"](spark, SF01).collect()
    }
    ts = sorted(rows)
    assert ts == sorted(DUP_THRESHOLDS_BP)
    for a, b in zip(ts, ts[1:]):
        assert rows[a].n_pairs >= rows[b].n_pairs
        assert rows[a].n_docs_removed >= rows[b].n_docs_removed


def test_survivor_bias_conservation(spark):
    rows = QUERIES["q_dedup_survivor_bias"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert r.n_after <= r.n_before
        assert r.shift_bp == r.after_bp - r.before_bp
    # shares sum to ~10000 (short only by per-row DIV truncation)
    for col in ("before_bp", "after_bp"):
        s = sum(getattr(r, col) for r in rows)
        assert 10_000 - len(rows) <= s <= 10_000


def test_pair_sample_within_strata(spark):
    rows = QUERIES["q_pair_sample_audit"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_pairs
        assert 5 <= r.decile <= 10


def test_label_propagation_covers_corpus(spark):
    df = QUERIES["q_label_propagation"](spark, SF01)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    rows = df.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert bool(r.changed) == (r.lang0 != r.lang_final)
    # isolated nodes (no near-dup edges) must keep their label, so the
    # changed mass is bounded by the detector's touched-node set
    assert sum(r.changed for r in rows) < len(rows) // 2


def test_jl_distortion_mass_and_center(spark):
    rows = QUERIES["q_jl_distortion"](spark, SF01).collect()
    total = sum(r.n_pairs for r in rows)
    assert 0 < total <= JL_PANEL * (JL_PANEL - 1) // 2
    # JL: most dimension-normalized ratios land within [0.5x, 1.5x]
    center = sum(r.n_pairs for r in rows if 5 <= r.bucket <= 14)
    assert center >= total // 2


def test_quant_calibration_bounds_ordered(spark):
    rows = QUERIES["q_quant_calibration"](spark, SF01).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.p01 is not None and r.p99 is not None
        assert r.p01 <= r.p99


def test_type_gini_bounds(spark):
    rows = QUERIES["q_type_gini"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0 <= r.gini_bp < 10_000
        if r.n_types == 1:
            assert r.gini_bp == 0
