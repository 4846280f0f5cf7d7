"""Staged round-17 queries vs their DuckDB oracles — the driver's
compare protocol applied BEFORE declaration (plans/staged_r17.py stays
out of the declared registry until the round-17 head opens). The
oracle compare runs at BOTH sf0.001 and sf0.01, plus the staging
contract and per-query semantic pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r17 import (
    ACF_MAX_LAG,
    ORACLES,
    QUERIES,
    SCHEMA_SHIFT_BP,
    TOST_MARGIN_BP,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load
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


# ------------------------------------------------------ semantic pins


def test_psi_nonnegative_and_mass_accounting(spark, sf_dir):
    """Every PSI term (p-q)·ln(p/q) is >= 0, so the scalar is; the two
    halves partition each type's volume."""
    totals = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["q_psi_drift"](spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(totals)
    for r in rows:
        assert r["psi_r"] >= 0.0
        assert r["n_old"] + r["n_new"] == totals[r["event_type"]]
        assert r["n_active_buckets"] >= 1


def test_ks_bounds_and_mass(spark, sf_dir):
    totals = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in QUERIES["q_ks_drift"](spark, sf_dir).collect():
        assert 0 <= r["ks_bp"] <= 10000
        assert r["at_bucket"] >= 0
        assert r["n_old"] + r["n_new"] == totals[r["event_type"]]


def test_mix_drift_recomputes(spark, sf_dir):
    """Shares, delta, and the chi²-style contribution recompute exactly
    from the emitted counts (the statistic is closed over its output)."""
    rows = QUERIES["q_mix_drift_chi2"](spark, sf_dir).collect()
    t_old = sum(r["c_old"] for r in rows)
    t_new = sum(r["c_new"] for r in rows)
    for r in rows:
        po = (10000 * r["c_old"]) // t_old
        pn = (10000 * r["c_new"]) // t_new
        assert r["share_old_bp"] == po
        assert r["share_new_bp"] == pn
        assert r["delta_bp"] == pn - po
        want = ((pn - po) * (pn - po) * 1000) // (po + pn) if po + pn else 0
        assert r["chi2_milli"] == want


def test_acf_cauchy_schwarz_bound(spark, sf_dir):
    """|r_l| <= 1 (numerator over n-l pairs, denominator over all n
    deviations — Cauchy-Schwarz), lags complete."""
    n_days = (
        load(spark, sf_dir, "events")
        .select(F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    rows = sorted(
        QUERIES["q_acf_daily"](spark, sf_dir).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    for r in rows:
        assert abs(r["acf_r"]) <= 1.0
        assert r["n_pairs"] == n_days - r["lag"]


def test_dispersion_recomputes_from_raw(spark, sf_dir):
    """mean_c / mad_c replayed in Python from the raw half values for
    every (type, half) — the integer-cents contract end-to-end."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r17 import (
        _halved_events,
    )

    raw: dict[tuple, list[int]] = {}
    for r in (
        _halved_events(spark, sf_dir)
        .select(
            "event_type",
            "is_old",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_c"),
        )
        .collect()
    ):
        raw.setdefault((r["event_type"], r["is_old"]), []).append(r["v_c"])
    for r in QUERIES["q_dispersion_drift"](spark, sf_dir).collect():
        for is_old, mean_col, mad_col, n_col in (
            (True, "mean_old_c", "mad_old_c", "n_old"),
            (False, "mean_new_c", "mad_new_c", "n_new"),
        ):
            vs = raw[(r["event_type"], is_old)]
            assert r[n_col] == len(vs)
            mean_c = sum(vs) // len(vs)
            assert r[mean_col] == mean_c
            assert r[mad_col] == sum(abs(v - mean_c) for v in vs) // len(vs)
        want_ratio = (10000 * r["mad_new_c"]) // max(r["mad_old_c"], 1)
        assert r["mad_ratio_bp"] == want_ratio


def test_tost_verdict_closed_over_output(spark, sf_dir):
    """margin, d, and the equivalence verdict recompute exactly from
    the emitted means and se² sum (squared-compare form)."""
    for r in QUERIES["q_tost_equivalence"](spark, sf_dir).collect():
        d = abs(r["mean_new_milli"] - r["mean_old_milli"])
        assert r["d_milli"] == d
        m = (
            ((r["mean_old_milli"] + r["mean_new_milli"]) // 2)
            * TOST_MARGIN_BP
        ) // 10000
        assert r["margin_milli"] == m
        assert r["se2_sum"] >= 0
        want = int(d <= m and (m - d) * (m - d) >= 4 * r["se2_sum"])
        assert r["equivalent"] == want


def test_novel_rate_accounting(spark, sf_dir):
    """First day is all-novel; novel mass sums to the distinct digest
    count; the cumulative curve is monotone and closes the total."""
    rows = sorted(
        QUERIES["q_novel_rate"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["n_novel"] == rows[0]["n"]
    assert rows[0]["novel_bp"] == 10000
    cums = [r["cum_distinct"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["n_novel"] for r in rows)
    for r in rows:
        assert 0 <= r["novel_bp"] <= 10000


def test_schema_drift_exercises_every_status(spark, sf_dir):
    """The injected churn lands each synthetic key in its designed
    status and the real key stays stable — all four branches
    driver-exercised."""
    by_key = {
        r["k"]: r for r in QUERIES["q_schema_drift"](spark, sf_dir).collect()
    }
    assert by_key["k_new"]["status"] == "new"
    assert by_key["k_new"]["n_old"] == 0
    assert by_key["k_legacy"]["status"] == "dropped"
    assert by_key["k_legacy"]["n_new"] == 0
    assert by_key["k_shift"]["status"] == "shifted"
    assert abs(by_key["k_shift"]["delta_bp"]) > SCHEMA_SHIFT_BP
    assert by_key["k"]["status"] == "stable"


def test_embedding_drift_shape(spark, sf_dir):
    n_labels = (
        load(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    per_label = {
        (r["label"], r["n"])
        for r in load(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["q_embedding_drift"](spark, sf_dir).collect()
    assert len(rows) == n_labels
    for r in rows:
        assert r["shift2_r"] >= 0.0
        assert (r["label"], r["n_even"] + r["n_odd"]) in per_label


def test_quality_decomp_identity_within_floor_tolerance(spark, sf_dir):
    """Σ mix + Σ within == (Σ p₂m₂ - Σ p₁m₁)/10 up to the per-source
    floor error (each term floors once → |error| <= 2 milli per
    source) — the Oaxaca identity, closed over the emitted columns."""
    rows = QUERIES["q_quality_drift_decomp"](spark, sf_dir).collect()
    got = sum(r["mix_milli"] + r["within_milli"] for r in rows)
    want = (
        sum(r["p2_bp"] * r["m2_bp"] for r in rows)
        - sum(r["p1_bp"] * r["m1_bp"] for r in rows)
    ) / 10.0
    assert abs(got - want) <= 2 * len(rows)
    # shares account for (almost) the full halves: floor under-counts only
    assert 10000 - len(rows) <= sum(r["p1_bp"] for r in rows) <= 10000
    assert 10000 - len(rows) <= sum(r["p2_bp"] for r in rows) <= 10000


def test_cadence_gap_accounting(spark, sf_dir):
    """Per-(type,user,half) chains of length c contribute c-1 gaps."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r17 import (
        _halved_events,
    )

    chains = (
        _halved_events(spark, sf_dir)
        .groupBy("event_type", "user_id", "is_old")
        .agg(F.count("*").alias("c"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("c - 1")).alias("n_gaps"),
        )
        .collect()
    )
    want = {r["event_type"]: r["n_gaps"] for r in chains}
    for r in QUERIES["q_cadence_drift"](spark, sf_dir).collect():
        assert r["n_gaps_old"] + r["n_gaps_new"] == want[r["event_type"]]
        assert 0 <= r["ks_bp"] <= 10000


def test_dup_rate_drift_closed_over_output(spark, sf_dir):
    """dup_bp per day and the pooled delta recompute exactly from the
    emitted day rows; day mass equals the corpus."""
    rows = QUERIES["q_dup_rate_drift"](spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == load(spark, sf_dir, "events").count()
    for r in rows:
        assert r["dup_bp"] == (10000 * (r["n"] - r["n_distinct"])) // r["n"]
    old = [r for r in rows if r["is_old"] == 1]
    new = [r for r in rows if r["is_old"] == 0]
    assert len(old) - len(new) in (0, 1)  # first ceil(D/2) days are old
    rate = lambda rs: (  # noqa: E731
        10000 * (sum(r["n"] for r in rs) - sum(r["n_distinct"] for r in rs))
    ) // sum(r["n"] for r in rs)
    want_delta = rate(new) - rate(old)
    assert all(r["delta_bp"] == want_delta for r in rows)
