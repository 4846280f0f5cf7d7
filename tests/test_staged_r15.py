"""Staged round-15 queries vs their DuckDB oracles — the driver's
compare protocol applied BEFORE declaration (plans/staged_r15.py stays
out of the declared registry until the round-15 head opens). The
oracle compare runs at BOTH sf0.001 and sf0.01, plus the staging
contract and per-query semantic pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r15 import (
    AB_SHINGLE_NS,
    KCORE_ROUNDS,
    MIH_HAM_T,
    NDCG_K,
    ORACLES,
    PARETO_BUCKETS,
    QUERIES,
    SLO_ALERT_MILLI,
    TCLOSE_T_BP,
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


# ------------------------------------------------------ semantic pins


def test_phash_mih_is_exact_for_the_radius(spark, sf_dir):
    """The MIH guarantee itself: for every sampled anchor, the banded
    probe finds EXACTLY the partners a brute-force Hamming scan over
    the same hashes finds at d <= MIH_HAM_T (pigeonhole over 4
    disjoint bands), with the anchor predicate mirrored bit-for-bit."""
    from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
        hash60 as _hash60,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        ahash_frame,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r15 import (
        MIH_ANCHOR_TARGET,
    )

    hf = ahash_frame(spark, sf_dir)
    hashes = {r["doc_id"]: r["ahash"] for r in hf.collect()}
    k_mod = max(1, len(hashes) // MIH_ANCHOR_TARGET)
    anchor_rows = hf.filter(
        _hash60(F.col("doc_id").cast("string")) % k_mod == 0
    ).collect()
    anchors = {r["doc_id"] for r in anchor_rows}
    assert anchors, "sample predicate must select anchors"
    want = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a in anchors
        for b in hashes
        if a != b and bin(hashes[a] ^ hashes[b]).count("1") <= MIH_HAM_T
    }
    got = {
        (r["anchor_id"], r["partner_id"], r["hamming"])
        for r in QUERIES["q_phash_mih"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture must contain near-miss hash pairs"


def test_metric_agreement_shape(spark, sf_dir):
    rows = QUERIES["q_metric_agreement"](spark, sf_dir).collect()
    assert len(rows) == 5  # one row per query vector
    for r in rows:
        assert 0 < r["n_overlap"] <= 10
        assert r["overlap_bp"] == 1000 * r["n_overlap"]
        assert r["top1_agree"] in (0, 1)


def test_kcore_peeling_is_monotone(spark, sf_dir):
    rows = {
        r["round"]: r for r in QUERIES["q_kcore"](spark, sf_dir).collect()
    }
    assert sorted(rows) == list(range(KCORE_ROUNDS + 1))
    for r in range(1, KCORE_ROUNDS + 1):
        assert rows[r]["n_nodes"] <= rows[r - 1]["n_nodes"]
        assert rows[r]["n_edges"] <= rows[r - 1]["n_edges"]
    assert rows[0]["n_edges"] > 0, "fixture must have a dup graph"


def test_cluster_purity_bounds(spark, sf_dir):
    rows = QUERIES["q_dup_cluster_purity"](spark, sf_dir).collect()
    assert rows, "fixture must have multi-doc clusters"
    for r in rows:
        assert r["n_docs"] > 1
        assert 1 <= r["n_langs"] <= r["n_docs"]
        assert 0 < r["purity_bp"] <= 10000
        # purity 10000 <=> monolingual cluster, in both directions
        assert (r["purity_bp"] == 10000) == (r["n_langs"] == 1)


def test_t_closeness_flag_consistent(spark, sf_dir):
    rows = QUERIES["q_t_closeness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["t_bp"] <= 10000
        assert r["at_risk"] == int(r["t_bp"] > TCLOSE_T_BP)


def test_chi2_full_grid_and_nonnegative(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    n_langs = docs.select("lang").distinct().count()
    n_sources = docs.select("source").distinct().count()
    rows = QUERIES["q_chi2_independence"](spark, sf_dir).collect()
    assert len(rows) == n_langs * n_sources  # zero cells included
    assert all(r["dev_q"] >= 0 for r in rows)
    assert sum(r["n_obs"] for r in rows) == docs.count()


def test_dup_quality_interaction_conservation(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_dup_quality_interaction"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == load_split(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_docs"]
        assert r["dup_rate_bp"] == 10000 * r["n_dup"] // r["n_docs"]
    assert sum(r["n_dup"] for r in rows) > 0


def test_shingle_ablation_arithmetic(spark, sf_dir):
    """Anchored-candidate counts per shingle n: arithmetic consistency
    plus the knob's reason to exist — small shingles inflate candidate
    mass even on the anchored sample."""
    rows = {
        r["shingle_n"]: r
        for r in QUERIES["q_shingle_ablation"](spark, sf_dir).collect()
    }
    assert sorted(rows) == list(AB_SHINGLE_NS)
    for r in rows.values():
        assert 0 <= r["n_verified"] <= r["n_cands"]
        assert r["precision_bp"] == 10000 * r["n_verified"] // max(
            r["n_cands"], 1
        )
    assert rows[3]["n_cands"] > rows[7]["n_cands"]


def test_revenue_pareto_lorenz_shape(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    rows = sorted(
        QUERIES["q_revenue_pareto"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, PARETO_BUCKETS + 1))
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_cust"] for r in rows) == n_cust
    # sorted-descending tiers: shares weakly decrease, cumulative rises
    shares = [r["share_bp"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    cums = [r["cum_share_bp"] for r in rows]
    assert cums == sorted(cums)
    assert 10000 - PARETO_BUCKETS <= cums[-1] <= 10000  # DIV truncation only


def test_seasonality_shares_sum(spark, sf_dir):
    rows = QUERIES["q_seasonality_strength"](spark, sf_dir).collect()
    by_type: dict[str, int] = {}
    for r in rows:
        assert 1 <= r["dow"] <= 7
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0) + r["share_bp"]
    for t, s in by_type.items():
        assert 10000 - 7 <= s <= 10000, t  # DIV truncation only


def test_ndcg_curve_invariants(spark, sf_dir):
    rows = sorted(
        QUERIES["q_ndcg_eval"](spark, sf_dir).collect(),
        key=lambda r: r["pos"],
    )
    assert [r["pos"] for r in rows] == list(range(1, NDCG_K + 1))
    for r in rows:
        # the ideal prefix maximizes every prefix sum: dcg@p <= idcg@p
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]
        assert 0 < r["ndcg_bp"] <= 10000
    # cumulative sums rise
    assert [r["dcg_micro"] for r in rows] == sorted(
        r["dcg_micro"] for r in rows
    )


def test_slo_burn_alert_consistency(spark, sf_dir):
    rows = QUERIES["q_slo_burn"](spark, sf_dir).collect()
    assert len(rows) >= 24  # densified hourly spine
    n_alerts = 0
    for r in rows:
        want = int(
            r["burn_1h_milli"] > SLO_ALERT_MILLI
            and r["burn_6h_milli"] > SLO_ALERT_MILLI
        )
        assert r["alert"] == want
        n_alerts += r["alert"]
    assert n_alerts > 0, "fixture must exercise the alert path"
