"""Diagnostics-tranche queries (promoted round 11; staged round 10 as
plans/staged_r11.py) vs their DuckDB oracles — the driver's compare
protocol at BOTH sf0.001 (the sf_dir fixture) and sf0.01 (the driver's
correctness SF), plus per-query semantic invariants. The declaration
contract test pins that every tranche name is in the declared
surface with the identical oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.diagnostics_queries import (
    AB_PERMS,
    ORACLES,
    PACK_LENGTHS,
    QUERIES,
)
from tests.oracle_harness import compare, duck_connect

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck01():
    con = duck_connect(SF001)
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
    df = QUERIES[name](spark, SF001)
    res = compare(df, duck01, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_declaration_contract():
    """Promoted round 11: every tranche name is declared with the
    identical oracle. (The head-position claim expired with the
    round-12 rotation — the r12 window heads the surface now; the
    standing pattern is to drop the positional assertion once the
    tranche's verdict window has passed, as every earlier promoted
    tranche did.)"""
    assert set(QUERIES) == set(ORACLES)
    declared_q = entrypoint.queries()
    declared_o = entrypoint.oracle_sql()
    assert set(QUERIES) <= set(declared_q)
    for name, sql in ORACLES.items():
        assert declared_o[name] == sql


# ------------------------------------------------------ semantic pins


def test_index_churn_profile(spark, sf_dir):
    """All 32 bands report; the edit cohort produces real churn in both
    directions; unedited mass keeps the index mostly stable."""
    rows = {r["band"]: r for r in QUERIES["q_index_churn"](spark, sf_dir).collect()}
    assert sorted(rows) == list(range(32))
    assert sum(r["n_added"] for r in rows.values()) > 0
    assert sum(r["n_removed"] for r in rows.values()) > 0
    for r in rows.values():
        assert r["n_stable"] > r["n_added"], r
        assert r["n_stable"] > r["n_removed"], r


def test_band_yield_accounts_for_every_candidate(spark, sf_dir):
    """Min-band attribution partitions the candidate set: per-band
    counts sum to exactly the distinct banded candidate pairs, and
    verified <= candidates everywhere."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_band_yield"](spark, sf_dir).collect()
    assert rows
    docs = load_split(spark, sf_dir, "documents")
    sh = D.with_shingles(docs).select("doc_id", "shingles")
    sig = D.with_minhash_signature(
        sh.filter(F.size("shingles") > 0), portable=True
    )
    n_cand = D.lsh_candidate_pairs(sig).count()
    assert sum(r["n_candidates"] for r in rows) == n_cand
    for r in rows:
        assert 0 <= r["n_verified"] <= r["n_candidates"]


def test_minhash_ablation_error_shrinks_with_signature(spark, sf_dir):
    """Same pair set at every r; longer signature prefixes estimate no
    worse than the 16-perm prefix in aggregate."""
    rows = {
        r["n_perm"]: r
        for r in QUERIES["q_minhash_ablation"](spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(AB_PERMS)
    n_pairs = {r["n_pairs"] for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0
    assert rows[64]["sum_abs_err_bp"] <= rows[16]["sum_abs_err_bp"]


def test_dedup_cascade_chains(spark, sf_dir):
    rows = {r["stage"]: r for r in QUERIES["q_dedup_cascade"](spark, sf_dir).collect()}
    assert set(rows) == {"exact", "normalized", "near_dup"}
    for r in rows.values():
        assert r["n_in"] - r["n_removed"] == r["n_out"]
        assert r["n_removed"] >= 0
    assert rows["exact"]["n_out"] == rows["normalized"]["n_in"]
    assert rows["normalized"]["n_out"] == rows["near_dup"]["n_in"]
    # the enrichment cohorts + the fixture's planted near-dups give
    # every stage real work at every SF
    assert rows["exact"]["n_removed"] > 0
    assert rows["normalized"]["n_removed"] > 0
    assert rows["near_dup"]["n_removed"] > 0


def test_hard_negatives_cross_label_top1(spark, sf_dir):
    rows = QUERIES["q_hard_negatives"](spark, sf_dir).collect()
    assert rows
    anchors = [r["anchor_id"] for r in rows]
    assert len(anchors) == len(set(anchors))  # exactly one row per anchor
    for r in rows:
        assert r["neg_label"] != r["anchor_label"]
        assert r["sim"] <= 1.0001


def test_embed_norm_audit_covers_corpus(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_embed_norm_audit"](spark, sf_dir).collect()
    n_total = load_split(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    for r in rows:
        assert r["min_norm"] <= r["max_norm"]
        assert 0 <= r["n_unit"] <= r["n_vecs"]


def test_filter_overlap_is_upper_triangular_and_bounded(spark, sf_dir):
    rows = QUERIES["q_filter_overlap"](spark, sf_dir).collect()
    assert rows
    diag = {
        r["rule_a"]: r["n_docs"] for r in rows if r["rule_a"] == r["rule_b"]
    }
    for r in rows:
        assert r["rule_a"] <= r["rule_b"]
        if r["rule_a"] != r["rule_b"]:
            # a co-failure count can never exceed either marginal
            assert r["n_docs"] <= diag[r["rule_a"]]
            assert r["n_docs"] <= diag[r["rule_b"]]


def test_rater_kappa_cells_sum(spark, sf_dir):
    rows = QUERIES["q_rater_kappa"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        cells = (
            r["n_both_keep"] + r["n_c4_only"] + r["n_gopher_only"] + r["n_both_drop"]
        )
        assert cells == r["n_docs"]
        assert (
            r["agree_bp"]
            == (10000 * (r["n_both_keep"] + r["n_both_drop"])) // r["n_docs"]
        )


def test_langid_confusion_covers_corpus(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_langid_confusion"](spark, sf_dir).collect()
    n_docs = load_split(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    langs = {"de", "en", "es", "fr", "und"}
    for r in rows:
        assert r["lang_full"] in langs and r["lang_half"] in langs


def test_pack_efficiency_monotone(spark, sf_dir):
    rows = {
        r["seq_len"]: r for r in QUERIES["q_pack_efficiency"](spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(PACK_LENGTHS)
    n_docs = {r["n_docs"] for r in rows.values()}
    assert len(n_docs) == 1
    # shorter sequences => at least as many sequences, less padding mass
    ls = sorted(PACK_LENGTHS)
    for lo, hi in zip(ls, ls[1:]):
        assert rows[lo]["n_seqs"] >= rows[hi]["n_seqs"]
        assert rows[lo]["pad_tokens"] <= rows[hi]["pad_tokens"]
    for r in rows.values():
        assert 0 <= r["pad_share_bp"] < 10000


def test_image_border_uniformity_ranges(spark, sf_dir):
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_image_border_uniformity"](spark, sf_dir).collect()
    n_docs = load_split(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["border_avg_gray"] <= 765
        assert 0 <= r["center_avg_gray"] <= 765
        assert 1 <= r["n_border_buckets"] <= 16
        assert r["letterbox"] == (r["n_border_buckets"] == 1)


def test_growth_accounting_identities(spark, sf_dir):
    """Every user's first day is 'new'; every activity segment (run of
    consecutive days) opens with new/resurrected and closes with one
    churn — so segment starts equal churn events in total."""
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

    rows = QUERIES["q_growth_accounting"](spark, sf_dir).collect()
    assert rows
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_new"] for r in rows) == n_users
    starts = sum(r["n_new"] + r["n_resurrected"] for r in rows)
    churns = sum(r["n_churned"] for r in rows)
    assert starts == churns
