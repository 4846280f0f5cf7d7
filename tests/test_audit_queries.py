"""Audit-tranche queries vs their DuckDB oracles — the driver's compare
protocol, kept running after the round-9 promotion (the tranche was
staged in round 8 as plans/staged_r9.py and verified here pre-
declaration). The oracle compare runs at BOTH sf0.001 (the sf_dir
fixture) and sf0.01 (the driver's correctness SF) in this file. Also
pins the promotion contract (every audit query is declared with the
identical oracle) plus per-query semantic invariants."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
    ORACLES,
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


def test_staging_contract():
    assert set(QUERIES) == set(ORACLES)
    # promoted in round 9: every audit query is part of the declared
    # surface, with the identical oracle string
    declared_q = entrypoint.queries()
    declared_o = entrypoint.oracle_sql()
    assert set(QUERIES) <= set(declared_q)
    for name, sql in ORACLES.items():
        assert declared_o[name] == sql


# ------------------------------------------------------ semantic pins


def test_crawl_frontier_politeness(spark, sf_dir):
    """No host fetches twice at one due time; waves are FR_DELAY_S
    apart; global positions are contiguous from 1; within a host the
    priority never increases across waves."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
        FR_DELAY_S,
        FRONTIER_K,
    )

    rows = QUERIES["q_crawl_frontier"](spark, sf_dir).collect()
    assert len(rows) == FRONTIER_K
    assert sorted(r["global_pos"] for r in rows) == list(range(1, FRONTIER_K + 1))
    seen = set()
    per_host: dict[str, list] = {}
    for r in rows:
        assert (r["host"], r["fetch_at_s"]) not in seen
        seen.add((r["host"], r["fetch_at_s"]))
        assert r["fetch_at_s"] == (r["wave"] - 1) * FR_DELAY_S
        per_host.setdefault(r["host"], []).append(r)
    for host_rows in per_host.values():
        host_rows.sort(key=lambda r: r["wave"])
        pris = [r["priority"] for r in host_rows]
        assert pris == sorted(pris, reverse=True)


def test_snapshot_delta_reconciles(spark, sf_dir):
    """The per-source counts must reconcile with the modular cohorts
    that define v2: adds are the %19 cohort, removes the %17 cohort,
    changes the %13-minus-%17 cohort; unchanged is the rest of v1."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    docs = load_split(spark, sf_dir, "documents")
    expect = docs.groupBy("source").agg(
        F.sum((F.col("doc_id") % 19 == 0).cast("int")).alias("adds"),
        F.sum((F.col("doc_id") % 17 == 0).cast("int")).alias("rems"),
        F.sum(
            ((F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 17 != 0)).cast("int")
        ).alias("chgs"),
        F.count("*").alias("n"),
    )
    want = {r["source"]: r for r in expect.collect()}
    rows = QUERIES["q_snapshot_delta"](spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(want)
    for r in rows:
        w = want[r["source"]]
        assert r["n_added"] == w["adds"]
        assert r["n_removed"] == w["rems"]
        assert r["n_changed"] == w["chgs"]
        assert r["n_unchanged"] == w["n"] - w["rems"] - w["chgs"]
        assert (
            r["churn_bp"]
            == 10000 * (w["adds"] + w["rems"] + w["chgs"]) // w["n"]
        )


def test_code_detect_separates_cohorts(spark, sf_dir):
    """The code-ified cohort (%CODE_MOD, docs with >= 3 words) must flag
    is_code; untouched fixture text has ZERO code symbols."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import CODE_MOD

    rows = QUERIES["q_code_detect"](spark, sf_dir).collect()
    flagged = [r for r in rows if r["is_code"]]
    assert flagged
    for r in rows:
        if r["doc_id"] % CODE_MOD != 0:
            assert r["n_sym"] == 0 and not r["is_code"]
        else:
            assert r["sym_bp"] == 0 or r["is_code"] or r["n_sym"] < 6


def test_score_calibration_partitions_corpus(spark, sf_dir):
    """Deciles 1..10 cover every scored doc once; rates are exact
    integer floors; score ranges are non-overlapping in decile order
    (decile 1 = highest scores)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        q_linear_quality,
    )

    rows = sorted(
        QUERIES["q_score_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_scored = q_linear_quality(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    for r in rows:
        assert 0 <= r["n_bad"] <= r["n_docs"]
        assert r["bad_bp"] == 10000 * r["n_bad"] // r["n_docs"]
        assert r["score_min"] <= r["score_max"]
    for hi, lo in zip(rows, rows[1:]):
        assert hi["score_min"] >= lo["score_max"] - 0  # NTILE order: no inversion
        assert hi["score_max"] >= lo["score_max"]


def test_zipf_fit_shape(spark, sf_dir):
    """Rank-frequency slope must be negative (freq falls with rank) and
    R^2 must be a valid share; n_ranks is bounded by ZIPF_K."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import ZIPF_K

    r = QUERIES["q_zipf_fit"](spark, sf_dir).collect()[0]
    assert 0 < r["n_ranks"] <= ZIPF_K
    assert r["zipf_slope"] < 0
    assert 0.0 <= r["r2"] <= 1.0


def test_heaps_law_reconciles(spark, sf_dir):
    """Cumulative vocab must end at the corpus distinct-token count,
    cumulative tokens at the total token count, and both cumulative
    columns must be non-decreasing."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = sorted(
        QUERIES["q_heaps_law"](spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    toks = load_split(spark, sf_dir, "documents").select(
        F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    assert rows[-1]["vocab_cum"] == toks.select("w").distinct().count()
    assert rows[-1]["n_tokens_cum"] == toks.count()
    assert sum(r["n_new_tokens"] for r in rows) == rows[-1]["vocab_cum"]
    vc = [r["vocab_cum"] for r in rows]
    tc = [r["n_tokens_cum"] for r in rows]
    assert vc == sorted(vc) and tc == sorted(tc)


def test_js_divergence_bounds(spark, sf_dir):
    """JSD is symmetric-pair-complete (C(n_sources, 2) rows), bounded
    by [0, ln 2], and a source pair with identical text distributions
    would read 0 — the fixture's distinct sources must all read > 0."""
    import math

    rows = QUERIES["q_js_divergence"](spark, sf_dir).collect()
    n_src = len({r["src_a"] for r in rows} | {r["src_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert -1e-9 <= r["jsd_nats"] <= math.log(2.0) + 1e-9


def test_split_balance_reconciles(spark, sf_dir):
    """Cell counts per source must sum to the source's doc count, and
    every chi-square contribution is non-negative."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_split_balance"](spark, sf_dir).collect()
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["o"]
        assert r["chi2_c"] >= 0.0
        assert r["dev_bp"] >= 0
    docs = load_split(spark, sf_dir, "documents")
    want = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == want


def test_fellegi_sunter_classes(spark, sf_dir):
    """Uncorrupted clone pairs (custkey in none of the %3/%4/%5
    cohorts) score exactly name+bal+seg agree = 1292 centinats and
    class 'match'; the doubly-corrupted %12 cohort (name AND balance
    disagree, weight -373) must be absent from the emitted queue; no
    emitted weight is below the review threshold."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
        FS_B_OFFSET,
        FS_REVIEW_MIN,
        FS_W,
    )

    rows = QUERIES["q_fellegi_sunter"](spark, sf_dir).collect()
    assert rows
    full_agree = sum(w[0] for w in FS_W.values())
    by_pair = {(r["a_id"], r["b_id"]): r for r in rows}
    for (a_id, b_id), r in by_pair.items():
        assert r["weight_c"] >= FS_REVIEW_MIN
        if b_id == a_id + FS_B_OFFSET and all(
            a_id % m != 0 for m in (3, 4, 5)
        ):
            assert r["weight_c"] == full_agree and r["fs_class"] == "match"
    assert not any(
        a_id % 12 == 0 and b_id == a_id + FS_B_OFFSET
        for (a_id, b_id) in by_pair
    )


def test_audio_silence_padding_runs(spark, sf_dir):
    """Clips shorter than the frame window end in X'20'-padded samples
    (|s| = 8224, silent), so the longest silent run must cover at least
    the fully-padded sample pairs; all rates are valid basis points."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_split(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n_chars"))
        .collect()
    }
    rows = QUERIES["q_audio_silence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_samples"] == 32
        assert 0 <= r["sil_bp"] <= 10000
        assert 0 <= r["clip_bp"] <= 10000
        assert 0 <= r["longest_sil"] <= 32
        pad_pairs = max(0, (64 - chars[r["doc_id"]]) // 2 - 1)
        assert r["longest_sil"] >= min(32, pad_pairs)


def test_dominant_color_distribution(spark, sf_dir):
    """Dominant buckets are valid gray buckets, image counts sum to the
    corpus size, and the floor'd shares sum to within rounding of
    10000."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import DC_BUCKETS
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_media_dominant_color"](spark, sf_dir).collect()
    n_docs = load_split(spark, sf_dir, "documents").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    share = sum(r["share_bp"] for r in rows)
    assert 10000 - len(rows) <= share <= 10000
    for r in rows:
        assert 0 <= r["dom_bucket"] < DC_BUCKETS


def test_epoch_schedule_wrr_shares(spark, sf_dir):
    """Virtual times never decrease along the schedule, and over the
    emitted window each source's share tracks weight / sum(weights)
    within a couple of slots (the WRR guarantee)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import EPOCH_K

    rows = sorted(
        QUERIES["q_epoch_schedule"](spark, sf_dir).collect(),
        key=lambda r: r["global_pos"],
    )
    assert len(rows) == EPOCH_K
    vts = [r["vt"] for r in rows]
    assert vts == sorted(vts)
    weights: dict[str, int] = {}
    counts: dict[str, int] = {}
    for r in rows:
        weights[r["source"]] = r["weight"]
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    total_w = sum(weights.values())
    for s, w in weights.items():
        expect = EPOCH_K * w / total_w
        assert abs(counts[s] - expect) <= 2 + expect * 0.1, (s, counts[s], expect)


def test_fellegi_sunter_nondigit_names_cross_engine(spark, tmp_path):
    """Regression (round-8 review): a registry name NOT ending in a
    digit must pass through the corruption step unchanged on BOTH
    engines — ungated, Spark's cast-to-int yields NULL (silently
    nulling b_name and dropping the pair) while DuckDB's CAST
    hard-errors. The digit guard + TRY_CAST keep the engines agreeing."""
    import duckdb

    cust = spark.createDataFrame(
        [
            (1, "Customer#000000001", 0, 100.0, "BUILDING"),
            (3, "Alpha Corp", 0, 200.0, "BUILDING"),
            (6, "Beta LLC x", 0, 300.0, "MACHINERY"),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    d = str(tmp_path / "fs_nondigit")
    cust.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    got = sorted(tuple(r) for r in QUERIES["q_fellegi_sunter"](spark, d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["q_fellegi_sunter"]).fetchall())
    con.close()
    assert got == want
    # un-bumpable names survive verbatim -> their clone pairs fully agree
    assert all(r[5] == 1292 and r[6] == "match" for r in got)


def test_score_calibration_shares_linear_quality_subtree(spark, sf_dir, monkeypatch):
    """VERDICT r8 #5 promotion pin: q_score_calibration's score leg IS
    the declared q_linear_quality (called exactly once, plan subtree
    shared at the source level) — a drifting reimplementation would
    silently calibrate a different score than the one users threshold.
    The physical plan carries exactly one decile Window and attaches the
    (doc_id, bad) outcome leg by broadcast."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans import corpus_queries as cq

    calls: list[int] = []
    orig = cq.q_linear_quality
    monkeypatch.setattr(
        cq, "q_linear_quality", lambda s, d: (calls.append(1), orig(s, d))[1]
    )
    df = QUERIES["q_score_calibration"](spark, sf_dir)
    assert calls == [1], "must reuse the declared scorer, exactly once"
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # formatted mode prints each node once in the tree ("Window (28)")
    # and once in the detail section ("(28) Window") — count tree lines
    assert plan.count("Window (") == 1, "one global decile window, no more"
    assert "BroadcastHashJoin" in plan, "outcome leg must attach by broadcast"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
