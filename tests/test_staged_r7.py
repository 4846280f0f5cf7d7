"""Staged round-7 queries vs their DuckDB oracles — the driver's compare
protocol applied BEFORE declaration (plans/staged_r7.py stays out of the
declared registry until the round-7 head opens; see its module docstring).
Also pins the staging contract itself: no staged name collides with a
declared one, and every staged query has an oracle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r7 import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)
from tests.oracle_harness import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_ORACLES))
def test_staged_query_matches_oracle(name, spark, sf_dir, duck):
    df = STAGED_QUERIES[name](spark, sf_dir)
    res = compare(df, duck, STAGED_ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_staging_contract():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    assert not set(STAGED_QUERIES) & set(entrypoint.queries())


def test_heavy_hitters_overestimates_only(spark, sf_dir):
    """CMS estimates can only overcount (collisions add, never subtract)."""
    rows = STAGED_QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    assert rows, "expected a non-empty heavy-hitter report"
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_hybrid_rrf_pool_shape(spark, sf_dir):
    """Each leg contributes exactly RRF_POOL ranks (corpus >> pool at all
    fixture SFs) and rrf is maximal when both legs rank a doc first."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r7 import (
        RRF_K,
        RRF_POOL,
    )

    rows = STAGED_QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    lex = [r for r in rows if r["lex_rank"] is not None]
    vec = [r for r in rows if r["vec_rank"] is not None]
    assert len(lex) == RRF_POOL and len(vec) == RRF_POOL
    assert sorted(r["lex_rank"] for r in lex) == list(range(1, RRF_POOL + 1))
    assert sorted(r["vec_rank"] for r in vec) == list(range(1, RRF_POOL + 1))
    top = max(rows, key=lambda r: r["rrf"])
    assert top["rrf"] <= round(2.0 / (RRF_K + 1), 6)


def _plan_of(spark, sf_dir, name: str) -> str:
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    df = STAGED_QUERIES[name](spark, sf_dir)
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
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r7 import (
        SNM_THRESHOLD_BP,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    from pyspark.sql import functions as F

    got = {
        (r["doc_a"], r["doc_b"])
        for r in STAGED_QUERIES["q_sorted_neighborhood"](spark, sf_dir).collect()
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
