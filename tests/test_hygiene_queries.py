"""Hygiene-tranche queries (plans/hygiene_queries.py, staged in round
9 as plans/staged_r10.py and promoted in round 10) vs their DuckDB
oracles — the driver's compare protocol. The oracle compare runs at
BOTH sf0.001 (the sf_dir fixture) and sf0.01 (the driver's correctness
SF) in this file. Also pins registry membership, oracle completeness,
and per-query semantic invariants."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from terraform_aws_lambda_kinesis_to_es_spark.plans.hygiene_queries import (
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


def test_registry_contract():
    """Every tranche query is oracle-backed AND declared (promoted in
    round 10 — before promotion this asserted the names stayed OUT of
    the registry)."""
    assert set(QUERIES) == set(ORACLES)
    declared = entrypoint.queries()
    declared_oracles = entrypoint.oracle_sql()
    for name in QUERIES:
        assert declared.get(name) is QUERIES[name], name
        assert declared_oracles.get(name) == ORACLES[name], name


# ------------------------------------------------------ semantic pins


def test_index_probe_delta_finds_own_edits(spark, sf_dir):
    """Every edited doc must match its OWN v1 version (the ' rev2'
    append leaves shingle overlap far above threshold on any doc with
    enough tokens), and those self-id pairs dominate the delta."""
    rows = QUERIES["q_index_probe_delta"](spark, sf_dir).collect()
    assert rows
    self_pairs = [r for r in rows if r["doc_v1"] == r["doc_v2"]]
    assert self_pairs, "edits must match their previous versions"
    assert all(r["jaccard_bp"] >= 5000 for r in rows)
    # a self-pair's similarity is near-identity on long docs
    assert max(r["jaccard_bp"] for r in self_pairs) >= 8000


def test_index_probe_delta_is_probe_plan_twin(spark, sf_dir):
    """The staged batch query must agree with the SERVING path: saving
    the v1 corpus as a persisted LSH index and probing it with the
    edited batch (under distinct probe ids) yields the same verified
    near-dup pair set — the query certifies what the index serves."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
        SD_DROP_MOD,
        SD_EDIT_MOD,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    import tempfile

    docs = load_split(spark, sf_dir, "documents")
    probe = docs.filter(
        (F.col("doc_id") % SD_EDIT_MOD == 0) & (F.col("doc_id") % SD_DROP_MOD != 0)
    ).withColumn("text", F.concat(F.col("text"), F.lit(" rev2")))
    # distinct probe id space so probe_lsh_index's id-inequality guard
    # cannot drop the (v1 doc, its own edit) pairs
    off = 10_000_000_000
    probe_off = probe.withColumn("doc_id", F.col("doc_id") + F.lit(off))

    path = tempfile.mkdtemp(prefix="probe_twin_")
    D.save_lsh_index(docs, path)
    b, s = D.load_lsh_index(spark, path)
    got = set()
    for r in D.probe_lsh_index(b, s, probe_off).collect():
        a, bb = r["doc_a"], r["doc_b"]
        # normalize to (v1 id, v2 original id); drop probe-vs-probe pairs
        lo, hi = min(a, bb), max(a, bb)
        if lo >= off:
            continue  # both endpoints are probes: not part of the delta
        got.add((lo, hi - off, r["jaccard_bp"]))
    want = {
        (r["doc_v1"], r["doc_v2"], r["jaccard_bp"])
        for r in QUERIES["q_index_probe_delta"](spark, sf_dir).collect()
    }
    assert got == want and want


def test_mg_sketch_bound_holds(spark, sf_dir):
    """The merge guarantee est <= true <= est + err_ub must hold for
    every reported item — the batch form of the streaming operator's
    Space-Saving bound."""
    rows = QUERIES["q_mg_sketch_agreement"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bound_ok"]
        assert r["est_count"] <= r["n_true"] <= r["est_count"] + r["err_ub"]


def test_token_compression_invariants(spark, sf_dir):
    """Dedup can only shrink: n_dedup <= n_docs, tokens_kept_bp <=
    10000; per-source identities reconcile."""
    rows = QUERIES["q_token_compression"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_dedup"] <= r["n_docs"]
        assert 0 <= r["dup_bp"] <= 10000
        assert 0 < r["tokens_kept_bp"] <= 10000


def test_selfrep_spans_only_repeats(spark, sf_dir, tmp_path):
    """Only docs with a genuinely repeated 5-gram emit; a planted
    looping doc reports its loop gram with the full span."""
    from pyspark.sql import functions as F  # noqa: F401

    loop = "alpha beta gamma delta epsilon " * 4
    plain = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, loop, "en", "s", len(loop)), (2, plain, "en", "s", len(plain))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "selfrep")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in QUERIES["q_selfrep_spans"](spark, d).collect()}
    assert 2 not in rows, "no repeated gram -> no row"
    assert rows[1]["n_rep"] >= 3
    assert rows[1]["span"] >= 10


def test_quality_sweep_monotone(spark, sf_dir):
    """Retention is monotone non-increasing in the cut, the 10-row
    curve covers every cut, and shares are valid bp."""
    rows = sorted(
        QUERIES["q_quality_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["cut_bp"],
    )
    assert [r["cut_bp"] for r in rows] == list(range(1000, 10001, 1000))
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs_kept"] >= b["n_docs_kept"]
        assert a["n_tokens_kept"] >= b["n_tokens_kept"]
    for r in rows:
        assert 0 <= r["docs_bp"] <= 10000 and 0 <= r["tokens_bp"] <= 10000


def test_cross_lang_dup_normalized_pairs(spark, sf_dir):
    """Pair keys are unordered (lang_lo <= lang_hi) and counts are
    positive; total pair mass equals the detector's pair count."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_cross_lang_dup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lang_lo"] <= r["lang_hi"]
        assert r["n_pairs"] > 0 and 0 < r["avg_jaccard_bp"] <= 10000
    docs = load_split(spark, sf_dir, "documents")
    n_all = D.minhash_dedup_pairs(docs, threshold_bp=5000).count()
    assert sum(r["n_pairs"] for r in rows) == n_all


def test_boilerplate_hubs_are_max_degree(spark, sf_dir):
    """The reported degrees are the true maxima of the pair graph."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

    rows = QUERIES["q_boilerplate_hubs"](spark, sf_dir).collect()
    assert rows
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=5000).collect()
    deg: dict[int, int] = {}
    for p in pairs:
        deg[p["doc_a"]] = deg.get(p["doc_a"], 0) + 1
        deg[p["doc_b"]] = deg.get(p["doc_b"], 0) + 1
    want = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [(r["doc_id"], r["degree"]) for r in rows]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_recrawl_schedule_clamps(spark, sf_dir):
    rows = QUERIES["q_recrawl_schedule"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["interval_days"] <= 365
        assert r["daily_docs"] >= 1
        # ceil identity: daily * interval covers the corpus
        assert r["daily_docs"] * r["interval_days"] >= r["n_docs"]


def test_rejection_mix_balances(spark, sf_dir):
    """The smallest source accepts everything (accept_bp = 10000); every
    accepted count is within hash noise of the target n_min; achieved
    shares sum to ~10000."""
    rows = QUERIES["q_rejection_mix"](spark, sf_dir).collect()
    assert rows
    n_min = min(r["n_docs"] for r in rows)
    for r in rows:
        assert 0 < r["accept_bp"] <= 10000
        if r["n_docs"] == n_min:
            assert r["accept_bp"] == 10000 and r["n_accepted"] == r["n_docs"]
        assert r["n_accepted"] <= r["n_docs"]
        # hash fairness: within 30% of the balanced target
        assert abs(r["n_accepted"] - n_min) <= max(10, n_min * 3 // 10)
    assert abs(sum(r["achieved_bp"] for r in rows) - 10000) <= len(rows)


def test_pii_density_cohorts(spark, sf_dir):
    """Injection is modular, so email mass ~ n_docs/7 and phone mass ~
    n_docs/11 per source (exact up to the cohort's membership)."""
    rows = QUERIES["q_pii_density"](spark, sf_dir).collect()
    assert rows
    tot = sum(r["n_docs"] for r in rows)
    assert sum(r["n_emails"] for r in rows) >= tot // 7 - len(rows)
    assert sum(r["n_phones"] for r in rows) >= tot // 11 - len(rows)
    for r in rows:
        assert r["pii_per_mb"] >= 0


def test_audio_dynamic_range_invariants(spark, sf_dir):
    rows = QUERIES["q_audio_dynamic_range"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_frames"] >= 1
        assert 0 <= r["e_floor"] <= r["e_peak"]
        assert 0 <= r["flat_bp"] <= 10000


def test_image_entropy_bounds(spark, sf_dir):
    """Entropy lives in [0, ln(16)]; a single-bucket image is exactly
    0; bucket counts are within [1, 16]."""
    import math

    rows = QUERIES["q_image_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_buckets"] <= 16
        assert -1e-9 <= r["entropy_nats"] <= math.log(16) + 1e-9
        if r["n_buckets"] == 1:
            assert r["entropy_nats"] == 0.0


def test_token_compression_empty_text_source(spark, tmp_path):
    """Degenerate source whose documents are all empty strings: zero
    bytes and zero tokens must not divide by zero on either engine
    (Spark DIV returns NULL, DuckDB // hard-errors — the guard keeps
    both on the GREATEST(.,1) path and the engines agreeing)."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "", "en", "empty", 0), (2, "", "en", "empty", 0),
         (3, "real words here now", "en", "full", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "tc_empty")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sorted(tuple(r) for r in QUERIES["q_token_compression"](spark, d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(ORACLES["q_token_compression"]).fetchall()
    )
    con.close()
    assert got == want
    empty = [r for r in got if r[0] == "empty"][0]
    assert empty[4] == 0 and empty[5] == 0  # tok_per_kb columns, no NULL/error


def test_pair_rollups_track_dup_structure(spark, tmp_path):
    """The growth-driver pin for q_cross_lang_dup / q_boilerplate_hubs'
    large 100x wall ratios (the r8 q_lsh_tuning discipline): both are
    thin rollups over the EXACT-verified near-dup pair set, so their
    cost follows the corpus's planted dup structure, not corpus^2 —
    and because verification is exact Jaccard (recall-1 banding), the
    replication arithmetic is EXACT, not approximate:

    * mutated 3x replication (bijective per-replica token relabeling:
      intra-replica Jaccard preserved, zero cross-replica shingles)
      triples the verified pair mass exactly;
    * verbatim 3x replication turns every base pair into 3x3 copies and
      adds a C(3,2) clique per nonempty-shingle doc: pair mass ==
      9*base + 3*n_nonempty exactly, and the max hub degree becomes
      3*d_max + 2 exactly."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split
    from tests.test_corpus_queries import _replicate_docs

    base_dir = "/root/testdata/sf0.001"
    m3 = _replicate_docs(spark, base_dir, tmp_path, 3, verbatim=False)
    v3 = _replicate_docs(spark, base_dir, tmp_path, 3, verbatim=True)

    def pair_mass(d):
        return sum(
            r["n_pairs"] for r in QUERIES["q_cross_lang_dup"](spark, d).collect()
        )

    base = pair_mass(base_dir)
    assert base > 0
    n_nonempty = (
        D.with_hashed_shingles(load_split(spark, base_dir, "documents"))
        .filter("size(sh_hashes) > 0")
        .count()
    )
    assert pair_mass(m3) == 3 * base
    assert pair_mass(v3) == 9 * base + 3 * n_nonempty

    def max_degree(d):
        return max(
            r["degree"] for r in QUERIES["q_boilerplate_hubs"](spark, d).collect()
        )

    assert max_degree(v3) == 3 * max_degree(base_dir) + 2
