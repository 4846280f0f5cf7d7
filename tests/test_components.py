"""connected_components: min-label propagation over near-dup pair lists."""

from __future__ import annotations

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
    connected_components,
    connected_components_star,
    minhash_dedup_pairs,
    near_dup_clusters,
)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.u: r.label for r in connected_components(df, **kw).collect()}


def test_two_components_and_clique(spark):
    # component {1,2,3} (clique), component {10,11}
    got = _run(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_propagation(spark):
    # a 6-vertex path: the min label must travel 5 hops
    got = _run(spark, [(5, 6), (6, 7), (7, 8), (8, 9), (9, 10)])
    assert got == {v: 5 for v in range(5, 11)}


def test_direction_invariance(spark):
    # undirected: reversed edge lists give identical clusters
    edges = [(3, 1), (2, 3), (9, 4)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 4, 9: 4}


def test_max_iter_falls_back_to_star(spark):
    # a chain longer than max_iter can't converge by label propagation;
    # the call must hand off to the star algorithm and still return
    # EXACT labels, not a partial propagation
    got = _run(spark, [(5, 6), (6, 7), (7, 8), (8, 9)], max_iter=1)
    assert got == {v: 5 for v in range(5, 10)}


@pytest.mark.parametrize("n", [0, 1])
def test_tiny_edge_lists(spark, n):
    edges = [(1, 2)][:n]
    got = _run(spark, edges)
    assert got == ({1: 1, 2: 1} if n else {})


def _run_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.u: r.label for r in connected_components_star(df, **kw).collect()}


def test_star_matches_label_propagation_on_small_graphs(spark):
    cases = [
        [(1, 2), (2, 3), (1, 3), (10, 11)],          # clique + pair
        [(5, 6), (6, 7), (7, 8), (8, 9), (9, 10)],   # path
        [(3, 1), (2, 3), (9, 4)],                    # reversed edges
        [(1, 2)],
        [],
    ]
    for edges in cases:
        assert _run_star(spark, edges) == _run(spark, edges), edges


def test_star_long_chain_logarithmic_rounds(spark):
    # an 80-node path: label propagation would need ~80 rounds; the star
    # algorithm must close it well inside its round bound and EXACTLY
    got = _run_star(spark, [(i, i + 1) for i in range(80)], max_rounds=12)
    assert got == {v: 0 for v in range(81)}


def test_star_random_graph_agrees(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_star(spark, edges) == _run(spark, edges, max_iter=60)


def test_collapsed_clusters_equal_raw_pipeline(spark, sf_dir):
    """near_dup_clusters (digest-collapse before LSH/CC) must be
    OUTPUT-IDENTICAL to running LSH + connected components on the raw
    corpus — the optimization's core claim. Covers exact-dup groups with
    and without external near-dup edges, and short-doc exclusion."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold_bp=5000)
    raw = sorted(
        (r.u, r.label)
        for r in connected_components(pairs, src="doc_a", dst="doc_b").collect()
    )
    collapsed = sorted(
        (r.doc_id, r.cluster_id)
        for r in near_dup_clusters(docs, threshold_bp=5000).collect()
    )
    assert collapsed == raw


def test_collapsed_clusters_synthetic_shapes(spark):
    """Edge cases the scale-factor corpus may not contain: an exact-dup
    group with NO external edge (grp_n fallback), an exact-dup group
    bridged to a near-dup neighbor, and short docs (no shingles) that
    must never cluster even when byte-identical."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (1, base), (2, base), (3, base),        # exact clique...
        (4, near),                              # ...bridged by near-dup
        (10, "one two three four five six"),    # isolated exact pair,
        (11, "one two three four five six"),    # no external edge
        (20, "tiny doc"), (21, "tiny doc"),     # <5 tokens: excluded
        (30, "completely different words entirely unrelated content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(docs, threshold_bp=5000).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    raw_pairs = minhash_dedup_pairs(docs, threshold_bp=5000)
    raw = {
        r.u: r.label
        for r in connected_components(raw_pairs, src="doc_a", dst="doc_b").collect()
    }
    assert raw == got


def test_containment_detects_subset_jaccard_misses(spark):
    """A doc fully contained in a much longer doc must score containment
    10000 bp while its Jaccard stays under the dedup threshold — the case
    q_shingle_containment exists for."""
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], "doc_id long, text string"
    )
    sh = D.with_shingles(docs)
    a, b = (
        {r.doc_id: set(r.shingles) for r in sh.collect()}[1],
        {r.doc_id: set(r.shingles) for r in sh.collect()}[2],
    )
    inter, union = len(a & b), len(a | b)
    assert 10000 * inter // len(a) == 10000  # fully contained
    assert 10000 * inter // union < 5000  # Jaccard-threshold dedup misses it
