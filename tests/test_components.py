"""connected_components: min-label propagation over near-dup pair lists."""

from __future__ import annotations

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import connected_components


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


def test_max_iter_caps_rounds(spark):
    # with max_iter=1 a long chain must NOT fully converge (labels are
    # still a valid partial propagation — monotone non-increasing)
    got = _run(spark, [(5, 6), (6, 7), (7, 8), (8, 9)], max_iter=1)
    assert got[9] > 5
    assert all(lbl <= v for v, lbl in got.items())


@pytest.mark.parametrize("n", [0, 1])
def test_tiny_edge_lists(spark, n):
    edges = [(1, 2)][:n]
    got = _run(spark, edges)
    assert got == ({1: 1, 2: 1} if n else {})
