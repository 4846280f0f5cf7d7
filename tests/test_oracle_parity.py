"""Every declared query vs its DuckDB oracle at sf0.001 — the same check
the driver runs at sf0.01. A failure here is a CORRECTNESS gate failure."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from tests.oracle_harness import compare, duck_connect

QUERIES = entrypoint.queries()
ORACLES = entrypoint.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    res = compare(df, duck, ORACLES[name])
    assert res["ok"], f"{name}: {res}"


def test_every_declared_query_has_an_oracle():
    """The rows-only class is empty by design since round 3 (q_centroid_sim
    and q_ann_ivf were both made value-checkable); this pins it — a new
    query declared without an oracle is a regression, not an option."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0
