"""Property-based tests (hypothesis) for the pure-Python codecs and the
operators whose semantics have a cheap brute-force reference."""

from __future__ import annotations

import base64
import gzip
import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from terraform_aws_lambda_kinesis_to_es_spark.functions import kpl
from terraform_aws_lambda_kinesis_to_es_spark.sources.decode import _expand_one

payloads = st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20)


@given(payloads)
@settings(max_examples=200)
def test_kpl_roundtrip_any_payloads(recs):
    assert kpl.decode_aggregate(kpl.encode_aggregate(recs)) == recs


@given(st.binary(min_size=0, max_size=100))
@settings(max_examples=200)
def test_expand_one_never_raises(blob):
    out = _expand_one(blob)
    assert isinstance(out, list)
    assert all(isinstance(s, str) for s in out)


@given(st.lists(st.text(alphabet="ab ", max_size=40), max_size=5))
@settings(max_examples=100)
def test_expand_one_gzip_roundtrip(texts):
    blob = kpl.encode_aggregate([gzip.compress(t.encode()) for t in texts])
    assert _expand_one(blob) == texts


@st.composite
def _event_stream(draw):
    n_users = draw(st.integers(1, 3))
    rows = []
    eid = 0
    for u in range(n_users):
        times = draw(st.lists(st.integers(0, 10_000), min_size=1, max_size=12, unique=True))
        for t in sorted(times):
            kind = draw(st.sampled_from(["click", "purchase"]))
            rows.append((eid, u, t, kind))
            eid += 1
    return rows


@pytest.mark.usefixtures("spark")
@given(_event_stream())
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_bruteforce(spark, rows):
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators.temporal import asof_join

    df = spark.createDataFrame(
        [(e, u, t, k) for e, u, t, k in rows], "event_id long, user_id long, t long, kind string"
    ).withColumn("ts", F.timestamp_seconds("t"))
    purchases = df.filter(F.col("kind") == "purchase").select("event_id", "user_id", "ts")
    clicks = df.filter(F.col("kind") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        r.event_id: r.asof_click_id
        for r in asof_join(
            purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
            right_cols=["click_id"],
        ).collect()
    }
    # brute force reference
    clicks_by_user: dict[int, list[tuple[int, int]]] = {}
    for e, u, t, k in rows:
        if k == "click":
            clicks_by_user.setdefault(u, []).append((t, e))
    for e, u, t, k in rows:
        if k != "purchase":
            continue
        cands = [(ct, ce) for ct, ce in clicks_by_user.get(u, []) if ct <= t]
        expect = max(cands)[1] if cands else None
        assert got[e] == expect, (e, u, t)


@pytest.mark.usefixtures("spark")
@given(st.lists(st.tuples(st.sampled_from("abc"), st.integers(0, 100)), min_size=1, max_size=60))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_salted_agg_property(spark, pairs):
    from pyspark.sql import functions as F

    from terraform_aws_lambda_kinesis_to_es_spark.operators.skew import salted_agg

    df = spark.createDataFrame(pairs, "k string, v long")
    got = {
        r.k: (r.total, r.lo)
        for r in salted_agg(df, "k", {"total": ("v", "sum"), "lo": ("v", "min")}, n_salts=4).collect()
    }
    ref: dict[str, tuple[int, int]] = {}
    for k, v in pairs:
        t, lo = ref.get(k, (0, 10**9))
        ref[k] = (t + v, min(lo, v))
    assert got == ref


@pytest.mark.usefixtures("spark")
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_property(spark, edges):
    from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
        connected_components,
    )

    # union-find reference
    parent = {v: v for e in edges for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    ref = {v: min(u for u in parent if find(u) == find(v)) for v in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.u: r.label for r in connected_components(df).collect()}
    assert got == ref


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_star_property(spark, edges):
    """The large-star/small-star path must satisfy the same union-find
    contract as label propagation on arbitrary random graphs (it is the
    long-diameter fallback, so it gets the same oracle directly)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
        connected_components_star,
    )

    parent = {v: v for e in edges for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    ref = {v: min(u for u in parent if find(u) == find(v)) for v in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.u: r.label for r in connected_components_star(df).collect()}
    assert got == ref


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200)
def test_wav_framing_decodes_exact_samples(data):
    """q_media_audio_stats framing contract: for ANY payload bytes, the
    framed WAV decodes to exactly the little-endian int16 view of the
    space-padded body (the arithmetic the DuckDB oracle re-derives)."""
    import struct

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        AUDIO_BYTES,
        AUDIO_RATE,
        _wav_header,
    )

    body = (data + b"\x20" * AUDIO_BYTES)[:AUDIO_BYTES]
    samples, rate = M.decode_audio(_wav_header(AUDIO_BYTES) + body)
    ref = struct.unpack(f"<{AUDIO_BYTES // 2}h", body)
    assert rate == AUDIO_RATE
    assert samples.shape == (AUDIO_BYTES // 2, 1)
    assert [int(s) for s in samples[:, 0]] == list(ref)


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60))
@settings(max_examples=200)
def test_cusum_window_form_equals_recursive_definition(xs):
    """q_cusum_changepoint computes the one-sided CUSUM in window form
    (S_d - min_{j<=d} S_j over scaled residuals r_d = x_d*D - T). The
    textbook definition is the recursion C_d = max(0, C_{d-1} + r_d).
    The two are the same function — this pins the identity the window
    plan relies on, over arbitrary integer series."""
    D, T = len(xs), sum(xs)
    resid = [x * D - T for x in xs]
    # window form: mn is min(0, min prefix S) — the 0 seed is S_0
    s, mn, window = 0, 0, []
    for r in resid:
        s += r
        mn = min(mn, s)
        window.append(s - mn)
    # recursive form
    c, rec = 0, []
    for r in resid:
        c = max(0, c + r)
        rec.append(c)
    assert window == rec


@given(st.integers(min_value=0, max_value=9_999))
@settings(max_examples=200)
def test_poisson_bootstrap_weight_thresholds(h):
    """The hash-Poisson inverse-CDF thresholds partition [0, 10000)
    exhaustively and monotonically (every hash value draws exactly one
    weight, and weights are ordered by threshold)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r13 import (
        _POISSON_CUM,
    )

    w = next(
        (i for i, t in enumerate(_POISSON_CUM) if h < t), len(_POISSON_CUM)
    )
    assert 0 <= w <= 4
    assert list(_POISSON_CUM) == sorted(_POISSON_CUM)


@given(
    st.integers(min_value=0, max_value=500),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=80),
)
@settings(max_examples=200)
def test_cusum_seeded_vector_fold_equals_recursion(c0, resid):
    """The streaming fold's vectorized identity with a CARRY-IN:
    C_i = T_i - min(0, min prefix T) with T = c0 + cumsum(r) must equal
    the recursion C_i = max(0, C_{i-1} + r_i) started at C_0 = c0 —
    this is what lets _cusum_fold run as three numpy passes instead of
    a per-row Python loop."""
    import numpy as np

    t = c0 + np.cumsum(np.array(resid, dtype="int64"))
    vec = t - np.minimum(np.minimum.accumulate(t), 0)
    c, rec = c0, []
    for r in resid:
        c = max(0, c + r)
        rec.append(c)
    assert vec.tolist() == rec
