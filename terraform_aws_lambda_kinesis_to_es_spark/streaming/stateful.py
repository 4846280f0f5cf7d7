"""Stateful streaming extensions the reference never had (SURVEY.md T6):
watermarked dedup on the idempotency key, session windows, and a custom
stateful operator via applyInPandasWithState.

Watermark policy: the reference's routing path is stateless and accepts
late data forever (T5) — these operators are OPT-IN extensions, and each
takes an explicit watermark so state stays bounded: at 100 TB of stream,
unbounded dedup state is the classic way to OOM an executor. The
watermark bounds state retention, not correctness of the stateless path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


def dedup_stream(
    df: DataFrame,
    id_col: str = "log_id",
    ts_col: str = "log_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id within the watermark horizon: upgrades the
    pipeline from at-least-once to effectively-once delivery (reference
    carries log_id for downstream dedup but never dedups — T3/P7).
    State per id is dropped once the watermark passes.

    Must be ``dropDuplicatesWithinWatermark``, NOT plain
    ``dropDuplicates``: when the event-time column is not part of the
    dedup keys, plain dropDuplicates keeps its key state FOREVER — the
    watermark never evicts it, silently unbounding state on an unbounded
    id stream (caught by the expiry test in
    tests/test_stateful_streaming.py)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([id_col])


def sessionize_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "log_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation with the built-in session_window —
    state merges as events arrive, closes gap-seconds after the last
    event (emitted on watermark advance)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_with_static(
    stream_df: DataFrame, dim_df: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich streaming records with a dimension
    table. The static side is re-read per micro-batch (picking up slowly
    changing dims) and broadcast when small — the standard lookup-join
    shape; no streaming state involved."""
    return stream_df.join(F.broadcast(dim_df), on=key, how=how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with a time bound: right events join left
    events of the same key that occurred within [left_ts, left_ts+within].
    Both sides carry watermarks so the join state is bounded — without
    the time bound + watermarks this state grows forever (the classic
    stream-join OOM)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts}"
            f" AND r.{right_ts} <= l.{left_ts} + INTERVAL {within}"
        ),
    )


class _QuotaProcessor(StatefulProcessor):
    """Admit at most ``quota`` rows per key across the stream's lifetime.

    The training-mix admission control: cap any one source/type's
    contribution while the stream runs (the batch analogue is
    q_token_budget's per-source cap). One ValueState long per key; rows
    beyond the quota are dropped at the operator, so downstream state and
    sinks never see them. Arrow-batched: admission slicing is
    ``pdf.iloc[:take]``, never per-row Python.
    """

    def __init__(self, quota: int) -> None:
        if quota < 0:
            raise ValueError("quota must be >= 0")
        self.quota = quota

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._taken = handle.getValueState("taken", "n long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._taken.get()
        n = got[0] if got is not None else 0
        for pdf in rows:
            take = min(len(pdf), self.quota - n)
            if take > 0:
                n += take
                yield pdf.iloc[:take]
        self._taken.update((n,))

    def close(self) -> None:
        pass


def _quota_fn_factory(quota: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (taken,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            take = min(len(pdf), quota - taken)
            if take > 0:
                taken += take
                yield pdf.iloc[:take]
        state.update((taken,))

    return fn


def quota_per_key(
    df: DataFrame, key_col: str, quota: int, output_schema: str
) -> DataFrame:
    """Per-key lifetime admission quota: admit at most ``quota`` rows per
    key across the stream, dropping the excess at the operator (so
    downstream state/sinks never see it). The streaming form of the
    training-mix per-source cap (batch analogue: q_token_budget).
    One long of state per key, Arrow-batched slicing — never per-row
    Python. ``output_schema`` must name the input columns passed through
    (grouping column included)."""
    return df.groupBy(key_col).applyInPandasWithState(
        _quota_fn_factory(quota),
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quota_per_key_tws(
    df: DataFrame, key_col: str, quota: int, output_schema: str
) -> DataFrame:
    """quota_per_key on transformWithStateInPandas
    (the Spark 4 arbitrary-state API). Requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — which is also the right
    provider at scale: state lives off-heap/on-disk per executor instead
    of on the JVM heap. Also requires the ``protobuf`` Python package at
    runtime (the state-server wire protocol; the test suite skips when
    absent). ``output_schema`` is the pass-through row schema
    (transformWithState emits exactly the columns you declare)."""
    return df.groupBy(key_col).transformWithStateInPandas(
        _QuotaProcessor(quota),
        outputStructType=output_schema,
        outputMode="append",
        timeMode="none",
    )


LATEST_SCHEMA = "log_type string, log_id string, log_ts timestamp"
_LATEST_STATE = "ord string, log_id string, ts_us long"


def _latest_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming CDC compaction: keep only the LATEST record per key by
    event time (fixed-width micros+id string as the ordering key — the
    same portable tiebreak as batch q_cdc_latest/q_attribution), emit the
    current winner each micro-batch (update mode). Late/out-of-order
    arrivals lose against the stored ord and are absorbed without
    re-emitting older state. One small state row per key; per-batch work
    is a vectorized idxmax, never per-row Python."""
    best = tuple(state.get) if state.exists else None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_us = pdf["log_ts"].astype("int64") // 1000
        ords = ts_us.map("{:020d}".format) + "_" + pdf["log_id"].astype(str).str.zfill(12)
        i = ords.idxmax()
        cand = (str(ords.loc[i]), str(pdf["log_id"].loc[i]), int(ts_us.loc[i]))
        if best is None or cand[0] > best[0]:
            best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame(
            {
                "log_type": [key[0]],
                "log_id": [best[1]],
                "log_ts": [pd.Timestamp(best[2], unit="us")],
            }
        )


def latest_per_key(df: DataFrame, key_col: str = "log_type") -> DataFrame:
    """Latest-record-per-key view over a change stream (streaming twin of
    the batch ``q_cdc_latest`` compaction): update-mode
    applyInPandasWithState with O(distinct keys) state."""
    return df.groupBy(key_col).applyInPandasWithState(
        _latest_fn,
        outputStructType=LATEST_SCHEMA,
        stateStructType=_LATEST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_COUNT_SCHEMA = "log_type string, n_total long, n_batch long"
_STATE_SCHEMA = "n long"


def _running_count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: cumulative per-type record counter.
    The GroupState holds one long; each micro-batch emits the running
    total — the minimal template for arbitrary per-key streaming state
    (rate limiting, anomaly baselines, dedup bloom filters...)."""
    (prev,) = state.get if state.exists else (0,)
    n_batch = 0
    for pdf in pdfs:
        n_batch += len(pdf)
    total = prev + n_batch
    state.update((total,))
    yield pd.DataFrame(
        {"log_type": [key[0]], "n_total": [total], "n_batch": [n_batch]}
    )


def running_type_counts(df: DataFrame, type_col: str = "log_type") -> DataFrame:
    """Per-type running counts via applyInPandasWithState (Arrow-batched,
    one state row per key — state size is O(distinct types))."""
    return (
        df.groupBy(type_col)
        .applyInPandasWithState(
            _running_count_fn,
            outputStructType=RUNNING_COUNT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_SCHEMA = (
    "key string, n_obs long, cusum long, peak_cusum long, alarm boolean"
)
_CUSUM_STATE = "c long, n long, peak long"


def _cusum_fold(
    c: int,
    peak: int,
    pdfs: Iterator[pd.DataFrame],
    target: int,
    value_col: str,
    ts_col: str,
    id_col: str,
) -> tuple[int, int, int]:
    """Fold the CUSUM recursion over a micro-batch in pinned (ts, id)
    order; returns (c, peak, n_rows). Shared by the
    applyInPandasWithState form and the transformWithState port so the
    two APIs cannot drift.

    Null observations (a record missing the value field) are dropped
    from the fold rather than poisoning it: int(NaN) would kill the
    micro-batch and then crash-loop the restart on the same replayed
    record — the monitor must survive exactly the dirty input it
    monitors. Malformed rows belong to the validation/DLQ path.

    The fold is VECTORIZED via the seeded window identity — with
    carry-in c and residuals r_i, C_i = T_i - min(0, min_{j<=i} T_j)
    where T_i = c + cumsum(r)_i (the same S_0-seed identity the batch
    q_cusum_changepoint plan uses, property-pinned against the
    recursion in tests/test_properties.py) — so the per-batch cost is
    three numpy passes, never a per-row Python loop."""
    import numpy as np

    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.dropna(subset=[value_col])
    # Deterministic in-batch order: event time, then id — the same
    # pinned (ts, id) composite every ordered operator here uses.
    batch = batch.sort_values([ts_col, id_col], kind="mergesort")
    if len(batch):
        vals = batch[value_col].to_numpy()
        if not np.issubdtype(vals.dtype, np.integer):
            # The monitor is integer-only by contract (counts, bytes,
            # latencies-in-ms). to_numpy(dtype='int64') would TRUNCATE
            # fractional observations silently — round within a strict
            # tolerance instead, and fail loudly on genuinely
            # fractional input rather than fold a distorted statistic.
            rounded = np.rint(vals)
            if not np.allclose(vals, rounded, rtol=0.0, atol=1e-9):
                raise ValueError(
                    f"cusum_stream: non-integer values in '{value_col}' "
                    "(the CUSUM fold is integer-only; scale fractional "
                    "metrics to integer units upstream)"
                )
            vals = rounded
        r = vals.astype("int64") - target
        # int64 cumsum wraps silently (and consistently — a post-hoc
        # diff check cannot see it), unlike the unbounded Python
        # recursion this identity is pinned against. Sound a-priori
        # guard: |any partial sum| <= c + sum|r|; float64's ~1e-16
        # relative error is irrelevant at the 2^62 threshold.
        if c + float(np.abs(r).sum(dtype="float64")) >= 2.0**62:
            raise OverflowError(
                "cusum_stream: micro-batch residual mass risks int64 "
                "cumulative-sum wrap (scale the metric down upstream)"
            )
        t = c + np.cumsum(r)
        cus = t - np.minimum(np.minimum.accumulate(t), 0)
        c = int(cus[-1])
        peak = max(peak, int(cus.max()))
    return c, peak, len(batch)


def _cusum_out(key: tuple, n: int, c: int, peak: int, alarm_at: int) -> pd.DataFrame:
    # alarm is LATCHED on the peak, not the end-of-batch value: a
    # crossing that spikes and recedes within one micro-batch must
    # still report (an end-of-batch read would miss it entirely).
    return pd.DataFrame(
        {
            "key": [key[0]],
            "n_obs": [n],
            "cusum": [c],
            "peak_cusum": [peak],
            "alarm": [peak >= alarm_at],
        }
    )


def _cusum_fn_factory(
    target: int, alarm_at: int, value_col: str, ts_col: str, id_col: str
):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        c, n, peak = state.get if state.exists else (0, 0, 0)
        c, peak, n_batch = _cusum_fold(
            c, peak, pdfs, target, value_col, ts_col, id_col
        )
        n += n_batch
        state.update((c, n, peak))
        yield _cusum_out(key, n, c, peak, alarm_at)

    return fn


class _CusumProcessor(StatefulProcessor):
    """cusum_stream's transformWithState port (no timers; one ValueState
    of three longs per key). The fold body is the SHARED _cusum_fold —
    identical trace to the applyInPandasWithState form by construction."""

    def __init__(
        self, target: int, alarm_at: int, value_col: str, ts_col: str, id_col: str
    ) -> None:
        self.target = target
        self.alarm_at = alarm_at
        self.value_col = value_col
        self.ts_col = ts_col
        self.id_col = id_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("cusum", _CUSUM_STATE)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._st.get()
        c, n, peak = got if got is not None else (0, 0, 0)
        c, peak, n_batch = _cusum_fold(
            c, peak, rows, self.target, self.value_col, self.ts_col, self.id_col
        )
        n += n_batch
        self._st.update((c, n, peak))
        yield _cusum_out(key, n, c, peak, self.alarm_at)

    def close(self) -> None:
        pass


def cusum_stream(
    df: DataFrame,
    target: int,
    alarm_at: int,
    key_col: str = "log_type",
    value_col: str = "v",
    ts_col: str = "log_ts",
    id_col: str = "log_id",
) -> DataFrame:
    """Streaming one-sided CUSUM alarm: per key, maintain C = max(0,
    C + (x - target)) over the observation stream and flag when the
    cumulative upward drift crosses ``alarm_at`` — the on-stream twin
    of the batch ``q_cusum_changepoint`` audit (same recursion; the
    identity between the recursion and the batch window form is
    property-pinned in tests/test_properties.py). The level-shift
    monitor you run ON the pipeline (ingest volume, reject counts,
    lateness) rather than after it.

    ``alarm`` is LATCHED on ``peak_cusum`` (has the drift EVER crossed
    the threshold), so a crossing that spikes and recedes inside one
    micro-batch still reports. Null observations are dropped from the
    fold (and from n_obs) rather than poisoning the query — the
    validation/DLQ path owns malformed rows.

    ``target`` and observations must be integers (exact state, no
    float drift across checkpoints); scale milli/micro upstream.
    State is three longs per key; in-batch fold order is pinned by
    (event time, id), so replays reproduce the same trace. Update
    mode: one row per (key, micro-batch) with the running state."""
    return df.groupBy(key_col).applyInPandasWithState(
        _cusum_fn_factory(target, alarm_at, value_col, ts_col, id_col),
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream_tws(
    df: DataFrame,
    target: int,
    alarm_at: int,
    key_col: str = "log_type",
    value_col: str = "v",
    ts_col: str = "log_ts",
    id_col: str = "log_id",
) -> DataFrame:
    """cusum_stream on transformWithStateInPandas (the Spark 4
    arbitrary-state API; same RocksDB-provider and protobuf runtime
    requirements as quota_per_key_tws — the test suite skips when the
    wheel is absent). The fold body is shared with the legacy form
    (_cusum_fold), so both APIs emit the identical trace."""
    return df.groupBy(key_col).transformWithStateInPandas(
        _CusumProcessor(target, alarm_at, value_col, ts_col, id_col),
        outputStructType=CUSUM_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def clean_project(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.6,
    lang: str = "en",
) -> DataFrame:
    """The row-local half of streaming corpus cleaning — quality floor,
    language-ID filter, content digest — shared VERBATIM by the
    streaming plan (:func:`clean_stream`) and the batch declared query
    (``plans.training_queries.q_clean_stream``). Map-only: works
    identically on bounded and unbounded frames, which is the
    batch/stream parity claim the declared query's oracle proves."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        predicted_lang,
        quality_score,
        tokens,
    )

    return (
        df.withColumn("quality_score", quality_score(text_col))
        .withColumn("pred_lang", predicted_lang(tokens(F.lower(F.col(text_col)))))
        .filter((F.col("quality_score") >= min_quality) & (F.col("pred_lang") == lang))
        .withColumn("content_key", F.md5(F.col(text_col)))
    )


def clean_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "doc_ts",
    watermark: str = "1 hour",
    min_quality: float = 0.6,
    lang: str = "en",
) -> DataFrame:
    """Streaming corpus cleaning: the q_clean_corpus composition on an
    unbounded document stream. Quality floor and language-ID are the
    SAME row-local expressions as the batch plan (``clean_project`` — the
    shared DataFrame API is the point); exact dedup becomes watermarked
    dropDuplicates on the content digest, so a re-crawled duplicate in a
    later micro-batch is dropped while state stays bounded by the
    watermark horizon. Near-dup LSH stays a batch/compaction job at
    100 TB — a growing pairwise similarity graph is not bounded state.
    """
    return (
        clean_project(df, text_col, min_quality=min_quality, lang=lang)
        .withWatermark(ts_col, watermark)
        # WithinWatermark variant: plain dropDuplicates never evicts state
        # for keys that don't include the event-time column — the digest
        # state would grow with the corpus forever (see dedup_stream)
        .dropDuplicatesWithinWatermark(["content_key"])
        .drop("content_key")
    )


NEAR_DUP_SCHEMA = "doc_id long, dup_of long, hamming long, blk int"
_ND_STATE = "ids array<long>, sigs array<long>, ts_us array<long>"
_ND_BLOCKS = 4


# 16-bit popcount lookup (numpy<2 has no bitwise_count): popcount of a
# 60-bit signature = sum of the LUT over its four 16-bit halves. Built
# lazily on first _popcount64 call per worker (64 KiB) — so the cost
# lands in the first batch that actually compares signatures, not at
# import.
_POPCOUNT16 = None


def _popcount64(arr):
    """Vectorized popcount over a nonnegative int64 numpy array."""
    import numpy as np

    global _POPCOUNT16
    if _POPCOUNT16 is None:
        _POPCOUNT16 = np.array(
            [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
        )
    lut = _POPCOUNT16
    return (
        lut[arr & 0xFFFF].astype(np.int64)
        + lut[(arr >> 16) & 0xFFFF]
        + lut[(arr >> 32) & 0xFFFF]
        + lut[(arr >> 48) & 0xFFFF]
    )


def _block_matches(prev_ids, prev_sigs, pdf: pd.DataFrame, max_distance: int):
    """One micro-batch of bucket arrivals against the occupancy prefix:
    sorts the batch (event time, id), XORs each arrival against state
    entries plus EARLIER same-batch arrivals as one numpy op with LUT
    popcount, and returns (out_doc, out_dup, out_ham, all_ids, all_sigs,
    new_ts). Shared by the applyInPandasWithState and
    transformWithStateInPandas implementations — the vectorized hot loop
    lives in exactly one place."""
    import numpy as np

    pdf = pdf.sort_values(["doc_ts", "doc_id"])
    b_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    b_sigs = pdf["simhash"].to_numpy(dtype=np.int64)
    b_tss = pdf["doc_ts"].astype("int64").to_numpy() // 1000
    all_ids = np.concatenate([prev_ids, b_ids])
    all_sigs = np.concatenate([prev_sigs, b_sigs])
    n_state = len(prev_ids)
    out_doc: list = []
    out_dup: list = []
    out_ham: list = []
    nb = len(b_ids)
    if nb and n_state + nb > 1:
        # ONE matrix op per (bucket, batch): rows = arrivals, cols = the
        # full occupancy (state + batch); the triangular mask keeps only
        # earlier-arrival columns per row, preserving the sequential
        # compare-against-prefix semantics without a per-arrival loop
        ham = _popcount64(b_sigs[:, None] ^ all_sigs[None, :])
        col = np.arange(n_state + nb)[None, :]
        row = np.arange(nb)[:, None]
        hit = (
            (ham <= max_distance)
            & (col < n_state + row)
            & (all_ids[None, :] != b_ids[:, None])
        )
        ri, ci = np.nonzero(hit)
        out_doc = [int(x) for x in b_ids[ri]]
        out_dup = [int(x) for x in all_ids[ci]]
        out_ham = [int(x) for x in ham[ri, ci]]
    return out_doc, out_dup, out_ham, all_ids, all_sigs, [int(t) for t in b_tss]


def _near_dup_fn_factory(max_distance: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per simhash-block bucket: match each arriving signature against
        the signatures seen in this bucket within the watermark horizon,
        emit (doc, earlier dup, exact hamming) for hits, append the
        arrival to state. Eviction: entries whose event time has fallen
        behind the current watermark are dropped on every invocation, and
        a bucket idle past the watermark times out and removes itself —
        state per bucket is bounded by the horizon's arrival rate, never
        the corpus.

        The in-bucket compare is VECTORIZED (VERDICT r5 #5): each arrival
        XORs against the whole occupancy prefix (state + earlier same-
        batch arrivals) as one numpy op with LUT popcount, replacing the
        per-entry Python loop — one O(occupancy) array pass per arrival
        instead of per-entry interpreter dispatch."""
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        ids, sigs, tss = (
            (list(x) for x in state.get) if state.exists else ([], [], [])
        )
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0 and tss:
            kept = [i for i, t in enumerate(tss) if t >= wm_us]
            ids = [ids[i] for i in kept]
            sigs = [sigs[i] for i in kept]
            tss = [tss[i] for i in kept]
        out_doc: list = []
        out_dup: list = []
        out_ham: list = []
        blk = int(key[0].split(":", 1)[0])
        ids_arr = np.asarray(ids, dtype=np.int64)
        sigs_arr = np.asarray(sigs, dtype=np.int64)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            d, u, h, ids_arr, sigs_arr, b_ts = _block_matches(
                ids_arr, sigs_arr, pdf, max_distance
            )
            out_doc.extend(d)
            out_dup.extend(u)
            out_ham.extend(h)
            tss.extend(b_ts)
        if tss:
            state.update(
                ([int(x) for x in ids_arr], [int(x) for x in sigs_arr], tss)
            )
            # re-arm eviction: time out once the watermark passes the
            # newest entry (clamped above the current watermark — setting
            # a timeout at/behind it is an error for late-data buckets)
            state.setTimeoutTimestamp(max(max(tss) // 1000, wm_us // 1000) + 1)
        elif state.exists:
            state.remove()  # everything evicted and nothing new arrived
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "dup_of": out_dup,
                    "hamming": out_ham,
                    "blk": [blk] * len(out_doc),
                }
            )

    return fn


# Per-batch / per-record cost defaults fitted to the round-6 trigger
# sweep (PERF.md "streaming near-dup": 100 k docs, 20 files, local[32]
# — the model batches*c + records*r reproduces the measured 43.7 s /
# 26.0 s / 19.9 s wall at 2/4/8-file triggers within 3%). Both are
# HOST- and state-size-dependent: recalibrate from any two bench runs
# at different cadences (two equations, two unknowns).
TRIGGER_BATCH_OVERHEAD_S = 3.4
TRIGGER_PER_RECORD_S = 97e-6


def suggest_files_per_trigger(
    records_per_file: float,
    per_batch_overhead_s: float = TRIGGER_BATCH_OVERHEAD_S,
    per_record_s: float = TRIGGER_PER_RECORD_S,
    max_overhead_fraction: float = 0.5,
) -> int:
    """Trigger-cadence sizing for the stateful streaming operators
    (VERDICT r6 #7): pick ``maxFilesPerTrigger`` so per-micro-batch
    stateful overhead — state get/update roundtrips plus the
    EventTimeTimeout state scan, costs paid once per BATCH regardless of
    batch size — stays at most ``max_overhead_fraction`` of batch wall.

    The round-6 decomposition (PERF.md) showed this overhead, not the
    signature compare, is the throughput lever: the same corpus moved
    2,286 -> 5,016 rec/s purely by going from 2- to 8-file triggers.
    Model: batch wall ~= c + n*r (c = per-batch overhead, r = marginal
    per-record cost); overhead fraction c/(c + n*r) <= e solves to
    n >= c*(1-e)/(e*r). With the fitted defaults and the bench's 5,000
    records/file this returns 8 — the measured-best cadence.

    Latency tradeoff is the caller's: bigger triggers = higher
    throughput AND higher result latency; cap the return value by the
    latency budget (records arriving per budget window / records per
    file) when freshness matters more than efficiency."""
    if not 0 < max_overhead_fraction < 1:
        raise ValueError("max_overhead_fraction must be in (0, 1)")
    if records_per_file <= 0 or per_record_s <= 0 or per_batch_overhead_s < 0:
        raise ValueError("sizes and costs must be positive")
    import math

    e = max_overhead_fraction
    min_records = per_batch_overhead_s * (1 - e) / (e * per_record_s)
    return max(1, math.ceil(min_records / records_per_file))


def near_dup_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "doc_ts",
    watermark: str = "1 hour",
    max_distance: int = 3,
) -> DataFrame:
    """STREAMING near-duplicate detection within a bounded horizon — the
    missing middle between per-batch dedup and the batch LSH compaction
    job (clean_stream's note stands: an unbounded pairwise similarity
    graph is not streaming state; a WATERMARKED one is). Each document's
    60-bit SimHash (row-local, operators.dedup.with_simhash) is banded
    into 4 x 15-bit blocks (pigeonhole: hamming <= 3 guarantees an
    identical block, so recall at the threshold is exact within the
    horizon); each block value keys a stateful bucket holding the
    signatures seen within the watermark horizon. Arrivals emit
    (doc_id, dup_of, hamming, blk) for every horizon-mate within
    max_distance — a pair matching in k blocks appears k times, labeled
    by blk; consumers dedup on (doc_id, dup_of) or route to a kill list.

    Scale posture: state per bucket is bounded by the horizon x the
    bucket's arrival rate (watermark eviction on every invocation +
    event-time timeout removes idle buckets); the per-arrival compare is
    bounded by bucket occupancy, never the corpus. The batch twin with a
    full-corpus view is q_simhash_pairs."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    block_bits = D.SIMHASH_BITS // _ND_BLOCKS
    mask = (1 << block_bits) - 1
    sim = D.with_simhash(df, text_col)
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), j * block_bits).bitwiseAND(F.lit(mask))
            for j in range(_ND_BLOCKS)
        ]
    )
    keyed = (
        sim.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col).alias("doc_id"),
            "simhash",
            F.col(ts_col).alias("doc_ts"),
            F.posexplode(blocks).alias("blk", "bval"),
        )
        .withColumn("bkey", F.concat_ws(":", "blk", "bval"))
    )
    return keyed.groupBy("bkey").applyInPandasWithState(
        _near_dup_fn_factory(max_distance),
        outputStructType=NEAR_DUP_SCHEMA,
        stateStructType=_ND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class _LatestProcessor(StatefulProcessor):
    """latest_per_key on the Spark 4 arbitrary-state API
    (transformWithStateInPandas): one ValueState row per key holding the
    (ord, log_id, ts_us) winner, identical ordering/tiebreak semantics to
    the applyInPandasWithState form (_latest_fn — fixed-width micros+id
    ordering string). Emits the current winner each micro-batch in
    update mode; late arrivals lose against the stored ord."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._best = handle.getValueState("best", _LATEST_STATE)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._best.get()
        best = tuple(got) if got is not None else None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_us = pdf["log_ts"].astype("int64") // 1000
            ords = (
                ts_us.map("{:020d}".format)
                + "_"
                + pdf["log_id"].astype(str).str.zfill(12)
            )
            i = ords.idxmax()
            cand = (str(ords.loc[i]), str(pdf["log_id"].loc[i]), int(ts_us.loc[i]))
            if best is None or cand[0] > best[0]:
                best = cand
        if best is not None:
            self._best.update(best)
            yield pd.DataFrame(
                {
                    "log_type": [key[0]],
                    "log_id": [best[1]],
                    "log_ts": [pd.Timestamp(best[2], unit="us")],
                }
            )

    def close(self) -> None:
        pass


def latest_per_key_tws(df: DataFrame, key_col: str = "log_type") -> DataFrame:
    """latest_per_key on transformWithStateInPandas (VERDICT r5 #7).
    Same RocksDB-provider/protobuf requirements as quota_per_key_tws;
    state and output contracts identical to the legacy-API form (the
    e2e tests run parameterized over both)."""
    return df.groupBy(key_col).transformWithStateInPandas(
        _LatestProcessor(),
        outputStructType=LATEST_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


class _NearDupProcessor(StatefulProcessor):
    """near_dup_stream's per-bucket matcher on transformWithStateInPandas
    (VERDICT r5 #7): a ListState of (id, sig, ts_us) entries per simhash
    block bucket, the SAME vectorized prefix compare (_block_matches) as
    the legacy-API form, watermark eviction on every invocation, and an
    event-time timer that removes idle buckets once the watermark passes
    their newest entry."""

    def __init__(self, max_distance: int) -> None:
        self._max_distance = max_distance

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._entries = handle.getListState(
            "entries", "id long, sig long, ts_us long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        ids: list = []
        sigs: list = []
        tss: list = []
        if self._entries.exists():
            for row in self._entries.get():
                ids.append(row[0])
                sigs.append(row[1])
                tss.append(row[2])
        wm_us = timer_values.getCurrentWatermarkInMs() * 1000
        if wm_us > 0 and tss:
            kept = [i for i, t in enumerate(tss) if t >= wm_us]
            ids = [ids[i] for i in kept]
            sigs = [sigs[i] for i in kept]
            tss = [tss[i] for i in kept]
        out_doc: list = []
        out_dup: list = []
        out_ham: list = []
        blk = int(key[0].split(":", 1)[0])
        ids_arr = np.asarray(ids, dtype=np.int64)
        sigs_arr = np.asarray(sigs, dtype=np.int64)
        for pdf in rows:
            if len(pdf) == 0:
                continue
            d, u, h, ids_arr, sigs_arr, b_ts = _block_matches(
                ids_arr, sigs_arr, pdf, self._max_distance
            )
            out_doc.extend(d)
            out_dup.extend(u)
            out_ham.extend(h)
            tss.extend(b_ts)
        if tss:
            self._entries.put(
                [
                    (int(i), int(s), int(t))
                    for i, s, t in zip(ids_arr, sigs_arr, tss)
                ]
            )
            # re-arm the idle-bucket timer: expire once the watermark
            # passes the newest retained entry (clamped above the current
            # watermark for late-data buckets); drop the previous timer so
            # exactly one is pending per bucket
            for t_ms in list(self._handle.listTimers()):
                self._handle.deleteTimer(t_ms)
            self._handle.registerTimer(max(max(tss) // 1000, wm_us // 1000) + 1)
        elif self._entries.exists():
            self._entries.clear()
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "dup_of": out_dup,
                    "hamming": out_ham,
                    "blk": [blk] * len(out_doc),
                }
            )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo=None
    ) -> Iterator[pd.DataFrame]:
        # parameter names MUST be the base class's camelCase: the
        # framework invokes this callback with KEYWORD arguments
        # (stateful_processor_util._handle_expired_timers calls
        # handleExpiredTimer(key=..., timerValues=...,
        # expiredTimerInfo=...)), so snake_case names raise TypeError
        # at the first expiry and kill the query.
        # idle past the horizon: every retained entry is behind the
        # watermark by construction of the timer timestamp — drop the
        # bucket's state entirely
        self._entries.clear()
        return iter(())

    def close(self) -> None:
        pass


def near_dup_stream_tws(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "doc_ts",
    watermark: str = "1 hour",
    max_distance: int = 3,
) -> DataFrame:
    """near_dup_stream on transformWithStateInPandas (VERDICT r5 #7):
    identical banding, matching and eviction semantics to the legacy-API
    form — the block fan-out/keying is shared code, the vectorized
    compare is _block_matches in both — with per-bucket ListState and
    event-time timers instead of GroupState timeouts. Same RocksDB
    provider/protobuf requirements as the other _tws variants."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D

    block_bits = D.SIMHASH_BITS // _ND_BLOCKS
    mask = (1 << block_bits) - 1
    sim = D.with_simhash(df, text_col)
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), j * block_bits).bitwiseAND(F.lit(mask))
            for j in range(_ND_BLOCKS)
        ]
    )
    keyed = (
        sim.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col).alias("doc_id"),
            "simhash",
            F.col(ts_col).alias("doc_ts"),
            F.posexplode(blocks).alias("blk", "bval"),
        )
        .withColumn("bkey", F.concat_ws(":", "blk", "bval"))
    )
    return keyed.groupBy("bkey").transformWithStateInPandas(
        _NearDupProcessor(max_distance),
        outputStructType=NEAR_DUP_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (Space-Saving / Misra-Gries) — round 8
# ---------------------------------------------------------------------------

HH_SCHEMA = (
    "grp string, item string, est_count long, max_err long, version long"
)
_HH_STATE = "items array<string>, counts array<long>, errs array<long>, version long"


def _batch_item_counts(pdfs: Iterator[pd.DataFrame]) -> dict[str, int]:
    """Exact per-batch item counts (vectorized value_counts per Arrow
    chunk, merged) — shared by both API forms of the heavy hitter.

    Null items are DELIBERATELY counted under the sentinel ``"<null>"``
    (value_counts would silently drop them): a null-heavy stream is
    itself a signal worth surfacing as a heavy hitter, and N in the
    est <= true + N/cap bound stays the full row count — consistent
    with anomaly_stream, which counts every row (ADVICE r8)."""
    batch: dict[str, int] = {}
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        for it, c in pdf["item"].fillna("<null>").value_counts().items():
            batch[it] = batch.get(it, 0) + int(c)
    return batch


def _space_saving_merge(
    table: dict[str, list[int]], batch: dict[str, int], cap: int
) -> None:
    """Merge a batch's exact counts into a Space-Saving table (Metwally
    et al., ICDT 2005) of at most ``cap`` items, in place. A new item
    beyond capacity takes over the MINIMUM counter: est = min + batch
    count, err = min — giving the classic guarantees (est overcounts by
    at most err <= N/cap; every item with true count > N/cap is in the
    table). Batch items merge in sorted order and eviction picks the
    (count, item)-minimal entry, so the table is deterministic for a
    given batch sequence. Shared by the legacy and TWS operator forms."""
    for it in sorted(batch):
        c = batch[it]
        if it in table:
            table[it][0] += c
        elif len(table) < cap:
            table[it] = [c, 0]
        else:
            evict_it, (evict_c, _e) = min(
                table.items(), key=lambda kv: (kv[1][0], kv[0])
            )
            del table[evict_it]
            table[it] = [evict_c + c, evict_c]


def _space_saving_emit(
    key: tuple, table: dict[str, list[int]], topn: int, version: int
) -> Iterator[pd.DataFrame]:
    top = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))[:topn]
    if top:
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(top),
                "item": [t[0] for t in top],
                "est_count": [t[1][0] for t in top],
                "max_err": [t[1][1] for t in top],
                "version": [version] * len(top),
            }
        )


def _space_saving_fn_factory(cap: int, topn: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Space-Saving table per group key (see _space_saving_merge for
        the algorithm + guarantees). Emits the top-``topn`` per batch
        tagged with a monotonically increasing version — consumers (and
        the test) read the max-version emission as 'current'."""
        if state.exists:
            items, counts, errs, version = state.get
            table: dict[str, list[int]] = {
                it: [int(c), int(e)] for it, c, e in zip(items, counts, errs)
            }
            version = int(version)
        else:
            table, version = {}, 0
        _space_saving_merge(table, _batch_item_counts(pdfs), cap)
        version += 1
        its = sorted(table)
        state.update(
            (
                its,
                [table[i][0] for i in its],
                [table[i][1] for i in its],
                version,
            )
        )
        yield from _space_saving_emit(key, table, topn, version)

    return fn


def heavy_hitters_stream(
    df: DataFrame,
    group_col: str = "log_type",
    item_col: str = "log_id",
    cap: int = 8,
    topn: int = 5,
) -> DataFrame:
    """STREAMING heavy hitters: per ``group_col``, track the top items by
    frequency with a bounded Space-Saving counter table (``cap``
    entries) — the streaming sibling of the declared CMS q_heavy_hitters
    with the complementary guarantee (CMS answers point queries,
    Space-Saving maintains the top-k list itself). Emits the current
    top-``topn`` per group per micro-batch, versioned; est_count
    overcounts the true count by at most max_err <= N_group/cap, and any
    item with true count above that bound is guaranteed present.

    Scale posture: state is ``cap`` (item, count, err) triples per
    group — CONSTANT in the stream length; the per-batch merge is one
    pandas value_counts + a dict merge over at most cap + distinct-batch
    items. At 100 TB/day the same operator runs per shard and the
    per-shard tables MERGE (Space-Saving tables are mergeable) in a
    batch rollup — the lambda-architecture shape."""
    keyed = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(item_col).cast("string").alias("item"),
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _space_saving_fn_factory(cap, topn),
        outputStructType=HH_SCHEMA,
        stateStructType=_HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming rolling-window anomaly detection — round 8
# ---------------------------------------------------------------------------

ANOM_SCHEMA = (
    "grp string, batch_n long, hist_len long, hist_sum long, spike boolean,"
    " version long"
)
_ANOM_STATE = "hist array<long>, version long"


def _anomaly_judge(
    hist: list[int], x: int, z_threshold: int, min_hist: int
) -> tuple[int, int, bool]:
    """(hist_len, hist_sum, spike) for batch count ``x`` against the
    trailing history. The z-test is the EXACT integer inequality
    (len*x - s)^2 > T^2 * (len*ss - s^2) (both sides integers — the
    q_anomaly_days rule in streaming form), so the flag is
    bit-deterministic; no flag until ``min_hist`` batches of history
    exist, and a zero-variance history flags on ANY deviation. Shared
    by the legacy and TWS operator forms."""
    n = len(hist)
    s = sum(hist)
    ss = sum(h * h for h in hist)
    spike = False
    if n >= min_hist:
        lhs = (n * x - s) ** 2
        rhs = z_threshold * z_threshold * (n * ss - s * s)
        spike = lhs > rhs if rhs > 0 else x * n != s
    return n, s, spike


def _anomaly_fn_factory(window: int, z_threshold: int, min_hist: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per key: keep the last ``window`` per-batch row counts and
        flag a batch whose count sits more than ``z_threshold`` trailing
        standard deviations from the trailing mean (see _anomaly_judge
        for the exact integer rule)."""
        if state.exists:
            hist, version = state.get
            hist = [int(h) for h in hist]
            version = int(version)
        else:
            hist, version = [], 0
        x = 0
        for pdf in pdfs:
            x += len(pdf)
        n, s, spike = _anomaly_judge(hist, x, z_threshold, min_hist)
        version += 1
        hist = (hist + [x])[-window:]
        state.update((hist, version))
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "batch_n": [x],
                "hist_len": [n],
                "hist_sum": [s],
                "spike": [spike],
                "version": [version],
            }
        )

    return fn


def anomaly_stream(
    df: DataFrame,
    key_col: str = "log_type",
    window: int = 8,
    z_threshold: int = 3,
    min_hist: int = 3,
) -> DataFrame:
    """STREAMING volume-anomaly detection: per key, each micro-batch's
    row count is z-scored against the trailing ``window`` batch counts
    with EXACT integer arithmetic (the streaming sibling of the declared
    q_anomaly_days daily z-score). Emits one row per key per batch with
    the count, the history it was judged against, and the spike flag.

    BOUNDARY — absence is invisible: applyInPandasWithState only
    invokes keys PRESENT in the micro-batch, so the trailing window is
    over the batches the key appeared in (a gap batch contributes no
    zero sample) and a key going fully silent emits nothing — this
    operator detects volume SPIKES among active keys, not silence.
    Silence/liveness detection needs a timer-driven operator — pair
    with :func:`silence_stream` (ProcessingTimeTimeout timers firing
    without input), or drive this operator from a key-complete input
    (per-batch counts unioned with the monitored key universe) when
    zero-count gap batches must enter the trailing window.

    Scale posture: state is at most ``window`` longs per key — constant;
    the judgment is O(window) integer ops per key per batch. Keys are
    the shuffle partitioning, so a million monitored keys spread across
    executors; the trailing window lives with the key, never globally."""
    keyed = df.select(F.col(key_col).cast("string").alias("grp"))
    return keyed.groupBy("grp").applyInPandasWithState(
        _anomaly_fn_factory(window, z_threshold, min_hist),
        outputStructType=ANOM_SCHEMA,
        stateStructType=_ANOM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming silence / liveness detection — round 8
# ---------------------------------------------------------------------------

SILENCE_SCHEMA = "grp string, n_seen long, silent boolean"
_SIL_STATE = "n_seen long"


def _silence_fn_factory(silence_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per key: every arrival re-arms a processing-time timer; if the
        key then sends NOTHING for ``silence_ms``, the timer fires at the
        next micro-batch boundary and emits one silent=true row (then
        drops the state, so a returning key starts a fresh liveness
        cycle and re-silencing re-alerts). This is the timer-driven
        complement to anomaly_stream, whose per-key state is only ever
        invoked for keys PRESENT in a batch."""
        if state.hasTimedOut:
            got = state.get if state.exists else (0,)
            state.remove()
            yield pd.DataFrame(
                {
                    "grp": [key[0]],
                    "n_seen": [int(got[0])],
                    "silent": [True],
                }
            )
            return
        n = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(silence_ms)
        yield pd.DataFrame({"grp": [key[0]], "n_seen": [n], "silent": [False]})

    return fn


def silence_stream(
    df: DataFrame, key_col: str = "log_type", silence_ms: int = 60_000
) -> DataFrame:
    """STREAMING liveness monitor: emits (key, n_seen, silent=false) on
    every batch a key appears in, and ONE (key, n_seen, silent=true) row
    when a previously-seen key has sent nothing for ``silence_ms`` of
    processing time — the dead-producer alert that per-key volume
    operators (anomaly_stream) structurally cannot raise, because their
    state is only invoked for keys present in the batch. Timer-driven:
    GroupStateTimeout.ProcessingTimeTimeout invokes the function with
    hasTimedOut for expired keys even when no input arrives for them.

    Scale posture: one long of state per key plus its timer; silent
    keys clean their state up on firing, so the state store tracks the
    LIVE key population, not the historical one. Timers fire at
    micro-batch boundaries — detection latency is silence_ms plus one
    trigger interval, the standard structured-streaming contract. An
    availableNow drain runs a final timer pass at end-of-input, so a
    drained stream marks its (expired) keys silent — the correct
    reading of end-of-input, pinned in the e2e test."""
    keyed = df.select(F.col(key_col).cast("string").alias("grp"))
    return keyed.groupBy("grp").applyInPandasWithState(
        _silence_fn_factory(silence_ms),
        outputStructType=SILENCE_SCHEMA,
        stateStructType=_SIL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas ports of the round-8 analytics operators.
# Same contracts as the legacy-API forms (the merge/judge hot logic is
# the SAME shared functions — _space_saving_merge/_space_saving_emit,
# _anomaly_judge); same RocksDB-provider + protobuf requirements as the
# other _tws variants (tests skip when the wheel is absent, with the
# legacy path as the verified default — see the verify skill notes).
# ---------------------------------------------------------------------------


class _HeavyHittersProcessor(StatefulProcessor):
    """heavy_hitters_stream on transformWithStateInPandas: the
    Space-Saving table rides in a ListState of (item, count, err) rows
    plus a ValueState version counter."""

    def __init__(self, cap: int, topn: int) -> None:
        self._cap = cap
        self._topn = topn

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._table = handle.getListState(
            "table", "item string, count long, err long"
        )
        self._version = handle.getValueState("version", "v long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        table: dict[str, list[int]] = {}
        if self._table.exists():
            for row in self._table.get():
                table[row[0]] = [int(row[1]), int(row[2])]
        got = self._version.get()
        version = int(got[0]) if got is not None else 0
        _space_saving_merge(table, _batch_item_counts(rows), self._cap)
        version += 1
        self._table.put(
            [(it, table[it][0], table[it][1]) for it in sorted(table)]
        )
        self._version.update((version,))
        yield from _space_saving_emit(key, table, self._topn, version)

    def close(self) -> None:
        pass


def heavy_hitters_stream_tws(
    df: DataFrame,
    group_col: str = "log_type",
    item_col: str = "log_id",
    cap: int = 8,
    topn: int = 5,
) -> DataFrame:
    """heavy_hitters_stream on the Spark 4 arbitrary-state API —
    contract identical to the legacy form (shared merge/emit logic)."""
    keyed = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(item_col).cast("string").alias("item"),
    )
    return keyed.groupBy("grp").transformWithStateInPandas(
        _HeavyHittersProcessor(cap, topn),
        outputStructType=HH_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


class _AnomalyProcessor(StatefulProcessor):
    """anomaly_stream on transformWithStateInPandas: the trailing batch
    counts ride in a ListState (insertion-ordered, trimmed to the
    window on rewrite) plus a ValueState version counter."""

    def __init__(self, window: int, z_threshold: int, min_hist: int) -> None:
        self._window = window
        self._z = z_threshold
        self._min_hist = min_hist

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._hist = handle.getListState("hist", "n long")
        self._version = handle.getValueState("version", "v long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        hist = (
            [int(r[0]) for r in self._hist.get()] if self._hist.exists() else []
        )
        got = self._version.get()
        version = int(got[0]) if got is not None else 0
        x = 0
        for pdf in rows:
            x += len(pdf)
        n, s, spike = _anomaly_judge(hist, x, self._z, self._min_hist)
        version += 1
        self._hist.put([(h,) for h in (hist + [x])[-self._window:]])
        self._version.update((version,))
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "batch_n": [x],
                "hist_len": [n],
                "hist_sum": [s],
                "spike": [spike],
                "version": [version],
            }
        )

    def close(self) -> None:
        pass


def anomaly_stream_tws(
    df: DataFrame,
    key_col: str = "log_type",
    window: int = 8,
    z_threshold: int = 3,
    min_hist: int = 3,
) -> DataFrame:
    """anomaly_stream on the Spark 4 arbitrary-state API — contract
    identical to the legacy form (shared exact-integer judge); the same
    absence-blindness boundary applies (see anomaly_stream)."""
    keyed = df.select(F.col(key_col).cast("string").alias("grp"))
    return keyed.groupBy("grp").transformWithStateInPandas(
        _AnomalyProcessor(window, z_threshold, min_hist),
        outputStructType=ANOM_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


class _SilenceProcessor(StatefulProcessor):
    """silence_stream on transformWithStateInPandas: a ValueState seen
    counter plus a processing-time timer re-armed on every arrival;
    the timer firing without input is the silence alert."""

    def __init__(self, silence_ms: int) -> None:
        self._silence_ms = silence_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._seen = handle.getValueState("seen", "n long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._seen.get()
        n = int(got[0]) if got is not None else 0
        for pdf in rows:
            n += len(pdf)
        self._seen.update((n,))
        for t_ms in list(self._handle.listTimers()):
            self._handle.deleteTimer(t_ms)
        self._handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + self._silence_ms
        )
        yield pd.DataFrame({"grp": [key[0]], "n_seen": [n], "silent": [False]})

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo=None
    ) -> Iterator[pd.DataFrame]:
        # camelCase names required — the framework calls this with
        # keyword arguments (see _NearDupProcessor.handleExpiredTimer)
        got = self._seen.get()
        n = int(got[0]) if got is not None else 0
        self._seen.clear()
        yield pd.DataFrame({"grp": [key[0]], "n_seen": [n], "silent": [True]})

    def close(self) -> None:
        pass


def silence_stream_tws(
    df: DataFrame, key_col: str = "log_type", silence_ms: int = 60_000
) -> DataFrame:
    """silence_stream on the Spark 4 arbitrary-state API — contract
    identical to the legacy form (one alert per silent key, state
    dropped on firing)."""
    keyed = df.select(F.col(key_col).cast("string").alias("grp"))
    return keyed.groupBy("grp").transformWithStateInPandas(
        _SilenceProcessor(silence_ms),
        outputStructType=SILENCE_SCHEMA,
        outputMode="update",
        timeMode="processingTime",
    )
