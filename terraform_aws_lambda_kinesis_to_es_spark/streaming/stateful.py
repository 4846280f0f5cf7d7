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


def dedup_stream(
    df: DataFrame,
    id_col: str = "log_id",
    ts_col: str = "log_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id within the watermark horizon: upgrades the
    pipeline from at-least-once to effectively-once delivery (reference
    carries log_id for downstream dedup but never dedups — T3/P7).
    State per id is dropped once the watermark passes."""
    return df.withWatermark(ts_col, watermark).dropDuplicates([id_col])


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
