"""Validate / route / whitelist / index-name derivation.

The reference's hot path (reference main.py:96-116) re-expressed as narrow
DataFrame projections and filters, so Catalyst gets a single straight-line
plan it can push into the scan. The three mutable dicts of the reference
(log_dict / failed_dict / actions) collapse into routing *columns* on one
DataFrame: ``is_valid``, ``log_type``, ``index_date``, ``index_name``.

All transforms here are stateless and shuffle-free (pure per-row
projections) — at 100 TB this stage is map-only and scales linearly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig


def with_validation(
    df: DataFrame,
    cfg: PipelineConfig,
    *,
    type_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Add ``is_valid``: record has a log type and a parseable event time.

    Reference semantics (main.py:96-106, README.md:11-14): a record must
    carry the ``log_type`` field and a parseable ``time`` field
    (timestamp_required=True at main.py:105); everything else is routed to
    the failed branch, never silently dropped.

    ``ts_col`` may be a string column (parsed via :func:`parse_timestamp`
    upstream) or already a timestamp.
    """
    type_col = type_col or cfg.log_type_field
    ts_col = ts_col or cfg.log_timestamp_field
    return df.withColumn(
        "is_valid", F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    )


def parse_timestamp(col: Column) -> Column:
    """Permissive timestamp parse (reference README.md:14 accepts anything
    dateutil parses). Declarative ladder: ISO8601 variants first (Spark's
    ``to_timestamp`` handles fractional seconds + offsets), then common
    formats. Returns NULL when nothing matches — NULL feeds validation.
    """
    s = F.trim(col)
    return F.coalesce(
        F.try_to_timestamp(s),  # ISO-8601 / Spark default
        F.try_to_timestamp(s, F.lit("yyyy/MM/dd HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("dd/MMM/yyyy:HH:mm:ss Z")),  # CLF
        F.try_to_timestamp(s, F.lit("yyyyMMdd'T'HHmmssX")),
        F.try_to_timestamp(s, F.lit("MM/dd/yyyy HH:mm:ss")),
    )


def parse_timestamp_dateutil(col: Column) -> Column:
    """Exact dateutil-parity timestamp parse — the reference accepts ANY
    ``dateutil.parser.parse``-able string (README.md:14, python-dateutil
    pinned at lambda/requirements.txt:7), which is wider than a format
    ladder can be. Arrow-batched pandas UDF, flag-gated
    (PipelineConfig.timestamp_parser='dateutil'): the JVM-side ladder
    stays the default because a Python hop on the hot path costs real
    throughput; this path exists for raw-stream fidelity on wild formats.
    Unparseable -> NULL (feeds validation); tz-aware inputs normalize to
    naive UTC, matching the ladder's session-tz convention."""
    from datetime import timezone as _tz

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def _parse(s: pd.Series) -> pd.Series:
        from dateutil import parser as _p

        def one(x):
            if x is None or not str(x).strip():
                return None
            try:
                dt = _p.parse(str(x))
            except (ValueError, OverflowError, TypeError):
                return None
            if dt.tzinfo is not None:
                dt = dt.astimezone(_tz.utc).replace(tzinfo=None)
            return dt

        return s.map(one)

    return _parse(col)


def timestamp_parser_for(cfg: PipelineConfig):
    """The configured timestamp parser (ladder default; dateutil opt-in)."""
    if getattr(cfg, "timestamp_parser", "ladder") == "dateutil":
        return parse_timestamp_dateutil
    return parse_timestamp


def apply_whitelist(
    df: DataFrame, cfg: PipelineConfig, *, type_col: str | None = None
) -> DataFrame:
    """Silently drop records whose type is not whitelisted.

    Intended semantics (reference README.md:76, variables.tf:87-91; the
    reference's own empty-whitelist branch is dead code — SURVEY.md B2):
    empty whitelist => no-op, all types pass. Drops are silent (no
    dead-letter), matching main.py:104.
    """
    if not cfg.log_type_whitelist:
        return df
    type_col = type_col or cfg.log_type_field
    return df.filter(F.col(type_col).isin(*sorted(cfg.log_type_whitelist)))


def route_unknown(
    df: DataFrame, cfg: PipelineConfig, *, type_col: str | None = None
) -> DataFrame:
    """Assign the unknown prefix as log type where the field is missing,
    so failed records still bucket deterministically on the dead-letter
    path (reference main.py:39, README.md:9-11).
    """
    type_col = type_col or cfg.log_type_field
    return df.withColumn(
        type_col, F.coalesce(F.col(type_col), F.lit(cfg.log_type_unknown_prefix))
    )


def with_index_name(
    df: DataFrame,
    cfg: PipelineConfig,
    *,
    type_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Derive ``index_date`` (event-time, yyyyMMdd) and ``index_name``
    ``{prefix}-{log_type}-{yyyyMMdd}`` (reference main.py:112-114,
    README.md:13). This *is* the reference's daily tumbling window — a
    deterministic routing column, not a stateful window operator, so the
    streaming path stays stateless (SURVEY.md T4/T5: late data lands in an
    old index, never dropped).
    """
    type_col = type_col or cfg.log_type_field
    ts_col = ts_col or cfg.log_timestamp_field
    return df.withColumn(
        "index_date", F.date_format(F.col(ts_col), "yyyyMMdd")
    ).withColumn(
        "index_name",
        F.concat_ws("-", F.lit(cfg.index_name_prefix), F.col(type_col), F.col("index_date")),
    )


def split_valid_failed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split on ``is_valid`` into (valid, failed) — the reference's
    log_dict vs failed_dict (main.py:96-106) as two filtered views of one
    plan. Catalyst shares the scan; no materialization happens here.
    """
    return df.filter(F.col("is_valid")), df.filter(~F.col("is_valid"))


def build_es_actions(df: DataFrame, cfg: PipelineConfig, *, source_cols: list[str] | None = None) -> DataFrame:
    """Shape ES bulk actions ``{_index, _type:'_doc', _source}``
    (reference main.py:116 — the whole record is the document body;
    nothing projected away). ``_source`` is the full record serialized as
    a JSON string; implements the *intent* of main.py:109-116 (the
    reference's own loop crashes — SURVEY.md B1).
    """
    if source_cols is None:
        source_cols = [c for c in df.columns if c not in ("is_valid", "index_date", "index_name")]
    return df.select(
        F.col("index_name").alias("_index"),
        F.lit("_doc").alias("_type"),
        F.to_json(F.struct(*[F.col(c) for c in source_cols])).alias("_source"),
    )
