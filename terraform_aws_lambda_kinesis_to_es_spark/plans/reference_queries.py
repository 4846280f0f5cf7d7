"""Reference-parity query surface (SURVEY.md §7.3, stable names).

The ``events`` table is the batch stand-in for the Kinesis stream
(event_type ~ log_type, ts ~ time, event_id ~ log_id, props ~ opaque JSON
body). Each query is the batch-mode expression of one stage of the
reference pipeline (reference lambda/main.py:89-172), with a DuckDB oracle.

Scale notes: every query here is either map-only (pure projection — scales
linearly, no shuffle) or a single hash aggregation with map-side partial
aggregation; the only wide exchange is the groupBy key hash. Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
from terraform_aws_lambda_kinesis_to_es_spark.operators import routing
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

# Field mapping for the events table (FIXTURES.md §B).
EVENTS_CFG = PipelineConfig(
    log_type_field="event_type",
    log_timestamp_field="ts",
    log_id_field="event_id",
    index_name_prefix="logs",
)

WHITELIST = ("click", "error", "purchase")


def q_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field extraction (reference main.py:91: payloads
    parsed as JSON, fields pulled at runtime). ``get_json_object`` stays in
    the JVM; no Python on the hot path."""
    return load(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


def q_validate_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/failed routing split (reference main.py:96-106): required
    fields present -> valid; missing type routed under the unknown prefix
    (main.py:39). One plan, routing columns instead of two dicts."""
    df = load(spark, sf_dir, "events")
    df = routing.with_validation(df, EVENTS_CFG)
    df = routing.route_unknown(df, EVENTS_CFG)
    return df.select(
        "event_id", F.col("event_type").alias("log_type"), "is_valid"
    )


def q_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-type whitelist filter, silent drop (reference main.py:104,
    README.md:76). Predicate pushes down to the parquet scan."""
    cfg = PipelineConfig(
        log_type_field="event_type",
        log_timestamp_field="ts",
        log_type_whitelist=frozenset(WHITELIST),
    )
    df = routing.apply_whitelist(load(spark, sf_dir, "events"), cfg)
    return df.select("event_id", "event_type")


def q_unknown_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unknown-type assignment + per-type accounting (reference main.py:39,
    main.py:123: batch counts annotated for observability)."""
    df = routing.route_unknown(load(spark, sf_dir, "events"), EVENTS_CFG)
    return df.groupBy(F.col("event_type").alias("routed_type")).agg(
        F.count("*").alias("n")
    )


def q_index_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily index-name derivation from EVENT time (reference
    main.py:112-114: ``{prefix}-{log_type}-{yyyyMMdd}``; the daily-index
    contract of README.md:13). Pure projection — map-only at any scale."""
    df = routing.with_index_name(load(spark, sf_dir, "events"), EVENTS_CFG)
    return df.select("event_id", "index_date", "index_name")


def q_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, event-day) bucketing — the reference's implicit daily
    tumbling window (README.md:13) as an aggregation. Late data simply
    lands in an old bucket (SURVEY.md T5): no watermark, stateless."""
    df = load(spark, sf_dir, "events")
    return df.groupBy(
        F.col("event_type").alias("log_type"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))


def q_chunk_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk chunk accounting: 500 actions per sink HTTP request (reference
    main.py:30,132,146-147). ceil(n/500) per daily index."""
    df = routing.with_index_name(load(spark, sf_dir, "events"), EVENTS_CFG)
    return df.groupBy("index_name").agg(
        F.count("*").alias("n_actions"),
        F.ceil(F.count("*") / F.lit(500)).cast("bigint").alias("n_chunks"),
    )


def q_dead_letter_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter shaping: NDJSON body (reference main.py:170 ``to_str``
    join) + event-time partition path ``{log_type}/YYYY-MM/DD/``
    (main.py:118-120, README.md:13 layout)."""
    df = load(spark, sf_dir, "events")
    return df.select(
        F.col("event_id"),
        F.to_json(
            F.struct(F.col("event_id"), F.col("event_type"), F.col("props"))
        ).alias("ndjson_line"),
        F.concat_ws(
            "/",
            F.col("event_type"),
            F.date_format("ts", "yyyy-MM"),
            F.date_format("ts", "dd"),
        ).alias("s3_path"),
    )


def q_es_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bulk action shaping ``{_index, _type:'_doc', _source}`` with the
    whole record as the document body (reference main.py:116; intent of
    the main.py:109-116 loop — SURVEY.md B1). Output projects the action
    key columns; ``_source`` JSON is exercised by q_dead_letter_fmt."""
    df = routing.with_index_name(load(spark, sf_dir, "events"), EVENTS_CFG)
    actions = routing.build_es_actions(
        df, EVENTS_CFG, source_cols=["event_id", "event_type", "props"]
    )
    return actions.select(
        F.col("_index").alias("index_name"),
        F.col("_type").alias("doc_type"),
        F.col("_source").alias("source_json"),
    )


QUERIES = {
    "q_parse_props": q_parse_props,
    "q_validate_route": q_validate_route,
    "q_whitelist": q_whitelist,
    "q_unknown_route": q_unknown_route,
    "q_index_name": q_index_name,
    "q_daily_counts": q_daily_counts,
    "q_chunk_count": q_chunk_count,
    "q_dead_letter_fmt": q_dead_letter_fmt,
    "q_es_actions": q_es_actions,
}

_WL = ", ".join(f"'{t}'" for t in sorted(WHITELIST))

ORACLES = {
    "q_parse_props": """
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        FROM events
    """,
    "q_validate_route": """
        SELECT event_id,
               COALESCE(event_type, 'unknown') AS log_type,
               (event_type IS NOT NULL AND ts IS NOT NULL) AS is_valid
        FROM events
    """,
    "q_whitelist": f"""
        SELECT event_id, event_type FROM events WHERE event_type IN ({_WL})
    """,
    "q_unknown_route": """
        SELECT COALESCE(event_type, 'unknown') AS routed_type, COUNT(*) AS n
        FROM events GROUP BY 1
    """,
    "q_index_name": """
        SELECT event_id,
               strftime(ts, '%Y%m%d') AS index_date,
               'logs-' || event_type || '-' || strftime(ts, '%Y%m%d') AS index_name
        FROM events
    """,
    "q_daily_counts": """
        SELECT event_type AS log_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "q_chunk_count": """
        SELECT 'logs-' || event_type || '-' || strftime(ts, '%Y%m%d') AS index_name,
               COUNT(*) AS n_actions,
               CAST(CEIL(COUNT(*) / 500.0) AS BIGINT) AS n_chunks
        FROM events GROUP BY 1
    """,
    "q_dead_letter_fmt": """
        SELECT event_id,
               to_json(struct_pack(event_id := event_id, event_type := event_type,
                                   props := props))::VARCHAR AS ndjson_line,
               event_type || '/' || strftime(ts, '%Y-%m') || '/' || strftime(ts, '%d')
                 AS s3_path
        FROM events
    """,
    "q_es_actions": """
        SELECT 'logs-' || event_type || '-' || strftime(ts, '%Y%m%d') AS index_name,
               '_doc' AS doc_type,
               to_json(struct_pack(event_id := event_id, event_type := event_type,
                                   props := props))::VARCHAR AS source_json
        FROM events
    """,
}
