"""Pipeline configuration.

Mirrors the reference's configuration plane (reference: variables.tf:1-108 ->
Lambda env vars, main.tf:41-54, bound once at cold start, main.py:33-48).
Here it is a frozen dataclass validated at construction; Spark session conf
carries the timezone (reference TZ env, variables.tf:1-4).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def parse_whitelist(csv: str | None) -> frozenset[str]:
    """Parse a comma-separated whitelist.

    Implements the *intended* semantics of the reference (README.md:76,
    variables.tf:87-91): an empty/unset whitelist means "process all types".
    The reference itself has a bug here (main.py:41-45: ``"".split(",") ==
    [""]`` makes the empty branch dead — SURVEY.md B2); we implement intent.
    """
    if not csv:
        return frozenset()
    return frozenset(t for t in (s.strip() for s in csv.split(",")) if t)


@dataclass(frozen=True)
class PipelineConfig:
    """Engine configuration, names mirroring the reference's variables.tf.

    Field-name knobs (reference variables.tf:67-85; defaults from README.md:12-14):
      * log_type_field     — routing key (main.py:37)
      * log_timestamp_field— event-time field (main.py:38)
      * log_id_field       — idempotency key, carried through (main.py:36)
    """

    log_type_field: str = "log_type"
    log_timestamp_field: str = "time"
    log_id_field: str = "log_id"
    # Records failing validation get this type for dead-letter bucketing
    # (reference main.py:39, variables.tf:77-80).
    log_type_unknown_prefix: str = "unknown"
    # Empty => all types pass (intended semantics; SURVEY.md B2).
    log_type_whitelist: frozenset[str] = field(default_factory=frozenset)
    # ES index name prefix: index = {prefix}-{log_type}-{yyyyMMdd}
    # (reference main.py:112-114, README.md:13).
    index_name_prefix: str = "logs"
    # Process timezone -> spark.sql.session.timeZone (reference main.tf:43).
    timezone: str = "UTC"
    # Bulk chunk: one sink HTTP request per chunk (reference main.py:30,146-147).
    bulk_chunk_size: int = 500
    # Sink client timeout seconds (reference main.py:29,82).
    es_timeout: int = 30
    # Max records per micro-batch (reference variables.tf:16-18); maps to the
    # streaming trigger / source rate cap, not a hard row limit.
    batch_size: int = 100
    # Dead-letter base paths (reference FAILED_LOG_S3_BUCKET/PREFIX,
    # main.tf:48-49). Local paths or s3a:// URIs.
    failed_log_path: str = ""
    failed_log_prefix: str = "failed"
    # EXTENSION (off by default = reference behavior): use log_id as the ES
    # document _id, upgrading at-least-once delivery to effectively-once
    # via sink-side upsert (the reference carries log_id exactly so
    # downstream can do this — variables.tf:67-70 — but never sets _id,
    # main.py:116).
    use_log_id_as_doc_id: bool = False
    # Timestamp parse strategy: 'ladder' (JVM-side try_to_timestamp
    # coalesce over the documented formats — the hot-path default) or
    # 'dateutil' (Arrow-batched pandas UDF with exact dateutil parity,
    # reference README.md:14 / lambda/requirements.txt:7 — opt-in for
    # raw streams with wild formats).
    timestamp_parser: str = "ladder"

    def __post_init__(self) -> None:
        if self.timestamp_parser not in ("ladder", "dateutil"):
            raise ValueError("timestamp_parser must be 'ladder' or 'dateutil'")
        if self.bulk_chunk_size <= 0:
            raise ValueError("bulk_chunk_size must be positive")
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if not self.index_name_prefix:
            raise ValueError("index_name_prefix must be non-empty")

    @classmethod
    def from_env_style(cls, env: dict[str, str]) -> "PipelineConfig":
        """Build from a reference-style env-var dict (main.py:33-48 names)."""
        return cls(
            log_type_field=env.get("LOG_TYPE_FIELD", "log_type"),
            log_timestamp_field=env.get("LOG_TIMESTAMP_FIELD", "time"),
            log_id_field=env.get("LOG_ID_FIELD", "log_id"),
            log_type_unknown_prefix=env.get("LOG_TYPE_UNKNOWN_PREFIX", "unknown"),
            log_type_whitelist=parse_whitelist(env.get("LOG_TYPE_WHITELIST")),
            index_name_prefix=env.get("INDEX_NAME_PREFIX", "logs"),
            timezone=env.get("TZ", "UTC"),
            failed_log_path=env.get("FAILED_LOG_S3_BUCKET", ""),
            failed_log_prefix=env.get("FAILED_LOG_S3_PREFIX", "failed"),
        )
