"""Parquet table catalog for the driver-provided test data.

``events`` is the batch stand-in for the Kinesis stream (event_type ~
log_type, ts ~ time, event_id ~ log_id, props ~ opaque JSON body). Reads
are plain ``spark.read.parquet`` so Catalyst gets pushdown + pruning +
partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects; read them as long (nanosAsLong) and convert to proper
# timestamps (values carry only microsecond precision, so DIV 1000 is
# lossless and agrees with DuckDB's TIMESTAMP_NS view of the same file).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine-owned runtime conf, set here (not only in session.py) so the
    # iterative operators behave on a CALLER-provided vanilla session too:
    # without it, persist() pins each cached plan's output partitioning
    # and AQE cannot coalesce the tiny shuffles that build it — connected
    # components then schedules default-width (e.g. 200-task) reducer
    # waves over a few hundred rows per iteration. (At oracle scale the
    # effect is modest — first-query codegen dominates there — but the
    # reducer-wave width matters as iteration count or default
    # parallelism grows.)
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    # The NTZ normalization below (to_timestamp) and every date-bucketing
    # consumer are wall-clock-correct only under UTC. session.py sets this
    # for engine-owned sessions; set it here too so a CALLER-provided
    # vanilla session with a non-UTC JVM default timezone cannot silently
    # shift timestamp values relative to DuckDB's reading of the same file.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # Depending on the parquet writer, ts may arrive as TIMESTAMP_NTZ
            # instead of nanos-as-long. Spark 4 forbids NTZ in several
            # expressions downstream queries rely on (CAST to BIGINT,
            # unix_micros, ...), so normalize to session-TZ TIMESTAMP here —
            # one type for every consumer. Sessions run UTC (session.py), so
            # the wall-clock values are identical to DuckDB's reading.
            df = df.withColumn(col, F.to_timestamp(F.col(col)))
    return df


def load_split(
    spark: SparkSession, sf_dir: str, name: str, parallelism: int | None = None
) -> DataFrame:
    """Load + round-robin repartition for CPU-heavy per-row pipelines.

    Text/embedding corpora are tiny on disk (columnar compression) but
    expensive per ROW (tokenize / hash folds / HOF math), and a parquet
    row group cannot be split below its boundary — when the file count is
    below the core count the scan comes back with fewer partitions than
    cores and every downstream per-row stage runs near-serial. One cheap
    round-robin exchange of the raw rows re-parallelizes the pipeline;
    the repartition is skipped when the scan already has enough splits,
    so at 100 TB (file count >> cores) this is a no-op and costs nothing.
    """
    df = load(spark, sf_dir, name)
    target = parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so callers can run arbitrary
    ``spark.sql`` over the same normalized frames the declared queries
    use (NTZ/UTC handling included — a raw ``spark.read.parquet`` view
    would NOT match). This is the ad-hoc SQL entry point: the engine's
    whole declared surface stays expressible as plain SQL against these
    views, and Catalyst sees identical plans either way."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
