"""SparkSession factory tuned for this engine.

Local-mode testing uses local[N]; the conf choices (AQE, shuffle partitions,
Arrow) are the ones that also hold on a real multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "terraform_aws_lambda_kinesis_to_es_spark",
    *,
    timezone: str = "UTC",
    shuffle_partitions: int | None = None,
    master: str | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting — the
        # mechanism that keeps these plans healthy at 100 TB without
        # hand-tuning per-query partition counts.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Without this, persist() pins the cached plan's output partitioning
        # and AQE cannot coalesce the (often tiny) shuffles that build it —
        # iterative ops like connected components then schedule full-width
        # reducer waves over a few hundred rows.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", timezone)
        # Arrow for the pandas-UDF slow path (binary decode, simhash).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # static conf: keep managed tables (bucketing tests/demos) out of cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
