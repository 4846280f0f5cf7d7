"""Temporal join operators Spark lacks as built-ins: as-of join and
range join, composed from existing DataFrame ops (no UDFs).

As-of join (the classic time-series operator): for each left row, the
most recent right row with the same key at-or-before the left timestamp.
Implemented as union + partitioned window scan — ONE shuffle on the key,
never a per-row range probe. This is the scalable formulation: a naive
range join explodes to |L|x|R| candidate pairs per key; the union-scan is
O((|L|+|R|) log) within each key partition and AQE handles key skew.

Range join: equi-key join + range predicate. Spark evaluates the range
residual as a post-join filter on the hash join — at 100 TB the equi key
keeps the join keyed (no cartesian); a pure range (no equi key) would
need bucketized banding, which `bucketize_range` provides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row: latest right row with same ``key`` whose
    ``right_ts`` <= ``left_ts`` (optionally within a tolerance window).

    Union-scan formulation: tag sides, sort within key by (ts, side) and
    carry the last-seen right values forward with ``last(..., ignoreNulls)``
    — right rows at the exact left timestamp match (<=), guaranteed by
    sorting right (side=0) before left (side=1) on ties.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col("_rts"))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # Tie-break ordering is load-bearing for determinism: right rows sort
    # before left at equal ts (so <= matches), and equal-ts right rows
    # order by their carried columns so last() picks a stable winner.
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_side").asc(),
            *[F.col(f"_r_{c}").asc() for c in right_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_asof_ts", F.last("_rts", ignorenulls=True).over(w))
    for c in right_cols:
        carried = carried.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_asof_ts").isNotNull()
            & (F.col("_ts").cast("long") - F.col("_asof_ts").cast("long") <= tolerance_seconds)
        )
        for c in right_cols:
            out = out.withColumn(f"asof_{c}", F.when(within, F.col(f"asof_{c}")))
        out = out.withColumn("_asof_ts", F.when(within, F.col("_asof_ts")))
    return out.select(*lcols, F.col("_asof_ts").alias("asof_ts"), *[F.col(f"asof_{c}") for c in right_cols])


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cond: Column,
    range_cond: Column,
) -> DataFrame:
    """Equi-key + range-predicate join. The equi condition keeps the join
    hash-partitioned; the range predicate is the residual filter."""
    return left.join(right, key_cond & range_cond)


def bucketize_range(df: DataFrame, ts_col: str, bucket_seconds: int) -> DataFrame:
    """Add a coarse time bucket for pure-range joins: join on the bucket
    (and +/-1 neighbor on the probe side) then filter exactly — turns an
    unkeyed range join into a keyed one at the cost of a small fanout."""
    return df.withColumn(
        "_range_bucket", (F.col(ts_col).cast("long") / bucket_seconds).cast("long")
    )
