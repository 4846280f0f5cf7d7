"""Skew mitigation: salted aggregation and salted broadcast-backed join.

At 100 TB a single hot key (one chatty log_type, one viral user) turns a
keyed shuffle into one straggler task. Two standard remedies, both pure
DataFrame composition:

* **two-phase salted aggregation**: add a random salt to the key, partial
  aggregate on (key, salt) — spreading the hot key over N tasks — then
  final-aggregate on the key. Correct for any commutative+associative
  aggregate (counts/sums/mins here).
* **salted join**: explode the small side N ways, salt the big side
  randomly; each hot-key row lands in one of N buckets matched by the
  replicated small side. (Spark's AQE skew-join handles sort-merge cases
  automatically — enabled in session.py — but salting remains the tool
  for hash aggregations and for joins AQE can't split.)

The salt uses ``rand(seed)`` — deterministic per seed, but NOTE: the
salt only redistributes work; results are salt-independent by
construction, which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16, seed: int = 42
) -> DataFrame:
    """Two-phase count by ``key`` robust to hot keys. Output: key, n."""
    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_pn"))
    return partial.groupBy(key).agg(F.sum("_pn").cast("bigint").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for re-aggregable functions.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Each is algebraic: partial per (key, salt),
    merged per key (count merges via sum)."""
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join where ``big`` has skewed keys: salt the big side,
    replicate the small side across all salts, join on (key, salt)."""
    big_s = big.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")
