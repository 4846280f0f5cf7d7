"""Skew-mitigation correctness + bucketed-join co-location evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows for the hot key, a handful for the rest
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(50).select(
        F.concat(F.lit("cold"), (F.col("id") % 5)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark, skewed):
    plain = {r.k: r.n for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in skew.salted_count(skewed, "k").collect()}
    assert salted == plain
    assert salted["hot"] == 10_000


def test_salted_agg_matches_plain(spark, skewed):
    out = {
        r.k: (r.total, r.lo, r.hi)
        for r in skew.salted_agg(
            skewed, "k", {"total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")}
        ).collect()
    }
    ref = {
        r.k: (r.total, r.lo, r.hi)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("total"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert out == ref


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold3", "C3")], ["k", "label"]
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = skew.salted_join(skewed, dim, "k").groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark, skewed):
    salted = skewed.withColumn("_salt", (F.rand(42) * 16).cast("int"))
    n_buckets = (
        salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_buckets == 16  # the hot key actually fans out


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketed tables co-locate the join: the sort-merge join reads
    both sides bucket-aligned with NO shuffle exchange — the plan proof
    that bucket-by-key storage eliminates the big-join shuffle at scale."""
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lines_b")
    orders = spark.range(1000).select(F.col("id").alias("okey"), (F.col("id") % 7).alias("x"))
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("okey"), F.col("id").alias("line")
    )
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("t_orders_b")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("t_lines_b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_orders_b").join(spark.table("t_lines_b"), "okey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert j.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")
