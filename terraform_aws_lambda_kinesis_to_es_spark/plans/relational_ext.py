"""Extended relational surface: as-of join, range join, set operations,
CUBE grouping sets — SURVEY.md §2.7's "explicit nulls" filled in, each
with an exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import temporal
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'purchase' event, the user's most recent
    'click' at-or-before it. One shuffle on user_id (union-scan formulation
    — see operators.temporal.asof_join)."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = temporal.asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_at"),
        F.col("asof_click_id").alias("last_click_id"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with an equi anchor: lineitems shipped within 30 days
    after their order's date. Hash join on the order key; the range
    predicate is the residual — never a cartesian."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = temporal.range_join(
        li,
        orders,
        li.l_orderkey == orders.o_orderkey,
        # timestamp + INTERVAL, not date_add: date_add truncates to DATE
        # and would silently drop any time-of-day component
        (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_shipped_30d"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: users who clicked EXCEPT users who purchased,
    UNION users who errored INTERSECT users who signed up. Spark rewrites
    these to anti/semi joins + distinct — keyed shuffles only."""
    events = load(spark, sf_dir, "events")

    def users_of(t: str) -> DataFrame:
        return events.filter(F.col("event_type") == t).select("user_id")

    # subtract == SQL EXCEPT (set semantics); exceptAll would be a bag
    # difference and diverge whenever a user has more clicks than purchases
    clicked_not_bought = users_of("click").subtract(users_of("purchase"))
    err_and_signup = users_of("error").intersect(users_of("signup"))
    return (
        clicked_not_bought.withColumn("cohort", F.lit("clicked_no_purchase"))
        .unionByName(err_and_signup.withColumn("cohort", F.lit("error_and_signup")))
        .distinct()
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations in
    one pass (Spark expands map-side; single shuffle)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("sum_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "sum_price",
        )
    )


def q_array_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/array scalar-function surface over embeddings: element sums,
    min/max, L2 norm (HOF fold), clipped/normalized head — all JVM-side."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.array_min(v), 4).alias("vec_min"),
        F.round(F.array_max(v), 4).alias("vec_max"),
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary (non-hierarchical) GROUPING SETS via the SQL surface —
    (status, priority) detail + a priority-only margin + grand total,
    which neither ROLLUP nor CUBE expresses. Also exercises the engine's
    SQL entry path (temp view + spark.sql); same single-shuffle expansion
    as cube/rollup."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        """
    )


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_set_ops": q_set_ops,
    "q_cube_orders": q_cube_orders,
    "q_grouping_sets": q_grouping_sets,
    "q_array_math": q_array_math,
}

# 64-term explicit left-assoc sums (match Spark's fold order bit-for-bit).
_VSUM = "(0.0 + " + " + ".join(f"v[{i + 1}]" for i in range(64)) + ")"
_VSQ = "(0.0 + " + " + ".join(f"v[{i + 1}] * v[{i + 1}]" for i in range(64)) + ")"

ORACLES = {
    "q_grouping_sets": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """,
    "q_asof_join": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
               strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS last_click_at,
               b.click_id AS last_click_id
        FROM p LEFT JOIN LATERAL (
          SELECT c.ts, c.click_id FROM c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.click_id DESC LIMIT 1
        ) b ON TRUE
    """,
    "q_range_join": """
        SELECT o.o_orderstatus,
               COUNT(*) AS n_shipped_30d,
               ROUND(SUM(l.l_extendedprice), 4) AS sum_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1
    """,
    "q_set_ops": """
        SELECT DISTINCT * FROM (
          SELECT user_id, 'clicked_no_purchase' AS cohort FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
          )
          UNION ALL
          SELECT user_id, 'error_and_signup' AS cohort FROM (
            SELECT user_id FROM events WHERE event_type = 'error'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'signup'
          )
        )
    """,
    "q_cube_orders": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q_array_math": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               ROUND({_VSUM}, 4) AS vec_sum,
               ROUND(list_min(v), 4) AS vec_min,
               ROUND(list_max(v), 4) AS vec_max,
               ROUND(sqrt({_VSQ}), 4) AS l2_norm,
               CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive
        FROM e
    """,
}
