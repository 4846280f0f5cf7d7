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


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval scalar-function surface over orders: truncation,
    arithmetic, component extraction, month spans — all JVM-side,
    map-only, every output an exact date string or integer."""
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_day"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.datediff(F.last_day(d), d).cast("bigint").alias("days_to_month_end"),
    )


STR_TARGET = "customer"


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function surface over customer names: case mapping,
    padding, char translation, edit distance against a fixed probe,
    regex extraction — map-only, all deterministic byte-wise ops."""
    customer = load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lpad("c_name", 25, ".").alias("padded"),
        F.translate("c_name", "#", "-").alias("translated"),
        F.levenshtein(F.lower("c_name"), F.lit(STR_TARGET)).cast("bigint").alias(
            "edit_dist"
        ),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("name_num"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar-function surface: JSON → typed map, element access,
    key listing, map concat, size, membership — all JVM-side, map-only.
    The events `props` column is parsed once with an explicit map schema
    (from_json, not get_json_object, so downstream ops are typed)."""
    events = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    merged = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1).cast("bigint")))
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.concat_ws(",", F.map_keys(m)).alias("keys"),
        F.size(m).cast("bigint").alias("n_keys"),
        F.element_at(merged, "extra").alias("extra_val"),
        F.size(merged).cast("bigint").alias("n_merged"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-view surface: posexplode the first 5 whitespace tokens of
    each document into (doc_id, pos, token) rows — the Generate operator
    (1→N row explosion) with ordinality, fully pipelined (no shuffle).
    The oracle reproduces ordinality via a bounded range join, since
    DuckDB lacks WITH ORDINALITY."""
    docs = load(spark, sf_dir, "documents")
    toks = F.slice(F.split("text", " "), 1, 5)
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot API: order counts by status × priority. The pivot
    value list is EXPLICIT — at scale an implicit pivot burns an extra
    job + distinct shuffle just to discover column names; pinning the
    list keeps it one partial-agg shuffle. Absent combos fill 0 so the
    output matches conditional-aggregation semantics exactly."""
    orders = load(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    renames = {p: f"n_{p[0]}" for p in _PRIORITIES}
    return piv.select(
        "o_orderstatus", *[F.col(f"`{p}`").alias(renames[p]) for p in _PRIORITIES]
    )


def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native unpivot (melt) API: wide part metrics → long (key, metric,
    value) rows. Map-only Expand — each input row emits one row per
    metric with no shuffle; the inverse of the pivot surface above."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_map_functions": q_map_functions,
    "q_posexplode": q_posexplode,
    "q_pivot_priority": q_pivot_priority,
    "q_unpivot_part": q_unpivot_part,
    "q_range_join": q_range_join,
    "q_set_ops": q_set_ops,
    "q_cube_orders": q_cube_orders,
    "q_grouping_sets": q_grouping_sets,
    "q_array_math": q_array_math,
    "q_date_functions": q_date_functions,
    "q_string_functions": q_string_functions,
}

# 64-term explicit left-assoc sums (match Spark's fold order bit-for-bit).
_VSUM = "(0.0 + " + " + ".join(f"v[{i + 1}]" for i in range(64)) + ")"
_VSQ = "(0.0 + " + " + ".join(f"v[{i + 1}] * v[{i + 1}]" for i in range(64)) + ")"

ORACLES = {
    "q_pivot_priority": """
        -- COUNT(CASE...) (not SUM) so DuckDB emits BIGINT, matching Spark's
        -- pivot().count() — SUM over INTEGER is HUGEINT in DuckDB and
        -- hash-mismatches despite equal values (same class as q_priority_flag).
        SELECT o_orderstatus,
               COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_1,
               COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_2,
               COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_3,
               COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
                 AS n_4,
               COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_5
        FROM orders
        GROUP BY o_orderstatus
    """,
    "q_unpivot_part": """
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
    """,
    "q_map_functions": """
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k_val,
               array_to_string(json_keys(props), ',') AS keys,
               CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
               CAST(1 AS BIGINT) AS extra_val,
               CAST(len(json_keys(props)) + 1 AS BIGINT) AS n_merged,
               list_contains(json_keys(props), 'k') AS has_k
        FROM events
    """,
    "q_posexplode": """
        SELECT d.doc_id, CAST(r.range AS BIGINT) AS pos,
               d.toks[CAST(r.range AS INT) + 1] AS token
        FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS toks
              FROM documents) d
        JOIN range(0, 5) r ON r.range < len(d.toks)
    """,
    "q_date_functions": """
        SELECT o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
               strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                 AS month_start,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d')
                 AS due_day,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
               CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              last_day(CAST(o_orderdate AS DATE))) AS BIGINT)
                 AS days_to_month_end
        FROM orders
    """,
    "q_string_functions": f"""
        SELECT c_custkey,
               upper(c_name) AS upper_name,
               lpad(c_name, 25, '.') AS padded,
               replace(c_name, '#', '-') AS translated,
               CAST(levenshtein(lower(c_name), '{STR_TARGET}') AS BIGINT) AS edit_dist,
               COALESCE(regexp_extract(c_name, '(\\d+)', 1), '') AS name_num,
               CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer
    """,
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
