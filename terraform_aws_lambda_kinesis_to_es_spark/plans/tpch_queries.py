"""Relational capability surface over the TPC-H-ish star schema.

The reference has no joins/sorts/window functions (SURVEY.md §2.7 — explicit
nulls); Spark supplies them natively. These queries exist to demonstrate —
and benchmark — the join strategies that matter at 100 TB:

* dimension joins are **broadcast**, but `F.broadcast` is pinned ONLY on
  genuinely bounded relations (nation = 25 rows, region = 5 rows,
  single-row scalar aggregates). SF-proportional sides (customer,
  supplier, part — even filtered constant fractions of them) carry NO
  explicit hint: a forced broadcast of a 150k-rows-per-SF relation OOMs
  the executors at the 100 TB target, while at any scale where the side
  IS small the static planner's size estimate or AQE's runtime re-plan
  promotes the join to broadcast anyway (test_plan_shape.py asserts this
  promotion happens hint-free at test scale),
* fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and AQE
  coalesces/splits post-shuffle partitions,
* aggregations are partial (map-side combine) before the exchange.

All money aggregates round(4) on both engines so double-summation order
cannot break the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-heavy single aggregation.
    Filter + column pruning push into the parquet scan; one shuffle on the
    2-value grouping key."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join: a pinned-broadcast nation join (25
    rows, bounded), a customer join left to the planner (broadcast at
    small SF via size stats/AQE, shuffle at extreme SF), and one shuffled
    fact-fact join, then a small aggregation."""
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    ord_nation = orders.join(
        cust_nation, orders.o_custkey == cust_nation.c_custkey
    ).select("o_orderkey", "n_name")
    joined = lineitem.join(ord_nation, lineitem.l_orderkey == ord_nation.o_orderkey)
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: filtered join + top-k by revenue. `orderBy.limit`
    compiles to TakeOrdered — per-partition heap, no global sort."""
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return j.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)


def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (orderstatus, orderpriority) — multi-level aggregate in
    one pass (Spark expands grouping sets map-side; single shuffle)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


def q_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: rank suppliers by account balance within nation —
    one shuffle on the partition key, rank ties broken deterministically
    in the output contract (dense output keyed by s_suppkey)."""
    supplier = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        supplier.withColumn("rank_in_nation", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_nation") <= 3)
        .select("s_nationkey", "s_suppkey", F.round("s_acctbal", 4).alias("acctbal"), "rank_in_nation")
    )


def q_customer_order_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface: customers with no orders (left-anti). At
    scale this is a shuffled anti-join on the key; no data explosion."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_part_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + aggregation over parts. Sum (not avg) of the 2-decimal
    price: the true value has <= 2 decimals, so round(4) is midpoint-free
    and bit-stable across engines and partition orders (an avg here can
    land exactly on a .xxxx5 midpoint — observed at sf0.01 — where Spark's
    HALF_UP and DuckDB's rounding disagree)."""
    part = load(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.count("*").alias("n_parts"),
        F.round(F.sum("p_retailprice"), 4).alias("sum_price"),
    )


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (orders above their customer's average)
    decorrelated as a window aggregate — one shuffle on the correlation
    key instead of a per-row subquery execution."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


def q_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile stats over order prices (global sort + single pass).
    A global window is the one legitimately sort-heavy op here; at scale
    the sample-quantile cut replaces exact NTILE — implemented as
    operators/quantiles.py:assign_sample_quantile_buckets (broadcast
    sample boundaries, map-only assignment, NTILE-agreement pinned)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("decile", F.ntile(10).over(w).cast("bigint"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
    )


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped nation-pair trade volume: the deepest join tree in
    the surface (lineitem ⋈ supplier ⋈ orders ⋈ customer ⋈ nation ×2).
    Only the bounded nation joins pin a broadcast hint; the
    supplier/customer sides are planner-chosen (broadcast at small SF,
    shuffle at extreme SF). The unavoidable exchange is the
    lineitem ⋈ orders shuffle on the order key, then one small
    aggregation on (supp_nation, cust_nation, year)."""
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ord_cust = orders.join(
        cust_nation, orders.o_custkey == cust_nation.c_custkey
    ).select("o_orderkey", "cust_nation")
    j = lineitem.join(supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey).join(
        ord_cust, lineitem.l_orderkey == ord_cust.o_orderkey
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: HAVING-filtered aggregation
    joined back to its dimensions. The quantity sum is computed BEFORE the
    joins so the shuffled aggregation shrinks the fact table first; the
    surviving handful of keys then join orders (shuffle) and customer
    (planner-chosen strategy). Quantities are small integers in double — their sum is exact
    in FP regardless of partition order, so the > threshold cut is
    deterministic across engines."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: which customers returned the
    most revenue. The returnflag filter pushes into the lineitem scan;
    aggregation runs BEFORE the customer join (fact-shrink first, same
    posture as q_big_spenders), so the only wide exchange is
    lineitem ⋈ orders on the order key. Top-20 via TakeOrdered on the
    ROUNDED revenue (rank ties broken by custkey — deterministic across
    engines and partition orders)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_items")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_priority_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional counts: per returnflag, how many line
    items belong to high- vs low-priority orders. One shuffled fact-fact
    join, then all-integer conditional aggregation (bit-exact on any
    engine; no float path at all)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion-revenue share by ship month: part (the
    mid-size dimension) joins into lineitem with planner-chosen strategy
    (broadcast at small SF), conditional revenue sum.
    Emits promo and total sums separately (round(4) each) rather than the
    float ratio — the division of two independently-wobbling doubles is
    the one non-reproducible formulation (memory: avoid round(avg-like,4))."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))), 4).alias(
                "promo_revenue"
            ),
            F.round(F.sum(rev), 4).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: revenue per supplier, keep the max.
    The scalar-subquery MAX is a window max over the already-aggregated
    supplier frame (~|supplier| rows — the single-partition window runs on
    the tiny post-agg side, never on the fact table). Comparing ROUNDED
    revenues keeps the argmax cut identical across engines."""
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem")
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    w = Window.partitionBy()
    top = rev.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(supplier, top.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join: OR-of-ANDs spanning
    both sides of the part ⋈ lineitem join. The per-side conjuncts
    (brand/size on part, quantity on lineitem) cannot be pushed below the
    join as a whole, but Catalyst extracts the common-side disjunction
    (brand IN (...) OR'd sizes) into the part side of the join (which the
    planner broadcasts at small SF). Single-row all-float output rounds
    after the final sum."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    j = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: line items below 20% of
    their part's average order quantity. The correlated per-part AVG
    decorrelates to a window over l_partkey (one shuffle on the part key,
    reused nowhere else); part joins in for the brand grouping
    (planner-chosen strategy — broadcast at small SF).
    Determinism: quantities are small integers in double, so the window
    SUM (and hence AVG = sum/count) is exact in FP regardless of
    partition order — the 0.2*avg threshold compare cannot wobble."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    small = (
        lineitem.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
            F.count("*").alias("n_items"),
        )
    )


def q_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average (positive) balance
    and no orders — scalar-aggregate subquery (single-row broadcast) +
    anti join, grouped by nation. The threshold is avg over 2-decimal
    balances: Spark's and DuckDB's partition-order sum wobble (~1e-12)
    cannot move any 0.01-grid balance across it."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        )
    )


def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: LEFT OUTER join
    preserving order-less customers, per-customer count, then a second
    aggregation over the counts. The outer join shuffles both sides on
    custkey once; the histogram re-aggregation is tiny (distinct counts
    ≤ max orders per customer). The order filter lives BELOW the outer
    join (pre-filtering the right side ≡ putting it in the ON clause),
    so unmatched customers survive with count 0."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_valuable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped group-HAVING-vs-global-aggregate: parts whose
    revenue exceeds 0.1% of TOTAL revenue. The global total is re-derived
    from the grouped result (one scan, one shuffle; the total is a
    single-row broadcast, not a second pass over lineitem). Money is held
    as exact integer 1e-4-dollar units (2-decimal price × 2-decimal
    discount), so the threshold compare is integer math — bit-identical
    on any engine and any partition order. At extreme scale the unit sums
    approach int64 limits (~1e9/row × ~1e12 rows); switch the unit column
    to decimal(38,0) there — the plan shape is unchanged."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_u"),
    )
    rev = li.groupBy("l_partkey").agg(F.sum("rev_u").alias("part_rev_u"))
    total = rev.agg(F.sum("part_rev_u").alias("total_u"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev_u") * 1000 > F.col("total_u"))
        .select(
            "l_partkey",
            F.round(F.col("part_rev_u") / 10000.0, 4).alias("part_rev"),
        )
    )


def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier variety: distinct suppliers per part
    attribute combo, excluding a supplier blocklist (NOT IN ⇒ left-anti
    join; the blocklist and filtered part side are constant FRACTIONS of
    SF-proportional tables, so neither pins a broadcast hint — the
    planner promotes both at small SF). countDistinct expands to a
    two-phase partial-distinct aggregate."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_name").like("%7"))
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped sole-blame analysis: returned line items in
    multi-supplier orders where NO other supplier also returned — an
    EXISTS (left-semi) and a NOT EXISTS (left-anti) against the same
    fact table, each an equi-join on orderkey with a suppkey-inequality
    residual. Both self-joins reuse the same orderkey hash partitioning;
    the supplier name join is planner-chosen. Output is integer counts
    only."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    returned = li.filter(F.col("l_returnflag") == "R")
    l1 = returned.alias("l1")
    l2 = li.alias("l2")
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).alias("c")
    l3 = returned.alias("l3")
    sole = cand.join(
        l3,
        (F.col("c.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("c.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        sole.join(supplier, sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue-change: a pure range-filter
    scan aggregate (date window + discount band + quantity cap) with NO
    join and NO grouping — the canonical predicate-pushdown probe: every
    filter must reach the parquet scan, the agg is one partial+final.
    round(sum, 4) is exact: price (2 decimals) x discount (2 decimals)
    has <= 4 decimals, so the sum does too (house float rule)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


MKT_REGION = "ASIA"
MKT_NATION = "NATION_3"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: of the revenue on orders
    placed by customers in the MKT_REGION market, how much is supplied by
    MKT_NATION, per order year. Emits numerator and denominator as
    separate round(sum,4) columns instead of their ratio — the ratio of
    two floats is not 4-decimal-exact, the sums are (volume = price x
    (1-discount) has <= 4 decimals).

    Shape: nation/region pin broadcast hints (bounded); the
    customer/supplier legs of the dimension chains are planner-chosen;
    lineitem |><| orders is the one data exchange; the
    conditional share is a filtered aggregate over the same rows (no
    second scan)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == MKT_REGION)
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    mkt_cust = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    mkt_orders = orders.join(
        mkt_cust, orders.o_custkey == mkt_cust.c_custkey
    ).select("o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year"))
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = lineitem.join(
        supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey
    ).join(mkt_orders, lineitem.l_orderkey == mkt_orders.o_orderkey)
    return j.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(0.0)), 4
        ).alias("nation_revenue"),
        F.round(F.sum(vol), 4).alias("total_revenue"),
        F.count("*").alias("n_items"),
    )


QUERIES = {
    "q_forecast_revenue": q_forecast_revenue,
    "q_market_share": q_market_share,
    "q_above_avg_orders": q_above_avg_orders,
    "q_cust_order_dist": q_cust_order_dist,
    "q_valuable_parts": q_valuable_parts,
    "q_part_supplier_variety": q_part_supplier_variety,
    "q_blame_supplier": q_blame_supplier,
    "q_small_qty_orders": q_small_qty_orders,
    "q_wealthy_inactive": q_wealthy_inactive,
    "q_returned_items": q_returned_items,
    "q_priority_flag": q_priority_flag,
    "q_promo_revenue": q_promo_revenue,
    "q_top_supplier": q_top_supplier,
    "q_disjunctive_join": q_disjunctive_join,
    "q_volume_shipping": q_volume_shipping,
    "q_big_spenders": q_big_spenders,
    "q_price_deciles": q_price_deciles,
    "q_pricing_summary": q_pricing_summary,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_top_orders": q_top_orders,
    "q_order_priority_rollup": q_order_priority_rollup,
    "q_supplier_rank": q_supplier_rank,
    "q_customer_order_semi": q_customer_order_semi,
    "q_part_size_dist": q_part_size_dist,
}

ORACLES = {
    "q_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_market_share": f"""
        WITH mkt_cust AS (
          SELECT c.c_custkey
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = '{MKT_REGION}'
        ), mkt_orders AS (
          SELECT o.o_orderkey, CAST(year(o.o_orderdate) AS BIGINT) AS o_year
          FROM orders o JOIN mkt_cust mc ON o.o_custkey = mc.c_custkey
        ), supp_nation AS (
          SELECT s.s_suppkey, n.n_name AS supp_nation
          FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        )
        SELECT mo.o_year,
               ROUND(SUM(CASE WHEN sn.supp_nation = '{MKT_NATION}'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END), 4) AS nation_revenue,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN supp_nation sn ON l.l_suppkey = sn.s_suppkey
        JOIN mkt_orders mo ON l.l_orderkey = mo.o_orderkey
        GROUP BY mo.o_year
    """,
    "q_cust_order_dist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN (SELECT * FROM orders
                           WHERE o_orderpriority <> '1-URGENT') o
            ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    "q_valuable_parts": """
        WITH rev AS (
          SELECT l_partkey,
                 SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                   AS part_rev_u
          FROM lineitem
          GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(part_rev_u / 10000.0, 4) AS part_rev
        FROM rev
        WHERE part_rev_u * 1000 > (SELECT SUM(part_rev_u) FROM rev)
    """,
    "q_part_supplier_variety": """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_name LIKE '%7')
        GROUP BY 1, 2, 3
    """,
    "q_blame_supplier": """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
    """,
    "q_small_qty_orders": """
        SELECT p.p_brand,
               ROUND(SUM(l.l_extendedprice), 4) AS total_price,
               COUNT(*) AS n_items
        FROM (
          SELECT l_partkey, l_quantity, l_extendedprice,
                 AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
          FROM lineitem
        ) l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity < 0.2 * l.avg_qty
        GROUP BY 1
    """,
    "q_wealthy_inactive": """
        SELECT c.c_nationkey,
               COUNT(*) AS n_custs,
               ROUND(SUM(c.c_acctbal), 4) AS sum_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
    """,
    "q_returned_items": """
        SELECT c.c_custkey, c.c_name, r.revenue, r.n_items
        FROM (
          SELECT o.o_custkey,
                 ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
                 COUNT(*) AS n_items
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
          GROUP BY o.o_custkey
        ) r
        JOIN customer c ON r.o_custkey = c.c_custkey
        ORDER BY r.revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    "q_priority_flag": """
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag
    """,
    "q_promo_revenue": """
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
               ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END), 4) AS promo_revenue,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """,
    "q_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "q_disjunctive_join": """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
    """,
    "q_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        GROUP BY 1, 2, 3
    """,
    "q_big_spenders": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               ROUND(o.o_totalprice, 4) AS totalprice,
               ROUND(b.sum_qty, 4) AS sum_qty
        FROM (
          SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
        ) b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "q_above_avg_orders": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
        FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
          FROM orders
        ) WHERE o_totalprice > cust_avg
    """,
    "q_price_deciles": """
        SELECT decile, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 4) AS sum_price,
               ROUND(MIN(o_totalprice), 4) AS min_price,
               ROUND(MAX(o_totalprice), 4) AS max_price
        FROM (
          SELECT o_totalprice,
                 CAST(NTILE(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS decile
          FROM orders
        ) GROUP BY decile
    """,
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_revenue_by_nation": """
        SELECT n.n_name AS nation,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    """,
    "q_top_orders": """
        SELECT o.o_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "q_order_priority_rollup": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q_supplier_rank": """
        SELECT s_nationkey, s_suppkey, ROUND(s_acctbal, 4) AS acctbal, rank_in_nation
        FROM (
          SELECT s_nationkey, s_suppkey, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank_in_nation
          FROM supplier
        ) WHERE rank_in_nation <= 3
    """,
    "q_customer_order_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
    "q_part_size_dist": """
        SELECT p_brand,
               COUNT(DISTINCT p_type) AS n_types,
               COUNT(*) AS n_parts,
               ROUND(SUM(p_retailprice), 4) AS sum_price
        FROM part GROUP BY p_brand
    """,
}
