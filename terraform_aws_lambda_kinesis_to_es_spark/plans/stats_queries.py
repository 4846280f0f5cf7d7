"""Statistical / window-analytics surface: lag-window gaps, exact
percentiles, correlation & dispersion aggregates.

These fill the remaining "none in reference" rows of SURVEY.md §2.7
(window lag/lead, statistical aggregates) with the same scale shapes as
the rest of the relational surface: one keyed shuffle per window
partition / grouping key, everything JVM-side.

Oracle-parity notes (see also the rules in tests/oracle_harness.py):
* q_order_gaps emits only INTEGER day counts (sum/max of datediffs) —
  float-free, so the value hash cannot wobble.
* q_percentiles: both engines sort the group's doubles exactly and
  interpolate linearly at (n-1)*p, so inputs to round() are bit-identical.
* q_corr_stats rounds corr/stddev at 4 decimals: these are quotient
  values, never exact decimal midpoints (unlike round(avg) over 2-decimal
  money, which is banned — see q_pricing_summary's sum/count split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer reorder gaps via LAG: days between consecutive orders,
    aggregated per customer. One shuffle on o_custkey serves both the
    window sort and the final groupBy (same key — Catalyst reuses the
    partitioning, no second exchange)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    # coalesce(0): single-order customers have no gap — emit 0, not NULL
    # (null-free output keeps the value hash total-orderable)
    return gaps.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.coalesce(F.sum("gap_days"), F.lit(0)).cast("bigint").alias("sum_gap_days"),
        F.coalesce(F.max("gap_days"), F.lit(0)).cast("bigint").alias("max_gap_days"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (p25/p50/p75/p95) of order value per
    priority class. F.percentile is the exact sort-based aggregate — the
    scale cost is one shuffle keyed by the 5-value grouping column; the
    approx_percentile sketch is the knob to reach for if a group ever
    outgrows an executor (not needed at these cardinalities)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        F.count("*").alias("n"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification with carry-forward fill: the per-(type,
    hour) count series, densified over the observed span (hourly — the
    granularity at which this stream actually has holes, see q_dead_hours)
    and gap-filled with the last observed value (leading gaps -> 0), plus
    a was_gap flag. The standard prep step before any rolling/longitudinal
    analysis — a downstream window must see every cell exactly once.

    Scale shape: the only corpus-size work is the hourly aggregation; the
    spine (distinct types x hour sequence from one min/max row) and the
    carry-forward window both run over the BOUNDED |types| x |hours|
    relation, never the raw events."""
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = events.select("event_type").distinct()
    spine = types.join(F.broadcast(span)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    filled = spine.join(hourly, ["event_type", "hour"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.last("n", ignorenulls=True).over(w), F.lit(0))
        .cast("bigint")
        .alias("n_filled"),
        F.col("n").isNull().alias("was_gap"),
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit — the outlier-clipping preprocessing step: per
    priority class, the exact p1/p99 clip bounds for order value and how
    many rows each tail would clip. Bounds are exact interpolated
    percentiles (identical IEEE doubles in both engines, see
    q_percentiles); tail counts compare against the UNROUNDED bounds so
    the integers cannot wobble; the reported bounds are round(4) for
    display only. One grouped percentile aggregation + a broadcast join
    back — no corpus-wide sort or window."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.01)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("hi"),
    )
    j = orders.join(F.broadcast(bounds), "o_orderpriority")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(F.first("lo"), 4).alias("p01"),
        F.round(F.first("hi"), 4).alias("p99"),
    )


APPROX_PCT_ACCURACY = 1000


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles with an oracle-checkable accuracy contract —
    the q_approx_distinct pattern applied to percentiles. At 100 TB the
    exact sort-based percentile of a hot group can outgrow an executor;
    approx_percentile's mergeable sketch (bounded memory, map-side
    combine) is the scale path. Sketch contents are engine-specific, so
    like the HLL query this emits the EXACT p50 (both engines compute it
    identically) plus a boolean asserting the sketch's estimate landed
    inside the exact quantile bracket at p ± 5/accuracy — 5x the sketch's
    published rank-error guarantee (eps = 1/accuracy), wide enough to be
    deterministic in practice, tight enough to prove the sketch works.
    The oracle checks the booleans are uniformly TRUE."""
    orders = load(spark, sf_dir, "orders")
    slack = 5.0 / APPROX_PCT_ACCURACY
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_percentile(
            "o_totalprice", F.lit(0.5), F.lit(APPROX_PCT_ACCURACY)
        ).alias("ap50"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.5 - slack)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.5 + slack)).alias("hi"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "o_orderpriority",
        F.round("p50", 4).alias("p50_exact"),
        "n",
        ((F.col("ap50") >= F.col("lo")) & (F.col("ap50") <= F.col("hi"))).alias(
            "within_rank_bound"
        ),
    )


def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / dispersion aggregates per return flag: Pearson corr of
    quantity vs extended price, sample stddev, min/max. Single partial-
    aggregated shuffle (co-moments merge associatively map-side)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.count("*").alias("n"),
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS window frames: per-customer cumulative spend and a
    3-order trailing moving average, both over the same (partition, sort)
    — one shuffle serves every frame. Frame order is total (date +
    unique key), so the running float sums accumulate identically in both
    engines; true values have <= 2 decimals, so round(4) sits ~5e-5 from
    any boundary while accumulated FP error is ~1e-9 — midpoint-safe."""
    orders = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trail3 = base.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(cum), 4).alias("cum_spend"),
        F.round(F.sum("o_totalprice").over(trail3), 4).alias("trail3_spend"),
        F.count("*").over(trail3).alias("trail3_n"),
    )


def q_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window: per-user trailing-1-hour event count and
    value sum at every event (the sliding-aggregate shape ROWS frames
    cannot express when event spacing is irregular). The frame is defined
    on integer epoch seconds, so frame membership is exact on both
    engines; one shuffle on user_id."""
    events = load(spark, sf_dir, "events")
    secs = F.expr("unix_micros(ts) DIV 1000000")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs.alias("sec"))
        .rangeBetween(-3599, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection over the per-(type, day)
    event counts: each day scored against the mean/std of the previous 7
    days (ROWS frame). All moments come from exact integer sums (n, n²
    over a 7-row frame), so mean/var/z are bit-deterministic; z is NULL
    until a full 7-day history exists or when variance is 0. Two keyed
    shuffles total: the daily rollup, then the tiny per-type window."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    d = daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.count("*").over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("w_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("w_sum2"),
    )
    mean = F.col("w_sum").cast("double") / F.col("w_cnt").cast("double")
    var = F.col("w_sum2").cast("double") / F.col("w_cnt").cast("double") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return d.select(
        "event_type",
        "day",
        "n",
        F.when((F.col("w_cnt") == 7) & (var > 0.0), F.round(z, 4)).alias("z"),
    )


def q_top_doc_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax WITHOUT a window: the longest document per source
    via a lexicographic struct MAX — a single hash aggregation with
    map-side combine (no sort, no row_number shuffle-the-world), the
    right argmax shape at scale. Ties break on doc_id via the struct
    order."""
    docs = load(spark, sf_dir, "documents")
    top = docs.groupBy("source").agg(
        F.max(F.struct("n_chars", "doc_id")).alias("top")
    )
    return top.select(
        "source",
        F.col("top.doc_id").alias("doc_id"),
        F.col("top.n_chars").alias("n_chars"),
    )


def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window-function family in one pass: dense_rank,
    percent_rank, cume_dist, LEAD, and FIRST_VALUE over suppliers ranked
    by balance within nation — all sharing ONE (partition, order) spec so
    Catalyst evaluates them in a single Window operator after a single
    shuffle. percent_rank/cume_dist are exact small-integer ratios
    (deterministic in FP); ties cannot occur because the order key is
    unique (acctbal, suppkey)."""
    supplier = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return supplier.select(
        "s_nationkey",
        "s_suppkey",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.lead("s_suppkey").over(w).alias("next_suppkey"),
        F.first("s_suppkey").over(w).alias("richest_suppkey"),
    )


MAD_K = 3.0
VALUE_BUCKETS = 10


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier accounting per event_type: median via
    the exact percentile aggregate, MAD as the median absolute deviation,
    outliers = |value - med| > MAD_K * mad. Three keyed passes over the
    events scan, each a 5-group aggregate with the tiny result broadcast
    back — no global sort, no window; the robust twin of q_anomaly_days'
    z-score. med/mad are continuous quantile values (never decimal
    midpoints), so round(4) is formatting only."""
    events = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.count("*").cast("bigint").alias("n"),
            F.sum((F.col("adev") > F.lit(MAD_K) * F.col("mad")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def q_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event value per type: bucket bounds from a
    tiny per-type min/max aggregate broadcast back over the scan,
    bucket = clamp(floor(B * (v - min) / (max - min)), 0, B-1). Two scans
    + one keyed agg whose cardinality is types x buckets — the
    standard distributed-histogram shape (floor of a double is exact, so
    the bucket ids are engine-portable)."""
    events = load(spark, sf_dir, "events")
    rng = events.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bucketed = events.join(F.broadcast(rng), "event_type").withColumn(
        "bucket",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(VALUE_BUCKETS - 1),
                F.floor(
                    F.lit(float(VALUE_BUCKETS))
                    * (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                ),
            )
        ).cast("bigint"),
    )
    return bucketed.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )


EWMA_ALPHA = 0.5  # dyadic: every pow() below is then EXACT in both libms


def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of the per-(type, day) event counts (alpha = 0.5,
    adjust=True — pandas ewm semantics): the recursive filter rewritten
    into the closed form
        ewma_n = (1-a)^n * sum_i x_i (1-a)^(-i)  /  sum_{j<=n} (1-a)^j
    so it becomes ONE running-window sum over a precomputed per-row term
    — no recursion, no UDF, same shuffle as the daily rollup. The
    (1-a)^(-i) growth bounds the usable window (~50 rows at alpha=0.5 in
    double precision; segment-renormalize beyond that) — fine for the
    bounded per-type daily series this smooths.

    Cross-engine hazard, measured: with alpha=0.25 the two engines'
    libm pow() differ by 1 ulp on some (0.75, n) inputs (JVM StrictMath
    vs C libm — pow is not correctly-rounded), which flipped round(4) at
    decimal boundaries. alpha=0.5 makes every pow argument/result a
    power of two — exact in any libm — so the whole pipeline is
    bit-deterministic again."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = daily.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "g", F.expr(f"n * pow(1.0 / (1.0 - {EWMA_ALPHA!r}), rn)")
    )
    return d.withColumn("s", F.sum("g").over(run)).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.expr(
                f"s * pow(1.0 - {EWMA_ALPHA!r}, rn)"
                f" / ((1.0 - pow(1.0 - {EWMA_ALPHA!r}, rn + 1)) / {EWMA_ALPHA!r})"
            ),
            4,
        ).alias("ewma"),
    )


def q_percent_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per order status: monthly rollup,
    LAG window for the prior month, delta in exact basis points
    ((cur - prev) * 10000 DIV prev — integer, so no float-quotient
    rounding can wobble the hash). NULL-free: the first month emits 0.
    One keyed shuffle for the rollup; the window runs over months-per-
    status (bounded)."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        # round-then-cast, never bare cast: the float sum sits within
        # ~1e-3 of the exact integer cents total, so round() lands on it
        # from either side while truncation would flip on the low bit
        F.round(F.sum("o_totalprice") * 100, 0).cast("bigint").alias("rev_cents")
    )
    w = Window.partitionBy("o_orderstatus").orderBy("month")
    d = monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return d.select(
        "o_orderstatus",
        "month",
        "rev_cents",
        F.coalesce(
            F.expr("(rev_cents - prev_cents) * 10000 DIV prev_cents"), F.lit(0)
        )
        .cast("bigint")
        .alias("mom_bp"),
    )


QUERIES = {
    "q_order_gaps": q_order_gaps,
    "q_rank_functions": q_rank_functions,
    "q_rolling_hour": q_rolling_hour,
    "q_anomaly_days": q_anomaly_days,
    "q_top_doc_per_source": q_top_doc_per_source,
    "q_running_total": q_running_total,
    "q_percentiles": q_percentiles,
    "q_approx_quantiles": q_approx_quantiles,
    "q_winsorize": q_winsorize,
    "q_gap_fill": q_gap_fill,
    "q_corr_stats": q_corr_stats,
    "q_mad_outliers": q_mad_outliers,
    "q_value_buckets": q_value_buckets,
    "q_ewma_daily": q_ewma_daily,
    "q_percent_change": q_percent_change,
}

ORACLES = {
    "q_gap_fill": """
        WITH hourly AS (
          SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), span AS (
          SELECT date_trunc('hour', CAST(MIN(ts) AS TIMESTAMP)) AS lo,
                 date_trunc('hour', CAST(MAX(ts) AS TIMESTAMP)) AS hi
          FROM events
        ), spine AS (
          SELECT t.event_type,
                 unnest(generate_series(s.lo, s.hi, INTERVAL 1 HOUR)) AS hour
          FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN span s
        ), filled AS (
          SELECT sp.event_type, sp.hour, h.n
          FROM spine sp LEFT JOIN hourly h
            ON sp.event_type = h.event_type AND sp.hour = h.hour
        )
        SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
               CAST(COALESCE(last_value(n IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS BIGINT) AS n_filled,
               n IS NULL AS was_gap
        FROM filled
    """,
    "q_winsorize": """
        WITH b AS (
          SELECT o_orderpriority,
                 quantile_cont(o_totalprice, 0.01) AS lo,
                 quantile_cont(o_totalprice, 0.99) AS hi
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_low,
               CAST(SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_high,
               ROUND(MIN(b.lo), 4) AS p01,
               ROUND(MIN(b.hi), 4) AS p99
        FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
        GROUP BY o.o_orderpriority
    """,
    "q_approx_quantiles": """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
               CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS within_rank_bound
        FROM orders GROUP BY o_orderpriority
    """,
    "q_percent_change": """
        WITH monthly AS (
          SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS month,
                 CAST(round(SUM(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
          FROM orders GROUP BY 1, 2
        ), d AS (
          SELECT o_orderstatus, month, rev_cents,
                 LAG(rev_cents) OVER (PARTITION BY o_orderstatus
                                      ORDER BY month) AS prev_cents
          FROM monthly
        )
        SELECT o_orderstatus, month, rev_cents,
               CAST(COALESCE((rev_cents - prev_cents) * 10000 // prev_cents, 0)
                    AS BIGINT) AS mom_bp
        FROM d
    """,
    "q_ewma_daily": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), d AS (
          SELECT event_type, day, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1
                   AS rn
          FROM daily
        ), g AS (
          SELECT event_type, day, n, rn,
                 n * pow(1.0 / (1.0 - {EWMA_ALPHA!r}), rn) AS g
          FROM d
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               CAST(n AS BIGINT) AS n,
               ROUND(SUM(g) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
                     * pow(1.0 - {EWMA_ALPHA!r}, rn)
                     / ((1.0 - pow(1.0 - {EWMA_ALPHA!r}, rn + 1))
                        / {EWMA_ALPHA!r}), 4) AS ewma
        FROM g
    """,
    "q_mad_outliers": f"""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type
        ), dev AS (
          SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
          FROM events e JOIN med m USING (event_type)
        ), mad AS (
          SELECT event_type, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               round(any_value(d.med), 4) AS med,
               round(any_value(ma.mad), 4) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN d.adev > {MAD_K!r} * ma.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d JOIN mad ma USING (event_type)
        GROUP BY d.event_type
    """,
    "q_value_buckets": f"""
        WITH rng AS (
          SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(CASE WHEN r.hi = r.lo THEN 0
                    ELSE least({VALUE_BUCKETS - 1},
                               floor({float(VALUE_BUCKETS)!r} * (e.value - r.lo)
                                     / (r.hi - r.lo)))
                    END AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events e JOIN rng r USING (event_type)
        GROUP BY 1, 2
    """,
    "q_rank_functions": """
        SELECT s_nationkey, s_suppkey,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
               ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume,
               LEAD(s_suppkey) OVER w AS next_suppkey,
               FIRST_VALUE(s_suppkey) OVER w AS richest_suppkey
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    "q_rolling_hour": """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               ROUND(SUM(value) OVER w, 4) AS sum_1h
        FROM (SELECT event_id, user_id, value,
                     epoch_us(ts) // 1000000 AS sec
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    "q_anomaly_days": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), d AS (
          SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
                 COUNT(*) OVER w AS w_cnt,
                 SUM(n) OVER w AS w_sum,
                 SUM(n * n) OVER w AS w_sum2
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, day, n,
               CASE WHEN w_cnt = 7 AND
                         (CAST(w_sum2 AS DOUBLE) / CAST(w_cnt AS DOUBLE)
                          - (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
                            * (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))) > 0.0
               THEN ROUND((CAST(n AS DOUBLE)
                           - CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
                          / sqrt(CAST(w_sum2 AS DOUBLE) / CAST(w_cnt AS DOUBLE)
                                 - (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))
                                   * (CAST(w_sum AS DOUBLE) / CAST(w_cnt AS DOUBLE))), 4)
               END AS z
        FROM d
    """,
    "q_top_doc_per_source": """
        SELECT source, doc_id, n_chars
        FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id DESC) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "q_running_total": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_spend,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS trail3_spend,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail3_n
        FROM orders
    """,
    "q_order_gaps": """
        WITH g AS (
          SELECT o_custkey,
                 date_diff('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap_days
          FROM orders
        )
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(COALESCE(SUM(gap_days), 0) AS BIGINT) AS sum_gap_days,
               CAST(COALESCE(MAX(gap_days), 0) AS BIGINT) AS max_gap_days
        FROM g GROUP BY o_custkey
    """,
    "q_percentiles": """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
    """,
    "q_corr_stats": """
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
               ROUND(MIN(l_extendedprice), 4) AS min_price,
               ROUND(MAX(l_extendedprice), 4) AS max_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
}
