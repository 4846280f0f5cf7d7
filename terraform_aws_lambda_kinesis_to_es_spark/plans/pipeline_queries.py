"""Pipeline-operations query surface: the table-maintenance / ingest-ops
companions a 100 TB training-data pipeline runs around the analytics
queries — column profiling, hot-key detection, salted aggregation, CDC
compaction, deterministic sampling, shard assignment, rate limiting and
file-compaction planning.

The reference pipeline (lambda/main.py:117-160) trusts its input shape and
pushes records through unprofiled; at corpus scale every one of these ops
becomes a standing job. All queries follow the house determinism rules
(text_queries.py header): integer basis points for ratios, md5-derived
hashing (functions/hashing.py) for anything pseudo-random, no
partition-order-dependent float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60, hash60_sql
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

# q_profile_columns: only types whose string rendering is bit-identical in
# Spark and DuckDB (bigint, varchar, ISO date). Doubles are excluded on
# purpose — float-to-string formatting differs across engines.
PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate")
TOP_KEYS = 10
SALT_BUCKETS = 16
SAMPLE_PER_GROUP = 20
N_SHARDS = 32
RATE_LIMIT_PER_HOUR = 5
COMPACTION_TARGET_CHARS = 4000


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over ``orders``: null count, distinct count and
    min/max (as strings) per column, in long form. ONE scan computes every
    per-column aggregate in a single global agg row (partial aggregation
    map-side, a single-row exchange), then a stack() unpivots driver-side
    metadata — at 100 TB this is exactly the ANALYZE-style shape you want:
    no per-column rescans, no shuffle wider than one row."""
    orders = load(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__nn"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("string")).alias(f"{c}__mx"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_null, n_distinct, min_s, max_s)"
        )
    )


APPROX_ND_RSD = 0.02
APPROX_ND_TOL_BP = 1000  # 10% — 5x the configured rsd; deterministic in practice


def profile_columns_approx_agg(orders: DataFrame) -> DataFrame:
    """The pure sketch profile: null counts + HLL++ distinct estimates for
    every profiled column in ONE pass with NO Expand — multiple
    approx_count_distinct aggregates accumulate as independent mergeable
    sketch states, so the scan is never replicated per distinct aggregate
    (plan pinned in tests/test_plan_shape.py). This is the 100 TB shape:
    the exact profile (q_profile_columns) plans one Expand that multiplies
    scanned rows by the number of distinct aggregates."""
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__nn"),
            F.approx_count_distinct(c, APPROX_ND_RSD).alias(f"{c}__ad"),
        ]
    return orders.agg(*aggs)


def q_profile_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based twin of q_profile_columns: distinct counts via
    approx_count_distinct (HLL++), Expand-free (see
    :func:`profile_columns_approx_agg`). Sketch estimates are
    engine-specific, so per the house q_approx_distinct pattern the emitted
    columns are the EXACT values plus a boolean contract asserting each
    estimate landed within APPROX_ND_TOL_BP basis points of exact
    (uniformly TRUE for the oracle). The exact leg exists only to express
    the contract; the scale artifact is the approx leg's plan, and the
    exact-vs-approx cost gap is measured at scale in PERF.md."""
    orders = load(spark, sf_dir, "orders")
    approx = profile_columns_approx_agg(orders)
    exact = orders.agg(
        *[
            F.countDistinct(c).cast("bigint").alias(f"{c}__nd")
            for c in PROFILE_COLS
        ]
    )
    wide = approx.join(F.broadcast(exact))  # 1-row x 1-row
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, "
        f"10000 * abs({c}__ad - {c}__nd) <= {APPROX_ND_TOL_BP} * {c}__nd"
        for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_null, n_distinct, approx_within_tol)"
        )
    )


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detector: the TOP_KEYS most frequent join/aggregation keys
    (o_custkey) with their exact share in basis points. This is the
    pre-flight that decides whether operators/skew.py salting is needed.
    Shape: one keyed partial-agg shuffle, a single-row total broadcast,
    and a TakeOrdered top-k (never a global sort). Ties broken by key so
    the emitted row set is deterministic."""
    orders = load(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    total = per_key.agg(F.sum("n_orders").alias("tot"))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k
    # then a TOP_KEYS-row merge) — never a global sort; the rank window
    # then runs over TOP_KEYS rows only.
    top = per_key.orderBy(F.desc("n_orders"), F.asc("o_custkey")).limit(TOP_KEYS)
    ranked = top.join(F.broadcast(total)).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n_orders"), F.asc("o_custkey"))),
    )
    return ranked.select(
        "rank",
        "o_custkey",
        "n_orders",
        F.expr("(10000 * n_orders) DIV tot").cast("bigint").alias("share_bp"),
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: groupBy(key, salt) then re-aggregate
    by key alone. Output-identical to the plain groupBy (the oracle IS the
    plain groupBy) — the point is the shape: when one key carries a
    disproportionate share of a 100 TB table, the salt splits its partial
    aggregation across SALT_BUCKETS reducers and the second stage combines
    SALT_BUCKETS tiny rows per key. Only count/sum-style decomposable
    aggregates survive this rewrite; both stages stay map-side-combinable."""
    events = load(spark, sf_dir, "events")
    salted = events.withColumn("salt", F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("event_id").alias("ps")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("ps").cast("bigint").alias("sum_event_id"),
    )


def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / upsert compaction: collapse an append-only change stream to
    the latest record per (user_id, event_type) key — row_number over the
    event-time order, ties broken by event_id so replays are idempotent.
    One shuffle on the compaction key; at 100 TB this is the standing
    dedup-on-read view a log-structured ingest needs before serving."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size-per-group sample: rank documents inside
    each language by md5(doc_id) and keep SAMPLE_PER_GROUP. Equivalent in
    distribution to a per-group reservoir but reproducible across engines
    and runs (the md5 rank is the 'random' coin — functions/hashing.py
    rules). One shuffle on lang; the window never sees more than one
    group's rows per partition."""
    docs = load(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
        )
    )
    return (
        docs.withColumn("rk", rk)
        .filter(F.col("rk") <= SAMPLE_PER_GROUP)
        .select("doc_id", "lang", "rk")
    )


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash shard assignment + balance audit: route every doc
    to one of N_SHARDS writers via the engine-portable 60-bit md5 hash,
    then report per-shard row/char totals. The rollup is the writer-skew
    check run before any fan-out to N_SHARDS output files/streams; the
    hash is the same one the ES sink uses for its deterministic actions.
    Map-only assignment + one tiny keyed agg."""
    docs = load(spark, sf_dir, "documents")
    assigned = docs.withColumn(
        "shard", (hash60(F.col("doc_id").cast("string")) % N_SHARDS).cast("int")
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key throttling: keep the first RATE_LIMIT_PER_HOUR events per
    (user, hour) in arrival order (ts, then event_id), report per-user
    total vs kept. The batch twin of streaming/stateful.py's
    quota_per_key stateful processor (same keep-first-N-per-key
    semantics; the hourly window is the batch refinement of its
    unbounded quota). One shuffle on user_id serves both the window and
    the final per-user rollup."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    flagged = events.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum((F.col("rn") <= RATE_LIMIT_PER_HOUR).cast("bigint"))
        .cast("bigint")
        .alias("n_kept"),
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: roll sources up to (n_docs,
    sum_chars), then first-fit them in source order into bins of
    COMPACTION_TARGET_CHARS via a running cumulative sum. The global
    window runs over the SOURCE rollup (one row per source — bounded,
    tiny), never over documents, so the single-partition window is safe at
    any corpus size; the doc-level work is one keyed partial agg."""
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    return per_source.withColumn(
        "cum_before", F.coalesce(F.sum("sum_chars").over(w), F.lit(0))
    ).select(
        "source",
        "n_docs",
        "sum_chars",
        F.expr(f"cum_before DIV {COMPACTION_TARGET_CHARS}")
        .cast("bigint")
        .alias("bin"),
    )


def q_dead_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification / liveness monitoring: (event_type, hour)
    cells with ZERO events across the stream's observed span. The hour
    spine is generated from a single min/max aggregate (sequence explode
    of a tiny single-row frame x the distinct type set), then an anti-join
    against observed hours — the missing-data report an ingest pipeline
    alerts on. The spine is bounded by the time span, never the event
    count, so the anti-join's build side stays small at any volume."""
    events = load(spark, sf_dir, "events")
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = events.select("event_type").distinct()
    spine = (
        types.join(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    observed = events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).distinct()
    return spine.join(observed, ["event_type", "hour"], "left_anti")


def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over the semi-structured props column: per JSON
    key, presence count, how many values parse as integers, distinct
    value count, and the integer min/max. explode(map_keys) + one keyed
    agg whose cardinality is the KEY vocabulary — the schema-on-read
    profiling pass run before hardening a props contract (the reference
    trusts its JSON shape blindly, main.py:91)."""
    events = load(spark, sf_dir, "events")
    kv = events.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("k", "v")
    )
    vi = F.col("v").cast("bigint")
    return kv.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(vi.isNotNull().cast("bigint")).cast("bigint").alias("n_int"),
        F.countDistinct("v").cast("bigint").alias("n_distinct_vals"),
        F.min(vi).alias("min_int"),
        F.max(vi).alias("max_int"),
    )


def q_cohort_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over orders: customers grouped by first-order
    month, distinct active customers per (cohort_month, months_since).
    Month arithmetic on exact integer year*12+month — no float date math.
    One shuffle keyed by customer (first-order window == min aggregate),
    then a cells-sized rollup."""
    orders = load(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
    )
    first = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        om.join(first, "o_custkey")
        .select(
            "o_custkey",
            F.format_string(
                "%04d-%02d", F.expr("m0 DIV 12"), F.expr("m0 % 12 + 1")
            ).alias("cohort_month"),
            (F.col("m") - F.col("m0")).cast("bigint").alias("months_since"),
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("n_active"))
    )


def q_doc_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source manifest: row count, char total and a deterministic
    5-id sample (sorted-prefix, emitted as a CSV string so the value is
    engine-portable). collect_list stays bounded per group only because
    the sample slice is taken AFTER an array_sort of the group's ids —
    at true scale the same manifest uses the q_reservoir_sample md5-rank
    pattern instead; this variant is the small-group (metadata) shape."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_list("doc_id")), 1, 5)
        ).alias("id_sample"),
    )


def q_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit: per user, how many events arrived (by
    event_id sequence — the arrival proxy) with an event time EARLIER
    than the previous arrival's. This measures exactly the late-data
    rate that sizes streaming watermarks (SURVEY.md T5: the reference
    accepts late data forever; this query tells you how much there is).
    One user-keyed shuffle serves the lag window and the rollup."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = events.withColumn("prev_ts", F.lag("ts").over(w))
    # coalesce(0): a single-event user has only a NULL comparison — emit
    # 0, not NULL (same null-free-output rule as q_order_gaps)
    return lagged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.coalesce(
            F.sum((F.col("ts") < F.col("prev_ts")).cast("bigint")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_out_of_order"),
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution: per user, the first and last event
    type by event time. The ordering key is a fixed-width string
    (zero-padded micros, then event_id) so ties are broken
    deterministically and min_by/max_by stay engine-portable (DuckDB
    arg_min has no composite-key overload). Pure min_by/max_by
    aggregation — partial-aggregable, one shuffle, NO window sort: the
    aggregate form beats row_number-then-filter at scale because it
    never materializes per-row ranks."""
    events = load(spark, sf_dir, "events")
    ord_key = F.concat_ws(
        "_",
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    ).alias("ord_key")
    e = events.select("user_id", "event_type", ord_key)
    return e.groupBy("user_id").agg(
        F.expr("min_by(event_type, ord_key)").alias("first_type"),
        F.expr("max_by(event_type, ord_key)").alias("last_type"),
        F.count("*").cast("bigint").alias("n_events"),
    )


N_CAMPAIGNS = 20
CAMPAIGN_LEN_H = 6
CAMPAIGN_STRIDE_H = 37


def q_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (theta) join rewritten as an equi-join on hour buckets —
    THE scale technique for point-in-interval joins: a naive
    ``ts BETWEEN start AND end`` join is a nested-loop product, but
    exploding each interval into its covered hour buckets (bounded by
    interval length) turns it into a hash join on the bucket, with the
    exact range predicate re-applied as a post-filter. Campaign windows
    are derived deterministically from the stream's own span (tiny
    single-row aggregate x range), so the query is self-contained.
    Output: per campaign, event count + distinct users."""
    events = load(spark, sf_dir, "events")
    span = events.agg(F.date_trunc("hour", F.min("ts")).alias("lo"))
    campaigns = (
        spark.range(N_CAMPAIGNS)
        .withColumnRenamed("id", "campaign_id")
        .join(F.broadcast(span))
        .select(
            "campaign_id",
            F.expr(
                f"lo + INTERVAL '1' HOUR * ({CAMPAIGN_STRIDE_H} * campaign_id)"
            ).alias("start"),
            F.expr(
                f"lo + INTERVAL '1' HOUR * ({CAMPAIGN_STRIDE_H} * campaign_id"
                f" + {CAMPAIGN_LEN_H})"
            ).alias("end"),
        )
    )
    buckets = campaigns.select(
        "campaign_id",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.col("start"),
                F.expr("end - INTERVAL '1' HOUR"),
                F.expr("INTERVAL '1' HOUR"),
            )
        ).alias("hour"),
    )
    binned = events.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    joined = binned.join(F.broadcast(buckets), "hour").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    return joined.groupBy("campaign_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def q_data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type freshness / lag monitor: latest event time per type and
    how many whole minutes it trails the stream's global high-water mark
    (exact integer micros arithmetic). The first dashboard row any
    ingest pipeline needs; one keyed agg + a single-row broadcast."""
    events = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    hwm = per_type.agg(F.max("latest_ts").alias("hwm"))
    return per_type.join(F.broadcast(hwm)).select(
        "event_type",
        "latest_ts",
        F.expr("(unix_micros(hwm) - unix_micros(latest_ts)) DIV 60000000")
        .cast("bigint")
        .alias("lag_minutes"),
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew-join end-to-end: events (the skewed fact) joined to a
    tiny per-user dimension through operators/skew.py:salted_join — the
    big side salted by rand(seed), the dim replicated across all salts,
    equi-join on (key, salt). The oracle is the PLAIN join: results are
    salt-independent by construction, and the driver equality proves it
    on real data (the pytest suite proves it on synthetic hot keys).
    This is the manual fallback for joins AQE's skew splitting cannot
    reach (hash-agg buildups, broadcast-ineligible dims)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import skew as SK

    events = load(spark, sf_dir, "events")
    dim = events.groupBy("user_id").agg(
        F.expr("min_by(event_type, event_id)").alias("first_type")
    )
    joined = SK.salted_join(events.select("user_id", "event_id"), dim, "user_id")
    return joined.groupBy("first_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
    )


TREND_MIN_PREV = 5
TREND_TOP = 20


def q_trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year demand movers: per part, lineitem count in the
    latest ship-year vs the year before, exact growth in basis points,
    top TREND_TOP gainers among parts with a minimum prior-year volume
    (guards the ratio against tiny denominators). Conditional aggregation
    against a broadcast latest-year row, then TakeOrdered — the standard
    'trending entities' report at any scale."""
    li = load(spark, sf_dir, "lineitem")
    yr = li.select("l_partkey", F.year("l_shipdate").alias("y"))
    latest = yr.agg(F.max("y").alias("ymax"))
    counts = (
        yr.join(F.broadcast(latest))
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("y") == F.col("ymax")).cast("bigint")).alias("n_cur"),
            F.sum((F.col("y") == F.col("ymax") - 1).cast("bigint")).alias("n_prev"),
        )
    )
    scored = counts.filter(F.col("n_prev") >= TREND_MIN_PREV).select(
        "l_partkey",
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.col("n_prev").cast("bigint").alias("n_prev"),
        F.expr("(n_cur - n_prev) * 10000 DIV n_prev").cast("bigint").alias("growth_bp"),
    )
    return scored.orderBy(F.desc("growth_bp"), F.asc("l_partkey")).limit(TREND_TOP)


ZORDER_BITS = 8
ZORDER_RANGE = 1024  # z-values per layout range (file/row-group analog)


def _morton(x: str, y: str, div: str) -> str:
    """Bit-interleaved (Morton / Z-order) key over two ZORDER_BITS-bit
    dims, written as pure nonneg integer arithmetic (DIV/%/*) so the SAME
    formula evaluates bit-identically in Spark (`DIV`) and DuckDB (`//`)
    — no engine-specific bit operators."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit: interleave the bits of two query
    dimensions — user bucket and event day — into one clustering key,
    then summarize each ZORDER_RANGE-wide key range with its row count
    and per-dimension bounding box. Sorting files by this key is how a
    lakehouse gets multi-dimensional data skipping (small per-file
    min/max boxes on BOTH dims) from a one-dimensional sort order; the
    emitted bounding boxes ARE the skipping metadata. Map-only key
    computation plus one keyed aggregation — at 100 TB this is the
    repartitionByRange planning pass before a rewrite."""
    events = load(spark, sf_dir, "events")
    d = events.select(
        F.expr("user_id % 256").cast("bigint").alias("x"),
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') % 256"
        ).cast("bigint").alias("y"),
    )
    z = d.withColumn("z", F.expr(_morton("x", "y", "DIV")))
    return (
        z.withColumn("zrange", F.expr(f"z DIV {ZORDER_RANGE}").cast("bigint"))
        .groupBy("zrange")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


def _integrity_leg(
    child: DataFrame, ckey: str, parent: DataFrame, pkey: str, label: str
) -> DataFrame:
    """One referential-integrity audit leg: child rows keyed by ``ckey``
    against parent keys ``pkey``. Child rows are pre-aggregated to one row
    per key BEFORE the join (the map-side shrink that makes this survive a
    100 TB fact table), then a single full-outer key join yields orphan
    rows (child key absent from parent) and childless parents in one pass.
    No broadcast hint: both sides can be SF-proportional, AQE picks the
    strategy."""
    ck = child.groupBy(F.col(ckey).alias("k")).agg(F.count("*").alias("n_rows"))
    pk = parent.select(F.col(pkey).alias("k")).distinct().withColumn(
        "is_parent", F.lit(1)
    )
    j = ck.join(pk, "k", "full_outer")
    return j.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_child_rows"),
        F.coalesce(
            F.sum(F.when(F.col("is_parent").isNull(), F.col("n_rows"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_orphan_rows"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_rows").isNull() & F.col("is_parent").isNotNull(), 1
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_childless_parents"),
    ).select(F.lit(label).alias("relation"), "*")


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Great-Expectations-style
    contract a pipeline evaluates after every load): not-null, accepted
    values, range, and key-uniqueness checks over ``orders``, each emitted
    as (expectation, n_checked, n_failed, pass). All row-level checks fold
    into ONE full scan via conditional sums (map-side partial agg, a
    single-row exchange); the uniqueness check is the only keyed
    aggregation, and its failure count is exact (rows beyond the first
    per key). At 100 TB this is one pass over the table, not one pass per
    expectation."""
    orders = load(spark, sf_dir, "orders")
    checks = {
        "o_orderkey_not_null": F.col("o_orderkey").isNull(),
        "o_custkey_not_null": F.col("o_custkey").isNull(),
        "o_totalprice_positive": ~(F.col("o_totalprice") > 0),
        "o_orderstatus_in_set": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "o_orderdate_in_range": ~F.col("o_orderdate").between(
            "1990-01-01", "2099-12-31"
        ),
    }
    row_level = orders.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in checks.items()
        ],
    )
    rows = row_level.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("expectation"),
                        F.col("n").cast("bigint").alias("n_checked"),
                        F.col(name).cast("bigint").alias("n_failed"),
                    )
                    for name in checks
                ]
            )
        ).alias("e")
    ).select("e.*")
    uniq = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.lit("o_orderkey_unique").alias("expectation"),
            F.sum("c").cast("bigint").alias("n_checked"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_failed"),
        )
    )
    return rows.unionByName(uniq).withColumn(
        "pass", F.col("n_failed") == 0
    )


DRIFT_BUCKET = 10


def q_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (population-stability-index shape) over
    the numeric payload field props.k: bucket the value, compare each
    bucket's share (bp) between an "old" and a "new" half of the stream
    (deterministic event_id parity split), and report the per-bucket
    shift — the monitor that catches a producer silently changing a
    field's distribution before a downstream model degrades. One scan +
    one bounded keyed agg; output rows = bucket count."""
    events = load(spark, sf_dir, "events")
    b = events.select(
        (F.col("event_id") % 2 == 0).alias("is_old"),
        F.expr(
            f"CAST(get_json_object(props, '$.k') AS BIGINT) DIV {DRIFT_BUCKET}"
        ).alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    tot = b.agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("n_new"),
    )
    per_bucket = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("c_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("c_new"),
    )
    return per_bucket.join(F.broadcast(tot)).select(
        "bucket",
        F.expr("(10000 * c_old) DIV n_old").cast("bigint").alias("old_bp"),
        F.expr("(10000 * c_new) DIV n_new").cast("bigint").alias("new_bp"),
        F.expr("(10000 * c_new) DIV n_new - (10000 * c_old) DIV n_old")
        .cast("bigint")
        .alias("shift_bp"),
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit on order values: observed share of each
    leading digit in basis points next to the Benford expectation
    (round(log10(1+1/d), 4)) — the classic synthetic-data / fraud smoke
    test a pipeline runs over money-like columns. Map-only digit
    extraction + one 9-row aggregation."""
    orders = load(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    ).filter(F.col("digit").between(1, 9))
    tot = d.agg(F.count("*").alias("n"))
    per = d.groupBy("digit").agg(F.count("*").alias("c"))
    return per.join(F.broadcast(tot)).select(
        "digit",
        F.col("c").cast("bigint").alias("n_orders"),
        F.expr("(10000 * c) DIV n").cast("bigint").alias("observed_bp"),
        F.round(F.log10(1 + 1 / F.col("digit")), 4).alias("benford_expected"),
    )


RETRY_MOD = 211


def q_duplicate_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-retry audit: byte-identical event payloads — same (type,
    user, event-time, props) — arriving under DIFFERENT event ids, the
    signature of producer retries that log_id-keyed dedup (P7) cannot
    see. Per type: duplicated payload groups and the surplus rows a
    payload-keyed dedup would drop. One digest hash-groupBy (the exact
    dedup shape) + a bounded per-type rollup.

    The driver fixture ships no retries, so (q_pii_redact's trick) a
    deterministic retry storm is INJECTED in-query — every
    event_id % RETRY_MOD == 0 row arrives twice — and the oracle mirrors
    the injection, so the duplicate-detection branch is driver-exercised,
    not just covered by the zero case."""
    base = load(spark, sf_dir, "events")
    events = base.unionByName(
        base.filter(F.col("event_id") % RETRY_MOD == 0)
    )
    # event time enters the digest as epoch micros (integer strings render
    # identically in both engines; timestamp-to-string formatting does not).
    # Every field is coalesced to an explicit NULL sentinel: concat_ws would
    # silently DROP a NULL field and its separator (DuckDB's || would
    # instead null the whole digest) — both a cross-engine divergence and a
    # collision hazard (rows differing only in NULL-vs-absent hashing alike).
    def _d(col):  # digest field: NULL -> sentinel, explicitly
        return F.coalesce(col, F.lit("\x00"))

    digest = F.md5(
        F.concat_ws(
            "\x1f",
            _d(F.col("event_type")),
            _d(F.col("user_id").cast("string")),
            _d(F.unix_micros(F.col("ts")).cast("string")),
            _d(F.col("props")),
        )
    )
    groups = events.select(
        "event_type", digest.alias("h")
    ).groupBy("event_type", "h").agg(F.count("*").alias("c"))
    return groups.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_payloads"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_groups"),
        F.sum(F.col("c") - 1).cast("bigint").alias("n_surplus_rows"),
    )


FD_PAIRS = (
    ("o_orderkey", "o_custkey"),       # holds: orderkey is the PK
    ("o_custkey", "o_orderpriority"),  # violated: customers use many priorities
    ("o_orderstatus", "o_orderpriority"),  # violated: status doesn't fix priority
)


def q_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (profiling family, next to
    q_profile_columns / q_json_schema_infer): for each candidate
    determinant -> dependent pair, the determinant-key count, how many
    keys map to MORE than one dependent value (violations), and whether
    the FD holds — the check that finds denormalization opportunities and
    broken natural keys before they break a join. Per pair: one keyed
    distinct-count aggregation reduced to a single row; output rows =
    candidate pairs."""
    orders = load(spark, sf_dir, "orders")
    legs = []
    for det, dep in FD_PAIRS:
        g = orders.groupBy(det).agg(F.count_distinct(dep).alias("nd"))
        legs.append(
            g.agg(
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_keys"),
            ).select(
                F.lit(f"{det}->{dep}").alias("fd"),
                "n_keys",
                "n_violating_keys",
                (F.col("n_violating_keys") == 0).alias("holds"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


FORGET_MOD = 97


def q_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report: given a deterministic deletion
    request set (user_id % FORGET_MOD == 0 stands in for the request
    table; in production it arrives as a small broadcast relation), the
    per-type row/byte/user counts that a purge would remove versus retain
    — the audit run BEFORE executing a GDPR delete, and the same
    partition-pruned anti-join shape that executes it. One scan, one
    bounded keyed agg."""
    events = load(spark, sf_dir, "events")
    flagged = events.select(
        "event_type",
        "user_id",
        F.length("props").alias("bytes"),
        (F.col("user_id") % FORGET_MOD == 0).alias("purge"),
    )
    return flagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("purge"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_purged"),
        F.sum(F.when(~F.col("purge"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when(F.col("purge"), F.col("bytes")).otherwise(0))
        .cast("bigint")
        .alias("bytes_purged"),
        F.count_distinct(F.when(F.col("purge"), F.col("user_id")))
        .cast("bigint")
        .alias("users_purged"),
    )


def q_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the fact/dimension graph: per
    foreign-key relation, total child rows, orphan child rows (FK value
    with no parent — broken ingest), and childless parents (parent never
    referenced — e.g. customers who never ordered, a real TPC-H property).
    The standing data-quality gate a pipeline runs after every load; at
    100 TB the per-leg cost is one child-side key rollup + one key join,
    never a row-level pass over the join product."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    legs = [
        _integrity_leg(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        _integrity_leg(orders, "o_custkey", customer, "c_custkey", "orders->customer"),
        _integrity_leg(lineitem, "l_partkey", part, "p_partkey", "lineitem->part"),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation (partial-state merge): the standing-rollup
    pattern where yesterday's stored per-(type, day) aggregates are merged
    with today's increment instead of recomputing from raw history. Both
    halves are reduced to mergeable states — count, byte sum, min/max
    event-time as epoch micros — then the union is re-aggregated with the
    states' merge functions (sum-of-counts, sum-of-sums, min-of-mins,
    max-of-maxs). The split is on event_id parity, which is ORTHOGONAL to
    the (event_type, day) group key, so every group's final state genuinely
    combines two partials — the merge path is exercised for every row, not
    vacuously (a day-parity split would route each group wholly to one
    half). The DuckDB oracle computes the rollup DIRECTLY from the raw
    events, so the driver's equality check proves merge == recompute — the
    algebraic property that makes incremental maintenance sound. At 100 TB
    this is the difference between scanning one day and scanning three
    years."""
    events = load(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.length("props").alias("bytes"),
        "event_id",
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n_events"),
            F.sum("bytes").alias("bytes"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
        )

    existing = partial(base.filter(F.col("event_id") % 2 == 0))
    increment = partial(base.filter(F.col("event_id") % 2 == 1))
    return (
        existing.unionByName(increment)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.min("first_us").cast("bigint").alias("first_us"),
            F.max("last_us").cast("bigint").alias("last_us"),
        )
        # dates render as strings (house rule: only types with identical
        # cross-engine string forms in the output hash)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "bytes",
            "first_us",
            "last_us",
        )
    )


ENTITY_LEV_MAX = 3
K_ANON = 5
HLL_TOL_BP = 500  # 5% — ~3x the default-precision HLL rsd, belt-and-braces


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-(type, day) HyperLogLog
    sketches (Apache DataSketches via hll_sketch_agg) UNIONED up to
    per-type distinct-user estimates — the incremental-rollup pattern
    (q_rollup_merge) applied to an approximate state. This is how a
    standing 100 TB pipeline answers "distinct users over any window"
    without rescanning raw history: daily sketch partials are tiny,
    mergeable, and associative. Like q_approx_distinct, sketch bytes are
    engine-specific, so the output carries the exact distinct count plus
    a boolean contract asserting the merged estimate landed within
    HLL_TOL_BP basis points of it (uniformly TRUE for the oracle)."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        "n_days",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            * F.lit(10000)
            <= F.lit(HLL_TOL_BP) * F.col("exact_users")
        ).alias("within_tol"),
    )


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity formation: the blocked fuzzy match pairs (q_entity_match
    semantics) closed into entity clusters via the SAME connected-
    components operator the dedup pipeline uses — each matched name gets
    an entity id (the min name-hash in its component) plus the total part
    support behind the entity. The full record-linkage arc: block ->
    verify -> cluster -> aggregate, every stage keyed and
    candidate-bounded. Oracle = recursive-CTE closure over the identical
    pair set."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.dedup import (
        connected_components,
    )

    pairs = q_entity_match(spark, sf_dir)
    edges = pairs.select(
        hash60(F.col("name_a")).alias("id_a"),
        hash60(F.col("name_b")).alias("id_b"),
    )
    labels = connected_components(edges)
    part = load(spark, sf_dir, "part")
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    named = names.withColumn("id", hash60("name")).join(
        labels.withColumnRenamed("u", "id"), "id"
    )
    return (
        named.groupBy(F.col("label").alias("entity_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_names"),
            F.sum("n_parts").cast("bigint").alias("n_parts"),
            F.min("name").alias("canonical_name"),
        )
    )


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names: candidate match pairs whose names
    are within edit distance ENTITY_LEV_MAX, found by BLOCKING on the name's
    last token (the noun) so only same-block pairs are ever compared — the
    declared contract is blocked-candidate + exact-verify, mirrored exactly
    by the oracle (same recall trade as the LSH dedup family).

    Scale shape: names are collapsed to DISTINCT values with support counts
    BEFORE the pair join (the same |distinct|-node trick as the dedup
    collapse), the self-join is keyed on the block token (never all-pairs),
    and ordering a < b emits each pair once. Levenshtein runs only on
    in-block candidates."""
    part = load(spark, sf_dir, "part")
    names = (
        part.groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = names.select(
        F.col("block"),
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
    )
    b = names.select(
        F.col("block").alias("block_b"),
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
    )
    pairs = a.join(
        b,
        (F.col("block") == F.col("block_b")) & (F.col("name_a") < F.col("name_b")),
    )
    return pairs.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("lev"),
        "n_a",
        "n_b",
    ).filter(F.col("lev") <= ENTITY_LEV_MAX)


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit on the (nation, market-segment) quasi-identifier:
    per equivalence class, its size and whether it violates k=K_ANON — the
    privacy gate run before releasing a dataset keyed on indirect
    identifiers. One grouped aggregation; the QI cardinality (25x5) bounds
    the output regardless of corpus size."""
    customer = load(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("class_size"),
        (F.count("*") < K_ANON).alias("at_risk"),
    )


QUERIES = {
    "q_profile_columns": q_profile_columns,
    "q_profile_columns_approx": q_profile_columns_approx,
    "q_zorder_layout": q_zorder_layout,
    "q_orphan_check": q_orphan_check,
    "q_rollup_merge": q_rollup_merge,
    "q_expectations": q_expectations,
    "q_value_drift": q_value_drift,
    "q_forget_users": q_forget_users,
    "q_functional_deps": q_functional_deps,
    "q_benford": q_benford,
    "q_duplicate_payloads": q_duplicate_payloads,
    "q_entity_match": q_entity_match,
    "q_entity_clusters": q_entity_clusters,
    "q_k_anonymity": q_k_anonymity,
    "q_hll_merge": q_hll_merge,
    "q_key_skew_profile": q_key_skew_profile,
    "q_salted_agg": q_salted_agg,
    "q_cdc_latest": q_cdc_latest,
    "q_reservoir_sample": q_reservoir_sample,
    "q_shard_assignment": q_shard_assignment,
    "q_rate_limit": q_rate_limit,
    "q_compaction_plan": q_compaction_plan,
    "q_dead_hours": q_dead_hours,
    "q_json_schema_infer": q_json_schema_infer,
    "q_cohort_orders": q_cohort_orders,
    "q_doc_manifest": q_doc_manifest,
    "q_out_of_order": q_out_of_order,
    "q_attribution": q_attribution,
    "q_interval_join_binned": q_interval_join_binned,
    "q_data_freshness": q_data_freshness,
    "q_salted_join": q_salted_join,
    "q_trending_parts": q_trending_parts,
}

_PROFILE_SELECTS = " UNION ALL ".join(
    f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               MIN(CAST({c} AS VARCHAR)) AS min_s,
               MAX(CAST({c} AS VARCHAR)) AS max_s
        FROM orders
    """
    for c in PROFILE_COLS
)

def _integrity_leg_sql(child: str, ckey: str, parent: str, pkey: str, label: str) -> str:
    return f"""
        SELECT '{label}' AS relation,
               CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
               CAST((SELECT COUNT(*) FROM {child} c
                     WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                       WHERE p.{pkey} = c.{ckey}))
                    AS BIGINT) AS n_orphan_rows,
               CAST((SELECT COUNT(*) FROM {parent} p
                     WHERE NOT EXISTS (SELECT 1 FROM {child} c
                                       WHERE c.{ckey} = p.{pkey}))
                    AS BIGINT) AS n_childless_parents
    """


_ENTITY_CLUSTERS_SQL = f"""
    WITH RECURSIVE names AS (
      SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
             list_extract(string_split(p_name, ' '), -1) AS block,
             {hash60_sql("p_name")} AS id
      FROM part GROUP BY p_name
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= {ENTITY_LEV_MAX}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), labels AS (
      SELECT src AS id, MIN(dst) AS label FROM reach GROUP BY src
    )
    SELECT l.label AS entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_names,
           CAST(SUM(n.n_parts) AS BIGINT) AS n_parts,
           MIN(n.name) AS canonical_name
    FROM names n JOIN labels l ON n.id = l.id
    GROUP BY l.label
"""

_EXPECT_ROW_CHECKS = {
    "o_orderkey_not_null": "o_orderkey IS NULL",
    "o_custkey_not_null": "o_custkey IS NULL",
    "o_totalprice_positive": "NOT (o_totalprice > 0)",
    "o_orderstatus_in_set": "o_orderstatus NOT IN ('O', 'F', 'P')",
    "o_orderdate_in_range":
        "NOT (o_orderdate BETWEEN '1990-01-01' AND '2099-12-31')",
}

_EXPECTATIONS_SQL = (
    "WITH r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS f_{i}"
        for i, cond in enumerate(_EXPECT_ROW_CHECKS.values())
    )
    + " FROM orders) "
    + " UNION ALL ".join(
        f"SELECT '{name}' AS expectation, n AS n_checked, "
        f"f_{i} AS n_failed, f_{i} = 0 AS pass FROM r"
        for i, name in enumerate(_EXPECT_ROW_CHECKS)
    )
    + """ UNION ALL
      SELECT 'o_orderkey_unique',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
             COUNT(*) = COUNT(DISTINCT o_orderkey)
      FROM orders
    """
)

_FD_LEG_SQL = """
    SELECT '{det}->{dep}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_keys,
           SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM orders GROUP BY {det})
"""

ORACLES = {
    "q_benford": """
        WITH d AS (
          SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders
        ), f AS (
          SELECT digit FROM d WHERE digit BETWEEN 1 AND 9
        ), tot AS (SELECT COUNT(*) AS n FROM f)
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST((10000 * COUNT(*)) // MIN(tot.n) AS BIGINT) AS observed_bp,
               ROUND(log10(1 + 1.0 / digit), 4) AS benford_expected
        FROM f CROSS JOIN tot GROUP BY digit
    """,
    "q_duplicate_payloads": f"""
        WITH aug AS (
          SELECT * FROM events
          UNION ALL
          SELECT * FROM events WHERE event_id % {RETRY_MOD} = 0
        ), g AS (
          SELECT event_type,
                 md5(COALESCE(event_type, chr(0)) || chr(31)
                     || COALESCE(CAST(user_id AS VARCHAR), chr(0)) || chr(31)
                     || COALESCE(CAST(epoch_us(CAST(ts AS TIMESTAMP))
                                      AS VARCHAR), chr(0))
                     || chr(31) || COALESCE(props, chr(0))) AS h,
                 COUNT(*) AS c
          FROM aug GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_payloads,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_groups,
               CAST(SUM(c - 1) AS BIGINT) AS n_surplus_rows
        FROM g GROUP BY event_type
    """,
    "q_functional_deps": " UNION ALL ".join(
        _FD_LEG_SQL.format(det=det, dep=dep) for det, dep in FD_PAIRS
    ),
    "q_forget_users": f"""
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % {FORGET_MOD} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purged,
               CAST(SUM(CASE WHEN user_id % {FORGET_MOD} = 0 THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN user_id % {FORGET_MOD} = 0
                             THEN length(props) ELSE 0 END)
                    AS BIGINT) AS bytes_purged,
               CAST(COUNT(DISTINCT CASE WHEN user_id % {FORGET_MOD} = 0
                                        THEN user_id END)
                    AS BIGINT) AS users_purged
        FROM events GROUP BY event_type
    """,
    "q_expectations": _EXPECTATIONS_SQL,
    "q_value_drift": f"""
        WITH b AS (
          SELECT event_id % 2 = 0 AS is_old,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // {DRIFT_BUCKET} AS bucket
          FROM events
        ), f AS (
          SELECT * FROM b WHERE bucket IS NOT NULL
        ), tot AS (
          SELECT SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS n_old,
                 SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS n_new
          FROM f
        ), per_bucket AS (
          SELECT bucket,
                 SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
                 SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS c_new
          FROM f GROUP BY bucket
        )
        SELECT bucket,
               CAST((10000 * c_old) // n_old AS BIGINT) AS old_bp,
               CAST((10000 * c_new) // n_new AS BIGINT) AS new_bp,
               CAST((10000 * c_new) // n_new - (10000 * c_old) // n_old
                    AS BIGINT) AS shift_bp
        FROM per_bucket CROSS JOIN tot
    """,
    "q_hll_merge": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               TRUE AS within_tol
        FROM events GROUP BY event_type
    """,
    "q_entity_clusters": _ENTITY_CLUSTERS_SQL,
    "q_entity_match": f"""
        WITH names AS (
          SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
                 list_extract(string_split(p_name, ' '), -1) AS block
          FROM part GROUP BY p_name
        )
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
               a.n_parts AS n_a, b.n_parts AS n_b
        FROM names a JOIN names b
          ON a.block = b.block AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= {ENTITY_LEV_MAX}
    """,
    "q_k_anonymity": f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS class_size,
               COUNT(*) < {K_ANON} AS at_risk
        FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
    "q_orphan_check": " UNION ALL ".join(
        (
            _integrity_leg_sql(
                "lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"
            ),
            _integrity_leg_sql(
                "orders", "o_custkey", "customer", "c_custkey", "orders->customer"
            ),
            _integrity_leg_sql(
                "lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"
            ),
        )
    ),
    "q_rollup_merge": """
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(length(props)) AS BIGINT) AS bytes,
               CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_us,
               CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
        FROM events GROUP BY 1, 2
    """,
    "q_zorder_layout": f"""
        WITH d AS (
          SELECT CAST(user_id % 256 AS BIGINT) AS x,
                 CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 256 AS BIGINT)
                   AS y
          FROM events
        ), z AS (
          SELECT x, y, {_morton("x", "y", "//")} AS z FROM d
        )
        SELECT CAST(z // {ZORDER_RANGE} AS BIGINT) AS zrange,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max
        FROM z GROUP BY zrange
    """,
    "q_profile_columns": _PROFILE_SELECTS,
    "q_profile_columns_approx": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               TRUE AS approx_within_tol
        FROM orders
    """
        for c in PROFILE_COLS
    ),
    "q_key_skew_profile": f"""
        WITH per_key AS (
          SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        ), tot AS (SELECT SUM(n_orders) AS t FROM per_key),
        ranked AS (
          SELECT o_custkey, n_orders,
                 ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey) AS rank
          FROM per_key
        )
        SELECT rank, o_custkey, n_orders,
               CAST((10000 * n_orders) // (SELECT t FROM tot) AS BIGINT)
                 AS share_bp
        FROM ranked WHERE rank <= {TOP_KEYS}
    """,
    "q_salted_agg": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(event_id) AS BIGINT) AS sum_event_id
        FROM events GROUP BY event_type
    """,
    "q_cdc_latest": """
        SELECT user_id, event_type, event_id AS latest_event_id,
               ts AS latest_ts, value AS latest_value
        FROM events
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
        ) = 1
    """,
    "q_reservoir_sample": f"""
        SELECT doc_id, lang, rk FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rk
          FROM documents
        ) WHERE rk <= {SAMPLE_PER_GROUP}
    """,
    "q_shard_assignment": f"""
        SELECT CAST({hash60_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS INT)
                 AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM documents GROUP BY shard
    """,
    "q_rate_limit": f"""
        WITH flagged AS (
          SELECT user_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id
                 ) AS rn
          FROM events
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN rn <= {RATE_LIMIT_PER_HOUR} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM flagged GROUP BY user_id
    """,
    "q_salted_join": """
        -- ground truth: the plain (unsalted) join the rewrite must equal
        WITH dim AS (
          SELECT user_id, arg_min(event_type, event_id) AS first_type
          FROM events GROUP BY user_id
        )
        SELECT d.first_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(e.event_id) AS BIGINT) AS sum_event_id
        FROM events e JOIN dim d USING (user_id)
        GROUP BY d.first_type
    """,
    "q_trending_parts": f"""
        WITH yr AS (
          SELECT l_partkey, year(l_shipdate) AS y FROM lineitem
        ), latest AS (SELECT MAX(y) AS ymax FROM yr),
        counts AS (
          SELECT l_partkey,
                 CAST(SUM(CASE WHEN y = (SELECT ymax FROM latest)
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
                 CAST(SUM(CASE WHEN y = (SELECT ymax FROM latest) - 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_prev
          FROM yr GROUP BY l_partkey
        )
        SELECT l_partkey, n_cur, n_prev,
               CAST((n_cur - n_prev) * 10000 // n_prev AS BIGINT) AS growth_bp
        FROM counts WHERE n_prev >= {TREND_MIN_PREV}
        ORDER BY growth_bp DESC, l_partkey ASC
        LIMIT {TREND_TOP}
    """,
    "q_data_freshness": """
        WITH per_type AS (
          SELECT event_type, MAX(ts) AS latest_ts FROM events GROUP BY 1
        ), hwm AS (SELECT MAX(latest_ts) AS hwm FROM per_type)
        SELECT event_type, latest_ts,
               CAST((epoch_us((SELECT hwm FROM hwm)) - epoch_us(latest_ts))
                    // 60000000 AS BIGINT) AS lag_minutes
        FROM per_type
    """,
    "q_interval_join_binned": f"""
        -- ground truth: the plain theta join the binned rewrite replaces
        WITH span AS (
          SELECT date_trunc('hour', MIN(ts)) AS lo FROM events
        ), campaigns AS (
          SELECT t.range AS campaign_id,
                 (SELECT lo FROM span)
                   + INTERVAL 1 HOUR * ({CAMPAIGN_STRIDE_H} * t.range) AS start,
                 (SELECT lo FROM span)
                   + INTERVAL 1 HOUR * ({CAMPAIGN_STRIDE_H} * t.range
                                        + {CAMPAIGN_LEN_H}) AS "end"
          FROM range({N_CAMPAIGNS}) t
        )
        SELECT c.campaign_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN campaigns c
          ON e.ts >= c.start AND e.ts < c."end"
        GROUP BY c.campaign_id
    """,
    "q_dead_hours": """
        WITH span AS (
          SELECT date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi
          FROM events
        ),
        spine AS (
          SELECT t.event_type, h.hour
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN (
            SELECT unnest(generate_series(
              (SELECT lo FROM span), (SELECT hi FROM span),
              INTERVAL 1 HOUR)) AS hour
          ) h
        ),
        observed AS (
          SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour
          FROM events
        )
        SELECT s.event_type, s.hour
        FROM spine s
        LEFT JOIN observed o
          ON o.event_type = s.event_type AND o.hour = s.hour
        WHERE o.event_type IS NULL
    """,
    "q_json_schema_infer": """
        WITH kv AS (
          SELECT k, json_extract_string(props, '$.' || k) AS v
          FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
        )
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN TRY_CAST(v AS BIGINT) IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_vals,
               MIN(TRY_CAST(v AS BIGINT)) AS min_int,
               MAX(TRY_CAST(v AS BIGINT)) AS max_int
        FROM kv GROUP BY k
    """,
    "q_cohort_orders": """
        WITH om AS (
          SELECT o_custkey,
                 year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
          FROM orders
        ), first AS (
          SELECT o_custkey, MIN(m) AS m0 FROM om GROUP BY o_custkey
        )
        SELECT printf('%04d-%02d', CAST(m0 // 12 AS INT),
                      CAST(m0 % 12 + 1 AS INT)) AS cohort_month,
               CAST(m - m0 AS BIGINT) AS months_since,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active
        FROM om JOIN first USING (o_custkey)
        GROUP BY 1, 2
    """,
    "q_doc_manifest": """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               array_to_string(list_sort(list(doc_id))[1:5], ',') AS id_sample
        FROM documents GROUP BY source
    """,
    "q_out_of_order": """
        WITH lagged AS (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS prev_ts
          FROM events
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_out_of_order
        FROM lagged GROUP BY user_id
    """,
    "q_attribution": """
        WITH e AS (
          SELECT user_id, event_type,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '_' ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
          FROM events
        )
        SELECT user_id,
               arg_min(event_type, ord_key) AS first_type,
               arg_max(event_type, ord_key) AS last_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY user_id
    """,
    "q_compaction_plan": f"""
        WITH per_source AS (
          SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT)
                   AS sum_chars
          FROM documents GROUP BY source
        )
        SELECT source, n_docs, sum_chars,
               CAST(COALESCE(SUM(sum_chars) OVER (
                 ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING
               ), 0) // {COMPACTION_TARGET_CHARS} AS BIGINT) AS bin
        FROM per_source
    """,
}
