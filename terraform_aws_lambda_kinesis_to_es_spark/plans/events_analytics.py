"""Analytics over the event stream's batch stand-in.

Extensions past the reference's own surface (SURVEY.md §2.7 lists these as
explicit nulls there): dedup on the idempotency key, top-k, per-key stats,
gap-based sessionization. All deterministic (window ties broken on stable
keys) so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load

SESSION_GAP_MIN = 30


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotency dedup on the log-id key (reference carries ``log_id``
    exactly so downstream can dedup, variables.tf:67-70; the reference
    itself never does — SURVEY.md T3). Deterministic first-record-wins:
    earliest (ts, then event_type) per event_id.

    Scale: one shuffle on the dedup key; at 100 TB this is the canonical
    hash-partitioned dedup — no state collects anywhere.
    """
    df = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy(F.col("ts").asc(), F.col("event_type").asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "event_type", "user_id")
    )


def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by event count, ties broken by user_id.

    Scale: groupBy (one shuffle) then a global top-k. A full-sort would be
    the naive plan; Spark's ``orderBy().limit(k)`` compiles to TakeOrdered
    (per-partition top-k + driver merge of k*P rows) — no global sort.
    """
    df = load(spark, sf_dir, "events")
    counts = df.groupBy("user_id").agg(F.count("*").alias("n_events"))
    return counts.orderBy(F.col("n_events").desc(), F.col("user_id").asc()).limit(10)


def q_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile: counts, distinct types, value sum, active span.

    ``countDistinct`` is exact (partial aggregation per node, single
    shuffle); timestamps exported as formatted strings so engine-side
    timestamp repr differences can't break the value hash.
    """
    df = load(spark, sf_dir, "events")
    return df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) via lag + running
    sum — the batch equivalent of a streaming ``session_window``. Returns
    per-user session count and max session length.

    Scale: one shuffle on user_id; both window functions reuse the same
    partitioning (single Exchange in the plan).
    """
    df = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        df.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > SESSION_GAP_MIN * 60)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    sized = sessions.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    return sized.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n").alias("max_session_events"),
    )


def q_type_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style) — per user, value sums split
    by event type. Map-side expressible: one shuffle, no pivot operator
    needed (static type list keeps the plan deterministic)."""
    df = load(spark, sf_dir, "events")
    aggs = [
        F.round(
            F.sum(F.when(F.col("event_type") == t, F.col("value")).otherwise(F.lit(0.0))), 4
        ).alias(f"sum_{t}")
        for t in ("click", "purchase", "view")
    ]
    return df.groupBy("user_id").agg(*aggs)


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via the BUILT-IN session_window operator (the
    same one the streaming path uses with state) run in batch mode.
    Semantics note vs q_sessionize: session_window closes at
    last_ts + gap EXCLUSIVE (an event exactly gap-later starts a new
    session), so the oracle uses >= for the boundary."""
    df = load(spark, sf_dir, "events")
    sessions = df.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    ).agg(F.count("*").alias("n"))
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n").alias("max_session_events"),
    )


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts (1-day window, 12-hour slide) via the
    built-in F.window — each event lands in exactly size/slide windows,
    expanded map-side before one aggregation shuffle. The oracle derives
    the two covering window starts with epoch arithmetic."""
    df = load(spark, sf_dir, "events")
    return (
        df.groupBy(
            F.window("ts", "1 day", "12 hours").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct users per type — the scale path
    for cardinality (fixed sketch memory vs exact distinct's shuffle of
    every key). HLL estimates are engine-specific, so the raw estimate
    can't be hash-compared against DuckDB; instead the output carries the
    exact count plus a ``within_rsd`` boolean asserting the estimate
    landed within 5x the configured rsd of the exact value (a ~5-sigma
    bound — deterministic in practice), which a SQL oracle CAN check
    (it must be uniformly TRUE). The production path at 100 TB is the
    approx aggregate alone; the exact count here exists to make the
    accuracy claim oracle-verifiable."""
    df = load(spark, sf_dir, "events")
    rsd = 0.02
    agg = df.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(5 * rsd) * F.col("exact_users")
        ).alias("within_rsd"),
    )


def q_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read typed extraction through VariantType — the modern
    engine-native path for the reference's opaque JSON bodies
    (lambda/main.py:91): ``try_parse_json`` parses each props payload
    once into a binary variant (malformed -> NULL, mirroring the
    reference's silent non-JSON drop), ``try_variant_get`` extracts a
    typed field without any declared schema. Variant decode beats
    repeated ``get_json_object`` string re-parses when several fields are
    pulled from the same payload, and the parse stays row-local/map-only."""
    df = load(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    return df.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_val"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analysis: per user, the earliest time-ordered
    view -> click -> purchase chain (each stage strictly after the
    previous) and the furthest stage reached — the product-analytics
    query an event pipeline exists to answer.

    Shape: three conditional-min windows over the SAME user partitioning
    (Catalyst reuses one Exchange for all three — no extra shuffles for
    the sequential dependency t1 -> t2 -> t3), then one per-user
    aggregate. Timestamps emitted as epoch micros (-1 = stage not
    reached) for cross-engine comparison."""
    df = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = df.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id",
        stage.cast("int").alias("stage"),
        F.coalesce(F.unix_micros("t1"), F.lit(-1)).alias("view_us"),
        F.coalesce(F.unix_micros("t2"), F.lit(-1)).alias("click_us"),
        F.coalesce(F.unix_micros("t3"), F.lit(-1)).alias("purchase_us"),
    )


RETENTION_OFFSETS = (0, 1, 7, 14)


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; for each cohort,
    distinct users active again exactly N days later (N in
    RETENTION_OFFSETS). Both inputs are pre-aggregated before the join —
    first-seen (one row per user) and daily activity (one row per
    user-day) — so the user-key join shuffles the small aggregated frames,
    never raw events. All-integer output."""
    df = load(spark, sf_dir, "events")
    first_seen = df.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    activity = df.select("user_id", F.to_date("ts").alias("day")).distinct()
    j = activity.join(first_seen, "user_id").withColumn(
        "offset", F.datediff("day", "cohort_day").cast("bigint")
    )
    return (
        j.filter(F.col("offset").isin(*RETENTION_OFFSETS))
        .groupBy(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"), "offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (Markov estimation): per-user
    LAG over the time-ordered event stream, then (prev, next) counts and
    the integer-basis-point conditional share per prev state. One shuffle
    on user_id for the window, one on the (tiny) type-pair key; the
    ts tie-break on event_id pins the sequence order across engines."""
    df = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        df.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    return pairs.withColumn(
        "share_bp",
        F.expr("(10000 * n) DIV sum(n) OVER (PARTITION BY prev_type)").cast("bigint"),
    ).select("prev_type", "next_type", "n", "share_bp")


PATH_LEN = 3
PATH_TOP = 20


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path analysis: the PATH_TOP most common first-PATH_LEN
    event-type sequences across users (the "how do sessions start" product
    question, one level up from q_event_transitions' first-order Markov
    matrix). Fully deterministic: event-time ties break on event_id, the
    path string is assembled in rank order inside the aggregate, and the
    top-k ties break on the path text.

    Scale shape: one user-keyed window (rank + filter to the first K
    events — WindowGroupLimit prunes the rest), one user-keyed agg, one
    bounded path-count agg, TakeOrdered for the cut."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_LEN)
        .select("user_id", "rn", "event_type")
    )
    paths = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(PATH_TOP)
    )


QUERIES = {
    "q_top_paths": q_top_paths,
    "q_dedup": q_dedup,
    "q_retention": q_retention,
    "q_event_transitions": q_event_transitions,
    "q_funnel": q_funnel,
    "q_props_typed": q_props_typed,
    "q_topk_users": q_topk_users,
    "q_user_stats": q_user_stats,
    "q_sessionize": q_sessionize,
    "q_type_value_pivot": q_type_value_pivot,
    "q_session_window": q_session_window,
    "q_sliding_window": q_sliding_window,
    "q_approx_distinct": q_approx_distinct,
}

ORACLES = {
    "q_top_paths": f"""
        WITH seq AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ), firstk AS (
          SELECT * FROM seq WHERE rn <= {PATH_LEN}
        ), paths AS (
          SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
          FROM firstk GROUP BY user_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_users DESC, path ASC LIMIT {PATH_TOP}
    """,
    "q_approx_distinct": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS within_rsd
        FROM events GROUP BY event_type
    """,
    "q_retention": f"""
        WITH first_seen AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id
        ), activity AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        )
        SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
               CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS "offset",
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM activity a JOIN first_seen f USING (user_id)
        WHERE date_diff('day', f.cohort_day, a.day) IN
              ({", ".join(str(o) for o in RETENTION_OFFSETS)})
        GROUP BY 1, 2
    """,
    "q_event_transitions": """
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS prev_type
          FROM events
        ), pairs AS (
          SELECT prev_type, event_type AS next_type, COUNT(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               CAST((10000 * n) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
                 AS share_bp
        FROM pairs
    """,
    "q_funnel": """
        WITH u AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
          FROM events GROUP BY user_id
        ), c AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN u USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > u.t1
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS stage,
               COALESCE(epoch_us(CAST(t1 AS TIMESTAMP)), -1) AS view_us,
               COALESCE(epoch_us(CAST(t2 AS TIMESTAMP)), -1) AS click_us,
               COALESCE(epoch_us(CAST(t3 AS TIMESTAMP)), -1) AS purchase_us
        FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    "q_props_typed": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
        FROM events
    """,
    "q_dedup": """
        SELECT event_id, event_type, user_id FROM (
          SELECT event_id, event_type, user_id,
                 ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts ASC, event_type ASC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "q_topk_users": """
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC LIMIT 10
    """,
    "q_user_stats": """
        SELECT user_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_types,
               ROUND(SUM(value), 4) AS sum_value,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
        FROM events GROUP BY user_id
    """,
    "q_sessionize": f"""
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MIN * 60}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        ), sized AS (
          SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2
        )
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               MAX(n) AS max_session_events
        FROM sized GROUP BY user_id
    """,
    "q_session_window": f"""
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(LAG(ts) OVER w) >= {SESSION_GAP_MIN * 60}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        ), sized AS (
          SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2
        )
        SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events
        FROM sized GROUP BY user_id
    """,
    "q_sliding_window": """
        WITH starts AS (
          SELECT event_type,
                 unnest([
                   to_timestamp((epoch(ts)::BIGINT // 43200) * 43200),
                   to_timestamp((epoch(ts)::BIGINT // 43200) * 43200 - 43200)
                 ]) AS ws
          FROM events
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
               COUNT(*) AS n
        FROM starts GROUP BY 1, 2
    """,
    "q_type_value_pivot": """
        SELECT user_id,
               ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END), 4) AS sum_click,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4) AS sum_purchase,
               ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 4) AS sum_view
        FROM events GROUP BY user_id
    """,
}
