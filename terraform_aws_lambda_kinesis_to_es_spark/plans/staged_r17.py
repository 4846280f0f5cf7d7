"""Staged round-17 queries — built in round 12, NOT declared: the
round-13..16 windows are already allocated (_R13_HEAD_PLAN + the
r14/r15/r16 head-arithmetic notes in plans/__init__.py). Promote
QUERIES/ORACLES into the round-17 head verbatim when its window opens.

Theme: DRIFT & STABILITY MONITORING — the daily watch a production
data platform keeps on its own streams: has the value distribution
moved (PSI, KS), has the event mix shifted (chi²-style cells), is the
daily volume autocorrelated or dispersing, are the halves equivalent
(TOST), how much of the stream is genuinely new (novelty), did the
payload schema churn, did the embedding space move, did quality change
because sources got worse or because the mix changed (Oaxaca), did
per-user cadence or duplicate pressure drift:

- q_psi_drift          — population stability index per event type
                         between the first and second half of the time
                         span, over a fixed value ladder (the one
                         drift scalar every ML-ops page tracks);
                         ln terms via the order-pinned fold +
                         round(4) (the q_js_divergence discipline)
- q_ks_drift           — Kolmogorov-Smirnov max cumulative gap in bp
                         over the fixed ladder, per event type — all
                         integer (quantize-first)
- q_mix_drift_chi2     — event-type mix shift cells old vs new half,
                         bp-quantized chi²-style contributions
- q_acf_daily          — autocorrelation of daily event counts at lags
                         1..7 (is volume self-similar or trending),
                         fold-ordered floats, round(4)
- q_dispersion_drift   — mean-absolute-deviation dispersion per event
                         type, old vs new, integer cents (variance
                         needs corpus-scale squares; MAD stays int64
                         at any volume)
- q_tost_equivalence   — two-one-sided-test equivalence of mean value
                         per event type at a 5% margin, with the
                         between-block variance trick (32 hash blocks;
                         spine-only arithmetic) and the squared-compare
                         form (no sqrt crosses the engines)
- q_novel_rate         — per-day share of never-before-seen payload
                         digests + the cumulative distinct curve (the
                         novelty read that separates growth from
                         recycling)
- q_schema_drift       — per-JSON-key presence share old vs new with
                         new/dropped/shifted/stable status (the props
                         contract watch; q_json_schema_infer is the
                         static profile, this is its derivative)
- q_embedding_drift    — per-label centroid shift (squared L2) between
                         the vec_id-parity halves of the embedding
                         corpus, order-pinned fold centroids
- q_quality_drift_decomp — Oaxaca-Blinder style decomposition of the
                         corpus quality change into MIX (source shares
                         moved) and WITHIN (sources themselves moved)
                         terms, all integer milli/bp
- q_cadence_drift      — per-user inter-event gap ladder old vs new,
                         KS-style max cumulative gap per event type
                         (the r16 power-of-two ladder, partitioned by
                         (type, user, half) so no corpus-serial sort)
- q_dup_rate_drift     — within-day duplicate-payload rate per day and
                         the pooled old-vs-new delta (is duplicate
                         pressure rising — the upstream-retry alarm)

Split discipline: event-stream queries split at the TIME midpoint
(min_us + (max_us - min_us) DIV 2 — integer micros; comparisons are
offset-invariant, so session TZ cancels); timeless corpora (documents,
embeddings) split by id parity (the q_value_drift precedent). The
midpoint is a single-row broadcast attach (whitelisted), never a
second scan ordering.

Cross-engine determinism: integer bp/milli via DIV throughout;
doubles appear only as (a) raw parquet values compared/bucketed with
identical IEEE ops, (b) ln/ratio folds over key-sorted bounded lists
with round(4) (the q_js_divergence / q_zipf_fit precedent), and
(c) the centroid folds (q_centroid_sim precedent). The TOST compare
is squared so no sqrt is emitted.

Reference citation: the reference engine (lambda/main.py, 174 lines)
ships no monitoring layer; these extend the repo's training-data
north star (SURVEY.md §2 extensions) following the staged-tranche
pattern of plans/staged_r13..16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
    sentinel_digest,
    sentinel_digest_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _vec,
    _VEC_CTE,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r16 import (
    _gap_bucket_case,
    _sqdist_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    ORACLES as _TEXT_ORACLES,
    with_quality,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# ------------------------------------------------------ shared pieces

# ONE payload-digest definition for every digest-keyed query here (the
# staged_r16 q_dedup_window_curve key; helper keeps all copies
# byte-identical cross-engine)
_DG = sentinel_digest_sql("event_type", "props", "CAST(user_id AS VARCHAR)")

# The time-midpoint split: both engines compute epoch micros (Spark
# unix_micros, DuckDB epoch_us), so the `us < mid` comparison is exact
# and offset-invariant. Emitted as a 1-row broadcast attach.
_MID_SQL = "(SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS mid FROM events)"


def _halved_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + is_old (first half of the time span, by the integer
    micros midpoint — a 1-row broadcast attach)."""
    events = load(spark, sf_dir, "events")
    e = events.withColumn("us", F.unix_micros(F.col("ts")))
    mid = e.agg(
        F.expr(
            "CAST(min(us) + (max(us) - min(us)) DIV 2 AS BIGINT)"
        ).alias("mid")
    )
    return e.crossJoin(F.broadcast(mid)).withColumn(
        "is_old", F.col("us") < F.col("mid")
    )


# ------------------------------------------------------ PSI drift

PSI_BUCKET_W = 50  # fixed value ladder: floor(value / 50), ~10 buckets


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type between the two time
    halves, over the FIXED value ladder (data-dependent quantile edges
    would make the statistic non-deterministic across engines; fixed
    edges are also what a production monitor pins so weeks are
    comparable). PSI = Σ (p-q)·ln(p/q) over buckets where both halves
    have mass; degenerate buckets (mass on one side only) are counted,
    not folded — the standard clipped-PSI convention, made explicit.
    The ln terms fold LEFT-TO-RIGHT over the bucket-sorted list and
    the scalar rounds to 4 (the q_js_divergence discipline —
    cross-engine ln parity is proven by that declared query).

    q_value_drift is the per-bucket parity-split shift table; this is
    the TIME-split scalar a dashboard alerts on. One corpus rollup
    onto (type, bucket) cells; every fold is bucket-bounded."""
    e = _halved_events(spark, sf_dir)
    cells = (
        e.withColumn(
            "bucket", F.expr(f"CAST(floor(value / {PSI_BUCKET_W}) AS BIGINT)")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_old"),
            F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_new"),
        )
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("c_old").cast("bigint").alias("t_old"),
        F.sum("c_new").cast("bigint").alias("t_new"),
    )
    per = cells.join(tot, "event_type").withColumn(
        "active", (F.col("c_old") > 0) & (F.col("c_new") > 0)
    )
    folded = per.groupBy("event_type").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "bucket",
                        F.when(
                            F.col("active"),
                            (
                                F.col("c_old") / F.col("t_old")
                                - F.col("c_new") / F.col("t_new")
                            )
                            * F.log(
                                (F.col("c_old") / F.col("t_old"))
                                / (F.col("c_new") / F.col("t_new"))
                            ),
                        )
                        .otherwise(F.lit(0.0))
                        .alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("psi"),
        F.sum(F.col("active").cast("bigint")).cast("bigint").alias(
            "n_active_buckets"
        ),
        F.sum((~F.col("active")).cast("bigint")).cast("bigint").alias(
            "n_degenerate_buckets"
        ),
        F.max("t_old").cast("bigint").alias("n_old"),
        F.max("t_new").cast("bigint").alias("n_new"),
    )
    return folded.select(
        "event_type",
        "n_old",
        "n_new",
        F.round("psi", 4).alias("psi_r"),
        "n_active_buckets",
        "n_degenerate_buckets",
    )


_PSI_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT event_type, CAST(floor(value / {PSI_BUCKET_W}) AS BIGINT) AS bucket,
         epoch_us(ts) < mid AS is_old
  FROM events, mid
),
cells AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS c_new
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(c_old) AS t_old, SUM(c_new) AS t_new
  FROM cells GROUP BY 1
),
per AS (
  SELECT c.event_type, c.bucket, c.c_old, c.c_new, t.t_old, t.t_new,
         c.c_old > 0 AND c.c_new > 0 AS active
  FROM cells c JOIN tot t USING (event_type)
),
folded AS (
  SELECT event_type,
         list_reduce(
           list_prepend(0.0, list(
             CASE WHEN active THEN
               (c_old / CAST(t_old AS DOUBLE) - c_new / CAST(t_new AS DOUBLE))
               * ln((c_old / CAST(t_old AS DOUBLE))
                    / (c_new / CAST(t_new AS DOUBLE)))
             ELSE 0.0 END ORDER BY bucket)),
           (a, b) -> a + b) AS psi,
         SUM(CASE WHEN active THEN 1 ELSE 0 END) AS n_active_buckets,
         SUM(CASE WHEN active THEN 0 ELSE 1 END) AS n_degenerate_buckets,
         MAX(t_old) AS n_old, MAX(t_new) AS n_new
  FROM per GROUP BY event_type
)
SELECT event_type,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       round(psi, 4) AS psi_r,
       CAST(n_active_buckets AS BIGINT) AS n_active_buckets,
       CAST(n_degenerate_buckets AS BIGINT) AS n_degenerate_buckets
FROM folded
"""

# ------------------------------------------------------ KS drift

KS_BUCKET_W = 10  # finer fixed ladder for the CDF gap (~50 buckets)


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov drift per event type: the max absolute gap
    between the two halves' cumulative distributions over the fixed
    value ladder, in bp — entirely integer (shares are bp-quantized
    BEFORE the gap; the quantize-first recipe), so unlike the PSI
    scalar this one is exactly reproducible at any scale. Ties on the
    argmax bucket break to the smallest bucket. Types present in only
    one half (a KS over an empty side is undefined — ANSI Spark would
    throw on the zero denominator where DuckDB NULLs) are excluded,
    like q_cadence_drift; q_mix_drift_chi2 reports one-sided types."""
    e = _halved_events(spark, sf_dir)
    cells = (
        e.withColumn(
            "bucket", F.expr(f"CAST(floor(value / {KS_BUCKET_W}) AS BIGINT)")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_old"),
            F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_new"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        cells.withColumn("cum_old", F.sum("c_old").over(w))
        .withColumn("cum_new", F.sum("c_new").over(w))
        .join(
            cells.groupBy("event_type").agg(
                F.sum("c_old").cast("bigint").alias("t_old"),
                F.sum("c_new").cast("bigint").alias("t_new"),
            ),
            "event_type",
        )
        .filter((F.col("t_old") > 0) & (F.col("t_new") > 0))
        .withColumn(
            "gap_bp",
            F.expr(
                "abs((10000 * cum_old) DIV t_old"
                " - (10000 * cum_new) DIV t_new)"
            ),
        )
    )
    wa = Window.partitionBy("event_type")
    return (
        cum.withColumn("ks_bp", F.max("gap_bp").over(wa))
        .filter(F.col("gap_bp") == F.col("ks_bp"))
        .groupBy("event_type")
        .agg(
            F.max("t_old").cast("bigint").alias("n_old"),
            F.max("t_new").cast("bigint").alias("n_new"),
            F.max("ks_bp").cast("bigint").alias("ks_bp"),
            F.min("bucket").cast("bigint").alias("at_bucket"),
        )
    )


_KS_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT event_type, CAST(floor(value / {KS_BUCKET_W}) AS BIGINT) AS bucket,
         epoch_us(ts) < mid AS is_old
  FROM events, mid
),
cells AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS c_new
  FROM e GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, c_old, c_new,
         SUM(c_old) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_old,
         SUM(c_new) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_new,
         SUM(c_old) OVER (PARTITION BY event_type) AS t_old,
         SUM(c_new) OVER (PARTITION BY event_type) AS t_new
  FROM cells
),
gapped AS (
  SELECT event_type, bucket, t_old, t_new,
         abs((10000 * cum_old) // t_old - (10000 * cum_new) // t_new)
           AS gap_bp,
         MAX(abs((10000 * cum_old) // t_old - (10000 * cum_new) // t_new))
           OVER (PARTITION BY event_type) AS ks_bp
  FROM cum WHERE t_old > 0 AND t_new > 0
)
SELECT event_type,
       CAST(MAX(t_old) AS BIGINT) AS n_old,
       CAST(MAX(t_new) AS BIGINT) AS n_new,
       CAST(MAX(ks_bp) AS BIGINT) AS ks_bp,
       CAST(MIN(bucket) AS BIGINT) AS at_bucket
FROM gapped WHERE gap_bp = ks_bp
GROUP BY event_type
"""

# -------------------------------------------------- mix drift chi2


def q_mix_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix shift cells: each type's share of the old vs new
    half in bp and a chi²-style contribution
    dp² · 1000 / (p_old + p_new) in milli-units (bp-quantized shares
    FIRST — the q_chi2_independence recipe, int64 at any volume).
    The mix-shift alarm: a type whose traffic share moved. An empty
    half (degenerate single-instant corpus) yields zero shares via
    the greatest(t, 1) guard instead of an ANSI divide-by-zero."""
    e = _halved_events(spark, sf_dir)
    per = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_new"),
    )
    tot = per.agg(
        F.sum("c_old").cast("bigint").alias("t_old"),
        F.sum("c_new").cast("bigint").alias("t_new"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "c_old",
        "c_new",
        F.expr("CAST((10000 * c_old) DIV greatest(t_old, 1) AS BIGINT)").alias(
            "share_old_bp"
        ),
        F.expr("CAST((10000 * c_new) DIV greatest(t_new, 1) AS BIGINT)").alias(
            "share_new_bp"
        ),
        F.expr(
            "CAST(((10000 * c_new) DIV greatest(t_new, 1) - (10000 * c_old) DIV greatest(t_old, 1))"
            " AS BIGINT)"
        ).alias("delta_bp"),
        F.expr(
            "CAST(CASE WHEN (10000 * c_old) DIV greatest(t_old, 1)"
            " + (10000 * c_new) DIV greatest(t_new, 1) > 0 THEN"
            " (((10000 * c_new) DIV greatest(t_new, 1) - (10000 * c_old) DIV greatest(t_old, 1))"
            "  * ((10000 * c_new) DIV greatest(t_new, 1) - (10000 * c_old) DIV greatest(t_old, 1))"
            "  * 1000)"
            " DIV ((10000 * c_old) DIV greatest(t_old, 1) + (10000 * c_new) DIV greatest(t_new, 1))"
            " ELSE 0 END AS BIGINT)"
        ).alias("chi2_milli"),
    )


_MIX_SQL = f"""
WITH mid AS {_MID_SQL},
per AS (
  SELECT event_type,
         SUM(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END) AS c_old,
         SUM(CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END) AS c_new
  FROM events, mid GROUP BY 1
),
tot AS (SELECT SUM(c_old) AS t_old, SUM(c_new) AS t_new FROM per)
SELECT event_type,
       CAST(c_old AS BIGINT) AS c_old,
       CAST(c_new AS BIGINT) AS c_new,
       CAST((10000 * c_old) // GREATEST(t_old, 1) AS BIGINT) AS share_old_bp,
       CAST((10000 * c_new) // GREATEST(t_new, 1) AS BIGINT) AS share_new_bp,
       CAST((10000 * c_new) // GREATEST(t_new, 1) - (10000 * c_old) // GREATEST(t_old, 1) AS BIGINT)
         AS delta_bp,
       CAST(CASE WHEN (10000 * c_old) // GREATEST(t_old, 1)
                      + (10000 * c_new) // GREATEST(t_new, 1) > 0 THEN
              (((10000 * c_new) // GREATEST(t_new, 1) - (10000 * c_old) // GREATEST(t_old, 1))
               * ((10000 * c_new) // GREATEST(t_new, 1) - (10000 * c_old) // GREATEST(t_old, 1))
               * 1000)
              // ((10000 * c_old) // GREATEST(t_old, 1) + (10000 * c_new) // GREATEST(t_new, 1))
            ELSE 0 END AS BIGINT) AS chi2_milli
FROM per, tot
"""

# ------------------------------------------------------ daily ACF

ACF_MAX_LAG = 7


def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event counts at lags 1..7 — the
    self-similarity read (a strong lag-7 says weekly seasonality, a
    slowly-decaying curve says trend; both change how anomaly
    thresholds should be set). r_l = Σ(x_t - m)(x_{t+l} - m) /
    Σ(x_t - m)² with the mean and both sums folded LEFT-TO-RIGHT over
    the day-sorted count list (the whole series is the bounded day
    spine, collected once into a single array; every subsequent op is
    array math on that one row). round(4)."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("dn")
    ).select(
        F.transform("dn", lambda s: s["n"].cast("double")).alias("xs")
    )
    lags = series.select(
        "xs",
        F.size("xs").alias("nd"),
        F.explode(
            F.array(*[F.lit(l) for l in range(1, ACF_MAX_LAG + 1)])
        ).alias("lag"),
    )
    m = F.aggregate("xs", F.lit(0.0), lambda a, x: a + x) / F.col("nd")
    den = F.aggregate(
        F.transform("xs", lambda x: (x - F.col("m")) * (x - F.col("m"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    num = F.aggregate(
        F.zip_with(
            F.expr("slice(xs, 1, nd - lag)"),
            F.expr("slice(xs, lag + 1, nd - lag)"),
            lambda a, b: (a - F.col("m")) * (b - F.col("m")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        lags.withColumn("m", m)
        .withColumn("den", den)
        .withColumn("num", num)
        .filter(F.col("nd") > F.col("lag"))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            (F.col("nd") - F.col("lag")).cast("bigint").alias("n_pairs"),
            # a constant series has den = 0 and an undefined ACF: emit
            # NULL (matching the oracle's CASE) — ANSI Spark would
            # otherwise throw DIVIDE_BY_ZERO even on doubles
            F.when(
                F.col("den") != 0.0, F.round(F.col("num") / F.col("den"), 4)
            ).alias("acf_r"),
        )
    )


def _acf_sql() -> str:
    lag_rows = ", ".join(f"({l})" for l in range(1, ACF_MAX_LAG + 1))
    return f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
series AS (
  SELECT list(CAST(n AS DOUBLE) ORDER BY day) AS xs FROM daily
),
lags AS (SELECT * FROM (VALUES {lag_rows}) t(lag)),
st AS (
  SELECT lag, xs, len(xs) AS nd,
         list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) / len(xs) AS m
  FROM series, lags
),
parts AS (
  SELECT lag, nd, m,
         list_reduce(list_prepend(0.0,
           list_transform(xs, x -> (x - m) * (x - m))),
           (a, b) -> a + b) AS den,
         list_reduce(list_prepend(0.0,
           list_transform(
             list_zip(xs[1:nd - lag], xs[lag + 1:nd]),
             p -> (p[1] - m) * (p[2] - m))),
           (a, b) -> a + b) AS num
  FROM st
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(nd - lag AS BIGINT) AS n_pairs,
       CASE WHEN den <> 0 THEN round(num / den, 4) END AS acf_r
FROM parts WHERE nd > lag
"""

# ------------------------------------------------- dispersion drift


def q_dispersion_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion drift per event type: mean absolute deviation around
    the integer-cent mean, old vs new half, and their ratio in bp.
    MAD instead of variance BY DESIGN: a variance needs Σv² and n·Σv²,
    which leave int64 at corpus scale (the q_type_gini overflow class),
    while |v - mean| sums stay bounded by n·max_value at any volume.
    Values quantize to integer cents via floor (identical IEEE ops both
    engines); means are floor-DIV cents."""
    e = _halved_events(spark, sf_dir).withColumn(
        "v_c", F.expr("CAST(floor(value * 100) AS BIGINT)")
    )
    halves = e.groupBy("event_type", "is_old").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_c").cast("bigint").alias("s"),
    )
    mad = (
        e.join(
            halves.select(
                "event_type",
                "is_old",
                F.expr("CAST(s DIV n AS BIGINT)").alias("mean_c"),
            ),
            ["event_type", "is_old"],
        )
        .groupBy("event_type", "is_old")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.expr("abs(v_c - mean_c)")).cast("bigint").alias("sad"),
            F.max("mean_c").cast("bigint").alias("mean_c"),
        )
        .withColumn("mad_c", F.expr("CAST(sad DIV n AS BIGINT)"))
    )
    old = mad.filter(F.col("is_old")).select(
        "event_type",
        F.col("n").alias("n_old"),
        F.col("mean_c").alias("mean_old_c"),
        F.col("mad_c").alias("mad_old_c"),
    )
    new = mad.filter(~F.col("is_old")).select(
        "event_type",
        F.col("n").alias("n_new"),
        F.col("mean_c").alias("mean_new_c"),
        F.col("mad_c").alias("mad_new_c"),
    )
    return old.join(new, "event_type").select(
        "event_type",
        "n_old",
        "n_new",
        "mean_old_c",
        "mean_new_c",
        "mad_old_c",
        "mad_new_c",
        F.expr(
            "CAST((10000 * mad_new_c) DIV greatest(mad_old_c, 1) AS BIGINT)"
        ).alias("mad_ratio_bp"),
    )


_DISPERSION_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c,
         epoch_us(ts) < mid AS is_old
  FROM events, mid
),
halves AS (
  SELECT event_type, is_old, COUNT(*) AS n, SUM(v_c) AS s,
         SUM(v_c) // COUNT(*) AS mean_c
  FROM e GROUP BY 1, 2
),
mad AS (
  SELECT e.event_type, e.is_old, COUNT(*) AS n,
         MAX(h.mean_c) AS mean_c,
         SUM(abs(e.v_c - h.mean_c)) // COUNT(*) AS mad_c
  FROM e JOIN halves h USING (event_type, is_old)
  GROUP BY 1, 2
)
SELECT o.event_type,
       CAST(o.n AS BIGINT) AS n_old,
       CAST(n2.n AS BIGINT) AS n_new,
       CAST(o.mean_c AS BIGINT) AS mean_old_c,
       CAST(n2.mean_c AS BIGINT) AS mean_new_c,
       CAST(o.mad_c AS BIGINT) AS mad_old_c,
       CAST(n2.mad_c AS BIGINT) AS mad_new_c,
       CAST((10000 * n2.mad_c) // GREATEST(o.mad_c, 1) AS BIGINT)
         AS mad_ratio_bp
FROM (SELECT * FROM mad WHERE is_old) o
JOIN (SELECT * FROM mad WHERE NOT is_old) n2 USING (event_type)
"""

# ----------------------------------------------- TOST equivalence

TOST_BLOCK_DIV = 1 << 55  # hash60 >> 55 = 32 blocks per (type, half)
TOST_MARGIN_BP = 500  # equivalence margin: 5% of the pooled mean


def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-one-sided-test mean equivalence per event type between the
    halves: equivalent when the ±2σ interval around the mean difference
    sits inside ±5% of the pooled mean. The standard error comes from
    the BETWEEN-BLOCK variance of 32 hash-block means per half (the
    q_stopping_rule spine trick, computed on CENTERED block means —
    dm = m - mean; k·Σdm² - (Σdm)² equals k·Σm² - (Σm)² EXACTLY in
    integer arithmetic (translation invariance, no floors involved),
    but the intermediates are bounded by the block-mean DEVIATION
    rather than the mean: int64-safe while block means stay within
    ~$950 of the half mean, at ANY absolute price level — the
    uncentered form would wrap once the mean itself neared $950), and
    the acceptance is compared in SQUARED form — (M - |d|)² ≥
    4·(se²_o + se²_n) — so no sqrt crosses the engines. Block means
    are milli-cents; d and M are too.

    The release gate read: 'the new window's mean is statistically the
    same' asserted positively (a failed t-test is NOT equivalence)."""
    e = (
        _halved_events(spark, sf_dir)
        .select(
            "event_type",
            "is_old",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_c"),
            hash60(F.col("event_id").cast("string")).alias("h"),
        )
        .withColumn("blk", F.expr(f"h DIV {TOST_BLOCK_DIV}"))
        .drop("h")
    )
    blocks = (
        e.groupBy("event_type", "is_old", "blk")
        .agg(
            F.count("*").cast("bigint").alias("n_b"),
            F.sum("v_c").cast("bigint").alias("s_b"),
        )
        .withColumn("m", F.expr("CAST((1000 * s_b) DIV n_b AS BIGINT)"))
    )
    totals = blocks.groupBy("event_type", "is_old").agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("s_b").cast("bigint").alias("s"),
    ).withColumn("mean_milli", F.expr("CAST((1000 * s) DIV n AS BIGINT)"))
    centered = blocks.join(
        totals.select("event_type", "is_old", "mean_milli"),
        ["event_type", "is_old"],
    ).withColumn("dm", F.expr("m - mean_milli"))
    halves = centered.groupBy("event_type", "is_old").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_b").cast("bigint").alias("n"),
        F.max("mean_milli").cast("bigint").alias("mean_milli"),
        F.sum("dm").cast("bigint").alias("sdm"),
        F.sum(F.expr("dm * dm")).cast("bigint").alias("sdm2"),
    ).withColumn(
        "se2",
        F.expr(
            "CAST(CASE WHEN k >= 2 THEN"
            " (k * sdm2 - sdm * sdm) DIV (k * k * (k - 1))"
            " ELSE 0 END AS BIGINT)"
        ),
    )
    old = halves.filter(F.col("is_old")).select(
        "event_type",
        F.col("n").alias("n_old"),
        F.col("mean_milli").alias("mean_old_milli"),
        F.col("se2").alias("se2_old"),
    )
    new = halves.filter(~F.col("is_old")).select(
        "event_type",
        F.col("n").alias("n_new"),
        F.col("mean_milli").alias("mean_new_milli"),
        F.col("se2").alias("se2_new"),
    )
    j = old.join(new, "event_type")
    return j.select(
        "event_type",
        "n_old",
        "n_new",
        "mean_old_milli",
        "mean_new_milli",
        F.expr("CAST(abs(mean_new_milli - mean_old_milli) AS BIGINT)").alias(
            "d_milli"
        ),
        F.expr(
            f"CAST((((mean_old_milli + mean_new_milli) DIV 2)"
            f" * {TOST_MARGIN_BP}) DIV 10000 AS BIGINT)"
        ).alias("margin_milli"),
        F.expr("CAST(se2_old + se2_new AS BIGINT)").alias("se2_sum"),
        F.expr(
            f"CAST(abs(mean_new_milli - mean_old_milli)"
            f" <= (((mean_old_milli + mean_new_milli) DIV 2)"
            f"     * {TOST_MARGIN_BP}) DIV 10000"
            f" AND ((((mean_old_milli + mean_new_milli) DIV 2)"
            f"       * {TOST_MARGIN_BP}) DIV 10000"
            f"      - abs(mean_new_milli - mean_old_milli))"
            f"     * ((((mean_old_milli + mean_new_milli) DIV 2)"
            f"        * {TOST_MARGIN_BP}) DIV 10000"
            f"       - abs(mean_new_milli - mean_old_milli))"
            f"     >= 4 * (se2_old + se2_new) AS BIGINT)"
        ).alias("equivalent"),
    )


_TOST_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT event_type, epoch_us(ts) < mid AS is_old,
         CAST(floor(value * 100) AS BIGINT) AS v_c,
         {hash60_sql('CAST(event_id AS VARCHAR)')} // {TOST_BLOCK_DIV} AS blk
  FROM events, mid
),
blocks AS (
  SELECT event_type, is_old, blk, COUNT(*) AS n_b, SUM(v_c) AS s_b,
         (1000 * SUM(v_c)) // COUNT(*) AS m
  FROM e GROUP BY 1, 2, 3
),
totals AS (
  SELECT event_type, is_old, SUM(n_b) AS n, SUM(s_b) AS s,
         (1000 * SUM(s_b)) // SUM(n_b) AS mean_milli
  FROM blocks GROUP BY 1, 2
),
centered AS (
  SELECT b.event_type, b.is_old, b.n_b, t.mean_milli,
         b.m - t.mean_milli AS dm
  FROM blocks b JOIN totals t USING (event_type, is_old)
),
halves AS (
  SELECT event_type, is_old, COUNT(*) AS k, SUM(n_b) AS n,
         MAX(mean_milli) AS mean_milli,
         CASE WHEN COUNT(*) >= 2 THEN
           (COUNT(*) * SUM(dm * dm) - SUM(dm) * SUM(dm))
             // (COUNT(*) * COUNT(*) * (COUNT(*) - 1))
         ELSE 0 END AS se2
  FROM centered GROUP BY 1, 2
),
j AS (
  SELECT o.event_type, o.n AS n_old, n2.n AS n_new,
         o.mean_milli AS mean_old_milli, n2.mean_milli AS mean_new_milli,
         abs(n2.mean_milli - o.mean_milli) AS d_milli,
         (((o.mean_milli + n2.mean_milli) // 2) * {TOST_MARGIN_BP}) // 10000
           AS margin_milli,
         o.se2 + n2.se2 AS se2_sum
  FROM (SELECT * FROM halves WHERE is_old) o
  JOIN (SELECT * FROM halves WHERE NOT is_old) n2 USING (event_type)
)
SELECT event_type,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(mean_old_milli AS BIGINT) AS mean_old_milli,
       CAST(mean_new_milli AS BIGINT) AS mean_new_milli,
       CAST(d_milli AS BIGINT) AS d_milli,
       CAST(margin_milli AS BIGINT) AS margin_milli,
       CAST(se2_sum AS BIGINT) AS se2_sum,
       CAST(d_milli <= margin_milli
            AND (margin_milli - d_milli) * (margin_milli - d_milli)
                >= 4 * se2_sum AS BIGINT) AS equivalent
FROM j
"""

# ------------------------------------------------------ novelty rate


def q_novel_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day novelty: how much of each day's volume is a
    never-before-seen payload digest (first day of the digest == the
    day, via MIN over the ISO day string — string order IS time order),
    plus the cumulative distinct curve. Novel share collapsing toward
    zero says the stream is recycling (dedup wins); staying high says
    genuine growth (state keeps growing). Digest groupBy + bounded day
    spine windows; all integer."""
    events = load(spark, sf_dir, "events")
    keyed = events.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        sentinel_digest(
            F.col("event_type"),
            F.col("props"),
            F.col("user_id").cast("string"),
        ).alias("dg"),
    )
    firsts = keyed.groupBy("dg").agg(F.min("day").alias("first_day"))
    novel = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_novel")
    )
    daily = keyed.groupBy("day").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(novel, "day", "left")
        .na.fill({"n_novel": 0})
        .withColumn("cum_distinct", F.sum("n_novel").over(w).cast("bigint"))
        .select(
            "day",
            "n",
            F.col("n_novel").cast("bigint").alias("n_novel"),
            F.expr("CAST((10000 * n_novel) DIV n AS BIGINT)").alias(
                "novel_bp"
            ),
            "cum_distinct",
        )
    )


_NOVEL_SQL = f"""
WITH keyed AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         {_DG} AS dg
  FROM events
),
firsts AS (SELECT dg, MIN(day) AS first_day FROM keyed GROUP BY 1),
novel AS (
  SELECT first_day AS day, COUNT(*) AS n_novel FROM firsts GROUP BY 1
),
daily AS (SELECT day, COUNT(*) AS n FROM keyed GROUP BY 1)
SELECT d.day,
       CAST(d.n AS BIGINT) AS n,
       CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
       CAST((10000 * COALESCE(v.n_novel, 0)) // d.n AS BIGINT) AS novel_bp,
       CAST(SUM(COALESCE(v.n_novel, 0))
            OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_distinct
FROM daily d LEFT JOIN novel v USING (day)
"""

# ------------------------------------------------------ schema drift

SCHEMA_SHIFT_BP = 500  # |presence-share delta| that flags 'shifted'


def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The props-contract watch: per JSON key, presence share (of the
    half's events) old vs new, with a status — new (absent old half),
    dropped (absent new half), shifted (|delta| > SCHEMA_SHIFT_BP), or
    stable. q_json_schema_infer is the static key profile; this is its
    time derivative, the alarm for a producer silently adding or
    retiring fields. Key vocabulary is bounded; one corpus explode +
    keyed rollup.

    The driver fixture's props carries a single constant key, so every
    interesting branch would be dead at every SF — a deterministic
    key-churn storm is INJECTED in-query (the q_duplicate_payloads
    trick) and mirrored by the oracle: 'k_new' appears only in the new
    half (1/7 of its events), 'k_legacy' only in the old half (1/11),
    and 'k_shift' changes presence from 1/3 to 1/2 — so the new,
    dropped, and shifted statuses are all driver-exercised, not just
    covered by the stable case."""
    e = _halved_events(spark, sf_dir)
    halves = e.groupBy("is_old").agg(F.count("*").cast("bigint").alias("t"))
    # Union of filtered legs, MEASURED against the one-pass
    # explode(concat(real keys, conditional arrays)) alternative at
    # 100x: union 12.7 s vs one-pass 24.6 s — the injected legs read
    # three cheap columns and skip the JSON parse entirely, while the
    # per-row conditional-array concat costs more than the extra
    # columnar scans. Both are linear; the union is the faster plan.
    real = e.select(
        "is_old",
        F.explode(
            F.map_keys(F.from_json(F.col("props"), "map<string,string>"))
        ).alias("k"),
    )
    injected = (
        e.filter(~F.col("is_old") & (F.col("event_id") % 7 == 0)).select(
            "is_old", F.lit("k_new").alias("k")
        )
        .unionByName(
            e.filter(F.col("is_old") & (F.col("event_id") % 11 == 0)).select(
                "is_old", F.lit("k_legacy").alias("k")
            )
        )
        .unionByName(
            e.filter(
                (F.col("is_old") & (F.col("event_id") % 3 == 0))
                | (~F.col("is_old") & (F.col("event_id") % 2 == 0))
            ).select("is_old", F.lit("k_shift").alias("k"))
        )
    )
    kv = real.unionByName(injected)
    per = kv.groupBy("k").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
    )
    t_old = halves.filter(F.col("is_old")).select(F.col("t").alias("t_old"))
    t_new = halves.filter(~F.col("is_old")).select(F.col("t").alias("t_new"))
    return (
        per.crossJoin(F.broadcast(t_old))
        .crossJoin(F.broadcast(t_new))
        .withColumn(
            "share_old_bp", F.expr("CAST((10000 * n_old) DIV t_old AS BIGINT)")
        )
        .withColumn(
            "share_new_bp", F.expr("CAST((10000 * n_new) DIV t_new AS BIGINT)")
        )
        .select(
            "k",
            "n_old",
            "n_new",
            "share_old_bp",
            "share_new_bp",
            F.expr("CAST(share_new_bp - share_old_bp AS BIGINT)").alias(
                "delta_bp"
            ),
            F.expr(
                "CASE WHEN n_old = 0 AND n_new > 0 THEN 'new'"
                " WHEN n_new = 0 AND n_old > 0 THEN 'dropped'"
                f" WHEN abs(share_new_bp - share_old_bp) > {SCHEMA_SHIFT_BP}"
                " THEN 'shifted' ELSE 'stable' END"
            ).alias("status"),
        )
    )


_SCHEMA_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT epoch_us(ts) < mid AS is_old, props, event_id FROM events, mid
),
halves AS (SELECT is_old, COUNT(*) AS t FROM e GROUP BY 1),
kv AS (
  SELECT is_old, unnest(json_keys(props)) AS k FROM e
  UNION ALL
  SELECT is_old, 'k_new' AS k FROM e
  WHERE NOT is_old AND event_id % 7 = 0
  UNION ALL
  SELECT is_old, 'k_legacy' AS k FROM e
  WHERE is_old AND event_id % 11 = 0
  UNION ALL
  SELECT is_old, 'k_shift' AS k FROM e
  WHERE (is_old AND event_id % 3 = 0)
     OR (NOT is_old AND event_id % 2 = 0)
),
per AS (
  SELECT k,
         SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS n_old,
         SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS n_new
  FROM kv GROUP BY 1
),
shared AS (
  SELECT p.k, p.n_old, p.n_new,
         (10000 * p.n_old) // o.t AS share_old_bp,
         (10000 * p.n_new) // n2.t AS share_new_bp
  FROM per p,
       (SELECT t FROM halves WHERE is_old) o,
       (SELECT t FROM halves WHERE NOT is_old) n2
)
SELECT k,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(share_old_bp AS BIGINT) AS share_old_bp,
       CAST(share_new_bp AS BIGINT) AS share_new_bp,
       CAST(share_new_bp - share_old_bp AS BIGINT) AS delta_bp,
       CASE WHEN n_old = 0 AND n_new > 0 THEN 'new'
            WHEN n_new = 0 AND n_old > 0 THEN 'dropped'
            WHEN abs(share_new_bp - share_old_bp) > {SCHEMA_SHIFT_BP}
            THEN 'shifted' ELSE 'stable' END AS status
FROM shared
"""

# --------------------------------------------------- embedding drift


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid shift between the vec_id-parity halves of the
    embedding corpus (squared L2 of the two order-pinned fold
    centroids, round 4) — the representation-drift read: a label whose
    parity halves disagree is unstable under resampling (or the
    embedding space itself moved between ingest batches interleaved by
    id). Centroids use the q_centroid_sim fold recipe per half; the
    per-label frame is bounded by the label vocabulary."""
    vecs = _vec(spark, sf_dir).withColumn(
        "half", (F.col("vec_id") % 2).cast("int")
    )
    pos = vecs.select(
        "label", "half", "vec_id", F.posexplode("v").alias("pos", "x")
    )
    cent = (
        pos.groupBy("label", "half", "pos")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vec_id", "x"))),
                F.lit(0.0),
                lambda a, s: a + s["x"],
            ).alias("sx"),
            F.count("*").alias("nx"),
        )
        .withColumn("c", F.col("sx") / F.col("nx"))
    )
    cvec = (
        cent.groupBy("label", "half")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "label",
            "half",
            F.transform("pc", lambda s: s["c"]).alias("centroid"),
        )
    )
    counts = vecs.groupBy("label", "half").agg(
        F.count("*").cast("bigint").alias("n")
    )
    a = cvec.filter(F.col("half") == 0).select(
        "label", F.col("centroid").alias("ca")
    )
    b = cvec.filter(F.col("half") == 1).select(
        "label", F.col("centroid").alias("cb")
    )
    na = counts.filter(F.col("half") == 0).select(
        "label", F.col("n").alias("n_even")
    )
    nb = counts.filter(F.col("half") == 1).select(
        "label", F.col("n").alias("n_odd")
    )
    shift2 = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        a.join(b, "label")
        .join(na, "label")
        .join(nb, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            F.round(shift2, 4).alias("shift2_r"),
        )
    )


_EMBED_DRIFT_SQL = f"""
WITH vec AS ({_VEC_CTE}),
v2 AS (SELECT vec_id, label, v, CAST(vec_id % 2 AS INT) AS half FROM vec),
pos AS (
  SELECT label, half, vec_id, t.range AS pos, v[t.range + 1] AS x
  FROM v2, range({S.EMBED_DIM}) t
),
cent AS (
  SELECT label, half, pos,
         list_reduce(list_prepend(0.0, list(x ORDER BY vec_id)),
                     (a, b) -> a + b) AS sx,
         COUNT(*) AS nx
  FROM pos GROUP BY 1, 2, 3
),
cvec AS (
  SELECT label, half, list(sx / nx ORDER BY pos) AS centroid
  FROM cent GROUP BY 1, 2
),
counts AS (SELECT label, half, COUNT(*) AS n FROM v2 GROUP BY 1, 2)
SELECT a.label,
       CAST(na.n AS BIGINT) AS n_even,
       CAST(nb.n AS BIGINT) AS n_odd,
       round({_sqdist_sql("a.centroid", "b.centroid")}, 4) AS shift2_r
FROM (SELECT * FROM cvec WHERE half = 0) a
JOIN (SELECT * FROM cvec WHERE half = 1) b USING (label)
JOIN (SELECT * FROM counts WHERE half = 0) na ON na.label = a.label
JOIN (SELECT * FROM counts WHERE half = 1) nb ON nb.label = a.label
"""

# -------------------------------------------- quality drift decomp


def q_quality_drift_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder style decomposition of the corpus quality change
    between the doc_id-parity halves: per source, the MIX term
    (p₂-p₁)·m₁ (share moved, old quality held) and the WITHIN term
    p₂·(m₂-m₁) (share held at new level, quality moved), in
    milli-bp — their corpus sums add up exactly to the quantized total
    change, so 'quality dropped because the mix shifted toward worse
    sources' and 'the sources themselves got worse' are separated
    numbers. All integer: shares and means are bp (quantize-first),
    products land in milli via DIV 10."""
    docs = load_split(spark, sf_dir, "documents")
    q = with_quality(docs).join(docs.select("doc_id", "source"), "doc_id")
    q = q.withColumn("is_old", (F.col("doc_id") % 2 == 0))
    per = q.groupBy("source").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.sum(F.when(F.col("is_old"), F.col("quality_bp")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(~F.col("is_old"), F.col("quality_bp")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
    )
    tot = per.agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c2").cast("bigint").alias("t2"),
    )
    # shares (bp of the half) and means (bp) quantized FIRST; the
    # mix/within products are bp*bp = at most 1e8, scaled to milli-bp
    # via DIV 10000 * 1000 == DIV 10 — int64 at any volume.
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr("CAST((10000 * c1) DIV t1 AS BIGINT)").alias("p1_bp"),
        F.expr("CAST((10000 * c2) DIV t2 AS BIGINT)").alias("p2_bp"),
        F.expr(
            "CAST(CASE WHEN c1 > 0 THEN s1 DIV c1 ELSE 0 END AS BIGINT)"
        ).alias("m1_bp"),
        F.expr(
            "CAST(CASE WHEN c2 > 0 THEN s2 DIV c2 ELSE 0 END AS BIGINT)"
        ).alias("m2_bp"),
        F.expr(
            "CAST((((10000 * c2) DIV t2 - (10000 * c1) DIV t1)"
            " * (CASE WHEN c1 > 0 THEN s1 DIV c1 ELSE 0 END)) DIV 10"
            " AS BIGINT)"
        ).alias("mix_milli"),
        F.expr(
            "CAST((((10000 * c2) DIV t2)"
            " * ((CASE WHEN c2 > 0 THEN s2 DIV c2 ELSE 0 END)"
            "    - (CASE WHEN c1 > 0 THEN s1 DIV c1 ELSE 0 END))) DIV 10"
            " AS BIGINT)"
        ).alias("within_milli"),
    )


_DECOMP_SQL = f"""
WITH q AS ({_TEXT_ORACLES["q_quality"]}),
j AS (
  SELECT d.source, q.quality_bp, q.doc_id % 2 = 0 AS is_old
  FROM q JOIN documents d USING (doc_id)
),
per AS (
  SELECT source,
         SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS c2,
         SUM(CASE WHEN is_old THEN quality_bp ELSE 0 END) AS s1,
         SUM(CASE WHEN is_old THEN 0 ELSE quality_bp END) AS s2
  FROM j GROUP BY 1
),
tot AS (SELECT SUM(c1) AS t1, SUM(c2) AS t2 FROM per)
SELECT source,
       CAST((10000 * c1) // t1 AS BIGINT) AS p1_bp,
       CAST((10000 * c2) // t2 AS BIGINT) AS p2_bp,
       CAST(CASE WHEN c1 > 0 THEN s1 // c1 ELSE 0 END AS BIGINT) AS m1_bp,
       CAST(CASE WHEN c2 > 0 THEN s2 // c2 ELSE 0 END AS BIGINT) AS m2_bp,
       CAST((((10000 * c2) // t2 - (10000 * c1) // t1)
             * (CASE WHEN c1 > 0 THEN s1 // c1 ELSE 0 END)) // 10
            AS BIGINT) AS mix_milli,
       CAST((((10000 * c2) // t2)
             * ((CASE WHEN c2 > 0 THEN s2 // c2 ELSE 0 END)
                - (CASE WHEN c1 > 0 THEN s1 // c1 ELSE 0 END))) // 10
            AS BIGINT) AS within_milli
FROM per, tot
"""

# ------------------------------------------------------ cadence drift


def q_cadence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event cadence drift per event type: gaps between
    a user's consecutive events of a type (WITHIN each half — the lag
    partitions by (type, user, half), so no corpus-serial sort and no
    straddle ambiguity), bucketed on the power-of-two second ladder,
    then the KS-style max cumulative gap between the halves' ladder
    distributions in bp. A rising cadence curve says the producer (or
    the users) changed rhythm — retry storms, batching changes, and
    sessionization bugs all land here first. Gaps are micros
    DIFFERENCES (TZ cancels); everything else integer."""
    e = _halved_events(spark, sf_dir)
    w = Window.partitionBy("event_type", "user_id", "is_old").orderBy(
        "us", "event_id"
    )
    gaps = (
        e.withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            "is_old",
            F.expr(
                "CAST("
                + _gap_bucket_case("((us - prev_us) DIV 1000000)")
                + " AS BIGINT)"
            ).alias("bucket"),
        )
    )
    cells = gaps.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_new"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy("event_type")
    cum = (
        cells.withColumn("cum_old", F.sum("c_old").over(w_cum))
        .withColumn("cum_new", F.sum("c_new").over(w_cum))
        .withColumn("t_old", F.sum("c_old").over(wa))
        .withColumn("t_new", F.sum("c_new").over(wa))
        .filter((F.col("t_old") > 0) & (F.col("t_new") > 0))
        .withColumn(
            "gap_bp",
            F.expr(
                "abs((10000 * cum_old) DIV t_old"
                " - (10000 * cum_new) DIV t_new)"
            ),
        )
    )
    return (
        cum.withColumn("ks_bp", F.max("gap_bp").over(wa))
        .filter(F.col("gap_bp") == F.col("ks_bp"))
        .groupBy("event_type")
        .agg(
            F.max("t_old").cast("bigint").alias("n_gaps_old"),
            F.max("t_new").cast("bigint").alias("n_gaps_new"),
            F.max("ks_bp").cast("bigint").alias("ks_bp"),
            F.min("bucket").cast("bigint").alias("at_bucket"),
        )
    )


_CADENCE_SQL = f"""
WITH mid AS {_MID_SQL},
e AS (
  SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) < mid AS is_old
  FROM events, mid
),
gaps AS (
  SELECT event_type, is_old,
         us - LAG(us) OVER (PARTITION BY event_type, user_id, is_old
                            ORDER BY us, event_id) AS gap_us
  FROM e
),
cells AS (
  SELECT event_type,
         {_gap_bucket_case("(gap_us // 1000000)")} AS bucket,
         SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS c_new
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket,
         SUM(c_old) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_old,
         SUM(c_new) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_new,
         SUM(c_old) OVER (PARTITION BY event_type) AS t_old,
         SUM(c_new) OVER (PARTITION BY event_type) AS t_new
  FROM cells
),
gapped AS (
  SELECT event_type, bucket, t_old, t_new,
         abs((10000 * cum_old) // t_old - (10000 * cum_new) // t_new)
           AS gap_bp,
         MAX(abs((10000 * cum_old) // t_old - (10000 * cum_new) // t_new))
           OVER (PARTITION BY event_type) AS ks_bp
  FROM cum WHERE t_old > 0 AND t_new > 0
)
SELECT event_type,
       CAST(MAX(t_old) AS BIGINT) AS n_gaps_old,
       CAST(MAX(t_new) AS BIGINT) AS n_gaps_new,
       CAST(MAX(ks_bp) AS BIGINT) AS ks_bp,
       CAST(MIN(bucket) AS BIGINT) AS at_bucket
FROM gapped WHERE gap_bp = ks_bp
GROUP BY event_type
"""

# ----------------------------------------------------- dup rate drift


def q_dup_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-day duplicate-payload pressure per day — dup_bp =
    (n - distinct digests) / n — with the pooled old-half vs new-half
    delta attached (days split by their position on the bounded day
    spine: the first ceil(D/2) days are 'old'). Rising duplicate
    pressure is the upstream-retry alarm that sizes the dedup stage
    before it pages. Digest groupBy per day + spine arithmetic; all
    integer."""
    events = load(spark, sf_dir, "events")
    keyed = events.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        sentinel_digest(
            F.col("event_type"),
            F.col("props"),
            F.col("user_id").cast("string"),
        ).alias("dg"),
    )
    daily = keyed.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("dg").cast("bigint").alias("nd"),
    )
    w = Window.orderBy("day")
    spine = daily.withColumn("rk", F.row_number().over(w)).crossJoin(
        F.broadcast(daily.agg(F.count("*").cast("bigint").alias("d")))
    ).withColumn("is_old", F.expr("rk <= (d + 1) DIV 2"))
    pooled = spine.groupBy("is_old").agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("nd").cast("bigint").alias("tnd"),
    ).withColumn(
        "rate_bp", F.expr("CAST((10000 * (tn - tnd)) DIV tn AS BIGINT)")
    )
    p_old = pooled.filter(F.col("is_old")).select(
        F.col("rate_bp").alias("old_rate_bp")
    )
    p_new = pooled.filter(~F.col("is_old")).select(
        F.col("rate_bp").alias("new_rate_bp")
    )
    return (
        spine.crossJoin(F.broadcast(p_old))
        .crossJoin(F.broadcast(p_new))
        .select(
            "day",
            "n",
            F.col("nd").alias("n_distinct"),
            F.expr("CAST((10000 * (n - nd)) DIV n AS BIGINT)").alias(
                "dup_bp"
            ),
            F.col("is_old").cast("bigint").alias("is_old"),
            F.expr("CAST(new_rate_bp - old_rate_bp AS BIGINT)").alias(
                "delta_bp"
            ),
        )
    )


_DUP_DRIFT_SQL = f"""
WITH keyed AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         {_DG} AS dg
  FROM events
),
daily AS (
  SELECT day, COUNT(*) AS n, COUNT(DISTINCT dg) AS nd
  FROM keyed GROUP BY 1
),
spine AS (
  SELECT day, n, nd,
         ROW_NUMBER() OVER (ORDER BY day) AS rk,
         COUNT(*) OVER () AS d
  FROM daily
),
halved AS (SELECT *, rk <= (d + 1) // 2 AS is_old FROM spine),
pooled AS (
  SELECT is_old, (10000 * (SUM(n) - SUM(nd))) // SUM(n) AS rate_bp
  FROM halved GROUP BY 1
)
SELECT h.day,
       CAST(h.n AS BIGINT) AS n,
       CAST(h.nd AS BIGINT) AS n_distinct,
       CAST((10000 * (h.n - h.nd)) // h.n AS BIGINT) AS dup_bp,
       CAST(h.is_old AS BIGINT) AS is_old,
       CAST(pn.rate_bp - po.rate_bp AS BIGINT) AS delta_bp
FROM halved h,
     (SELECT rate_bp FROM pooled WHERE is_old) po,
     (SELECT rate_bp FROM pooled WHERE NOT is_old) pn
"""

# ----------------------------------------------------------- registry

QUERIES = {
    "q_psi_drift": q_psi_drift,
    "q_ks_drift": q_ks_drift,
    "q_mix_drift_chi2": q_mix_drift_chi2,
    "q_acf_daily": q_acf_daily,
    "q_dispersion_drift": q_dispersion_drift,
    "q_tost_equivalence": q_tost_equivalence,
    "q_novel_rate": q_novel_rate,
    "q_schema_drift": q_schema_drift,
    "q_embedding_drift": q_embedding_drift,
    "q_quality_drift_decomp": q_quality_drift_decomp,
    "q_cadence_drift": q_cadence_drift,
    "q_dup_rate_drift": q_dup_rate_drift,
}

ORACLES = {
    "q_psi_drift": _PSI_SQL,
    "q_ks_drift": _KS_SQL,
    "q_mix_drift_chi2": _MIX_SQL,
    "q_acf_daily": _acf_sql(),
    "q_dispersion_drift": _DISPERSION_SQL,
    "q_tost_equivalence": _TOST_SQL,
    "q_novel_rate": _NOVEL_SQL,
    "q_schema_drift": _SCHEMA_SQL,
    "q_embedding_drift": _EMBED_DRIFT_SQL,
    "q_quality_drift_decomp": _DECOMP_SQL,
    "q_cadence_drift": _CADENCE_SQL,
    "q_dup_rate_drift": _DUP_DRIFT_SQL,
}
