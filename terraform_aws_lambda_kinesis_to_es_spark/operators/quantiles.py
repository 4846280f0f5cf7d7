"""Sample-quantile bucket assignment — the scale path for global
ordered cuts (deciles, percentile bands) that a window over the whole
corpus cannot provide at 100 TB.

``q_score_calibration`` (and ``q_token_budget``) cut deciles with ONE
global-ordered window — correct and cheap at test scale, but a global
sort at 100 TB. Their docstrings document the standard replacement;
this module IS that replacement:

1. take a deterministic hash sample of the scores (no RNG state — any
   executor re-derives membership);
2. compute exact bucket boundaries ON THE SAMPLE with one tiny window
   (the sample is bounded, e.g. ~0.5% of rows, so the sort is cheap);
3. broadcast the <= n_buckets-1 boundary rows and assign every corpus
   row its bucket with a row-local comparison — map-only, no global
   exchange of the corpus.

The assignment agrees with the exact NTILE cut everywhere except
within sampling error of each boundary (ties share a bucket rather
than splitting NTILE-style); bucket populations are n/k within
O(1/sqrt(sample size)) relative error — the usual reservoir-quantile
guarantee. Determinism: the sample gate is hash60(id) and the
boundary ranks are exact integer ranks over (score, id), so the same
inputs produce the same buckets on every run and cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60


def sample_quantile_bounds(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
    sample_bp: int = 500,
) -> DataFrame:
    """Bucket boundaries from a deterministic hash sample: rows with
    hash60(id) % 10000 < ``sample_bp`` enter the sample; the boundary
    for bucket b (1..n_buckets-1) is the sample's exact value at rank
    ceil(b * n_sample / n_buckets) under (score asc, id asc). Returns
    (bucket, bound, n) with n_buckets-1 rows (n = the sample size, the
    same on every row, so the caller never re-scans the corpus for it —
    round-10 review) — broadcastable by construction. The window below
    runs ONLY on the bounded sample. NULL scores are excluded from the
    sample (they are unrankable; see assign_sample_quantile_buckets for
    the NULL-row contract)."""
    sampled = df.filter(
        hash60(F.col(id_col).cast("string")) % 10000 < sample_bp
    ).filter(F.col(score_col).isNotNull()).select(
        F.col(score_col).alias("s"), F.col(id_col).alias("i")
    )
    w = Window.orderBy(F.col("s").asc(), F.col("i").asc())
    ranked = sampled.select(
        "s", F.row_number().over(w).alias("rk")
    ).crossJoin(
        F.broadcast(sampled.groupBy().agg(F.count("*").alias("n")))
    )
    # rank ceil(b*n/k) for each interior boundary b
    bounds = (
        ranked.crossJoin(
            F.broadcast(
                df.sparkSession.range(1, n_buckets).select(
                    F.col("id").cast("int").alias("bucket")
                )
            )
        )
        .filter(
            F.col("rk")
            == F.expr(f"CAST((bucket * n + {n_buckets - 1}) DIV {n_buckets} AS INT)")
        )
        .select("bucket", F.col("s").alias("bound"), "n")
    )
    return bounds


def assign_sample_quantile_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
    sample_bp: int = 500,
    bucket_col: str = "bucket",
    descending: bool = False,
) -> DataFrame:
    """Assign every row a bucket 1..n_buckets by comparing its score to
    the broadcast sample boundaries — row-local, no corpus-wide
    exchange. ``descending=True`` makes bucket 1 the HIGHEST scores
    (the q_score_calibration decile orientation). Rows equal to a
    boundary land in the lower bucket index (ties share a bucket).

    NULL-score rows get a NULL bucket on BOTH paths (an unrankable
    score belongs to no quantile; silently binning NULLs into bucket 1
    was the round-10 review's crash-adjacent finding — the sample
    excludes them, so a NULL landing on a boundary rank can no longer
    TypeError the driver-side sort).

    Degenerate-sample guard (ADVICE r9): when the hash sample holds
    fewer than ``n_buckets`` rows (tiny corpus, or sparse ids at this
    ``sample_bp``), boundary extraction cannot honor the n/k population
    guarantee — everything would silently land in one bucket. That
    case falls back to the exact NTILE window over (score, id), which
    is cheap precisely because the corpus is small whenever the sample
    is; at real scale the sample is never that small. (The fallback
    window partitions on score-is-NULL, so the NTILE cut ranks exactly
    the non-null rows; the NULL partition's numbers are discarded.)"""
    rows = sample_quantile_bounds(
        df, score_col, id_col, n_buckets=n_buckets, sample_bp=sample_bp
    ).collect()  # <= n_buckets-1 rows, each carrying the sample size n
    n_sample = rows[0]["n"] if rows else 0
    score: Column = F.col(score_col)
    if n_sample < n_buckets:
        order = (
            [score.desc(), F.col(id_col).desc()]
            if descending
            else [score.asc(), F.col(id_col).asc()]
        )
        w = Window.partitionBy(score.isNull()).orderBy(*order)
        return df.withColumn(
            bucket_col,
            F.when(score.isNotNull(), F.ntile(n_buckets).over(w)).cast(
                "bigint"
            ),
        )
    bs = sorted(r["bound"] for r in rows)
    # bucket = 1 + number of boundaries strictly below the score; the
    # boundary array is a driver-side literal (it came from a <=
    # n_buckets-1-row collect), so assignment is map-only
    asc_bucket = F.lit(1) + F.size(
        F.filter(F.array(*[F.lit(b) for b in bs]), lambda b: b < score)
    )
    if descending:
        asc_bucket = F.lit(n_buckets + 1) - asc_bucket
    return df.withColumn(
        bucket_col, F.when(score.isNotNull(), asc_bucket).cast("bigint")
    )
