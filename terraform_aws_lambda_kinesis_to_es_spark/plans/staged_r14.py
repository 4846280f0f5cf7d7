"""Staged round-14 queries — built in round 11 (front-loading the
round-12 staging burden), NOT declared: the round-12 and round-13
windows are already allocated (_R12_HEAD_PLAN / _R13_HEAD_PLAN in
plans/__init__.py). Promote QUERIES/ORACLES into the round-14 head
verbatim, alongside the 19-name r8 residue and the first 19 r9-tier
names (promotion arithmetic: 12 + 19 + 19 = 50; write the explicit
_R14_HEAD_PLAN from CORRECTNESS_r09 order at promotion time).

Theme: CURATION GOVERNANCE & ADVANCED STATISTICS — the policy and
release-gate audits around the pipeline: privacy diversity, forecast
and burst monitoring on the event stream, mixture rebalancing, dedup
policy sensitivity and its survivorship bias, projection/quantization
calibration for the vector path, QA sampling rosters, and behavioral
diversity:

- q_l_diversity        — l-diversity of the sensitive attribute within
                         quasi-identifier classes (the release gate
                         k-anonymity alone misses: a uniform class
                         leaks the attribute even at k)
- q_mase_forecast      — seasonal-naive forecast error (MASE, exact
                         bp) of daily event volume over a holdout week
- q_event_bursts       — sub-hourly burst windows vs the global median
                         window load (the rate-spike monitor next to
                         q_anomaly_days' daily z-scores)
- q_cache_hit_curve    — perfect-LFU cache hit rate vs cache size over
                         the event key distribution (serving-cache
                         sizing from observed skew)
- q_mixture_rebalance  — capped down-sampling rates per language to
                         hit a uniform token target (the mix knob
                         next to q_temperature_mix's sqrt weights)
- q_dup_threshold_sensitivity — dedup mass vs Jaccard threshold over
                         ONE verified pair set (the threshold knob's
                         curve; q_band_yield tunes the banding, this
                         tunes the cut)
- q_dedup_survivor_bias — source-mix shift caused by keep-min exact
                         dedup (survivorship bias of the dedup policy)
- q_pair_sample_audit  — deterministic 10% QA sample of verified
                         near-dup pairs, stratified by Jaccard decile
                         (the human-labeling roster)
- q_label_propagation  — two unrolled majority-label-propagation
                         rounds over the near-dup graph (community
                         smoothing of the lang label; fixed-iteration,
                         so SQL-expressible like q_dup_clusters' CC)
- q_jl_distortion      — random-projection (sign matrix) distance
                         distortion histogram on a bounded pair panel
                         (the Johnson-Lindenstrauss check run before
                         trusting a projected index)
- q_quant_calibration  — per-dimension p1/p99 clip bounds by exact
                         rank (int8 quantization calibration; raw
                         value picks, no float arithmetic)
- q_type_gini          — per-user Gini-Simpson diversity of event
                         types in exact bp (behavioral diversity)

Cross-engine determinism: id/count arithmetic and integer bp/milli
via DIV throughout; the only float outputs are raw stored values
picked by integer rank (q_quant_calibration) or order-pinned
fixed-term fold expressions (q_jl_distortion's projection sums — the
sign matrix is a Python-side constant embedded identically in both
engines' expressions, so every double is bit-identical).

Reference citation: the reference engine (lambda/main.py, 174 lines)
has no governance/statistics layer; these extend the repo's
training-data north star (SURVEY.md §2 extensions), following the
audit-query pattern of q_k_anonymity / q_quality_sweep / q_lsh_tuning.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens
from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
    _PAIR_JACCARD,
    JACCARD_THRESHOLD_BP,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _sq_l2_full_sql,
    _vec,
    _VEC_CTE,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import _TOKS
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# ------------------------------------------------------- l-diversity

LDIV_L = 3  # minimum distinct sensitive values per QI class
LDIV_SIZE_BUCKET = 100  # n_chars bucket width for the quasi-identifier


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit on the (lang, length-bucket) quasi-identifier
    with `source` as the sensitive attribute: per equivalence class,
    its size, the number of DISTINCT sensitive values, and whether it
    falls below l=LDIV_L. The gate k-anonymity alone misses — a class
    of 50 rows all from one source still identifies the source
    (Machanavajjhala et al., ICDE 2006 — public literature). One
    grouped aggregation; QI cardinality bounds the output."""
    docs = load_split(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            F.expr(f"n_chars DIV {LDIV_SIZE_BUCKET}").cast("bigint").alias(
                "size_bucket"
            ),
        )
        .agg(
            F.count("*").cast("bigint").alias("k_rows"),
            F.countDistinct("source").cast("bigint").alias("l_distinct"),
        )
        .withColumn(
            "at_risk", (F.col("l_distinct") < LDIV_L).cast("bigint")
        )
    )


_L_DIVERSITY_SQL = f"""
SELECT lang,
       CAST(n_chars // {LDIV_SIZE_BUCKET} AS BIGINT) AS size_bucket,
       CAST(COUNT(*) AS BIGINT) AS k_rows,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS l_distinct,
       CAST(COUNT(DISTINCT source) < {LDIV_L} AS BIGINT) AS at_risk
FROM documents
GROUP BY 1, 2
"""

# ----------------------------------------------------- MASE forecast

MASE_EVAL_DAYS = 7


def q_mase_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast audit: over the last MASE_EVAL_DAYS of
    daily event volume, compare the weekly-seasonal-naive forecast
    (x[d-7]) against the naive baseline (x[d-1]) via MASE in exact
    basis points (Hyndman & Koehler 2006 — public literature): 10000 *
    sum|x_d - x_{{d-7}}| DIV sum|x_d - x_{{d-1}}|. Below 10000 means
    weekly seasonality carries signal — the go/no-go for
    seasonality-aware capacity planning. All-integer; the day spine is
    bounded by the trace's span, so the unpartitioned lag window is
    spine-sized, never corpus-sized. The spine is DENSE (generated
    from min to max day, zero-filled): LAG(n, 7) over only the
    observed days would silently compare across a gap whenever a day
    has no events, misaligning the weekly season."""
    events = load(spark, sf_dir, "events")
    observed = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    span = observed.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    )
    daily = (
        spine.join(observed, "d", "left")
        .select(
            F.col("d").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 7).over(w).alias("n7"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("nd"),
    )
    ev = lagged.filter(
        (F.col("rn") > F.col("nd") - MASE_EVAL_DAYS) & (F.col("rn") > 7)
    )
    return ev.agg(
        F.count("*").cast("bigint").alias("n_eval_days"),
        F.sum(F.abs(F.col("n") - F.col("n7"))).cast("bigint").alias("mae_sn"),
        F.sum(F.abs(F.col("n") - F.col("n1"))).cast("bigint").alias("mae_naive"),
        F.expr(
            "CAST((10000 * SUM(ABS(n - n7))) DIV GREATEST(SUM(ABS(n - n1)), 1)"
            " AS BIGINT)"
        ).alias("mase_bp"),
    )


_MASE_SQL = f"""
WITH observed AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series((SELECT MIN(d) FROM observed),
                                (SELECT MAX(d) FROM observed),
                                INTERVAL 1 DAY))::DATE AS d
),
daily AS (
  SELECT CAST(s.d AS VARCHAR) AS day, COALESCE(o.n, 0) AS n
  FROM spine s LEFT JOIN observed o ON s.d = o.d
),
lagged AS (
  SELECT day, n,
         LAG(n, 1) OVER (ORDER BY day) AS n1,
         LAG(n, 7) OVER (ORDER BY day) AS n7,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS nd
  FROM daily
),
ev AS (
  SELECT * FROM lagged WHERE rn > nd - {MASE_EVAL_DAYS} AND rn > 7
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_days,
       CAST(SUM(ABS(n - n7)) AS BIGINT) AS mae_sn,
       CAST(SUM(ABS(n - n1)) AS BIGINT) AS mae_naive,
       CAST((10000 * SUM(ABS(n - n7))) // GREATEST(SUM(ABS(n - n1)), 1)
            AS BIGINT) AS mase_bp
FROM ev
"""

# ------------------------------------------------------ event bursts

BURST_WINDOW_US = 900_000_000  # 15-minute windows
BURST_FACTOR = 2  # a window is a burst above FACTOR x median load


def q_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-hourly burst monitor: bucket events into fixed 15-minute
    windows, take the GLOBAL median window load (lower median by
    integer rank — engine-exact), and count windows above
    BURST_FACTOR x median. The rate-spike twin of q_anomaly_days
    (which scores DAYS against a trailing week): bursts are what size
    ingestion buffers and trigger autoscaling. Window count is bounded
    by the trace's time span, so the rank sort is spine-sized."""
    events = load(spark, sf_dir, "events")
    wins = events.groupBy(
        F.expr(f"unix_micros(ts) DIV {BURST_WINDOW_US}").alias("win")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.orderBy(F.col("c").asc(), F.col("win").asc())
    ranked = wins.withColumn("rn", F.row_number().over(w))
    med = (
        ranked.crossJoin(
            F.broadcast(wins.agg(F.count("*").cast("bigint").alias("nw")))
        )
        .filter(F.col("rn") == F.expr("(nw + 1) DIV 2"))
        .select(F.col("c").alias("median_c"))
    )
    return (
        wins.crossJoin(F.broadcast(med))
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.min("median_c").cast("bigint").alias("median_count"),
            F.sum(
                (F.col("c") > F.lit(BURST_FACTOR) * F.col("median_c")).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("n_bursts"),
            F.expr(
                f"CAST((10000 * SUM(CASE WHEN c > {BURST_FACTOR} * median_c"
                " THEN 1 ELSE 0 END)) DIV COUNT(*) AS BIGINT)"
            ).alias("burst_bp"),
        )
    )


_BURSTS_SQL = f"""
WITH wins AS (
  SELECT epoch_us(ts) // {BURST_WINDOW_US} AS win, COUNT(*) AS c
  FROM events GROUP BY 1
),
med AS (
  SELECT c AS median_c FROM (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, win ASC) AS rn,
           COUNT(*) OVER () AS nw
    FROM wins
  ) WHERE rn = (nw + 1) // 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MIN(median_c) AS BIGINT) AS median_count,
       CAST(SUM(CASE WHEN c > {BURST_FACTOR} * median_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bursts,
       CAST((10000 * SUM(CASE WHEN c > {BURST_FACTOR} * median_c
                              THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS burst_bp
FROM wins, med
"""

# --------------------------------------------------- cache hit curve

CACHE_SIZES = (10, 50, 100)


def q_cache_hit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-cache sizing from observed key skew: the hit rate (bp) a
    perfect-LFU cache of each size would achieve over the event
    stream's user_id request distribution — hit_bp(N) = requests to
    the N most frequent keys DIV total. Reads the Zipf mass directly;
    the knee of this curve IS the cache size to buy. One keyed count
    (bounded by distinct keys), one rank over that spine, one
    conditional aggregate."""
    events = load(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("user_id").asc())
    ranked = per_key.withColumn("rnk", F.row_number().over(w))
    agg = ranked.agg(
        F.sum("c").cast("bigint").alias("total"),
        *[
            F.sum(F.when(F.col("rnk") <= n, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias(f"top{n}")
            for n in CACHE_SIZES
        ],
    )
    rows = [
        F.struct(
            F.lit(n).cast("bigint").alias("cache_size"),
            F.expr(f"CAST((10000 * top{n}) DIV total AS BIGINT)").alias("hit_bp"),
        )
        for n in CACHE_SIZES
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


_CACHE_TOPS = ",\n       ".join(
    f"SUM(CASE WHEN rnk <= {n} THEN c ELSE 0 END) AS top{n}" for n in CACHE_SIZES
)
_CACHE_BLOCKS = "\nUNION ALL\n".join(
    f"SELECT CAST({n} AS BIGINT) AS cache_size,"
    f" CAST((10000 * top{n}) // total AS BIGINT) AS hit_bp FROM a"
    for n in CACHE_SIZES
)

_CACHE_HIT_SQL = f"""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id ASC) AS rnk
  FROM per_key
),
a AS (
  SELECT SUM(c) AS total,
       {_CACHE_TOPS}
  FROM ranked
)
{_CACHE_BLOCKS}
"""

# ------------------------------------------------- mixture rebalance


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing to a uniform language target: per lang, the
    current token share (bp), the uniform target share, and the capped
    down-sampling rate (bp) that moves the mix toward the target —
    rate = min(10000, 10000 * target DIV share); over-represented
    languages are down-sampled, under-represented ones keep everything
    (up-sampling is q_repeat_upsample's job). The deterministic knob
    next to q_temperature_mix's sqrt weights. One scan + one keyed agg
    + one single-row totals attach."""
    docs = load_split(spark, sf_dir, "documents")
    per_lang = docs.withColumn(
        "n_tokens", F.size(tokens(F.lower(F.col("text")))).cast("bigint")
    ).groupBy("lang").agg(F.sum("n_tokens").cast("bigint").alias("toks"))
    tot = per_lang.agg(
        F.sum("toks").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    j = per_lang.crossJoin(F.broadcast(tot))
    share = F.expr("CAST((10000 * toks) DIV total AS BIGINT)")
    target = F.expr("CAST(10000 DIV n_langs AS BIGINT)")
    rate = F.expr(
        "CAST(LEAST(10000, (10000 * (10000 DIV n_langs))"
        " DIV GREATEST((10000 * toks) DIV total, 1)) AS BIGINT)"
    )
    return j.select(
        "lang",
        F.col("toks").alias("n_tokens"),
        share.alias("share_bp"),
        target.alias("target_bp"),
        rate.alias("rate_bp"),
        F.expr(
            "CAST((toks * LEAST(10000, (10000 * (10000 DIV n_langs))"
            " DIV GREATEST((10000 * toks) DIV total, 1))) DIV 10000 AS BIGINT)"
        ).alias("kept_tokens"),
    )


_MIX_SQL = f"""
WITH per_lang AS (
  SELECT lang, SUM(len({_TOKS})) AS toks FROM documents GROUP BY lang
),
tot AS (SELECT SUM(toks) AS total, COUNT(*) AS n_langs FROM per_lang)
SELECT lang,
       CAST(toks AS BIGINT) AS n_tokens,
       CAST((10000 * toks) // total AS BIGINT) AS share_bp,
       CAST(10000 // n_langs AS BIGINT) AS target_bp,
       CAST(LEAST(10000, (10000 * (10000 // n_langs))
            // GREATEST((10000 * toks) // total, 1)) AS BIGINT) AS rate_bp,
       CAST((toks * LEAST(10000, (10000 * (10000 // n_langs))
            // GREATEST((10000 * toks) // total, 1))) // 10000 AS BIGINT)
         AS kept_tokens
FROM per_lang, tot
"""

# --------------------------------------- dup threshold sensitivity

DUP_THRESHOLDS_BP = (5000, 6500, 8000)  # all >= the detector's verify cut


def q_dup_threshold_sensitivity(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Dedup-mass sensitivity to the Jaccard cut: from ONE verified
    pair set (the declared detector at its tuned verify threshold —
    every sweep threshold is >= it, so banding recall is inherited,
    never re-risked), the surviving pair count and the docs removed
    under the PAIRWISE keep-smaller rule (a doc is removed iff it has
    a smaller-id near-dup at >= t, i.e. distinct doc_b). On chain
    components this differs from the transitive cluster-collapse
    policy — that variant is q_dup_clusters / q_dedup_keep_best's
    declared contract; the pairwise count is the cut-sensitivity
    signal at a per-threshold filter's cost, no CC iteration.
    q_band_yield tunes the banding; THIS tunes the cut you apply to
    its output — the last knob before a dedup run deletes data.
    Detector cost paid once (persisted); each threshold row is a
    filter + two aggregates over the bounded pair set.

    Cache lifecycle (r11 ADVICE, the cms_sketch pattern): the persisted
    pair set feeds every threshold leg inside the returned lazy plan,
    so it cannot be unpersisted here. Batch callers rely on the house
    clearCache-between-queries rule (bench.py) or LRU eviction;
    long-lived sessions pass ``cache_registry`` (a list) and unpersist
    after their terminal action — ``for f in reg: f.unpersist()``."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(
        docs, threshold_bp=JACCARD_THRESHOLD_BP
    ).persist()
    if cache_registry is not None:
        cache_registry.append(pairs)

    def one(t: int) -> DataFrame:
        ft = pairs.filter(F.col("jaccard_bp") >= t)
        return ft.agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_b").cast("bigint").alias("n_docs_removed"),
        ).select(
            F.lit(t).cast("bigint").alias("threshold_bp"),
            "n_pairs",
            "n_docs_removed",
        )

    return reduce(DataFrame.unionAll, [one(t) for t in DUP_THRESHOLDS_BP])


def _thresh_block_sql(t: int) -> str:
    return f"""
SELECT CAST({t} AS BIGINT) AS threshold_bp,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_removed
FROM pairs WHERE jaccard_bp >= {t}
"""


_THRESH_SQL = _PAIR_JACCARD + "\nUNION ALL\n".join(
    _thresh_block_sql(t) for t in DUP_THRESHOLDS_BP
)

# --------------------------------------------- dedup survivor bias


def q_dedup_survivor_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship bias of keep-min exact dedup: per source, its share
    of the corpus (bp) BEFORE and AFTER collapsing exact-duplicate
    texts to the min doc_id, and the shift. A source whose share drops
    is a boilerplate re-publisher; a rising share means the dedup
    policy silently reweights the mix toward it — the post-hoc audit
    every dedup run should ship with. The keep rule is the declared
    operators.dedup.exact_dedup (reused, not re-derived); one digest
    groupBy + two keyed rollups + one totals attach. The before→after
    join is LEFT (n_after coalesced to 0): a source whose every doc is
    removed is the most extreme survivorship case and must still
    report."""
    docs = load_split(spark, sf_dir, "documents")
    keep = D.exact_dedup(docs)
    surv = docs.join(
        keep.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    before = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_before"))
    after = surv.groupBy("source").agg(F.count("*").cast("bigint").alias("n_after"))
    tot = before.agg(F.sum("n_before").cast("bigint").alias("tb")).crossJoin(
        F.broadcast(after.agg(F.sum("n_after").cast("bigint").alias("ta")))
    )
    return (
        before.join(after, "source", "left")
        .withColumn("n_after", F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_before",
            "n_after",
            F.expr("CAST((10000 * n_before) DIV tb AS BIGINT)").alias("before_bp"),
            F.expr("CAST((10000 * n_after) DIV ta AS BIGINT)").alias("after_bp"),
            F.expr(
                "CAST((10000 * n_after) DIV ta - (10000 * n_before) DIV tb"
                " AS BIGINT)"
            ).alias("shift_bp"),
        )
    )


_SURVIVOR_SQL = """
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
before AS (SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source),
after AS (
  SELECT d.source, COUNT(*) AS n_after
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id
  GROUP BY d.source
),
tot AS (
  SELECT (SELECT SUM(n_before) FROM before) AS tb,
         (SELECT SUM(n_after) FROM after) AS ta
)
SELECT b.source,
       CAST(n_before AS BIGINT) AS n_before,
       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
       CAST((10000 * n_before) // tb AS BIGINT) AS before_bp,
       CAST((10000 * COALESCE(n_after, 0)) // ta AS BIGINT) AS after_bp,
       CAST((10000 * COALESCE(n_after, 0)) // ta
            - (10000 * n_before) // tb AS BIGINT) AS shift_bp
FROM before b LEFT JOIN after a ON b.source = a.source, tot
"""

# --------------------------------------------- pair sample audit

PAIR_SAMPLE_PCT = 10  # deterministic 10% QA sample


def q_pair_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA sampling roster for the near-dup detector: verified pairs
    stratified by Jaccard decile, with the size of a deterministic
    PAIR_SAMPLE_PCT% hash sample per stratum — the roster handed to
    human labelers to estimate detector precision per similarity band
    (sampling by hash of the pair key is reproducible across runs and
    engines, unlike df.sample). Detector cost + a bounded rollup."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    h = hash60(
        F.concat_ws("_", F.col("doc_a").cast("string"), F.col("doc_b").cast("string"))
    )
    return (
        pairs.select(
            F.expr("jaccard_bp DIV 1000").cast("bigint").alias("decile"),
            (h % 100 < PAIR_SAMPLE_PCT).cast("bigint").alias("sampled"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("sampled").cast("bigint").alias("n_sampled"),
        )
    )


_PAIR_H = hash60_sql("CAST(doc_a AS VARCHAR) || '_' || CAST(doc_b AS VARCHAR)")

_PAIR_SAMPLE_SQL = (
    _PAIR_JACCARD
    + f""",
filt AS (SELECT doc_a, doc_b, jaccard_bp FROM pairs
         WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP})
SELECT CAST(jaccard_bp // 1000 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN ({_PAIR_H} % 100) < {PAIR_SAMPLE_PCT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM filt GROUP BY 1
"""
)

# -------------------------------------------- label propagation

LP_ROUNDS = 2


def q_label_propagation(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Two unrolled rounds of majority label propagation over the
    verified near-dup graph, seeded with the lang column: each round,
    a node with neighbors takes the majority label among them (ties to
    the lexicographically smallest; isolated nodes keep theirs). The
    community-smoothing pass that flags documents whose language label
    disagrees with their duplication neighborhood — mislabeled
    near-translations surface as changed rows. Fixed iteration count
    keeps it SQL-expressible (the q_dup_clusters CC discipline); each
    round is one edge join + one keyed majority vote, output-shaped by
    the pair set. The pair set is PERSISTED: the edges union references
    it twice and every vote round re-reads it — without the persist the
    whole LSH candidate+verify lineage re-executes per consumer (the
    q_dup_threshold_sensitivity discipline; cut the 100x wall
    severalfold). Cache lifecycle: same as that query — in-plan persist,
    bench.py clearCache / LRU for batch callers, ``cache_registry`` for
    long-lived sessions."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(
        docs, threshold_bp=JACCARD_THRESHOLD_BP
    ).persist()
    if cache_registry is not None:
        cache_registry.append(pairs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = docs.select("doc_id", F.col("lang").alias("label"))

    def one_round(lab: DataFrame) -> DataFrame:
        nb = edges.join(
            lab.select(F.col("doc_id").alias("dst"), F.col("label").alias("nl")),
            "dst",
        )
        votes = nb.groupBy("src", "nl").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("src").orderBy(
            F.col("cnt").desc(), F.col("nl").asc()
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("doc_id"), F.col("nl").alias("new_label"))
        )
        return lab.join(winner, "doc_id", "left").select(
            "doc_id",
            F.coalesce("new_label", "label").alias("label"),
        )

    cur = labels
    for _ in range(LP_ROUNDS):
        cur = one_round(cur)
    return (
        labels.select("doc_id", F.col("label").alias("lang0"))
        .join(cur.select("doc_id", F.col("label").alias("lang_final")), "doc_id")
        .withColumn(
            "changed", (F.col("lang0") != F.col("lang_final")).cast("bigint")
        )
    )


def _lp_round_sql(prev: str, out: str) -> str:
    return f""",
{out}_votes AS (
  SELECT e.src, p.label AS nl, COUNT(*) AS cnt
  FROM edges e JOIN {prev} p ON e.dst = p.doc_id
  GROUP BY e.src, p.label
),
{out} AS (
  SELECT l.doc_id,
         COALESCE(w.nl, l.label) AS label
  FROM {prev} l LEFT JOIN (
    SELECT src, nl FROM (
      SELECT src, nl,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cnt DESC, nl ASC) AS rn
      FROM {out}_votes
    ) WHERE rn = 1
  ) w ON l.doc_id = w.src
)"""


_LP_SQL = (
    _PAIR_JACCARD
    + f""",
filt AS (SELECT doc_a, doc_b FROM pairs
         WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM filt
  UNION ALL SELECT doc_b, doc_a FROM filt
),
lab0 AS (SELECT doc_id, lang AS label FROM documents)
"""
    + _lp_round_sql("lab0", "lab1")
    + _lp_round_sql("lab1", "lab2")
    + """
SELECT l0.doc_id,
       l0.label AS lang0,
       l2.label AS lang_final,
       CAST(l0.label <> l2.label AS BIGINT) AS changed
FROM lab0 l0 JOIN lab2 l2 ON l0.doc_id = l2.doc_id
"""
)

# ---------------------------------------------- JL distortion

JL_PROJ_D = 16
JL_PANEL = 20
JL_BUCKET_BP = 1000

# Deterministic +/-1 sign matrix (64 x JL_PROJ_D), generated Python-side
# from md5 and embedded as literals in BOTH engines' expressions — no
# engine hash function is involved, so every projected double is the
# same bit pattern on both sides (order-pinned fixed-term sums).
_JL_R = [
    [
        1
        if int(hashlib.md5(f"jl_{j}_{k}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1
        for k in range(JL_PROJ_D)
    ]
    for j in range(S.EMBED_DIM)
]


def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit of a +/-1 random-sign
    projection (Achlioptas 2003 — public literature) from 64 to
    JL_PROJ_D dims: over all pairs of a bounded JL_PANEL-vector panel,
    the normalized squared-distance ratio in bp —
    floor(10000 * d_proj^2 / (d_orig^2 * JL_PROJ_D)), since for a +/-1
    sign matrix E[d_proj^2] = k * d_orig^2 (the estimator divides by
    k) — bucketed into a histogram. Ratios near 10000 mean the projection preserves
    geometry well enough to serve a projected index; a fat tail says
    don't. Panel is fixed (cost independent of corpus); the projection
    sums are literal-matrix folds, bit-identical across engines."""
    vecs = _vec(spark, sf_dir)
    panel = vecs.filter(F.col("vec_id") < JL_PANEL)
    proj_cols = [
        reduce(
            lambda a, b: a + b,
            [F.col("v")[j] * F.lit(float(_JL_R[j][k])) for j in range(S.EMBED_DIM)],
        ).alias(f"y{k}")
        for k in range(JL_PROJ_D)
    ]
    p = panel.select("vec_id", "v", *proj_cols)
    a = p.alias("a")
    b = p.alias("b")
    joined = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    d_orig = S.sq_l2(F.col("a.v"), F.col("b.v"))
    d_proj = reduce(
        lambda x, y: x + y,
        [
            (F.col(f"a.y{k}") - F.col(f"b.y{k}"))
            * (F.col(f"a.y{k}") - F.col(f"b.y{k}"))
            for k in range(JL_PROJ_D)
        ],
    )
    ratio_bp = F.floor(
        F.lit(10000.0) * d_proj / (d_orig * F.lit(float(JL_PROJ_D)))
    ).cast("bigint")
    return (
        joined.filter(d_orig > 0)
        .select(ratio_bp.alias("ratio_bp"))
        .select(F.expr(f"ratio_bp DIV {JL_BUCKET_BP}").cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def _jl_proj_sql(alias: str, k: int) -> str:
    terms = " + ".join(
        f"({alias}.v[{j + 1}] * {float(_JL_R[j][k])!r})" for j in range(S.EMBED_DIM)
    )
    return f"(0.0 + {terms})"


_JL_PROJ_COLS = ",\n         ".join(
    f"{_jl_proj_sql('t', k)} AS y{k}" for k in range(JL_PROJ_D)
)
_JL_DPROJ = " + ".join(
    f"(a.y{k} - b.y{k}) * (a.y{k} - b.y{k})" for k in range(JL_PROJ_D)
)

_JL_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
panel AS (SELECT * FROM vecs t WHERE vec_id < {JL_PANEL}),
proj AS (
  SELECT t.vec_id, t.v,
         {_JL_PROJ_COLS}
  FROM panel t
),
pairs AS (
  SELECT FLOOR(10000.0 * ({_JL_DPROJ})
               / (({_sq_l2_full_sql("a.v", "b.v")}) * {float(JL_PROJ_D)!r}))
           AS ratio_bp
  FROM proj a JOIN proj b ON a.vec_id < b.vec_id
  WHERE ({_sq_l2_full_sql("a.v", "b.v")}) > 0
)
SELECT CAST(CAST(ratio_bp AS BIGINT) // {JL_BUCKET_BP} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
"""

# ------------------------------------------- quantization calibration

QCAL_LO_PCT = 1
QCAL_HI_PCT = 99


def q_quant_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension p1/p99 clip bounds for int8 embedding
    quantization, by EXACT integer rank (rank = ceil(p*n/100) over the
    (value, vec_id)-ordered dimension — a raw stored value is picked,
    never interpolated, so both engines emit the identical double).
    The calibration table a scalar quantizer clips against; dims whose
    bounds hug zero are dead (q_embed_dims' complement: it counts
    signs, this places the clip). One posexplode + 64 bounded
    partition sorts."""
    vecs = _vec(spark, sf_dir)
    pos = vecs.select("vec_id", F.posexplode("v").alias("dim", "x"))
    w = Window.partitionBy("dim").orderBy(F.col("x").asc(), F.col("vec_id").asc())
    wc = Window.partitionBy("dim")
    ranked = pos.select(
        "dim",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    lo = F.expr(f"(n * {QCAL_LO_PCT} + 99) DIV 100")
    hi = F.expr(f"(n * {QCAL_HI_PCT} + 99) DIV 100")
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy(F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.min(F.when(F.col("rn") == lo, F.col("x"))).alias("p01"),
            F.min(F.when(F.col("rn") == hi, F.col("x"))).alias("p99"),
        )
    )


_QCAL_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
pos AS (
  SELECT vec_id,
         unnest(generate_series(0, {S.EMBED_DIM - 1})) AS dim,
         unnest(v) AS x
  FROM vecs
),
ranked AS (
  SELECT dim, x,
         ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x ASC, vec_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY dim) AS n
  FROM pos
)
SELECT CAST(dim AS BIGINT) AS dim,
       MIN(CASE WHEN rn = (n * {QCAL_LO_PCT} + 99) // 100 THEN x END) AS p01,
       MIN(CASE WHEN rn = (n * {QCAL_HI_PCT} + 99) // 100 THEN x END) AS p99
FROM ranked
WHERE rn = (n * {QCAL_LO_PCT} + 99) // 100
   OR rn = (n * {QCAL_HI_PCT} + 99) // 100
GROUP BY dim
"""

# ------------------------------------------------------ type gini


def q_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Gini-Simpson diversity of event types in exact basis
    points over bp-QUANTIZED shares: s_i = (10000*c_i) DIV total, then
    gini_bp = 10000 - SUM(s_i^2) DIV 10000 — 0 means one behavior
    only, higher means a diverse usage profile. Quantizing the shares
    first (the house bp recipe) keeps every intermediate within int64
    at ANY scale: the naive 10000*SUM(c^2) overflows BIGINT once a
    single (user, type) passes ~3e7 events, and DuckDB's HUGEINT sum
    would silently diverge from Spark's ANSI overflow error there.
    n_types counts the per-(user, type) group rows (NULL types form a
    group in both engines — countDistinct would drop them on the
    Spark side only). Two keyed aggs + one user-keyed totals join,
    all partial-aggregable."""
    events = load(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    totals = per.groupBy("user_id").agg(F.sum("c").cast("bigint").alias("total"))
    shares = per.join(totals, "user_id").select(
        "user_id",
        "c",
        F.expr("(10000 * c) DIV total").cast("bigint").alias("sbp"),
    )
    return shares.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_types"),
        F.expr("CAST(10000 - SUM(sbp * sbp) DIV 10000 AS BIGINT)").alias(
            "gini_bp"
        ),
    )


_GINI_SQL = """
WITH per AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
),
totals AS (SELECT user_id, SUM(c) AS total FROM per GROUP BY user_id),
shares AS (
  SELECT p.user_id, c, (10000 * c) // total AS sbp
  FROM per p JOIN totals t ON p.user_id = t.user_id
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(10000 - SUM(sbp * sbp) // 10000 AS BIGINT) AS gini_bp
FROM shares GROUP BY user_id
"""

# ------------------------------------------------------------ registry

QUERIES = {
    "q_l_diversity": q_l_diversity,
    "q_mase_forecast": q_mase_forecast,
    "q_event_bursts": q_event_bursts,
    "q_cache_hit_curve": q_cache_hit_curve,
    "q_mixture_rebalance": q_mixture_rebalance,
    "q_dup_threshold_sensitivity": q_dup_threshold_sensitivity,
    "q_dedup_survivor_bias": q_dedup_survivor_bias,
    "q_pair_sample_audit": q_pair_sample_audit,
    "q_label_propagation": q_label_propagation,
    "q_jl_distortion": q_jl_distortion,
    "q_quant_calibration": q_quant_calibration,
    "q_type_gini": q_type_gini,
}

ORACLES = {
    "q_l_diversity": _L_DIVERSITY_SQL,
    "q_mase_forecast": _MASE_SQL,
    "q_event_bursts": _BURSTS_SQL,
    "q_cache_hit_curve": _CACHE_HIT_SQL,
    "q_mixture_rebalance": _MIX_SQL,
    "q_dup_threshold_sensitivity": _THRESH_SQL,
    "q_dedup_survivor_bias": _SURVIVOR_SQL,
    "q_pair_sample_audit": _PAIR_SAMPLE_SQL,
    "q_label_propagation": _LP_SQL,
    "q_jl_distortion": _JL_SQL,
    "q_quant_calibration": _QCAL_SQL,
    "q_type_gini": _GINI_SQL,
}
