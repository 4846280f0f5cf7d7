"""Staged round-16 queries — built in round 12, NOT declared: the
round-13/14/15 windows are already allocated (_R13_HEAD_PLAN + the r14
and r15 head-arithmetic notes in plans/__init__.py). Promote
QUERIES/ORACLES into the round-16 head verbatim when its window opens.

Theme: TRAINING OPERATIONS & STATISTICAL ESTIMATION — the decisions a
training-data platform makes between "the corpus is clean" and "the
run starts": how to shard it, whether the loader order is actually
shuffled, how much ingest capacity and dedup state to provision, which
sources move the metric, how to reweight a biased mix, whether the
labels can be trusted, and how much auditing is enough:

- q_bin_packing        — deterministic snake (boustrophedon) packing of
                         docs into K shards by exact token-count rank;
                         per-shard token totals and deviation from
                         ideal in bp (the static-shard balance read)
- q_shuffle_locality   — lag-1 same-source adjacency rate of the
                         hash-shuffled loader order vs the exact
                         random-permutation expectation (is the
                         "shuffle" actually mixing sources?)
- q_backlog_drain      — Lindley queue recursion over densified hourly
                         arrivals at 110%-of-mean service capacity via
                         the seeded prefix-scan identity (ingest
                         capacity sizing; the CUSUM identity reused on
                         the queueing domain it came from)
- q_source_influence   — leave-one-source-out delta on corpus mean
                         quality (group-level influence: which sources
                         raise the bar, which drag it)
- q_ips_estimate       — Hájek importance-weighted corpus quality under
                         a uniform-source target mix + effective sample
                         size (closed harmonic form), all integer
- q_confident_learning — confident-joint label-noise cells (Northcutt
                         et al., public literature): per-class mean
                         self-confidence thresholds over the integer
                         langid marker scores, argmax over qualifying
                         classes vs the given lang label
- q_embed_outliers     — top-m farthest vectors from their own label
                         centroid (order-pinned fold centroid + squared
                         L2), the label-noise read on the vector side
- q_representation_parity — per-nation order share vs customer-base
                         share and their ratio in bp (the demographic-
                         parity style mix audit)
- q_dedup_window_curve — duplicate-capture share as a function of
                         lookback window (power-of-two second buckets
                         over same-payload arrival gaps): how much
                         dropDuplicatesWithinWatermark state buys how
                         much dedup
- q_curriculum_mix     — source composition of exact difficulty-rank
                         curriculum phases (does phase 0 starve a
                         source?)
- q_ab_guardrail       — hash-split A/B success-rate guardrail per
                         event type: bp-quantized two-proportion z² and
                         a 2-sigma flag, all integer
- q_stopping_rule      — sequential audit stopping rule over
                         hash-ordered blocks: running between-block
                         variance of the mean, stop when the 2-sigma
                         half-width falls under 1% of the running mean

Scale discipline: every corpus-sized window is either partitioned by a
key (digest group, locality bucket, label) or decomposed onto a bounded
spine (distinct token counts, quality_bp values, hour cells, 64 hash
blocks) with the two-level prefix-scan trick proven by
q_watermark_sizing — the ORACLES keep the single-window form. The
exact global ranks in q_bin_packing / q_curriculum_mix are recomposed
as spine-offset + within-group row_number, value-identical to the
one-window ROW_NUMBER because ties cannot straddle groups.

Cross-engine determinism: all emitted metrics are int64 (bp/milli via
DIV, cross-multiplied threshold compares, power-of-two ladders built
from one Python literal) except q_embed_outliers' round(4) fold
distance, which follows the q_centroid_sim precedent (order-pinned
folds are bit-identical cross-engine; ranking ties break on vec_id).
Timestamp micros enter as DIFFERENCES of unix_micros/epoch_us where a
raw epoch is needed (q_dedup_window_curve), so the vanilla-session
timezone cancels; q_backlog_drain's absolute hour cells instead rely
on sources.tables.load()'s session-TZ normalization, exactly like the
declared q_slo_burn / q_rolling_hour precedent.

Reference citation: the reference engine (lambda/main.py, 174 lines)
has no training-ops layer; these extend the repo's training-data
north star (SURVEY.md §2 extensions) following the staged-tranche
pattern of plans/staged_r13..15.
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
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
    LANG_MARKERS,
    lang_scores,
    tokens,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _vec,
    _VEC_CTE,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _TOKS,
    _TOKS_RAW,
    ORACLES as _TEXT_ORACLES,
    with_quality,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# ------------------------------------------------------- bin packing

K_SHARDS = 8


def q_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snake (boustrophedon) shard packing by exact token-count rank:
    docs sorted by (n_tokens DESC, doc_id), dealt into K_SHARDS shards
    forward then backward per block — the deterministic SQL-expressible
    cousin of LPT bin packing (within every block of K the heaviest doc
    lands on the shard that just received the lightest). Output one row
    per shard: doc count, token total, and the deviation from the ideal
    equal share in bp (signed; floor division).

    Scale shape: the global rank is NOT a single-task window — it is
    recomposed as spine offset (cumulative count over the bounded
    distinct-token-count spine) + row_number within each token-count
    group (partitioned window), value-identical to the one-window form
    because ties cannot straddle groups (the q_watermark_sizing
    two-level decomposition; the oracle keeps the single window)."""
    docs = load_split(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_toks")
    )
    grp = tok.groupBy("n_toks").agg(F.count("*").cast("bigint").alias("cnt"))
    w_spine = Window.orderBy(F.col("n_toks").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = grp.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_spine), F.lit(0)).cast("bigint")
    ).select("n_toks", "off")
    w_in = Window.partitionBy("n_toks").orderBy("doc_id")
    ranked = (
        tok.join(off, "n_toks")
        .withColumn("rk", F.col("off") + F.row_number().over(w_in))
        .withColumn(
            "shard",
            F.expr(
                f"CAST(CASE WHEN ((rk - 1) DIV {K_SHARDS}) % 2 = 0"
                f" THEN (rk - 1) % {K_SHARDS}"
                f" ELSE {K_SHARDS - 1} - (rk - 1) % {K_SHARDS} END AS BIGINT)"
            ),
        )
    )
    per = ranked.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("sum_tokens"),
    )
    tot = per.agg(F.sum("sum_tokens").cast("bigint").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "sum_tokens",
        F.expr(
            f"CAST((10000 * {K_SHARDS} * sum_tokens) DIV total - 10000"
            " AS BIGINT)"
        ).alias("dev_bp"),
    )


_BIN_PACKING_SQL = f"""
WITH t AS (SELECT doc_id, len({_TOKS_RAW}) AS n_toks FROM documents),
r AS (
  SELECT n_toks,
         ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) AS rk
  FROM t
),
a AS (
  SELECT n_toks,
         CASE WHEN ((rk - 1) // {K_SHARDS}) % 2 = 0
              THEN (rk - 1) % {K_SHARDS}
              ELSE {K_SHARDS - 1} - (rk - 1) % {K_SHARDS} END AS shard
  FROM r
),
p AS (
  SELECT shard, COUNT(*) AS n_docs, SUM(n_toks) AS sum_tokens
  FROM a GROUP BY 1
),
tot AS (SELECT SUM(sum_tokens) AS total FROM p)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       CAST((10000 * {K_SHARDS} * sum_tokens) // total - 10000 AS BIGINT)
         AS dev_bp
FROM p, tot
"""

# -------------------------------------------------- shuffle locality

# 60-bit hash60 >> 52 = 256 ordered buckets; adjacency is measured
# WITHIN buckets (the 255 cross-bucket pairs are excluded by contract —
# a vanishing fraction of n-1 pairs, and the only way to keep the lag
# window partitioned instead of corpus-serial).
LOC_BUCKET_DIV = 1 << 52


def q_shuffle_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader shuffle quality: order docs by hash60(doc_id) (the
    deterministic "shuffled" data-loader order), then measure the lag-1
    same-source adjacency rate, attributed to the leading element's
    source. Under a uniform random permutation the exact expectation
    for a pair led by source s is (n_s - 1)/(n - 1); observed >>
    expected means the hash order still clusters sources and the loader
    needs another shuffle stage. All rates integer bp."""
    docs = load_split(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        hash60(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.expr(f"h DIV {LOC_BUCKET_DIV}"))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    lagged = h.withColumn("prev_src", F.lag("source").over(w)).filter(
        F.col("prev_src").isNotNull()
    )
    pairs = lagged.groupBy(F.col("prev_src").alias("source")).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum((F.col("source") == F.col("prev_src")).cast("bigint"))
        .cast("bigint")
        .alias("n_same"),
    )
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    # total from the tiny rollup, not a third corpus scan
    tot = per_src.agg(F.sum("n_docs").cast("bigint").alias("n"))
    return (
        per_src.join(pairs, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_pairs",
            "n_same",
            F.expr("CAST((10000 * n_same) DIV n_pairs AS BIGINT)").alias(
                "same_bp"
            ),
            F.expr(
                "CAST((10000 * (n_docs - 1)) DIV (n - 1) AS BIGINT)"
            ).alias("expected_bp"),
        )
    )


_SHUFFLE_LOCALITY_SQL = f"""
WITH h AS (
  SELECT doc_id, source,
         {hash60_sql('CAST(doc_id AS VARCHAR)')} AS h
  FROM documents
),
b AS (SELECT doc_id, source, h, h // {LOC_BUCKET_DIV} AS bucket FROM h),
lagged AS (
  SELECT source,
         LAG(source) OVER (PARTITION BY bucket ORDER BY h, doc_id)
           AS prev_src
  FROM b
),
pairs AS (
  SELECT prev_src AS source, COUNT(*) AS n_pairs,
         SUM(CASE WHEN source = prev_src THEN 1 ELSE 0 END) AS n_same
  FROM lagged WHERE prev_src IS NOT NULL GROUP BY 1
),
per_src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM documents)
SELECT s.source,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(p.n_same AS BIGINT) AS n_same,
       CAST((10000 * p.n_same) // p.n_pairs AS BIGINT) AS same_bp,
       CAST((10000 * (s.n_docs - 1)) // (t.n - 1) AS BIGINT) AS expected_bp
FROM per_src s JOIN pairs p USING (source), tot t
"""

# ---------------------------------------------------- backlog drain

CAP_NUM, CAP_DEN = 11, 10  # service capacity = 110% of mean hourly load


def q_backlog_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest capacity sizing via the Lindley queue recursion: with
    a_h the hour's arrivals (densified spine — silent hours drain the
    queue instead of vanishing) and fixed service capacity c = 110% of
    the mean hourly load (integer, >= 1), the backlog Q_h =
    max(0, Q_{h-1} + a_h - c). Computed exactly as the seeded
    prefix-scan identity S_h - min(0, min_{j<=h} S_j) over the residual
    cumsum — the same max-plus identity q_cusum_changepoint pins
    property-based, applied to the queueing domain it comes from
    (Lindley's recursion, public literature). Output per hour:
    arrivals, backlog, utilization in bp, and the peak-backlog flag —
    the provisioning read (peak backlog == needed buffer depth).

    Scale shape: one corpus aggregation onto hour cells; every window
    runs over the BOUNDED hour spine."""
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    filled = spine.join(hourly, "hour", "left").select(
        "hour", F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n")
    )
    cap = filled.agg(
        F.expr(
            f"CAST(greatest(1, ({CAP_NUM} * sum(n)) DIV ({CAP_DEN} * count(*)))"
            " AS BIGINT)"
        ).alias("cap")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = (
        filled.crossJoin(F.broadcast(cap))
        .withColumn("s", F.sum(F.col("n") - F.col("cap")).over(w))
        .withColumn(
            "backlog",
            (F.col("s") - F.least(F.lit(0), F.min("s").over(w))).cast(
                "bigint"
            ),
        )
    )
    return cur.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").alias("n_events"),
        "backlog",
        F.expr("CAST((10000 * n) DIV cap AS BIGINT)").alias("util_bp"),
        (F.col("backlog") == F.max("backlog").over(wa))
        .cast("bigint")
        .alias("is_peak"),
    )


_BACKLOG_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
  FROM events GROUP BY 1
),
span AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span
),
filled AS (
  SELECT s.hour, COALESCE(h.n_events, 0) AS n
  FROM spine s LEFT JOIN hourly h USING (hour)
),
cap AS (
  SELECT GREATEST(1, ({CAP_NUM} * SUM(n)) // ({CAP_DEN} * COUNT(*))) AS cap
  FROM filled
),
s AS (
  SELECT hour, n, cap,
         SUM(n - cap) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS s
  FROM filled, cap
),
q AS (
  SELECT hour, n, cap,
         s - LEAST(0, MIN(s) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING))
           AS backlog
  FROM s
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(n AS BIGINT) AS n_events,
       CAST(backlog AS BIGINT) AS backlog,
       CAST((10000 * n) // cap AS BIGINT) AS util_bp,
       CAST(backlog = MAX(backlog) OVER () AS BIGINT) AS is_peak
FROM q
"""

# ------------------------------------------------- source influence


def q_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on corpus mean quality: for each
    source s, the corpus mean quality_bp recomputed WITHOUT s, minus
    the full-corpus mean — positive influence means removing the source
    RAISES the bar (the source drags quality down). Group-level
    influence is the tractable end of the data-valuation spectrum
    (leave-one-out over groups instead of points) and directly ranks
    sources for the next crawl budget. All means are floor-DIV bp; one
    rollup + a single-row totals attach."""
    docs = load_split(spark, sf_dir, "documents")
    q = with_quality(docs).join(docs.select("doc_id", "source"), "doc_id")
    per = q.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("quality_bp").cast("bigint").alias("sum_q"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.sum("sum_q").cast("bigint").alias("sq"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr("CAST(sum_q DIV n_docs AS BIGINT)").alias("mean_q_bp"),
        F.expr("CAST((sq - sum_q) DIV (n - n_docs) AS BIGINT)").alias(
            "loo_mean_bp"
        ),
        F.expr(
            "CAST((sq - sum_q) DIV (n - n_docs) - sq DIV n AS BIGINT)"
        ).alias("influence_bp"),
    )


_SOURCE_INFLUENCE_SQL = f"""
WITH q AS ({_TEXT_ORACLES["q_quality"]}),
j AS (
  SELECT d.source, q.quality_bp
  FROM q JOIN documents d USING (doc_id)
),
per AS (
  SELECT source, COUNT(*) AS n_docs, SUM(quality_bp) AS sum_q
  FROM j GROUP BY 1
),
tot AS (SELECT SUM(n_docs) AS n, SUM(sum_q) AS sq FROM per)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum_q // n_docs AS BIGINT) AS mean_q_bp,
       CAST((sq - sum_q) // (n - n_docs) AS BIGINT) AS loo_mean_bp,
       CAST((sq - sum_q) // (n - n_docs) - sq // n AS BIGINT)
         AS influence_bp
FROM per, tot
"""

# ----------------------------------------------------- IPS estimate

ESS_SCALE = 1_000_000_000_000  # 1e12 per-source reciprocal scale


def q_ips_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hájek importance-weighted corpus quality under a UNIFORM-source
    target mix: every doc in source s carries weight proportional to
    1/n_s, so the weighted mean collapses to the mean of per-source
    means — the closed form the integer arithmetic computes exactly.
    The effective sample size (Kish, public literature) also closes:
    ESS = (Σw)²/Σw² = K² / Σ_s (1/n_s) = K * harmonic_mean(n_s) —
    emitted in milli-units via a 1e12-scaled reciprocal sum, computed
    as K * (the milli harmonic mean) so every intermediate stays int64
    for K up to ~9,000 sources and n_s up to 1e12 docs per source
    (the one-shot 1000*K²*1e12 numerator would wrap at K=97). Output
    one row per source (weight in milli) with the corpus-level naive
    mean, IPS mean, and ESS attached as constants — the
    reweighting-feasibility read (ESS << n means the target mix is
    unreachable without new data)."""
    docs = load_split(spark, sf_dir, "documents")
    q = with_quality(docs).join(docs.select("doc_id", "source"), "doc_id")
    per = q.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("quality_bp").cast("bigint").alias("sum_q"),
    ).withColumn(
        "mean_q_bp", F.expr("CAST(sum_q DIV n_docs AS BIGINT)")
    )
    glob = per.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_docs").cast("bigint").alias("n"),
        F.sum("sum_q").cast("bigint").alias("sq"),
        F.sum("mean_q_bp").cast("bigint").alias("sum_means"),
        F.sum(F.expr(f"{ESS_SCALE} DIV n_docs")).cast("bigint").alias("s12"),
    )
    return per.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "mean_q_bp",
        F.expr("CAST((1000 * n) DIV (k * n_docs) AS BIGINT)").alias(
            "weight_milli"
        ),
        F.expr("CAST(sq DIV n AS BIGINT)").alias("naive_mean_bp"),
        F.expr("CAST(sum_means DIV k AS BIGINT)").alias("ips_mean_bp"),
        F.expr(
            f"CAST(k * ((1000 * k * {ESS_SCALE}) DIV greatest(s12, 1))"
            " AS BIGINT)"
        ).alias("ess_milli"),
    )


_IPS_SQL = f"""
WITH q AS ({_TEXT_ORACLES["q_quality"]}),
j AS (
  SELECT d.source, q.quality_bp
  FROM q JOIN documents d USING (doc_id)
),
per AS (
  SELECT source, COUNT(*) AS n_docs, SUM(quality_bp) AS sum_q,
         SUM(quality_bp) // COUNT(*) AS mean_q_bp
  FROM j GROUP BY 1
),
gstats AS (
  SELECT COUNT(*) AS k, SUM(n_docs) AS n, SUM(sum_q) AS sq,
         SUM(mean_q_bp) AS sum_means,
         SUM({ESS_SCALE} // n_docs) AS s12
  FROM per
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(mean_q_bp AS BIGINT) AS mean_q_bp,
       CAST((1000 * n) // (k * n_docs) AS BIGINT) AS weight_milli,
       CAST(sq // n AS BIGINT) AS naive_mean_bp,
       CAST(sum_means // k AS BIGINT) AS ips_mean_bp,
       CAST(k * ((1000 * k * {ESS_SCALE}) // GREATEST(s12, 1)) AS BIGINT)
         AS ess_milli
FROM per, gstats
"""

# ----------------------------------------------- confident learning

CL_LANGS = tuple(sorted(LANG_MARKERS))  # ('de', 'en', 'es', 'fr')


def q_confident_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-joint label-noise estimation (Northcutt et al.'s
    confident learning, public literature) over the integer langid
    marker scores: for docs whose GIVEN label (the lang column) is one
    of the four marker classes, a doc is confidently class j when its
    marker score s_j reaches the class's mean self-confidence t_j =
    mean(s_j | given = j) — compared exactly via cross-multiplication
    (s_j * n_j >= sum_j), no division. The suggested label is the
    argmax over qualifying classes (alphabetical tie-break, the
    predicted_lang chain); docs qualifying nowhere land in the 'none'
    row so the mass stays accountable. Off-diagonal cells estimate the
    label-error count per (given, suggested) pair. One corpus pass +
    a single-row threshold attach; output is a bounded 4x5 grid."""
    docs = load_split(spark, sf_dir, "documents")
    d = docs.filter(F.col("lang").isin(*CL_LANGS))
    s = lang_scores(tokens(F.lower(F.col("text"))))
    scored = d.select(
        "lang",
        *[s[l].cast("bigint").alias(f"s_{l}") for l in CL_LANGS],
    )
    th = scored.agg(
        *[
            F.sum(F.when(F.col("lang") == l, F.col(f"s_{l}")).otherwise(0))
            .cast("bigint")
            .alias(f"sum_{l}")
            for l in CL_LANGS
        ],
        *[
            F.sum((F.col("lang") == l).cast("bigint"))
            .cast("bigint")
            .alias(f"n_{l}")
            for l in CL_LANGS
        ],
    )
    qual = scored.crossJoin(F.broadcast(th))
    for l in CL_LANGS:
        qual = qual.withColumn(
            f"q_{l}",
            F.expr(
                f"CASE WHEN s_{l} * n_{l} >= sum_{l} THEN s_{l}"
                " ELSE -1 END"
            ),
        )
    best = F.greatest(*[F.col(f"q_{l}") for l in CL_LANGS])
    sug = F.when(best < 0, F.lit("none"))
    for l in CL_LANGS:  # alphabetical >= chain == predicted_lang's tie rule
        sug = sug.when(F.col(f"q_{l}") == best, F.lit(l))
    cells = qual.withColumn("suggested", sug).groupBy(
        F.col("lang").alias("given_lang"), "suggested"
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    return cells.select(
        "given_lang",
        "suggested",
        "n_docs",
        (
            (F.col("given_lang") != F.col("suggested"))
            & (F.col("suggested") != F.lit("none"))
        )
        .cast("bigint")
        .alias("is_error_cell"),
    )


def _cl_sql() -> str:
    in_lang = ", ".join(f"'{l}'" for l in CL_LANGS)
    score = {
        l: (
            "len(list_filter(toks, t -> t IN ("
            + ", ".join(f"'{m}'" for m in LANG_MARKERS[l])
            + ")))"
        )
        for l in CL_LANGS
    }
    score_cols = ", ".join(f"{score[l]} AS s_{l}" for l in CL_LANGS)
    th_cols = ", ".join(
        f"SUM(CASE WHEN lang = '{l}' THEN s_{l} ELSE 0 END) AS sum_{l},"
        f" SUM(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS n_{l}"
        for l in CL_LANGS
    )
    q_cols = ", ".join(
        f"CASE WHEN s_{l} * n_{l} >= sum_{l} THEN s_{l} ELSE -1 END AS q_{l}"
        for l in CL_LANGS
    )
    best = "GREATEST(" + ", ".join(f"q_{l}" for l in CL_LANGS) + ")"
    sug = "CASE WHEN " + best + " < 0 THEN 'none' " + " ".join(
        f"WHEN q_{l} = {best} THEN '{l}'" for l in CL_LANGS
    ) + " END"
    return f"""
WITH d AS (
  SELECT lang, {_TOKS} AS toks FROM documents WHERE lang IN ({in_lang})
),
scored AS (SELECT lang, {score_cols} FROM d),
th AS (SELECT {th_cols} FROM scored),
qual AS (SELECT lang, {q_cols} FROM scored, th),
cells AS (
  SELECT lang AS given_lang, {sug} AS suggested, COUNT(*) AS n_docs
  FROM qual GROUP BY 1, 2
)
SELECT given_lang, suggested, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(given_lang <> suggested AND suggested <> 'none' AS BIGINT)
         AS is_error_cell
FROM cells
"""

# ----------------------------------------------------- embed outliers

OUTLIER_TOP = 3


def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-m farthest vectors from their own label centroid by squared
    L2 — the vector-side label-noise read (a point far from its class
    center is a candidate mislabel or outlier; cf. the distance-based
    noise filters in the confident-learning literature). Centroids use
    the order-pinned per-position fold (the q_centroid_sim recipe:
    vec_id-sorted left fold, bit-identical cross-engine), the distance
    is a seeded left fold over the 64 squared differences, ranking is
    on round(4) with vec_id tie-break.

    Scale: the declared-determinism collect_list centroid is the same
    trade q_centroid_sim documents (plain partial-agg avg is the 100 TB
    path); the rank window is partitioned by label."""
    vecs = _vec(spark, sf_dir)
    pos = vecs.select("label", "vec_id", F.posexplode("v").alias("pos", "x"))
    cent = (
        pos.groupBy("label", "pos")
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
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s["c"]).alias("centroid"))
    )
    joined = vecs.join(F.broadcast(cvec), "label")
    d2 = F.aggregate(
        F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist2_r").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("dist2_r", F.round(d2, 4))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= OUTLIER_TOP)
        .select("label", "vec_id", "dist2_r", "rnk")
    )


def _sqdist_sql(a: str, b: str, dim: int = S.EMBED_DIM) -> str:
    terms = " + ".join(
        f"({a}[{i + 1}] - {b}[{i + 1}]) * ({a}[{i + 1}] - {b}[{i + 1}])"
        for i in range(dim)
    )
    return f"(0.0 + {terms})"


_EMBED_OUTLIERS_SQL = f"""
WITH vec AS ({_VEC_CTE}),
pos AS (
  SELECT label, vec_id, t.range AS pos, v[t.range + 1] AS x
  FROM vec, range({S.EMBED_DIM}) t
),
cent AS (
  SELECT label, pos,
         list_reduce(list_prepend(0.0, list(x ORDER BY vec_id)),
                     (a, b) -> a + b) AS sx,
         COUNT(*) AS nx
  FROM pos GROUP BY 1, 2
),
cvec AS (
  SELECT label, list(sx / nx ORDER BY pos) AS centroid
  FROM cent GROUP BY label
),
scored AS (
  SELECT v.vec_id, v.label,
         round({_sqdist_sql("v.v", "c.centroid")}, 4) AS dist2_r
  FROM vec v JOIN cvec c USING (label)
),
ranked AS (
  SELECT label, vec_id, dist2_r,
         CAST(ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY dist2_r DESC, vec_id) AS BIGINT) AS rnk
  FROM scored
)
SELECT label, vec_id, dist2_r, rnk FROM ranked WHERE rnk <= {OUTLIER_TOP}
"""

# --------------------------------------------- representation parity


def q_representation_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order share vs customer-base share and their ratio —
    the demographic-parity style mix audit (is activity proportional to
    representation, or do some nations punch above their base?).
    Shares are bp-quantized FIRST, then ratioed (the integer-overflow
    recipe: never cross-multiply two corpus-scale counts). Nations with
    at least one customer appear; parity_bp > 10000 means
    over-represented in orders relative to base."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    o_n = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    c_n = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )
    both = c_n.join(o_n, "c_nationkey", "left").na.fill(
        {"n_orders": 0}
    )
    tot = both.agg(
        F.sum("n_customers").cast("bigint").alias("ct"),
        F.sum("n_orders").cast("bigint").alias("ot"),
    )
    return (
        both.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(nation),
            both.c_nationkey == nation.n_nationkey,
        )
        .select(
            "n_name",
            "n_customers",
            "n_orders",
            F.expr("CAST((10000 * n_customers) DIV ct AS BIGINT)").alias(
                "c_share_bp"
            ),
            F.expr("CAST((10000 * n_orders) DIV ot AS BIGINT)").alias(
                "o_share_bp"
            ),
            F.expr(
                "CAST(CASE WHEN (10000 * n_customers) DIV ct > 0 THEN"
                " (10000 * ((10000 * n_orders) DIV ot))"
                " DIV ((10000 * n_customers) DIV ct)"
                " ELSE 0 END AS BIGINT)"
            ).alias("parity_bp"),
        )
    )


_PARITY_SQL = """
WITH o_n AS (
  SELECT c.c_nationkey, COUNT(*) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
c_n AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1),
bn AS (
  SELECT c.c_nationkey, c.n_customers, COALESCE(o.n_orders, 0) AS n_orders
  FROM c_n c LEFT JOIN o_n o USING (c_nationkey)
),
tot AS (SELECT SUM(n_customers) AS ct, SUM(n_orders) AS ot FROM bn)
SELECT n.n_name,
       CAST(b.n_customers AS BIGINT) AS n_customers,
       CAST(b.n_orders AS BIGINT) AS n_orders,
       CAST((10000 * b.n_customers) // t.ct AS BIGINT) AS c_share_bp,
       CAST((10000 * b.n_orders) // t.ot AS BIGINT) AS o_share_bp,
       CAST(CASE WHEN (10000 * b.n_customers) // t.ct > 0 THEN
              (10000 * ((10000 * b.n_orders) // t.ot))
              // ((10000 * b.n_customers) // t.ct)
            ELSE 0 END AS BIGINT) AS parity_bp
FROM bn b JOIN nation n ON b.c_nationkey = n.n_nationkey, tot t
"""

# ------------------------------------------------ dedup window curve

GAP_LADDER_TOP = 26  # buckets 0..26: [0,2), [2,4), ... [2^25,2^26), rest


def _gap_bucket_case(gap: str) -> str:
    """Power-of-two second-gap ladder as ONE Python literal rendered
    into both engines (no float log2 — the cross-engine boundary-exact
    form)."""
    arms = " ".join(
        f"WHEN {gap} < {1 << (b + 1)} THEN {b}"
        for b in range(GAP_LADDER_TOP)
    )
    return f"CASE {arms} ELSE {GAP_LADDER_TOP} END"


def q_dedup_window_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much dedup state buys how much dedup: for every repeated
    event payload (event_type|props|user_id), the arrival gap in
    seconds to its previous occurrence, bucketed into a power-of-two
    ladder, with the cumulative capture share — the curve that sizes
    dropDuplicatesWithinWatermark's state window (T3/T5 in SURVEY §2:
    capture_bp at bucket b == share of duplicate arrivals a watermark
    of 2^(b+1) seconds would drop). Gaps are DIFFERENCES of
    unix_micros, so session timezone cancels. The lag window is
    partitioned by payload digest — never corpus-serial; the bucket
    rollup and its cumulative window live on the bounded 27-row
    ladder spine."""
    events = load(spark, sf_dir, "events")
    keyed = events.select(
        sentinel_digest(
            F.col("event_type"),
            F.col("props"),
            F.col("user_id").cast("string"),
        ).alias("dg"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("dg").orderBy("us", "event_id")
    gaps = keyed.withColumn("prev_us", F.lag("us").over(w)).filter(
        F.col("prev_us").isNotNull()
    )
    bucketed = gaps.select(
        F.expr(
            "CAST("
            + _gap_bucket_case("((us - prev_us) DIV 1000000)")
            + " AS BIGINT)"
        ).alias("bucket")
    ).groupBy("bucket").agg(F.count("*").cast("bigint").alias("n_dups"))
    tot = bucketed.agg(F.sum("n_dups").cast("bigint").alias("total"))
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .withColumn("cum_dups", F.sum("n_dups").over(wc).cast("bigint"))
        .select(
            "bucket",
            F.expr("CAST(shiftleft(1, CAST(bucket AS INT) + 1) AS BIGINT)").alias(
                "window_hi_s"
            ),
            "n_dups",
            "cum_dups",
            F.expr("CAST((10000 * cum_dups) DIV total AS BIGINT)").alias(
                "capture_bp"
            ),
        )
    )


_DEDUP_WINDOW_SQL = f"""
WITH keyed AS (
  SELECT {sentinel_digest_sql("event_type", "props", "CAST(user_id AS VARCHAR)")} AS dg,
         epoch_us(ts) AS us, event_id
  FROM events
),
gaps AS (
  SELECT us - LAG(us) OVER (PARTITION BY dg ORDER BY us, event_id)
           AS gap_us
  FROM keyed
),
bucketed AS (
  SELECT {_gap_bucket_case("(gap_us // 1000000)")} AS bucket,
         COUNT(*) AS n_dups
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1
),
tot AS (SELECT SUM(n_dups) AS total FROM bucketed),
cum AS (
  SELECT bucket, n_dups,
         SUM(n_dups) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
           AS cum_dups
  FROM bucketed
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(1::BIGINT << (bucket + 1) AS BIGINT) AS window_hi_s,
       CAST(n_dups AS BIGINT) AS n_dups,
       CAST(cum_dups AS BIGINT) AS cum_dups,
       CAST((10000 * cum_dups) // total AS BIGINT) AS capture_bp
FROM cum, tot
"""

# ------------------------------------------------- curriculum mix

N_PHASES = 4


def q_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source composition of exact difficulty-rank curriculum phases:
    docs ranked by (quality_bp ASC, doc_id) — the easy-to-hard
    curriculum order — and cut into N_PHASES equal phases by exact
    rank; per (phase, source): count, share of the phase in bp, and
    floor mean tokens. A source starved out of phase 0 never shapes
    early training — the curriculum-fairness read.

    The global rank uses the same two-level spine decomposition as
    q_bin_packing (quality_bp values are the bounded spine; the oracle
    keeps the one-window form)."""
    docs = load_split(spark, sf_dir, "documents")
    q = with_quality(docs).join(docs.select("doc_id", "source"), "doc_id")
    grp = q.groupBy("quality_bp").agg(F.count("*").cast("bigint").alias("cnt"))
    w_spine = Window.orderBy("quality_bp").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = grp.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_spine), F.lit(0)).cast("bigint")
    ).select("quality_bp", "off")
    w_in = Window.partitionBy("quality_bp").orderBy("doc_id")
    # total from the already-built spine, not another corpus scan
    tot = grp.agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        q.join(off, "quality_bp")
        .withColumn("rk", F.col("off") + F.row_number().over(w_in))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "phase", F.expr(f"CAST(({N_PHASES} * (rk - 1)) DIV n AS BIGINT)")
        )
    )
    per = ranked.groupBy("phase", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_toks"),
    )
    phase_tot = per.groupBy("phase").agg(
        F.sum("n_docs").cast("bigint").alias("phase_n")
    )
    return per.join(phase_tot, "phase").select(
        "phase",
        "source",
        "n_docs",
        F.expr("CAST((10000 * n_docs) DIV phase_n AS BIGINT)").alias(
            "share_bp"
        ),
        F.expr("CAST(sum_toks DIV n_docs AS BIGINT)").alias("mean_tokens"),
    )


_CURRICULUM_SQL = f"""
WITH q AS ({_TEXT_ORACLES["q_quality"]}),
j AS (
  SELECT d.source, q.quality_bp, q.n_tokens, q.doc_id
  FROM q JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (ORDER BY quality_bp, doc_id) AS rk,
         COUNT(*) OVER () AS n
  FROM j
),
phased AS (
  SELECT source, n_tokens, ({N_PHASES} * (rk - 1)) // n AS phase
  FROM ranked
),
per AS (
  SELECT phase, source, COUNT(*) AS n_docs, SUM(n_tokens) AS sum_toks
  FROM phased GROUP BY 1, 2
),
pt AS (SELECT phase, SUM(n_docs) AS phase_n FROM per GROUP BY 1)
SELECT CAST(per.phase AS BIGINT) AS phase, source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST((10000 * n_docs) // phase_n AS BIGINT) AS share_bp,
       CAST(sum_toks // n_docs AS BIGINT) AS mean_tokens
FROM per JOIN pt USING (phase)
"""

# ----------------------------------------------------- AB guardrail

AB_VALUE_T = 50.0  # success = value >= threshold (raw data compare: exact)
# Harmonic-size cap: n_h enters z² through n_a*n_b, the one product of
# two corpus-scale counts in this file — cap each factor at 2^31 so the
# product stays <= 2^62 at ANY event volume (the int64 recipe). Beyond
# two billion samples per arm the z² verdict is saturated anyway.
AB_HM_CAP = 1 << 31


def q_ab_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split A/B guardrail per event type: users deterministically
    split into two arms by hash60(user_id) parity, success = value >=
    AB_VALUE_T (a raw-data comparison — engine-exact), and the
    two-proportion z² statistic computed entirely on bp-quantized
    shares: z² = dp² * n_h / (p(1-p)) with n_h the harmonic sample
    size (arm counts capped at AB_HM_CAP before the product — see the
    constant's comment) and p the pooled share — flag at z² >= 4 (two
    sigma). The guardrail read: a flagged cell means the 'arms' differ
    on a metric the split was supposed to balance — the assignment
    hash is biased or the metric is user-clustered. All integer; one
    corpus rollup, no product. Quantize-first + the harmonic cap keep
    every product within int64 at ANY scale (dp² <= 1e8, capped
    n_h <= 2^31, their product <= 2^58)."""
    events = load(spark, sf_dir, "events")
    armed = events.select(
        "event_type",
        (hash60(F.col("user_id").cast("string")) % 2).alias("arm"),
        (F.col("value") >= AB_VALUE_T).cast("bigint").alias("success"),
    )
    per = armed.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("success")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("success")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
    )
    z2 = (
        "CASE WHEN n_a > 0 AND n_b > 0"
        " AND (10000 * (s_a + s_b)) DIV (n_a + n_b) > 0"
        " AND (10000 * (s_a + s_b)) DIV (n_a + n_b) < 10000 THEN"
        " (((10000 * s_a) DIV n_a - (10000 * s_b) DIV n_b)"
        "  * ((10000 * s_a) DIV n_a - (10000 * s_b) DIV n_b)"
        f"  * ((least(n_a, {AB_HM_CAP}) * least(n_b, {AB_HM_CAP}))"
        f"     DIV (least(n_a, {AB_HM_CAP}) + least(n_b, {AB_HM_CAP}))))"
        " DIV (((10000 * (s_a + s_b)) DIV (n_a + n_b))"
        "      * (10000 - (10000 * (s_a + s_b)) DIV (n_a + n_b)))"
        " ELSE 0 END"
    )
    return per.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr("CAST((10000 * s_a) DIV n_a AS BIGINT)").alias("pa_bp"),
        F.expr("CAST((10000 * s_b) DIV n_b AS BIGINT)").alias("pb_bp"),
        F.expr(f"CAST({z2} AS BIGINT)").alias("z2"),
        F.expr(f"CAST({z2} >= 4 AS BIGINT)").alias("flagged"),
    )


def _ab_sql() -> str:
    z2 = (
        "CASE WHEN n_a > 0 AND n_b > 0"
        " AND (10000 * (s_a + s_b)) // (n_a + n_b) > 0"
        " AND (10000 * (s_a + s_b)) // (n_a + n_b) < 10000 THEN"
        " (((10000 * s_a) // n_a - (10000 * s_b) // n_b)"
        "  * ((10000 * s_a) // n_a - (10000 * s_b) // n_b)"
        f"  * ((LEAST(n_a, {AB_HM_CAP}) * LEAST(n_b, {AB_HM_CAP}))"
        f"     // (LEAST(n_a, {AB_HM_CAP}) + LEAST(n_b, {AB_HM_CAP}))))"
        " // (((10000 * (s_a + s_b)) // (n_a + n_b))"
        "     * (10000 - (10000 * (s_a + s_b)) // (n_a + n_b)))"
        " ELSE 0 END"
    )
    return f"""
WITH armed AS (
  SELECT event_type,
         ({hash60_sql('CAST(user_id AS VARCHAR)')}) % 2 AS arm,
         CASE WHEN value >= {AB_VALUE_T} THEN 1 ELSE 0 END AS success
  FROM events
),
per AS (
  SELECT event_type,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN arm = 0 THEN success ELSE 0 END) AS s_a,
         SUM(CASE WHEN arm = 1 THEN success ELSE 0 END) AS s_b
  FROM armed GROUP BY 1
)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST((10000 * s_a) // n_a AS BIGINT) AS pa_bp,
       CAST((10000 * s_b) // n_b AS BIGINT) AS pb_bp,
       CAST({z2} AS BIGINT) AS z2,
       CAST({z2} >= 4 AS BIGINT) AS flagged
FROM per
"""

# ----------------------------------------------------- stopping rule

STOP_BLOCK_DIV = 1 << 54  # hash60 >> 54 = 64 audit-order blocks


def q_stopping_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential audit stopping rule: docs stream in hash60 order
    through 64 equal-probability blocks; after each block, the running
    mean quality (milli-bp) and the between-block variance of the mean
    (se2_scaled = (k*Σm² - (Σm)²) / (k²(k-1)), sample-variance-of-mean
    over the k block means) decide whether auditing can STOP — stop
    when the 2-sigma half-width falls under 1% of the running mean
    (4*se² <= (mean/100)², compared as se2_scaled <= mean² // 40000).
    first_stop marks the earliest such block: how many blocks a quality
    audit actually needs before the estimate is stable.

    Scale shape: one corpus rollup onto the 64-block spine; every
    window and every squared term lives on the spine (block means are
    <= 1e7 milli-bp, so k*Σm² <= 64²·1e14 — int64-safe at any corpus
    size)."""
    docs = load_split(spark, sf_dir, "documents")
    q = with_quality(docs).select(
        hash60(F.col("doc_id").cast("string")).alias("h"), "quality_bp"
    )
    blocks = (
        q.withColumn("blk", F.expr(f"h DIV {STOP_BLOCK_DIV}"))
        .groupBy("blk")
        .agg(
            F.count("*").cast("bigint").alias("n_b"),
            F.sum("quality_bp").cast("bigint").alias("sum_q"),
        )
        .withColumn("m", F.expr("CAST((1000 * sum_q) DIV n_b AS BIGINT)"))
    )
    w = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = (
        blocks.withColumn("k", F.row_number().over(Window.orderBy("blk")).cast("bigint"))
        .withColumn("n_cum", F.sum("n_b").over(w).cast("bigint"))
        .withColumn("sm", F.sum("m").over(w).cast("bigint"))
        .withColumn("sm2", F.sum(F.expr("m * m")).over(w).cast("bigint"))
        .withColumn("mean_milli", F.expr("CAST(sm DIV k AS BIGINT)"))
        .withColumn(
            "se2_scaled",
            F.expr(
                "CAST(CASE WHEN k >= 2 THEN"
                " (k * sm2 - sm * sm) DIV (k * k * (k - 1))"
                " ELSE 0 END AS BIGINT)"
            ),
        )
        .withColumn(
            "stop",
            F.expr(
                "CAST(k >= 2 AND se2_scaled <= (mean_milli * mean_milli)"
                " DIV 40000 AS BIGINT)"
            ),
        )
    )
    first = F.min(F.when(F.col("stop") == 1, F.col("k"))).over(wa)
    return cur.withColumn(
        "first_stop",
        F.when(first.isNotNull() & (F.col("k") == first), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint"),
    ).select(
        "k", F.col("blk").cast("bigint").alias("blk"), "n_cum",
        "mean_milli", "se2_scaled", "stop", "first_stop",
    )


_STOPPING_SQL = f"""
WITH q AS ({_TEXT_ORACLES["q_quality"]}),
h AS (
  SELECT {hash60_sql('CAST(doc_id AS VARCHAR)')} // {STOP_BLOCK_DIV} AS blk,
         quality_bp
  FROM q
),
blocks AS (
  SELECT blk, COUNT(*) AS n_b, SUM(quality_bp) AS sum_q,
         (1000 * SUM(quality_bp)) // COUNT(*) AS m
  FROM h GROUP BY 1
),
cum AS (
  SELECT blk, n_b, m,
         ROW_NUMBER() OVER (ORDER BY blk) AS k,
         SUM(n_b) OVER (ORDER BY blk ROWS UNBOUNDED PRECEDING) AS n_cum,
         SUM(m) OVER (ORDER BY blk ROWS UNBOUNDED PRECEDING) AS sm,
         SUM(m * m) OVER (ORDER BY blk ROWS UNBOUNDED PRECEDING) AS sm2
  FROM blocks
),
stat AS (
  SELECT k, blk, n_cum, sm // k AS mean_milli,
         CASE WHEN k >= 2 THEN (k * sm2 - sm * sm) // (k * k * (k - 1))
              ELSE 0 END AS se2_scaled
  FROM cum
),
flagged AS (
  SELECT k, blk, n_cum, mean_milli, se2_scaled,
         CASE WHEN k >= 2 AND se2_scaled
                <= (mean_milli * mean_milli) // 40000
              THEN 1 ELSE 0 END AS stop
  FROM stat
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(blk AS BIGINT) AS blk,
       CAST(n_cum AS BIGINT) AS n_cum,
       CAST(mean_milli AS BIGINT) AS mean_milli,
       CAST(se2_scaled AS BIGINT) AS se2_scaled,
       CAST(stop AS BIGINT) AS stop,
       CAST(CASE WHEN stop = 1 AND
                  k = MIN(CASE WHEN stop = 1 THEN k END) OVER ()
            THEN 1 ELSE 0 END AS BIGINT) AS first_stop
FROM flagged
"""

# ----------------------------------------------------------- registry

QUERIES = {
    "q_bin_packing": q_bin_packing,
    "q_shuffle_locality": q_shuffle_locality,
    "q_backlog_drain": q_backlog_drain,
    "q_source_influence": q_source_influence,
    "q_ips_estimate": q_ips_estimate,
    "q_confident_learning": q_confident_learning,
    "q_embed_outliers": q_embed_outliers,
    "q_representation_parity": q_representation_parity,
    "q_dedup_window_curve": q_dedup_window_curve,
    "q_curriculum_mix": q_curriculum_mix,
    "q_ab_guardrail": q_ab_guardrail,
    "q_stopping_rule": q_stopping_rule,
}

ORACLES = {
    "q_bin_packing": _BIN_PACKING_SQL,
    "q_shuffle_locality": _SHUFFLE_LOCALITY_SQL,
    "q_backlog_drain": _BACKLOG_SQL,
    "q_source_influence": _SOURCE_INFLUENCE_SQL,
    "q_ips_estimate": _IPS_SQL,
    "q_confident_learning": _cl_sql(),
    "q_embed_outliers": _EMBED_OUTLIERS_SQL,
    "q_representation_parity": _PARITY_SQL,
    "q_dedup_window_curve": _DEDUP_WINDOW_SQL,
    "q_curriculum_mix": _CURRICULUM_SQL,
    "q_ab_guardrail": _ab_sql(),
    "q_stopping_rule": _STOPPING_SQL,
}
