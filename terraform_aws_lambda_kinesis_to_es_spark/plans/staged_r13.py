"""Staged round-13 queries — built in round 11, NOT declared (the
round-12 driver window is already allocated to the staged-r12
promotions + the r6 residue + the r7-tier rotation; see _R12_HEAD_PLAN
in plans/__init__.py). Promote QUERIES/ORACLES into the round-13 head
verbatim, alongside the 7 remaining r7 names and the first r8-tier
names (promotion arithmetic: 12 + 7 + 31 = 50).

Theme: EVALUATION & OPERATIONAL TUNING — the audits a team runs when
they operate this engine as a training-data/serving pipeline rather
than build it: eval-set integrity (split leakage, contamination
sweeps), retrieval quality (MRR/hit-rate), streaming knob tuning
(watermark sizing, session-gap curves, changepoint alarms), ingest
hygiene (payload integrity, encoding noise), and statistical tooling
(deterministic bootstrap CIs, ANN hubness):

- q_split_leakage       — near-dup pairs straddling the train/val/test
                          hash split (the cross-split leakage a
                          per-split dedup run structurally misses)
- q_retrieval_eval      — MRR@k + hit-rate of tf-ranked retrieval
                          against a stricter conjunctive relevance rule
- q_contamination_sweep — eval-overlap rate at n-gram sizes 5/8/13
                          (the decontamination n tuning curve)
- q_prefix_sharing      — shared leading-token prefixes (KV-cache /
                          packed-batch prefix reuse accounting)
- q_cusum_changepoint   — integer CUSUM over daily event volume (the
                          level-shift alarm, exact in scaled residuals)
- q_watermark_sizing    — would-drop fraction vs watermark threshold
                          under a deterministic hash-jitter delay model
- q_session_gap_curve   — session count vs inactivity-gap threshold
                          (the sessionization knob's sensitivity curve)
- q_media_integrity     — binary payload magic/length audit over a
                          deterministically corrupted subset
- q_readability         — Flesch-style reading-ease in exact milli
                          units (integer DIV; vowel-group syllables)
- q_mojibake            — encoding-noise audit (CP1252 mojibake,
                          U+FFFD, control bytes) over injected noise
- q_poisson_bootstrap   — deterministic hash-Poisson bootstrap
                          replicates of the mean-doc-length metric
- q_hubness             — k-occurrence histogram of exact L2 top-k
                          (the hub/anti-hub pathology scan of the
                          embedding space ANN serves)

Cross-engine determinism: every output column is id/count arithmetic,
integer basis points or milli units via integer DIV, or flags on
byte-exact hex/string comparisons — no float sums cross engines (the
staged-r8..r12 recipe). Ranked legs (retrieval, hubness) order by
(integer score | pinned-fold double, id) so ties are engine-portable.

Reference citation: the reference engine (lambda/main.py, 174 lines)
has no eval, retrieval, or vector layer; these extend the repo's
training-data north star, mirroring the audit-query pattern of
q_ann_recall / q_lsh_eval / q_quality_sweep (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens, word_ngrams
from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
    _PAIR_JACCARD,
    JACCARD_THRESHOLD_BP,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.search_queries import SEARCH_TERMS
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _sq_l2_full_sql,
    _vec,
    _VEC_CTE,
    TOP_K,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _ngrams_sql,
    _TOKS,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.training_queries import EVAL_DOC_MAX
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# ------------------------------------------------------ split leakage

_SPLIT_BUCKETS = (90, 95)  # q_hash_split's 90/5/5 rule, reused verbatim


def _split_col(id_col: str = "doc_id"):
    b = hash60(F.col(id_col).cast("string")) % F.lit(100)
    return (
        F.when(b < _SPLIT_BUCKETS[0], "train")
        .when(b < _SPLIT_BUCKETS[1], "val")
        .otherwise("test")
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: the verified minhash near-dup pairs
    (the declared q_minhash_dedup detector, reused verbatim) grouped by
    the unordered (split, split) pair of their endpoints under the
    q_hash_split 90/5/5 rule. Off-diagonal rows are eval docs whose
    near-twin sits in train — contamination that per-split dedup runs
    structurally miss (the q_cross_lang_dup argument, applied to the
    split axis instead of the language axis).

    Scale shape: the detector's banded-bucket join (never all pairs)
    plus two map-side split assignments (hash of the id — no lookup
    join needed); the rollup is <= 6 rows."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    sa = _split_col("doc_a")
    sb = _split_col("doc_b")
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
            "jaccard_bp",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("CAST(SUM(jaccard_bp) DIV COUNT(*) AS BIGINT)").alias(
                "avg_jaccard_bp"
            ),
        )
    )


def _split_sql_for(expr: str) -> str:
    h = hash60_sql(f"CAST({expr} AS VARCHAR)")
    return (
        f"CASE WHEN ({h} % 100) < {_SPLIT_BUCKETS[0]} THEN 'train' "
        f"WHEN ({h} % 100) < {_SPLIT_BUCKETS[1]} THEN 'val' "
        f"ELSE 'test' END"
    )


_SPLIT_LEAKAGE_SQL = (
    _PAIR_JACCARD
    + f""",
filt AS (SELECT doc_a, doc_b, jaccard_bp FROM pairs
         WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}),
lab AS (
  SELECT LEAST({_split_sql_for("doc_a")}, {_split_sql_for("doc_b")}) AS split_lo,
         GREATEST({_split_sql_for("doc_a")}, {_split_sql_for("doc_b")}) AS split_hi,
         jaccard_bp
  FROM filt
)
SELECT split_lo, split_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(jaccard_bp) // COUNT(*) AS BIGINT) AS avg_jaccard_bp
FROM lab GROUP BY 1, 2
"""
)

# ---------------------------------------------------- retrieval eval

RETR_K = TOP_K  # 10


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: rank docs by integer term frequency for
    each SEARCH_TERMS query (plus the 'all' sum-of-tfs query), score
    against a STRICTER conjunctive relevance rule (doc contains every
    term — the q_keyword_search predicate), and report MRR@k in basis
    points (10000 DIV first-relevant-rank — exact rational), hits@k,
    and candidate count. The ranker being weaker than the relevance
    rule is the point: MRR measures how well single-term ranking
    surfaces conjunction docs.

    Integer scores make ranks engine-exact (ties to lowest doc_id) —
    no float-score rank wobble. One scan builds the tf projection; the
    panel explode is x4; the rank window partitions by query term.
    Scale note: the window ranks only score>0 candidates (a sparse
    subset); at cluster scale the same contract runs as a per-term
    TakeOrdered top-k."""
    docs = load_split(spark, sf_dir, "documents")

    def _eq(term: str):
        return lambda t: t == term

    # Tokenize ONCE into a column, then derive the tf counts from it:
    # higher-order functions evaluate interpreted with no cross-
    # expression CSE (the word_ngrams pitfall in operators/text.py), so
    # embedding tokens(...) in each tf would re-split every document
    # |SEARCH_TERMS| times.
    toked = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
    d = toked.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("toks"), _eq(term)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, term in enumerate(SEARCH_TERMS)
        ],
    )
    rel = reduce(lambda a, b: a & b, [F.col(f"tf{i}") > 0 for i in range(len(SEARCH_TERMS))])
    d = d.withColumn("rel", rel)
    entries = [
        F.struct(
            F.lit(term).alias("query_term"), F.col(f"tf{i}").alias("score")
        )
        for i, term in enumerate(SEARCH_TERMS)
    ] + [
        F.struct(
            F.lit("all").alias("query_term"),
            sum(F.col(f"tf{i}") for i in range(len(SEARCH_TERMS))).alias("score"),
        )
    ]
    panel = d.select("doc_id", "rel", F.explode(F.array(*entries)).alias("e")).select(
        "doc_id", "rel", "e.query_term", "e.score"
    )
    w = Window.partitionBy("query_term").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = panel.filter(F.col("score") > 0).withColumn("rank", F.row_number().over(w))
    return ranked.groupBy("query_term").agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum(((F.col("rank") <= RETR_K) & F.col("rel")).cast("bigint"))
        .cast("bigint")
        .alias("n_hits_at_k"),
        F.expr(
            f"CAST(COALESCE(10000 DIV MIN(CASE WHEN rel AND rank <= {RETR_K} "
            f"THEN rank END), 0) AS BIGINT)"
        ).alias("mrr_bp"),
    )


_RETR_TFS = ",\n         ".join(
    f"len(list_filter({_TOKS}, t -> t = '{term}')) AS tf{i}"
    for i, term in enumerate(SEARCH_TERMS)
)
_RETR_REL = " AND ".join(f"tf{i} > 0" for i in range(len(SEARCH_TERMS)))
_RETR_ALL = " + ".join(f"tf{i}" for i in range(len(SEARCH_TERMS)))
_RETR_PANEL = "\n  UNION ALL ".join(
    f"SELECT doc_id, rel, '{term}' AS query_term, tf{i} AS score FROM d"
    for i, term in enumerate(SEARCH_TERMS)
)

_RETRIEVAL_EVAL_SQL = f"""
WITH d AS (
  SELECT doc_id, {", ".join(f"tf{i}" for i in range(len(SEARCH_TERMS)))},
         ({_RETR_REL}) AS rel
  FROM (SELECT doc_id,
         {_RETR_TFS}
        FROM documents)
),
panel AS (
  {_RETR_PANEL}
  UNION ALL SELECT doc_id, rel, 'all' AS query_term, {_RETR_ALL} AS score FROM d
),
ranked AS (
  SELECT query_term, doc_id, rel, score,
         ROW_NUMBER() OVER (PARTITION BY query_term
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM panel WHERE score > 0
)
SELECT query_term,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(*) FILTER (WHERE rank <= {RETR_K} AND rel) AS BIGINT)
         AS n_hits_at_k,
       CAST(COALESCE(10000 // MIN(CASE WHEN rel AND rank <= {RETR_K}
                                       THEN rank END), 0) AS BIGINT) AS mrr_bp
FROM ranked GROUP BY query_term
"""

# ------------------------------------------------ contamination sweep

CONTAM_NS = (5, 8, 13)


def q_contamination_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination n-gram-size tuning curve: q_contamination's
    eval-overlap scan run at n = 5, 8, 13 — small n over-flags (common
    phrases), large n under-flags (only verbatim extracts); the sweep
    quantifies that trade on this corpus so the production n is chosen
    from data, not folklore (the q_lsh_tuning pattern applied to the
    decontamination knob).

    Scale shape per n: grams are 60-bit-hashed before the join (only
    longs shuffle), the eval gram set broadcasts, the train side is one
    explode + hash aggregate — identical to the declared
    q_contamination plan, run |CONTAM_NS| times."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))

    def one(n: int) -> DataFrame:
        grams = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform(word_ngrams(toks, n), hash60))
            ).alias("g"),
        )
        eval_grams = (
            grams.filter(F.col("doc_id") < EVAL_DOC_MAX).select("g").distinct()
        )
        hits = grams.filter(F.col("doc_id") >= EVAL_DOC_MAX).join(
            F.broadcast(eval_grams), "g"
        )
        return hits.agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_contam_docs"),
            F.count("*").cast("bigint").alias("n_gram_hits"),
        ).select(F.lit(n).cast("bigint").alias("n"), "n_contam_docs", "n_gram_hits")

    return reduce(DataFrame.unionAll, [one(n) for n in CONTAM_NS])


def _contam_block_sql(n: int) -> str:
    grams = f"list_distinct(list_transform({_ngrams_sql(_TOKS, n)}, s -> {hash60_sql('s')}))"
    return f"""
SELECT CAST({n} AS BIGINT) AS n,
       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_contam_docs,
       CAST(COUNT(*) AS BIGINT) AS n_gram_hits
FROM (
  SELECT doc_id, unnest({grams}) AS g FROM documents
  WHERE doc_id >= {EVAL_DOC_MAX}
) t
JOIN (
  SELECT DISTINCT unnest({grams}) AS g FROM documents
  WHERE doc_id < {EVAL_DOC_MAX}
) e ON t.g = e.g
"""


_CONTAM_SWEEP_SQL = "\nUNION ALL\n".join(_contam_block_sql(n) for n in CONTAM_NS)

# -------------------------------------------------- prefix sharing

PREFIX_LEN = 6


def q_prefix_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared leading-token prefixes: groups of docs whose first
    PREFIX_LEN tokens are identical, with the token mass a
    prefix-aware runtime (KV-cache reuse, packed-batch prefix
    collapsing) saves per group. The inference-cost twin of exact
    dedup — a prefix shared 40 ways pays its attention cost once.

    One scan + one hash aggregate keyed by the prefix string; output
    ships only the 60-bit prefix hash, never the text."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    pre = docs.select(
        F.when(
            F.size(toks) >= PREFIX_LEN,
            F.array_join(F.slice(toks, 1, PREFIX_LEN), " "),
        ).alias("p")
    ).filter(F.col("p").isNotNull())
    return (
        pre.groupBy("p")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select(
            hash60(F.col("p")).alias("prefix_id"),
            "n_docs",
            (F.lit(PREFIX_LEN) * (F.col("n_docs") - 1))
            .cast("bigint")
            .alias("tokens_saved"),
        )
    )


_PREFIX_SHARING_SQL = f"""
WITH pre AS (
  SELECT array_to_string(({_TOKS})[1:{PREFIX_LEN}], ' ') AS p
  FROM documents WHERE len({_TOKS}) >= {PREFIX_LEN}
),
g AS (SELECT p, COUNT(*) AS n_docs FROM pre GROUP BY p HAVING COUNT(*) >= 2)
SELECT {hash60_sql('p')} AS prefix_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST({PREFIX_LEN} * (n_docs - 1) AS BIGINT) AS tokens_saved
FROM g
"""

# ------------------------------------------------ CUSUM changepoint


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer CUSUM level-shift alarm over daily event volume: with
    x_d the day's count, D the day count and T the total, the scaled
    residual r_d = x_d*D - T (x_d minus the mean, scaled by D to stay
    integer-exact), S_d its running sum, and CUSUM_d = S_d - min(0,
    min_{j<=d} S_j) — identical to the textbook recursion C_d =
    max(0, C_{d-1} + r_d) (the 0 in the min is the implicit S_0 = 0;
    without it a leading positive residual is silently absorbed — the
    identity is pinned property-based in tests/test_properties.py).
    Exactly reproducible because every intermediate is an int64.
    is_peak flags the argmax day(s): where the upward level shift is
    largest.

    One keyed agg to daily counts (bounded rows), one single-row
    totals attach (broadcast), then windows over the day spine — the
    post-aggregation frame is |days|, so the unpartitioned windows are
    bounded, not corpus-scale. Days ship as ISO strings (the DATE
    harness rule, q_growth_accounting)."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    tot = daily.agg(
        F.sum("n_events").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("nd"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("resid", F.col("n_events") * F.col("nd") - F.col("total"))
        .withColumn("s", F.sum("resid").over(w))
        .withColumn(
            "cusum_scaled",
            (F.col("s") - F.least(F.lit(0), F.min("s").over(w))).cast("bigint"),
        )
    )
    return cur.select(
        "day",
        "n_events",
        "cusum_scaled",
        (F.col("cusum_scaled") == F.max("cusum_scaled").over(wa))
        .cast("bigint")
        .alias("is_peak"),
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n) AS total, COUNT(*) AS nd FROM daily),
s AS (
  SELECT day, n,
         SUM(n * nd - total) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
  FROM daily, tot
),
c AS (
  SELECT day, n,
         s - LEAST(0, MIN(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))
           AS cusum
  FROM s
)
SELECT day,
       CAST(n AS BIGINT) AS n_events,
       CAST(cusum AS BIGINT) AS cusum_scaled,
       CAST(cusum = MAX(cusum) OVER () AS BIGINT) AS is_peak
FROM c
"""

# ------------------------------------------------ watermark sizing

WM_JITTER_US = 600_000_000  # 10-minute max simulated delivery delay
WM_THRESHOLDS_S = (60, 120, 300, 600)
WM_BUCKET_US = 3_600_000_000  # 1-hour prefix-scan buckets (span-bounded)


def q_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-threshold sizing curve: under a deterministic delivery
    -delay model (arrival = event time + hash-derived jitter in [0,
    WM_JITTER_US) — the corpus itself arrives in perfect event-time
    order, so disorder must be modeled, and the hash makes the model
    reproducible), compute each event's lateness against the running
    event-time high watermark in arrival order, then the fraction of
    events a `withWatermark` of each threshold would drop. This is THE
    sizing query for T4/T5 streaming state: the reference accepts late
    data forever (SURVEY T5); a bounded-state deployment picks its
    threshold from this curve.

    Determinism: integer micros end to end; the high watermark is a
    running max over a (arrival, event_id)-pinned order.

    Scale shape — a TWO-LEVEL PARALLEL PREFIX SCAN, not a global
    window: a single unpartitioned window would funnel the whole
    corpus through ONE sort task (measured 27.6x at 100x). Instead
    the running max decomposes exactly: partition arrivals into
    fixed-width time buckets (bucket count is bounded by the trace's
    TIME SPAN, never its row count), take the in-bucket running max
    with a bucket-keyed window (parallel), the per-bucket max with a
    keyed agg, a cumulative max over the tiny bucket spine, and
    hwm = greatest(in-bucket prefix max, prior buckets' cumulative
    max). Arrival ties cannot straddle buckets (same arrival -> same
    bucket), so the decomposition is value-identical to the global
    window — the DuckDB oracle still runs the one-window form."""
    events = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    jitter = hash60(F.col("event_id").cast("string")) % F.lit(WM_JITTER_US)
    lat = events.select(
        us.alias("us"), (us + jitter).alias("arrival"), "event_id"
    ).withColumn("bucket", F.expr(f"arrival DIV {WM_BUCKET_US}"))
    w_in = Window.partitionBy("bucket").orderBy("arrival", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = lat.withColumn("local_hwm", F.max("us").over(w_in))
    spine = lat.groupBy("bucket").agg(F.max("us").alias("bmax"))
    w_spine = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = spine.select(
        "bucket", F.max("bmax").over(w_spine).alias("prior_hwm")
    )
    late = (
        local.join(F.broadcast(prior), "bucket")
        .select(
            (
                F.greatest(
                    F.col("local_hwm"),
                    F.coalesce(F.col("prior_hwm"), F.lit(-(1 << 62))),
                )
                - F.col("us")
            ).alias("late_us")
        )
    )
    agg = late.agg(
        F.count("*").cast("bigint").alias("total"),
        *[
            F.sum((F.col("late_us") > t * 1_000_000).cast("bigint"))
            .cast("bigint")
            .alias(f"d{t}")
            for t in WM_THRESHOLDS_S
        ],
    )
    rows = [
        F.struct(
            F.lit(t).cast("bigint").alias("threshold_s"),
            F.col(f"d{t}").alias("n_dropped"),
            F.expr(f"CAST((10000 * d{t}) DIV total AS BIGINT)").alias("drop_bp"),
        )
        for t in WM_THRESHOLDS_S
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


_WM_JITTER_SQL = f"({hash60_sql('CAST(event_id AS VARCHAR)')} % {WM_JITTER_US})"
_WM_BLOCKS = "\nUNION ALL\n".join(
    f"SELECT CAST({t} AS BIGINT) AS threshold_s, CAST(d{t} AS BIGINT) AS n_dropped,"
    f" CAST((10000 * d{t}) // total AS BIGINT) AS drop_bp FROM a"
    for t in WM_THRESHOLDS_S
)
_WM_COUNTS = ",\n       ".join(
    f"COUNT(*) FILTER (WHERE late > {t * 1_000_000}) AS d{t}"
    for t in WM_THRESHOLDS_S
)

_WATERMARK_SIZING_SQL = f"""
WITH l AS (
  SELECT epoch_us(ts) AS us,
         epoch_us(ts) + {_WM_JITTER_SQL} AS arrival,
         event_id
  FROM events
),
h AS (
  SELECT MAX(us) OVER (ORDER BY arrival, event_id
                       ROWS UNBOUNDED PRECEDING) - us AS late
  FROM l
),
a AS (
  SELECT COUNT(*) AS total,
       {_WM_COUNTS}
  FROM h
)
{_WM_BLOCKS}
"""

# ------------------------------------------------ session gap curve

GAP_THRESHOLDS_S = (300, 1800, 7200)


def q_session_gap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-knob sensitivity curve: the number of sessions the
    corpus splits into at inactivity gaps of 5 min / 30 min / 2 h —
    n_sessions(g) = n_users + |gaps > g| (every user opens one session;
    each over-threshold gap opens another). q_sessionize fixes one gap;
    this is the curve you read BEFORE fixing it (the q_lsh_tuning
    pattern applied to the session window knob).

    One user-keyed window computes each inter-event gap once; all three
    thresholds fold in a single aggregate — one shuffle total."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = events.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    agg = g.agg(
        F.countDistinct("user_id").cast("bigint").alias("nu"),
        *[
            F.sum((F.col("gap_us") > t * 1_000_000).cast("bigint"))
            .cast("bigint")
            .alias(f"c{t}")
            for t in GAP_THRESHOLDS_S
        ],
    )
    rows = [
        F.struct(
            F.lit(t).cast("bigint").alias("gap_s"),
            (F.col("nu") + F.col(f"c{t}")).cast("bigint").alias("n_sessions"),
        )
        for t in GAP_THRESHOLDS_S
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


_GAP_COUNTS = ",\n       ".join(
    f"COUNT(*) FILTER (WHERE gap > {t * 1_000_000}) AS c{t}"
    for t in GAP_THRESHOLDS_S
)
_GAP_BLOCKS = "\nUNION ALL\n".join(
    f"SELECT CAST({t} AS BIGINT) AS gap_s, CAST(nu + c{t} AS BIGINT) AS n_sessions FROM a"
    for t in GAP_THRESHOLDS_S
)

_SESSION_GAP_SQL = f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
a AS (
  SELECT COUNT(DISTINCT user_id) AS nu,
       {_GAP_COUNTS}
  FROM g
)
{_GAP_BLOCKS}
"""

# ------------------------------------------------ media integrity

IMG_W, IMG_H = 8, 4  # the q_media_decode frame (96 RGB bytes)
_IMG_BODY = IMG_W * IMG_H * 3
_IMG_HEADER = f"P6\n{IMG_W} {IMG_H}\n255\n"
_PAYLOAD_BYTES = len(_IMG_HEADER) + _IMG_BODY  # 107
_TRUNC_DROP = 10  # truncation removes the last 10 bytes
TRUNC_MOD, MAGIC_MOD = 7, 11


def q_media_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-integrity audit over binary media payloads: each doc's
    text bytes are framed as the q_media_decode binary-PPM payload,
    then a deterministic subset is corrupted IN THE BINARY DOMAIN
    (doc_id % 7 — last 10 bytes truncated; doc_id % 11 — magic
    overwritten with 'XX'), and the audit re-derives, per source, how
    many payloads fail the magic check (first 2 bytes != 'P6'), fail
    the length check (octet count != the framed 107), and pass both.
    This is the validation pass a decode stage runs BEFORE handing
    payloads to the (expensive, failure-prone) codec fleet — reject
    cheap, decode only the clean basis points.

    All checks are byte-exact (hex of the real binary slice), so the
    oracle verifies the binary concat/substring pipeline itself, not
    just the modular arithmetic that chose the corrupt subset.
    Map-only + one keyed agg; zero shuffle before the rollup."""
    docs = load_split(spark, sf_dir, "documents")
    body = F.expr(
        f"rpad(substring(encode(text, 'UTF-8'), 1, {_IMG_BODY}), {_IMG_BODY}, X'78')"
    )
    framed = docs.select(
        "doc_id", "source", F.concat(F.lit(_IMG_HEADER.encode()), body).alias("p0")
    )
    trunc = F.when(
        F.col("doc_id") % TRUNC_MOD == 0,
        F.expr(f"substring(p0, 1, {_PAYLOAD_BYTES - _TRUNC_DROP})"),
    ).otherwise(F.col("p0"))
    corrupted = framed.withColumn("p1", trunc).withColumn(
        "payload",
        F.when(
            F.col("doc_id") % MAGIC_MOD == 0,
            F.concat(F.lit(b"XX"), F.expr("substring(p1, 3, 2147483647)")),
        ).otherwise(F.col("p1")),
    )
    checked = corrupted.select(
        "source",
        (F.hex(F.expr("substring(payload, 1, 2)")) != F.lit("5036")).alias("bad_magic"),
        (F.length("payload") != _PAYLOAD_BYTES).alias("bad_len"),
    )
    return checked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_payloads"),
        F.sum(F.col("bad_magic").cast("bigint")).cast("bigint").alias("n_bad_magic"),
        F.sum(F.col("bad_len").cast("bigint")).cast("bigint").alias("n_truncated"),
        F.expr(
            "CAST((10000 * SUM(CASE WHEN bad_magic OR bad_len THEN 0 ELSE 1 END))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("ok_bp"),
    )


_HDR_HEX = _IMG_HEADER.encode().hex().upper()

_MEDIA_INTEGRITY_SQL = f"""
WITH framed AS (
  SELECT doc_id, source,
         '{_HDR_HEX}' || rpad(substring(hex(encode(text)), 1, {_IMG_BODY * 2}),
                              {_IMG_BODY * 2}, '78') AS hx
  FROM documents
),
cor AS (
  SELECT source,
         CASE WHEN doc_id % {MAGIC_MOD} = 0 THEN '5858' || substring(t.h2, 5)
              ELSE t.h2 END AS hx
  FROM (
    SELECT doc_id, source,
           CASE WHEN doc_id % {TRUNC_MOD} = 0
                THEN substring(hx, 1, {(_PAYLOAD_BYTES - _TRUNC_DROP) * 2})
                ELSE hx END AS h2
    FROM framed
  ) t
),
checked AS (
  SELECT source,
         substring(hx, 1, 4) <> '5036' AS bad_magic,
         len(hx) <> {_PAYLOAD_BYTES * 2} AS bad_len
  FROM cor
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(COUNT(*) FILTER (WHERE bad_magic) AS BIGINT) AS n_bad_magic,
       CAST(COUNT(*) FILTER (WHERE bad_len) AS BIGINT) AS n_truncated,
       CAST((10000 * COUNT(*) FILTER (WHERE NOT bad_magic AND NOT bad_len))
              // COUNT(*) AS BIGINT) AS ok_bp
FROM checked GROUP BY source
"""

# -------------------------------------------------- readability


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease in EXACT milli units: FRE_milli =
    206835 - (1015*W) DIV S - (84600*Syl) DIV W, with W = whitespace
    tokens, Syl = vowel-group count (the standard regex syllable
    proxy), S = sentence terminators (floor 1). Integer DIV keeps the
    score engine-exact; the banding matches the published FRE bands.
    The lexical-difficulty feature next to q_quality/q_gopher_filters'
    structural ones — readability-stratified sampling is a common
    curriculum key.

    Map-only projection: two regexp counts + a size(), zero shuffle."""
    docs = load_split(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    w_raw = F.size(tokens(low)).cast("bigint")
    wsafe = F.greatest(w_raw, F.lit(1))
    syl = F.regexp_count(low, F.lit("[aeiouy]+")).cast("bigint")
    sent = F.greatest(
        F.regexp_count(low, F.lit("[.!?]+")).cast("bigint"), F.lit(1)
    )
    d = docs.select(
        "doc_id",
        w_raw.alias("n_words"),
        syl.alias("n_syllables"),
        wsafe.alias("ws"),
        sent.alias("s"),
    )
    fre = F.expr(
        "CAST(206835 - (1015 * n_words) DIV s - (84600 * n_syllables) DIV ws"
        " AS BIGINT)"
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_syllables",
        fre.alias("fre_milli"),
        F.when(fre >= 60000, "easy")
        .when(fre >= 30000, "standard")
        .when(fre >= 0, "hard")
        .otherwise("very_hard")
        .alias("band"),
    )


_READABILITY_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len({_TOKS}) AS n_words,
         GREATEST(len({_TOKS}), 1) AS ws,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables,
         GREATEST(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS s
  FROM documents
),
f AS (
  SELECT doc_id, n_words, n_syllables,
         206835 - (1015 * n_words) // s - (84600 * n_syllables) // ws
           AS fre_milli
  FROM d
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(fre_milli AS BIGINT) AS fre_milli,
       CASE WHEN fre_milli >= 60000 THEN 'easy'
            WHEN fre_milli >= 30000 THEN 'standard'
            WHEN fre_milli >= 0 THEN 'hard'
            ELSE 'very_hard' END AS band
FROM f
"""

# ---------------------------------------------------- mojibake

MOJ_MOD, REP_MOD, CTRL_MOD = 13, 17, 19
_MOJ_MARK = "Ã©"  # 'é' mis-decoded as CP1252 ('Ã©')
_REP_MARK = "�"  # U+FFFD replacement character
_CTRL_MARK = "\u0007"  # a BEL control byte


def q_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-noise audit: per source, how many docs carry CP1252
    mojibake markers ('Ã' from a mis-decoded UTF-8 sequence), U+FFFD
    replacement characters (a lossy prior transcode), or raw control
    bytes — the three classic web-scrape encoding pathologies. The
    sandbox corpus is clean ASCII, so a deterministic doc_id-keyed
    subset is injected IN-PLAN (the q_media_integrity corrupt-subset
    pattern) and the audit must recover exactly those counts; on a
    real crawl the injection stage is dropped and the checks run
    as-is. Map-only flags + one keyed rollup."""
    docs = load_split(spark, sf_dir, "documents")
    noisy = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % MOJ_MOD == 0, F.lit(" caf" + _MOJ_MARK)).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % REP_MOD == 0, F.lit(" " + _REP_MARK)).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % CTRL_MOD == 0, F.lit(" " + _CTRL_MARK + "x")).otherwise(
            F.lit("")
        ),
    )
    flagged = docs.select(
        "source",
        F.contains(noisy, F.lit("Ã")).alias("moj"),
        F.contains(noisy, F.lit(_REP_MARK)).alias("rep"),
        F.contains(noisy, F.lit(_CTRL_MARK)).alias("ctl"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("moj").cast("bigint")).cast("bigint").alias("n_mojibake"),
        F.sum(F.col("rep").cast("bigint")).cast("bigint").alias("n_replacement"),
        F.sum(F.col("ctl").cast("bigint")).cast("bigint").alias("n_ctrl"),
        F.expr(
            "CAST((10000 * SUM(CASE WHEN moj OR rep OR ctl THEN 0 ELSE 1 END))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("clean_bp"),
    )


_MOJIBAKE_SQL = f"""
WITH noisy AS (
  SELECT source,
         text
           || CASE WHEN doc_id % {MOJ_MOD} = 0 THEN ' caf{_MOJ_MARK}' ELSE '' END
           || CASE WHEN doc_id % {REP_MOD} = 0 THEN ' {_REP_MARK}' ELSE '' END
           || CASE WHEN doc_id % {CTRL_MOD} = 0 THEN ' ' || chr(7) || 'x' ELSE '' END
           AS t
  FROM documents
),
flagged AS (
  SELECT source,
         contains(t, 'Ã') AS moj,
         contains(t, '{_REP_MARK}') AS rep,
         contains(t, chr(7)) AS ctl
  FROM noisy
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE moj) AS BIGINT) AS n_mojibake,
       CAST(COUNT(*) FILTER (WHERE rep) AS BIGINT) AS n_replacement,
       CAST(COUNT(*) FILTER (WHERE ctl) AS BIGINT) AS n_ctrl,
       CAST((10000 * COUNT(*) FILTER (WHERE NOT (moj OR rep OR ctl)))
              // COUNT(*) AS BIGINT) AS clean_bp
FROM flagged GROUP BY source
"""

# ------------------------------------------------ poisson bootstrap

BOOT_B = 16
# Poisson(1) inverse-CDF thresholds on h % 10000: P(X=0)=.3679,
# P(X<=1)=.7358, P(X<=2)=.9197, P(X<=3)=.9810, else 4.
_POISSON_CUM = (3679, 7358, 9197, 9810)


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap of the mean-doc-length metric:
    each (doc, replicate) pair draws a Poisson(1)-distributed integer
    weight from the 60-bit hash of (doc_id, b) — the classic
    one-pass bootstrap for distributed data (each replicate is a
    reweighted full scan, no resampling shuffle), made reproducible by
    replacing the RNG with a hash. The spread of the BOOT_B replicate
    means IS the metric's sampling noise — the cheap CI every
    before/after filter comparison should quote.

    One explode (xBOOT_B) + one keyed agg with map-side combine; all
    integer (means in exact milli units via DIV)."""
    docs = load_split(spark, sf_dir, "documents")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    d = docs.select("doc_id", F.col("n_chars").cast("bigint").alias("m"), b)
    h = hash60(
        F.concat_ws("_", F.col("doc_id").cast("string"), F.col("b").cast("string"))
    ) % F.lit(10_000)
    w = (
        F.when(h < _POISSON_CUM[0], 0)
        .when(h < _POISSON_CUM[1], 1)
        .when(h < _POISSON_CUM[2], 2)
        .when(h < _POISSON_CUM[3], 3)
        .otherwise(4)
        .cast("bigint")
    )
    return (
        d.withColumn("w", w)
        .groupBy(F.col("b").cast("bigint").alias("replicate"))
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.sum(F.col("w") * F.col("m")).cast("bigint").alias("sum_chars"),
            F.expr(
                "CAST((1000 * SUM(w * m)) DIV GREATEST(SUM(w), 1) AS BIGINT)"
            ).alias("mean_milli"),
        )
    )


_BOOT_H = hash60_sql("CAST(doc_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)")

_POISSON_BOOTSTRAP_SQL = f"""
WITH d AS (
  SELECT doc_id, n_chars AS m, b
  FROM documents, generate_series(0, {BOOT_B - 1}) AS t(b)
),
wts AS (
  SELECT b, m,
         CASE WHEN ({_BOOT_H} % 10000) < {_POISSON_CUM[0]} THEN 0
              WHEN ({_BOOT_H} % 10000) < {_POISSON_CUM[1]} THEN 1
              WHEN ({_BOOT_H} % 10000) < {_POISSON_CUM[2]} THEN 2
              WHEN ({_BOOT_H} % 10000) < {_POISSON_CUM[3]} THEN 3
              ELSE 4 END AS w
  FROM d
)
SELECT CAST(b AS BIGINT) AS replicate,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * m) AS BIGINT) AS sum_chars,
       CAST((1000 * SUM(w * m)) // GREATEST(SUM(w), 1) AS BIGINT) AS mean_milli
FROM wts GROUP BY b
"""

# ---------------------------------------------------- hubness

HUB_PANEL = 40


def q_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness scan of the embedding space: the k-occurrence histogram
    — for a fixed HUB_PANEL-query panel, how many corpus vectors
    appear in 0, 1, 2, ... of the panel's exact-L2 top-k lists. A
    heavy right tail (hub vectors retrieved by many unrelated
    queries) is the classic high-dimensional pathology that silently
    degrades ANN serving quality (Radovanovic et al., JMLR 2010 —
    public literature); the 0-row counts the anti-hubs no query ever
    reaches. Runs the same metric-matched truth leg as
    q_ann_probe_curve (knn_bruteforce_l2, the declared bounded-panel
    exhaustive contract — panel fixed, cost linear in the corpus);
    the scale path applies the identical occurrence rollup to the
    served knn_ivfpq_rerank_indexed output instead.

    Output is id-count arithmetic on pinned-order ranks — exact."""
    vecs = _vec(spark, sf_dir)
    panel = vecs.filter(F.col("vec_id") < HUB_PANEL)
    truth = S.knn_bruteforce_l2(vecs, panel, k=TOP_K)
    occ = truth.groupBy("neighbor_id").agg(F.count("*").alias("k"))
    hist = occ.groupBy(F.col("k").cast("bigint").alias("k_occurrence")).agg(
        F.count("*").cast("bigint").alias("n_vectors")
    )
    totals = vecs.agg(F.count("*").cast("bigint").alias("n_corpus"))
    appearing = occ.agg(F.count("*").cast("bigint").alias("n_app"))
    zero = (
        totals.crossJoin(F.broadcast(appearing))
        .select(
            F.lit(0).cast("bigint").alias("k_occurrence"),
            (F.col("n_corpus") - F.col("n_app")).cast("bigint").alias("n_vectors"),
        )
    )
    return hist.unionAll(zero)


_HUBNESS_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
panel AS (SELECT * FROM vecs WHERE vec_id < {HUB_PANEL}),
scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_sq_l2_full_sql("p.v", "c.v")} AS dist
  FROM panel p JOIN vecs c ON c.vec_id <> p.vec_id
),
topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, neighbor_id ASC) AS r
    FROM scored
  ) WHERE r <= {TOP_K}
),
occ AS (SELECT neighbor_id, COUNT(*) AS k FROM topk GROUP BY neighbor_id),
hist AS (SELECT k AS k_occurrence, COUNT(*) AS n_vectors FROM occ GROUP BY k),
zero AS (
  SELECT 0 AS k_occurrence,
         (SELECT COUNT(*) FROM vecs) - (SELECT COUNT(*) FROM occ) AS n_vectors
)
SELECT CAST(k_occurrence AS BIGINT) AS k_occurrence,
       CAST(n_vectors AS BIGINT) AS n_vectors
FROM (SELECT * FROM hist UNION ALL SELECT * FROM zero)
"""

# ------------------------------------------------------------ registry

QUERIES = {
    "q_split_leakage": q_split_leakage,
    "q_retrieval_eval": q_retrieval_eval,
    "q_contamination_sweep": q_contamination_sweep,
    "q_prefix_sharing": q_prefix_sharing,
    "q_cusum_changepoint": q_cusum_changepoint,
    "q_watermark_sizing": q_watermark_sizing,
    "q_session_gap_curve": q_session_gap_curve,
    "q_media_integrity": q_media_integrity,
    "q_readability": q_readability,
    "q_mojibake": q_mojibake,
    "q_poisson_bootstrap": q_poisson_bootstrap,
    "q_hubness": q_hubness,
}

ORACLES = {
    "q_split_leakage": _SPLIT_LEAKAGE_SQL,
    "q_retrieval_eval": _RETRIEVAL_EVAL_SQL,
    "q_contamination_sweep": _CONTAM_SWEEP_SQL,
    "q_prefix_sharing": _PREFIX_SHARING_SQL,
    "q_cusum_changepoint": _CUSUM_SQL,
    "q_watermark_sizing": _WATERMARK_SIZING_SQL,
    "q_session_gap_curve": _SESSION_GAP_SQL,
    "q_media_integrity": _MEDIA_INTEGRITY_SQL,
    "q_readability": _READABILITY_SQL,
    "q_mojibake": _MOJIBAKE_SQL,
    "q_poisson_bootstrap": _POISSON_BOOTSTRAP_SQL,
    "q_hubness": _HUBNESS_SQL,
}
