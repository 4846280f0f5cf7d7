"""Corpus-statistics, dataset-ops, and QA-audit query surface.

Built and staged in round 8 as plans/staged_r9.py (oracle-backed,
two-SF driver-protocol pytest, 100x scale evidence in
examples/audit_queries_scale.py), promoted into the declared registry
in round 9 — the same staging pipeline that produced
plans/curation_queries.py (r7) and plans/corpus_queries.py (r8).

Contents — corpus statistics, dataset-ops, and QA audits a training-data
platform needs that the surface lacks:

- ``q_crawl_frontier``: politeness-aware crawl scheduling — per-host
  fetch waves (one request per host per politeness interval) merged
  into a single global fetch order by (due time, priority). The
  frontier-scheduler shape: rank-within-host is one keyed window, the
  output is a bounded TakeOrdered — never a global sort of the crawl.
- ``q_snapshot_delta``: dataset-version diff audit — added / removed /
  changed / unchanged row counts and churn rate per source between two
  snapshots, compared by content digest so a full-text compare never
  ships document bodies through the join.
- ``q_code_detect``: code-vs-prose detection — symbol-density heuristic
  ({};()= per char) over deterministically code-ified docs; the
  language-agnostic code filter every web-corpus pipeline runs before
  choosing a tokenizer / quality model per modality.
- ``q_score_calibration``: decile reliability audit of a model score —
  quality-score deciles vs the observed bad-doc rate per decile (the
  calibration table behind "can we threshold this score?"), with the
  score reused verbatim from the declared feature-hashed linear scorer.
- ``q_zipf_fit``: token rank-frequency power-law fit — closed-form OLS
  of ln(freq) on ln(rank) over the top-K vocabulary, slope/intercept/R²
  (corpus-health check: natural text sits near slope -1; far-off slopes
  flag boilerplate floods or tokenizer damage).
- ``q_heaps_law``: vocabulary-growth curve — distinct-token count at
  each corpus decile via FIRST-OCCURRENCE decile (each token is counted
  once at the decile where it first appears, then a 10-row cumulative
  sum) — Heaps'-law shape without any per-prefix distinct scan.
- ``q_js_divergence``: pairwise Jensen-Shannon divergence between
  per-source unigram distributions over the global top-K vocabulary
  (+ OTHER bucket for mass conservation) — the source-similarity matrix
  mix design reads before merging or deduplicating sources.
- ``q_split_balance``: chi-square stratification audit of the declared
  hash split — observed vs expected (source x split) cell counts,
  integer basis-point deviations and per-cell chi2 contributions; the
  "is val representative?" gate run before any ablation is trusted.
- ``q_fellegi_sunter``: probabilistic record linkage (Fellegi & Sunter
  JASA'69) — blocked candidate pairs scored by per-field agreement
  log-odds weights (integer centinats), classed match / possible /
  non-match. The registry-B side is a deterministically corrupted clone
  (digit bump, balance shift, segment rotation) so the fixture
  exercises partial agreement, the same injected-input pattern as
  q_url_canonical / q_pii_redact.
- ``q_audio_silence``: audio QA through the REAL RIFF/WAVE PCM decoder
  — per-clip silence ratio, near-clipping ratio, and longest silent
  run (islands-and-gaps in SQL on the oracle side); the
  broken-recording filter for audio corpora.
- ``q_media_dominant_color``: per-image dominant gray-level bucket via
  the REAL PPM decoder (16-bucket histogram mode, ties to the lowest
  bucket) rolled up to the corpus distribution — the screenshot/
  blank-image skew check for image corpora.
- ``q_epoch_schedule``: weighted round-robin training-epoch ordering —
  per-source virtual time (k-th doc of source s is due at k/weight_s,
  integer-scaled) merged into one deterministic interleaved order; the
  data-ordering step between mix design and sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import _TOKS
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

# -------------------------------------------------------- crawl frontier

FR_HOSTS = 40          # synthetic host pool (doc_id % FR_HOSTS)
FR_DELAY_S = 15        # politeness: seconds between fetches of one host
FRONTIER_K = 200       # scheduled rows emitted


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware crawl scheduling: each URL belongs to a host
    (synthesized as doc_id % FR_HOSTS — fixtures carry no URL column)
    and has a priority (n_chars — stand-in for a crawl-value score).
    Within a host, URLs fetch one per FR_DELAY_S seconds in priority
    order (wave = rank within host); globally the fetcher pulls by
    (due time, priority desc, doc_id). Emitted: the first FRONTIER_K
    scheduled fetches with their global position.

    Scale shape: ONE keyed window (rank within host — hosts shard the
    shuffle) + a distributed TakeOrdered(FRONTIER_K); the global
    ordering never sorts the whole frontier. At 100 TB the host count
    is huge (the window key), and the politeness constant moves to a
    per-host crawl-delay column without touching the plan."""
    docs = load_split(spark, sf_dir, "documents")
    host = F.concat(F.lit("host"), (F.col("doc_id") % FR_HOSTS).cast("string"),
                    F.lit(".example"))
    w_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    ranked = (
        docs.select(
            "doc_id",
            host.alias("host"),
            F.col("n_chars").cast("bigint").alias("priority"),
        )
        .withColumn("wave", F.row_number().over(w_host).cast("bigint"))
        .withColumn("fetch_at_s", ((F.col("wave") - 1) * FR_DELAY_S).cast("bigint"))
    )
    top = ranked.orderBy(
        F.col("fetch_at_s").asc(), F.col("priority").desc(), F.col("doc_id").asc()
    ).limit(FRONTIER_K)
    w_glob = Window.orderBy(
        F.col("fetch_at_s").asc(), F.col("priority").desc(), F.col("doc_id").asc()
    )
    return top.select(
        F.row_number().over(w_glob).cast("bigint").alias("global_pos"),
        "doc_id",
        "host",
        "wave",
        "fetch_at_s",
        "priority",
    )


# -------------------------------------------------------- snapshot delta

SD_DROP_MOD = 17       # v2 drops doc_id % 17 == 0
SD_EDIT_MOD = 13       # v2 edits doc_id % 13 == 0
SD_ADD_MOD = 19        # v2 adds a clone of doc_id % 19 == 0 under a new id
SD_ADD_OFFSET = 1_000_000_000


def _snapshot_v2(docs: DataFrame) -> DataFrame:
    """Deterministic second snapshot: drop the %17 cohort, append a
    ' rev2' token to the %13 cohort's text, and add a clone of the %19
    cohort under doc_id + SD_ADD_OFFSET (guaranteed-new ids)."""
    kept = docs.filter(F.col("doc_id") % SD_DROP_MOD != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % SD_EDIT_MOD == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % SD_ADD_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(SD_ADD_OFFSET)
    )
    return kept.unionByName(added)


def q_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: rows added / removed / changed / unchanged
    per source between snapshot v1 (the documents table) and a
    deterministic v2 (see :func:`_snapshot_v2`), compared by content
    digest, plus churn_bp = 10000 * (added+removed+changed) DIV v1 rows.

    Scale shape: each side collapses to (doc_id, source, digest) BEFORE
    the full-outer join — document bodies never cross the shuffle; the
    join is one id-keyed exchange and the rollup is one bounded keyed
    aggregate. The production form of "what changed since the last
    crawl?" at any corpus size."""
    docs = load_split(spark, sf_dir, "documents")
    v1 = docs.select(
        "doc_id", F.col("source").alias("src1"), hash60(F.col("text")).alias("d1")
    )
    v2 = _snapshot_v2(docs).select(
        "doc_id", F.col("source").alias("src2"), hash60(F.col("text")).alias("d2")
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("d1").isNull(), F.lit("added"))
        .when(F.col("d2").isNull(), F.lit("removed"))
        .when(F.col("d1") != F.col("d2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    per = j.select(
        F.coalesce(F.col("src1"), F.col("src2")).alias("source"),
        status.alias("status"),
        F.col("d1").isNotNull().cast("bigint").alias("in_v1"),
    )
    agg = per.groupBy("source").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum("in_v1").cast("bigint").alias("n_v1"),
    )
    churn = F.expr(
        "(10000 * (n_added + n_removed + n_changed)) div greatest(1, n_v1)"
    )
    return agg.select(
        "source",
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        churn.cast("bigint").alias("churn_bp"),
    )


# ----------------------------------------------------------- code detect

CODE_MOD = 5           # doc_id % 5 == 0 docs are code-ified
CODE_SYM_BP = 300      # symbol-density threshold (bp of chars)


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection by symbol density: every third word
    triple of the %CODE_MOD cohort is rewritten as ``fn a(b) { return
    c; }`` (the injected-input pattern — fixture text carries no code),
    then each doc is scored by the basis-point share of {}();= in its
    characters; is_code = sym_bp >= CODE_SYM_BP. Map-only expressions —
    the cheapest-possible modality gate, run before tokenizer choice.
    The heuristic is the real operator; swap the synthetic code-ifier
    for raw crawl text and the plan is production."""
    docs = load_split(spark, sf_dir, "documents")
    codeish = F.regexp_replace(
        F.col("text"), r"(\w+) (\w+) (\w+)", r"fn $1($2) { return $3; }"
    )
    t = F.when(F.col("doc_id") % CODE_MOD == 0, codeish).otherwise(F.col("text"))
    stripped = F.regexp_replace(t, r"[{}();=]", "")
    n_chars_t = F.length(t).cast("bigint")
    n_sym = (n_chars_t - F.length(stripped)).cast("bigint")
    sym_bp = F.expr("(10000 * n_sym) div greatest(1, n_chars_t)")
    return docs.select(
        "doc_id",
        n_chars_t.alias("n_chars_t"),
        n_sym.alias("n_sym"),
    ).select(
        "doc_id",
        "n_sym",
        sym_bp.cast("bigint").alias("sym_bp"),
        (sym_bp >= CODE_SYM_BP).alias("is_code"),
    )


# ----------------------------------------------------- score calibration

CAL_DECILES = 10
CAL_REP_BP = 2000      # "bad" = top token holds >= 20% of the doc's tokens


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile reliability audit of the declared feature-hashed linear
    quality score (plans/corpus_queries.q_linear_quality, reused
    verbatim): docs are ranked into CAL_DECILES buckets by (score desc,
    doc_id), the observed outcome is the repetition flag (top-token
    share >= CAL_REP_BP bp — a quality failure the score should
    predict), and each decile reports its doc count, bad count, and
    bad-rate bp. The calibration table read before thresholding any
    model score at corpus scale.

    Scale shape: score and outcome are both one keyed aggregate over
    the token explode; the decile rank is ONE global-ordered window
    over (score, doc_id) — at 100 TB this becomes the standard
    sample-quantile cut (the same decile semantics without a global
    sort; IMPLEMENTED as operators/quantiles.py:
    assign_sample_quantile_buckets — broadcast sample boundaries,
    map-only assignment, NTILE-agreement pinned in
    tests/test_pipeline_ops.py); the audit output is CAL_DECILES rows
    either way."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        q_linear_quality,
    )

    docs = load_split(spark, sf_dir, "documents")
    scores = q_linear_quality(spark, sf_dir).select("doc_id", "score")
    toks = docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    rep = (
        toks.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("cmax"), F.sum("c").alias("n_tok"))
        .select(
            "doc_id",
            (F.col("cmax") * 10000 >= F.lit(CAL_REP_BP) * F.col("n_tok")).alias("bad"),
        )
    )
    joined = scores.join(rep, "doc_id")
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    deciled = joined.withColumn(
        "decile", F.ntile(CAL_DECILES).over(w).cast("bigint")
    )
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("bad").cast("bigint")).cast("bigint").alias("n_bad"),
        F.min("score").cast("bigint").alias("score_min"),
        F.max("score").cast("bigint").alias("score_max"),
    )
    return agg.select(
        "decile",
        "n_docs",
        "n_bad",
        F.expr("(10000 * n_bad) div n_docs").cast("bigint").alias("bad_bp"),
        "score_min",
        "score_max",
    )


# --------------------------------------------------------------- zipf fit

ZIPF_K = 500           # top-K vocabulary entering the fit


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the corpus token distribution: OLS of
    y = ln(freq) on x = ln(rank) over the top-ZIPF_K tokens (rank by
    freq desc, token asc). Emits slope / intercept / R², ROUND(4) after
    LEFT-TO-RIGHT ordered folds of every float sum (the q_doc_entropy
    determinism rule: both engines fold the rank-sorted list seeded
    0.0, so accumulation order is pinned).

    Scale shape: one token-count aggregate + a distributed
    TakeOrdered(ZIPF_K); the fit itself runs on K rows collected into
    ONE array on a single row — constant cost at any corpus size."""
    docs = load_split(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(ZIPF_K)
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = top.withColumn("r", F.row_number().over(w_rank))
    one = ranked.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("r", "c"))).alias("rc")
    )

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda a, x: a + x)

    xs = F.transform(F.col("rc"), lambda s: F.log(s["r"].cast("double")))
    ys = F.transform(F.col("rc"), lambda s: F.log(s["c"].cast("double")))
    stats = one.select(
        F.size("rc").cast("bigint").alias("n_ranks"),
        fold(xs).alias("sx"),
        fold(ys).alias("sy"),
        fold(F.zip_with(xs, ys, lambda x, y: x * y)).alias("sxy"),
        fold(F.transform(xs, lambda x: x * x)).alias("sxx"),
        fold(F.transform(ys, lambda y: y * y)).alias("syy"),
    )
    n = F.col("n_ranks").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            (n * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (n * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return stats.select(
        "n_ranks",
        F.round(slope, 4).alias("zipf_slope"),
        F.round(intercept, 4).alias("zipf_intercept"),
        F.round(r2, 4).alias("r2"),
    )


# -------------------------------------------------------------- heaps law

HEAPS_DECILES = 10


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: docs are cut into
    HEAPS_DECILES equal groups in doc_id order; each distinct token is
    attributed to the decile of its FIRST occurrence (min doc_id); the
    cumulative sums over the 10-row rollup give tokens-seen and
    vocabulary-size at each checkpoint — no per-prefix distinct scan
    ever runs. Pure integer counts, bit-deterministic.

    Scale shape: one (token -> min doc_id) aggregate (map-side
    combining on the token key), one broadcast-joinable 10-row decile
    boundary table, one 10-row cumulative window."""
    docs = load_split(spark, sf_dir, "documents")
    w_doc = Window.orderBy(F.col("doc_id").asc())
    deciled = docs.select(
        "doc_id", F.ntile(HEAPS_DECILES).over(w_doc).alias("decile")
    )
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    # token occurrences per decile + each token's first decile
    occ = toks.join(deciled, "doc_id")
    per_decile_tokens = occ.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_tok")
    )
    first = (
        occ.groupBy("w")
        .agg(F.min("decile").alias("first_decile"))
        .groupBy("first_decile")
        .agg(F.count("*").cast("bigint").alias("n_new"))
        .withColumnRenamed("first_decile", "decile")
    )
    base = (
        per_decile_tokens.join(first, "decile", "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        base.withColumn("n_tokens_cum", F.sum("n_tok").over(w_cum).cast("bigint"))
        .withColumn("vocab_cum", F.sum("n_new").over(w_cum).cast("bigint"))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_tok").alias("n_tokens"),
            "n_tokens_cum",
            F.col("n_new").cast("bigint").alias("n_new_tokens"),
            "vocab_cum",
        )
    )


# --------------------------------------------------------- JS divergence

JS_TOPK = 128          # global top-K vocabulary; everything else -> OTHER


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats, ROUND 4) between
    per-source unigram distributions over the global top-JS_TOPK
    vocabulary plus an OTHER bucket (so each source's distribution sums
    to 1 and the divergence is over full probability mass). Zero-count
    terms contribute 0 by the usual 0*ln(0) = 0 convention. Every float
    sum folds LEFT-TO-RIGHT over the vocab-index-sorted term list on
    both engines (the q_doc_entropy rule).

    Scale shape: per-source counts are one keyed aggregate; the dense
    (source x vocab-index) grid is sources x (JS_TOPK+1) rows built
    against a broadcast vocab table; pairs are |sources|^2/2 rows of
    K+1-length arrays — bounded by the source count, never by corpus
    size."""
    docs = load_split(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    top = (
        sw.groupBy("w")
        .agg(F.sum("c").alias("ct"))
        .orderBy(F.col("ct").desc(), F.col("w").asc())
        .limit(JS_TOPK)
    )
    w_rank = Window.orderBy(F.col("ct").desc(), F.col("w").asc())
    vocab = top.withColumn("idx", F.row_number().over(w_rank)).select("w", "idx")
    # per (source, idx) counts: top-K words keep their idx, the rest
    # collapse into idx = JS_TOPK + 1 (OTHER)
    tagged = (
        sw.join(F.broadcast(vocab), "w", "left")
        .withColumn("idx", F.coalesce(F.col("idx"), F.lit(JS_TOPK + 1)))
        .groupBy("source", "idx")
        .agg(F.sum("c").alias("c"))
    )
    grid = (
        docs.select("source").distinct()
        .crossJoin(
            spark.range(1, JS_TOPK + 2).select(F.col("id").cast("int").alias("idx"))
        )
    )
    dense = (
        grid.join(tagged, ["source", "idx"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    arrs = dense.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "c"))), lambda s: s["c"]
        ).alias("cs"),
        # greatest(.,1) guards a source whose documents all tokenize to
        # zero tokens: t=0 would make every term 0/0 = NaN; with t=1 the
        # zero-count terms take the 0*ln(0)=0 convention branch instead
        F.greatest(F.sum("c").cast("double"), F.lit(1.0)).alias("t"),
    )
    a = arrs.select(
        F.col("source").alias("src_a"), F.col("cs").alias("ca"), F.col("t").alias("ta")
    )
    b = arrs.select(
        F.col("source").alias("src_b"), F.col("cs").alias("cb"), F.col("t").alias("tb")
    )
    pairs = a.join(b, F.col("src_a") < F.col("src_b"))
    # term_i = 0.5*p*ln(2p/(p+q)) + 0.5*q*ln(2q/(p+q)); p=ca/ta, q=cb/tb
    terms = F.zip_with(
        F.col("ca"),
        F.col("cb"),
        lambda x, y: (
            F.when(
                x > 0,
                0.5
                * (x.cast("double") / F.col("ta"))
                * F.log(
                    2.0
                    * (x.cast("double") / F.col("ta"))
                    / (x.cast("double") / F.col("ta") + y.cast("double") / F.col("tb"))
                ),
            ).otherwise(F.lit(0.0))
            + F.when(
                y > 0,
                0.5
                * (y.cast("double") / F.col("tb"))
                * F.log(
                    2.0
                    * (y.cast("double") / F.col("tb"))
                    / (x.cast("double") / F.col("ta") + y.cast("double") / F.col("tb"))
                ),
            ).otherwise(F.lit(0.0))
        ),
    )
    jsd = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return pairs.select(
        "src_a", "src_b", F.round(jsd, 4).alias("jsd_nats")
    )


# --------------------------------------------------------- split balance


def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square stratification audit of the declared 90/5/5 hash
    split (q_hash_split's exact bucket rule): for every (source, split)
    cell, the observed count, the integer basis-point deviation from
    independence |o*N - rowtot*coltot| * 10000 DIV (rowtot*coltot), and
    the cell's chi-square contribution (o - e)^2/e, ROUND 4 — the
    gate that says a hash split is source-representative before any
    ablation result is trusted. Deviations use pure integer DIV; the
    chi2 contribution is one double divide per 60-cell row.

    Scale shape: one keyed aggregate to the (source, split) cells, two
    bounded rollups re-joined broadcast — corpus rows cross exactly one
    exchange."""
    docs = load_split(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    cells = (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    row_tot = cells.groupBy("source").agg(F.sum("o").alias("rt"))
    col_tot = cells.groupBy("split").agg(F.sum("o").alias("ct"))
    n_tot = cells.groupBy().agg(F.sum("o").alias("n"))
    j = (
        cells.join(F.broadcast(row_tot), "source")
        .join(F.broadcast(col_tot), "split")
        .crossJoin(F.broadcast(n_tot))
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    return j.select(
        "source",
        "split",
        "o",
        # DECIMAL(38,0) intermediates: o*n reaches ~1e18 at a 1e9-row
        # corpus and 10000*|o*n - rt*ct| passes int64 — bigint math
        # would wrap silently here while the DuckDB oracle's HUGEINT
        # stays exact (`div` on decimals returns bigint)
        F.expr(
            "(CAST(10000 AS DECIMAL(38,0))"
            " * abs(CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct))"
            " div (CAST(rt AS DECIMAL(38,0)) * ct)"
        )
        .cast("bigint")
        .alias("dev_bp"),
        F.round((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e, 4)
        .alias("chi2_c"),
    )


# ------------------------------------------------------- Fellegi-Sunter

FS_B_OFFSET = 1_000_000
# integer centinat log-odds weights, precomputed from the documented
# m/u probabilities (agree weight = round(100*ln(m/u)), disagree =
# round(100*ln((1-m)/(1-u)))):
#   name: m=0.95, u=0.001 -> +686 / -300
#   bal:  m=0.90, u=0.010 -> +450 / -229
#   seg:  m=0.95, u=0.200 -> +156 / -277
FS_W = {
    "name": (686, -300),
    "bal": (450, -229),
    "seg": (156, -277),
}
FS_MATCH_MIN = 800     # total centinats >= -> match
FS_REVIEW_MIN = 0      # total centinats >= -> possible (emitted)

_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def _fs_registry_b(cust: DataFrame) -> DataFrame:
    """Deterministically corrupted clone of the customer registry:
    the %3 cohort's name gets its last digit bumped (d -> (d+1)%10),
    the %4 cohort's balance shifts by +1.00, the %5 cohort's market
    segment rotates to the next in the fixed list."""
    last = F.substring(F.col("c_name"), -1, 1)
    bumped = ((last.cast("int") + 1) % 10).cast("string")
    # digit guard: on a name NOT ending in a digit, Spark's cast yields
    # NULL (silently nulling b_name and dropping the pair) while DuckDB
    # CAST hard-errors — gate the bump so both engines pass such names
    # through unchanged (TRY_CAST mirrors the guard in the oracle)
    name2 = F.when(
        (F.col("c_custkey") % 3 == 0) & last.between("0", "9"),
        F.concat(F.expr("substring(c_name, 1, length(c_name) - 1)"), bumped),
    ).otherwise(F.col("c_name"))
    bal2 = F.when(
        F.col("c_custkey") % 4 == 0, F.col("c_acctbal") + F.lit(1.0)
    ).otherwise(F.col("c_acctbal"))
    seg_next = F.coalesce(
        *[
            F.when(F.col("c_mktsegment") == s, F.lit(_SEGS[(i + 1) % len(_SEGS)]))
            for i, s in enumerate(_SEGS)
        ],
        F.col("c_mktsegment"),
    )
    seg2 = F.when(F.col("c_custkey") % 5 == 0, seg_next).otherwise(
        F.col("c_mktsegment")
    )
    return cust.select(
        (F.col("c_custkey") + FS_B_OFFSET).alias("b_id"),
        F.col("c_custkey").alias("b_orig"),
        name2.alias("b_name"),
        F.col("c_nationkey").alias("b_nation"),
        bal2.alias("b_bal"),
        seg2.alias("b_seg"),
    )


def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter, JASA 1969):
    registry A (customer) against a deterministically corrupted clone B
    (:func:`_fs_registry_b` — the injected-input pattern), BLOCKED on
    (nationkey, name digits 1-8) — a key every corruption leaves
    intact — then scored by per-field agreement log-odds weights in
    integer centinats (FS_W, derived from documented m/u
    probabilities). total >= FS_MATCH_MIN -> match, >= FS_REVIEW_MIN ->
    possible; only pairs above FS_REVIEW_MIN are emitted (the bounded
    clerical-review queue).

    Scale shape: one equi-join on the block key (blocks are a few rows
    per side — candidate pairs stay output-shaped, never |A|x|B|), pure
    integer scoring. The m/u weights would come from an EM pass in
    production; the constants keep the fixture deterministic."""
    cust = load_split(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("a_nation"),
        F.col("c_acctbal").alias("a_bal"),
        F.col("c_mktsegment").alias("a_seg"),
    )
    b = _fs_registry_b(cust)
    # block on name digits 1-8 (all but the corruptible last digit):
    # block size stays O(1) per (nation, prefix) at ANY registry size —
    # a coarser key (e.g. 3 digits) degenerates to quadratic blocks on
    # a 100x registry
    a = a.withColumn("blk", F.substring(F.col("a_name"), 10, 8))
    b = b.withColumn("blk", F.substring(F.col("b_name"), 10, 8))
    pairs = a.join(
        b, (F.col("a_nation") == F.col("b_nation")) & (a["blk"] == b["blk"])
    )
    name_eq = F.col("a_name") == F.col("b_name")
    bal_eq = F.col("a_bal") == F.col("b_bal")
    seg_eq = F.col("a_seg") == F.col("b_seg")

    def w(flag, key):
        return F.when(flag, F.lit(FS_W[key][0])).otherwise(F.lit(FS_W[key][1]))

    weight = (w(name_eq, "name") + w(bal_eq, "bal") + w(seg_eq, "seg")).cast("bigint")
    cls = (
        F.when(weight >= FS_MATCH_MIN, "match")
        .when(weight >= FS_REVIEW_MIN, "possible")
        .otherwise("non_match")
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            name_eq.alias("name_agree"),
            bal_eq.alias("bal_agree"),
            seg_eq.alias("seg_agree"),
            weight.alias("weight_c"),
            cls.alias("fs_class"),
        )
        .filter(F.col("weight_c") >= FS_REVIEW_MIN)
    )


# --------------------------------------------------------- audio silence

AS_SIL = 26000         # |sample| <= AS_SIL counts as silence
AS_CLIP = 31000        # |sample| >= AS_CLIP counts as near-clipping


def q_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio QA through the REAL RIFF/WAVE PCM decoder
    (q_media_audio_stats framing): per clip, the basis-point share of
    silent samples (|s| <= AS_SIL), of near-clipping samples
    (|s| >= AS_CLIP), and the LONGEST consecutive silent run — the
    broken-recording / dead-air filter for audio corpora. All integer.
    The oracle re-derives every little-endian int16 from
    hex(encode(text)) and finds the longest run with an
    islands-and-gaps window.

    Scale shape: decode + per-clip stats are Arrow map-only; no
    shuffle at all."""
    from collections.abc import Iterator

    import pandas as pd

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        _wav_header,
        AUDIO_BYTES,
    )

    docs = load_split(spark, sf_dir, "documents")
    body = F.expr(
        f"rpad(substring(encode(text, 'UTF-8'), 1, {AUDIO_BYTES}),"
        f" {AUDIO_BYTES}, X'20')"
    )
    framed = docs.select(
        "doc_id", F.concat(F.lit(_wav_header(AUDIO_BYTES)), body).alias("payload")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, sil, clip, runs, ns = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = M.decode_audio(bytes(payload))
                s = np.abs(samples.astype(np.int64)).reshape(-1)
                n = int(s.size)
                silent = s <= AS_SIL
                best = cur = 0
                for flag in silent.tolist():
                    cur = cur + 1 if flag else 0
                    best = max(best, cur)
                ids.append(doc_id)
                ns.append(n)
                sil.append(int(silent.sum()) * 10000 // max(1, n))
                clip.append(int((s >= AS_CLIP).sum()) * 10000 // max(1, n))
                runs.append(best)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sil_bp": pd.Series(sil, dtype="int64"),
                    "clip_bp": pd.Series(clip, dtype="int64"),
                    "longest_sil": pd.Series(runs, dtype="int64"),
                }
            )

    return framed.mapInPandas(
        gen, "doc_id long, n_samples long, sil_bp long, clip_bp long, longest_sil long"
    )


# --------------------------------------------------- dominant color

DC_BUCKETS = 16        # gray (r+g+b in 0..765) DIV 48 -> 0..15


def q_media_dominant_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant gray-level distribution of the image corpus through the
    REAL PPM decoder: each image's pixels quantize to DC_BUCKETS gray
    buckets (gray = r+g+b, bucket = gray DIV 48), the per-image
    dominant bucket is the histogram mode (ties to the LOWEST bucket),
    and the corpus rollup reports images and share per dominant bucket
    — the blank/over-bright skew audit for image corpora. Integer
    arithmetic end to end; the oracle re-derives every pixel byte-wise
    from hex(encode(text)).

    Scale shape: decode is Arrow map-only; the rollup is one keyed
    aggregate on <= DC_BUCKETS groups."""
    from collections.abc import Iterator

    import pandas as pd

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        IMG_H,
        IMG_W,
    )

    docs = load_split(spark, sf_dir, "documents")
    n = IMG_W * IMG_H * 3
    header = F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode())
    body = F.expr(f"rpad(substring(encode(text, 'UTF-8'), 1, {n}), {n}, X'78')")
    framed = docs.select("doc_id", F.concat(header, body).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, doms = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = M.decode_image(bytes(payload))  # (H, W, 3) uint8
                gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
                buckets = gray // 48
                counts = np.bincount(buckets, minlength=DC_BUCKETS)
                ids.append(doc_id)
                doms.append(int(counts.argmax()))  # argmax = lowest on ties
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dom_bucket": pd.Series(doms, dtype="int64"),
                }
            )

    per_img = framed.mapInPandas(gen, "doc_id long, dom_bucket long")
    total = per_img.groupBy().agg(F.count("*").alias("n"))
    return (
        per_img.groupBy("dom_bucket")
        .agg(F.count("*").cast("bigint").alias("n_images"))
        .crossJoin(F.broadcast(total))
        .select(
            "dom_bucket",
            "n_images",
            F.expr("(10000 * n_images) div n").cast("bigint").alias("share_bp"),
        )
    )


# ------------------------------------------------------- epoch schedule

EPOCH_SCALE = 720_720  # lcm(1..4) * 60060; any common multiple works
EPOCH_K = 200


def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted round-robin training-epoch ordering: source s gets
    weight w_s = 1 + hash60(s) % 4 (stand-in for a mix weight); the
    k-th doc of s (doc_id order) is due at virtual time
    vt = k * EPOCH_SCALE DIV w_s — pure integer WRR, the classic
    virtual-time scheduler — and the epoch order is (vt, source,
    doc_id). Emits the first EPOCH_K scheduled docs with positions:
    over any window, each source's share converges to w_s /
    sum(weights) without any randomness.

    Scale shape: one keyed window (rank within source) + a distributed
    TakeOrdered(EPOCH_K); the tiny global-position window runs on
    EPOCH_K rows."""
    docs = load_split(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    weight = (hash60(F.col("source")) % 4 + 1).cast("bigint")
    ranked = docs.select("doc_id", "source").withColumn(
        "k", F.row_number().over(w_src).cast("bigint")
    ).withColumn("weight", weight).withColumn(
        "vt", F.expr(f"(k * {EPOCH_SCALE}) div weight").cast("bigint")
    )
    top = ranked.orderBy(
        F.col("vt").asc(), F.col("source").asc(), F.col("doc_id").asc()
    ).limit(EPOCH_K)
    w_glob = Window.orderBy(
        F.col("vt").asc(), F.col("source").asc(), F.col("doc_id").asc()
    )
    return top.select(
        F.row_number().over(w_glob).cast("bigint").alias("global_pos"),
        "doc_id",
        "source",
        "weight",
        "vt",
    )


QUERIES = {
    "q_crawl_frontier": q_crawl_frontier,
    "q_snapshot_delta": q_snapshot_delta,
    "q_code_detect": q_code_detect,
    "q_score_calibration": q_score_calibration,
    "q_zipf_fit": q_zipf_fit,
    "q_heaps_law": q_heaps_law,
    "q_js_divergence": q_js_divergence,
    "q_split_balance": q_split_balance,
    "q_fellegi_sunter": q_fellegi_sunter,
    "q_audio_silence": q_audio_silence,
    "q_media_dominant_color": q_media_dominant_color,
    "q_epoch_schedule": q_epoch_schedule,
}

# ------------------------------------------------------------- oracles

_FRONTIER_SQL = f"""
WITH ranked AS (
  SELECT doc_id,
         'host' || CAST(doc_id % {FR_HOSTS} AS VARCHAR) || '.example' AS host,
         CAST(n_chars AS BIGINT) AS priority,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % {FR_HOSTS}
                                 ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
           AS wave
  FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY (wave - 1) * {FR_DELAY_S} ASC,
                               priority DESC, doc_id ASC) AS BIGINT)
         AS global_pos,
       doc_id, host, wave,
       CAST((wave - 1) * {FR_DELAY_S} AS BIGINT) AS fetch_at_s,
       priority
FROM ranked
ORDER BY fetch_at_s ASC, priority DESC, doc_id ASC
LIMIT {FRONTIER_K}
"""

_SNAPSHOT_SQL = f"""
WITH v1 AS (
  SELECT doc_id, source AS src1, {hash60_sql("text")} AS d1 FROM documents
),
v2base AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % {SD_EDIT_MOD} = 0 THEN text || ' rev2'
              ELSE text END AS text
  FROM documents WHERE doc_id % {SD_DROP_MOD} <> 0
  UNION ALL
  SELECT doc_id + {SD_ADD_OFFSET}, source, text
  FROM documents WHERE doc_id % {SD_ADD_MOD} = 0
),
v2 AS (
  SELECT doc_id, source AS src2, {hash60_sql("text")} AS d2 FROM v2base
),
j AS (
  SELECT COALESCE(src1, src2) AS source,
         CASE WHEN d1 IS NULL THEN 'added'
              WHEN d2 IS NULL THEN 'removed'
              WHEN d1 <> d2 THEN 'changed'
              ELSE 'unchanged' END AS status,
         CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END AS in_v1
  FROM v1 FULL OUTER JOIN v2 USING (doc_id)
)
SELECT source,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged,
       CAST((10000 * SUM(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END))
            // GREATEST(1, SUM(in_v1)) AS BIGINT) AS churn_bp
FROM j GROUP BY source
"""

_CODE_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CODE_MOD} = 0
              THEN regexp_replace(text, '(\w+) (\w+) (\w+)',
                                  'fn \1(\2) {{ return \3; }}', 'g')
              ELSE text END AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(length(t) AS BIGINT) AS n_chars_t,
         CAST(length(t) - length(regexp_replace(t, '[{{}}();=]', '', 'g'))
              AS BIGINT) AS n_sym
  FROM t
)
SELECT doc_id, n_sym,
       CAST((10000 * n_sym) // GREATEST(1, n_chars_t) AS BIGINT) AS sym_bp,
       (10000 * n_sym) // GREATEST(1, n_chars_t) >= {CODE_SYM_BP} AS is_code
FROM m
"""


def _calibration_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        _LQ_SQL,
    )

    return f"""
WITH lq AS ({_LQ_SQL}),
rep AS (
  SELECT doc_id, MAX(c) * 10000 >= {CAL_REP_BP} * SUM(c) AS bad
  FROM (
    SELECT doc_id, w, COUNT(*) AS c
    FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
    GROUP BY doc_id, w
  ) GROUP BY doc_id
),
deciled AS (
  SELECT lq.doc_id, lq.score, rep.bad,
         CAST(NTILE({CAL_DECILES}) OVER (ORDER BY lq.score DESC,
                                         lq.doc_id ASC) AS BIGINT) AS decile
  FROM lq JOIN rep USING (doc_id)
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST((10000 * SUM(CASE WHEN bad THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS bad_bp,
       CAST(MIN(score) AS BIGINT) AS score_min,
       CAST(MAX(score) AS BIGINT) AS score_max
FROM deciled GROUP BY decile
"""


_ZIPF_SQL = f"""
WITH counts AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest({_TOKS}) AS w FROM documents)
  GROUP BY w
),
top AS (
  SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r
  FROM counts ORDER BY c DESC, w ASC LIMIT {ZIPF_K}
),
folds AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
         list_reduce(list_prepend(0.0,
             list(ln(CAST(r AS DOUBLE)) ORDER BY r)), (a, b) -> a + b) AS sx,
         list_reduce(list_prepend(0.0,
             list(ln(CAST(c AS DOUBLE)) ORDER BY r)), (a, b) -> a + b) AS sy,
         list_reduce(list_prepend(0.0,
             list(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) ORDER BY r)),
             (a, b) -> a + b) AS sxy,
         list_reduce(list_prepend(0.0,
             list(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) ORDER BY r)),
             (a, b) -> a + b) AS sxx,
         list_reduce(list_prepend(0.0,
             list(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)) ORDER BY r)),
             (a, b) -> a + b) AS syy
  FROM top
)
SELECT n_ranks,
       ROUND((CAST(n_ranks AS DOUBLE) * sxy - sx * sy)
             / (CAST(n_ranks AS DOUBLE) * sxx - sx * sx), 4) AS zipf_slope,
       ROUND((sy - (CAST(n_ranks AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n_ranks AS DOUBLE) * sxx - sx * sx) * sx)
             / CAST(n_ranks AS DOUBLE), 4) AS zipf_intercept,
       ROUND((CAST(n_ranks AS DOUBLE) * sxy - sx * sy)
             * (CAST(n_ranks AS DOUBLE) * sxy - sx * sy)
             / ((CAST(n_ranks AS DOUBLE) * sxx - sx * sx)
                * (CAST(n_ranks AS DOUBLE) * syy - sy * sy)), 4) AS r2
FROM folds
"""

_HEAPS_SQL = f"""
WITH dec AS (
  SELECT doc_id,
         NTILE({HEAPS_DECILES}) OVER (ORDER BY doc_id ASC) AS decile
  FROM documents
),
occ AS (
  SELECT t.w, d.decile
  FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents) t
  JOIN dec d USING (doc_id)
),
pdt AS (SELECT decile, COUNT(*) AS n_tok FROM occ GROUP BY decile),
firsts AS (
  SELECT min_dec AS decile, COUNT(*) AS n_new
  FROM (SELECT w, MIN(decile) AS min_dec FROM occ GROUP BY w)
  GROUP BY min_dec
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(SUM(n_tok) OVER (ORDER BY decile) AS BIGINT) AS n_tokens_cum,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_tokens,
       CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY decile) AS BIGINT)
         AS vocab_cum
FROM pdt LEFT JOIN firsts USING (decile)
"""

_JS_TERM = (
    "CASE WHEN a.cs[i] > 0 THEN"
    " 0.5 * (a.cs[i] / a.t)"
    " * ln(2.0 * (a.cs[i] / a.t) / ((a.cs[i] / a.t) + (b.cs[i] / b.t)))"
    " ELSE 0.0 END"
    " + CASE WHEN b.cs[i] > 0 THEN"
    " 0.5 * (b.cs[i] / b.t)"
    " * ln(2.0 * (b.cs[i] / b.t) / ((a.cs[i] / a.t) + (b.cs[i] / b.t)))"
    " ELSE 0.0 END"
)

_JS_SQL = f"""
WITH sw AS (
  SELECT source, w, COUNT(*) AS c
  FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)
  GROUP BY source, w
),
vocab AS (
  SELECT w, ROW_NUMBER() OVER (ORDER BY ct DESC, w ASC) AS idx
  FROM (SELECT w, SUM(c) AS ct FROM sw GROUP BY w)
  ORDER BY ct DESC, w ASC LIMIT {JS_TOPK}
),
tagged AS (
  SELECT source, COALESCE(v.idx, {JS_TOPK + 1}) AS idx, SUM(c) AS c
  FROM sw LEFT JOIN vocab v USING (w) GROUP BY 1, 2
),
grid AS (
  SELECT source, idx
  FROM (SELECT DISTINCT source FROM documents)
  CROSS JOIN (SELECT unnest(range(1, {JS_TOPK + 2})) AS idx)
),
dense AS (
  SELECT g.source, g.idx, COALESCE(t.c, 0) AS c
  FROM grid g LEFT JOIN tagged t USING (source, idx)
),
arrs AS (
  SELECT source, list(c ORDER BY idx) AS cs,
         CAST(GREATEST(SUM(c), 1) AS DOUBLE) AS t
  FROM dense GROUP BY source
)
SELECT a.source AS src_a, b.source AS src_b,
       ROUND(list_reduce(list_prepend(0.0,
           list_transform(range(1, {JS_TOPK + 2}), i -> {_JS_TERM})),
           (x, y) -> x + y), 4) AS jsd_nats
FROM arrs a JOIN arrs b ON a.source < b.source
"""

_SPLIT_BUCKET = f"({hash60_sql('CAST(doc_id AS VARCHAR)')}) % 100"

_SPLIT_SQL = f"""
WITH cells AS (
  SELECT source,
         CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET} < 95 THEN 'val'
              ELSE 'test' END AS split,
         COUNT(*) AS o
  FROM documents GROUP BY 1, 2
),
rt AS (SELECT source, SUM(o) AS rt FROM cells GROUP BY source),
ctt AS (SELECT split, SUM(o) AS ct FROM cells GROUP BY split),
nt AS (SELECT SUM(o) AS n FROM cells)
SELECT source, split, CAST(o AS BIGINT) AS o,
       CAST((10000 * abs(o * n - rt * ct)) // (rt * ct) AS BIGINT) AS dev_bp,
       ROUND((CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)),
             4) AS chi2_c
FROM cells JOIN rt USING (source) JOIN ctt USING (split) CROSS JOIN nt
"""

_FS_SEG_NEXT = (
    "CASE c_mktsegment"
    + "".join(
        f" WHEN '{s}' THEN '{_SEGS[(i + 1) % len(_SEGS)]}'"
        for i, s in enumerate(_SEGS)
    )
    + " ELSE c_mktsegment END"
)

_FS_SQL = f"""
WITH b AS (
  SELECT c_custkey + {FS_B_OFFSET} AS b_id,
         CASE WHEN c_custkey % 3 = 0
               AND substring(c_name, length(c_name), 1) BETWEEN '0' AND '9'
              THEN substring(c_name, 1, length(c_name) - 1)
                   || CAST((TRY_CAST(substring(c_name, length(c_name), 1)
                                     AS INT) + 1) % 10 AS VARCHAR)
              ELSE c_name END AS b_name,
         c_nationkey AS b_nation,
         CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 1.0
              ELSE c_acctbal END AS b_bal,
         CASE WHEN c_custkey % 5 = 0 THEN {_FS_SEG_NEXT}
              ELSE c_mktsegment END AS b_seg
  FROM customer
),
pairs AS (
  SELECT a.c_custkey AS a_id, b.b_id,
         a.c_name = b.b_name AS name_agree,
         a.c_acctbal = b.b_bal AS bal_agree,
         a.c_mktsegment = b.b_seg AS seg_agree
  FROM customer a
  JOIN b ON a.c_nationkey = b.b_nation
        AND substring(a.c_name, 10, 8) = substring(b.b_name, 10, 8)
),
scored AS (
  SELECT a_id, b_id, name_agree, bal_agree, seg_agree,
         CAST((CASE WHEN name_agree THEN {FS_W["name"][0]}
                    ELSE {FS_W["name"][1]} END)
              + (CASE WHEN bal_agree THEN {FS_W["bal"][0]}
                      ELSE {FS_W["bal"][1]} END)
              + (CASE WHEN seg_agree THEN {FS_W["seg"][0]}
                      ELSE {FS_W["seg"][1]} END) AS BIGINT) AS weight_c
  FROM pairs
)
SELECT a_id, b_id, name_agree, bal_agree, seg_agree, weight_c,
       CASE WHEN weight_c >= {FS_MATCH_MIN} THEN 'match'
            WHEN weight_c >= {FS_REVIEW_MIN} THEN 'possible'
            ELSE 'non_match' END AS fs_class
FROM scored
WHERE weight_c >= {FS_REVIEW_MIN}
"""


def _audio_silence_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (
        _AF_BYTES,
        _AF_SAMPLE,
    )

    n = _AF_BYTES // 2
    return f"""
WITH body AS (
  SELECT doc_id,
         rpad(substring(hex(encode(text)), 1, {_AF_BYTES * 2}),
              {_AF_BYTES * 2}, '20') AS hx
  FROM documents
),
s AS (
  SELECT doc_id, i, abs({_AF_SAMPLE.format(i="i")}) AS v
  FROM body CROSS JOIN (SELECT unnest(generate_series(1, {n})) AS i)
),
flags AS (
  SELECT doc_id, i, v <= {AS_SIL} AS silent, v >= {AS_CLIP} AS clipped
  FROM s
),
runs AS (
  SELECT doc_id,
         COUNT(*) AS run_len
  FROM (
    SELECT doc_id, i,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
    FROM flags WHERE silent
  ) GROUP BY doc_id, grp
),
longest AS (SELECT doc_id, MAX(run_len) AS longest_sil FROM runs GROUP BY doc_id),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_samples,
         SUM(CASE WHEN silent THEN 1 ELSE 0 END) AS n_sil,
         SUM(CASE WHEN clipped THEN 1 ELSE 0 END) AS n_clip
  FROM flags GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(a.n_samples AS BIGINT) AS n_samples,
       CAST((10000 * a.n_sil) // a.n_samples AS BIGINT) AS sil_bp,
       CAST((10000 * a.n_clip) // a.n_samples AS BIGINT) AS clip_bp,
       CAST(COALESCE(l.longest_sil, 0) AS BIGINT) AS longest_sil
FROM agg a LEFT JOIN longest l USING (doc_id)
"""


def _dominant_color_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        IMG_H,
        IMG_W,
    )

    px = IMG_W * IMG_H
    return f"""
WITH body AS (
  SELECT doc_id,
         rpad(substring(hex(encode(text)), 1, {px * 6}), {px * 6}, '78') AS hx
  FROM documents
),
g AS (
  SELECT doc_id, p,
         (CAST(('0x' || substring(hx, 6 * p + 1, 2)) AS BIGINT)
          + CAST(('0x' || substring(hx, 6 * p + 3, 2)) AS BIGINT)
          + CAST(('0x' || substring(hx, 6 * p + 5, 2)) AS BIGINT)) // 48
           AS bucket
  FROM body CROSS JOIN (SELECT unnest(range(0, {px})) AS p)
),
hist AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM g GROUP BY doc_id, bucket),
dom AS (
  SELECT doc_id, bucket AS dom_bucket
  FROM hist
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY cnt DESC, bucket ASC) = 1
),
tot AS (SELECT COUNT(*) AS n FROM dom)
SELECT dom_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST((10000 * COUNT(*)) // MAX(n) AS BIGINT) AS share_bp
FROM dom CROSS JOIN tot
GROUP BY dom_bucket
"""


_EPOCH_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(1 + ({hash60_sql("source")}) % 4 AS BIGINT) AS weight,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id ASC)
              AS BIGINT) AS k
  FROM documents
),
sched AS (
  SELECT doc_id, source, weight,
         CAST((k * {EPOCH_SCALE}) // weight AS BIGINT) AS vt
  FROM ranked
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY vt ASC, source ASC, doc_id ASC)
            AS BIGINT) AS global_pos,
       doc_id, source, weight, vt
FROM sched
ORDER BY vt ASC, source ASC, doc_id ASC
LIMIT {EPOCH_K}
"""

ORACLES = {
    "q_crawl_frontier": _FRONTIER_SQL,
    "q_snapshot_delta": _SNAPSHOT_SQL,
    "q_code_detect": _CODE_SQL,
    "q_score_calibration": _calibration_sql(),
    "q_zipf_fit": _ZIPF_SQL,
    "q_heaps_law": _HEAPS_SQL,
    "q_js_divergence": _JS_SQL,
    "q_split_balance": _SPLIT_SQL,
    "q_fellegi_sunter": _FS_SQL,
    "q_audio_silence": _audio_silence_sql(),
    "q_media_dominant_color": _dominant_color_sql(),
    "q_epoch_schedule": _EPOCH_SQL,
}
