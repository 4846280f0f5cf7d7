"""Training-data pipeline operations beyond dedup/similarity: splits,
token budgeting, and source mixing — the bread-and-butter ops of
assembling a training mix at 100 TB, each deterministic and oracle-checked.

* ``q_hash_split``: hash-based train/val/test assignment. NOT sampling —
  a content-stable hash split is reproducible across runs, cluster sizes,
  and partitionings, which `df.sample()` is not. Portable md5-based hash.
* ``q_token_budget``: greedy document packing to a token budget via a
  cumulative-sum window in a deterministic order (the "take docs until
  N tokens" selection used to cut a corpus to size).
* ``q_source_mix``: per-source share of documents/tokens in exact basis
  points — mixture-weight accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60, hash60_sql
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens, word_ngrams
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _TOKS,
    _TOKS_RAW,
    _ngrams_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

TOKEN_BUDGET = 20_000


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split on hash60(doc_id) mod 100 — stable
    under repartitioning and re-runs (map-only, no shuffle)."""
    docs = load_split(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string")) % F.lit(100)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs selected in doc_id order until the running token count passes
    TOKEN_BUDGET (first crossing doc included). Single global-ordered
    cumsum window; at 100 TB the order key would be a hash for balance
    and the window a per-partition pass + prefix sums, same semantics."""
    docs = load_split(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    toks = F.size(tokens(F.col("text"))).cast("bigint")
    return (
        docs.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture accounting: per source, document and token counts plus the
    exact share in basis points (integer DIV against broadcast totals)."""
    docs = load_split(spark, sf_dir, "documents")
    per_source = docs.withColumn(
        "n_tokens", F.size(tokens(F.col("text"))).cast("bigint")
    ).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    totals = per_source.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("n_tokens").alias("tot_tokens")
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("CAST((10000 * n_docs) DIV tot_docs AS BIGINT)").alias("doc_share_bp"),
            F.expr("CAST((10000 * n_tokens) DIV tot_tokens AS BIGINT)").alias("token_share_bp"),
        )
    )


# Per-stratum keep rates (basis points) for the deterministic downsample:
# sources matching the cut prefixes keep SAMPLE_CUT_BP, the rest keep
# SAMPLE_DEFAULT_BP.
SAMPLE_CUT_BP = 2500
SAMPLE_DEFAULT_BP = 7500


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep a doc iff
    hash(doc_id) mod 10000 < its source's rate. NOT df.sampleBy — a
    content-stable hash rate is reproducible across runs, cluster sizes,
    and partitionings (same argument as q_hash_split), and it needs no
    sampling state: map-only, zero shuffle, works identically at 100 TB.
    Rates here: sources starting 'src0'/'src1' keep 25%, the rest 75% —
    the overrepresented-source cut of a training mix."""
    docs = load_split(spark, sf_dir, "documents")
    rate = (
        F.when(
            F.col("source").startswith("src0") | F.col("source").startswith("src1"),
            F.lit(SAMPLE_CUT_BP),
        )
        .otherwise(F.lit(SAMPLE_DEFAULT_BP))
    )
    h = hash60(F.col("doc_id").cast("string")) % F.lit(10_000)
    return (
        docs.withColumn("rate_bp", rate.cast("bigint"))
        .filter(h < F.col("rate_bp"))
        .select("doc_id", "source", "rate_bp")
    )


QUALITY_MIN_BP = 6000
CLEAN_LANG = "en"


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning — the composition a real training-data
    pipeline runs as ONE plan: exact-dup keep-min + near-dup cluster
    representative (minhash/LSH pairs -> connected components) + quality
    floor + language filter. A doc survives iff it is its exact-dup
    group's min id, its near-dup cluster's min id, scores >=
    QUALITY_MIN_BP, and language-IDs as CLEAN_LANG.

    Scale shape: quality/langid are map-only projections; the dedup legs
    are the LSH pipeline (keyed shuffles only) feeding two small anti
    joins (dropped ids ≪ corpus — broadcast); the digest groupBy is the
    only corpus-wide shuffle. The near-dup leg runs through
    ``near_dup_clusters`` (exact-dup digest collapse before LSH/CC —
    output-invariant, components on distinct texts)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
    from terraform_aws_lambda_kinesis_to_es_spark.plans import text_queries
    from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
        JACCARD_THRESHOLD_BP,
    )

    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        predicted_lang,
        tokens,
    )

    docs = load_split(spark, sf_dir, "documents")
    # Quality and langid are MAP-ONLY projections over the same rows, so
    # compose them in ONE pass instead of joining q_quality/q_langid back
    # on doc_id (r12 optimization: doc_id is unique, so the 1:1 inner
    # joins were value-identical to this projection — they just shuffled
    # the corpus twice to reassemble rows that never left the map task).
    # The expressions are q_quality's / q_langid's own (with_quality +
    # predicted_lang), not copies.
    scored = text_queries.with_quality(
        docs.withColumn(
            "pred_lang", predicted_lang(tokens(F.lower(F.col("text"))))
        ),
        extra_cols=("source", "pred_lang"),
    )
    comps = D.near_dup_clusters(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    dropped_near = comps.filter(F.col("cluster_id") < F.col("doc_id")).select(
        "doc_id"
    )
    # The exact-dup anti-join leg (its own full-corpus md5 groupBy + a
    # membership join + a second anti-join) is PROVABLY redundant here
    # and was removed (r13 optimization, guide §2.4 — the digest
    # collapse already runs inside near_dup_clusters):
    # * a non-min exact dup with >= shingle_n (5) tokens has an
    #   ELIGIBLE text, so it appears in near_dup_clusters' membership
    #   with cluster_id <= rep_id = min(group) < doc_id — dropped_near
    #   already drops it (identical texts share the token count, so
    #   eligibility is group-uniform);
    # * a doc with < 5 tokens cannot pass the quality floor above:
    #   quality_bp <= (least(4,100)*100*5 + 10000*3 + 10000*2) DIV 10
    #   = 5200 < QUALITY_MIN_BP (6000), so the only exact dups the
    #   near-dup leg misses are filtered out before the anti-join.
    # (Both bounds pinned by
    # tests/test_components.py::test_clean_corpus_exact_leg_redundant.)
    return (
        scored.filter(
            (F.col("quality_bp") >= QUALITY_MIN_BP)
            & (F.col("pred_lang") == CLEAN_LANG)
        )
        .join(dropped_near, "doc_id", "left_anti")
        .select("doc_id", "source", "n_tokens", "quality_bp")
    )


# Contamination scan: docs below this id act as the held-out eval set.
EVAL_DOC_MAX = 25
CONTAM_NGRAM = 8

# Sequence packing: token budget per training bin.
BIN_BUDGET = 512


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag training docs sharing any
    CONTAM_NGRAM-gram with the held-out eval set (doc_id < EVAL_DOC_MAX),
    with the count of distinct shared grams. The eval gram set is tiny
    relative to the corpus — broadcast it; the training side is one
    explode + hash aggregate, linear in corpus grams. Grams are
    60-bit-hashed before the join so only longs shuffle, never strings."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import word_ngrams

    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    # persisted: feeds both the eval-set and training branches (the same
    # staged-materialization point as the minhash shingle stage — only
    # (id, long) rows are cached, never gram strings)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(word_ngrams(toks, CONTAM_NGRAM), hash60))
        ).alias("g"),
    ).persist()
    eval_grams = (
        grams.filter(F.col("doc_id") < EVAL_DOC_MAX).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= EVAL_DOC_MAX)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contam_grams"))
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed token-budget training bins
    per source — bin_id = prior-cumulative-tokens DIV BIN_BUDGET in
    doc_id order (streaming first-fit-by-offset; a doc may straddle its
    bin boundary, matching how packed pretraining batches wrap). One
    window shuffle keyed by source; all integer arithmetic."""
    docs = load_split(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        docs.withColumn("n_tokens", F.size(tokens(F.col("text"))).cast("bigint"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"(cum_tokens - n_tokens) DIV {BIN_BUDGET}")
            .cast("bigint")
            .alias("bin_id"),
        )
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source reweighting (alpha = 0.5): the sampling
    weight of source s becomes sqrt(n_s) / sum(sqrt(n_s)) — the standard
    move that upsamples small sources and downsamples dominant ones when
    assembling a multilingual / multi-source training mix.

    Float discipline: sqrt is correctly rounded IEEE in both engines, but
    the sum over sources is partition-order dependent — so the total is an
    order-pinned fold over the source-sorted weight list (same trick as
    q_doc_entropy), making every emitted double bitwise reproducible.
    One tiny aggregate + broadcast join; the corpus scan is the only
    linear cost at 100 TB."""
    docs = load_split(spark, sf_dir, "documents")
    ps = docs.groupBy("source").agg(F.count("*").alias("n_docs")).withColumn(
        "w", F.sqrt(F.col("n_docs").cast("double"))
    )
    totals = ps.agg(
        F.sum("n_docs").cast("bigint").alias("tot_docs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0),
            lambda a, s: a + s["w"],
        ).alias("tot_w"),
    )
    return ps.crossJoin(F.broadcast(totals)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("w") / F.col("tot_w"), 6).alias("temp_share"),
        F.round(
            (F.col("w") * F.col("tot_docs")) / (F.col("tot_w") * F.col("n_docs")), 4
        ).alias("boost"),
    )


MASK_RATE_PCT = 15
MASK_TOKEN = "<mask>"


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM estimation: conditional next-token distribution
    p(w2 | w1) over the corpus, in exact integer basis points against the
    bigram-context total (sum over w2' of c(w1, w2') — so rows per w1 sum
    to <= 10000 by construction). One explode + one (w1, w2) hash
    aggregate with map-side combine + a window sum over the tiny
    aggregated frame; output is vocab^2-bounded, independent of corpus
    size."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    grams = docs.select(F.explode(word_ngrams(toks, 2)).alias("g"))
    counts = grams.select(
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
    ).groupBy("w1", "w2").agg(F.count("*").alias("n"))
    return counts.select(
        "w1",
        "w2",
        "n",
        F.expr("(10000 * n) DIV sum(n) OVER (PARTITION BY w1)").cast("bigint").alias(
            "p_bp"
        ),
    )


def q_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic masked-LM corruption (T5/BERT-style): token i of doc d
    is masked iff hash60(d || ':' || i) mod 100 < MASK_RATE_PCT — a
    content-stable coin flip, reproducible across runs/partitionings
    (df.sample would not be). Map-only HOF pass, zero shuffle; emits the
    masked-text md5 + mask count so the full corruption is value-checked
    without shipping the text."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    flag = lambda i: (  # noqa: E731 — mask decision for 0-based token index
        hash60(F.concat_ws(":", F.col("doc_id"), i.cast("string"))) % 100
        < MASK_RATE_PCT
    )
    masked = F.transform(
        toks, lambda t, i: F.when(flag(i), F.lit(MASK_TOKEN)).otherwise(t)
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(masked, lambda t: t == MASK_TOKEN)).cast("bigint").alias(
            "n_masked"
        ),
        F.md5(F.array_join(masked, " ")).alias("masked_md5"),
    )


def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (DSIR-style acceptance):
    doc d is kept with probability quality_bp/10000 via the deterministic
    coin hash60('is:' || doc_id) mod 10000 < quality_bp — content-stable
    and reproducible at any partitioning/cluster size, unlike
    df.sample(weights). Map-only on top of the quality scoring pass."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import with_quality

    docs = with_quality(load_split(spark, sf_dir, "documents"))
    coin = hash60(F.concat_ws(":", F.lit("is"), F.col("doc_id").cast("string"))) % 10000
    return docs.select(
        "doc_id",
        "quality_bp",
        (coin < F.least(F.col("quality_bp"), F.lit(10000))).alias("kept"),
    )


BPE_TOP_PAIRS = 10


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration: global adjacent-symbol-pair counts at
    the character stage, top pairs by frequency (the argmax a BPE
    tokenizer trainer merges next). Char pairs are 2-char substrings —
    no per-char array materialization; explode + hash aggregate with
    map-side combine, then TakeOrdered for the top-k. Repeating this
    query with merged symbols is exactly the BPE training loop (the
    driver-looped iteration shape lives in kmeans_refine /
    connected_components)."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    # length>=2 guard: Spark's sequence(1, 0) counts DOWN (step -1), so a
    # 1-char token would yield bogus indices instead of an empty list
    words = docs.select(F.explode(toks).alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(BPE_TOP_PAIRS)
    )


CLEAN_STREAM_MIN_QUALITY = 0.6
CLEAN_STREAM_LANG = "en"


def q_clean_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode proof of the STREAMING cleaning path: runs
    ``streaming.stateful.clean_project`` — the exact row-local
    expressions (quality floor, language-ID filter, content digest) the
    unbounded ``clean_stream`` plan applies per micro-batch — on the
    bounded documents table, then resolves the stream's
    first-arrival-wins dropDuplicates deterministically as keep = min
    doc_id per content digest. Gives the batch/stream parity claim a
    DuckDB oracle instead of pytest-only coverage: if this query hashes
    green, the streaming plan's per-row semantics are proven, because it
    is literally the same code object.

    Scale shape: map-only projection + one digest-keyed aggregation —
    the same single-shuffle profile as exact dedup."""
    from terraform_aws_lambda_kinesis_to_es_spark.streaming.stateful import clean_project

    docs = load_split(spark, sf_dir, "documents")
    cleaned = clean_project(
        docs, min_quality=CLEAN_STREAM_MIN_QUALITY, lang=CLEAN_STREAM_LANG
    )
    return cleaned.groupBy("content_key").agg(
        F.min("doc_id").cast("bigint").alias("keep_id"),
        F.count("*").cast("bigint").alias("n_dups"),
        F.min("pred_lang").alias("pred_lang"),
        F.min("quality_score").alias("quality_score"),
    )


REPEAT_MAX_EPOCHS = 4


def q_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repeat upsampling: when a training mix calls for more tokens
    from a small source than it has, the source is repeated whole-epochs —
    factor = clamp(max_source_docs DIV n_docs, 1..REPEAT_MAX_EPOCHS)
    (integer, deterministic), then each doc explodes into (doc_id, epoch)
    rows. The factor table is a per-source rollup (tiny, broadcast); the
    corpus pass is one map-side sequence-explode — row count multiplies,
    but no shuffle is introduced, which is exactly how a 100 TB mix
    materialization should behave."""
    docs = load_split(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    max_n = per_source.agg(F.max("n_docs").alias("max_n"))
    factors = (
        per_source.join(F.broadcast(max_n))
        .select(
            "source",
            F.least(
                F.lit(REPEAT_MAX_EPOCHS),
                F.greatest(F.lit(1), F.expr("max_n DIV n_docs")),
            )
            .cast("bigint")
            .alias("factor"),
        )
    )
    return (
        docs.join(F.broadcast(factors), "source")
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("factor"))).alias(
                "epoch"
            ),
        )
    )


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier data selection: documents not strictly dominated on
    (quality_bp, n_chars) — doc A dominates B when A >= B on both axes and
    > on at least one. Multi-objective selection without collapsing the
    axes into one weighted score.

    Scale shape: the naive skyline is an O(n^2) NOT-EXISTS self-join (the
    oracle runs exactly that); here it is two bounded passes — quality_bp
    has at most 10001 distinct values, so per-quality max-chars is a tiny
    aggregate, the strictly-higher-quality suffix max is a window over
    that BOUNDED relation only, and the verdict is a broadcast join back.
    No corpus-wide window, no pair join — survives any corpus size."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import with_quality

    docs = with_quality(load_split(spark, sf_dir, "documents")).select(
        "doc_id", "quality_bp", F.col("n_chars_calc").alias("n_chars")
    )
    per_q = docs.groupBy("quality_bp").agg(F.max("n_chars").alias("max_c"))
    w = (
        Window.orderBy(F.desc("quality_bp"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = per_q.withColumn("max_higher", F.max("max_c").over(w))
    sky = docs.join(F.broadcast(bounds), "quality_bp").filter(
        (F.col("n_chars") == F.col("max_c"))
        & (
            F.col("max_higher").isNull()
            | (F.col("n_chars") > F.col("max_higher"))
        )
    )
    return sky.select("doc_id", "quality_bp", "n_chars")


QUERIES = {
    "q_bigram_lm": q_bigram_lm,
    "q_skyline": q_skyline,
    "q_clean_stream": q_clean_stream,
    "q_span_mask": q_span_mask,
    "q_importance_sample": q_importance_sample,
    "q_bpe_pairs": q_bpe_pairs,
    "q_hash_split": q_hash_split,
    "q_contamination": q_contamination,
    "q_pack_sequences": q_pack_sequences,
    "q_token_budget": q_token_budget,
    "q_source_mix": q_source_mix,
    "q_clean_corpus": q_clean_corpus,
    "q_stratified_sample": q_stratified_sample,
    "q_temperature_mix": q_temperature_mix,
    "q_repeat_upsample": q_repeat_upsample,
}

_H = hash60_sql("CAST(doc_id AS VARCHAR)")


def _clean_corpus_oracle_sql() -> str:
    """Mirror of q_clean_corpus: recursive-CTE closure for the near-dup
    clusters + the q_quality / q_langid expressions inlined as CTEs."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        LANG_MARKERS,
        STOPWORDS,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
        _PAIR_JACCARD,
        JACCARD_THRESHOLD_BP,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
        _TOKS,
        _in_list,
    )

    body = _PAIR_JACCARD.replace("WITH sh", "WITH RECURSIVE sh", 1)
    score = {
        lang: f"len(list_filter(ltoks, t -> t IN ({_in_list(m)})))"
        for lang, m in LANG_MARKERS.items()
    }
    return (
        body
        + f""",
        filt AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM filt
          UNION SELECT doc_b, doc_a FROM filt
        ),
        reach(src, dst) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        dropped_near AS (SELECT doc_id FROM clusters WHERE cluster_id < doc_id),
        exact_keep AS (SELECT md5(text) AS k, MIN(doc_id) AS keep_id FROM documents GROUP BY 1),
        dropped_exact AS (
          SELECT d.doc_id FROM documents d JOIN exact_keep e ON md5(d.text) = e.k
          WHERE d.doc_id <> e.keep_id
        ),
        qbase AS (
          SELECT doc_id,
                 length(text) AS n_chars_calc,
                 len({_TOKS_RAW}) AS n_tokens,
                 len(list_filter({_TOKS_RAW}, t -> t IN ({_in_list(STOPWORDS)}))) AS stop_cnt,
                 length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt
          FROM documents
        ),
        qual AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST((least(n_tokens, 100) * 100 * 5
                       + (CASE WHEN n_tokens > 0 THEN (10000 * stop_cnt) // n_tokens ELSE 0 END) * 3
                       + (10000 - CASE WHEN n_chars_calc > 0 THEN (10000 * punct_cnt) // n_chars_calc ELSE 0 END) * 2
                      ) // 10 AS BIGINT) AS quality_bp
          FROM qbase
        ),
        lscore AS (
          SELECT doc_id, {score['de']} AS sd, {score['en']} AS se,
                 {score['es']} AS ss, {score['fr']} AS sf
          FROM (SELECT doc_id, {_TOKS} AS ltoks FROM documents)
        ),
        lang AS (
          SELECT doc_id,
                 CASE WHEN greatest(sd, se, ss, sf) <= 0 THEN 'und'
                      WHEN sd >= se AND sd >= ss AND sd >= sf THEN 'de'
                      WHEN se >= ss AND se >= sf THEN 'en'
                      WHEN ss >= sf THEN 'es'
                      ELSE 'fr' END AS pred_lang
          FROM lscore
        )
        SELECT d.doc_id, d.source, q.n_tokens, q.quality_bp
        FROM documents d
        JOIN qual q USING (doc_id)
        JOIN lang l USING (doc_id)
        WHERE q.quality_bp >= {QUALITY_MIN_BP}
          AND l.pred_lang = '{CLEAN_LANG}'
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped_near)
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped_exact)
        """
    )


def _importance_sample_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
        ORACLES as _TEXT_ORACLES,
    )

    coin = hash60_sql("'is:' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH q AS ({_TEXT_ORACLES["q_quality"]})
        SELECT doc_id, quality_bp,
               ({coin}) % 10000 < LEAST(quality_bp, 10000) AS kept
        FROM q
    """


def _clean_stream_oracle_sql() -> str:
    """Mirror of q_clean_stream: the streaming clean_project expressions
    (float quality_score with per-row round(4), langid when-chain, md5
    digest) + deterministic first-arrival resolution (min doc_id)."""
    from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
        LANG_MARKERS,
        STOPWORDS,
    )
    from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import _in_list

    score = {
        lang: f"len(list_filter(ltoks, t -> t IN ({_in_list(m)})))"
        for lang, m in LANG_MARKERS.items()
    }
    return f"""
        WITH qbase AS (
          SELECT doc_id, text,
                 length(text) AS n_chars,
                 len({_TOKS_RAW}) AS n_tokens,
                 len(list_filter({_TOKS_RAW}, t -> t IN ({_in_list(STOPWORDS)}))) AS stop_cnt,
                 length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt
          FROM documents
        ),
        q AS (
          SELECT doc_id, text,
                 round(least(1.0, n_tokens / 100.0) * 0.5
                       + (CASE WHEN n_tokens > 0
                               THEN round(stop_cnt / n_tokens, 4) ELSE 0.0 END) * 0.3
                       + (1.0 - CASE WHEN n_chars > 0
                                     THEN round(punct_cnt / n_chars, 4) ELSE 0.0 END) * 0.2,
                       4) AS quality_score
          FROM qbase
        ),
        lscore AS (
          SELECT doc_id, {score['de']} AS sd, {score['en']} AS se,
                 {score['es']} AS ss, {score['fr']} AS sf
          FROM (SELECT doc_id, {_TOKS} AS ltoks FROM documents)
        ),
        lang AS (
          SELECT doc_id,
                 CASE WHEN greatest(sd, se, ss, sf) <= 0 THEN 'und'
                      WHEN sd >= se AND sd >= ss AND sd >= sf THEN 'de'
                      WHEN se >= ss AND se >= sf THEN 'en'
                      WHEN ss >= sf THEN 'es'
                      ELSE 'fr' END AS pred_lang
          FROM lscore
        )
        SELECT md5(q.text) AS content_key,
               CAST(MIN(q.doc_id) AS BIGINT) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups,
               MIN(l.pred_lang) AS pred_lang,
               MIN(q.quality_score) AS quality_score
        FROM q JOIN lang l USING (doc_id)
        WHERE q.quality_score >= {CLEAN_STREAM_MIN_QUALITY}
          AND l.pred_lang = '{CLEAN_STREAM_LANG}'
        GROUP BY md5(q.text)
    """


ORACLES = {
    "q_repeat_upsample": f"""
        WITH per_source AS (
          SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), mx AS (SELECT MAX(n_docs) AS max_n FROM per_source),
        factors AS (
          SELECT source,
                 CAST(least({REPEAT_MAX_EPOCHS},
                            greatest(1, (SELECT max_n FROM mx) // n_docs))
                      AS BIGINT) AS factor
          FROM per_source
        )
        SELECT doc_id, source,
               CAST(unnest(generate_series(1, factor)) AS BIGINT) AS epoch
        FROM documents JOIN factors USING (source)
    """,
    "q_importance_sample": _importance_sample_sql(),
    "q_clean_stream": _clean_stream_oracle_sql(),
    "q_bpe_pairs": f"""
        WITH words AS (
          SELECT unnest({_TOKS}) AS w FROM documents
        ), pairs AS (
          SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                       i -> substr(w, i, 2))) AS pair
          FROM words WHERE length(w) >= 2
        )
        SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT {BPE_TOP_PAIRS}
    """,
    "q_skyline": f"""
        WITH q AS ({{Q_QUALITY}}),
        d AS (
          SELECT doc_id, quality_bp,
                 CAST(n_chars_calc AS BIGINT) AS n_chars
          FROM q
        )
        SELECT a.doc_id, a.quality_bp, a.n_chars FROM d AS a
        WHERE NOT EXISTS (
          SELECT 1 FROM d AS b
          WHERE b.quality_bp >= a.quality_bp AND b.n_chars >= a.n_chars
            AND (b.quality_bp > a.quality_bp OR b.n_chars > a.n_chars)
        )
    """,
    "q_bigram_lm": f"""
        WITH grams AS (
          SELECT unnest({_ngrams_sql(_TOKS, 2)}) AS g FROM documents
        ), counts AS (
          SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
                 COUNT(*) AS n
          FROM grams GROUP BY 1, 2
        )
        SELECT w1, w2, n,
               CAST((10000 * n) // SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS p_bp
        FROM counts
    """,
    "q_span_mask": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS_RAW} AS toks FROM documents
        ), m AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 list_transform(generate_series(1, len(toks)), i ->
                   CASE WHEN {hash60_sql(
                       "CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)"
                   )} % 100 < {MASK_RATE_PCT}
                        THEN '{MASK_TOKEN}' ELSE toks[i] END) AS masked
          FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(len(list_filter(masked, x -> x = '{MASK_TOKEN}')) AS BIGINT)
                 AS n_masked,
               md5(array_to_string(masked, ' ')) AS masked_md5
        FROM m
    """,
    "q_temperature_mix": """
        WITH per_source AS (
          SELECT source, COUNT(*) AS n_docs,
                 sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
          FROM documents GROUP BY source
        ), totals AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
                 list_reduce(list_prepend(0.0, list(w ORDER BY source)),
                             (a, b) -> a + b) AS tot_w
          FROM per_source
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               ROUND(w / tot_w, 6) AS temp_share,
               ROUND((w * tot_docs) / (tot_w * n_docs), 4) AS boost
        FROM per_source CROSS JOIN totals
    """,
    "q_contamination": f"""
        WITH grams AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform({_ngrams_sql(_TOKS, CONTAM_NGRAM)},
                        g -> {hash60_sql('g')}))) AS g
          FROM documents
        ), ev AS (SELECT DISTINCT g FROM grams WHERE doc_id < {EVAL_DOC_MAX}),
        tr AS (SELECT doc_id, g FROM grams WHERE doc_id >= {EVAL_DOC_MAX})
        SELECT doc_id, COUNT(*) AS n_contam_grams
        FROM tr JOIN ev USING (g) GROUP BY doc_id
    """,
    "q_pack_sequences": f"""
        WITH t AS (
          SELECT doc_id, source, CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST((cum - n_tokens) // {BIN_BUDGET} AS BIGINT) AS bin_id
        FROM c
    """,
    "q_clean_corpus": _clean_corpus_oracle_sql(),
    "q_stratified_sample": f"""
        WITH r AS (
          SELECT doc_id, source,
                 CAST(CASE WHEN source LIKE 'src0%' OR source LIKE 'src1%'
                      THEN {SAMPLE_CUT_BP} ELSE {SAMPLE_DEFAULT_BP} END AS BIGINT) AS rate_bp
          FROM documents
        )
        SELECT doc_id, source, rate_bp
        FROM r WHERE ({_H}) % 10000 < rate_bp
    """,
    "q_hash_split": f"""
        SELECT doc_id,
               ({_H}) % 100 AS bucket,
               CASE WHEN ({_H}) % 100 < 90 THEN 'train'
                    WHEN ({_H}) % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "q_token_budget": f"""
        WITH t AS (
          SELECT doc_id, CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens FROM documents
        ), c AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t
        )
        SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
    """,
    "q_source_mix": f"""
        WITH per_source AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len({_TOKS_RAW})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), totals AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
          FROM per_source
        )
        SELECT source, n_docs, n_tokens,
               CAST((10000 * n_docs) // tot_docs AS BIGINT) AS doc_share_bp,
               CAST((10000 * n_tokens) // tot_tokens AS BIGINT) AS token_share_bp
        FROM per_source CROSS JOIN totals
    """,
}

# q_skyline's oracle embeds the q_quality oracle verbatim as its CTE so the
# two stay definitionally in lockstep (same trick as _importance_sample_sql).
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (  # noqa: E402
    ORACLES as _TEXT_ORACLES,
)

ORACLES["q_skyline"] = ORACLES["q_skyline"].replace(
    "{Q_QUALITY}", _TEXT_ORACLES["q_quality"]
)
