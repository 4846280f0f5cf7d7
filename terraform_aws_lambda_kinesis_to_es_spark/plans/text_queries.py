"""Text-analysis query surface over the ``documents`` table.

Cross-engine precision rules used throughout this module:
* per-row ratios are emitted as exact integer basis points
  ``(10000 * num) DIV den`` — integer division is bit-identical in Spark
  and DuckDB, unlike ``round(float_division, 4)`` whose half-up vs
  scale-multiply rounding can disagree at decimal midpoints;
* aggregate sums of integer columns are exact; no float avgs are emitted
  where the group count is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import hash60, hash60_sql
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
    BPE_REGEX,
    LANG_MARKERS,
    PII_EMAIL_RE,
    PII_EMAIL_TAG,
    PII_PHONE_RE,
    PII_PHONE_TAG,
    STOPWORDS,
    pii_counts,
    predicted_lang,
    redact_pii,
    tokens,
    word_ngrams,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# DuckDB-side token expression mirroring operators.text.tokens(lower(text)).
_TOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')"
_TOKS_RAW = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _in_list(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount: explode + hash aggregate. One shuffle on the
    word key; partial map-side aggregation keeps the exchange small."""
    docs = load_split(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (exact integer sums, no float avgs)."""
    docs = load_split(spark, sf_dir, "documents")
    return docs.withColumn("n_tokens", F.size(tokens(F.col("text")))).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-n-gram language-ID heuristic (operators.text.predicted_lang):
    per-language marker-token counts, argmax with alphabetical tie-break."""
    docs = load_split(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", predicted_lang(tokens(F.lower(F.col("text")))).alias("pred_lang")
    )


def with_quality(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Append the integer-bp quality columns to a documents frame (the
    reusable core of q_quality; also feeds q_importance_sample).
    ``extra_cols`` names input columns carried through the final select —
    composers (q_clean_corpus) use it to keep the whole row map-side
    instead of joining the quality columns back on doc_id."""
    toks = tokens(F.col("text"))
    d = (
        docs.withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn("n_chars_calc", F.length("text").cast("bigint"))
        .withColumn(
            "stop_cnt", F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        )
        .withColumn(
            "punct_cnt",
            F.length("text") - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", "")),
        )
    )
    d = (
        d.withColumn(
            "stop_ratio_bp",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(10000 * stop_cnt) DIV n_tokens"),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "punct_ratio_bp",
            F.when(
                F.col("n_chars_calc") > 0,
                F.expr("(10000 * punct_cnt) DIV n_chars_calc"),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
    )
    # Composite score, all-integer: 50% length saturation (tokens capped at
    # 100), 30% stopword presence, 20% punctuation cleanliness.
    d = d.withColumn(
        "quality_bp",
        F.expr(
            "CAST((least(n_tokens, 100) * 100 * 5 + stop_ratio_bp * 3"
            " + (10000 - punct_ratio_bp) * 2) DIV 10 AS BIGINT)"
        ),
    )
    return d.select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "stop_ratio_bp",
        "punct_ratio_bp",
        "quality_bp",
        *extra_cols,
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals in exact integer basis points."""
    return with_quality(load_split(spark, sf_dir, "documents"))


def q_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pre-tokens."""
    docs = load_split(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per language: chars-per-token and
    tokens-per-doc in basis points — the budget diagnostic that converts
    a per-language TOKEN budget into a DOC/byte budget and flags scripts
    the tokenizer shreds (fertility outliers). One scan, row-local token
    counts, bounded keyed agg; all ratios integer bp."""
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(tokens(F.lower(F.col("text")))).alias("n_toks"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.expr("(10000 * sum(n_chars)) DIV sum(n_toks)")
        .cast("bigint")
        .alias("chars_per_token_bp"),
        F.expr("(10000 * sum(n_toks)) DIV count(*)")
        .cast("bigint")
        .alias("tokens_per_doc_bp"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: sorted-distinct-token md5 (key-collision
    fingerprint) + min rolling shingle hash (winnowing-style)."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fp_md5"),
        F.array_min(F.transform(word_ngrams(toks, 5), lambda s: hash60(s))).alias(
            "fp_shingle_min"
        ),
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term): tf exact, df exact, tfidf = tf * ln(N/df)
    rounded. Two hash aggregations + one broadcast join (df table and the
    single-row N both broadcast); at scale only the term-key shuffle is
    wide. ln values are continuous so round(4) is midpoint-safe."""
    docs = load_split(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_tbl = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_tbl), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per doc: distinct-token ratio, most
    frequent token fraction, most frequent 2-gram fraction (integer basis
    points). Expressed relationally (explode -> two-level hash aggregate)
    rather than per-row HOF loops: the (doc_id, term) shuffle is linear in
    corpus size and partial-aggregates map-side, where a per-row
    distinct-x-count nested loop would be O(tokens^2) per document."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    words = docs.select("doc_id", F.explode(toks).alias("w"))
    tok_stats = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_cnt"),
        )
    )
    grams = docs.select("doc_id", F.explode(word_ngrams(toks, 2)).alias("g"))
    gram_stats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_grams"), F.max("c").alias("top_gram_cnt"))
    )
    return tok_stats.join(gram_stats, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr("(10000 * n_distinct) DIV n_tokens").cast("bigint").alias("distinct_bp"),
        F.expr("(10000 * top_cnt) DIV n_tokens").cast("bigint").alias("top_token_bp"),
        F.coalesce(F.expr("(10000 * top_gram_cnt) DIV n_grams"), F.lit(0))
        .cast("bigint")
        .alias("top_2gram_bp"),
    )


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per doc (nats, round(4)) — the
    classic gibberish/boilerplate quality signal: H = ln(n) - S/n with
    S = sum(c * ln c) over per-token counts. The float sum S is folded
    left-to-right over the w-sorted count list on BOTH engines (Spark
    aggregate seeded 0.0 over array_sort'ed structs; DuckDB list_reduce
    over list(... ORDER BY w) prepended with 0.0), so accumulation order
    is pinned and results stay bit-comparable before the final round.
    Same two-level aggregate shape as q_repetition — linear, map-side
    partial aggregation on the (doc_id, w) shuffle."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    counts = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("w", "c"))).alias("wc"),
    )
    s = F.aggregate(
        F.transform(F.col("wc"), lambda r: r["c"].cast("double") * F.log(r["c"].cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            F.log(F.col("n_tokens").cast("double")) - s / F.col("n_tokens").cast("double"), 4
        ).alias("entropy_nats"),
    )


# Non-overlapping passage chunk size (tokens) for cross-doc passage dedup.
PASSAGE_CHUNK = 8


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection: split each doc into
    non-overlapping PASSAGE_CHUNK-token chunks, hash each chunk, and score
    each doc by the fraction of its chunks that also occur in another doc
    (integer basis points). Chunk frequencies come from one hash aggregate
    on the 60-bit chunk hash; the per-occurrence join back is a shuffled
    hash join on that key — both linear in total chunk count, never
    corpus^2. Chunks are every PASSAGE_CHUNK-th overlapping n-gram, which
    keeps the shifted-slice zip form of word_ngrams (see its docstring for
    the HOF re-evaluation hazard the stride filter avoids)."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    chunks = F.filter(
        word_ngrams(toks, PASSAGE_CHUNK),
        lambda g, i: (i % F.lit(PASSAGE_CHUNK)) == F.lit(0),
    )
    # Single scan of the chunk stage: collapse to (h, doc_id, occ), get
    # the per-hash doc count as a window over the already-grouped rows
    # (each (h, doc_id) row counts one distinct doc), then aggregate per
    # doc. One pass over the chunk projection instead of the
    # two-scan groupBy + join-back form (which re-derived every chunk;
    # persisting it was slower still — cache cost beat the recompute).
    ch = docs.select(
        "doc_id", F.explode(F.transform(chunks, lambda g: hash60(g))).alias("h")
    )
    per_hash_doc = ch.groupBy("h", "doc_id").agg(F.count("*").alias("occ"))
    wh = Window.partitionBy("h")
    per_doc = (
        per_hash_doc.withColumn("nd", F.count("*").over(wh))
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_chunks"),
            F.sum(F.when(F.col("nd") > 1, F.col("occ")).otherwise(0)).alias(
                "n_dup_chunks"
            ),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
        F.coalesce("n_dup_chunks", F.lit(0)).cast("bigint").alias("n_dup_chunks"),
        F.coalesce(F.expr("(10000 * n_dup_chunks) DIV n_chunks"), F.lit(0))
        .cast("bigint")
        .alias("dup_passage_bp"),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and redact emails / phone numbers.

    The synthetic corpus contains no organic PII, so the plan injects a
    deterministic email + phone into each doc (derived from ``source`` /
    ``doc_id``) and then runs the real operator
    (``operators/text.py:redact_pii``) over the enriched text — the regex
    machinery, global replacement, and counting are exactly what runs on
    a real corpus. Map-only, zero shuffle, linear at 100 TB; the oracle
    mirrors both the injection and the scrub."""
    docs = load_split(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.col("source"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10_000).cast("string"), 4, "0"),
    )
    counts = pii_counts(enriched)
    red = redact_pii(enriched)
    return docs.select(
        "doc_id",
        counts["email"].cast("bigint").alias("n_emails"),
        counts["phone"].cast("bigint").alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("bigint").alias("redacted_len"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal, RefinedWeb-style: drop every passage chunk
    that also occurs in another document (header/footer/nav shingles at
    web scale) and reconstruct the cleaned text in original chunk order.

    Same linear chunk-hash shuffle as q_passage_dedup, but this one is a
    *transform* — the output carries the rebuilt document (as md5, to
    keep the compared payload small): posexplode keeps chunk positions,
    the per-hash distinct-doc count marks shared chunks, and the kept
    chunks reassemble via a sorted struct collect. Never corpus^2 — cost
    tracks total chunk count."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    chunks = F.filter(
        word_ngrams(toks, PASSAGE_CHUNK),
        lambda g, i: (i % F.lit(PASSAGE_CHUNK)) == F.lit(0),
    )
    ch = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "g")
    ).withColumn("h", hash60(F.col("g")))
    # Single scan of the chunk stage (same hazard as q_passage_dedup: the
    # groupBy(h)+join-back form derives every chunk twice — measured 4.8s
    # vs 3.8s cold / 1.5s warm for this window form at sf0.1): the
    # per-hash distinct-doc
    # count comes from a collect_set window over the one exploded
    # projection, then one hash aggregate per doc.
    wh = Window.partitionBy("h")
    per_doc = (
        ch.withColumn("nd", F.size(F.collect_set("doc_id").over(wh)))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("nd") == 1, 1).otherwise(0)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("nd") == 1, F.struct("pos", "g"))
                        )
                    ),
                    lambda s: s["g"],
                ),
            ).alias("kept_text"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
    )


# C4-style rule-filter knobs.
C4_MIN_TOKENS = 5
C4_WORD_LEN_MIN = 3
C4_WORD_LEN_MAX = 10
C4_BAD_WORDS = ("lorem", "ipsum", "slow")
C4_STOP_MIN_BP = 500  # <5% stopwords => suspicious


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-based filter flags, one boolean column per rule plus
    the keep decision: minimum word count, mean word length inside
    [3, 10], bad-word blocklist, stopword floor. All integer/boolean
    arithmetic on row-local HOF folds — map-only, zero shuffle, the
    cheapest pass of a cleaning pipeline and the first one run at 100 TB
    (it prunes before the expensive dedup stages)."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    too_short = n < C4_MIN_TOKENS
    # mean word length in [MIN, MAX] <=> MIN*n <= sum_len <= MAX*n (exact
    # integer form; no float division)
    word_len_out = ~(
        (F.lit(C4_WORD_LEN_MIN) * n <= sum_len) & (sum_len <= F.lit(C4_WORD_LEN_MAX) * n)
    )
    has_bad = F.size(F.filter(toks, lambda t: t.isin(*C4_BAD_WORDS))) > 0
    stop_low = F.lit(10_000) * stop_cnt < F.lit(C4_STOP_MIN_BP) * n
    return docs.select(
        "doc_id",
        too_short.alias("too_short"),
        word_len_out.alias("word_len_out"),
        has_bad.alias("has_bad_word"),
        stop_low.alias("stop_low"),
        (~(too_short | word_len_out | has_bad | stop_low)).alias("keep"),
    )


def q_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality score: per-doc mean negative
    log-likelihood under the corpus's own unigram LM,
    nll = ln(T) - (1/n_d) * sum_w c_dw * ln(c_w)  (T = corpus tokens,
    c_w = corpus count, c_dw = in-doc count). Low = natural text, high =
    rare-token salad — the filter CCNet implements with a KenLM model,
    here with the exactly-computable unigram LM so the oracle can match
    bit-for-bit.

    Shape: one explode + two hash aggregates + a shuffle join on the
    token (vocab side is Zipf-small after aggregation), then the same
    order-pinned float fold as q_doc_entropy so every double is
    partition-order independent."""
    docs = load_split(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    dc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    vocab = words.groupBy("w").agg(F.count("*").alias("cw"))
    tot = vocab.agg(F.sum("cw").cast("double").alias("t"))
    term = (F.col("c").cast("double") * F.log(F.col("cw").cast("double"))).alias(
        "term"
    )
    per_doc = (
        dc.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("w"), term))),
                F.lit(0.0),
                lambda a, s: a + s["term"],
            ).alias("s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        F.round(F.log("t") - F.col("s") / F.col("n_tokens"), 4).alias("nll_nats"),
    )


KEYPHRASE_TOP = 3


def q_keyphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyphrase extraction: the top-KEYPHRASE_TOP TF-IDF terms per
    document (rank ties broken alphabetically) — the per-doc tag set a
    search/labeling pipeline materializes. Adds one doc-keyed window over
    the q_tfidf plan; the per-doc partitions are vocabulary-bounded, so
    the window never sorts more than a doc's distinct terms."""
    scored = q_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= KEYPHRASE_TOP)
        .select("doc_id", "word", "tfidf", "rank")
    )


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_WORD_LEN_MIN = 3
GOPHER_WORD_LEN_MAX = 10
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2
GOPHER_SYMBOL_MAX_BP = 1000  # (# + ellipsis) per word > 10% => flagged
GOPHER_DUP_TOKEN_MAX_BP = 3000  # duplicate-token fraction > 30% => flagged


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filters (Rae et al. 2021 §A1.1), the second
    rule family next to q_c4_filters: word-count window, mean-word-length
    window, symbol-to-word ratio (# and ellipsis), required-stopword
    presence (>=2 distinct of the canonical 8), and a duplicate-token
    ceiling standing in for the duplicate-line rules (the corpus is
    single-line). Same scale shape as C4: row-local integer HOF folds,
    map-only, zero shuffle — the cheap pre-dedup prune."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    hash_cnt = F.length("text") - F.length(F.regexp_replace(F.col("text"), r"#", ""))
    ell_cnt = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), r"\.\.\.", ""))
    ) / F.lit(3)
    stop_hits = F.size(
        F.filter(
            F.array_distinct(toks), lambda t: t.isin(*GOPHER_REQUIRED_STOPS)
        )
    )
    too_few = n < GOPHER_MIN_WORDS
    too_many = n > GOPHER_MAX_WORDS
    word_len_out = ~(
        (F.lit(GOPHER_WORD_LEN_MIN) * n <= sum_len)
        & (sum_len <= F.lit(GOPHER_WORD_LEN_MAX) * n)
    )
    symbol_high = F.lit(10_000) * (hash_cnt + ell_cnt).cast("bigint") > F.lit(
        GOPHER_SYMBOL_MAX_BP
    ) * n
    stops_missing = stop_hits < GOPHER_MIN_STOP_HITS
    dup_high = F.lit(10_000) * (n - n_distinct) > F.lit(GOPHER_DUP_TOKEN_MAX_BP) * n
    return docs.select(
        "doc_id",
        too_few.alias("too_few_words"),
        too_many.alias("too_many_words"),
        word_len_out.alias("word_len_out"),
        symbol_high.alias("symbol_high"),
        stops_missing.alias("stops_missing"),
        dup_high.alias("dup_token_high"),
        (
            ~(too_few | too_many | word_len_out | symbol_high | stops_missing | dup_high)
        ).alias("keep"),
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the step before any exact-dedup /
    fingerprint pass): lowercase, non-alphanumerics to spaces, whitespace
    collapsed, trimmed — emitted as length + engine-portable md5-derived
    fingerprint so the oracle checks the exact normalized bytes without
    shipping them. Map-only, zero shuffle."""
    docs = load_split(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", " "), r" +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        hash60(norm).alias("norm_h"),
    )


# q_quality_classifier: fastText-style hashed linear model. Weights are
# DERIVED from the bucket id by the same md5 hash both engines share, so the
# "model" needs no broadcast table at all — the classic hashing-trick scoring
# shape (score = sum of weights of hashed token features) with zero shuffle.
CLS_BUCKETS = 1024
CLS_WEIGHT_SPAN = 17  # weights in [-8, 8]


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bag-of-words linear classifier scoring (fastText-shape): each
    token hashes into one of CLS_BUCKETS feature buckets, each bucket's
    integer weight in [-8, 8] derives deterministically from the bucket id,
    and the doc score is the sum over token instances. This is exactly how
    a 100 TB pipeline runs a cheap learned quality model: map-only, the
    model reached through arithmetic (or a broadcast array), no shuffle,
    no UDF — the score fold is a JVM HOF over the token array."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    weights = F.transform(
        toks,
        lambda t: (
            hash60(
                F.concat(
                    F.lit("w:"), (hash60(t) % CLS_BUCKETS).cast("string")
                )
            )
            % CLS_WEIGHT_SPAN
            - F.lit((CLS_WEIGHT_SPAN - 1) // 2)
        ),
    )
    score = F.aggregate(
        weights, F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("score"),
        (score > 0).alias("pred_keep"),
    )


# q_doc_chunks: RAG-style sliding-window chunking.
CHUNK_WORDS = 64
CHUNK_STRIDE = 48


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-corpus chunking: overlapping CHUNK_WORDS-token windows at
    CHUNK_STRIDE spacing (the standard RAG ingest step), emitted as
    (doc_id, chunk_idx, n_words, chunk fingerprint). Chunk count is
    1 + ceil((n - C) / S) so the tail is always covered; the fingerprint
    lets the oracle check the exact chunk text without shipping it.
    Scale shape: a map-side 1-to-N Generate (explode of a tiny index
    sequence) — no shuffle, pipelined with the scan."""
    docs = load_split(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n", F.size("toks")
    )
    d = d.withColumn(
        "k",
        F.when(F.col("n") <= 0, F.lit(0))
        .when(F.col("n") <= CHUNK_WORDS, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.expr(f"(n - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE}")
        )
        .cast("int"),
    )
    exploded = d.filter(F.col("k") > 0).select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, F.lit(CHUNK_WORDS)
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_words"),
        hash60(F.array_join(chunk, " ")).alias("chunk_h"),
    )


OOV_VOCAB_SIZE = 500


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: build the top-OOV_VOCAB_SIZE corpus
    vocabulary (ties broken by token so the cut is deterministic), then
    per-doc out-of-vocabulary token fraction in basis points — the number
    that decides whether a tokenizer's vocab fits a new corpus. Two-pass
    shape that survives 100 TB: one word-count shuffle feeding a TakeOrdered
    vocab (bounded rows, broadcast), then a broadcast membership join and
    one per-doc aggregation."""
    docs = load_split(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("cw"))
        .orderBy(F.desc("cw"), F.asc("w"))
        .limit(OOV_VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    flagged = words.join(F.broadcast(vocab), "w", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(10000 * n_oov) DIV n_tokens").cast("bigint").alias("oov_bp"),
        )
    )


def q_difficulty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / CCNet-style difficulty binning on an exact integer
    rarity score: each token instance contributes T DIV c_w (corpus
    tokens over the token's corpus count), so rare-token-heavy docs score
    high. Docs are then placed in quartile buckets against exact
    percentile thresholds computed in a tiny aggregate and broadcast —
    bucketing by threshold comparison instead of a global ntile window
    keeps the corpus-wide pass map-only (a single-partition ntile sort
    would be the classic 100 TB scale-killer here)."""
    docs = load_split(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("cw"))
    tot = vocab.agg(F.sum("cw").alias("t"))
    rarity = (
        words.join(F.broadcast(vocab), "w")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("t DIV cw")).cast("bigint").alias("rarity"))
    )
    qs = rarity.agg(
        F.percentile("rarity", F.lit(0.25)).alias("q1"),
        F.percentile("rarity", F.lit(0.5)).alias("q2"),
        F.percentile("rarity", F.lit(0.75)).alias("q3"),
    )
    return rarity.join(F.broadcast(qs)).select(
        "doc_id",
        "rarity",
        (
            F.lit(1)
            + (F.col("rarity") > F.col("q1")).cast("int")
            + (F.col("rarity") > F.col("q2")).cast("int")
            + (F.col("rarity") > F.col("q3")).cast("int")
        ).alias("bucket"),
    )


QUERIES = {
    "q_wordcount": q_wordcount,
    "q_repetition": q_repetition,
    "q_passage_dedup": q_passage_dedup,
    "q_doc_entropy": q_doc_entropy,
    "q_doc_stats": q_doc_stats,
    "q_langid": q_langid,
    "q_quality": q_quality,
    "q_tokens": q_tokens,
    "q_tokenizer_fertility": q_tokenizer_fertility,
    "q_fingerprint": q_fingerprint,
    "q_tfidf": q_tfidf,
    "q_pii_redact": q_pii_redact,
    "q_boilerplate_strip": q_boilerplate_strip,
    "q_c4_filters": q_c4_filters,
    "q_unigram_ppl": q_unigram_ppl,
    "q_gopher_filters": q_gopher_filters,
    "q_text_normalize": q_text_normalize,
    "q_difficulty_buckets": q_difficulty_buckets,
    "q_keyphrase": q_keyphrase,
    "q_quality_classifier": q_quality_classifier,
    "q_doc_chunks": q_doc_chunks,
    "q_oov_rate": q_oov_rate,
}


def _langid_sql() -> str:
    score = {
        lang: f"len(list_filter(toks, t -> t IN ({_in_list(m)})))"
        for lang, m in LANG_MARKERS.items()
    }
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {score['de']} AS sd, {score['en']} AS se,
                     {score['es']} AS ss, {score['fr']} AS sf FROM t)
        SELECT doc_id,
               CASE WHEN greatest(sd, se, ss, sf) <= 0 THEN 'und'
                    WHEN sd >= se AND sd >= ss AND sd >= sf THEN 'de'
                    WHEN se >= ss AND se >= sf THEN 'en'
                    WHEN ss >= sf THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM s
    """


def _ngrams_sql(toks_expr: str, n: int) -> str:
    """DuckDB word-n-gram list over a token-list expression (1-based,
    inclusive slice — mirrors Spark slice(toks, i, n))."""
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _chunks_sql(toks_expr: str, n: int) -> str:
    """DuckDB non-overlapping n-token chunk strings (1-based inclusive
    slices; generate_series(1, 0) is empty, so short docs yield [])."""
    return (
        f"list_transform(generate_series(1, len({toks_expr}) // {n}), "
        f"i -> array_to_string(({toks_expr})[(i-1)*{n}+1:(i-1)*{n}+{n}], ' '))"
    )


_PII_ENRICH = (
    "text || ' contact ' || source || '@example.com or call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_CLS_WEIGHT = (
    hash60_sql(
        f"'w:' || CAST({hash60_sql('t')} % {CLS_BUCKETS} AS VARCHAR)"
    )
    + f" % {CLS_WEIGHT_SPAN} - {(CLS_WEIGHT_SPAN - 1) // 2}"
)

_CHUNK_SLICE = (
    f"toks[chunk_idx*{CHUNK_STRIDE}+1 : "
    f"chunk_idx*{CHUNK_STRIDE}+{CHUNK_WORDS}]"
)

ORACLES = {
    "q_quality_classifier": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id, len(toks) AS n,
                 list_reduce(
                   list_prepend(0, list_transform(toks, t -> ({_CLS_WEIGHT}))),
                   (a, b) -> a + b) AS score
          FROM t
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
               CAST(score AS BIGINT) AS score, score > 0 AS pred_keep
        FROM s
    """,
    "q_doc_chunks": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
        ), k AS (
          SELECT doc_id, toks,
                 CASE WHEN n <= 0 THEN 0
                      WHEN n <= {CHUNK_WORDS} THEN 1
                      ELSE 1 + (n - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1)
                               // {CHUNK_STRIDE} END AS k
          FROM t
        ), c AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, k - 1)) AS chunk_idx
          FROM k WHERE k > 0
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len({_CHUNK_SLICE}) AS BIGINT) AS n_words,
               {hash60_sql(f"array_to_string({_CHUNK_SLICE}, ' ')")} AS chunk_h
        FROM c
    """,
    "q_oov_rate": f"""
        WITH words AS (
          SELECT doc_id, unnest({_TOKS}) AS w FROM documents
        ), vocab AS (
          SELECT w FROM (
            SELECT w, COUNT(*) AS cw FROM words GROUP BY w
            QUALIFY ROW_NUMBER() OVER (ORDER BY cw DESC, w)
                      <= {OOV_VOCAB_SIZE}
          )
        ), j AS (
          SELECT d.doc_id, v.w IS NOT NULL AS iv
          FROM words d LEFT JOIN vocab v ON d.w = v.w
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
               CAST((10000 * SUM(CASE WHEN iv THEN 0 ELSE 1 END)) // COUNT(*)
                    AS BIGINT) AS oov_bp
        FROM j GROUP BY doc_id
    """,
    "q_gopher_filters": f"""
        WITH t AS (
          SELECT doc_id, text, {_TOKS} AS toks FROM documents
        ), m AS (
          SELECT doc_id, len(toks) AS n,
                 len(list_distinct(toks)) AS n_distinct,
                 list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                             (a, b) -> a + b) AS sum_len,
                 length(text) - length(replace(text, '#', '')) AS hash_cnt,
                 (length(text) - length(replace(text, '...', ''))) // 3 AS ell_cnt,
                 len(list_filter(list_distinct(toks),
                     t -> t IN ({_in_list(GOPHER_REQUIRED_STOPS)}))) AS stop_hits
          FROM t
        ), fl AS (
          SELECT doc_id,
                 n < {GOPHER_MIN_WORDS} AS too_few_words,
                 n > {GOPHER_MAX_WORDS} AS too_many_words,
                 NOT ({GOPHER_WORD_LEN_MIN} * n <= sum_len
                      AND sum_len <= {GOPHER_WORD_LEN_MAX} * n) AS word_len_out,
                 10000 * (hash_cnt + ell_cnt) > {GOPHER_SYMBOL_MAX_BP} * n
                   AS symbol_high,
                 stop_hits < {GOPHER_MIN_STOP_HITS} AS stops_missing,
                 10000 * (n - n_distinct) > {GOPHER_DUP_TOKEN_MAX_BP} * n
                   AS dup_token_high
          FROM m
        )
        SELECT doc_id, too_few_words, too_many_words, word_len_out, symbol_high,
               stops_missing, dup_token_high,
               NOT (too_few_words OR too_many_words OR word_len_out
                    OR symbol_high OR stops_missing OR dup_token_high) AS keep
        FROM fl
    """,
    "q_text_normalize": f"""
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents
        )
        SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_chars_norm,
               {hash60_sql("norm")} AS norm_h
        FROM n
    """,
    "q_difficulty_buckets": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
        vocab AS (SELECT w, COUNT(*) AS cw FROM words GROUP BY w),
        tot AS (SELECT SUM(cw) AS t FROM vocab),
        rarity AS (
          SELECT doc_id,
                 CAST(SUM((SELECT t FROM tot) // cw) AS BIGINT) AS rarity
          FROM words JOIN vocab USING (w) GROUP BY doc_id
        ),
        qs AS (
          SELECT quantile_cont(rarity, 0.25) AS q1,
                 quantile_cont(rarity, 0.5) AS q2,
                 quantile_cont(rarity, 0.75) AS q3
          FROM rarity
        )
        SELECT doc_id, rarity,
               1 + CAST(rarity > (SELECT q1 FROM qs) AS INT)
                 + CAST(rarity > (SELECT q2 FROM qs) AS INT)
                 + CAST(rarity > (SELECT q3 FROM qs) AS INT) AS bucket
        FROM rarity
    """,
    "q_c4_filters": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), m AS (
          SELECT doc_id, len(toks) AS n,
                 list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                             (a, b) -> a + b) AS sum_len,
                 len(list_filter(toks, x -> x IN ({_in_list(STOPWORDS)}))) AS stop_cnt,
                 len(list_filter(toks, x -> x IN ({_in_list(C4_BAD_WORDS)}))) AS bad_cnt
          FROM t
        ), fl AS (
          SELECT doc_id,
                 n < {C4_MIN_TOKENS} AS too_short,
                 NOT ({C4_WORD_LEN_MIN} * n <= sum_len AND sum_len <= {C4_WORD_LEN_MAX} * n)
                   AS word_len_out,
                 bad_cnt > 0 AS has_bad_word,
                 10000 * stop_cnt < {C4_STOP_MIN_BP} * n AS stop_low
          FROM m
        )
        SELECT doc_id, too_short, word_len_out, has_bad_word, stop_low,
               NOT (too_short OR word_len_out OR has_bad_word OR stop_low) AS keep
        FROM fl
    """,
    "q_unigram_ppl": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
        dc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
        vocab AS (SELECT w, COUNT(*) AS cw FROM words GROUP BY w),
        tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS t FROM vocab),
        per_doc AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 list_reduce(list_prepend(0.0,
                     list(CAST(c AS DOUBLE) * ln(CAST(cw AS DOUBLE)) ORDER BY w)),
                     (a, b) -> a + b) AS s
          FROM dc JOIN vocab USING (w) GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, ROUND(ln(t) - s / n_tokens, 4) AS nll_nats
        FROM per_doc CROSS JOIN tot
    """,
    "q_pii_redact": f"""
        WITH e AS (SELECT doc_id, {_PII_ENRICH} AS t FROM documents),
        r AS (
          SELECT doc_id, t,
                 regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}',
                     '{PII_EMAIL_TAG}', 'g'), '{PII_PHONE_RE}',
                     '{PII_PHONE_TAG}', 'g') AS red
          FROM e
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
               md5(red) AS redacted_md5,
               CAST(length(red) AS BIGINT) AS redacted_len
        FROM r
    """,
    "q_boilerplate_strip": f"""
        WITH base AS (
          SELECT doc_id, {_chunks_sql(_TOKS, PASSAGE_CHUNK)} AS ck FROM documents
        ),
        idx AS (
          SELECT doc_id, ck, unnest(generate_series(1, len(ck))) AS pos FROM base
        ),
        ch AS (
          SELECT doc_id, pos, ck[pos] AS g, {hash60_sql('ck[pos]')} AS h FROM idx
        ),
        freq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h),
        per_doc AS (
          SELECT ch.doc_id, COUNT(*) AS n_chunks,
                 SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS n_kept,
                 array_to_string(list(g ORDER BY pos) FILTER (WHERE nd = 1), ' ')
                   AS kept_text
          FROM ch JOIN freq USING (h) GROUP BY ch.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
               CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
               md5(COALESCE(p.kept_text, '')) AS kept_md5
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    "q_doc_entropy": f"""
        WITH counts AS (
          SELECT doc_id, w, COUNT(*) AS c
          FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
          GROUP BY 1, 2
        ), per_doc AS (
          SELECT doc_id, SUM(c) AS n_tokens,
                 list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY w) AS terms
          FROM counts GROUP BY doc_id
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               ROUND(ln(CAST(n_tokens AS DOUBLE))
                     - list_reduce(list_prepend(0.0, terms), (a, b) -> a + b)
                       / CAST(n_tokens AS DOUBLE), 4) AS entropy_nats
        FROM per_doc
    """,
    "q_repetition": f"""
        WITH words AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
        tc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
        ts AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
                      MAX(c) AS top_cnt FROM tc GROUP BY 1),
        grams AS (SELECT doc_id, unnest({_ngrams_sql(_TOKS, 2)}) AS g FROM documents),
        gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
        gs AS (SELECT doc_id, SUM(c) AS n_grams, MAX(c) AS top_gram_cnt FROM gc GROUP BY 1)
        SELECT ts.doc_id, CAST(ts.n_tokens AS BIGINT) AS n_tokens,
               CAST((10000 * ts.n_distinct) // ts.n_tokens AS BIGINT) AS distinct_bp,
               CAST((10000 * ts.top_cnt) // ts.n_tokens AS BIGINT) AS top_token_bp,
               CAST(COALESCE((10000 * gs.top_gram_cnt) // gs.n_grams, 0) AS BIGINT) AS top_2gram_bp
        FROM ts LEFT JOIN gs ON ts.doc_id = gs.doc_id
    """,
    "q_passage_dedup": f"""
        WITH ch AS (
          SELECT doc_id, {hash60_sql('g')} AS h
          FROM (SELECT doc_id, unnest({_chunks_sql(_TOKS, PASSAGE_CHUNK)}) AS g
                FROM documents)
        ), freq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h),
        per_doc AS (
          SELECT doc_id, COUNT(*) AS n_chunks,
                 SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_dup
          FROM ch JOIN freq USING (h) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
               CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_chunks,
               CAST(COALESCE((10000 * p.n_dup) // p.n_chunks, 0) AS BIGINT) AS dup_passage_bp
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    "q_wordcount": f"""
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        GROUP BY word
    """,
    "q_doc_stats": f"""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(len({_TOKS_RAW})) AS BIGINT) AS sum_tokens,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    "q_langid": _langid_sql(),
    "q_quality": f"""
        WITH base AS (
          SELECT doc_id,
                 length(text) AS n_chars_calc,
                 len({_TOKS_RAW}) AS n_tokens,
                 len(list_filter({_TOKS_RAW}, t -> t IN ({_in_list(STOPWORDS)}))) AS stop_cnt,
                 length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt
          FROM documents
        ), bp AS (
          SELECT doc_id, n_chars_calc, n_tokens,
                 CASE WHEN n_tokens > 0 THEN (10000 * stop_cnt) // n_tokens ELSE 0 END AS stop_ratio_bp,
                 CASE WHEN n_chars_calc > 0 THEN (10000 * punct_cnt) // n_chars_calc ELSE 0 END AS punct_ratio_bp
          FROM base
        )
        SELECT doc_id, n_chars_calc, n_tokens,
               CAST(stop_ratio_bp AS BIGINT) AS stop_ratio_bp,
               CAST(punct_ratio_bp AS BIGINT) AS punct_ratio_bp,
               CAST((least(n_tokens, 100) * 100 * 5 + stop_ratio_bp * 3
                     + (10000 - punct_ratio_bp) * 2) // 10 AS BIGINT) AS quality_bp
        FROM bp
    """,
    "q_tokens": f"""
        SELECT doc_id,
               CAST(len({_TOKS_RAW}) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "q_tokenizer_fertility": f"""
        WITH per_doc AS (
          SELECT lang, len({_TOKS}) AS n_toks, length(text) AS n_chars
          FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST((10000 * SUM(n_chars)) // SUM(n_toks) AS BIGINT)
                 AS chars_per_token_bp,
               CAST((10000 * SUM(n_toks)) // COUNT(*) AS BIGINT)
                 AS tokens_per_doc_bp
        FROM per_doc GROUP BY lang
    """,
    "q_fingerprint": f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp_md5,
               list_min(list_transform({_ngrams_sql(_TOKS, 5)},
                        g -> {hash60_sql('g')})) AS fp_shingle_min
        FROM documents
    """,
    "q_tfidf": f"""
        WITH words AS (
          SELECT doc_id, unnest({_TOKS}) AS word FROM documents
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ), dfx AS (
          SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.word, tf.tf, dfx.df,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df), 4) AS tfidf
        FROM tf JOIN dfx USING (word) CROSS JOIN n
    """,
    "q_keyphrase": f"""
        WITH words AS (
          SELECT doc_id, unnest({_TOKS}) AS word FROM documents
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ), dfx AS (
          SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.word,
                 ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df), 4)
                   AS tfidf
          FROM tf JOIN dfx USING (word) CROSS JOIN n
        )
        SELECT doc_id, word, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, word ASC) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {KEYPHRASE_TOP}
    """,
}
