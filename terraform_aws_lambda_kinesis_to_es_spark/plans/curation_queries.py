"""Retrieval-fusion / sketch / curation query surface (PROMOTED round 7).

Built and staged in round 6 as ``plans/staged_r7.py`` — implemented,
oracle-backed, and pytest-verified with the driver's own compare
protocol (tests/test_curation_queries.py) while the round-6 driver
window was fully allocated to the verdict-age rotation. Round 7
declared them: the module is now merged into ``collect_surface()``
like every other plans module, and the names lead the round-7 _HEAD
(VERDICT r6 #1).

One staged name retired instead of promoting: ``q_semdedup_hashseed``'s
hash-ranked seed rule became q_semdedup_bucketed's DECLARED contract
(plans/similarity_queries.py — VERDICT r6 #2 re-contract), so declaring
the staged name too would register the identical query twice.

Contents — ops a retrieval/curation stack needs:

- ``q_hybrid_rrf``: reciprocal-rank fusion (Cormack/Clarke/Buettcher,
  SIGIR'09 — public formula) of a BM25 lexical leg and an
  embedding-cosine leg over the aligned documents/embeddings tables.
- ``q_heavy_hitters``: count-min sketch (Cormode/Muthukrishnan '05)
  token-frequency estimation, audited against exact counts — the
  mergeable-sketch shape used for frequency stats at 100 TB.
- ``q_sorted_neighborhood``: sorted-neighborhood blocking
  (Hernandez/Stolfo SIGMOD'95) near-dup candidates, exact-Jaccard
  verified — the sort-based third blocking family next to banding
  (minhash_dedup) and prefix filtering (exact_jaccard_pairs).
- ``q_substring_spans``: ExactSubstr duplicated-span dedup (Lee et al.
  2022) — per-doc MAXIMAL merged duplicated k-token spans, the removal
  geometry q_passage_dedup's strided scoring can't give.
- ``q_substring_strip``: the removal half — the cleaned normalized
  corpus with every duplicated span cut out (anti range-join on the
  doc key + per-doc ordered reconstruction).
- ``q_domain_cap``: per-domain document capping (the per-source quota
  step of pretraining mixes) with exact kept/dropped token accounting.
- ``q_dataset_card``: per-source curation card (docs, exact-dup rate,
  token budget, language mix) — the datasheet summary a mix designer
  reads before weighting sources.
- ``q_hist_quantiles``: fixed-width histogram-sketch quantiles
  (p50/p90/p99) — the mergeable, bounded-size alternative to a global
  order statistic, completing the sketch family (CMS, HLL).
- ``q_scd2_intervals``: SCD type-2 validity-interval construction from
  an append-only change stream — the warehouse history shape next to
  q_cdc_latest (latest-only) and q_asof_join (interval consumption).
- ``q_semdedup_assign_agreement``: bounded exhaustive-vs-bucketed
  assignment audit on the id-hash sample — measures the bucketed
  path's recall contract instead of assuming it (the embedding-side
  q_lsh_eval).
- ``q_bloom_semijoin``: Bloom-filter semi-join with an exact
  false-positive audit — the MEMBERSHIP sketch completing the family
  (CMS = counts, HLL = distincts, histogram = quantiles); the filter
  is a <=64-row bit_or aggregate, mergeable and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
    duplicated_token_spans,
    tokens,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
    _SHINGLES,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.search_queries import (
    q_bm25,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _bucket_sql,
    _cosine_sql,
    _sample_pred_sql,
    _vec,
    _VEC_CTE,
    SEM_MIN_CLUSTERS,
    SEM_ROWS_PER_CLUSTER,
    SEM_SAMPLE_TARGET,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _TOKS,
    _TOKS_RAW,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

# ---------------------------------------------------------------- hybrid RRF

RRF_K = 60
RRF_POOL = 20  # per-leg shortlist depth
RRF_QUERY_VEC_ID = 0  # the vector leg's fixed query: embedding of id 0


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the top-RRF_POOL of a
    BM25 lexical leg (q_bm25's scoring, SEARCH_TERMS) fused with the
    top-RRF_POOL of an embedding-cosine leg (query = the id-0 vector)
    by rrf = 1/(K+rank_lex) + 1/(K+rank_vec), missing legs contributing
    0 — the standard parameter-free fusion for lexical+dense stacks.

    Determinism: each leg ranks on its ROUND(score, 4) with the id as
    tiebreak, so rank order survives any engine float formatting; the
    rrf sum adds the two reciprocals in fixed (lex, vec) order —
    bit-identical across engines.

    Scale shape: each leg ends in a distributed top-k (TakeOrdered — no
    global single-partition window); ranks are assigned by a window over
    the POOL-row shortlist only. The fusion is a POOL x POOL full outer
    join of two 20-row frames — driver-trivial at any corpus size; the
    corpus-sized work is exactly one BM25 scan + one cosine scan."""
    lex = (
        q_bm25(spark, sf_dir)
        .select("doc_id", "bm25")
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(RRF_POOL)
    )
    lex = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .alias("lex_rank"),
    )
    emb = load_split(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    qv = vecs.filter(F.col("vec_id") == RRF_QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    dense = (
        vecs.filter(F.col("vec_id") != RRF_QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(S.cosine(F.col("v"), F.col("qv")), 4).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("doc_id"))
        .limit(RRF_POOL)
    )
    dense = dense.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), F.col("doc_id")))
        .alias("vec_rank"),
    )
    fused = lex.join(dense, "doc_id", "full_outer")
    lex_term = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("lex_rank").cast("double")),
    ).otherwise(F.lit(0.0))
    vec_term = F.when(
        F.col("vec_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("vec_rank").cast("double")),
    ).otherwise(F.lit(0.0))
    return fused.select(
        "doc_id",
        F.col("lex_rank").cast("bigint").alias("lex_rank"),
        F.col("vec_rank").cast("bigint").alias("vec_rank"),
        F.round(lex_term + vec_term, 6).alias("rrf"),
    )


# ------------------------------------------------------------ heavy hitters

CMS_DEPTH = 4
CMS_WIDTH = 512
HH_TOP = 30


def q_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Count-min-sketch token frequencies, audited against exact counts.

    The sketch: CMS_DEPTH independent hash rows of CMS_WIDTH counters;
    every token occurrence increments counter[j][hash_j(tok) % W] for
    each row j; the estimate for a token is min_j of its counters — an
    overestimate by construction (collisions only add). The audit
    reports, for the exact top-HH_TOP tokens, the exact count, the CMS
    estimate, and the collision error (est - exact >= 0 always).

    Scale shape: the sketch is ONE token scan + a groupBy onto
    DEPTH x WIDTH = 2048 cells — a fixed-size, MERGEABLE aggregate (the
    property that makes CMS the 100 TB tool: per-partition sketches sum
    cell-wise, so partial aggregation does almost all the work map-side
    and the reduce moves 2048 rows regardless of corpus size). The
    candidate probe joins HH_TOP x DEPTH rows against the 2048-cell
    sketch — both sides broadcast-sized. hash60 keeps the bucketing
    portable to the oracle.

    Cache lifecycle (r6 ADVICE, assign_bucketed_seeds pattern): the
    persisted token frame is corpus-sized and feeds two consumers (the
    sketch cells and the exact top-k); it lives inside the returned lazy
    plan, so it cannot be unpersisted here. Batch callers rely on the
    house clearCache-between-queries rule (bench.py) or LRU eviction;
    long-lived sessions pass ``cache_registry`` (a list) and unpersist
    after their terminal action — ``for f in reg: f.unpersist()``."""
    docs = load_split(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    ).persist()
    if cache_registry is not None:
        cache_registry.append(toks)
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            hash60(F.concat(F.lit(f"{j}:"), F.col("tok")))
                            % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell")
    ).groupBy("cell.j", "cell.bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("tok"))
        .limit(HH_TOP)
    )
    probes = top.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            hash60(F.concat(F.lit(f"{j}:"), F.col("tok")))
                            % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("probe"),
    ).select("tok", "exact_cnt", "probe.j", "probe.bucket")
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            "tok",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
    )


# ----------------------------------------------------- sorted neighborhood

SNM_KEY_CHARS = 16
SNM_WINDOW = 2  # pair each doc with the next W docs in key order
SNM_THRESHOLD_BP = 5000


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup detection: docs sort by a normalized
    prefix blocking key (first SNM_KEY_CHARS alphanumerics of the
    lowercased text); each doc pairs with the next SNM_WINDOW docs that
    share its key, and candidates are exact-Jaccard verified at
    SNM_THRESHOLD_BP — the classic sort-based blocking family
    (Hernandez/Stolfo), complementing the hash-based (minhash banding)
    and inverted-index-based (prefix filter) detectors already declared.

    Scale shape: the key-partitioned window ranks WITHIN blocking keys
    (parallel across keys — no global single-partition sort), and the
    neighbor join is EQUI-keyed on (key, rank): the probe side explodes
    each doc into its SNM_WINDOW probe ranks, so the join never goes
    quadratic inside a block regardless of block size. Shingle sets ride
    along the two join legs; the Jaccard verify is row-local."""
    docs = load_split(spark, sf_dir, "documents")
    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""),
        1,
        SNM_KEY_CHARS,
    )
    # NOT persisted (r12 optimization measured it): the frame feeds both
    # join legs, but caching the shingle-array payload costs more than
    # recomputing it (1.09 s -> 1.61 s with persist at sf0.1)
    sh = (
        D.with_shingles(docs)
        .select("doc_id", key.alias("k"), "shingles")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.col("doc_id"))
            ),
        )
    )
    probes = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        "k",
        F.explode(
            F.array(*[F.col("rn") + F.lit(d) for d in range(1, SNM_WINDOW + 1)])
        ).alias("rn"),
    )
    right = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        "k",
        "rn",
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        probes.join(right, ["k", "rn"])
        .filter(inter > 0)
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST((10000 * size(array_intersect(sh_a, sh_b)))"
                " DIV (size(sh_a) + size(sh_b)"
                "      - size(array_intersect(sh_a, sh_b))) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= SNM_THRESHOLD_BP)
    )


# ------------------------------------------------------- substring spans

SPAN_K = 8  # duplicated-window length in tokens (= PASSAGE_CHUNK)


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022):
    per doc, the MERGED MAXIMAL spans of tokens covered by k-token
    windows that occur more than once anywhere in the corpus — the exact
    geometry an ExactSubstr removal pass cuts, which q_passage_dedup's
    strided chunk scoring cannot express (its chunks never merge and
    miss dups that straddle chunk boundaries).

    Output: per doc — token count, merged-span count, duplicated token
    total, and duplicated basis points. All integer math; span merging
    is the equal-interval lag() rule (see
    operators.text.duplicated_token_spans for the scale shape: one
    linear gram scan, one hash-frequency aggregate, one per-doc window —
    no corpus^2 term)."""
    docs = load_split(spark, sf_dir, "documents")
    spans = duplicated_token_spans(docs, SPAN_K)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("dup_toks"),
    )
    n_tok = F.size(tokens(F.lower(F.col("text"))))
    return (
        docs.select("doc_id", n_tok.alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.coalesce("dup_toks", F.lit(0)).cast("bigint").alias("dup_tokens"),
        )
        .withColumn(
            "dup_bp",
            F.expr(
                "CAST(CASE WHEN n_tokens > 0"
                " THEN (10000 * dup_tokens) DIV n_tokens"
                " ELSE 0 END AS BIGINT)"
            ),
        )
    )


def q_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of ExactSubstr dedup: reconstruct each document's
    NORMALIZED token stream (lowercased, whitespace-tokenized — the same
    basis the spans are computed on) with every duplicated span cut out —
    what q_substring_spans reports, this one executes, yielding the
    cleaned corpus a training pipeline actually feeds downstream.

    Scale shape: spans come from duplicated_token_spans (linear, see
    q_substring_spans); the cut is a doc_id-EQUI anti join of token
    positions against span intervals (the range test rides as a residual
    condition on the equi key — never a product), and reconstruction is
    a per-doc sort of surviving (pos, tok) structs — bounded by doc
    length, like every per-doc fold on the surface."""
    docs = load_split(spark, sf_dir, "documents")
    spans = duplicated_token_spans(docs, SPAN_K)
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "tok"),
    )
    kept = toks.alias("tk").join(
        spans.alias("sp"),
        (F.col("tk.doc_id") == F.col("sp.doc_id"))
        & (F.col("tk.pos") >= F.col("sp.s"))
        & (F.col("tk.pos") < F.col("sp.e")),
        "left_anti",
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    n_tok = F.size(tokens(F.lower(F.col("text"))))
    return (
        docs.select("doc_id", n_tok.alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


# ------------------------------------------------------------- domain cap

CAP_N = 10  # per-source document quota


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document capping — the per-source quota step of a
    pretraining mix (cap every domain at CAP_N docs so head domains
    can't dominate the token budget). The keep rule is deterministic
    pseudo-random: rank within source by hash60(doc_id) (id tiebreak),
    keep rank <= CAP_N — a reproducible uniform subsample per domain.

    Output: per source — docs, kept docs, total/kept token budget, and
    kept basis points. Scale shape: ONE window over a 3-column
    projection (source, priority, token count), partitioned by source —
    parallel across domains; a pathologically hot domain sorts its own
    rows only (spillable sort, no global order). At extreme skew the
    two-pass form (per-domain count -> broadcast keep-rate -> filter on
    the same hash) trades exactness of the cap for a scan, but the exact
    quota IS the contract here."""
    docs = load_split(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_toks"),
        hash60(F.col("doc_id").cast("string")).alias("pri"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy("pri", "doc_id")
        ),
    )
    kept = F.col("rn") <= CAP_N
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum("n_toks").cast("bigint").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_toks")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .withColumn(
            "kept_bp",
            F.expr(
                "CAST(CASE WHEN tokens_total > 0"
                " THEN (10000 * tokens_kept) DIV tokens_total"
                " ELSE 0 END AS BIGINT)"
            ),
        )
    )


# ------------------------------------------------------- Bloom semi-join

BLOOM_WORD_BITS = 63  # bits per word; pos <= 62 keeps every long positive
BLOOM_WORDS_MIN = 64  # filter floor: 4032 bits
BLOOM_BITS_PER_KEY = 10  # sizing rule: ~10 bits per member key
BLOOM_K = 3  # hash functions
BLOOM_BAL = 8000.0  # membership predicate: c_acctbal > BLOOM_BAL


def _bloom_words(n_members: int) -> int:
    """COUNT-DERIVED filter size: words = ceil(10 * n / 63), floored at
    BLOOM_WORDS_MIN — bits scale with MEMBERSHIP (that is how Bloom
    filters size), never with the probe corpus. The same lesson as the
    count-derived SemDeDup codebook: a fixed 4032-bit filter measured
    67% false positives once the member set hit 2,762 keys (saturated
    at 87% fill); derived sizing holds the fill ratio — and the FP rate
    — roughly constant at every SF. Integer math, mirrored verbatim as
    a scalar subquery in the oracle."""
    return max(BLOOM_WORDS_MIN, (BLOOM_BITS_PER_KEY * n_members + 62) // 63)


def _bloom_bits(df: DataFrame, key: F.Column, words: int) -> DataFrame:
    """(key, word, pos) for each of the BLOOM_K hash bits of ``key`` —
    shared by the build and probe sides so both use identical bits."""
    m = BLOOM_WORD_BITS * words
    return df.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    (
                        hash60(F.concat(F.lit(f"{j}:"), key.cast("string")))
                        % m
                    )
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("bit"),
    ).select(
        "key",
        (F.col("bit") / BLOOM_WORD_BITS).cast("bigint").alias("word"),
        (F.col("bit") % BLOOM_WORD_BITS).cast("int").alias("pos"),
    )


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join with an exact false-positive audit — the
    MEMBERSHIP sketch completing the family (CMS = counts, HLL =
    distincts, histogram = quantiles): build a count-sized (~10 bits per
    member, 3 hashes) Bloom filter over the member keys (customers with
    acctbal > BLOOM_BAL), probe every distinct order custkey against it,
    and report pass / exact / false-positive counts with the FP rate in
    basis points.

    Why a table of longs: the filter is ceil(10n/63) 63-bit words built
    by ONE bit_or aggregate — a MERGEABLE state bounded by MEMBERSHIP
    count (per-partition bitmaps OR together), so at 100 TB the build is
    map-side partials into a small reduce frame and the probe joins a
    broadcast word table; the exact semi-join it replaces shuffles the
    fact table. 63 bits per word keeps bit 63 clear so every shift/test
    stays on positive longs in both engines. No false negatives by
    construction (pinned); false positives are the sketch's documented
    contract, measured here instead of assumed — and held roughly
    constant across SFs by the count-derived sizing (see _bloom_words
    for the saturation measurement that forced it)."""
    cust = load_split(spark, sf_dir, "customer")
    orders = load_split(spark, sf_dir, "orders")
    members = cust.filter(F.col("c_acctbal") > BLOOM_BAL).select(
        F.col("c_custkey").alias("key")
    )
    words = _bloom_words(members.count())
    bloom = (
        _bloom_bits(members, F.col("key"), words)
        .groupBy("word")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), pos))"
            ).alias("bm")
        )
    )
    keys = orders.select(F.col("o_custkey").alias("key")).distinct()
    checked = (
        _bloom_bits(keys, F.col("key"), words)
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "key",
            F.coalesce(
                F.expr("shiftright(bm, pos) & CAST(1 AS BIGINT)"), F.lit(0)
            ).alias("bitset"),
        )
    )
    passed = (
        checked.groupBy("key")
        .agg(F.min("bitset").alias("allset"))
        .filter(F.col("allset") == 1)
        .select("key", F.lit(1).alias("p"))
    )
    flags = keys.join(F.broadcast(passed), "key", "left").join(
        F.broadcast(members.withColumn("e", F.lit(1))), "key", "left"
    )
    return (
        flags.agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum(F.coalesce("e", F.lit(0))).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce("p", F.lit(0))).cast("bigint").alias("n_pass"),
        )
        .select(
            "n_keys",
            "n_exact",
            "n_pass",
            (F.col("n_pass") - F.col("n_exact"))
            .cast("bigint")
            .alias("n_false_pos"),
            F.expr(
                "CAST((10000 * (n_pass - n_exact))"
                " DIV GREATEST(1, n_keys - n_exact) AS BIGINT)"
            ).alias("fp_bp"),
        )
    )


# ------------------------------------------------------ hash-seeded SemDeDup


def q_semdedup_assign_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded quality audit of the bucketed assignment: on the same
    deterministic id-hash sample q_semdedup_sampled uses (cost
    ~constant at ANY corpus size), assign every sample vector to its
    nearest seed both EXHAUSTIVELY (the ground truth) and via the
    hyperplane-BUCKETED scale path, and report the agreement rate in
    basis points — the embedding-side analogue of q_lsh_eval's
    detector-vs-truth audit. Disagreements are the bucketed path's
    recall contract (a vector's best seed can live in a neighboring
    bucket); this query measures that contract instead of assuming it.

    One row: (n_sample, n_agree, agree_bp). Both assignment legs,
    the sample predicate, and the seed rank are mirrored verbatim in
    the oracle."""
    vecs = _vec(spark, sf_dir)
    k_mod = max(1, vecs.count() // SEM_SAMPLE_TARGET)
    sample = vecs.filter(
        hash60(F.col("vec_id").cast("string")) % k_mod == 0
    ).withColumn("nrm", S.norm(F.col("v")))
    n_clusters = max(SEM_MIN_CLUSTERS, sample.count() // SEM_ROWS_PER_CLUSTER)
    seeds = (
        sample.orderBy(F.col("vec_id").asc())
        .limit(n_clusters)
        .select(F.col("vec_id").alias("cluster"), F.col("v").alias("sv"))
    )
    ex = S.assign_exhaustive(sample, seeds).select(
        "vec_id", F.col("cluster").alias("c_exact")
    )
    bk = S.assign_bucketed_seeds(sample, seeds).select(
        "vec_id", F.col("cluster").alias("c_bucketed")
    )
    both = ex.join(bk, "vec_id")
    return both.agg(
        F.count("*").cast("bigint").alias("n_sample"),
        F.sum((F.col("c_exact") == F.col("c_bucketed")).cast("int"))
        .cast("bigint")
        .alias("n_agree"),
    ).withColumn(
        "agree_bp", F.expr("CAST((10000 * n_agree) DIV n_sample AS BIGINT)")
    )


# ------------------------------------------------------------ SCD2 intervals


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history construction from an
    append-only change stream: per user, collapse consecutive identical
    event_type rows to change points, then stitch [valid_from, valid_to)
    validity intervals (valid_to = next change's timestamp, NULL for the
    current row) with a version counter — the standard warehouse shape
    for as-of attribute lookups, complementing q_cdc_latest (latest-only
    compaction) and q_asof_join (interval consumption).

    Determinism: event-time order with event_id tiebreak everywhere.
    Scale shape: ONE shuffle on user_id that BOTH window passes reuse
    (same partitioning — Catalyst plans a single exchange); the change
    filter shrinks rows between the lag pass and the lead/version pass.
    No join, no product; interval stitching is window-local per user."""
    events = load_split(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = events.withColumn(
        "prev_type", F.lag("event_type").over(w)
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


# ------------------------------------------------------ histogram quantiles

HQ_BIN_W = 10_000  # o_totalprice bin width -> ~50 bins over the TPC-H range
HQ_PCTS = (50, 90, 99)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles: approximate p50/p90/p99 of order
    totalprice from a fixed-width integer-bin histogram — the mergeable
    alternative to a global order statistic (exact percentile needs a
    full sort; the histogram is a bounded-size aggregate that partial
    map-side combine reduces to ~50 rows regardless of corpus size,
    like the CMS and HLL sketches already on the surface).

    Contract: for each pct, the FIRST bin whose cumulative count crosses
    ceil(pct * n / 100) — the exact k-th value provably lies inside that
    bin, so the upper bound errs by at most one bin width (pinned by
    pytest against the true order statistic). The crossing test is the
    integer form 100 * cum >= pct * n (exact: cum is integral).

    Scale shape: one scan -> bin -> count aggregate; the cumulative and
    total windows run over the ~50-row bin frame (bounded by
    value-range / bin-width, CONSTANT in corpus size — a single
    partition of 50 rows is free); pct fan-out is a map-only explode on
    those 50 rows. No global data sort, no product, no corpus-sized
    shuffle beyond the histogram aggregate."""
    ords = load_split(spark, sf_dir, "orders")
    hist = (
        ords.select(
            F.floor(F.col("o_totalprice") / HQ_BIN_W).cast("bigint").alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = (
        hist.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn(
            "pct", F.explode(F.array(*[F.lit(p) for p in HQ_PCTS]))
        )
        .filter(F.lit(100) * F.col("cum") >= F.col("pct") * F.col("n"))
    )
    return cand.groupBy("pct").agg(
        F.min("b").cast("bigint").alias("bin"),
        ((F.min("b") + 1) * HQ_BIN_W).cast("bigint").alias("q_upper"),
        F.min("n").cast("bigint").alias("n_rows"),
    ).select(F.col("pct").cast("bigint").alias("pct"), "bin", "q_upper", "n_rows")


# ----------------------------------------------------------- dataset card

def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation card (Datasheets-for-Datasets shape, Gebru et
    al. 2021): the summary a mix designer reads before weighting a
    source — doc count, exact-duplicate rate (md5 digest collapse, in
    basis points), token budget, language count, and the dominant
    language with its share.

    Scale shape: two hash aggregates keyed by source and (source, lang)
    — both map-side-combining — plus a window over the source x lang
    frame (|sources| x |langs| rows, tiny at any corpus size) and one
    join back on source. No corpus-sized shuffle beyond the two
    aggregates."""
    docs = load_split(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique"),
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("tokens_sum"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    top = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("lc"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("lc").desc(), F.col("lang")
                )
            ),
        )
        .filter(F.col("r") == 1)
        .select("source", F.col("lang").alias("top_lang"), "lc")
    )
    return base.join(top, "source").select(
        "source",
        "n_docs",
        F.expr(
            "CAST((10000 * (n_docs - n_unique)) DIV n_docs AS BIGINT)"
        ).alias("exact_dup_bp"),
        "tokens_sum",
        "n_langs",
        "top_lang",
        F.expr("CAST((10000 * lc) DIV n_docs AS BIGINT)").alias("top_lang_bp"),
    )


QUERIES = {
    "q_hybrid_rrf": q_hybrid_rrf,
    "q_heavy_hitters": q_heavy_hitters,
    "q_sorted_neighborhood": q_sorted_neighborhood,
    "q_substring_spans": q_substring_spans,
    "q_substring_strip": q_substring_strip,
    "q_domain_cap": q_domain_cap,
    "q_dataset_card": q_dataset_card,
    "q_hist_quantiles": q_hist_quantiles,
    "q_scd2_intervals": q_scd2_intervals,
    "q_semdedup_assign_agreement": q_semdedup_assign_agreement,
    "q_bloom_semijoin": q_bloom_semijoin,
}

# ---------------------------------------------------------------- oracles

_LEX_LEG = f"""
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM (__BM25__)
  QUALIFY lex_rank <= {RRF_POOL}
"""

_DENSE_LEG = f"""
  WITH vecs AS ({_VEC_CTE}),
  q AS (SELECT v AS qv FROM vecs WHERE vec_id = {RRF_QUERY_VEC_ID})
  SELECT c.vec_id AS doc_id,
         ROW_NUMBER() OVER (
           ORDER BY ROUND({_cosine_sql("c.v", "q.qv")}, 4) DESC, c.vec_id
         ) AS vec_rank
  FROM vecs c CROSS JOIN q
  WHERE c.vec_id <> {RRF_QUERY_VEC_ID}
  QUALIFY vec_rank <= {RRF_POOL}
"""


def _rrf_sql(bm25_sql: str) -> str:
    lex = _LEX_LEG.replace("__BM25__", bm25_sql)
    return f"""
        WITH lex AS ({lex}), dense AS ({_DENSE_LEG})
        SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
               CAST(lex.lex_rank AS BIGINT) AS lex_rank,
               CAST(dense.vec_rank AS BIGINT) AS vec_rank,
               ROUND(
                 (CASE WHEN lex.lex_rank IS NOT NULL
                       THEN 1.0 / ({RRF_K}.0 + CAST(lex.lex_rank AS DOUBLE))
                       ELSE 0.0 END)
                 + (CASE WHEN dense.vec_rank IS NOT NULL
                         THEN 1.0 / ({RRF_K}.0 + CAST(dense.vec_rank AS DOUBLE))
                         ELSE 0.0 END), 6) AS rrf
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    """


def _cms_bucket_sql(j: int) -> str:
    """Oracle expression for CMS row j's bucket of ``tok``, mirroring the
    Spark-side hash60(concat('j:', tok)) % CMS_WIDTH exactly."""
    return f"({hash60_sql(chr(39) + str(j) + ':' + chr(39) + ' || tok')}) % {CMS_WIDTH}"


_HH_CELLS = " UNION ALL ".join(
    f"SELECT {j} AS j, {_cms_bucket_sql(j)} AS bucket, tok FROM toks"
    for j in range(CMS_DEPTH)
)

_HH_SQL = f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ), cells AS (
      SELECT j, bucket, COUNT(*) AS cnt
      FROM ({_HH_CELLS})
      GROUP BY j, bucket
    ), top AS (
      SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok
      QUALIFY ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, tok) <= {HH_TOP}
    ), probes AS (
      {" UNION ALL ".join(
        f"SELECT tok, exact_cnt, {j} AS j, {_cms_bucket_sql(j)} AS bucket FROM top"
        for j in range(CMS_DEPTH)
      )}
    )
    SELECT p.tok, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
    GROUP BY p.tok, p.exact_cnt
"""

_SNM_SQL = f"""
    WITH sh AS (
      SELECT doc_id,
             substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                       1, {SNM_KEY_CHARS}) AS k,
             {_SHINGLES} AS s
      FROM documents
    ), ranked AS (
      SELECT doc_id, k, s,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id) AS rn
      FROM sh
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (10000 * len(list_intersect(a.s, b.s)))
               // (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               AS jaccard_bp
      FROM ranked a JOIN ranked b
        ON a.k = b.k AND b.rn - a.rn BETWEEN 1 AND {SNM_WINDOW}
      WHERE len(list_intersect(a.s, b.s)) > 0
    )
    SELECT doc_a, doc_b, CAST(jaccard_bp AS BIGINT) AS jaccard_bp
    FROM pairs WHERE jaccard_bp >= {SNM_THRESHOLD_BP}
"""


_SPAN_GRAM = hash60_sql(f"array_to_string(toks[i:i+{SPAN_K - 1}], ' ')")

# shared CTE chain: tokens -> overlapping-gram hashes -> duplicated
# windows -> lag-merged maximal spans (mirrors duplicated_token_spans)
_SPAN_CTES = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, i - 1 AS pos, {_SPAN_GRAM} AS h
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SPAN_K} + 1)) AS i
            FROM t)
    ),
    freq AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) > 1),
    dup AS (SELECT doc_id, pos FROM g JOIN freq USING (h)),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > {SPAN_K}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM (SELECT doc_id, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup)
    ),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {SPAN_K} AS e
      FROM isl GROUP BY doc_id, island
    )"""

_SPANS_SQL = f"""
    WITH {_SPAN_CTES},
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s) AS dup_toks
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(p.dup_toks, 0) AS BIGINT) AS dup_tokens,
           CAST(CASE WHEN len(t.toks) > 0
                     THEN (10000 * COALESCE(p.dup_toks, 0)) // len(t.toks)
                     ELSE 0 END AS BIGINT) AS dup_bp
    FROM documents d
    JOIN t USING (doc_id)
    LEFT JOIN per_doc p USING (doc_id)
"""

_STRIP_SQL = f"""
    WITH {_SPAN_CTES},
    tok AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS i
            FROM t)
    ),
    kept AS (
      SELECT tk.doc_id, tk.pos, tk.tok
      FROM tok tk ANTI JOIN spans s
        ON tk.doc_id = s.doc_id AND tk.pos >= s.s AND tk.pos < s.e
    ),
    per_doc AS (
      SELECT doc_id,
             array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.clean_text, '') AS clean_text,
           CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(t.toks) - COALESCE(p.n_kept, 0) AS BIGINT) AS n_removed
    FROM documents d
    JOIN t USING (doc_id)
    LEFT JOIN per_doc p USING (doc_id)
"""

_CAP_SQL = f"""
    WITH r AS (
      SELECT doc_id, source, len({_TOKS_RAW}) AS n_toks,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {hash60_sql("CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {CAP_N} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rn <= {CAP_N} THEN n_toks ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(CASE WHEN SUM(n_toks) > 0
                     THEN (10000 * SUM(CASE WHEN rn <= {CAP_N}
                                            THEN n_toks ELSE 0 END))
                          // SUM(n_toks)
                     ELSE 0 END AS BIGINT) AS kept_bp
    FROM r GROUP BY source
"""

_SCD2_SQL = """
    WITH chg AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS version
    FROM chg
    WHERE prev_type IS NULL OR prev_type <> event_type
"""

# count-derived filter size, mirroring _bloom_words as a scalar subquery
_BLOOM_WORDS_SQL = (
    f"GREATEST({BLOOM_WORDS_MIN}, "
    f"({BLOOM_BITS_PER_KEY} * (SELECT COUNT(*) FROM members) + 62) // 63)"
)
_BLOOM_M_SQL = f"({BLOOM_WORD_BITS} * {_BLOOM_WORDS_SQL})"


def _bloom_bits_sql(src: str) -> str:
    """(key, bit) rows for the BLOOM_K hashes — mirrors _bloom_bits."""
    return " UNION ALL ".join(
        f"SELECT key, ({hash60_sql(chr(39) + str(j) + ':' + chr(39) + ' || CAST(key AS VARCHAR)')}) % {_BLOOM_M_SQL} AS bit FROM {src}"
        for j in range(BLOOM_K)
    )


_BLOOM_SQL = f"""
WITH members AS (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > {BLOOM_BAL}
),
probe AS (SELECT DISTINCT o_custkey AS key FROM orders),
bloom AS (
  SELECT bit // {BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % {BLOOM_WORD_BITS} AS INT))
           AS bm
  FROM ({_bloom_bits_sql("members")}) GROUP BY 1
),
checked AS (
  SELECT p.key,
         COALESCE((b.bm >> CAST(p.bit % {BLOOM_WORD_BITS} AS INT))
                  & CAST(1 AS BIGINT), 0) AS bitset
  FROM (SELECT key, bit, bit // {BLOOM_WORD_BITS} AS word
        FROM ({_bloom_bits_sql("probe")})) p
  LEFT JOIN bloom b USING (word)
),
passed AS (SELECT key FROM checked GROUP BY key HAVING MIN(bitset) = 1),
exact AS (SELECT key FROM probe WHERE key IN (SELECT key FROM members)),
c AS (
  SELECT (SELECT COUNT(*) FROM probe) AS n_keys,
         (SELECT COUNT(*) FROM exact) AS n_exact,
         (SELECT COUNT(*) FROM passed) AS n_pass
)
SELECT CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n_pass - n_exact AS BIGINT) AS n_false_pos,
       CAST((10000 * (n_pass - n_exact))
            // GREATEST(1, n_keys - n_exact) AS BIGINT) AS fp_bp
FROM c
"""

_AGREE_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
sample AS (
  SELECT vec_id, v FROM vecs
  WHERE {_sample_pred_sql("vec_id", SEM_SAMPLE_TARGET)}
),
seeds AS (
  SELECT vec_id AS cluster, v AS sv FROM sample
  ORDER BY vec_id
  LIMIT GREATEST({SEM_MIN_CLUSTERS},
                 (SELECT COUNT(*) FROM sample) // {SEM_ROWS_PER_CLUSTER})
),
ex AS (
  SELECT vec_id, cluster AS c_exact FROM (
    SELECT sample.vec_id, seeds.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY sample.vec_id
             ORDER BY {_cosine_sql("sample.v", "seeds.sv")} DESC,
                      seeds.cluster ASC
           ) AS rn
    FROM sample CROSS JOIN seeds
  ) WHERE rn = 1
),
vb AS (SELECT vec_id, v, {{BUCKET_V}} AS bucket FROM sample),
sb AS (SELECT cluster, sv, {{BUCKET_SV}} AS sbucket FROM seeds),
matched AS (
  SELECT vb.vec_id, s.cluster, {_cosine_sql("vb.v", "s.sv")} AS sim
  FROM vb JOIN sb s ON s.sbucket = vb.bucket
),
orphan AS (
  SELECT vb.vec_id, s.cluster, {_cosine_sql("vb.v", "s.sv")} AS sim
  FROM vb CROSS JOIN sb s
  WHERE vb.bucket NOT IN (SELECT sbucket FROM sb)
),
bk AS (
  SELECT vec_id, cluster AS c_bucketed FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cluster ASC) AS rn
    FROM (SELECT * FROM matched UNION ALL SELECT * FROM orphan)
  ) WHERE rn = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
       CAST(SUM(CASE WHEN c_exact = c_bucketed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST((10000 * SUM(CASE WHEN c_exact = c_bucketed THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS agree_bp
FROM ex JOIN bk USING (vec_id)
""".replace("{BUCKET_V}", _bucket_sql("v")).replace(
    "{BUCKET_SV}", _bucket_sql("sv")
)

_HQ_SQL = f"""
    WITH hist AS (
      SELECT CAST(floor(o_totalprice / {HQ_BIN_W}) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT b,
             SUM(c) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER () AS n
      FROM hist
    ), cand AS (
      SELECT p.pct, b, n
      FROM cum, (VALUES ({HQ_PCTS[0]}), ({HQ_PCTS[1]}), ({HQ_PCTS[2]}))
             AS p(pct)
      WHERE 100 * cum >= p.pct * n
    )
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(MIN(b) AS BIGINT) AS bin,
           CAST((MIN(b) + 1) * {HQ_BIN_W} AS BIGINT) AS q_upper,
           CAST(MIN(n) AS BIGINT) AS n_rows
    FROM cand GROUP BY pct
"""

_CARD_SQL = f"""
    WITH base AS (
      SELECT source, COUNT(*) AS n_docs,
             COUNT(DISTINCT md5(text)) AS n_unique,
             SUM(len({_TOKS_RAW})) AS tokens_sum,
             COUNT(DISTINCT lang) AS n_langs
      FROM documents GROUP BY source
    ), top AS (
      SELECT source, lang AS top_lang, COUNT(*) AS lc,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY COUNT(*) DESC, lang
             ) AS r
      FROM documents GROUP BY source, lang
      QUALIFY r = 1
    )
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST((10000 * (b.n_docs - b.n_unique)) // b.n_docs AS BIGINT)
             AS exact_dup_bp,
           CAST(b.tokens_sum AS BIGINT) AS tokens_sum,
           CAST(b.n_langs AS BIGINT) AS n_langs,
           t.top_lang,
           CAST((10000 * t.lc) // b.n_docs AS BIGINT) AS top_lang_bp
    FROM base b JOIN top t USING (source)
"""


def _collect_oracles() -> dict[str, str]:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.search_queries import (
        ORACLES as _SEARCH_ORACLES,
    )

    return {
        "q_hybrid_rrf": _rrf_sql(_SEARCH_ORACLES["q_bm25"]),
        "q_heavy_hitters": _HH_SQL,
        "q_sorted_neighborhood": _SNM_SQL,
        "q_substring_spans": _SPANS_SQL,
        "q_substring_strip": _STRIP_SQL,
        "q_domain_cap": _CAP_SQL,
        "q_dataset_card": _CARD_SQL,
        "q_hist_quantiles": _HQ_SQL,
        "q_scd2_intervals": _SCD2_SQL,
        "q_semdedup_assign_agreement": _AGREE_SQL,
        "q_bloom_semijoin": _BLOOM_SQL,
    }


ORACLES = _collect_oracles()
