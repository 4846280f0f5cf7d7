"""Corpus-level curation and layout queries (round-8 tranche).

Built and staged in round 7 (as plans/staged_r8.py) with the driver's
own compare protocol applied pre-declaration
(tests/test_corpus_queries.py), PROMOTED into the declared surface in
round 8 (plans/__init__.py _HEAD) after the round-8 ADVICE fixes:
q_kmv_overlap's exact-intersection leg became a left join + COALESCE so
fully-disjoint source pairs report exact_jaccard_bp = 0 instead of
vanishing, and q_weighted_reservoir ranks/emits its coarse integer key
floor(ln(u)/w * 1e6) on both engines, closing the 1-ulp JVM-vs-libm
log() exposure.

Contents — ops a crawl-curation / data-layout stack needs that the
surface otherwise lacks:

- ``q_url_canonical``: URL canonicalization + per-domain canonical-dup
  accounting — the crawl-side exact-dedup key (scheme/host case, www,
  default ports, tracking params, fragments, trailing slashes). URLs
  are constructed deterministically from doc fields (the fixtures carry
  no URL column), the same injected-input pattern q_pii_redact uses;
  the canonicalizer is the real operator.
- ``q_weighted_reservoir``: Efraimidis-Spirakis A-ES weighted sampling
  without replacement (key = ln(u)/w, top-k) — the one-pass, mergeable
  weighted sampler (distributed top-k of per-row keys; never a global
  sort).
- ``q_layout_skipping``: Z-order (Morton) interleaved layout vs a
  single-column linear layout, with per-file min/max zone maps and a
  measured file-skipping audit for a 2-D predicate — the
  OPTIMIZE-ZORDER data-layout shape that turns multi-column selective
  scans sub-linear at rest.
- ``q_linear_quality``: feature-hashed linear classifier scoring
  (the fastText-style quality-filter shape: hashed unigram+bigram
  features, fixed deterministic weight table, integer score) — the
  model-based quality gate as pure expressions; swap the hash-derived
  weights for trained ones and the plan is production.
- ``q_lsh_tuning``: MinHash banding sensitivity sweep — the SAME 64-perm
  portable signature banded at (32x2), (16x4), (8x8); per config:
  candidate volume, exact-verified true pairs, precision — the standing
  audit that picks band/row for a drifting corpus (S-curve tradeoff
  measured, not assumed).
- ``q_time_decay``: half-life-decayed activity scores per event type
  with EXACT integer arithmetic (weight_bp = 10000 >> (age_days DIV
  half_life) — halving IS a right shift at day granularity), the
  freshness-weighted rollup pattern that avoids float-order
  nondeterminism entirely.
- ``q_media_phash``: perceptual image dedup — average-hash (aHash) of
  every document's image payload through the REAL PPM decoder
  (operators.multimodal.decode_image inside Arrow mapInPandas, the
  q_media_decode framing), then hash-bucketed duplicate groups. The
  multimodal analogue of exact text dedup: one decode pass, one keyed
  shuffle, never pairwise pixels.
- ``q_kmv_overlap``: KMV/theta-style k-minimum-values sketches per
  source over word 3-grams, pairwise UNION/INTERSECTION/Jaccard
  estimates via the merged k-th minimum + inclusion-exclusion, audited
  against exact values — the mergeable sketch for SET OVERLAP between
  partitions (the operation HLL famously cannot intersect), completing
  the family: CMS counts, HLL distincts, histogram quantiles, Bloom
  membership, KMV overlap.
- ``q_audio_fingerprint``: energy-profile fingerprint of every
  document's audio payload through the REAL RIFF/WAVE PCM decoder
  (q_media_audio_stats framing): windowed |sample| energies, bit w set
  iff the window is above the clip mean (integer form) — the audio
  analogue of q_media_phash, hash-bucketed duplicate clips by one
  keyed shuffle.
- ``q_mmr_diversify``: Maximal Marginal Relevance re-ranking
  (Carbonell & Goldstein, SIGIR'98) of a cosine-retrieval shortlist —
  greedy lambda*rel - (1-lambda)*max-sim-to-selected selection, the
  standard result-diversification step after ANN/hybrid retrieval.
  Corpus work is ONE cosine scan (the shortlist top-k); the greedy
  loop runs over the bounded 20-row shortlist, unrolled in the oracle
  as fixed CTE steps.
- ``q_ngram_novelty``: per-source novelty profile — what fraction of a
  source's distinct 5-gram shingles appears in NO other source — the
  mix-design signal that says which sources bring unique content vs
  re-serve shared boilerplate (complements q_dataset_card's dup rate
  and q_dup_source_matrix's pairwise counts).
- ``q_join_size_est``: join-cardinality estimation from CMS sketches —
  |A join B on k| estimated as min over hash rows of the inner product
  of the two sides' count-min rows (AMS/CMS inner-product estimate,
  Cormode & Muthukrishnan '05), audited against the exact join count.
  The optimizer-statistics shape: two fixed-size mergeable sketches
  meet in a 2048-cell product instead of a shuffle — and the estimate
  is an OVERESTIMATE by construction, pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    hash60,
    hash60_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
    _SHINGLES,
    JACCARD_THRESHOLD_BP,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    _cosine_sql,
    _vec,
    _VEC_CTE,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import _TOKS
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load_split

# ------------------------------------------------------------- URL canonical

URL_VARIANTS = 4  # surface forms per base URL (doc_id DIV 4 = base)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _synth_url(doc_id):
    """Deterministic synthetic URL with doc_id%4-selected surface noise:
    scheme/host case, www., default port, trailing slash, tracking
    params, fragment. Four consecutive doc_ids share one canonical URL
    (host and path derive from the BASE id, so only the surface noise
    differs within a group)."""
    base = F.expr(f"CAST(doc_id DIV {URL_VARIANTS} AS BIGINT)")
    v = doc_id % URL_VARIANTS
    host_std = F.concat(
        F.lit("www.s"),
        (base % 20).cast("string"),
        F.lit(".d"),
        (base % 5).cast("string"),
        F.lit(".com"),
    )
    scheme = F.when(v == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    host = F.when(v == 1, F.upper(host_std)).otherwise(host_std)
    port = F.when(v == 2, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/docs/"),
        base.cast("string"),
        F.when(v == 3, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        v == 0,
        F.concat(F.lit("?utm_source=feed&id="), (base % 97).cast("string"), F.lit("&utm_medium=x")),
    ).when(
        v == 1,
        F.concat(F.lit("?id="), (base % 97).cast("string"), F.lit("&fbclid=abc")),
    ).otherwise(F.concat(F.lit("?id="), (base % 97).cast("string")))
    frag = F.when(v == 2, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


_URL_RE = r"^([A-Za-z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url(url):
    """Canonicalize a URL column with pure built-in expressions:
    lowercase scheme+host, strip leading www., drop default :80/:443,
    strip trailing slash, drop fragment, drop utm_*/fbclid/gclid params,
    sort surviving params. Mirrored verbatim in the oracle."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _URL_RE, 2)), r"^www\.", ""
    )
    port = F.regexp_extract(url, _URL_RE, 3)
    keep_port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_replace(F.regexp_extract(url, _URL_RE, 4), r"/$", "")
    rawq = F.regexp_extract(url, _URL_RE, 5)  # leading '?' or ''
    params = F.filter(
        F.split(F.regexp_replace(rawq, r"^\?", ""), "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid")
        & ~p.startswith("gclid"),
    )
    canon_q = F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, keep_port, path, canon_q)


def registrable_domain(host):
    """Last two labels of the host — the eTLD+1 under the demo's
    single-level public-suffix assumption (a real deployment swaps in a
    PSL table join; the rollup shape is identical)."""
    parts = F.split(host, r"\.")
    return F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per registrable domain: raw URL count, canonical-URL count, and
    the dup rate the canonicalizer recovers (bp). Construction is
    map-only expressions; the rollup is one keyed aggregate over
    (domain, canonical) then one over domain — both map-side-combining.
    At 100 TB this is the crawl frontier's exact-dedup key computation:
    linear, no joins, no state."""
    docs = load_split(spark, sf_dir, "documents")
    url = _synth_url(F.col("doc_id"))
    canon = canonical_url(url)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _URL_RE, 2)), r"^www\.", ""
    )
    per_canon = (
        docs.select(
            registrable_domain(host).alias("domain"), canon.alias("curl")
        )
        .groupBy("domain", "curl")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        per_canon.groupBy("domain")
        .agg(
            F.sum("n").cast("bigint").alias("n_urls"),
            F.count("*").cast("bigint").alias("n_canonical"),
        )
        .withColumn(
            "dup_bp",
            F.expr("CAST((10000 * (n_urls - n_canonical)) DIV n_urls AS BIGINT)"),
        )
    )


# ------------------------------------------------------- weighted reservoir

RESERVOIR_K = 100


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement:
    every doc draws u = (hash60(doc_id)+1)/2^60 in (0,1] and keys
    ln(u)/w with w = n_chars; the k largest keys are exactly a weighted
    sample without replacement (Efraimidis & Spirakis, IPL 2006 — the
    u^(1/w) rule under the monotone ln transform). Deterministic: u is
    the portable md5 hash, not a RNG.

    Scale shape: one scan + a distributed TakeOrdered(k) — the sampler
    is one-pass and MERGEABLE (per-partition top-k unions exactly, the
    property that lets 100 TB sample in one map round + a k-row reduce).

    Determinism: keys are ln(u)/w DOUBLES, and JVM Math.log vs DuckDB
    libm log guarantee agreement only to ~1 ulp — ranking raw doubles
    would let a last-ulp disagreement flip adjacent ranks cross-engine.
    So BOTH the ranking and the emitted key use the same coarse integer
    form floor(key * 1e6) (ties broken by doc_id): a flip now needs the
    true key within ~1e-10 relative of a 1e-6 grid boundary, and floor
    (never CAST: Spark truncates toward zero while DuckDB rounds — the
    q_quantize lesson) is the one double->bigint conversion both engines
    agree on.
    """
    docs = load_split(spark, sf_dir, "documents")
    u = (hash60(F.col("doc_id").cast("string")) + 1) / F.lit(float(1 << 60))
    key = F.ln(u) / F.col("n_chars")
    ranked = (
        docs.select(
            "doc_id",
            "n_chars",
            F.floor(key * F.lit(1e6)).cast("bigint").alias("key_e6"),
        )
        .orderBy(F.col("key_e6").desc(), F.col("doc_id").asc())
        .limit(RESERVOIR_K)
    )
    return ranked.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "key_e6",
    )


# ------------------------------------------------------------ z-order layout

Z_BITS = 8          # bits per dimension -> 16-bit z-value
Z_FILE_SHIFT = 10   # z >> shift = file id -> up to 64 z-files
# linear layout: date bucket DIV 4 -> up to 64 files, the SAME file
# count the z >> 10 cut yields — the pruning comparison is fair only at
# equal granularity (a coarser linear layout would understate linear
# pruning for free)
LIN_FILE_DIV = 4
Z_PRED_LO, Z_PRED_HI = 64, 95  # the audited predicate: cx in [64, 95]


def q_layout_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout audit: the same orders table laid out (a) Z-ORDER —
    files cut along the Morton interleave of (custkey bucket, date
    bucket) — vs (b) LINEAR — files cut along date only (the default
    ingest order). For each layout and file: row count, per-file min/max
    zone maps of BOTH dimensions, and whether a custkey-range predicate
    (cx BETWEEN {lo}..{hi}) can SKIP the file on zone maps alone. The
    summary a table optimizer reads: Z-order bounds both dimensions per
    file, so the 2-D-selective scan prunes most files; the linear layout
    leaves every file's custkey range full-width and prunes ~nothing.

    All integer math: bucket = value * 2^B DIV (max+1) via single-row
    broadcast extents; z = bitwise interleave (fixed shifts); file ids
    are z >> shift / datebucket DIV k. One scan, two keyed aggregates —
    at 100 TB this is the zone-map audit you run BEFORE rewriting a
    table, on exactly this plan."""
    orders = load_split(spark, sf_dir, "orders")
    ext = orders.agg(
        F.max("o_custkey").alias("ck_max"),
        F.min(F.to_date("o_orderdate")).alias("d_min"),
        F.max(F.to_date("o_orderdate")).alias("d_max"),
    )
    # integer DIV, never double-divide-then-cast: the double quotient can
    # round up across an integer boundary where exact integer division
    # floors, and Spark/DuckDB disagree on double->bigint casts anyway
    b = orders.join(F.broadcast(ext)).select(
        F.expr(
            f"CAST((o_custkey * {1 << Z_BITS}) DIV (ck_max + 1) AS BIGINT)"
        ).alias("cx"),
        F.expr(
            f"CAST((datediff(to_date(o_orderdate), d_min) * {1 << Z_BITS})"
            " DIV (datediff(d_max, d_min) + 1) AS BIGINT)"
        ).alias("dy"),
    )
    zexpr = None
    for i in range(Z_BITS):
        bit_c = F.shiftleft(F.shiftright(F.col("cx"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        bit_d = F.shiftleft(F.shiftright(F.col("dy"), i).bitwiseAND(F.lit(1)), 2 * i)
        zexpr = bit_c + bit_d if zexpr is None else zexpr + bit_c + bit_d
    z = b.withColumn("file_id", F.shiftright(zexpr, Z_FILE_SHIFT).cast("bigint"))
    lin = b.withColumn(
        "file_id", F.expr(f"CAST(dy DIV {LIN_FILE_DIV} AS BIGINT)")
    )

    def _files(df: DataFrame, layout: str) -> DataFrame:
        return df.groupBy("file_id").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("cx").cast("bigint").alias("cx_min"),
            F.max("cx").cast("bigint").alias("cx_max"),
            F.min("dy").cast("bigint").alias("dy_min"),
            F.max("dy").cast("bigint").alias("dy_max"),
        ).select(
            F.lit(layout).alias("layout"),
            "file_id",
            "n_rows",
            "cx_min",
            "cx_max",
            "dy_min",
            "dy_max",
            (
                (F.col("cx_max") < Z_PRED_LO) | (F.col("cx_min") > Z_PRED_HI)
            ).alias("prunable"),
        )

    return _files(z, "zorder").unionByName(_files(lin, "linear"))


# ---------------------------------------------------------- linear quality

LQ_DIMS = 1024


def q_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed linear text-quality scoring (the fastText-style
    classifier SHAPE: Joulin et al. 2016 — bag of hashed unigram+bigram
    features x a weight vector; here the weights are a fixed
    deterministic table derived from the dim hash, centered on 0, so the
    plumbing is fully oracle-checkable; production swaps in trained
    weights via the same broadcast join). Per doc: feature count and
    integer score = SUM(weight[dim]) DIV n_feats over the doc's DISTINCT
    feature dims.

    Scale shape: tokens and bigrams explode row-locally, dims hash
    row-locally, the weight 'table' is a pure expression (no lookup
    join at all), and the per-doc aggregate is map-side combining — one
    scan, one keyed exchange. The fastText trick (hashing trick, no
    vocabulary) is exactly what makes this viable at 100 TB."""
    docs = load_split(spark, sf_dir, "documents")
    # tokenize ONCE into an aliased column — Catalyst inlines shared
    # projections into every reference rather than CSE-ing them (the
    # with_minhash_signature lesson), so repeating the regex split per
    # use would pay it 5x per row. Bigram slice lengths are size-1 for
    # BOTH sides, guarded: slice with a negative length is a runtime
    # error on a zero-token doc (empty/whitespace text — routine in
    # crawl curation); the empty branch drops the doc exactly like the
    # oracle's empty unnest.
    toked = docs.select(
        "doc_id",
        F.expr("filter(split(trim(lower(text)), '\\\\s+'), t -> t <> '')").alias(
            "ts"
        ),
    )
    grams = F.expr(
        "CASE WHEN size(ts) >= 2 THEN"
        " concat(ts, zip_with(slice(ts, 1, size(ts) - 1),"
        "                     slice(ts, 2, size(ts) - 1),"
        "                     (a, b) -> concat(a, ' ', b)))"
        " ELSE ts END"
    )
    feat = (
        toked.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", (hash60(F.col("g")) % LQ_DIMS).alias("dim"))
        .distinct()
    )
    w = (hash60(F.concat(F.lit("w:"), F.col("dim").cast("string"))) % 2001) - 1000
    return (
        feat.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("w").cast("bigint").alias("w_sum"),
        )
        .withColumn("score", F.expr("CAST(w_sum DIV n_feats AS BIGINT)"))
    )


# -------------------------------------------------------------- LSH tuning

LSH_CONFIGS = ((32, 2), (16, 4), (8, 8))  # (bands, rows): b*r = N_PERM = 64


def q_lsh_tuning(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Band/row sensitivity sweep over ONE shared 64-permutation portable
    signature: for each (bands, rows) config, the banded candidate pairs
    are generated (same pairs_within_buckets shape as the production
    detector), exact-verified against true Jaccard, and summarized as
    (n_candidates, n_true, precision_bp). More rows per band = sharper
    S-curve = fewer, more precise candidates — this query MEASURES that
    tradeoff on the live corpus instead of assuming the textbook curve,
    which is how band/row gets re-picked when corpus similarity drifts.

    Scale shape (r12 optimization, guide §2.4 — remove shuffles
    outright): the three configs are NESTED — with b*r = 64 fixed, a
    (16, 4) band j collides iff (32, 2) bands 2j and 2j+1 BOTH collide
    (bkey is the '_'-joined decimal minhash values, so concat equality
    IS componentwise equality), and an (8, 8) band j collides iff the
    four finest bands 4j..4j+3 all do. So ONE banding pass at the
    finest config, aggregated into a per-pair 32-bit band-collision
    bitmask, derives every config's candidate set exactly: config
    (b, r) with k = r/2 finest bands per coarse band holds the pair iff
    the mask has k consecutive set bits at some k-aligned offset — a
    constant-folded bit test. The exact-Jaccard verify likewise runs
    ONCE over the finest (superset) candidate frame, and each config's
    n_true is the bit-test-filtered count (verified ∩ candidates(b, r)
    == verify(candidates(b, r)) because the sets nest). The signature
    fold runs once (persisted), the banding shuffle runs once (was 3x),
    the verify joins run once (was 3x); every frame after the banding
    shuffle is candidate-bounded — never corpus^2."""
    docs = load_split(spark, sf_dir, "documents")
    sh = D.with_shingles(docs).select("doc_id", "shingles")
    sig = D.with_minhash_signature(
        sh.filter(F.size("shingles") > 0), portable=True
    ).persist()
    if cache_registry is not None:
        cache_registry.append(sig)
    f_bands, f_rows = LSH_CONFIGS[0]  # finest config: most bands, fewest rows
    band_arr = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    "_", *[F.col("mh")[j * f_rows + r] for r in range(f_rows)]
                ).alias("bkey"),
            )
            for j in range(f_bands)
        ]
    )
    exploded = sig.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )
    # One keyed shuffle + in-bucket pair expansion (the pairs_within_buckets
    # shape, band kept): each doc has exactly one bkey per band, so a
    # (id_a, id_b, band) row is emitted at most once — the bit_or needs no
    # pre-distinct. The mask aggregate is candidate-bounded.
    grouped = exploded.groupBy("band", "bkey").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    pair_bands = (
        grouped.filter(F.size("ids") > 1)
        .select(
            "band",
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)), y ->"
                    " struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p"),
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"), "band")
    )
    # persisted: the masked pair frame feeds BOTH the candidate-count agg
    # and the verify leg (Spark shares no common subtrees across branches)
    masked = pair_bands.groupBy("id_a", "id_b").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), band))").alias("bmask")
    ).persist()
    if cache_registry is not None:
        cache_registry.append(masked)

    def _in_config(bands: int, rows: int) -> F.Column:
        # pair is a (bands, rows) candidate iff some k-aligned run of k
        # consecutive finest-band bits is fully set (k = rows / f_rows)
        k = rows // f_rows
        m = F.col("bmask")
        for s in range(1, k):
            m = m.bitwiseAND(F.expr(f"shiftright(bmask, {s})"))
        aligned = sum(1 << (j * k) for j in range(bands))
        return m.bitwiseAND(F.lit(aligned)) != 0

    cand_counts = masked.agg(
        *[
            F.coalesce(F.sum(_in_config(b, r).cast("long")), F.lit(0))
            .cast("bigint")
            .alias(f"c_{r}")
            for b, r in LSH_CONFIGS
        ]
    )
    # exact verify ONCE over the superset frame, keeping the mask; the
    # filter is verify_pairs_jaccard's cross-multiplied threshold test
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    truth_masks = (
        masked.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.expr(
                f"{10000 + JACCARD_THRESHOLD_BP} * size(array_intersect(sh_a, sh_b))"
                f" >= {JACCARD_THRESHOLD_BP} * (size(sh_a) + size(sh_b))"
            )
        )
        .select("bmask")
    )
    true_counts = truth_masks.agg(
        *[
            F.coalesce(F.sum(_in_config(b, r).cast("long")), F.lit(0))
            .cast("bigint")
            .alias(f"t_{r}")
            for b, r in LSH_CONFIGS
        ]
    )
    legs = F.array(
        *[
            F.struct(
                F.lit(b).cast("bigint").alias("bands"),
                F.lit(r).cast("bigint").alias("rows_per_band"),
                F.col(f"c_{r}").alias("n_candidates"),
                F.col(f"t_{r}").alias("n_true"),
            )
            for b, r in LSH_CONFIGS
        ]
    )
    return (
        cand_counts.crossJoin(F.broadcast(true_counts))
        .select(F.explode(legs).alias("leg"))
        .select("leg.bands", "leg.rows_per_band", "leg.n_candidates", "leg.n_true")
        .withColumn(
            "precision_bp",
            F.expr(
                "CAST(CASE WHEN n_candidates = 0 THEN 0"
                " ELSE (10000 * n_true) DIV n_candidates END AS BIGINT)"
            ),
        )
    )


# --------------------------------------------------------------- time decay

HALF_LIFE_DAYS = 7


def q_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed activity per event type: each event weighs
    10000 >> (age_days DIV HALF_LIFE_DAYS) bp of a fresh event, where
    age is measured back from the corpus max timestamp (single-row
    broadcast). Halving per half-life IS an integer right shift at
    day granularity — the whole rollup is exact integer arithmetic, so
    a decayed score is as deterministic and oracle-checkable as a plain
    count (no float-sum ordering anywhere). One scan + one broadcast +
    one map-side-combining aggregate; the shape survives any corpus
    size, and the shift caps at 62 so ancient events contribute exactly
    0 without overflow."""
    events = load_split(spark, sf_dir, "events")
    hwm = events.agg(F.max(F.to_date("ts")).alias("d_max"))
    aged = events.join(F.broadcast(hwm)).select(
        "event_type",
        F.expr(
            "least(CAST(62 AS BIGINT),"
            f" CAST(datediff(d_max, to_date(ts)) DIV {HALF_LIFE_DAYS} AS BIGINT))"
        ).alias("hshift"),
    )
    return (
        aged.select(
            "event_type",
            F.expr("CAST(10000 DIV shiftleft(CAST(1 AS BIGINT), hshift) AS BIGINT)").alias(
                "w_bp"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("w_bp").cast("bigint").alias("decayed_bp"),
        )
    )


# --------------------------------------------------------------- media phash

PH_W, PH_H = 8, 4  # q_media_decode's framing: 8x4 RGB = 96 body bytes
PH_PIXELS = PH_W * PH_H


def ahash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ahash) via the REAL PPM decode inside Arrow mapInPandas
    — the shared perceptual-hash stage of q_media_phash and the staged
    MIH near-dup detector (factored so the two cannot drift)."""
    from collections.abc import Iterator

    import pandas as pd

    from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M

    docs = load_split(spark, sf_dir, "documents")
    n = PH_PIXELS * 3
    body = F.expr(f"rpad(substring(encode(text, 'UTF-8'), 1, {n}), {n}, X'78')")
    header = F.lit(f"P6\n{PH_W} {PH_H}\n255\n".encode())
    framed = docs.select("doc_id", F.concat(header, body).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = M.decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2).reshape(-1)
                total = int(gray.sum())
                ahash = 0
                for p, g in enumerate(gray.tolist()):
                    if PH_PIXELS * g > total:
                        ahash |= 1 << p
                ids.append(doc_id)
                hashes.append(ahash)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return framed.mapInPandas(gen, "doc_id long, ahash long")


def q_media_phash(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Perceptual image dedup via average-hash (aHash): each document's
    text bytes are framed as a valid binary-PPM exactly like
    q_media_decode (header + rpad-to-96-byte body), decoded by the REAL
    pure-python PPM decoder inside Arrow mapInPandas, and hashed:
    gray[p] = R+G+B of pixel p (integer, no scaling loss), bit p set
    iff 32*gray[p] > sum(gray) — the strictly-greater integer form of
    "above the mean", so the hash is deterministic with no float
    anywhere. Output: (doc_id, ahash, n_same) where n_same counts docs
    sharing the hash — duplicate-image groups by ONE keyed shuffle on
    the 32-bit hash, never pairwise pixel comparison.

    At 100 TB this is image exact/near-dup stage 1: decode once
    (Arrow-batched, embarrassingly parallel), bucket by perceptual
    hash; stage 2 (intra-bucket verification) is bounded by bucket
    sizes exactly like text LSH buckets. The oracle reproduces the
    decode arithmetically from hex(encode(text)) — byte-exact for any
    text — so the REAL decoder's output is value-checked."""
    hashed = ahash_frame(spark, sf_dir).persist()
    if cache_registry is not None:
        cache_registry.append(hashed)
    groups = hashed.groupBy("ahash").agg(F.count("*").cast("bigint").alias("n_same"))
    return hashed.join(groups, "ahash").select("doc_id", "ahash", "n_same")


# --------------------------------------------------------------- KMV overlap

KMV_K = 256
KMV_NGRAM = 3
_POW60 = 1 << 60


def q_kmv_overlap(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Source-pair set-overlap estimation with KMV (k-minimum-values /
    bottom-k theta) sketches, audited against exact values. Per source,
    the sketch is the K smallest distinct hash60 values of its word
    3-gram set (a 256-row bounded, MERGEABLE summary); per source pair:

      est(|S|)     = (K-1) * 2^60 DIV kth_min          (or exact if <K)
      est(|A u B|) = same formula on the k-th min of the MERGED sketch
      est(|A n B|) = est_a + est_b - est_union          (incl-exclusion)
      est_jaccard  = est_inter / est_union              (bp, clamped)

    next to the exact union/Jaccard computed from the full gram sets.
    This is the overlap operation HLL cannot answer (HLL unions but
    does not intersect); KMV sketches union by merge-and-truncate and
    the estimator needs only integer arithmetic (the 2^60 numerator
    rides in DECIMAL(38,0)/HUGEINT, floored by DIV on both engines).

    Scale shape: sketches build with one distinct + one rank window
    per source (each source's sketch is 256 rows no matter how many
    grams it has); the pair stage joins 20 sketch rows against
    themselves — bounded by source count squared, never by corpus. The
    exact audit legs are corpus-bounded equi-joins and would be DROPPED
    at 100 TB — they exist to measure the estimator, which is the
    query's point."""
    docs = load_split(spark, sf_dir, "documents")
    toks = F.expr("filter(split(trim(lower(text)), '\\\\s+'), t -> t <> '')")
    # size guard: Spark's sequence(1, 0) yields the DESCENDING [1, 0],
    # not an empty array — short docs must take the explicit empty branch
    grams3 = F.expr(
        "CASE WHEN size(ts) >= 3 THEN"
        " transform(sequence(1, size(ts) - 2),"
        "           i -> concat(ts[i - 1], ' ', ts[i], ' ', ts[i + 1]))"
        " ELSE CAST(array() AS array<string>) END"
    )
    sg = (
        docs.select("source", toks.alias("ts"))
        .select("source", F.explode(grams3).alias("g"))
        .select("source", hash60(F.col("g")).alias("h"))
        .distinct()
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(sg)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    sketch = (
        sg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )
    counts = sg.groupBy("source").agg(F.count("*").cast("bigint").alias("n_exact"))
    per_src = sketch.join(counts, "source")

    est = (
        f"CASE WHEN size({{k}}) < {KMV_K} THEN CAST(size({{k}}) AS BIGINT)"
        f" ELSE CAST((CAST({KMV_K - 1} AS DECIMAL(38,0)) * {_POW60})"
        f"      DIV element_at({{k}}, {KMV_K}) AS BIGINT) END"
    )
    a = per_src.select(
        F.col("source").alias("src_a"),
        F.col("kmv").alias("kmv_a"),
        F.col("n_exact").alias("na"),
    )
    b = per_src.select(
        F.col("source").alias("src_b"),
        F.col("kmv").alias("kmv_b"),
        F.col("n_exact").alias("nb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .withColumn(
            "merged",
            F.expr(f"slice(array_sort(array_distinct(concat(kmv_a, kmv_b))), 1, {KMV_K})"),
        )
        .withColumn("est_a", F.expr(est.format(k="kmv_a")))
        .withColumn("est_b", F.expr(est.format(k="kmv_b")))
        .withColumn("est_union", F.expr(est.format(k="merged")))
    )
    # exact intersection per pair: one equi-join of the distinct
    # (source, gram-hash) relation against itself. LEFT join + coalesce:
    # a pair sharing ZERO grams produces no inter row, and an inner join
    # would silently drop exactly the fully-disjoint pairs the overlap
    # audit exists to surface (they must report exact_jaccard_bp = 0).
    ia = sg.select(F.col("source").alias("src_a"), "h")
    ib = sg.select(F.col("source").alias("src_b"), "h")
    inter = (
        ia.join(ib, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["src_a", "src_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0).cast("bigint")))
        .select(
            "src_a",
            "src_b",
            "est_union",
            F.expr("na + nb - n_inter").cast("bigint").alias("exact_union"),
            F.expr(
                "CAST((10000 * abs(est_union - (na + nb - n_inter)))"
                " DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("union_err_bp"),
            F.expr(
                "CAST(GREATEST(CAST(0 AS BIGINT),"
                " (10000 * (est_a + est_b - est_union)) DIV est_union)"
                " AS BIGINT)"
            ).alias("est_jaccard_bp"),
            F.expr(
                "CAST((10000 * n_inter) DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("exact_jaccard_bp"),
        )
    )


# --------------------------------------------------------- audio fingerprint

AF_WINDOWS = 8  # 32 mono int16 samples -> 8 windows of 4


def q_audio_fingerprint(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Audio near-dup stage 1: each document's text bytes are framed as
    a valid RIFF/WAVE mono 16-bit PCM clip (q_media_audio_stats's exact
    framing), decoded by the REAL chunk-walking WAV parser inside Arrow
    mapInPandas, and fingerprinted on its ENERGY PROFILE: the 32-sample
    clip splits into AF_WINDOWS windows, energy[w] = sum |s| over the
    window (integer), bit w set iff AF_WINDOWS * energy[w] >
    sum(all energies) — the strictly-greater integer form of "window
    louder than the clip mean", the same no-float rule as
    q_media_phash. Output (doc_id, afp, n_same): duplicate clips group
    by ONE keyed shuffle on the 8-bit fingerprint.

    The energy-profile hash is loudness-SHAPE sensitive but overall-gain
    tolerant (scaling every sample leaves above-mean bits unchanged) —
    the property a byte digest lacks, pytest-pinned. The oracle
    re-derives every little-endian int16 arithmetically from
    hex(encode(text)) and mirrors the windowed bits."""
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
            ids, fps = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = M.decode_audio(bytes(payload))
                s = np.abs(samples.astype(np.int64)).reshape(-1)
                win = s.reshape(AF_WINDOWS, -1).sum(axis=1)
                total = int(win.sum())
                afp = 0
                for w, e in enumerate(win.tolist()):
                    if AF_WINDOWS * e > total:
                        afp |= 1 << w
                ids.append(doc_id)
                fps.append(afp)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    hashed = framed.mapInPandas(gen, "doc_id long, afp long").persist()
    if cache_registry is not None:
        cache_registry.append(hashed)
    groups = hashed.groupBy("afp").agg(F.count("*").cast("bigint").alias("n_same"))
    return hashed.join(groups, "afp").select("doc_id", "afp", "n_same")


# -------------------------------------------------------------------- MMR

MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA = 0.7
MMR_QUERY_VEC_ID = 0


def q_mmr_diversify(
    spark: SparkSession,
    sf_dir: str,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from the top-MMR_POOL cosine shortlist for the id-0 query
    vector, greedily select MMR_K results maximizing
    lambda * rel(c) - (1 - lambda) * max sim(c, s) over selected s —
    relevance traded against redundancy, the diversification step run
    after ANN/hybrid retrieval. Output (rank, doc_id, rel, score); the
    first pick scores its bare relevance (no penalty term exists yet).

    Determinism / cross-engine exactness: rel and pairwise sims are
    ROUND(cosine, 4) doubles over the house bit-identical fold; the MMR
    score is 0.7*rel - 0.3*maxsim — IEEE multiply/subtract on identical
    doubles is exact, so comparisons agree; ties break to lowest id.
    The displayed score is ROUND(score, 5): the true value has at most
    5 decimals (one-decimal lambda x four-decimal inputs), so the
    rounding is exact and midpoint-free on both engines.

    Scale shape: corpus-sized work is exactly ONE cosine scan ending in
    a distributed TakeOrdered(MMR_POOL); the pairwise-sim matrix and
    every greedy step run over the bounded 20-row shortlist (broadcast
    joins on <= 20-row frames). The greedy loop is unrolled driver-side
    into a fixed MMR_K-step plan — no collect, no Python on data."""
    vecs = _vec(spark, sf_dir)
    qv = vecs.filter(F.col("vec_id") == MMR_QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    short = (
        vecs.filter(F.col("vec_id") != MMR_QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            "v",
            F.round(S.cosine(F.col("v"), F.col("qv")), 4).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("doc_id"))
        .limit(MMR_POOL)
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(short)
    a = short.select(F.col("doc_id").alias("ida"), F.col("v").alias("va"))
    b = short.select(F.col("doc_id").alias("idb"), F.col("v").alias("vb"))
    sims = (
        a.join(F.broadcast(b), F.col("ida") != F.col("idb"))
        .select(
            "ida", "idb", F.round(S.cosine(F.col("va"), F.col("vb")), 4).alias("sim")
        )
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(sims)
    # mu must be the SAME double literal the oracle renders: 1.0 - 0.7
    # evaluates to 0.30000000000000004 (1 ulp off the parsed literal
    # 0.3), and the determinism contract rests on identical doubles —
    # round to the decimal the SQL side parses
    lam, mu = F.lit(MMR_LAMBDA), F.lit(round(1.0 - MMR_LAMBDA, 10))
    selected = (
        short.orderBy(F.col("rel").desc(), F.col("doc_id"))
        .limit(1)
        .select(
            F.lit(1).cast("bigint").alias("rank"),
            "doc_id",
            "rel",
            F.round(F.col("rel"), 5).alias("score"),
        )
    )
    for k in range(2, MMR_K + 1):
        remaining = short.join(
            selected.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id", "rel")
        pen = (
            sims.join(
                selected.select(F.col("doc_id").alias("idb")), "idb"
            )
            .groupBy(F.col("ida").alias("doc_id"))
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            remaining.join(pen, "doc_id")
            .withColumn("mmr", lam * F.col("rel") - mu * F.col("maxsim"))
            .orderBy(F.col("mmr").desc(), F.col("doc_id"))
            .limit(1)
            .select(
                F.lit(k).cast("bigint").alias("rank"),
                "doc_id",
                "rel",
                F.round(F.col("mmr"), 5).alias("score"),
            )
        )
        selected = selected.unionByName(pick)
    return selected


# ------------------------------------------------------------ n-gram novelty


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty profile: of a source's DISTINCT 5-gram
    shingles, how many appear in no other source (novel), and the
    novelty rate in bp — which sources bring unique content to a
    pretraining mix vs re-serving shared boilerplate. Complements
    q_dataset_card (per-source dup rate) and q_dup_source_matrix
    (pairwise dup counts) with the set-uniqueness view.

    Scale shape: one shingle explode -> distinct (source, gram) -> a
    gram-keyed aggregate counting sources per gram -> a source-keyed
    rollup. Two keyed exchanges, both map-side combining; no pair
    expansion anywhere (novelty needs per-gram source COUNTS, not the
    source pairs)."""
    docs = load_split(spark, sf_dir, "documents")
    # NOT persisted (r12 optimization measured it): the exploded-distinct
    # frame feeds 2 consumers, but caching the wide (source, gram) rows
    # costs more than recomputing the fused explode (2.55 s -> 3.45 s
    # with persist at sf0.1) — the cache barrier blocks whole-stage
    # fusion into the two aggregates
    sg = (
        D.with_shingles(docs)
        .select("source", F.explode("shingles").alias("g"))
        .distinct()
    )
    per_gram = sg.groupBy("g").agg(F.count("*").alias("n_sources"))
    return (
        sg.join(per_gram, "g")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("n_sources") == 1).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_bp", F.expr("CAST((10000 * n_novel) DIV n_grams AS BIGINT)")
        )
    )


# ----------------------------------------------------------- join size est

JSE_DEPTH = 4
JSE_WIDTH = 512


def q_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from count-min sketches (the
    AMS/CMS inner-product estimator, Cormode & Muthukrishnan '05):
    |orders JOIN customer ON custkey| = sum_k f_A(k) * f_B(k) is
    estimated as min over hash rows j of dot(cms_A[j], cms_B[j]) —
    collisions only ADD cross terms, so the estimate is an
    OVERESTIMATE by construction (pinned) — next to the exact join
    count and the error in bp.

    This is the optimizer-statistics shape: each side reduces to a
    fixed DEPTH x WIDTH = 2048-cell MERGEABLE sketch (map-side partial
    aggregation does ~all the work), the sketches meet in a 2048-row
    equi-join, and no corpus-sized shuffle exists on the estimate path
    — the exact leg is the audit, which a 100 TB planner would not
    run. One output row: (est_join, exact_join, err_bp)."""
    orders = load_split(spark, sf_dir, "orders")
    cust = load_split(spark, sf_dir, "customer")

    def cms(df: DataFrame, key) -> DataFrame:
        cells = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            (
                                hash60(F.concat(F.lit(f"{j}:"), key.cast("string")))
                                % JSE_WIDTH
                            ).alias("bucket"),
                        )
                        for j in range(JSE_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        return cells.groupBy("cell.j", "cell.bucket").agg(
            F.count("*").cast("bigint").alias("cnt")
        )
    a = cms(orders, F.col("o_custkey")).withColumnRenamed("cnt", "ca")
    b = cms(cust, F.col("c_custkey")).withColumnRenamed("cnt", "cb")
    est = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        .agg(F.min("dot").cast("bigint").alias("est_join"))
    )
    exact = (
        orders.select(F.col("o_custkey").alias("k"))
        .join(cust.select(F.col("c_custkey").alias("k")), "k")
        .agg(F.count("*").cast("bigint").alias("exact_join"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join",
        "exact_join",
        F.expr(
            "CAST((10000 * (est_join - exact_join)) DIV exact_join AS BIGINT)"
        ).alias("err_bp"),
    )


QUERIES = {
    "q_url_canonical": q_url_canonical,
    "q_weighted_reservoir": q_weighted_reservoir,
    "q_layout_skipping": q_layout_skipping,
    "q_linear_quality": q_linear_quality,
    "q_lsh_tuning": q_lsh_tuning,
    "q_time_decay": q_time_decay,
    "q_media_phash": q_media_phash,
    "q_kmv_overlap": q_kmv_overlap,
    "q_audio_fingerprint": q_audio_fingerprint,
    "q_mmr_diversify": q_mmr_diversify,
    "q_ngram_novelty": q_ngram_novelty,
    "q_join_size_est": q_join_size_est,
}

# ---------------------------------------------------------------- oracles

_URL_SQL_BASE = f"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % {URL_VARIANTS} = 0 THEN 'HTTP' ELSE 'http' END
         || '://'
         || CASE WHEN doc_id % {URL_VARIANTS} = 1
                 THEN upper('www.s' || CAST((doc_id // {URL_VARIANTS}) % 20 AS VARCHAR)
                      || '.d' || CAST((doc_id // {URL_VARIANTS}) % 5 AS VARCHAR) || '.com')
                 ELSE 'www.s' || CAST((doc_id // {URL_VARIANTS}) % 20 AS VARCHAR)
                      || '.d' || CAST((doc_id // {URL_VARIANTS}) % 5 AS VARCHAR) || '.com' END
         || CASE WHEN doc_id % {URL_VARIANTS} = 2 THEN ':80' ELSE '' END
         || '/docs/' || CAST(doc_id // {URL_VARIANTS} AS VARCHAR)
         || CASE WHEN doc_id % {URL_VARIANTS} = 3 THEN '/' ELSE '' END
         || CASE WHEN doc_id % {URL_VARIANTS} = 0
                 THEN '?utm_source=feed&id=' || CAST((doc_id // {URL_VARIANTS}) % 97 AS VARCHAR) || '&utm_medium=x'
                 WHEN doc_id % {URL_VARIANTS} = 1
                 THEN '?id=' || CAST((doc_id // {URL_VARIANTS}) % 97 AS VARCHAR) || '&fbclid=abc'
                 ELSE '?id=' || CAST((doc_id // {URL_VARIANTS}) % 97 AS VARCHAR) END
         || CASE WHEN doc_id % {URL_VARIANTS} = 2 THEN '#section-2' ELSE '' END
         AS url
  FROM documents
),
parsed AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_URL_RE}', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(url, '{_URL_RE}', 2)), '^www\\.', '') AS host,
         regexp_extract(url, '{_URL_RE}', 3) AS port,
         regexp_replace(regexp_extract(url, '{_URL_RE}', 4), '/$', '') AS path,
         regexp_replace(regexp_extract(url, '{_URL_RE}', 5), '^\\?', '') AS rawq
  FROM raw
),
canon AS (
  SELECT doc_id,
         host,
         scheme || '://' || host
         || CASE WHEN (scheme = 'http' AND port = ':80')
                   OR (scheme = 'https' AND port = ':443')
                   OR port = '' THEN '' ELSE port END
         || path
         || CASE WHEN len(params) > 0
                 THEN '?' || list_aggregate(list_sort(params), 'string_agg', '&')
                 ELSE '' END AS curl
  FROM (
    SELECT *,
           list_filter(string_split(rawq, '&'),
                       p -> p <> '' AND NOT starts_with(p, 'utm_')
                        AND NOT starts_with(p, 'fbclid')
                        AND NOT starts_with(p, 'gclid')) AS params
    FROM parsed
  )
)
"""

_URL_SQL = (
    _URL_SQL_BASE
    + """
, per_canon AS (
  SELECT string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1] AS domain,
         curl, COUNT(*) AS n
  FROM canon GROUP BY 1, 2
)
SELECT domain,
       CAST(SUM(n) AS BIGINT) AS n_urls,
       CAST(COUNT(*) AS BIGINT) AS n_canonical,
       CAST((10000 * (SUM(n) - COUNT(*))) // SUM(n) AS BIGINT) AS dup_bp
FROM per_canon GROUP BY domain
"""
)

_RESERVOIR_SQL = f"""
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(floor(ln(({hash60_sql("CAST(doc_id AS VARCHAR)")} + 1)
                     / {float(1 << 60)}) / n_chars * 1e6) AS BIGINT) AS key_e6
FROM documents
QUALIFY ROW_NUMBER() OVER (
  ORDER BY CAST(floor(ln(({hash60_sql("CAST(doc_id AS VARCHAR)")} + 1)
              / {float(1 << 60)}) / n_chars * 1e6) AS BIGINT) DESC, doc_id ASC
) <= {RESERVOIR_K}
"""

_Z_INTERLEAVE = " + ".join(
    f"(((cx >> {i}) & 1) << {2 * i + 1}) + (((dy >> {i}) & 1) << {2 * i})"
    for i in range(Z_BITS)
)

_ZORDER_SQL = f"""
WITH ext AS (
  SELECT MAX(o_custkey) AS ck_max,
         MIN(CAST(o_orderdate AS DATE)) AS d_min,
         MAX(CAST(o_orderdate AS DATE)) AS d_max
  FROM orders
),
b AS (
  SELECT CAST((o_custkey * {1 << Z_BITS}) // (ck_max + 1) AS BIGINT) AS cx,
         CAST((date_diff('day', d_min, CAST(o_orderdate AS DATE)) * {1 << Z_BITS})
              // (date_diff('day', d_min, d_max) + 1) AS BIGINT) AS dy
  FROM orders, ext
),
zf AS (
  SELECT cx, dy, CAST(({_Z_INTERLEAVE}) >> {Z_FILE_SHIFT} AS BIGINT) AS file_id
  FROM b
),
lf AS (SELECT cx, dy, CAST(dy // {LIN_FILE_DIV} AS BIGINT) AS file_id FROM b),
stats AS (
  SELECT 'zorder' AS layout, file_id, COUNT(*) AS n_rows,
         MIN(cx) AS cx_min, MAX(cx) AS cx_max,
         MIN(dy) AS dy_min, MAX(dy) AS dy_max
  FROM zf GROUP BY file_id
  UNION ALL
  SELECT 'linear', file_id, COUNT(*),
         MIN(cx), MAX(cx), MIN(dy), MAX(dy)
  FROM lf GROUP BY file_id
)
SELECT layout, file_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(cx_min AS BIGINT) AS cx_min, CAST(cx_max AS BIGINT) AS cx_max,
       CAST(dy_min AS BIGINT) AS dy_min, CAST(dy_max AS BIGINT) AS dy_max,
       (cx_max < {Z_PRED_LO} OR cx_min > {Z_PRED_HI}) AS prunable
FROM stats
"""

_LQ_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
),
grams AS (
  SELECT doc_id,
         ts || list_transform(range(1, len(ts)),
                              i -> ts[i] || ' ' || ts[i + 1]) AS gs
  FROM toks
),
feat AS (
  SELECT DISTINCT doc_id,
         ({hash60_sql("g")}) % {LQ_DIMS} AS dim
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(w) AS BIGINT) AS w_sum,
       CAST(SUM(w) // COUNT(*) AS BIGINT) AS score
FROM (
  SELECT doc_id, dim,
         ({hash60_sql("'w:' || CAST(dim AS VARCHAR)")}) % 2001 - 1000 AS w
  FROM feat
)
GROUP BY doc_id
"""


def _lsh_tuning_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
        MOD31,
        N_PERM,
        perm_hash_sql,
    )

    mins = ",\n                 ".join(
        f"MIN({perm_hash_sql('h', i)}) AS m{i}" for i in range(N_PERM)
    )
    sig_list = ", ".join(f"m{i}" for i in range(N_PERM))
    legs = []
    for bands, rows in LSH_CONFIGS:
        legs.append(f"""
        SELECT CAST({bands} AS BIGINT) AS bands,
               CAST({rows} AS BIGINT) AS rows_per_band,
               CAST((SELECT COUNT(*) FROM cand_{bands}) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM truecand_{bands}) AS BIGINT) AS n_true,
               CAST(CASE WHEN (SELECT COUNT(*) FROM cand_{bands}) = 0 THEN 0
                    ELSE (10000 * (SELECT COUNT(*) FROM truecand_{bands}))
                         // (SELECT COUNT(*) FROM cand_{bands}) END AS BIGINT)
                 AS precision_bp
        """)
    band_ctes = []
    for bands, rows in LSH_CONFIGS:
        key = " || '_' || ".join(
            f"CAST(sig[{rows} * j + {r + 1}] AS VARCHAR)" for r in range(rows)
        )
        band_ctes.append(f"""
        bands_{bands} AS (
          SELECT doc_id, j, {key} AS bkey
          FROM sigl, range({bands}) t(j)
        ),
        cand_{bands} AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands_{bands} a JOIN bands_{bands} b
            ON a.j = b.j AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        truecand_{bands} AS (
          SELECT c.doc_a, c.doc_b
          FROM cand_{bands} c
          JOIN sh ha ON ha.doc_id = c.doc_a
          JOIN sh hb ON hb.doc_id = c.doc_b
          WHERE (10000 * len(list_intersect(ha.s, hb.s)))
                // (len(ha.s) + len(hb.s) - len(list_intersect(ha.s, hb.s)))
                >= {JACCARD_THRESHOLD_BP}
        )""")
    return f"""
        WITH sh AS (
          SELECT doc_id, {_SHINGLES} AS s FROM documents
        ), hs AS (
          SELECT doc_id, ({hash60_sql("g")}) % {MOD31} AS h
          FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0)
        ), sigs AS (
          SELECT doc_id,
                 {mins}
          FROM hs GROUP BY doc_id
        ), sigl AS (
          SELECT doc_id, [{sig_list}] AS sig FROM sigs
        ),
        {",".join(band_ctes)}
        {" UNION ALL ".join(legs)}
    """


_DECAY_SQL = f"""
WITH hwm AS (SELECT MAX(CAST(ts AS DATE)) AS d_max FROM events),
aged AS (
  SELECT event_type,
         LEAST(62, date_diff('day', CAST(ts AS DATE), d_max)
                   // {HALF_LIFE_DAYS}) AS hshift
  FROM events, hwm
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(10000 // (CAST(1 AS BIGINT) << hshift)) AS BIGINT) AS decayed_bp
FROM aged GROUP BY event_type
"""

# byte-wise hex framing identical to the q_media_decode oracle: 2 hex
# chars per byte, rpad with '78' ('x'); gray = R+G+B per pixel
_PH_GRAYS = (
    f"list_transform(range(0, {PH_PIXELS}),"
    " p -> CAST(('0x' || substring(hx, 6*p + 1, 2)) AS BIGINT)"
    "    + CAST(('0x' || substring(hx, 6*p + 3, 2)) AS BIGINT)"
    "    + CAST(('0x' || substring(hx, 6*p + 5, 2)) AS BIGINT))"
)

# body/g/h chain ending in h(doc_id, ahash) — shared with the staged
# MIH near-dup oracle so the arithmetic reproduction of the decoder
# cannot drift between the two.
AHASH_CTES = f"""body AS (
  SELECT doc_id,
         rpad(substring(hex(encode(text)), 1, {PH_PIXELS * 6}),
              {PH_PIXELS * 6}, '78') AS hx
  FROM documents
),
g AS (
  SELECT doc_id, {_PH_GRAYS} AS grays FROM body
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {PH_PIXELS}),
              p -> CASE WHEN {PH_PIXELS} * grays[p + 1] > list_sum(grays)
                        THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT)
           AS ahash
  FROM g
)"""

_PHASH_SQL = f"""
WITH {AHASH_CTES}
SELECT doc_id, ahash,
       CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same
FROM h
"""


def _kmv_est_sql(k: str) -> str:
    return (
        f"CASE WHEN len({k}) < {KMV_K} THEN CAST(len({k}) AS BIGINT)"
        f" ELSE CAST(({KMV_K - 1} * (CAST(1 AS HUGEINT) << 60))"
        f"      // {k}[{KMV_K}] AS BIGINT) END"
    )


_KMV_SQL = f"""
WITH sg AS (
  SELECT DISTINCT source, {hash60_sql("g")} AS h
  FROM (
    SELECT source,
           unnest(list_transform(range(1, len(ts) - 1),
                  i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS g
    FROM (SELECT source, {_TOKS} AS ts FROM documents)
  )
),
ranked AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM sg
),
sk AS (
  SELECT source, list_sort(list(h)) AS kmv
  FROM ranked WHERE rn <= {KMV_K} GROUP BY source
),
cnt AS (SELECT source, COUNT(*) AS n_exact FROM sg GROUP BY source),
per AS (SELECT sk.source, kmv, n_exact FROM sk JOIN cnt USING (source)),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         a.kmv AS kmv_a, b.kmv AS kmv_b,
         a.n_exact AS na, b.n_exact AS nb,
         list_sort(list_distinct(a.kmv || b.kmv))[1:{KMV_K}] AS merged
  FROM per a JOIN per b ON a.source < b.source
),
inter AS (
  SELECT x.source AS src_a, y.source AS src_b, COUNT(*) AS n_inter
  FROM sg x JOIN sg y ON x.h = y.h AND x.source < y.source
  GROUP BY 1, 2
),
est AS (
  SELECT src_a, src_b, na, nb,
         {_kmv_est_sql("kmv_a")} AS est_a,
         {_kmv_est_sql("kmv_b")} AS est_b,
         {_kmv_est_sql("merged")} AS est_union
  FROM pairs
)
SELECT e.src_a, e.src_b, e.est_union,
       CAST(na + nb - COALESCE(i.n_inter, 0) AS BIGINT) AS exact_union,
       CAST((10000 * abs(e.est_union - (na + nb - COALESCE(i.n_inter, 0))))
            // (na + nb - COALESCE(i.n_inter, 0)) AS BIGINT) AS union_err_bp,
       CAST(GREATEST(CAST(0 AS BIGINT),
            (10000 * (est_a + est_b - e.est_union)) // e.est_union)
         AS BIGINT) AS est_jaccard_bp,
       CAST((10000 * COALESCE(i.n_inter, 0)) // (na + nb - COALESCE(i.n_inter, 0))
         AS BIGINT) AS exact_jaccard_bp
FROM est e LEFT JOIN inter i ON e.src_a = i.src_a AND e.src_b = i.src_b
"""

# little-endian int16 parse, identical to the q_media_audio_stats oracle
_AF_BYTES = 64  # multimodal_queries.AUDIO_BYTES (32 mono int16 samples)
_AF_SAMPLE = (
    "CASE WHEN CAST(('0x' || substring(hx, 4*{i} - 3, 2)) AS INT)"
    "        + 256 * CAST(('0x' || substring(hx, 4*{i} - 1, 2)) AS INT)"
    "       >= 32768"
    "     THEN CAST(('0x' || substring(hx, 4*{i} - 3, 2)) AS INT)"
    "        + 256 * CAST(('0x' || substring(hx, 4*{i} - 1, 2)) AS INT)"
    "        - 65536"
    "     ELSE CAST(('0x' || substring(hx, 4*{i} - 3, 2)) AS INT)"
    "        + 256 * CAST(('0x' || substring(hx, 4*{i} - 1, 2)) AS INT)"
    " END"
)

_AFP_SQL = f"""
WITH body AS (
  SELECT doc_id,
         rpad(substring(hex(encode(text)), 1, {_AF_BYTES * 2}),
              {_AF_BYTES * 2}, '20') AS hx
  FROM documents
),
s AS (
  SELECT doc_id,
         list_transform(generate_series(1, {_AF_BYTES // 2}),
                        i -> abs({_AF_SAMPLE.format(i="i")})) AS sa
  FROM body
),
e AS (
  SELECT doc_id,
         list_transform(range(0, {AF_WINDOWS}),
                        w -> sa[4*w + 1] + sa[4*w + 2]
                           + sa[4*w + 3] + sa[4*w + 4]) AS win
  FROM s
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {AF_WINDOWS}),
              w -> CASE WHEN {AF_WINDOWS} * win[w + 1] > list_sum(win)
                        THEN (CAST(1 AS BIGINT) << w) ELSE 0 END)) AS BIGINT)
           AS afp
  FROM e
)
SELECT doc_id, afp,
       CAST(COUNT(*) OVER (PARTITION BY afp) AS BIGINT) AS n_same
FROM h
"""

def _mmr_sql() -> str:
    """Unrolled greedy MMR as fixed CTE steps: shortlist + full pairwise
    sim matrix, then one CTE per rank — each picks the argmax of
    0.7*rel - 0.3*(max sim to everything already selected), ties to
    lowest id, excluding prior picks. Mirrors the Spark loop exactly."""
    lam, mu = MMR_LAMBDA, round(1.0 - MMR_LAMBDA, 10)
    steps = ["sel1 AS (SELECT doc_id, rel FROM short ORDER BY rel DESC, doc_id LIMIT 1)"]
    unions = ["SELECT CAST(1 AS BIGINT) AS rank, doc_id, rel, ROUND(rel, 5) AS score FROM sel1"]
    prev_union = "SELECT doc_id FROM sel1"
    for k in range(2, MMR_K + 1):
        steps.append(f"""
        sel{k} AS (
          SELECT s.doc_id, s.rel,
                 {lam} * s.rel - {mu} * (
                   SELECT MAX(p.sim) FROM sims p
                   WHERE p.ida = s.doc_id AND p.idb IN ({prev_union})
                 ) AS mmr
          FROM short s
          WHERE s.doc_id NOT IN ({prev_union})
          ORDER BY mmr DESC, s.doc_id LIMIT 1
        )""")
        unions.append(
            f"SELECT CAST({k} AS BIGINT) AS rank, doc_id, rel,"
            f" ROUND(mmr, 5) AS score FROM sel{k}"
        )
        prev_union += f" UNION ALL SELECT doc_id FROM sel{k}"
    return f"""
        WITH vecs AS ({_VEC_CTE}),
        q AS (SELECT v AS qv FROM vecs WHERE vec_id = {MMR_QUERY_VEC_ID}),
        -- MATERIALIZED: the 64-term cosine fold is a huge expression; the
        -- greedy steps reference short/sims many times, and CTE inlining
        -- would replicate the fold per reference (planner OOM, measured)
        short AS MATERIALIZED (
          SELECT c.vec_id AS doc_id, c.v,
                 ROUND({_cosine_sql("c.v", "q.qv")}, 4) AS rel
          FROM vecs c CROSS JOIN q
          WHERE c.vec_id <> {MMR_QUERY_VEC_ID}
          QUALIFY ROW_NUMBER() OVER (
            ORDER BY ROUND({_cosine_sql("c.v", "q.qv")}, 4) DESC, c.vec_id
          ) <= {MMR_POOL}
        ),
        sims AS MATERIALIZED (
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 ROUND({_cosine_sql("a.v", "b.v")}, 4) AS sim
          FROM short a JOIN short b ON a.doc_id <> b.doc_id
        ),
        {",".join(steps)}
        {" UNION ALL ".join(unions)}
    """


_NOVELTY_SQL = f"""
WITH sg AS (
  SELECT DISTINCT source, g
  FROM (SELECT source, unnest({_SHINGLES}) AS g FROM documents)
),
per_gram AS (SELECT g, COUNT(*) AS n_sources FROM sg GROUP BY g)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST((10000 * SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS novelty_bp
FROM sg JOIN per_gram USING (g)
GROUP BY source
"""


def _jse_cms_sql(table: str, key: str) -> str:
    buckets = " UNION ALL ".join(
        f"SELECT {j} AS j, ({hash60_sql(chr(39) + str(j) + ':' + chr(39) + ' || CAST(' + key + ' AS VARCHAR)')}) % {JSE_WIDTH} AS bucket FROM {table}"
        for j in range(JSE_DEPTH)
    )
    return f"SELECT j, bucket, COUNT(*) AS cnt FROM ({buckets}) GROUP BY j, bucket"


_JSE_SQL = f"""
WITH a AS ({_jse_cms_sql("orders", "o_custkey")}),
b AS ({_jse_cms_sql("customer", "c_custkey")}),
est AS (
  SELECT CAST(MIN(dot) AS BIGINT) AS est_join
  FROM (
    SELECT a.j, SUM(a.cnt * b.cnt) AS dot
    FROM a JOIN b ON a.j = b.j AND a.bucket = b.bucket
    GROUP BY a.j
  )
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_join
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT est_join, exact_join,
       CAST((10000 * (est_join - exact_join)) // exact_join AS BIGINT)
         AS err_bp
FROM est, exact
"""

ORACLES = {
    "q_url_canonical": _URL_SQL,
    "q_weighted_reservoir": _RESERVOIR_SQL,
    "q_layout_skipping": _ZORDER_SQL,
    "q_linear_quality": _LQ_SQL,
    "q_lsh_tuning": _lsh_tuning_sql(),
    "q_time_decay": _DECAY_SQL,
    "q_media_phash": _PHASH_SQL,
    "q_kmv_overlap": _KMV_SQL,
    "q_audio_fingerprint": _AFP_SQL,
    "q_mmr_diversify": _mmr_sql(),
    "q_ngram_novelty": _NOVELTY_SQL,
    "q_join_size_est": _JSE_SQL,
}
