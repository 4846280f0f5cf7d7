"""Deduplication query surface over ``documents``.

Oracle strategy:
* exact / fingerprint / simhash: mirrored term-for-term in DuckDB (all
  hashing goes through the md5-based portable ``hash60``).
* minhash+LSH (``q_minhash_dedup``): the Spark side is the real
  LSH pipeline (banded candidates, then exact-Jaccard verification); the
  oracle computes ground truth by *exhaustive* O(n^2) exact Jaccard. They
  match whenever LSH recall at the threshold is 1 — with 32 bands x 2 rows
  and the planted near-dups at jaccard >= 0.87, miss probability is
  ~(1 - 0.87^2)^32 ~ 1e-20. The driver-visible equality therefore also
  *proves* the LSH recall claim on this data.
* n-gram Jaccard (``q_ngram_jaccard``): candidates = pairs sharing any
  shingle — exactly expressible on both sides, no probability involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    MOD31,
    N_PERM,
    hash60,
    hash60_sql,
    perm_hash_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import STOPWORDS
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _TOKS,
    _TOKS_RAW,
    _in_list,
    _ngrams_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

JACCARD_THRESHOLD_BP = 5000  # 0.5 in basis points

# Detector-evaluation truth legs (q_lsh_eval, q_dup_method_agreement) are
# SAMPLE-BOUNDED (VERDICT r5 #2): recall/precision are measured on the
# pairs whose LOWER id falls in a deterministic id-hash sample —
# hash60(id) % K = 0 with K = max(1, n_docs // TRUTH_SAMPLE_TARGET) — an
# unbiased estimate that is EXACT on the sampled pair universe, at
# sample x candidate cost instead of the full verify bill. At driver SF
# (n <= TRUTH_SAMPLE_TARGET) K = 1: the sample is the whole corpus and
# values are bit-identical to the unsampled r5 contract (the engine
# skips the trivially-true predicate; the oracle's GREATEST(1, ...)
# mirror degenerates the same way). The K > 1 path of the same
# hash-sample machinery is driver-proven by q_embed_near_dup_sampled /
# q_semdedup_sampled, which activate at 500 rows.
TRUTH_SAMPLE_TARGET = 2000


def _truth_sample_mod(docs: DataFrame) -> int:
    return max(1, docs.count() // TRUTH_SAMPLE_TARGET)


def _truth_sample_sql(id_expr: str) -> str:
    return (
        f"({hash60_sql(f'CAST({id_expr} AS VARCHAR)')})"
        f" % GREATEST(1, (SELECT COUNT(*) FROM documents)"
        f" // {TRUTH_SAMPLE_TARGET}) = 0"
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_split(spark, sf_dir, "documents")
    return D.exact_dedup(docs)


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, exact-Jaccard verified (bp)."""
    docs = load_split(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard dedup: candidates share >= 1 word-5-gram
    (explode + self-equi-join on the shingle — one keyed shuffle, never a
    cross product), similarity verified on the full distinct-shingle sets."""
    docs = load_split(spark, sf_dir, "documents")
    # persisted (r12 optimization): feeds the candidate explode AND both
    # verify sides — the house staged-materialization rule (see
    # minhash_dedup_pairs); without it the tokenize+ngram pass runs 3x
    shingled = D.with_shingles(docs).select("doc_id", "shingles").persist()
    ex = shingled.select("doc_id", F.explode("shingles").alias("g"))
    pairs = D.pairs_within_buckets(ex, ["g"], "doc_id")
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_isz", F.expr("size(array_intersect(sh_a, sh_b))"))
        .withColumn(
            "jaccard_bp",
            # sets: |A∪B| = |A|+|B|−|A∩B| — one intersect, no union array
            F.expr(
                "CAST((10000 * _isz)"
                " DIV (size(sh_a) + size(sh_b) - _isz) AS BIGINT)"
            ),
        )
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard_bp")
    )


def q_exact_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join (the deterministic sibling of
    q_minhash_dedup): every pair with shingle Jaccard >= threshold, found
    with NO probabilistic detector — candidates from the AllPairs/PPJoin
    prefix filter (operators.dedup.prefix_filtered_pairs: rarest-first
    prefixes + in-bucket length cap, provably recall-1 for the
    threshold), then exact-Jaccard verified. Same output contract as the
    banded pipeline but guaranteed recall 1 by construction, so it
    serves as the audit-grade dedup pass and as ground truth for
    evaluating any banding configuration (q_lsh_eval). The oracle is the
    exhaustive O(n²) DuckDB join; the Spark plan never goes corpus² —
    cost tracks prefix-bucket candidates (output-shaped on Zipfian
    corpora; see PERF.md round-5)."""
    docs = load_split(spark, sf_dir, "documents")
    shingled = D.with_shingles(docs).select("doc_id", "shingles").persist()
    cand = D.prefix_filtered_pairs(
        shingled,
        overlap_bp=20000 * JACCARD_THRESHOLD_BP // (10000 + JACCARD_THRESHOLD_BP),
        size_cap_bp=JACCARD_THRESHOLD_BP,
    )
    return D.verify_pairs_jaccard(cand, shingled, threshold_bp=JACCARD_THRESHOLD_BP)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local 60-bit SimHash signature per document."""
    docs = load_split(spark, sf_dir, "documents")
    return D.with_simhash(docs).select("doc_id", "simhash")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via 15-bit block banding (pigeonhole exact
    for hamming <= 3), verified with exact bit_count."""
    docs = load_split(spark, sf_dir, "documents")
    sim = D.with_simhash(docs).select("doc_id", "simhash")
    return D.simhash_near_pairs(sim).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )


CONTAIN_MIN_BP = 5000


def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED containment dedup: C(A in B) = |A∩B| / |A| over the
    word-5-gram shingle sets, both directions per pair — the detector for
    subset/quote-expansion duplicates that symmetric Jaccard dilutes (a
    doc fully contained in a 10x-longer doc has J ≈ 0.1 but containment
    1.0; Jaccard-threshold dedup ships both copies). Candidates come
    from the EXACT prefix filter (operators.dedup.prefix_filtered_pairs
    — AllPairs/PPJoin): either containment >= t implies
    |A∩B| >= ceil(t*min(|A|,|B|)), so rarest-first prefixes of length
    sz - ceil(t*sz) + 1 provably cover every qualifying pair while hot
    stop-shingle buckets collapse from n_g² to n_g*(few); emitted when
    either direction clears CONTAIN_MIN_BP. All math is integer basis
    points; docs with no shingles (< 5 tokens) carry no candidates by
    construction."""
    docs = load_split(spark, sf_dir, "documents")
    shingled = D.with_shingles(docs).select("doc_id", "shingles").persist()
    pairs = D.prefix_filtered_pairs(shingled, overlap_bp=CONTAIN_MIN_BP)
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "contain_a_bp",
            F.expr("CAST((10000 * inter) DIV size(sh_a) AS BIGINT)"),
        )
        .withColumn(
            "contain_b_bp",
            F.expr("CAST((10000 * inter) DIV size(sh_b) AS BIGINT)"),
        )
        .filter(
            F.greatest("contain_a_bp", "contain_b_bp") >= CONTAIN_MIN_BP
        )
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "contain_a_bp",
            "contain_b_bp",
        )
    )


def q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH detector evaluation: exact recall and precision of the banded
    MinHash candidate generator against the TRUE near-dup pair set at the
    Jaccard threshold — the dedup-QA gate a pipeline runs before trusting
    an LSH band/row configuration on a new corpus. The truth set needs no
    n² pass: EXACT prefix-filter candidates (prefix_filtered_pairs —
    J_floor >= t implies (10000+t)i >= t(|A|+|B|) >= 2t*min, so
    |A∩B| >= ceil(2t/(10000+t) * min) and rarest-first prefixes of that
    overlap bound provably cover every true pair; t*max <= 10000*min
    prunes length-incompatible partners in-bucket) verified by exact
    Jaccard are EXACTLY the true pairs. Signatures are PORTABLE (md5
    hash60) so the oracle recomputes the banding itself —
    recall/precision are checked against an independently reconstructed
    detector, not trusted. Single summary row; the three count legs are
    1-row broadcasts.

    The shingle stage feeds FOUR consumers here (candidate generation,
    both verify sides, the signature input) — persist it once (house
    staged-materialization rule; see q_dup_method_agreement).

    Since round 6 the evaluation universe is SAMPLE-BOUNDED (see
    TRUTH_SAMPLE_TARGET): both the truth and candidate pair sets are
    restricted to pairs whose lower id is in the deterministic id-hash
    sample BEFORE the exact-Jaccard verify, so the per-audit verify cost
    is sample-proportional at any corpus size. recall/precision stay
    exact on the sampled universe (identical to the full values at
    driver SF, where K = 1)."""
    docs = load_split(spark, sf_dir, "documents")
    k_mod = _truth_sample_mod(docs)
    shingled = D.with_shingles(docs).select("doc_id", "shingles").persist()
    share = D.prefix_filtered_pairs(
        shingled,
        overlap_bp=20000 * JACCARD_THRESHOLD_BP // (10000 + JACCARD_THRESHOLD_BP),
        size_cap_bp=JACCARD_THRESHOLD_BP,
    )
    if k_mod > 1:
        share = share.filter(hash60(F.col("id_a").cast("string")) % k_mod == 0)
    # truth and cands are each read TWICE below (the hits join + their
    # own count leg) — persisted (r12 optimization), else the prefix-
    # filter verify pipeline and the banding shuffle both run twice
    # (Spark shares no common subtrees across join branches). Both are
    # candidate-bounded pair frames.
    truth = (
        D.verify_pairs_jaccard(share, shingled, threshold_bp=JACCARD_THRESHOLD_BP)
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
        .persist()
    )
    sig = D.with_minhash_signature(
        shingled.filter(F.size("shingles") > 0),
        portable=True,
    )
    cands = D.lsh_candidate_pairs(sig)
    if k_mod > 1:
        cands = cands.filter(hash60(F.col("id_a").cast("string")) % k_mod == 0)
    cands = cands.persist()
    hits = cands.join(truth, ["id_a", "id_b"])
    nt = truth.agg(F.count("*").alias("n_true_pairs"))
    nc = cands.agg(F.count("*").alias("n_lsh_candidates"))
    nh = hits.agg(F.count("*").alias("n_true_found"))
    return (
        nt.join(F.broadcast(nc))
        .join(F.broadcast(nh))
        .select(
            F.col("n_true_pairs").cast("bigint").alias("n_true_pairs"),
            F.col("n_lsh_candidates").cast("bigint").alias("n_lsh_candidates"),
            F.col("n_true_found").cast("bigint").alias("n_true_found"),
            # zero-guarded on BOTH engines (r4 ADVICE): Spark DIV yields
            # NULL on /0 while DuckDB // raises — a corpus with no true
            # pairs or no candidates must degenerate to 0, identically
            F.expr(
                "CASE WHEN n_true_pairs = 0 THEN 0"
                " ELSE (10000 * n_true_found) DIV n_true_pairs END"
            )
            .cast("bigint")
            .alias("recall_bp"),
            F.expr(
                "CASE WHEN n_lsh_candidates = 0 THEN 0"
                " ELSE (10000 * n_true_found) DIV n_lsh_candidates END"
            )
            .cast("bigint")
            .alias("precision_bp"),
        )
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: minhash+LSH verified pairs -> connected
    components (iterative min-label propagation) -> (doc_id, cluster_id =
    min doc id in component). The decision step of a training-data dedup
    pipeline: keep doc_id == cluster_id, drop the rest. Iterative
    algorithm with a full SQL oracle (recursive-CTE transitive closure
    over the exhaustive exact-Jaccard pair set). Exact-dup cliques are
    collapsed onto a digest representative before LSH/CC (see
    ``near_dup_clusters``) — output-invariant, but components runs on
    distinct texts, not docs."""
    docs = load_split(spark, sf_dir, "documents")
    return D.near_dup_clusters(docs, threshold_bp=JACCARD_THRESHOLD_BP)


CHAIN_BLOCK = 100


def q_dup_clusters_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a CHAIN-shaped edge set — the worst case
    for min-label propagation and the one that exercises the
    large-star/small-star handoff end-to-end on driver data. Edges are
    (doc_id, doc_id+1) within blocks of CHAIN_BLOCK consecutive ids, so
    every component is a path of diameter CHAIN_BLOCK-1 (~99), far past
    any sane min-label iteration bound — the call must detect
    non-convergence and hand off to ``connected_components_star``
    (O(log^2 n) rounds regardless of diameter). max_iter=4 keeps the
    doomed propagation phase short (a caller that suspects chain-shaped
    input bounds the cheap probe; the handoff is the point). The oracle
    is the same recursive-CTE transitive closure as q_dup_clusters, so a
    green row here driver-proves the star path, not just the
    clique-shaped one."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = docs.select(F.col("doc_id").alias("src")).filter(
        F.col("src") % CHAIN_BLOCK != CHAIN_BLOCK - 1
    )
    b = docs.select(F.col("doc_id").alias("dst"))
    edges = a.join(b, a.src + 1 == b.dst)
    comps = D.connected_components(edges, src="src", dst="dst", max_iter=4)
    return comps.select(
        F.col("u").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup decision: per near-dup cluster, keep the
    highest-quality member (tie-break: lowest doc_id) instead of the
    blind min-id rule — how a production pipeline picks the canonical
    copy when duplicates differ in cleanliness. Reuses the minhash->
    connected-components machinery; the keep rule is one max_by over a
    composite (quality, -id) key, so the per-cluster reduction stays a
    single hash aggregate (no window over the full corpus). Exact-dup
    cliques are digest-collapsed before LSH/CC (``near_dup_clusters``):
    identical texts also have identical quality_bp, so the keep rule is
    unaffected — CC just never sees the clique blow-up."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans import text_queries

    docs = load_split(spark, sf_dir, "documents")
    comps = D.near_dup_clusters(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    qual = text_queries.q_quality(spark, sf_dir).select("doc_id", "quality_bp")
    members = comps.join(qual, "doc_id")
    return members.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("quality_bp"), (-F.col("doc_id")).alias("nid"))
        )
        .cast("bigint")
        .alias("keep_id"),
        F.count("*").cast("bigint").alias("n_members"),
        F.max("quality_bp").cast("bigint").alias("best_quality_bp"),
    )


def q_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation: for every banded candidate pair, the
    MinHash ESTIMATE of Jaccard (signature agreement fraction, bp) next
    to the exact value — the standing audit that tells you whether the
    band/row configuration still holds on a drifting corpus. Uses the
    PORTABLE (md5-based) signature so the DuckDB oracle recomputes the
    64-permutation signatures themselves — the estimate, not just the
    ground truth, is oracle-checked. Same plan shape as q_minhash_dedup:
    row-local signature fold, one banded shuffle, candidate-bounded pair
    work."""
    docs = load_split(spark, sf_dir, "documents")
    sh = D.with_shingles(docs).select("doc_id", "shingles")
    sig = D.with_minhash_signature(
        sh.filter(F.size("shingles") > 0), portable=True
    ).persist()
    cands = D.lsh_candidate_pairs(sig)
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("mh").alias("mh_a"),
        F.col("shingles").alias("sh_a"),
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("mh").alias("mh_b"),
        F.col("shingles").alias("sh_b"),
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.expr(
                "CAST((10000 * size(filter(zip_with(mh_a, mh_b,"
                " (x, y) -> x = y), b -> b))) DIV size(mh_a) AS BIGINT)"
            ).alias("est_bp"),
            F.expr(
                # sets: |A∪B| = |A|+|B|−|A∩B|; codegen subexpression
                # elimination dedupes the twin intersect within ONE project
                "CAST((10000 * size(array_intersect(sh_a, sh_b)))"
                " DIV (size(sh_a) + size(sh_b)"
                "      - size(array_intersect(sh_a, sh_b))) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
    )


def q_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance view of near-duplication: the per-source-pair count of
    near-dup pairs (unordered source pair, least/greatest normalized) —
    the report that drives source-level dedup policy ('which feeds copy
    each other?'). Adds two id-keyed joins and a tiny rollup on top of
    the minhash pipeline."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.least("source_a", "source_b").alias("source_lo"),
            F.greatest("source_a", "source_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph health: the degree distribution (degree -> node
    count) of the verified near-dup pair graph. Degree 1-2 = pairwise
    dups (cheap collapse); a heavy tail means dense templates and
    quadratic in-cluster pair cost — the audit run before committing to
    a cluster-then-keep-best strategy. Adds one symmetric explode + two
    tiny aggs over the minhash pipeline's output."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    nodes = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    degrees = nodes.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return degrees.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the verified near-dup graph: per-node triangle
    counts (doc_id -> n_triangles, nodes in >= 1 triangle). Triangles
    separate template families (cliques — every pair mutually similar)
    from chain-shaped false merges (A~B~C with A!~C), the structural
    signal behind local-clustering-coefficient audits.

    Scale shape: the standard distributed triangle enumeration — edges
    are oriented low-id -> high-id, so each triangle {a<b<c} is produced
    exactly once by joining (a,b)x(b,c) on the shared middle vertex and
    closing with an (a,c) edge-membership join; both are keyed hash joins
    on vertex ids, never an all-pairs product. Edge count here is the
    verified near-dup pair set — already candidate-bounded by LSH."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    # the edge list feeds THREE join legs (ab, bc, ac) — persist it so the
    # whole LSH-verify subtree runs once, not per leg (house
    # staged-materialization rule; q_pagerank's sym does the same)
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).persist()
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        ab.join(bc, F.col("b") == F.col("b2"))
        .join(ac, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
    return nodes.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


PAGERANK_ITERS = 3
PAGERANK_DAMPING = 0.85


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PageRank (PAGERANK_ITERS fixed power iterations,
    d = 0.85) over the verified near-dup graph — ranks the 'template'
    documents that sit at the center of duplication clusters. The
    iterative-numeric-graph showcase next to connected components and
    k-means: each iteration is one edge join + one order-pinned float
    fold per node (contributions summed in src order — the q_doc_entropy
    trick again), so every double is partition-order independent and the
    DuckDB oracle unrolls the SAME three iterations bit-for-bit. Fixed
    iteration count keeps the lineage bounded (no checkpoint needed);
    the per-iteration cost is one keyed shuffle on dst."""
    docs = load_split(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold_bp=JACCARD_THRESHOLD_BP)
    sym = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    outdeg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = sym.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    base = F.lit(1.0 - PAGERANK_DAMPING) / F.col("n").cast("double")
    pr = nodes.join(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("pr")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            sym.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.struct(
                    F.col("src"), (F.col("pr") / F.col("deg")).alias("c")
                ).alias("sc"),
            )
        )
        summed = contrib.groupBy("node").agg(
            F.aggregate(
                F.array_sort(F.collect_list("sc")),
                F.lit(0.0),
                lambda a, s: a + s["c"],
            ).alias("s")
        )
        pr = (
            nodes.join(summed, "node", "left")
            .join(F.broadcast(nn))
            .select(
                "node",
                (base + F.lit(PAGERANK_DAMPING) * F.coalesce("s", F.lit(0.0))).alias(
                    "pr"
                ),
            )
        )
    return pr.select(
        F.col("node").alias("doc_id"), F.round("pr", 6).alias("pagerank")
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-snapshot) dedup — the shape a STANDING ingest
    runs every batch: dedup the NEW batch against the EXISTING corpus,
    never existing-vs-existing. Here the deterministic even/odd doc_id
    split stands in for snapshot membership. Per new doc: exact-dup flag
    (digest semi-join against the existing digest set), near-dup flag
    (LSH band join restricted to new x existing, exact-Jaccard verified),
    and the admit decision. At 100 TB the existing side's signatures/
    digests are a precomputed table — the per-batch cost is the NEW
    side's signatures plus two keyed joins, independent of corpus scans.
    Oracle = exhaustive exact Jaccard new x existing (same
    recall-is-provably-1 argument as q_minhash_dedup)."""
    docs = load_split(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    digest = lambda d: d.select(  # noqa: E731 — tiny local projection
        F.col("doc_id"), F.md5(F.col("text")).alias("dg")
    )
    exact_ids = (
        digest(new)
        .join(digest(existing).select("dg").distinct(), "dg", "left_semi")
        .select("doc_id")
    )

    # persisted (r12 optimization): feeds the signature chain AND both
    # verify sides (sa/sb) — 3 consumers, house staged-materialization rule
    sh_all = D.with_shingles(docs).select("doc_id", "shingles").persist()
    # empty shingle sets (< 5-token docs) are excluded BEFORE signatures,
    # exactly as minhash_dedup_pairs does: they all share the sentinel
    # MinHash signature, so they band-collide into candidates, and the
    # cross-multiplied Jaccard test evaluates 0 >= 0 = TRUE for two empty
    # sets — a silent divergence from the oracle's len(list_intersect) > 0
    # on any corpus with short docs on both snapshot sides (r5 ADVICE).
    sig = D.with_minhash_signature(sh_all.filter(F.size("shingles") > 0))
    bands = _bands_exploded(sig)
    new_b = bands.filter(F.col("doc_id") % 2 == 1).withColumnRenamed(
        "doc_id", "new_id"
    )
    old_b = bands.filter(F.col("doc_id") % 2 == 0).withColumnRenamed(
        "doc_id", "old_id"
    )
    cand = new_b.join(old_b, ["band", "bkey"]).select("new_id", "old_id").distinct()
    sa = sh_all.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_a"))
    sb = sh_all.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sh_b"))
    near_ids = (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .filter(
            # one-intersect threshold test: floor(10000i/u) >= t iff
            # (10000+t)*i >= t*(|A|+|B|) on set arrays (see
            # operators.dedup.verify_pairs_jaccard for the algebra)
            F.expr(
                f"{10000 + JACCARD_THRESHOLD_BP}"
                " * size(array_intersect(sh_a, sh_b))"
                f" >= {JACCARD_THRESHOLD_BP} * (size(sh_a) + size(sh_b))"
            )
        )
        .select("new_id")
        .distinct()
        .withColumnRenamed("new_id", "doc_id")
    )
    flagged = (
        new.select("doc_id")
        .join(exact_ids.withColumn("exact_dup", F.lit(True)), "doc_id", "left")
        .join(near_ids.withColumn("near_dup", F.lit(True)), "doc_id", "left")
    )
    return flagged.select(
        "doc_id",
        F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
        F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
        (
            ~(F.coalesce("exact_dup", F.lit(False)) | F.coalesce("near_dup", F.lit(False)))
        ).alias("admit"),
    )


def _bands_exploded(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) rows from a signature frame — the reusable
    half of operators/dedup.py:lsh_candidate_pairs for ASYMMETRIC
    (new-vs-existing) candidate joins."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    "_",
                    *[F.col("mh")[j * D.LSH_ROWS + r] for r in range(D.LSH_ROWS)],
                ).alias("bkey"),
            )
            for j in range(D.LSH_BANDS)
        ]
    )
    return sig_df.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )


def q_dup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method dedup evaluation: treat exact-Jaccard >= threshold
    (over shared-shingle candidate pairs — complete, since jaccard > 0
    requires a shared shingle) as ground truth and score the SimHash
    banded detector against it: truth/detected/overlap counts plus exact
    precision/recall in basis points. The audit that picks a detector
    for a corpus instead of trusting folklore. One-row output; both pair
    sets come from candidate-bounded plans already proven green.

    The shingle stage feeds THREE consumers (candidate explode + both
    sides of the verify join) and re-tokenizing text is the dominant
    map cost — persist it once, house style (the staged-materialization
    rule the minhash/CC paths already follow; bench clears caches
    between queries, LRU bounds it otherwise).

    Since round 6 the evaluation universe is SAMPLE-BOUNDED exactly as
    q_lsh_eval's (TRUTH_SAMPLE_TARGET): truth and detected pair sets are
    restricted to lower-id-sampled pairs BEFORE the verify joins, so the
    audit's cost tracks the sample at any corpus size while staying
    exact on the sampled universe (K = 1 — identical values — at driver
    SF)."""
    docs = load_split(spark, sf_dir, "documents")
    k_mod = _truth_sample_mod(docs)
    shingled = D.with_shingles(docs).select("doc_id", "shingles").persist()
    # exact prefix-filter candidates (see q_lsh_eval for the overlap /
    # length-cap derivation) — supersets every J_floor >= t pair while
    # hot stop-shingle buckets stay linear
    cand = D.prefix_filtered_pairs(
        shingled,
        overlap_bp=20000 * JACCARD_THRESHOLD_BP // (10000 + JACCARD_THRESHOLD_BP),
        size_cap_bp=JACCARD_THRESHOLD_BP,
    )
    if k_mod > 1:
        cand = cand.filter(hash60(F.col("id_a").cast("string")) % k_mod == 0)
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    truth = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            # one-intersect threshold test: floor(10000i/u) >= t iff
            # (10000+t)*i >= t*(|A|+|B|) on set arrays (see
            # operators.dedup.verify_pairs_jaccard for the algebra)
            F.expr(
                f"{10000 + JACCARD_THRESHOLD_BP}"
                " * size(array_intersect(sh_a, sh_b))"
                f" >= {JACCARD_THRESHOLD_BP} * (size(sh_a) + size(sh_b))"
            )
        )
        .select("id_a", "id_b")
        # persisted (r12 optimization): truth feeds the overlap semi-join
        # AND its count leg — without the cache the prefix-filter +
        # exact-verify pipeline runs twice
        .persist()
    )
    sim = D.with_simhash(docs).select("doc_id", "simhash")
    detected = D.simhash_near_pairs(sim).select("id_a", "id_b")
    if k_mod > 1:
        detected = detected.filter(
            hash60(F.col("id_a").cast("string")) % k_mod == 0
        )
    # same two-consumer shape as truth (overlap semi-join + count leg)
    detected = detected.persist()
    both = truth.join(detected, ["id_a", "id_b"], "left_semi")
    counts = (
        truth.agg(F.count("*").alias("n_truth"))
        .join(detected.agg(F.count("*").alias("n_detected")))
        .join(both.agg(F.count("*").alias("n_both")))
    )
    return counts.select(
        F.col("n_truth").cast("bigint").alias("n_truth"),
        F.col("n_detected").cast("bigint").alias("n_detected"),
        F.col("n_both").cast("bigint").alias("n_both"),
        # zero-guarded like q_lsh_eval: degenerate corpora give 0, not a
        # Spark-NULL / DuckDB-error divergence
        F.expr(
            "CASE WHEN n_detected = 0 THEN 0"
            " ELSE (10000 * n_both) DIV n_detected END"
        ).cast("bigint").alias("precision_bp"),
        F.expr(
            "CASE WHEN n_truth = 0 THEN 0 ELSE (10000 * n_both) DIV n_truth END"
        ).cast("bigint").alias("recall_bp"),
    )


QUERIES = {
    "q_exact_dedup": q_exact_dedup,
    "q_incremental_dedup": q_incremental_dedup,
    "q_dup_method_agreement": q_dup_method_agreement,
    "q_minhash_est": q_minhash_est,
    "q_dup_source_matrix": q_dup_source_matrix,
    "q_graph_degree": q_graph_degree,
    "q_graph_triangles": q_graph_triangles,
    "q_pagerank": q_pagerank,
    "q_dup_clusters": q_dup_clusters,
    "q_dup_clusters_chain": q_dup_clusters_chain,
    "q_minhash_dedup": q_minhash_dedup,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_exact_jaccard_pairs": q_exact_jaccard_pairs,
    "q_shingle_containment": q_shingle_containment,
    "q_lsh_eval": q_lsh_eval,
    "q_simhash": q_simhash,
    "q_simhash_pairs": q_simhash_pairs,
    "q_dedup_keep_best": q_dedup_keep_best,
}

# ---------------------------------------------------------------- oracles

_SHINGLES = f"list_distinct({_ngrams_sql(_TOKS, 5)})"

_PAIR_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS s FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (10000 * len(list_intersect(a.s, b.s)))
           // len(list_distinct(a.s || b.s)) AS jaccard_bp
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) > 0
)
"""


def _simhash_sql() -> str:
    h = hash60_sql("t.tok")
    bit_sums = ",\n               ".join(
        f"SUM(2 * ((h >> {i}) & 1) - 1) AS w{i}" for i in range(D.SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN w{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(D.SIMHASH_BITS)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), hashed AS (
          SELECT doc_id, {h.replace('t.tok', 'tok')} AS h FROM toks
        ), bits AS (
          SELECT doc_id,
               {bit_sums}
          FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bits
    """


def _minhash_oracle_sql() -> str:
    """Ground truth for q_minhash_dedup: exhaustive exact Jaccard."""
    return (
        _PAIR_JACCARD
        + f"SELECT doc_a, doc_b, CAST(jaccard_bp AS BIGINT) AS jaccard_bp FROM pairs "
        f"WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}"
    )


def _dup_clusters_oracle_sql() -> str:
    """Transitive closure over the exhaustive near-dup pair set: cluster id
    = min reachable doc id. WITH RECURSIVE fixpoint (UNION dedups, so the
    reach set converges); components are tiny cliques, so the closure
    stays linear in practice."""
    body = _PAIR_JACCARD.replace("WITH sh", "WITH RECURSIVE sh", 1)
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
        )
        SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
        FROM reach GROUP BY src
        """
    )


def _dedup_keep_best_oracle_sql() -> str:
    """Closure (as in q_dup_clusters) + the q_quality bp formula, keep =
    row_number over (quality DESC, doc_id ASC)."""
    body = _PAIR_JACCARD.replace("WITH sh", "WITH RECURSIVE sh", 1)
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
        qbase AS (
          SELECT doc_id,
                 length(text) AS n_chars_calc,
                 len({_TOKS_RAW}) AS n_tokens,
                 len(list_filter({_TOKS_RAW}, t -> t IN ({_in_list(STOPWORDS)}))) AS stop_cnt,
                 length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt
          FROM documents
        ),
        qual AS (
          SELECT doc_id,
                 CAST((least(n_tokens, 100) * 100 * 5
                       + (CASE WHEN n_tokens > 0 THEN (10000 * stop_cnt) // n_tokens ELSE 0 END) * 3
                       + (10000 - CASE WHEN n_chars_calc > 0 THEN (10000 * punct_cnt) // n_chars_calc ELSE 0 END) * 2
                      ) // 10 AS BIGINT) AS quality_bp
          FROM qbase
        ),
        members AS (
          SELECT c.doc_id, c.cluster_id, q.quality_bp
          FROM clusters c JOIN qual q USING (doc_id)
        ),
        ranked AS (
          SELECT cluster_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                                    ORDER BY quality_bp DESC, doc_id ASC) AS rn
          FROM members
        ),
        aggd AS (
          SELECT cluster_id, COUNT(*) AS n_members, MAX(quality_bp) AS best_quality_bp
          FROM members GROUP BY cluster_id
        )
        SELECT a.cluster_id, CAST(r.doc_id AS BIGINT) AS keep_id,
               CAST(a.n_members AS BIGINT) AS n_members,
               CAST(a.best_quality_bp AS BIGINT) AS best_quality_bp
        FROM aggd a JOIN ranked r ON a.cluster_id = r.cluster_id AND r.rn = 1
        """
    )


def _minhash_est_oracle_sql() -> str:
    """Recomputes the PORTABLE 64-perm signatures (md5 hash60 → mod 2^31 →
    64 universal-hash mins), mirrors the 32x2 banding via a band-key
    equi-join (the same shape as lsh_candidate_pairs, not an O(n^2)
    filter), then emits estimate + exact Jaccard per candidate pair."""
    mins = ",\n                 ".join(
        f"MIN({perm_hash_sql('h', i)}) AS m{i}" for i in range(N_PERM)
    )
    sig_list = ", ".join(f"m{i}" for i in range(N_PERM))
    bands = D.LSH_BANDS
    rows = D.LSH_ROWS
    agree = f"len(list_filter(range({N_PERM}), i -> sa.sig[i + 1] = sb.sig[i + 1]))"
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
        ), bands AS (
          SELECT doc_id, j,
                 sig[{rows} * j + 1] AS r0, sig[{rows} * j + 2] AS r1
          FROM sigl, range({bands}) t(j)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.r0 = b.r0 AND a.r1 = b.r1
           AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST((10000 * {agree}) // {N_PERM} AS BIGINT) AS est_bp,
               CAST((10000 * len(list_intersect(ha.s, hb.s)))
                    // len(list_distinct(ha.s || hb.s)) AS BIGINT) AS jaccard_bp
        FROM cand c
        JOIN sigl sa ON sa.doc_id = c.doc_a
        JOIN sigl sb ON sb.doc_id = c.doc_b
        JOIN sh ha ON ha.doc_id = c.doc_a
        JOIN sh hb ON hb.doc_id = c.doc_b
    """


def _lsh_eval_oracle_sql() -> str:
    """Same portable-signature + banding reconstruction as
    _minhash_est_oracle_sql, plus the exact truth set (n² here is fine at
    oracle SF; the Spark side uses the share-a-shingle superset instead)
    reduced to the recall/precision summary row."""
    mins = ",\n                 ".join(
        f"MIN({perm_hash_sql('h', i)}) AS m{i}" for i in range(N_PERM)
    )
    sig_list = ", ".join(f"m{i}" for i in range(N_PERM))
    bands = D.LSH_BANDS
    rows = D.LSH_ROWS
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
        ), bands AS (
          SELECT doc_id, j,
                 sig[{rows} * j + 1] AS r0, sig[{rows} * j + 2] AS r1
          FROM sigl, range({bands}) t(j)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.r0 = b.r0 AND a.r1 = b.r1
           AND a.doc_id < b.doc_id
          WHERE {_truth_sample_sql("a.doc_id")}
        ), truth AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(a.s) > 0 AND len(b.s) > 0
            AND {_truth_sample_sql("a.doc_id")}
            AND (10000 * len(list_intersect(a.s, b.s)))
                // len(list_distinct(a.s || b.s)) >= {JACCARD_THRESHOLD_BP}
        ), hits AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
        ), counts AS (
          SELECT (SELECT COUNT(*) FROM truth) AS nt,
                 (SELECT COUNT(*) FROM cand) AS nc,
                 (SELECT COUNT(*) FROM hits) AS nh
        )
        SELECT CAST(nt AS BIGINT) AS n_true_pairs,
               CAST(nc AS BIGINT) AS n_lsh_candidates,
               CAST(nh AS BIGINT) AS n_true_found,
               CAST(CASE WHEN nt = 0 THEN 0
                         ELSE (10000 * nh) // nt END AS BIGINT) AS recall_bp,
               CAST(CASE WHEN nc = 0 THEN 0
                         ELSE (10000 * nh) // nc END AS BIGINT) AS precision_bp
        FROM counts
    """


def _pagerank_oracle_sql() -> str:
    """Unrolls the SAME PAGERANK_ITERS power iterations as the Spark
    plan: per-node contribution lists ordered by src, left-folded from
    0.0 — identical IEEE op sequence, so round(6) matches exactly."""
    d = repr(PAGERANK_DAMPING)
    bm = repr(1.0 - PAGERANK_DAMPING)
    n = "CAST((SELECT n FROM nn) AS DOUBLE)"
    ctes = [
        f"""filt AS (
          SELECT doc_a, doc_b FROM pairs
          WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}
        ), sym AS (
          SELECT DISTINCT doc_a AS src, doc_b AS dst FROM (
            SELECT doc_a, doc_b FROM filt
            UNION ALL SELECT doc_b, doc_a FROM filt
          )
        ), outdeg AS (
          SELECT src, COUNT(*) AS deg FROM sym GROUP BY src
        ), nodes AS (SELECT DISTINCT src AS node FROM sym),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        pr0 AS (SELECT node, 1.0 / {n} AS pr FROM nodes)"""
    ]
    for i in range(PAGERANK_ITERS):
        ctes.append(f"""s{i} AS (
          SELECT e.dst AS node,
                 list_reduce(list_prepend(0.0,
                   list(p.pr / d.deg ORDER BY e.src)), (a, b) -> a + b) AS s
          FROM sym e
          JOIN pr{i} p ON p.node = e.src
          JOIN outdeg d ON d.src = e.src
          GROUP BY e.dst
        ), pr{i + 1} AS (
          SELECT v.node,
                 ({bm} / {n}) + ({d} * COALESCE(s.s, 0.0)) AS pr
          FROM nodes v LEFT JOIN s{i} s USING (node)
        )""")
    return (
        _PAIR_JACCARD
        + ", "
        + ",\n".join(ctes)
        + f"""
        SELECT node AS doc_id, round(pr, 6) AS pagerank FROM pr{PAGERANK_ITERS}
    """
    )


ORACLES = {
    "q_dup_method_agreement": _PAIR_JACCARD
    + f"""
        , truth AS (
          SELECT doc_a, doc_b FROM pairs
          WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}
            AND {_truth_sample_sql("doc_a")}
        ),
        sims AS ({_simhash_sql()}),
        det AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sims a JOIN sims b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= {D.SIMHASH_MAX_DISTANCE}
            AND {_truth_sample_sql("a.doc_id")}
        ),
        agree AS (
          SELECT t.doc_a, t.doc_b FROM truth t
          JOIN det d ON t.doc_a = d.doc_a AND t.doc_b = d.doc_b
        ),
        c AS (
          SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
                 (SELECT COUNT(*) FROM det) AS n_detected,
                 (SELECT COUNT(*) FROM agree) AS n_both
        )
        SELECT CAST(n_truth AS BIGINT) AS n_truth,
               CAST(n_detected AS BIGINT) AS n_detected,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(CASE WHEN n_detected = 0 THEN 0
                         ELSE (10000 * n_both) // n_detected
                    END AS BIGINT) AS precision_bp,
               CAST(CASE WHEN n_truth = 0 THEN 0
                         ELSE (10000 * n_both) // n_truth
                    END AS BIGINT) AS recall_bp
        FROM c
    """,
    "q_incremental_dedup": f"""
        WITH sh AS (
          SELECT doc_id, text, {_SHINGLES} AS s FROM documents
        ),
        new AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
        old AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
        exact AS (
          SELECT DISTINCT n.doc_id FROM new n
          WHERE md5(n.text) IN (SELECT md5(text) FROM old)
        ),
        near AS (
          SELECT DISTINCT n.doc_id
          FROM new n JOIN old o
            ON len(list_intersect(n.s, o.s)) > 0
          WHERE (10000 * len(list_intersect(n.s, o.s)))
                  // len(list_distinct(n.s || o.s)) >= {JACCARD_THRESHOLD_BP}
        )
        SELECT n.doc_id,
               n.doc_id IN (SELECT doc_id FROM exact) AS exact_dup,
               n.doc_id IN (SELECT doc_id FROM near) AS near_dup,
               NOT (n.doc_id IN (SELECT doc_id FROM exact)
                    OR n.doc_id IN (SELECT doc_id FROM near)) AS admit
        FROM new n
    """,
    "q_pagerank": _pagerank_oracle_sql(),
    "q_graph_triangles": _PAIR_JACCARD
    + f"""
        , filt AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}
        ), tri AS (
          SELECT ab.u AS a, ab.v AS b, bc.v AS c
          FROM filt ab
          JOIN filt bc ON ab.v = bc.u
          JOIN filt ac ON ac.u = ab.u AND ac.v = bc.v
        ), nodes AS (
          SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY doc_id
    """,
    "q_graph_degree": _PAIR_JACCARD
    + f"""
        , filt AS (
          SELECT doc_a, doc_b FROM pairs
          WHERE jaccard_bp >= {JACCARD_THRESHOLD_BP}
        ), nodes AS (
          SELECT doc_a AS doc_id FROM filt
          UNION ALL SELECT doc_b FROM filt
        ), degrees AS (
          SELECT doc_id, COUNT(*) AS degree FROM nodes GROUP BY doc_id
        )
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM degrees GROUP BY degree
    """,
    "q_minhash_est": _minhash_est_oracle_sql(),
    "q_lsh_eval": _lsh_eval_oracle_sql(),
    "q_dup_source_matrix": _PAIR_JACCARD
    + f"""
        SELECT least(da.source, db.source) AS source_lo,
               greatest(da.source, db.source) AS source_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        WHERE p.jaccard_bp >= {JACCARD_THRESHOLD_BP}
        GROUP BY 1, 2
    """,
    "q_dup_clusters": _dup_clusters_oracle_sql(),
    "q_dup_clusters_chain": f"""
        WITH RECURSIVE base AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % {CHAIN_BLOCK} <> {CHAIN_BLOCK - 1}
        ),
        edges AS (
          SELECT src, dst FROM base UNION SELECT dst, src FROM base
        ),
        reach(src, dst) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
        FROM reach GROUP BY src
    """,
    "q_dedup_keep_best": _dedup_keep_best_oracle_sql(),
    "q_exact_dedup": """
        SELECT md5(text) AS content_key, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents GROUP BY md5(text)
    """,
    "q_minhash_dedup": _minhash_oracle_sql(),
    # exact detector: same exhaustive ground-truth oracle — recall 1 is the contract
    "q_exact_jaccard_pairs": _minhash_oracle_sql(),
    "q_ngram_jaccard": _PAIR_JACCARD
    + "SELECT doc_a, doc_b, CAST(jaccard_bp AS BIGINT) AS jaccard_bp FROM pairs",
    "q_shingle_containment": f"""
        WITH sh AS (
          SELECT doc_id, {_SHINGLES} AS s FROM documents
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.s, b.s)) AS inter,
                 len(a.s) AS na, len(b.s) AS nb
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s)) > 0
        )
        SELECT doc_a, doc_b,
               CAST((10000 * inter) // na AS BIGINT) AS contain_a_bp,
               CAST((10000 * inter) // nb AS BIGINT) AS contain_b_bp
        FROM pairs
        WHERE GREATEST((10000 * inter) // na, (10000 * inter) // nb)
              >= {CONTAIN_MIN_BP}
    """,
    "q_simhash": _simhash_sql(),
    # Exhaustive O(n^2) ground truth for the banded pigeonhole join:
    # every pair within hamming<=3 of the (independently recomputed)
    # signatures. Driver-green equality therefore PROVES the pigeonhole
    # recall claim on this data, same argument as the minhash oracle.
    "q_simhash_pairs": f"""
        WITH sims AS ({_simhash_sql()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {D.SIMHASH_MAX_DISTANCE}
    """,
}
