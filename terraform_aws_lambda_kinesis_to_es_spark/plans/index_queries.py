"""ANN-index-internals queries (promoted round 12; built and staged
in round 10 as plans/staged_r12.py with two-SF driver-protocol tests
and 100x scale evidence — see the head plan in plans/__init__.py).

A deliberately compact tranche (4) centered on the ANN index's
INTERNALS — the audits a team operating the round-10 persisted IVF+PQ
serving index (operators/ann_store.py) runs when tuning it — plus the
dedup-graph consistency audit:

- q_ivf_balance      — inverted-list occupancy profile (the skew that
                       decides probe fan-out and partition sizing)
- q_pq_distortion    — per-subspace quantization error mass (which
                       subspaces the codebook represents poorly)
- q_ann_probe_curve  — recall@k vs n_probes against the exact
                       L2 ground truth (the probe-width tuning curve)
- q_dup_transitivity — near-dup graph transitivity (how clique-like
                       verified duplicates are; decides whether
                       cluster-collapse or pair-greedy dedup is safe)

Cross-engine determinism: every output column is id-count / integer-
basis-point arithmetic or a FLOOR-quantized int64 sum of identically-
folded doubles — no float sums cross engines (the staged-r8/r9 recipe).
Reference citation: the reference engine (lambda/main.py, 174 lines)
has no vector or dedup layer; these are part of the repo's
training-data north star, mirroring q_ann_recall / q_lsh_eval's
audit-query pattern (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.plans import dedup_queries as DQ
from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
    N_QUERY_VECS,
    TOP_K,
    _pq_dist_sql,
    _sq_l2_full_sql,
    _vec,
    _VEC_CTE,
)

PROBE_WIDTHS = (2, 4, 8)


def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list occupancy profile of the IVF+PQ assignment: rows
    and corpus share (bp) per list. The operational read: a hot list
    caps probe selectivity (reading it costs its share of the corpus
    whatever n_probes is) and sizes the largest at-rest partition —
    the vector twin of q_bucket_occupancy.

    Scale: the assignment is ivfpq_index's one-scan/one-shuffle build;
    this adds a PQ_K-row keyed count and a window over those <= PQ_K
    rows. Share uses integer bp DIV — exact cross-engine."""
    idx = S.ivfpq_index(_vec(spark, sf_dir))
    counts = idx.groupBy("list_id").agg(F.count("*").alias("n_vecs"))
    return (
        counts.withColumn(
            "total", F.sum("n_vecs").over(Window.partitionBy(F.lit(1)))
        )
        .select(
            F.col("list_id").cast("bigint").alias("list_id"),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.expr("n_vecs * 10000 DIV total").cast("bigint").alias("share_bp"),
        )
    )


_IVF_BALANCE_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
sub AS (SELECT unnest(range({S.PQ_M})) AS m),
cb AS (
  SELECT m, vec_id AS code,
         v[m*{S.PQ_SUB}+1 : m*{S.PQ_SUB}+{S.PQ_SUB}] AS cv
  FROM vecs CROSS JOIN sub WHERE vec_id < {S.PQ_K}
),
scored AS (
  SELECT x.vec_id, cb.m, cb.code,
         {_pq_dist_sql('x.v', 'cb.cv', f'cb.m*{S.PQ_SUB}')} AS d
  FROM vecs x CROSS JOIN cb
),
assigned AS (
  SELECT vec_id, code AS list_id FROM (
    SELECT vec_id, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY total ASC, code ASC) AS rn
    FROM (
      SELECT vec_id, code,
             list_reduce(list_prepend(0.0, list(d ORDER BY m)),
                         (a, b) -> a + b) AS total
      FROM scored GROUP BY vec_id, code
    )
  ) WHERE rn = 1
)
SELECT CAST(list_id AS BIGINT) AS list_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) * 10000 // (SUM(COUNT(*)) OVER ()) AS BIGINT) AS share_bp
FROM assigned GROUP BY list_id
"""


def q_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ quantization error mass: for each subspace m,
    the int64 sum of FLOOR(1e4 x min-code squared L2) over the corpus
    (plus the vector count). The operational read: a subspace whose
    error mass dwarfs the others is the one to split or give more
    codes (FAISS's imbalanced-subquantizer diagnosis, Jégou et al.
    2011 §V) — and the trend of this number across index generations
    is the codebook-drift alarm for the frozen-quantizer extend path
    (operators/ann_store.py).

    Scale: one corpus scan x broadcast codebook, keyed partial-agg
    sums — map-side combining does ~all the work. FLOOR-quantized
    int64 sums are exact cross-engine (the d doubles come from
    identical 0.0-seeded folds on both sides)."""
    vecs = _vec(spark, sf_dir)
    cb = S.pq_codebook(vecs)
    scored = (
        S.pq_subvectors(vecs, "vec_id")
        .join(F.broadcast(cb), "m")
        .select("vec_id", "m", S.sq_l2(F.col("sub"), F.col("cv")).alias("d"))
    )
    dmin = scored.groupBy("vec_id", "m").agg(F.min("d").alias("dmin"))
    return (
        dmin.groupBy("m")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(F.floor(F.col("dmin") * 10000).cast("bigint"))
            .cast("bigint")
            .alias("err_total_bp"),
        )
        .select(F.col("m").cast("bigint").alias("m"), "n_vecs", "err_total_bp")
    )


_PQ_DISTORTION_SQL = f"""
WITH vecs AS ({_VEC_CTE}),
sub AS (SELECT unnest(range({S.PQ_M})) AS m),
cb AS (
  SELECT m, vec_id AS code,
         v[m*{S.PQ_SUB}+1 : m*{S.PQ_SUB}+{S.PQ_SUB}] AS cv
  FROM vecs CROSS JOIN sub WHERE vec_id < {S.PQ_K}
),
scored AS (
  SELECT x.vec_id, cb.m, cb.code,
         {_pq_dist_sql('x.v', 'cb.cv', f'cb.m*{S.PQ_SUB}')} AS d
  FROM vecs x CROSS JOIN cb
),
mins AS (
  SELECT vec_id, m, MIN(d) AS dmin FROM scored GROUP BY vec_id, m
)
SELECT CAST(m AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(FLOOR(dmin * 10000) AS BIGINT)) AS BIGINT) AS err_total_bp
FROM mins GROUP BY m
"""


def q_ann_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k AND candidate cost of the IVF+PQ index vs probe width —
    the tuning curve that picks n_probes for the serving index: per
    width, the ADC-scored candidate count (the serving cost, monotone
    in width by construction) and how many of the exact squared-L2
    top-k the ADC top-k retains over the bounded query panel.

    MEASURED FINDING this curve exists to expose: recall@k is NOT
    monotone in probe width under ADC ranking (sf0.001/sf0.01 panel:
    4000 bp at 2 probes -> 3400 bp at 8). Widening the probe only adds
    candidates, but they are ranked by the QUANTIZED distance — extra
    candidates from farther lists can displace true neighbors the
    coarse probe filter was implicitly protecting; the curve converges
    to the exhaustive-ADC ceiling, it does not climb to 10000. The
    production fix is re-ranking (knn_ivfpq_rerank), whose exact leg
    restores monotonicity — this audit quantifies WHY the rerank stage
    earns its cost. Output is id-set arithmetic (counts, integer bp),
    reproducible cross-engine although both rankings order by floats.

    Scale: ONE probe-pruned index join at the WIDEST width
    (S._ivfpq_adc at max(PROBE_WIDTHS) with keep_probe_rank — a
    candidate's adist does not depend on n_probes, and the candidate
    set at width w is exactly the widest set filtered to
    probe_rank <= w), persisted and fanned out to the per-width legs
    through a 3-row broadcast widths dimension — the r12-optimization
    restructure of the original one-full-detector-per-width form
    (which re-built the index and re-scored ADC once per width, and
    re-derived all of it a second time for the candidate-count leg:
    6 detector builds; plan 3140 -> ~600 lines, measured ~4x at
    sf0.1). The exact truth leg is the bounded-panel x one-corpus-scan
    form (knn_bruteforce_l2 — q_ann_recall's VERDICT-r5-approved
    shape, railed), persisted for its two consumers (hit semi-join +
    n_true total). Cache lifecycle: both frames are candidate-/panel-
    bounded; bench/driver sessions clearCache() between queries."""
    from pyspark.sql import Window as W

    vecs = _vec(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS)
    truth = (
        S.knn_bruteforce_l2(vecs, queries, k=TOP_K)
        .select("query_id", "neighbor_id")
        .persist()
    )
    summed = S._ivfpq_adc(
        vecs, queries, n_probes=max(PROBE_WIDTHS), keep_probe_rank=True
    ).persist()
    widths = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(w).cast("bigint") for w in PROBE_WIDTHS])
        ).alias("n_probes")
    )
    rank_w = W.partitionBy("n_probes", "query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    cands = (
        summed.join(
            F.broadcast(widths), F.col("probe_rank") <= F.col("n_probes")
        )
        .withColumn("rank", F.row_number().over(rank_w))
        .select(
            "n_probes",
            "query_id",
            "neighbor_id",
            (F.col("rank") <= TOP_K).alias("in_topk"),
        )
    )
    hits = (
        cands.filter("in_topk")
        .join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("n_probes")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    n_cands = cands.groupBy("n_probes").agg(
        F.count("*").cast("bigint").alias("n_cands")
    )
    n_true = truth.groupBy().agg(F.count("*").cast("bigint").alias("n_true"))
    # left join + coalesce (r10 ADVICE): a probe width with ZERO
    # true-top-k hits must report recall_bp=0, not vanish from the
    # curve (the inner join dropped the row on both legs — parity
    # held, but the tuning curve silently lost a point)
    return (
        n_cands.join(hits, "n_probes", "left")
        .crossJoin(F.broadcast(n_true))  # 1-row truth total attach
        .select(
            "n_probes",
            "n_cands",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("bigint")
            .alias("n_hits"),
            "n_true",
            F.expr("coalesce(n_hits, 0) * 10000 DIV n_true")
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


def _probe_curve_sql() -> str:
    widths = ", ".join(str(w) for w in PROBE_WIDTHS)
    return f"""
WITH vecs AS ({_VEC_CTE}),
sub AS (SELECT unnest(range({S.PQ_M})) AS m),
cb AS (
  SELECT m, vec_id AS code,
         v[m*{S.PQ_SUB}+1 : m*{S.PQ_SUB}+{S.PQ_SUB}] AS cv
  FROM vecs CROSS JOIN sub WHERE vec_id < {S.PQ_K}
),
scored AS (
  SELECT x.vec_id, cb.m, cb.code,
         {_pq_dist_sql('x.v', 'cb.cv', f'cb.m*{S.PQ_SUB}')} AS d
  FROM vecs x CROSS JOIN cb
),
enc AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d ASC, code ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
assigned AS (
  SELECT vec_id, code AS list_id FROM (
    SELECT vec_id, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY total ASC, code ASC) AS rn
    FROM (
      SELECT vec_id, code,
             list_reduce(list_prepend(0.0, list(d ORDER BY m)),
                         (a, b) -> a + b) AS total
      FROM scored GROUP BY vec_id, code
    )
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS query_id, m, code, d FROM scored
  WHERE vec_id < {N_QUERY_VECS}
),
widths AS (SELECT unnest([{widths}]) AS n_probes),
probe_rank AS (
  SELECT query_id, code AS list_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY total ASC, code ASC) AS pr
  FROM (
    SELECT query_id, code,
           list_reduce(list_prepend(0.0, list(d ORDER BY m)),
                       (a, b) -> a + b) AS total
    FROM lut GROUP BY query_id, code
  )
),
probes_w AS (
  SELECT w.n_probes, p.query_id, p.list_id
  FROM probe_rank p JOIN widths w ON p.pr <= w.n_probes
),
summed_w AS (
  SELECT p.n_probes, l.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_prepend(0.0, list(l.d ORDER BY l.m)),
                     (a, b) -> a + b) AS adist
  FROM enc e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN probes_w p ON p.list_id = a.list_id
  JOIN lut l ON l.query_id = p.query_id AND l.m = e.m AND l.code = e.code
  WHERE e.vec_id <> p.query_id
  GROUP BY p.n_probes, l.query_id, e.vec_id
),
ranked_w AS (
  SELECT n_probes, query_id, neighbor_id FROM (
    SELECT n_probes, query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY n_probes, query_id
                              ORDER BY adist ASC, neighbor_id ASC) AS rank
    FROM summed_w
  ) WHERE rank <= {TOP_K}
),
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERY_VECS}),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_sq_l2_full_sql('c.v', 'q.qv')} ASC, c.vec_id ASC
           ) AS rank
    FROM vecs c CROSS JOIN q
    WHERE c.vec_id <> q.query_id
  ) WHERE rank <= {TOP_K}
),
cand_counts AS (
  SELECT n_probes, CAST(COUNT(*) AS BIGINT) AS n_cands
  FROM summed_w GROUP BY n_probes
),
hit_counts AS (
  SELECT r.n_probes, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ranked_w r
  JOIN truth t ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
  GROUP BY r.n_probes
)
SELECT CAST(c.n_probes AS BIGINT) AS n_probes,
       c.n_cands,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       CAST(COALESCE(h.n_hits, 0) * 10000 // (SELECT COUNT(*) FROM truth)
            AS BIGINT) AS recall_bp
FROM cand_counts c LEFT JOIN hit_counts h ON h.n_probes = c.n_probes
"""


def q_dup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph transitivity: over the EXACT verified pair set
    (the recall-1 prefix-filtered detector q_exact_jaccard_pairs
    declares), one row of (n_pairs, n_wedges, n_triangles,
    transitivity_bp = 3T/W in bp). The operational read: transitivity
    near 10000 means duplicates form cliques, so collapsing clusters
    to one keeper (q_dedup_keep_best) loses nothing; low transitivity
    means chain-shaped near-dup drift, where cluster collapse
    over-merges and pair-greedy dedup is the safe policy.

    Scale: wedges need NO pair-pair join — W = sum over nodes of
    C(degree, 2) off a degree count; triangles are one pair-set
    self-join + a semi-join (output-shaped, bounded by the detector's
    verified pairs, the standing r8 growth-driver argument). All
    output integer arithmetic."""
    pairs = DQ.q_exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pairs = pairs.persist()
    n_pairs = pairs.groupBy().agg(F.count("*").cast("bigint").alias("n_pairs"))
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.groupBy().agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("bigint").alias("n_wedges")
    )
    p1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    p2 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    open_tris = p1.join(p2, "a").filter(F.col("b") < F.col("c"))
    closed = open_tris.join(
        pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    tris = closed.groupBy().agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    return (
        n_pairs.crossJoin(F.broadcast(wedges))  # three 1-row aggregates
        .crossJoin(F.broadcast(tris))
        .select(
            "n_pairs",
            "n_wedges",
            "n_triangles",
            F.expr("30000 * n_triangles DIV NULLIF(n_wedges, 0)")
            .cast("bigint")
            .alias("transitivity_bp"),
        )
    )


_DUP_TRANSITIVITY_SQL = (
    DQ._PAIR_JACCARD
    + f""",
filt AS (
  SELECT doc_a, doc_b FROM pairs WHERE jaccard_bp >= {DQ.JACCARD_THRESHOLD_BP}
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT doc_a AS node FROM filt
    UNION ALL SELECT doc_b FROM filt
  ) GROUP BY node
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM filt p1
  JOIN filt p2 ON p1.doc_a = p2.doc_a AND p1.doc_b < p2.doc_b
  WHERE EXISTS (
    SELECT 1 FROM filt e WHERE e.doc_a = p1.doc_b AND e.doc_b = p2.doc_b
  )
)
SELECT CAST((SELECT COUNT(*) FROM filt) AS BIGINT) AS n_pairs,
       CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(30000 * n_triangles
              // NULLIF((SELECT SUM(d * (d - 1) // 2) FROM deg), 0)
            AS BIGINT) AS transitivity_bp
FROM tri
"""
)


QUERIES = {
    "q_ivf_balance": q_ivf_balance,
    "q_pq_distortion": q_pq_distortion,
    "q_ann_probe_curve": q_ann_probe_curve,
    "q_dup_transitivity": q_dup_transitivity,
}

ORACLES = {
    "q_ivf_balance": _IVF_BALANCE_SQL,
    "q_pq_distortion": _PQ_DISTORTION_SQL,
    "q_ann_probe_curve": _probe_curve_sql(),
    "q_dup_transitivity": _DUP_TRANSITIVITY_SQL,
}
