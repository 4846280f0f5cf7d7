"""Index-serving diagnostics + curation/QA audit queries (the
round-11 tranche, staged in round 10 as plans/staged_r11.py and
promoted into the declared surface in round 11 — the same staging
contract as the round-7..10 tranches promoted as
plans/curation_queries.py, plans/corpus_queries.py,
plans/audit_queries.py, and plans/hygiene_queries.py: implemented,
oracle-backed, and pytest-verified with the driver's own compare
protocol at BOTH sf0.001 and sf0.01 before declaration;
tests/test_diagnostics_queries.py).

Contents — index-serving diagnostics the round-9 verdict suggested,
plus curation/QA audits the surface previously lacked:

- ``q_index_churn``: per-band LSH bucket-key churn between two corpus
  snapshots (the q_snapshot_delta cohorts) — how many (band, bkey)
  buckets a recrawl adds/removes/keeps, i.e. the write-amplification
  profile of keeping the persisted near-dup index fresh
  incrementally (extend + compact) instead of rebuilding.
- ``q_band_yield``: marginal candidate/verified-pair yield per LSH
  band, pairs attributed to the LOWEST band that finds them — the
  diagnostic that says how many bands a probe actually needs (probe
  cost is linear in bands served).
- ``q_minhash_ablation``: signature-size error curve — MinHash
  Jaccard-estimate error vs the exact value at 16/32/64-permutation
  signature PREFIXES of one portable signature (no recompute), over
  the banded candidate pairs. The "how small can the signature get"
  sizing audit for signature storage (the persisted index's shingle
  artifact dwarfs it; the signature is the probe-time cost).
- ``q_dedup_cascade``: staged dedup funnel accounting — docs surviving
  exact-digest collapse, then normalized-text collapse, then near-dup
  removal (lower-id survivor rule), with per-stage removal counts:
  the marginal-yield report that justifies (or kills) each cascade
  stage at 100 TB.
- ``q_hard_negatives``: for a deterministic hash-sampled anchor panel,
  the single most-similar vector with a DIFFERENT label — hard
  negative mining for contrastive training, exact on the panel
  (bounded panel x one corpus scan, the q_embed_near_dup_sampled
  rail).
- ``q_embed_norm_audit``: per-label vector-norm QA — unit-norm
  compliance count and min/max norms; the "did every shard actually
  L2-normalize" check run before any cosine index build.
- ``q_filter_overlap``: quality-rule co-failure matrix over the C4 +
  Gopher rule families (diagonal = marginal fail counts) — the
  redundancy audit that finds subsumed filters before paying for
  them corpus-wide.
- ``q_rater_kappa``: per-source agreement table between the C4 and
  Gopher keep decisions (both-keep / one-only / both-drop counts +
  observed agreement bp) — the two-rater reliability layout whose
  kappa any report tool derives from the four cells.
- ``q_langid_confusion``: language-ID stability audit — the marker
  heuristic on the FULL text vs its FIRST HALF, confusion-matrix
  counts; prefix-unstable predictions flag docs whose routing
  flips under truncation.
- ``q_pack_efficiency``: context-length ablation — per candidate
  sequence length, how many sequences a doc-per-sequence packing
  emits and the padding share it wastes; the report that picks the
  training sequence length.
- ``q_image_border_uniformity``: border-vs-center gray audit through
  the REAL PPM decoder — letterbox/solid-border detection (uniform
  border bucket), the screenshot/frame screen.
- ``q_growth_accounting``: daily new / retained / resurrected /
  churned user counts over the events stream — the standard growth
  decomposition (churn attributed to the day after the activity
  gap opens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    MOD31,
    N_PERM,
    hash60,
    hash60_sql,
    perm_hash_sql,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators import dedup as D
from terraform_aws_lambda_kinesis_to_es_spark.operators import similarity as S
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import (
    LANG_MARKERS,
    predicted_lang,
    tokens,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (
    SD_ADD_MOD,
    SD_ADD_OFFSET,
    SD_DROP_MOD,
    SD_EDIT_MOD,
    _snapshot_v2,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.dedup_queries import (
    JACCARD_THRESHOLD_BP,
    _PAIR_JACCARD,
    _SHINGLES,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    _TOKS,
    _in_list,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    ORACLES as _TEXT_ORACLES,
)
from terraform_aws_lambda_kinesis_to_es_spark.plans.text_queries import (
    q_c4_filters,
    q_gopher_filters,
)
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split

# ------------------------------------------------- shared SQL fragments

_SIG_MINS = ",\n                 ".join(
    f"MIN({perm_hash_sql('h', i)}) AS m{i}" for i in range(N_PERM)
)
_SIG_LIST = ", ".join(f"m{i}" for i in range(N_PERM))


def _sigl_sql(docs_rel: str) -> str:
    """DuckDB CTE body producing (doc_id, sig[64]) portable MinHash
    signatures for a relation exposing (doc_id, text) — the
    q_minhash_est oracle's reconstruction, parameterized over the
    source relation."""
    return f"""
  sh_{docs_rel} AS (
    SELECT doc_id, {_SHINGLES} AS s FROM {docs_rel}
  ), hs_{docs_rel} AS (
    SELECT doc_id, ({hash60_sql("g")}) % {MOD31} AS h
    FROM (SELECT doc_id, unnest(s) AS g FROM sh_{docs_rel} WHERE len(s) > 0)
  ), sigs_{docs_rel} AS (
    SELECT doc_id,
                 {_SIG_MINS}
    FROM hs_{docs_rel} GROUP BY doc_id
  ), sigl_{docs_rel} AS (
    SELECT doc_id, [{_SIG_LIST}] AS sig FROM sigs_{docs_rel}
  )"""


def _bands_sql(docs_rel: str) -> str:
    """(doc_id, band, bkey) rows from sigl_{docs_rel} — the string bkey
    mirrors operators.dedup.banded_keys (concat_ws('_', r0, r1))."""
    return f"""
  bands_{docs_rel} AS (
    SELECT doc_id, j AS band,
           CAST(sig[{D.LSH_ROWS} * j + 1] AS VARCHAR) || '_' ||
           CAST(sig[{D.LSH_ROWS} * j + 2] AS VARCHAR) AS bkey
    FROM sigl_{docs_rel}, range({D.LSH_BANDS}) t(j)
  )"""


_V2_SQL = f"""
  v2docs AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % {SD_EDIT_MOD} = 0 THEN text || ' rev2'
                ELSE text END AS text
    FROM documents WHERE doc_id % {SD_DROP_MOD} <> 0
    UNION ALL
    SELECT doc_id + {SD_ADD_OFFSET}, source, text
    FROM documents WHERE doc_id % {SD_ADD_MOD} = 0
  )"""


def _portable_banded(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) from the PORTABLE signature — the SQL-
    mirrorable twin of the xxhash64 production banding."""
    sh = D.with_shingles(docs).select("doc_id", "shingles")
    sig = D.with_minhash_signature(
        sh.filter(F.size("shingles") > 0), portable=True
    )
    return D.banded_keys(sig)


# ---------------------------------------------------------- index churn


def q_index_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket-key churn between snapshot v1 (documents)
    and v2 (the q_snapshot_delta cohorts): n_stable / n_added /
    n_removed DISTINCT (band, bkey) buckets. This is the
    generation-to-generation write profile of the persisted LSH index
    (operators/dedup.py save/extend/compact): stable buckets survive
    an incremental extend untouched, added ones are new parquet rows,
    removed ones are garbage until compaction — so the churn curve
    prices extend-then-compact against a full rebuild.

    Scale shape: two row-local signature passes, one distinct per
    side partitioned by the (band, bkey) it immediately joins on, and
    a full-outer join that is band-local (band is in the key) — no
    corpus-wide exchange beyond the banding's own."""
    docs = load_split(spark, sf_dir, "documents")
    k1 = _portable_banded(docs).select("band", "bkey").distinct()
    k2 = _portable_banded(_snapshot_v2(docs)).select("band", "bkey").distinct()
    j = k1.withColumn("in1", F.lit(1)).join(
        k2.withColumn("in2", F.lit(1)), ["band", "bkey"], "full_outer"
    )
    return j.groupBy(F.col("band").cast("bigint").alias("band")).agg(
        F.sum(
            F.when(F.col("in1").isNotNull() & F.col("in2").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_stable"),
        F.sum(F.when(F.col("in1").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("in2").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )


_INDEX_CHURN_SQL = f"""
WITH {_V2_SQL},
{_sigl_sql('documents')},
{_bands_sql('documents')},
{_sigl_sql('v2docs')},
{_bands_sql('v2docs')},
k1 AS (SELECT DISTINCT band, bkey FROM bands_documents),
k2 AS (SELECT DISTINCT band, bkey FROM bands_v2docs),
j AS (
  SELECT COALESCE(k1.band, k2.band) AS band,
         k1.band IS NOT NULL AS in1, k2.band IS NOT NULL AS in2
  FROM k1 FULL OUTER JOIN k2 USING (band, bkey)
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(SUM(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END) AS BIGINT) AS n_stable,
       CAST(SUM(CASE WHEN NOT in1 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN NOT in2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM j GROUP BY band
"""


# ----------------------------------------------------------- band yield


def q_band_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal yield per LSH band: every banded candidate pair is
    attributed to the LOWEST band index that buckets it together, then
    exact-Jaccard verified — n_candidates / n_verified per first-band.
    A front-loaded curve (most pairs found by the first few bands)
    means a probe can serve fewer bands at the same recall; a flat
    curve says every band earns its probe cost.

    Scale shape: one signature pass, one (band, bkey)-keyed shuffle,
    pair expansion bounded by bucket contents (pairs_within_buckets'
    argument), a min-band rollup keyed on the pair, and the standard
    candidate-bounded verify join."""
    docs = load_split(spark, sf_dir, "documents")
    # persisted (r12 optimization): feeds the signature/banding chain AND
    # the verify join below — 2 consumers, house staged-materialization rule
    sh = D.with_shingles(docs).select("doc_id", "shingles").persist()
    sig = D.with_minhash_signature(
        sh.filter(F.size("shingles") > 0), portable=True
    )
    banded = D.banded_keys(sig)
    grouped = banded.groupBy("band", "bkey").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    pairs = (
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
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.min("band").alias("first_band"))
    )
    verified = D.verify_pairs_jaccard(
        pairs.select("id_a", "id_b"), sh, threshold_bp=JACCARD_THRESHOLD_BP
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    return (
        pairs.join(
            verified.withColumn("ok", F.lit(1)), ["id_a", "id_b"], "left"
        )
        .groupBy(F.col("first_band").cast("bigint").alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            F.sum(F.coalesce(F.col("ok"), F.lit(0)))
            .cast("bigint")
            .alias("n_verified"),
        )
    )


_BAND_YIELD_SQL = f"""
WITH
{_sigl_sql('documents')},
{_bands_sql('documents')},
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, MIN(a.band) AS first_band
  FROM bands_documents a JOIN bands_documents b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
ver AS (
  SELECT c.first_band, c.id_a, c.id_b,
         CASE WHEN (10000 * len(list_intersect(sa.s, sb.s)))
                   // (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
                   >= {JACCARD_THRESHOLD_BP}
              THEN 1 ELSE 0 END AS ok
  FROM cand c
  JOIN sh_documents sa ON sa.doc_id = c.id_a
  JOIN sh_documents sb ON sb.doc_id = c.id_b
)
SELECT CAST(first_band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(ok) AS BIGINT) AS n_verified
FROM ver GROUP BY first_band
"""


# ------------------------------------------------------ minhash ablation

AB_PERMS = (16, 32, 64)


def q_minhash_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-size error curve: on the (fixed) 64-perm banded
    candidate pairs, the MinHash Jaccard estimate from the FIRST r
    permutations of the same portable signature (r in AB_PERMS) against
    the exact Jaccard — per r: pair count, sum of absolute errors, and
    the signed error sum (bias direction). Integer bp end to end (the
    sums are emitted unreduced — no signed integer division, whose
    floor-vs-truncate rules differ across engines).

    Scale shape: the q_minhash_est plan plus a 3-row explode per
    candidate pair; signature prefixes reuse the one signature — no
    recompute per r."""
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
    per_pair = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.expr(
                # sets: |A∪B| = |A|+|B|−|A∩B|
                "CAST((10000 * size(array_intersect(sh_a, sh_b)))"
                " DIV (size(sh_a) + size(sh_b)"
                "      - size(array_intersect(sh_a, sh_b))) AS BIGINT)"
            ).alias("jaccard_bp"),
            "mh_a",
            "mh_b",
        )
        .withColumn("n_perm", F.explode(F.array(*[F.lit(r) for r in AB_PERMS])))
        .withColumn(
            "est_bp",
            F.expr(
                "CAST((10000 * size(filter(zip_with(slice(mh_a, 1, n_perm),"
                " slice(mh_b, 1, n_perm), (x, y) -> x = y), b -> b)))"
                " DIV n_perm AS BIGINT)"
            ),
        )
    )
    return per_pair.groupBy(F.col("n_perm").cast("bigint").alias("n_perm")).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.abs(F.col("est_bp") - F.col("jaccard_bp")))
        .cast("bigint")
        .alias("sum_abs_err_bp"),
        F.sum(F.col("est_bp") - F.col("jaccard_bp"))
        .cast("bigint")
        .alias("sum_err_bp"),
    )


def _minhash_ablation_sql() -> str:
    agree = "len(list_filter(range(r), i -> sa.sig[i + 1] = sb.sig[i + 1]))"
    return f"""
WITH
{_sigl_sql('documents')},
{_bands_sql('documents')},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_documents a JOIN bands_documents b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
per AS (
  SELECT r,
         (10000 * {agree}) // r AS est_bp,
         (10000 * len(list_intersect(ha.s, hb.s)))
           // (len(ha.s) + len(hb.s) - len(list_intersect(ha.s, hb.s)))
           AS jaccard_bp
  FROM cand c
  CROSS JOIN (SELECT unnest([{", ".join(str(r) for r in AB_PERMS)}]) AS r)
  JOIN sigl_documents sa ON sa.doc_id = c.id_a
  JOIN sigl_documents sb ON sb.doc_id = c.id_b
  JOIN sh_documents ha ON ha.doc_id = c.id_a
  JOIN sh_documents hb ON hb.doc_id = c.id_b
)
SELECT CAST(r AS BIGINT) AS n_perm,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(abs(est_bp - jaccard_bp)) AS BIGINT) AS sum_abs_err_bp,
       CAST(SUM(est_bp - jaccard_bp) AS BIGINT) AS sum_err_bp
FROM per GROUP BY r
"""


# ------------------------------------------------------- dedup cascade

_NORM_EXPR = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', ' '), ' +', ' '))"
)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)
DC_EXACT_MOD = 11
DC_EXACT_OFFSET = 2_000_000_000
DC_NORM_MOD = 7
DC_NORM_OFFSET = 3_000_000_000


def q_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-funnel accounting: per stage, input/removed/output doc
    counts for the standard cascade — (1) exact content-digest
    collapse, (2) normalized-text digest collapse on the survivors
    (lowercase, punctuation stripped, whitespace squeezed — the
    q_text_normalize rule), (3) near-dup removal on the remaining
    survivors (every doc with a verified Jaccard-{JACCARD_THRESHOLD_BP}bp
    partner of SMALLER id is removed). Survivor rule everywhere: the
    minimum doc_id of the group. The report each stage must justify
    with marginal yield before running corpus-wide.

    The corpus is deterministically ENRICHED so every stage has real
    work at every SF (the fixture plants near-dups but no byte-exact
    dups — the q_pii_density enrichment precedent): a verbatim clone
    of the %{DC_EXACT_MOD} cohort (exact-stage mass) and an UPPERCASED
    clone of the %{DC_NORM_MOD} cohort (normalization-stage mass), each
    under guaranteed-new ids above the originals, so the min-id
    survivor is always the original.

    Scale shape: two digest groupBys (map-side combining), the
    recall-1 LSH pipeline on stage-2 survivors (Spark side; the
    oracle's exhaustive Jaccard is oracle-SF only), and three 1-row
    aggregates unioned."""
    base = load_split(spark, sf_dir, "documents").select("doc_id", "text")
    # NOT persisted (measured): caching this ~1.25x-corpus union costs
    # more than the repeated scans it saves — the branches are cheap
    # parquet scans that whole-stage-fuse into their consumers, and a
    # cache barrier between them blocks that (min 4.8 s uncached vs
    # 6.1 s cached at sf0.1; the 1-row totals persist below is where
    # the real win is)
    docs = (
        base.unionByName(
            base.filter(F.col("doc_id") % DC_EXACT_MOD == 0).select(
                (F.col("doc_id") + DC_EXACT_OFFSET).alias("doc_id"), "text"
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % DC_NORM_MOD == 0).select(
                (F.col("doc_id") + DC_NORM_OFFSET).alias("doc_id"),
                F.upper(F.col("text")).alias("text"),
            )
        )
    )
    # The survivor-id frames are PERSISTED (r12 optimization, guide §5):
    # each is a tiny ids-only relation with two consumers (its count leg
    # below + the next stage's join), and without the cache the one
    # action that materializes the four-way totals product re-derives
    # the s1 digest groupBy 3x and the s2 normalize+groupBy 2x — Spark
    # does not share common subtrees across join branches. The docs
    # union itself stays UNCACHED by measurement (comment above).
    s1 = (
        docs.groupBy(hash60(F.col("text")).alias("dg"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .persist()
    )
    s1docs = s1.join(docs, "doc_id")
    s2 = (
        s1docs.groupBy(hash60(F.expr(_NORM_EXPR)).alias("ng"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .persist()
    )
    s2docs = s2.join(docs, "doc_id")
    pairs = D.minhash_dedup_pairs(s2docs, threshold_bp=JACCARD_THRESHOLD_BP)
    removed3 = pairs.select("doc_b").distinct()
    n0 = docs.agg(F.count("*").cast("bigint").alias("n0"))
    n1 = s1.agg(F.count("*").cast("bigint").alias("n1"))
    n2 = s2.agg(F.count("*").cast("bigint").alias("n2"))
    n3r = removed3.agg(F.count("*").cast("bigint").alias("n3r"))
    # 1-row x 1-row products: the totals attach (whitelisted in
    # tests/test_plan_shape.py). PERSISTED: the three stage frames below
    # each reference this subtree, and without the cache the UNION
    # re-derives the entire funnel lineage — including the near-dup
    # detector — once per branch (measured 9.6 s -> the detector ran
    # 3x; the cache makes it run once, round-11 bench note in PERF.md).
    base = n0.crossJoin(n1).crossJoin(n2).crossJoin(n3r).persist()
    rows = [
        ("exact", "n0", "n1"),
        ("normalized", "n1", "n2"),
    ]
    frames = [
        base.select(
            F.lit(stage).alias("stage"),
            F.col(a).alias("n_in"),
            (F.col(a) - F.col(b)).cast("bigint").alias("n_removed"),
            F.col(b).alias("n_out"),
        )
        for stage, a, b in rows
    ]
    frames.append(
        base.select(
            F.lit("near_dup").alias("stage"),
            F.col("n2").alias("n_in"),
            F.col("n3r").alias("n_removed"),
            (F.col("n2") - F.col("n3r")).cast("bigint").alias("n_out"),
        )
    )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


_DEDUP_CASCADE_SQL = f"""
WITH alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DC_EXACT_OFFSET}, text FROM documents
  WHERE doc_id % {DC_EXACT_MOD} = 0
  UNION ALL
  SELECT doc_id + {DC_NORM_OFFSET}, upper(text) FROM documents
  WHERE doc_id % {DC_NORM_MOD} = 0
),
s1 AS (
  SELECT MIN(doc_id) AS doc_id FROM alldocs
  GROUP BY {hash60_sql("text")}
),
s2 AS (
  SELECT MIN(d.doc_id) AS doc_id
  FROM s1 JOIN alldocs d USING (doc_id)
  GROUP BY {hash60_sql(_NORM_SQL)}
),
sh2 AS (
  SELECT d.doc_id, {_SHINGLES} AS s
  FROM s2 JOIN alldocs d USING (doc_id)
),
removed3 AS (
  SELECT DISTINCT b.doc_id
  FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) > 0
    AND (10000 * len(list_intersect(a.s, b.s)))
        // (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        >= {JACCARD_THRESHOLD_BP}
),
t AS (
  SELECT (SELECT COUNT(*) FROM alldocs) AS n0,
         (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM removed3) AS n3r
)
SELECT 'exact' AS stage, CAST(n0 AS BIGINT) AS n_in,
       CAST(n0 - n1 AS BIGINT) AS n_removed, CAST(n1 AS BIGINT) AS n_out
FROM t
UNION ALL
SELECT 'normalized', CAST(n1 AS BIGINT), CAST(n1 - n2 AS BIGINT),
       CAST(n2 AS BIGINT) FROM t
UNION ALL
SELECT 'near_dup', CAST(n2 AS BIGINT), CAST(n3r AS BIGINT),
       CAST(n2 - n3r AS BIGINT) FROM t
"""


# ------------------------------------------------------- hard negatives

HN_SAMPLE_TARGET = 96


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining, exact on a bounded panel: for each anchor
    in a deterministic id-hash sample (expected ~HN_SAMPLE_TARGET
    anchors at every corpus size — the q_embed_near_dup_sampled rail),
    the single most-similar corpus vector with a DIFFERENT label
    (ties on neighbor id). The contrastive-training batch builder's
    mining step, exact where it runs.

    Scale shape: broadcast the bounded anchor panel into ONE corpus
    scan; the per-anchor top-1 is a window over anchor-keyed
    candidates — never corpus^2."""
    emb = load_split(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        S.as_double(F.col("embedding")).alias("v"),
    )
    k_mod = max(1, vecs.count() // HN_SAMPLE_TARGET)
    anchors = vecs.filter(
        hash60(F.col("vec_id").cast("string")) % k_mod == 0
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
        S.norm(F.col("v")).alias("an"),
    )
    corpus = vecs.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("v").alias("pv"),
        S.norm(F.col("v")).alias("pn"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(F.col("neg_label") != F.col("anchor_label"))
        .withColumn(
            "sim_raw",
            S.cosine_hoisted(F.col("av"), F.col("pv"), F.col("an"), F.col("pn")),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("sim_raw"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round("sim_raw", 4).alias("sim"),
        )
    )


def _hard_negatives_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _cosine_sql,
    )

    gate = (
        f"({hash60_sql('CAST(vec_id AS VARCHAR)')})"
        f" % GREATEST(1, (SELECT COUNT(*) FROM embeddings)"
        f" // {HN_SAMPLE_TARGET}) = 0"
    )
    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         embedding::DOUBLE[] AS v
  FROM embeddings
),
anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, v AS av
  FROM vecs WHERE {gate}
),
scored AS (
  SELECT a.anchor_id, a.anchor_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         {_cosine_sql("a.av", "c.v")} AS sim_raw
  FROM vecs c CROSS JOIN anchors a
  WHERE c.label <> a.anchor_label
)
SELECT anchor_id, anchor_label, neg_id, neg_label,
       ROUND(sim_raw, 4) AS sim
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor_id
                           ORDER BY sim_raw DESC, neg_id ASC) = 1
"""


# ------------------------------------------------------ embed norm audit

NORM_UNIT_LO = 0.99
NORM_UNIT_HI = 1.01


def q_embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm QA: count of unit-norm vectors (rounded
    L2 norm within [{NORM_UNIT_LO}, {NORM_UNIT_HI}]) plus the min/max
    norms — the 'did normalization actually run' check before cosine
    index builds (an unnormalized shard silently biases every
    dot-product ranking). Norms are the bit-identical left-assoc fold
    (similarity-module rule), rounded once per row.

    Scale shape: map-only per-row norm + one bounded keyed agg."""
    emb = load_split(spark, sf_dir, "embeddings")
    vecs = emb.select(
        F.col("label").cast("bigint").alias("label"),
        F.round(S.norm(S.as_double(F.col("embedding"))), 4).alias("nrm"),
    )
    return vecs.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum(
            (
                (F.col("nrm") >= NORM_UNIT_LO) & (F.col("nrm") <= NORM_UNIT_HI)
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_unit"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )


def _embed_norm_audit_sql() -> str:
    from terraform_aws_lambda_kinesis_to_es_spark.plans.similarity_queries import (
        _dot_sql,
    )

    return f"""
WITH vecs AS (
  SELECT CAST(label AS BIGINT) AS label,
         ROUND(sqrt({_dot_sql("v", "v")}), 4) AS nrm
  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN nrm >= {NORM_UNIT_LO} AND nrm <= {NORM_UNIT_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unit,
       MIN(nrm) AS min_norm,
       MAX(nrm) AS max_norm
FROM vecs GROUP BY label
"""


# ------------------------------------------------------- filter overlap

FILTER_RULES = (
    "c4_bad_word",
    "c4_short",
    "c4_stop_low",
    "c4_word_len",
    "g_dup_tokens",
    "g_few_words",
    "g_stops_missing",
    "g_symbol",
)


def _rule_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, <8 rule booleans>) joining the C4 and Gopher
    flag frames (their declared queries, reused verbatim)."""
    docs = load_split(spark, sf_dir, "documents").select("doc_id", "source")
    c4 = q_c4_filters(spark, sf_dir).select(
        "doc_id",
        F.col("has_bad_word").alias("c4_bad_word"),
        F.col("too_short").alias("c4_short"),
        F.col("stop_low").alias("c4_stop_low"),
        F.col("word_len_out").alias("c4_word_len"),
        F.col("keep").alias("c4_keep"),
    )
    gp = q_gopher_filters(spark, sf_dir).select(
        "doc_id",
        F.col("dup_token_high").alias("g_dup_tokens"),
        F.col("too_few_words").alias("g_few_words"),
        F.col("stops_missing").alias("g_stops_missing"),
        F.col("symbol_high").alias("g_symbol"),
        F.col("keep").alias("g_keep"),
    )
    return docs.join(c4, "doc_id").join(gp, "doc_id")


_FLAGS_SQL = f"""
flags AS (
  SELECT d.doc_id, d.source,
         c4.has_bad_word AS c4_bad_word, c4.too_short AS c4_short,
         c4.stop_low AS c4_stop_low, c4.word_len_out AS c4_word_len,
         c4.keep AS c4_keep,
         gp.dup_token_high AS g_dup_tokens, gp.too_few_words AS g_few_words,
         gp.stops_missing AS g_stops_missing, gp.symbol_high AS g_symbol,
         gp.keep AS g_keep
  FROM documents d
  JOIN ({_TEXT_ORACLES["q_c4_filters"]}) c4 USING (doc_id)
  JOIN ({_TEXT_ORACLES["q_gopher_filters"]}) gp USING (doc_id)
)"""


def q_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-rule co-failure matrix over the combined C4 + Gopher
    rule set: for every unordered rule pair (diagonal included —
    that's the rule's marginal fail count), the number of docs failing
    BOTH. Near-diagonal mass on a pair means one rule subsumes the
    other and the cheaper one can gate the expensive one at 100 TB.

    Scale shape: the two map-only flag passes, one row-local failed-
    rule array, a bounded double-explode (<= 8x8 per doc), and a
    grid-bounded rollup."""
    flags = _rule_flags(spark, sf_dir)
    failed = F.filter(
        F.array(
            *[
                F.when(F.col(r), F.lit(r)).otherwise(F.lit(None))
                for r in FILTER_RULES
            ]
        ),
        lambda x: x.isNotNull(),
    )
    ex = flags.select(failed.alias("failed")).select(
        F.explode("failed").alias("rule_a"), "failed"
    )
    return (
        ex.select(
            "rule_a",
            F.explode(
                F.filter(F.col("failed"), lambda x: x >= F.col("rule_a"))
            ).alias("rule_b"),
        )
        .groupBy("rule_a", "rule_b")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


_FILTER_OVERLAP_SQL = f"""
WITH {_FLAGS_SQL},
failed AS (
  SELECT doc_id,
         list_filter([
           CASE WHEN c4_bad_word THEN 'c4_bad_word' END,
           CASE WHEN c4_short THEN 'c4_short' END,
           CASE WHEN c4_stop_low THEN 'c4_stop_low' END,
           CASE WHEN c4_word_len THEN 'c4_word_len' END,
           CASE WHEN g_dup_tokens THEN 'g_dup_tokens' END,
           CASE WHEN g_few_words THEN 'g_few_words' END,
           CASE WHEN g_stops_missing THEN 'g_stops_missing' END,
           CASE WHEN g_symbol THEN 'g_symbol' END
         ], x -> x IS NOT NULL) AS fl
  FROM flags
),
e1 AS (
  -- one unnest per SELECT: two unnests in the same DuckDB SELECT zip
  -- positionally instead of cross-producting
  SELECT doc_id, unnest(fl) AS rule_a, fl FROM failed
),
pairs AS (
  SELECT rule_a, unnest(list_filter(fl, x -> x >= rule_a)) AS rule_b
  FROM e1
)
SELECT rule_a, rule_b, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pairs GROUP BY rule_a, rule_b
"""


def q_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-rater agreement between the C4 and Gopher KEEP decisions,
    per source: the 2x2 confusion cells plus observed agreement in
    basis points — the inter-filter reliability table whose Cohen's
    kappa any report derives from the four cells (the cells are
    emitted, not the kappa: signed integer division rules differ
    across engines, counts never do).

    Scale shape: two map-only flag passes joined id-keyed, one
    bounded per-source rollup."""
    flags = _rule_flags(spark, sf_dir)
    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("c4_keep") & F.col("g_keep")).cast("int"))
        .cast("bigint")
        .alias("n_both_keep"),
        F.sum((F.col("c4_keep") & ~F.col("g_keep")).cast("int"))
        .cast("bigint")
        .alias("n_c4_only"),
        F.sum((~F.col("c4_keep") & F.col("g_keep")).cast("int"))
        .cast("bigint")
        .alias("n_gopher_only"),
        F.sum((~F.col("c4_keep") & ~F.col("g_keep")).cast("int"))
        .cast("bigint")
        .alias("n_both_drop"),
        F.expr(
            "CAST((10000 * (SUM(CAST(c4_keep AND g_keep AS INT))"
            " + SUM(CAST((NOT c4_keep) AND (NOT g_keep) AS INT))))"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("agree_bp"),
    )


_RATER_KAPPA_SQL = f"""
WITH {_FLAGS_SQL}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c4_keep AND g_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both_keep,
       CAST(SUM(CASE WHEN c4_keep AND NOT g_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_c4_only,
       CAST(SUM(CASE WHEN NOT c4_keep AND g_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gopher_only,
       CAST(SUM(CASE WHEN NOT c4_keep AND NOT g_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both_drop,
       CAST((10000 * (SUM(CASE WHEN c4_keep AND g_keep THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN NOT c4_keep AND NOT g_keep THEN 1 ELSE 0 END)))
            // COUNT(*) AS BIGINT) AS agree_bp
FROM flags GROUP BY source
"""


# ----------------------------------------------------- langid confusion


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID stability: the marker heuristic on the FULL text vs
    its FIRST HALF (by character count), confusion-matrix counts.
    Off-diagonal mass = prefix-unstable predictions — the docs whose
    language routing flips under truncation, the stability audit any
    heuristic classifier owes before it partitions a corpus.

    Scale shape: two map-only classifier passes on the same row, one
    bounded (|langs|^2) rollup."""
    docs = load_split(spark, sf_dir, "documents")
    half = F.expr("substring(text, 1, CAST(length(text) DIV 2 AS INT))")
    return (
        docs.select(
            predicted_lang(tokens(F.lower(F.col("text")))).alias("lang_full"),
            predicted_lang(tokens(F.lower(half))).alias("lang_half"),
        )
        .groupBy("lang_full", "lang_half")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


def _langid_case_sql(toks_expr: str) -> str:
    score = {
        lang: f"len(list_filter({toks_expr}, t -> t IN ({_in_list(m)})))"
        for lang, m in LANG_MARKERS.items()
    }
    return f"""
      CASE WHEN greatest({score['de']}, {score['en']}, {score['es']},
                         {score['fr']}) <= 0 THEN 'und'
           WHEN {score['de']} >= {score['en']} AND {score['de']} >= {score['es']}
                AND {score['de']} >= {score['fr']} THEN 'de'
           WHEN {score['en']} >= {score['es']} AND {score['en']} >= {score['fr']}
                THEN 'en'
           WHEN {score['es']} >= {score['fr']} THEN 'es'
           ELSE 'fr' END"""


def _langid_confusion_sql() -> str:
    half_toks = _TOKS.replace(
        "lower(text)", "lower(substring(text, 1, length(text) // 2))"
    )
    return f"""
WITH t AS (
  SELECT {_TOKS} AS toks_full, {half_toks} AS toks_half FROM documents
),
p AS (
  SELECT {_langid_case_sql("toks_full")} AS lang_full,
         {_langid_case_sql("toks_half")} AS lang_half
  FROM t
)
SELECT lang_full, lang_half, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang_full, lang_half
"""


# ------------------------------------------------------ pack efficiency

PACK_LENGTHS = (128, 256, 512, 1024)


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length ablation for doc-per-sequence packing: for each
    candidate sequence length L, the sequence count (ceil(n_tokens/L)
    per doc) and the padding share it wastes — the one-scan report
    that picks the training sequence length (cross-doc packing's
    upper bound on waste). Integer bp; empty docs emit no sequences.

    Scale shape: one token-count pass, a bounded |PACK_LENGTHS|-way
    explode, one grid-bounded rollup."""
    docs = load_split(spark, sf_dir, "documents")
    per = (
        docs.select(F.size(tokens(F.lower(F.col("text")))).cast("bigint").alias("n"))
        .withColumn(
            "seq_len", F.explode(F.array(*[F.lit(x) for x in PACK_LENGTHS]))
        )
        .withColumn(
            "n_seqs", F.expr("CAST((n + seq_len - 1) DIV seq_len AS BIGINT)")
        )
        .withColumn("pad", F.col("n_seqs") * F.col("seq_len") - F.col("n"))
    )
    return per.groupBy(F.col("seq_len").cast("bigint").alias("seq_len")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_seqs").cast("bigint").alias("n_seqs"),
        F.sum("pad").cast("bigint").alias("pad_tokens"),
        F.expr(
            "CAST((10000 * SUM(pad)) DIV GREATEST(1, SUM(n_seqs) * seq_len)"
            " AS BIGINT)"
        ).alias("pad_share_bp"),
    )


_PACK_EFFICIENCY_SQL = f"""
WITH per AS (
  SELECT len({_TOKS}) AS n, seq_len,
         (len({_TOKS}) + seq_len - 1) // seq_len AS n_seqs
  FROM documents
  CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in PACK_LENGTHS)}])
              AS seq_len)
)
SELECT CAST(seq_len AS BIGINT) AS seq_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_seqs) AS BIGINT) AS n_seqs,
       CAST(SUM(n_seqs * seq_len - n) AS BIGINT) AS pad_tokens,
       CAST((10000 * SUM(n_seqs * seq_len - n))
            // GREATEST(1, SUM(n_seqs) * seq_len) AS BIGINT) AS pad_share_bp
FROM per GROUP BY seq_len
"""


# ------------------------------------------- image border uniformity


def q_image_border_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Border-vs-center gray audit through the REAL PPM decoder
    (q_media_decode framing): per image, integer average gray
    (r+g+b in 0..765) over the 1-pixel border ring vs the interior,
    the count of DISTINCT 16-level gray buckets on the border (the
    q_media_dominant_color quantization), and the letterbox flag
    (single-bucket border) — the screenshot/letterboxed-frame screen.

    Scale shape: decode + ring masks are Arrow map-only, one row out
    per image; no shuffle at all."""
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

        border_mask = np.zeros((IMG_H, IMG_W), dtype=bool)
        border_mask[0, :] = border_mask[-1, :] = True
        border_mask[:, 0] = border_mask[:, -1] = True
        for pdf in batches:
            ids, ba, ca, nb = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pix = M.decode_image(bytes(payload))
                gray = pix.reshape(IMG_H, IMG_W, 3).astype(np.int64).sum(axis=2)
                border = gray[border_mask]
                center = gray[~border_mask]
                ids.append(doc_id)
                ba.append(int(border.sum()) // border.size)
                ca.append(int(center.sum()) // center.size)
                nb.append(int(np.unique(border // 48).size))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "border_avg_gray": pd.Series(ba, dtype="int64"),
                    "center_avg_gray": pd.Series(ca, dtype="int64"),
                    "n_border_buckets": pd.Series(nb, dtype="int64"),
                }
            )

    per = framed.mapInPandas(
        gen,
        "doc_id long, border_avg_gray long, center_avg_gray long,"
        " n_border_buckets long",
    )
    return per.withColumn("letterbox", F.col("n_border_buckets") == 1)


def _image_border_sql() -> str:
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
         (p % {IMG_W} = 0 OR p % {IMG_W} = {IMG_W - 1}
          OR p // {IMG_W} = 0 OR p // {IMG_W} = {IMG_H - 1}) AS is_border,
         (CAST(('0x' || substring(hx, 6 * p + 1, 2)) AS BIGINT)
          + CAST(('0x' || substring(hx, 6 * p + 3, 2)) AS BIGINT)
          + CAST(('0x' || substring(hx, 6 * p + 5, 2)) AS BIGINT)) AS gray
  FROM body CROSS JOIN (SELECT unnest(range(0, {px})) AS p)
)
SELECT doc_id,
       CAST(SUM(CASE WHEN is_border THEN gray ELSE 0 END)
            // SUM(CASE WHEN is_border THEN 1 ELSE 0 END) AS BIGINT)
         AS border_avg_gray,
       CAST(SUM(CASE WHEN is_border THEN 0 ELSE gray END)
            // SUM(CASE WHEN is_border THEN 0 ELSE 1 END) AS BIGINT)
         AS center_avg_gray,
       CAST(COUNT(DISTINCT CASE WHEN is_border THEN gray // 48 END) AS BIGINT)
         AS n_border_buckets,
       COUNT(DISTINCT CASE WHEN is_border THEN gray // 48 END) = 1
         AS letterbox
FROM g GROUP BY doc_id
"""


# ---------------------------------------------------- growth accounting


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting over the events stream: per calendar
    day, the count of NEW users (first-ever active day), RETAINED
    (active the previous day too), RESURRECTED (returning after a gap
    of 2+ days), and CHURNED (were active, and this is the first day
    of their inactivity gap — attributed to last_active_day + 1,
    including after each user's final day). The standard
    new/retained/resurrected/churned decomposition every DAU report
    builds on.

    Scale shape: one distinct over (user, day), one user-keyed window
    for lag/lead, a union of status rows, one bounded per-day
    rollup."""
    events = load(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = days.withColumn("prev_day", F.lag("day").over(w)).withColumn(
        "next_day", F.lead("day").over(w)
    )
    status = seq.select(
        F.col("day"),
        F.when(F.col("prev_day").isNull(), F.lit("new"))
        .when(F.datediff(F.col("day"), F.col("prev_day")) == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    )
    churn = seq.filter(
        F.col("next_day").isNull()
        | (F.datediff(F.col("next_day"), F.col("day")) > 1)
    ).select(F.date_add(F.col("day"), 1).alias("day"), F.lit("churned").alias("status"))
    return (
        status.unionByName(churn)
        # ISO string, not DATE: the compare layer hashes VALUES and its
        # date normalization is engine-specific — a string day is
        # bit-portable
        .withColumn("day", F.col("day").cast("string"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
            .cast("bigint")
            .alias("n_resurrected"),
            F.sum(F.when(F.col("status") == "churned", 1).otherwise(0))
            .cast("bigint")
            .alias("n_churned"),
        )
    )


_GROWTH_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
seq AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM days
),
status AS (
  SELECT day,
         CASE WHEN prev_day IS NULL THEN 'new'
              WHEN day - prev_day = 1 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM seq
  UNION ALL
  SELECT day + 1, 'churned'
  FROM seq
  WHERE next_day IS NULL OR next_day - day > 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resurrected,
       CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned
FROM status GROUP BY day
"""


QUERIES = {
    "q_index_churn": q_index_churn,
    "q_band_yield": q_band_yield,
    "q_minhash_ablation": q_minhash_ablation,
    "q_dedup_cascade": q_dedup_cascade,
    "q_hard_negatives": q_hard_negatives,
    "q_embed_norm_audit": q_embed_norm_audit,
    "q_filter_overlap": q_filter_overlap,
    "q_rater_kappa": q_rater_kappa,
    "q_langid_confusion": q_langid_confusion,
    "q_pack_efficiency": q_pack_efficiency,
    "q_image_border_uniformity": q_image_border_uniformity,
    "q_growth_accounting": q_growth_accounting,
}

ORACLES = {
    "q_index_churn": _INDEX_CHURN_SQL,
    "q_band_yield": _BAND_YIELD_SQL,
    "q_minhash_ablation": _minhash_ablation_sql(),
    "q_dedup_cascade": _DEDUP_CASCADE_SQL,
    "q_hard_negatives": _hard_negatives_sql(),
    "q_embed_norm_audit": _embed_norm_audit_sql(),
    "q_filter_overlap": _FILTER_OVERLAP_SQL,
    "q_rater_kappa": _RATER_KAPPA_SQL,
    "q_langid_confusion": _langid_confusion_sql(),
    "q_pack_efficiency": _PACK_EFFICIENCY_SQL,
    "q_image_border_uniformity": _image_border_sql(),
    "q_growth_accounting": _GROWTH_SQL,
}

# imported-but-unused guard: _PAIR_JACCARD documents the exhaustive-pair
# idiom the cascade/band oracles inline; keep the import for parity
# greppability
_ = _PAIR_JACCARD
