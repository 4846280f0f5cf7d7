"""Deep-scale sweep of the dedup/similarity family at 30-100x with a
REALISTIC (non-clique) duplicate density — VERDICT r4 #5.

The whole-surface 10x sweep (scale_sweep.py) replicates text/vector
payloads verbatim, so every document becomes a 10-clique of exact dups —
deliberately the worst case, but it CONFOUNDS candidate-growth with
output-growth for the pair-emitting queries (a pair query's output grows
~R^2 on cliques even when the plan is linear). This sweep materializes a
replicas-x documents/embeddings corpus where, per replica r>0 and doc d,
bucket (d + r) % 10 decides the payload:

  0 -> verbatim copy        (expected clique size ~R/10 + 1: small, like
                             the few-copy dups real corpora have)
  1 -> one appended token   (a genuine near-dup of the base doc)
  else -> vowel-translated  (most shingles change: a DISTINCT document
                             with realistic partial shingle overlap)

so dup density stays ~20% of rows in bounded-size groups at ANY replica
count — candidate growth now tracks corpus size, not R^2 cliques. The
embeddings table gets the analogous treatment in vector space (verbatim /
+0.001 on one dim / deterministic +-0.4 skew on all dims).

Run: python examples/family_scale_sweep.py [out_dir] [replicas]
One JSON line per query: {q, base_s, big_s, ratio, flag} with
flag = ratio > replicas (super-linear beyond the corpus growth itself,
after a fixed overhead allowance); then a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OVERHEAD_SEC = 2.0

# the sweep's most expensive family rows (PERF.md r4): every pair-emitting
# or cluster-local-quadratic plan in dedup/similarity, minus the two
# DECLARED brute-force contracts (q_embed_near_dup, q_knn_cosine)
FAMILY = (
    "q_semdedup",
    "q_semdedup_bucketed",
    "q_simhash_pairs",
    "q_dup_method_agreement",
    "q_graph_triangles",
    "q_pagerank",
    "q_minhash_dedup",
    "q_dup_clusters",
    "q_dedup_keep_best",
    "q_clean_corpus",
    "q_embed_near_dup_lsh",
    "q_shingle_containment",
    "q_exact_jaccard_pairs",
    "q_lsh_eval",
    "q_ann_ivfpq",
)


def materialize(spark, out_dir: str, replicas: int) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    vowels = "aeiou"

    # r=0 keeps payloads verbatim but MUST remap ids like every other
    # replica: base*R+r is only collision-free if r=0 participates
    # (originally doc 746 collided with base 24 r 26 = 24*30+26 — ~3%
    # duplicate ids, which violates every operator's unique-id contract
    # and silently corrupted pair semantics on this corpus)
    doc_reps = [docs.withColumn("doc_id", F.col("doc_id") * replicas)]
    emb_reps = [emb.withColumn("vec_id", F.col("vec_id") * replicas)]
    for r in range(1, replicas):
        b = (F.col("doc_id") + r) % 10
        text = (
            F.when(b == 0, F.col("text"))
            .when(b == 1, F.concat(F.col("text"), F.lit(f" neardup{r}")))
            .otherwise(
                F.translate(
                    F.col("text"),
                    vowels[r % 5],
                    chr(ord("j") + (r % 13)),
                )
            )
        )
        doc_reps.append(
            docs.withColumn("text", text).withColumn(
                "doc_id", F.col("doc_id") * replicas + F.lit(r)
            )
        )
        eb = (F.col("vec_id") + r) % 10
        base_v = F.col("embedding")
        near_v = F.transform(
            base_v,
            lambda x, i: x
            + F.when(i == (r % 64), F.lit(0.001)).otherwise(F.lit(0.0)),
        )
        # "far" must DECORRELATE, not translate: adding one constant
        # offset vector to a whole replica biases every hyperplane
        # (sign(w.v + w.c_r)) and collapses the replica into a few LSH
        # buckets — measured 68.7x on q_embed_near_dup_lsh before this
        # fix. A per-replica deterministic sign-flip pattern preserves
        # within-replica pairwise geometry exactly (both sides flip) and
        # is ~orthogonal across replicas, so bucket occupancy stays at
        # base-corpus levels and candidates grow linearly. Patterns
        # repeat at r = r' (mod 14) -> far-class cliques of ~2, like the
        # few-copy dups of a real corpus.
        far_v = F.transform(
            base_v,
            lambda x, i: F.when(
                ((i * (r + 3)) % 7 < 3) != ((i + r) % 2 == 0), -x
            ).otherwise(x),
        )
        emb_reps.append(
            emb.withColumn(
                "embedding",
                F.when(eb == 0, base_v).when(eb == 1, near_v).otherwise(far_v)
                .cast("array<float>"),
            ).withColumn("vec_id", F.col("vec_id") * replicas + F.lit(r))
        )

    out_docs = doc_reps[0]
    for rep in doc_reps[1:]:
        out_docs = out_docs.unionByName(rep)
    out_docs.write.parquet(f"{out_dir}/documents.parquet")
    out_emb = emb_reps[0]
    for rep in emb_reps[1:]:
        out_emb = out_emb.unionByName(rep)
    out_emb.write.parquet(f"{out_dir}/embeddings.parquet")
    # the family reads only documents/embeddings; link the rest so any
    # accidental cross-table read fails loudly on scale (absent) rather
    # than silently timing sf0.1 data — copy the small fixed tables only.
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.parquet(
            f"{out_dir}/{t}.parquet"
        )
    print(f"materialized {replicas}x at {out_dir}", file=sys.stderr)


def time_query(fn, spark, sf_dir: str, n_runs: int = 1) -> dict:
    """Min-of-N timing (VERDICT r5 #6): host contention on a shared box is
    ONE-SIDED noise — a run can only be slowed down, never sped up — so
    the per-query MINIMUM is the signal and the median is the context.
    Construction (eager jobs) is inside the timer, caches cleared per
    run so no run subsidizes the next."""
    singles = []
    for _ in range(max(1, n_runs)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        singles.append(round(time.perf_counter() - t0, 3))
    return {
        "min": min(singles),
        "median": sorted(singles)[len(singles) // 2],
        "runs": singles,
    }


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_family30x"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "family_scale_sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # VERDICT r7 #5: the replicated corpora exceed the exhaustive-baseline
    # rail (default 100k rows, operators/similarity.py) — the railed exact
    # contracts (q_semdedup, q_embed_near_dup, q_knn_cosine, q_ann_recall's
    # truth leg) are deliberately part of the sweep, so raise the rail for
    # THIS session only and log the override to keep its protection
    # visible. Everywhere else the rail still fires by default
    # (tests/test_components.py::test_exhaustive_rail_blocks_oversized_corpus).
    spark.conf.set("spark.graft.exhaustiveMaxRows", "100000000")
    print("exhaustive rail raised for sweep: spark.graft.exhaustiveMaxRows=100000000",
          file=sys.stderr)

    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        materialize(spark, out_dir, replicas)

    import __spark_entry__ as entrypoint

    queries = entrypoint.queries()
    try:
        queries["q_doc_stats"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup skipped ({type(exc).__name__}: {exc})", file=sys.stderr)

    family = FAMILY
    if os.environ.get("SPARK_GRAFT_FAMILY"):
        family = tuple(os.environ["SPARK_GRAFT_FAMILY"].split(","))
    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "2")))
    rows = []
    for name in family:
        fn = queries[name]
        try:
            base = time_query(fn, spark, SRC, n_runs)
            big = time_query(fn, spark, out_dir, n_runs)
            # ratio/flag on the MINs — the one-sided-noise signal; medians
            # and raw singles stay in the row for spread inspection
            base_s, big_s = base["min"], big["min"]
            ratio = round(big_s / max(base_s, 0.001), 1)
            flagged = big_s > replicas * base_s + OVERHEAD_SEC
            rows.append(
                {
                    "q": name,
                    "base_s": base_s,
                    "big_s": big_s,
                    "base_median": base["median"],
                    "big_median": big["median"],
                    "base_runs": base["runs"],
                    "big_runs": big["runs"],
                    "ratio": ratio,
                    "flag": flagged,
                }
            )
        except Exception as exc:  # noqa: BLE001
            rows.append({"q": name, "error": f"{type(exc).__name__}: {exc}"[:200]})
        print(json.dumps(rows[-1]), flush=True)

    ok = [r for r in rows if "error" not in r]
    print(
        json.dumps(
            {
                "replicas": replicas,
                "queries": len(rows),
                "errors": len(rows) - len(ok),
                "flagged_superlinear": [r["q"] for r in ok if r["flag"]],
                "sum_base": round(sum(r["base_s"] for r in ok), 1),
                "sum_big": round(sum(r["big_s"] for r in ok), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
