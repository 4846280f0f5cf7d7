"""Whole-surface scale sweep: every declared query at 10x sf0.1.

Materializes an sf1-equivalent dataset by replicating the sf0.1 tables 10x
with per-replica key shifting (``key*10 + replica`` on every id-like
column, applied consistently to both sides of each FK so each replica is a
self-contained keyspace shard — joins stay 1:1, uniqueness holds). The
fixed TPC-H dimensions (region, nation) are copied unscaled, matching how
TPC-H itself scales. Text/vector payloads are replicated verbatim, so
every document becomes a 10-clique of exact duplicates — deliberately the
WORST case for the dedup family (the digest collapse is what keeps it
cheap; PERF.md round-2 methodology).

Then times all declared queries at sf0.1 and at the 10x directory (noop
sink, cache cleared between queries) and prints one JSON line per query
plus a summary of any query whose 10x time exceeds RATIO_GATE x its sf0.1
time (with a fixed-overhead allowance, since sub-second sf0.1 timings are
dominated by scheduler constants).

Run: python examples/scale_sweep.py [out_dir] [--data-only]

Besides the per-query stdout lines, the full table is persisted as a
JSON artifact (VERDICT r9 #3: cross-round sweep-total moves must be
decomposable by diffing two committed files, not by PERF.md
archaeology): $SPARK_GRAFT_SWEEP_OUT, default <repo>/SWEEP_latest.json
— commit it as SWEEP_r{N}.json each round.
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
REPLICAS = 10
RATIO_GATE = 10.0
OVERHEAD_SEC = 2.0  # per-query fixed-cost allowance on top of the ratio

# id-like columns shifted per replica (key*REPLICAS + r), applied to every
# table consistently so FK pairs land in the same replica shard.
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]


def materialize(spark, out_dir: str) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in SHIFT_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) * REPLICAS + F.lit(r))
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.parquet(f"{out_dir}/{t}.parquet")
        print(f"materialized {t}", file=sys.stderr)


def time_query(fn, spark, sf_dir: str, n_runs: int | None = None) -> float:
    # timer wraps the query-construction call too (r4 ADVICE): queries
    # that run an eager job while building the plan (codebook-sizing
    # counts) must not have that cost silently excluded from the ratio.
    # Min-of-N (VERDICT r5 #6): host contention is one-sided noise, so
    # the minimum is the signal; whole-surface default is N=2 (the
    # 194-query sweep doubles in wall time as is).
    if n_runs is None:
        n_runs = max(1, int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "2")))
    singles = []
    for _ in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        singles.append(round(time.perf_counter() - t0, 3))
    return min(singles)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("scale_sweep", master=f"local[{cpus}]", shuffle_partitions=cpus)
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

    if not os.path.isdir(out_dir) or not os.path.isdir(f"{out_dir}/lineitem.parquet"):
        materialize(spark, out_dir)
    if "--data-only" in sys.argv:
        return

    import __spark_entry__ as entrypoint

    queries = entrypoint.queries()
    # codegen warmup at the tiny sf — defensive like bench.py's (r4
    # ADVICE): a missing warmup dir must degrade to a cold first query,
    # never crash the whole sweep before it times anything
    try:
        queries["q_daily_counts"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup skipped ({type(exc).__name__}: {exc})", file=sys.stderr)

    rows = []
    for name, fn in queries.items():
        try:
            t_small = time_query(fn, spark, SRC)
            t_big = time_query(fn, spark, out_dir)
            flagged = t_big > RATIO_GATE * t_small + OVERHEAD_SEC
            rows.append(
                {"q": name, "sf0.1": t_small, "10x": t_big, "flag": flagged}
            )
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rows.append({"q": name, "error": f"{type(exc).__name__}: {exc}"[:200]})
        print(json.dumps(rows[-1]), flush=True)

    errs = [r for r in rows if "error" in r]
    flags = [r for r in rows if r.get("flag")]
    ok = [r for r in rows if "error" not in r]
    summary = {
        "queries": len(rows),
        "errors": len(errs),
        "flagged_over_gate": [r["q"] for r in flags],
        "sum_sf0.1": round(sum(r["sf0.1"] for r in ok), 1),
        "sum_10x": round(sum(r["10x"] for r in ok), 1),
    }
    print(json.dumps(summary))
    # persist the whole table (VERDICT r9 #3) so the next round's
    # total move decomposes per-query with one file diff
    out_path = os.environ.get(
        "SPARK_GRAFT_SWEEP_OUT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SWEEP_latest.json",
        ),
    )
    for r in ok:
        r["ratio"] = round(r["10x"] / r["sf0.1"], 2) if r["sf0.1"] > 0 else None
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_small": SRC,
                "big_dir": out_dir,
                "replicas": REPLICAS,
                "ratio_gate": RATIO_GATE,
                "overhead_sec": OVERHEAD_SEC,
                "runs_per_point": int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "2")),
                "rows": rows,
                "summary": summary,
            },
            f,
            indent=1,
        )
    print(f"sweep table written to {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
