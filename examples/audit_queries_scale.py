"""100x scale evidence for the staged round-9 queries (pre-promotion),
following the staging bar set in rounds 5-8: min-of-N timing per side,
construction included, against the standing /tmp scale corpora
(documents/embeddings 100x collision-free, customer 100x materialized
here — names regenerated from the remapped custkey so the record-
linkage block keys stay consistent).

Each staged query is timed at sf0.1 (base) and at its table's 100x
corpus (big); flag = big > replicas * base + overhead (the same
super-linear rule family_scale_sweep.py applies to declared queries).

Run: python examples/audit_queries_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from terraform_aws_lambda_kinesis_to_es_spark.plans.audit_queries import (  # noqa: E402
    QUERIES,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
OVERHEAD_SEC = 2.0
CUST100X = "/tmp/sf_customer100x"

# staged query -> the 100x corpus holding its input table
BIG_DIR = {
    "q_crawl_frontier": "/tmp/sf_family100x",
    "q_snapshot_delta": "/tmp/sf_family100x",
    "q_code_detect": "/tmp/sf_family100x",
    "q_score_calibration": "/tmp/sf_family100x",
    "q_zipf_fit": "/tmp/sf_family100x",
    "q_heaps_law": "/tmp/sf_family100x",
    "q_js_divergence": "/tmp/sf_family100x",
    "q_split_balance": "/tmp/sf_family100x",
    "q_fellegi_sunter": CUST100X,
    "q_audio_silence": "/tmp/sf_family100x",
    "q_media_dominant_color": "/tmp/sf_family100x",
    "q_epoch_schedule": "/tmp/sf_family100x",
}


def materialize_customer(spark) -> None:
    """100x customer registry under the collision-free id rule
    (custkey*R + r, r=0 participates). Names are REGENERATED from the
    remapped key (Customer#%09d) — carrying the original name would
    give 100 registry rows one block key and silently quadratic
    blocks; regeneration keeps the (nation, name-prefix) blocks
    O(1)-sized exactly like a real registry. Split into 32 files (the
    single-file scan-partition trap, PERF.md round-6)."""
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    reps = []
    for r in range(REPLICAS):
        reps.append(
            cust.select(
                (F.col("c_custkey") * REPLICAS + F.lit(r)).alias("c_custkey"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    out = out.withColumn(
        "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
    ).select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    out.repartition(32).write.mode("overwrite").parquet(f"{CUST100X}/customer.parquet")
    n = spark.read.parquet(f"{CUST100X}/customer.parquet")
    assert n.count() == n.select("c_custkey").distinct().count(), "id collision"


def time_query(fn, spark, sf_dir: str, n_runs: int = 2) -> dict:
    singles = []
    for _ in range(max(1, n_runs)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        singles.append(round(time.perf_counter() - t0, 3))
    return {"min": min(singles), "runs": singles}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "audit_queries_scale", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    if not os.path.isdir(f"{CUST100X}/customer.parquet"):
        materialize_customer(spark)
    rows = []
    for name, big_dir in BIG_DIR.items():
        if not os.path.isdir(big_dir):
            rows.append({"q": name, "error": f"missing corpus {big_dir}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        try:
            base = time_query(QUERIES[name], spark, SRC)
            big = time_query(QUERIES[name], spark, big_dir)
            ratio = round(big["min"] / max(base["min"], 0.001), 1)
            rows.append(
                {
                    "q": name,
                    "base_s": base["min"],
                    "big_s": big["min"],
                    "base_runs": base["runs"],
                    "big_runs": big["runs"],
                    "ratio": ratio,
                    "flag": big["min"] > REPLICAS * base["min"] + OVERHEAD_SEC,
                }
            )
        except Exception as exc:  # noqa: BLE001
            rows.append({"q": name, "error": f"{type(exc).__name__}: {exc}"[:300]})
        print(json.dumps(rows[-1]), flush=True)
    ok = [r for r in rows if "error" not in r]
    print(
        json.dumps(
            {
                "replicas": REPLICAS,
                "queries": len(rows),
                "errors": len(rows) - len(ok),
                "flagged_superlinear": [r["q"] for r in ok if r["flag"]],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
