"""100x scale evidence for the diagnostics-tranche queries (staged
round 10, promoted round 11), following the staging bar set in rounds
5-10: min-of-N timing per side, construction included, against the
standing /tmp scale corpora (documents+embeddings 100x collision-free
at /tmp/sf_family100x, events 100x with per-replica user shifts at
/tmp/sf_events100x).

Each query is timed at sf0.1 (base) and at its table's 100x corpus
(big); flag = big > replicas * base + overhead (the same super-linear
rule family_scale_sweep.py applies to declared queries).

Run: python examples/diagnostics_queries_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.plans.diagnostics_queries import (  # noqa: E402
    QUERIES,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
OVERHEAD_SEC = 2.0

# staged query -> the 100x corpus holding its input table
BIG_DIR = {
    "q_index_churn": "/tmp/sf_family100x",
    "q_band_yield": "/tmp/sf_family100x",
    "q_minhash_ablation": "/tmp/sf_family100x",
    "q_dedup_cascade": "/tmp/sf_family100x",
    "q_hard_negatives": "/tmp/sf_family100x",
    "q_embed_norm_audit": "/tmp/sf_family100x",
    "q_filter_overlap": "/tmp/sf_family100x",
    "q_rater_kappa": "/tmp/sf_family100x",
    "q_langid_confusion": "/tmp/sf_family100x",
    "q_pack_efficiency": "/tmp/sf_family100x",
    "q_image_border_uniformity": "/tmp/sf_family100x",
    "q_growth_accounting": "/tmp/sf_events100x",
}


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
        "diagnostics_scale", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    only = set(os.environ.get("SPARK_GRAFT_STAGED", "").split(",")) - {""}
    rows = []
    for name, big_dir in BIG_DIR.items():
        if only and name not in only:
            continue
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
