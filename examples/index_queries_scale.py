"""100x scale evidence for the ANN-index-internals queries (promoted
round 12; staged as plans/staged_r12.py),
following the staging bar set in rounds 5-11: min-of-N timing per side,
construction included, against the standing /tmp scale corpora
(`python examples/materialize_corpora.py` rebuilds them).

Run: python examples/index_queries_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.plans.index_queries import (  # noqa: E402
    QUERIES,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
OVERHEAD_SEC = 2.0

BIG_DIR = {
    "q_ivf_balance": "/tmp/sf_family100x",
    "q_pq_distortion": "/tmp/sf_family100x",
    "q_ann_probe_curve": "/tmp/sf_family100x",
    "q_dup_transitivity": "/tmp/sf_family100x",
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
        "index_queries_scale", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # q_ann_probe_curve's exact truth leg (knn_bruteforce_l2) is the
    # railed bounded-audit contract; the 100x corpus (200k vectors)
    # exceeds the default rail, so raise it for THIS session only and
    # log the override (the standing family_scale_sweep discipline).
    spark.conf.set("spark.graft.exhaustiveMaxRows", "100000000")
    print(
        "exhaustive rail raised for sweep: spark.graft.exhaustiveMaxRows=1e8",
        file=sys.stderr,
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
