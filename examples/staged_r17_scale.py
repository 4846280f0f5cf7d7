"""100x scale evidence for the staged round-17 queries (pre-promotion),
following the staging bar set in rounds 5-12: min-of-N timing per side,
construction included, against the standing /tmp scale corpora
(`python examples/materialize_corpora.py` rebuilds them).

Run: python examples/staged_r17_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r17 import (  # noqa: E402
    QUERIES,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
OVERHEAD_SEC = 2.0

BIG_DIR = {
    # events family
    "q_psi_drift": "/tmp/sf_events100x",
    "q_ks_drift": "/tmp/sf_events100x",
    "q_mix_drift_chi2": "/tmp/sf_events100x",
    "q_acf_daily": "/tmp/sf_events100x",
    "q_dispersion_drift": "/tmp/sf_events100x",
    "q_tost_equivalence": "/tmp/sf_events100x",
    "q_novel_rate": "/tmp/sf_events100x",
    "q_schema_drift": "/tmp/sf_events100x",
    "q_cadence_drift": "/tmp/sf_events100x",
    "q_dup_rate_drift": "/tmp/sf_events100x",
    # documents/embeddings family
    "q_embedding_drift": "/tmp/sf_family100x",
    "q_quality_drift_decomp": "/tmp/sf_family100x",
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
        "staged_r17_scale", master=f"local[{cpus}]", shuffle_partitions=cpus
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
