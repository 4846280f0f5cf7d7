"""Shared runner for the per-tranche 100x scale-evidence scripts
(examples/staged_r*_scale.py) — min-of-N timing per side, construction
included, against the standing /tmp scale corpora
(`python examples/materialize_corpora.py` rebuilds them). One
implementation so a change to the timing rule, the flag formula, or
the env-var contract lands everywhere at once.

Env: SPARK_GRAFT_CPUS (local[N]), SPARK_GRAFT_STAGED (comma-separated
subset of query names to re-run).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Callable

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
OVERHEAD_SEC = 2.0


def time_query(fn, spark, sf_dir: str, n_runs: int = 2) -> dict:
    singles = []
    for _ in range(max(1, n_runs)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        singles.append(round(time.perf_counter() - t0, 3))
    return {"min": min(singles), "runs": singles}


def run_scale(
    app_name: str,
    queries: dict[str, Callable],
    big_dir: dict[str, str],
    setup: Callable | None = None,
) -> None:
    """Time every query in ``big_dir`` at sf0.1 and its 100x corpus,
    print one JSON line per query + a flagged summary line. ``setup``
    (optional) receives the live session before timing — for per-sweep
    conf overrides like raising the exhaustive rail (log what you
    raise, the family_scale_sweep discipline)."""
    from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name, master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    if setup is not None:
        setup(spark)
    only = set(os.environ.get("SPARK_GRAFT_STAGED", "").split(",")) - {""}
    rows = []
    for name, corpus in big_dir.items():
        if only and name not in only:
            continue
        if not os.path.isdir(corpus):
            rows.append({"q": name, "error": f"missing corpus {corpus}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        try:
            base = time_query(queries[name], spark, SRC)
            big = time_query(queries[name], spark, corpus)
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
            rows.append(
                {"q": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
            )
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
        ),
        flush=True,
    )
    spark.stop()
