"""Growth-driver audit for q_lsh_tuning and q_linear_quality (VERDICT
r7 #3): both queries carry large-but-input-shaped 100x wall ratios
(banding sweep ~24x, hashed scoring ~13x), and this script pins WHY by
emitting the work-driving counts at base (sf0.1) vs the 100x family
corpus, next to the wall ratio:

- q_lsh_tuning: per-(bands, rows) candidate-pair volume and verified
  true pairs — the query's own output columns. The exact-verify leg is
  candidate-bounded, so wall tracks n_candidates, which tracks the
  corpus's DUP STRUCTURE (the 100x family corpus plants near-dup
  replicas -> super-linear candidate growth by construction), not an
  algorithmic corpus^2 term.
- q_linear_quality: total feature memberships (sum of per-doc distinct
  dims = the explode+distinct volume) and the global distinct-dim count
  (bounded by LQ_DIMS=1024) — feature rows scale with corpus tokens;
  the weight "table" is an expression, so there is nothing else to grow.

The count-tracking claim itself (candidates follow planted dup
structure: linear under mutated replication, clique-quadratic under
verbatim replication; feature sums exactly linear in verbatim replicas)
is pinned by tests/test_corpus_queries.py::test_lsh_tuning_candidates_track_dup_structure
and ::test_linear_quality_features_track_corpus — this script produces
the PERF.md evidence tables at real scale.

Run: python examples/growth_drivers.py   (~10 min; needs
/tmp/sf_family100x from examples/family_scale_sweep.py)
One JSON line per (query, scale) + wall ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from terraform_aws_lambda_kinesis_to_es_spark.plans.corpus_queries import (  # noqa: E402
    QUERIES,
)
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/sf_family100x"


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "growth_drivers", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    if not os.path.isdir(BIG):
        print(json.dumps({"error": f"missing corpus {BIG}"}))
        return
    out = []
    for scale, sf_dir in (("base", SRC), ("100x", BIG)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        tuning = QUERIES["q_lsh_tuning"](spark, sf_dir).collect()
        wall = round(time.perf_counter() - t0, 3)
        out.append(
            {
                "q": "q_lsh_tuning",
                "scale": scale,
                "wall_s": wall,
                "configs": [
                    {
                        "bands": r["bands"],
                        "rows": r["rows_per_band"],
                        "n_candidates": r["n_candidates"],
                        "n_true": r["n_true"],
                    }
                    for r in sorted(tuning, key=lambda r: r["rows_per_band"])
                ],
            }
        )
        print(json.dumps(out[-1]), flush=True)

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        lq = QUERIES["q_linear_quality"](spark, sf_dir)
        stats = lq.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_feats").alias("feature_rows"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 3)
        out.append(
            {
                "q": "q_linear_quality",
                "scale": scale,
                "wall_s": wall,
                "n_docs": stats["n_docs"],
                "feature_rows": stats["feature_rows"],
            }
        )
        print(json.dumps(out[-1]), flush=True)

    def ratio(q, key):
        b = next(r for r in out if r["q"] == q and r["scale"] == "base")
        g = next(r for r in out if r["q"] == q and r["scale"] == "100x")
        if key == "wall_s":
            return round(g["wall_s"] / max(b["wall_s"], 0.001), 1)
        if q == "q_lsh_tuning":
            return {
                c["rows"]: round(
                    gc["n_candidates"] / max(c["n_candidates"], 1), 1
                )
                for c, gc in zip(b["configs"], g["configs"])
            }
        return round(g[key] / max(b[key], 1), 1)

    print(
        json.dumps(
            {
                "summary": {
                    "q_lsh_tuning": {
                        "wall_ratio": ratio("q_lsh_tuning", "wall_s"),
                        "candidate_ratio_by_rows": ratio(
                            "q_lsh_tuning", "n_candidates"
                        ),
                    },
                    "q_linear_quality": {
                        "wall_ratio": ratio("q_linear_quality", "wall_s"),
                        "feature_rows_ratio": ratio(
                            "q_linear_quality", "feature_rows"
                        ),
                    },
                }
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
