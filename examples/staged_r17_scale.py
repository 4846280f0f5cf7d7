"""100x scale evidence for the staged round-17 queries (pre-promotion)
— data only; the timing/flag harness is examples/staged_scale_lib.py.

Run: python examples/staged_r17_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from staged_scale_lib import run_scale  # noqa: E402

from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r17 import (  # noqa: E402
    QUERIES,
)

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

if __name__ == "__main__":
    run_scale("staged_r17_scale", QUERIES, BIG_DIR)
