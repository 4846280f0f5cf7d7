"""100x scale evidence for the staged round-16 queries (pre-promotion)
— data only; the timing/flag harness is examples/staged_scale_lib.py.

Run: python examples/staged_r16_scale.py
One JSON line per query + a summary line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from staged_scale_lib import run_scale  # noqa: E402

from terraform_aws_lambda_kinesis_to_es_spark.plans.staged_r16 import (  # noqa: E402
    QUERIES,
)

BIG_DIR = {
    # documents/embeddings family
    "q_bin_packing": "/tmp/sf_family100x",
    "q_shuffle_locality": "/tmp/sf_family100x",
    "q_source_influence": "/tmp/sf_family100x",
    "q_ips_estimate": "/tmp/sf_family100x",
    "q_confident_learning": "/tmp/sf_family100x",
    "q_curriculum_mix": "/tmp/sf_family100x",
    "q_stopping_rule": "/tmp/sf_family100x",
    "q_embed_outliers": "/tmp/sf_family100x",
    # events family
    "q_backlog_drain": "/tmp/sf_events100x",
    "q_dedup_window_curve": "/tmp/sf_events100x",
    "q_ab_guardrail": "/tmp/sf_events100x",
    # join family (100x orders, 1x customer/nation dims — FK preserved)
    "q_representation_parity": "/tmp/sf_join100x",
}

if __name__ == "__main__":
    run_scale("staged_r16_scale", QUERIES, BIG_DIR)
