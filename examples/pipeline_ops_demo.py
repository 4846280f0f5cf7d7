"""Pipeline-operations tour: the table-maintenance layer around the
analytics queries (plans/pipeline_queries.py), run end-to-end on the
bundled fixtures.

Order mirrors a real standing-jobs schedule: profile what arrived →
check freshness and key skew → audit ordering → compact the change
stream → plan file compaction → sample deterministically.

Run: python examples/pipeline_ops_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.plans import pipeline_queries as P
from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()

    print("== column profile (orders) ==")
    P.q_profile_columns(spark, sf_dir).show(truncate=False)

    print("== freshness lag per event type ==")
    P.q_data_freshness(spark, sf_dir).orderBy("event_type").show()

    print("== hottest aggregation keys ==")
    P.q_key_skew_profile(spark, sf_dir).show()

    print("== out-of-order arrival rate (top 5 users) ==")
    P.q_out_of_order(spark, sf_dir).orderBy(
        "n_out_of_order", ascending=False
    ).show(5)

    print("== CDC latest-per-key (5 rows) ==")
    P.q_cdc_latest(spark, sf_dir).show(5)

    print("== file compaction plan ==")
    P.q_compaction_plan(spark, sf_dir).orderBy("source").show()

    print("== deterministic 20-per-language sample (5 rows) ==")
    P.q_reservoir_sample(spark, sf_dir).show(5)


if __name__ == "__main__":
    main()
