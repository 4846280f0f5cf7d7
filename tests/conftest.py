from __future__ import annotations

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
