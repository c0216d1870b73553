from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deltasink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deltasink_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("DS_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
