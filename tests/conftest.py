from __future__ import annotations

import pytest

from pg2kafka_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stress tests (skew fixtures, ~30s each)"
    )

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pg2kafka_spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
