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


@pytest.fixture(autouse=True)
def _release_tracked_storage():
    """Release sketch/centroid/graph storage after every test — the
    session is shared suite-wide, and operators that persist
    intermediates (kmeans centroids, LSH signatures, CC labels)
    would otherwise accrue executor storage across hundreds of
    tests and poison storage-accounting assertions."""
    yield
    from pg2kafka_spark.operators.dedup import release_sketch_caches

    release_sketch_caches()
