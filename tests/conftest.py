from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running breadth coverage (crash-injection kill-point "
        "sweeps, two-process chaos schedules, extra fuzz seeds). The "
        "default run keeps one smoke per family and must finish well "
        "inside the driver's capture budget (VERDICT r10 item 6); set "
        "SPARK_GRAFT_FULL_TESTS=1 to run everything (the builder's "
        "round-close gate).",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow breadth suite; set SPARK_GRAFT_FULL_TESTS=1 to run"
    )
    for item in items:
        if item.get_closest_marker("slow"):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
