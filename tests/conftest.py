from __future__ import annotations

import pytest

from kinesis_app_spark.engine import Engine, get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kinesis-app-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    return Engine(spark, SF_DIR)
