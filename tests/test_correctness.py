"""The correctness gate, locally: every registry query vs its DuckDB
oracle at sf0.001 (fast replica of the driver's CORRECTNESS check)."""

from __future__ import annotations

import pytest

from kinesis_app_spark import registry
from kinesis_app_spark.oracle import CompareResult, compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.REGISTRY))
def test_query_matches_oracle(name, spark, conn):
    spec = registry.REGISTRY[name]
    if spec.oracle is None:
        n = spec.fn(spark, SF_DIR).count()
        assert n >= 0
        return
    res: CompareResult = compare(name, spec.fn(spark, SF_DIR), spec.oracle, conn)
    assert res.ok, f"{name}: {res.problems}"
