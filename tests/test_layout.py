"""Layout normalization (sources/batch._normalized_path): single-row-group
tables are compacted once per session so scans parallelize; small tables
and well-chunked tables pass through untouched; content is preserved."""

from __future__ import annotations

import os

from kinesis_app_spark.sources import batch


def _write_single_group(spark, path, n):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"id": list(range(n)), "v": [i * 3 for i in range(n)]})
    pq.write_table(tbl, path, row_group_size=max(n, 1))


def test_oversized_row_group_is_compacted(spark, tmp_path):
    sf = str(tmp_path)
    _write_single_group(spark, os.path.join(sf, "events.parquet"), 50_000)
    # bypass load_table's ts handling by probing the path helper directly
    out = batch._normalized_path(spark, sf, "events")
    assert out != os.path.join(sf, "events.parquet")
    df = spark.read.parquet(out)
    assert df.rdd.getNumPartitions() > 1
    assert df.count() == 50_000
    got = df.agg({"v": "sum"}).collect()[0][0]
    assert got == sum(i * 3 for i in range(50_000))
    # memoized: second call returns the same copy, no second rewrite
    assert batch._normalized_path(spark, sf, "events") == out


def test_small_table_passes_through(spark, tmp_path):
    sf = str(tmp_path)
    p = os.path.join(sf, "nation.parquet")
    _write_single_group(spark, p, 25)
    assert batch._normalized_path(spark, sf, "nation") == p


def test_well_chunked_table_passes_through(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    p = os.path.join(sf, "orders.parquet")
    n = 50_000
    tbl = pa.table({"id": list(range(n))})
    pq.write_table(tbl, p, row_group_size=1000)  # 50 groups of 1000
    assert batch._normalized_path(spark, sf, "orders") == p
