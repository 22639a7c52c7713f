"""Tests of the Kinesis-shaped Python DataSource: shard-partitioned batch
reads, rate-limited micro-batches, and checkpointed resume (the reference's
AfterSequenceNumber restart, src/Kinesis/Kinesis.hs:62-65, but
exactly-once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.sources.fake_kinesis import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_batch_read_one_partition_per_shard(spark):
    df = (
        spark.read.format("fake_kinesis")
        .option("numShards", 3)
        .option("recordsPerShard", 50)
        .load()
    )
    assert df.count() == 150
    assert df.rdd.getNumPartitions() == 3
    per_shard = {
        r["shardId"]: r["n"]
        for r in df.groupBy("shardId").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_shard == {f"shardId-{s:012d}": 50 for s in range(3)}
    # payload is parseable JSON carrying (shard, seq)
    parsed = df.select(
        F.from_json(F.col("data").cast("string"), "shard int, seq long").alias("p"),
        "sequenceNumber",
    )
    bad = parsed.filter(F.col("p.seq") != F.col("sequenceNumber")).count()
    assert bad == 0


def test_stream_drains_with_rate_limit_and_resumes(spark, tmp_path):
    """The stream drains completely with fetch-size-bounded input slices;
    a second run from the same checkpoint reads nothing new (offsets
    resume past all consumed records — the AfterSequenceNumber restart,
    exactly-once)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.format("fake_kinesis")
            .option("numShards", 2)
            .option("recordsPerShard", 120)
            .option("maxRecordsPerFetch", 50)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    assert got.count() == 240
    assert got.select("shardId", "sequenceNumber").distinct().count() == 240

    run()  # resume: nothing new
    assert spark.read.parquet(out).count() == 240
