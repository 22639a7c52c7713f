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


def test_batch_read_models_shard_split(spark):
    """Batch view of a resharded stream: parent closes at splitAtSeq, two
    children carry the rest, record content is keyed by logical position."""
    df = (
        spark.read.format("fake_kinesis")
        .option("numShards", 2)
        .option("recordsPerShard", 100)
        .option("splitShard", 0)
        .option("splitAtSeq", 40)
        .load()
    )
    per_shard = {
        r["shardId"]: r["n"]
        for r in df.groupBy("shardId").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_shard == {
        "shardId-000000000000": 40,   # parent, closed at 40
        "shardId-000000001000": 30,   # child A: even seqs 40..98
        "shardId-000000001001": 30,   # child B: odd seqs 41..99
        "shardId-000000000001": 100,  # untouched shard
    }
    # the logical record set is exactly the unsplit stream's
    parsed = df.select(
        F.from_json(F.col("data").cast("string"), "shard int, seq long").alias("p")
    )
    assert parsed.select("p.shard", "p.seq").distinct().count() == 200
    # per-shard ranges: parent < split <= children
    child_rows = df.filter(F.col("shardId").contains("100")).collect()
    assert all(r["sequenceNumber"] >= 40 for r in child_rows)


def test_shard_split_exactly_once_across_restart(spark, tmp_path):
    """The reference's untested resharding hole (/root/reference/README.md:8):
    run 1 consumes the stream up to the split point and checkpoints; the
    stream then 'grows' past the split (run 2 sees child shards with new
    records). Every logical record must be delivered exactly once across the
    restart — children resume from the split point, the closed parent
    delivers nothing new."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(records_per_shard: int):
        stream = (
            spark.readStream.format("fake_kinesis")
            .option("numShards", 2)
            .option("recordsPerShard", records_per_shard)
            .option("maxRecordsPerFetch", 40)
            .option("splitShard", 0)
            .option("splitAtSeq", 100)
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

    # run 1: stream has exactly 100 records/shard — the parent is fully
    # drained and closed, children exist but hold nothing yet
    run(100)
    first = spark.read.parquet(out)
    assert first.count() == 200
    assert {r["shardId"] for r in first.select("shardId").distinct().collect()} == {
        "shardId-000000000000",
        "shardId-000000000001",
    }

    # run 2 (restart from checkpoint): 100 more records arrived post-split
    run(200)
    got = spark.read.parquet(out)
    assert got.count() == 400
    parsed = got.select(
        F.from_json(F.col("data").cast("string"), "shard int, seq long").alias("p"),
        "shardId",
        "sequenceNumber",
    )
    # exactly once: every logical (shard, seq) delivered once
    assert parsed.select("p.shard", "p.seq").distinct().count() == 400
    # post-split shard-0 records came through the children, never the parent
    parent_rows = parsed.filter(F.col("shardId") == "shardId-000000000000")
    assert parent_rows.agg(F.max("sequenceNumber")).collect()[0][0] == 99
    kids = parsed.filter(F.col("shardId").contains("0000100"))
    assert kids.count() == 100
    assert kids.agg(F.min("sequenceNumber")).collect()[0][0] == 100

    # run 3: nothing new
    run(200)
    assert spark.read.parquet(out).count() == 400


def test_shard_merge_exactly_once_across_restart(spark, tmp_path):
    """Merge is the scale-DOWN reshard: run 1 drains both parents up to
    the merge point and checkpoints; run 2 sees the merged child carrying
    BOTH logical streams past it. Exactly-once across the restart; the
    closed parents deliver nothing new."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(records_per_shard: int):
        stream = (
            spark.readStream.format("fake_kinesis")
            .option("numShards", 2)
            .option("recordsPerShard", records_per_shard)
            .option("maxRecordsPerFetch", 40)
            .option("mergeShards", "0,1")
            .option("mergeAtSeq", 100)
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

    # run 1: both parents fully drained to the merge point, child empty
    run(100)
    assert spark.read.parquet(out).count() == 200

    # run 2 (restart): 100 more seqs arrived, all via the merged child
    run(200)
    got = spark.read.parquet(out)
    assert got.count() == 400
    parsed = got.select(
        F.from_json(F.col("data").cast("string"), "shard int, seq long").alias("p"),
        "shardId",
        "sequenceNumber",
    )
    assert parsed.select("p.shard", "p.seq").distinct().count() == 400
    merged = parsed.filter(F.col("shardId") == "shardId-000000002000")
    assert merged.count() == 200  # 100 seqs x 2 parent streams
    # child seqs are 2*seq + parent_idx: unique within the shard (real
    # Kinesis guarantees this; consumers dedup on (shardId, seq))
    assert merged.select("sequenceNumber").distinct().count() == 200
    assert merged.agg(F.min("sequenceNumber")).collect()[0][0] == 200
    assert merged.agg(F.max("sequenceNumber")).collect()[0][0] == 399
    assert {r["shard"] for r in merged.select("p.shard").distinct().collect()} == {0, 1}
    parents = parsed.filter(F.col("shardId").isin(
        "shardId-000000000000", "shardId-000000000001"))
    assert parents.agg(F.max("sequenceNumber")).collect()[0][0] == 99

    # run 3: nothing new
    run(200)
    assert spark.read.parquet(out).count() == 400
