"""E2E for the boto3 Kinesis PRODUCER (PutRecords sink) against a live
moto server: batch write → batch read roundtrip, API batching limits,
partial-failure retry (only the failed subset resends — no duplicates for
rows that already landed), and the streaming writer's per-epoch replay
discipline. Producer twin of tests/test_kinesis_boto.py; retry policy
parity with src/Kinesis/Kinesis.hs:89-176."""

from __future__ import annotations

import logging

import pytest

try:
    from moto.server import ThreadedMotoServer

    HAVE_MOTO = True
except ImportError:  # pragma: no cover
    HAVE_MOTO = False

pytestmark = pytest.mark.skipif(not HAVE_MOTO, reason="moto not installed")

_MID = str(2**127)


@pytest.fixture(scope="module")
def moto_ep():
    logging.getLogger("werkzeug").setLevel(logging.ERROR)
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    _, port = server.get_host_and_port()
    yield f"http://127.0.0.1:{port}"
    server.stop()


def _kinesis_client(ep):
    import boto3

    return boto3.client(
        "kinesis",
        region_name="us-east-1",
        endpoint_url=ep,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )


def _fmt(writer_or_reader, ep, stream):
    return (
        writer_or_reader.format("kinesis_boto")
        .option("streamName", stream)
        .option("endpointUrl", ep)
        .option("region", "us-east-1")
        .option("accessKeyId", "testing")
        .option("secretAccessKey", "testing")
    )


def _registered(spark):
    from kinesis_app_spark.sources.kinesis_boto import register

    register(spark)


def _payloads(spark, ep, stream) -> set[str]:
    df = _fmt(spark.read, ep, stream).load()
    return {bytes(r["data"]).decode() for r in df.collect()}


def test_batch_write_roundtrip_with_shard_routing(spark, moto_ep):
    """df.write → PutRecords → batch reader: every payload exactly once,
    ExplicitHashKey routing honored shard-for-shard."""
    from pyspark.sql import functions as F

    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-rt", ShardCount=2)

    df = (
        spark.range(40)
        .select(
            F.concat(F.lit("s-"), F.col("id")).cast("string").alias("data"),
            F.concat(F.lit("pk-"), F.col("id")).alias("partitionKey"),
            F.when(F.col("id") % 2 == 0, F.lit("0"))
            .otherwise(F.lit(_MID))
            .alias("explicitHashKey"),
        )
        .repartition(4)
    )
    _fmt(df.write, moto_ep, "sink-rt").mode("append").save()

    got = _fmt(spark.read, moto_ep, "sink-rt").load().cache()
    try:
        assert {bytes(r["data"]).decode() for r in got.collect()} == {
            f"s-{i}" for i in range(40)
        }
        by_shard = {
            r["shardId"]: r["count"]
            for r in got.groupBy("shardId").count().collect()
        }
        assert by_shard == {
            "shardId-000000000000": 20,
            "shardId-000000000001": 20,
        }
    finally:
        got.unpersist()


def test_put_batching_splits_at_500(spark, moto_ep):
    """1200 rows through ONE task must split into ≥3 PutRecords calls
    (500-record API cap) and still land exactly once each."""
    from pyspark.sql import functions as F

    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-big", ShardCount=1)

    df = (
        spark.range(1200)
        .select(
            F.concat(F.lit("big-"), F.col("id")).cast("string").alias("data"),
            F.lit("onekey").alias("partitionKey"),
        )
        .coalesce(1)
    )
    _fmt(df.write, moto_ep, "sink-big").mode("append").save()

    assert _payloads(spark, moto_ep, "sink-big") == {
        f"big-{i}" for i in range(1200)
    }


def test_partial_failure_retries_only_failed_subset(spark, moto_ep, tmp_path):
    """failFirstPutMarker forces the first PutRecords call to land only its
    first half and report the rest throttled. The sink must resend ONLY the
    failed tail: the readback has every payload exactly once — a duplicate
    would mean the landed half was resent, a gap would mean the failed half
    was dropped."""
    from pyspark.sql import functions as F

    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-flaky", ShardCount=1)
    marker = str(tmp_path / "inject.marker")

    df = (
        spark.range(100)
        .select(
            F.concat(F.lit("f-"), F.col("id")).cast("string").alias("data"),
            F.concat(F.lit("pk-"), F.col("id")).alias("partitionKey"),
        )
        .coalesce(1)
    )
    (
        _fmt(df.write, moto_ep, "sink-flaky")
        .option("failFirstPutMarker", marker)
        .mode("append")
        .save()
    )

    import os

    assert os.path.exists(marker)  # the injection actually fired
    got = _fmt(spark.read, moto_ep, "sink-flaky").load().collect()
    payloads = [bytes(r["data"]).decode() for r in got]
    assert sorted(payloads) == sorted(f"f-{i}" for i in range(100))
    assert len(payloads) == len(set(payloads))  # no duplicates


def test_streaming_writer_epochs_are_not_replayed(spark, moto_ep, tmp_path):
    """writeStream → Kinesis over two availableNow runs sharing one
    checkpoint: the second run must produce ONLY the new file's rows (a
    committed epoch is never resent), so the stream holds each payload
    exactly once."""
    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-stream", ShardCount=1)

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("data string, partitionKey string")
            .json(str(src))
        )
        q = (
            _fmt(stream.writeStream, moto_ep, "sink-stream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)
        assert not q.isActive

    (src / "a.json").write_text(
        "\n".join(
            f'{{"data": "e1-{i}", "partitionKey": "pk-{i}"}}'
            for i in range(30)
        )
    )
    run_once()
    assert _payloads(spark, moto_ep, "sink-stream") == {
        f"e1-{i}" for i in range(30)
    }

    (src / "b.json").write_text(
        "\n".join(
            f'{{"data": "e2-{i}", "partitionKey": "pk-{i}"}}'
            for i in range(20)
        )
    )
    run_once()
    got = _fmt(spark.read, moto_ep, "sink-stream").load().collect()
    payloads = [bytes(r["data"]).decode() for r in got]
    assert sorted(payloads) == sorted(
        [f"e1-{i}" for i in range(30)] + [f"e2-{i}" for i in range(20)]
    )


def test_sink_schema_and_mode_validation(spark, moto_ep):
    """Missing required columns and overwrite mode fail loudly at plan
    time, not as a half-produced stream."""
    from pyspark.sql import functions as F

    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-val", ShardCount=1)

    bad = spark.range(3).select(F.col("id").cast("string").alias("data"))
    with pytest.raises(Exception, match="partitionKey"):
        _fmt(bad.write, moto_ep, "sink-val").mode("append").save()

    ok = spark.range(3).select(
        F.col("id").cast("string").alias("data"),
        F.lit("pk").alias("partitionKey"),
    )
    with pytest.raises(Exception, match="append-only"):
        _fmt(ok.write, moto_ep, "sink-val").mode("overwrite").save()


def test_oversized_record_rejected(spark, moto_ep):
    """A record over the 1 MiB PutRecords limit raises instead of letting
    the API reject it mid-batch."""
    from pyspark.sql import functions as F

    _registered(spark)
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sink-fat", ShardCount=1)

    fat = spark.range(1).select(
        F.repeat(F.lit("x"), 1024 * 1024 + 10).alias("data"),
        F.lit("pk").alias("partitionKey"),
    )
    with pytest.raises(Exception, match="1 MiB|exceeds"):
        _fmt(fat.write, moto_ep, "sink-fat").mode("append").save()
