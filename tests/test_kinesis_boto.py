"""E2E for the boto3-backed Kinesis connector against a real wire-protocol
endpoint (moto server) — the reference's live-Kinesis path
(src/Kinesis/Kinesis.hs) exercised for real: shard listing, per-shard
batch drain, streaming tail with checkpoint resume, and resharding."""

from __future__ import annotations

import logging
import time

import pytest

try:
    from moto.server import ThreadedMotoServer

    HAVE_MOTO = True
except ImportError:  # pragma: no cover - moto is present in CI/dev images
    HAVE_MOTO = False

pytestmark = pytest.mark.skipif(not HAVE_MOTO, reason="moto not installed")

#: midpoint of the 128-bit hash space: ExplicitHashKey below -> shard 0,
#: at/above -> shard 1 (2-shard streams split evenly)
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


def _put(client, stream: str, n: int, tag: str, shard_of=lambda i: i % 2):
    recs = [
        {
            "Data": f"{tag}-{i}".encode(),
            "PartitionKey": f"pk-{tag}-{i}",
            "ExplicitHashKey": "0" if shard_of(i) == 0 else _MID,
        }
        for i in range(n)
    ]
    resp = client.put_records(StreamName=stream, Records=recs)
    assert resp["FailedRecordCount"] == 0


def _reader(spark, ep, stream):
    from kinesis_app_spark.sources.kinesis_boto import register

    register(spark)
    return (
        spark.read.format("kinesis_boto")
        .option("streamName", stream)
        .option("endpointUrl", ep)
        .option("region", "us-east-1")
        .option("accessKeyId", "testing")
        .option("secretAccessKey", "testing")
    )


def test_batch_snapshot_reads_all_shards(spark, moto_ep):
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="batchy", ShardCount=2)
    _put(client, "batchy", 40, "b")

    df = _reader(spark, moto_ep, "batchy").load().cache()
    try:
        assert df.count() == 40
        by_shard = {
            r["shardId"]: r["n"]
            for r in df.groupBy("shardId").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert by_shard == {
            "shardId-000000000000": 20,
            "shardId-000000000001": 20,
        }
        # payload + key roundtrip, and per-shard seqs unique
        rows = df.collect()
        assert {bytes(r["data"]).decode() for r in rows} == {
            f"b-{i}" for i in range(40)
        }
        assert len({(r["shardId"], r["sequenceNumber"]) for r in rows}) == 40
        assert all(r["approximateArrivalTimestamp"] is not None for r in rows)
    finally:
        df.unpersist()


def test_streaming_tail_resumes_from_checkpoint(spark, moto_ep, tmp_path):
    """Tail 30 records, stop, land 20 more, restart from the checkpoint:
    the second run resumes via AFTER_SEQUENCE_NUMBER (the reference's
    AfterSequenceNumber path) and the sink is exactly-once — 50 rows, no
    duplicates, no gaps."""
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="taily", ShardCount=2)
    _put(client, "taily", 30, "t1")

    from kinesis_app_spark.sources.kinesis_boto import register

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_until(n_rows: int, timeout: float = 90.0):
        stream = (
            spark.readStream.format("kinesis_boto")
            .option("streamName", "taily")
            .option("endpointUrl", moto_ep)
            .option("region", "us-east-1")
            .option("accessKeyId", "testing")
            .option("secretAccessKey", "testing")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= n_rows:
                        return
                except Exception:
                    pass
                time.sleep(1.0)
            raise TimeoutError(f"sink never reached {n_rows} rows")
        finally:
            q.stop()

    run_until(30)
    _put(client, "taily", 20, "t2")
    run_until(50)

    got = spark.read.parquet(out)
    assert got.count() == 50
    assert got.select("shardId", "sequenceNumber").distinct().count() == 50
    payloads = {bytes(r["data"]).decode() for r in got.collect()}
    assert payloads == {f"t1-{i}" for i in range(30)} | {
        f"t2-{i}" for i in range(20)
    }


def test_batch_read_after_reshard_sees_parents_and_children(spark, moto_ep):
    """SplitShard mid-stream: the snapshot drains the CLOSED parent to its
    end and the children from their TRIM_HORIZON — nothing lost, nothing
    doubled (the reference's known-untested hole, /root/reference/README.md:8)."""
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="sharder", ShardCount=1)
    _put(client, "sharder", 10, "pre", shard_of=lambda i: 0)
    client.split_shard(
        StreamName="sharder",
        ShardToSplit="shardId-000000000000",
        NewStartingHashKey=_MID,
    )
    _put(client, "sharder", 10, "post", shard_of=lambda i: i % 2)

    # the stream now has a CLOSED parent + two open children, and the
    # connector schedules one task per shard for all three
    desc = client.list_shards(StreamName="sharder")["Shards"]
    assert len(desc) == 3
    assert "EndingSequenceNumber" in desc[0]["SequenceNumberRange"]

    df = _reader(spark, moto_ep, "sharder").load().cache()
    try:
        rows = df.collect()
        # nothing lost, nothing doubled — regardless of which physical
        # shard moto lands post-split writes on (moto routes them to the
        # closed parent; real Kinesis would use the children — both are
        # just shardId labels to the drain)
        assert {bytes(r["data"]).decode() for r in rows} == {
            f"pre-{i}" for i in range(10)
        } | {f"post-{i}" for i in range(10)}
        assert "shardId-000000000000" in {r["shardId"] for r in rows}
        assert len({(r["shardId"], r["sequenceNumber"]) for r in rows}) == 20
    finally:
        df.unpersist()


def test_throttling_is_retried(spark, moto_ep, monkeypatch):
    """The reference retries ProvisionedThroughputExceededException with
    exponential backoff (kinesisH + awsPolicy). Simulate one throttle on
    the first GetRecords: the connector must retry and deliver."""
    from botocore.exceptions import ClientError

    from kinesis_app_spark.sources import kinesis_boto as kb

    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="throttled", ShardCount=1)
    _put(client, "throttled", 5, "x", shard_of=lambda i: 0)

    calls = {"n": 0}
    real_with_retries = kb._with_retries

    def flaky_with_retries(fn, max_retries):
        def wrapped():
            calls["n"] += 1
            if calls["n"] == 1:
                raise ClientError(
                    {
                        "Error": {
                            "Code": "ProvisionedThroughputExceededException",
                            "Message": "slow down",
                        }
                    },
                    "GetRecords",
                )
            return fn()

        return real_with_retries(wrapped, max_retries)

    monkeypatch.setattr(kb, "_with_retries", flaky_with_retries)
    conn = kb._conn_opts(
        {
            "streamname": "throttled",
            "endpointurl": moto_ep,
            "accesskeyid": "testing",
            "secretaccesskey": "testing",
        }
    )
    c = kb._client(conn)
    shards = kb._list_shards(c, "throttled", 3)
    rows = []
    for b in kb.KinesisBotoBatchReader(conn).read(
        kb._KShard(shards[0]["ShardId"], conn)
    ):
        rows.extend(b.to_pylist())
    assert len(rows) == 5
    assert calls["n"] >= 2  # first attempt throttled, retry succeeded


def test_nonretryable_error_crashes():
    """Everything outside the retry taxonomy crashes (the reference's
    'Crashing.' branch in handleLog)."""
    from botocore.exceptions import ClientError

    from kinesis_app_spark.sources import kinesis_boto as kb

    err = ClientError(
        {"Error": {"Code": "AccessDeniedException", "Message": "no"}},
        "GetRecords",
    )
    assert not kb._is_retryable(err)
    boom = {"n": 0}

    def fn():
        boom["n"] += 1
        raise err

    with pytest.raises(ClientError):
        kb._with_retries(fn, 5)
    assert boom["n"] == 1  # no retry on a non-retryable code


def test_latest_start_skips_history(spark, moto_ep, tmp_path):
    """startingPosition=LATEST (the reference's default start,
    src/Kinesis/Kinesis.hs:62-64): records already in the stream when the
    query starts are skipped; records landing after are delivered exactly
    once, and a checkpoint restart keeps the resolved offsets (no
    re-skip, no replay of history)."""
    client = _kinesis_client(moto_ep)
    client.create_stream(StreamName="lately", ShardCount=2)
    _put(client, "lately", 20, "old")

    from kinesis_app_spark.sources.kinesis_boto import register

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_until(n_rows: int, timeout: float = 90.0):
        stream = (
            spark.readStream.format("kinesis_boto")
            .option("streamName", "lately")
            .option("endpointUrl", moto_ep)
            .option("region", "us-east-1")
            .option("accessKeyId", "testing")
            .option("secretAccessKey", "testing")
            .option("startingPosition", "LATEST")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= n_rows:
                        return
                except Exception:
                    pass
                time.sleep(1.0)
            raise TimeoutError(f"sink never reached {n_rows} rows")
        finally:
            q.stop()

    # start at LATEST, then land new records; only those arrive
    import threading

    def put_later():
        time.sleep(3.0)
        _put(client, "lately", 10, "new1")

    t = threading.Thread(target=put_later)
    t.start()
    run_until(10)
    t.join()

    got = {
        bytes(r["data"]).decode()
        for r in spark.read.parquet(out).collect()
    }
    assert got == {f"new1-{i}" for i in range(10)}  # history skipped

    # restart from checkpoint: more records, still exactly-once
    _put(client, "lately", 5, "new2")
    run_until(15)
    rows = spark.read.parquet(out).collect()
    payloads = [bytes(r["data"]).decode() for r in rows]
    assert sorted(payloads) == sorted(
        [f"new1-{i}" for i in range(10)] + [f"new2-{i}" for i in range(5)]
    )
    assert len({(r["shardId"], r["sequenceNumber"]) for r in rows}) == 15
