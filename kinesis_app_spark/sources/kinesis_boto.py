"""A REAL AWS Kinesis connector built on Spark's Python DataSource API and
boto3 — the reference's live-Kinesis I/O path (src/Kinesis/Kinesis.hs)
re-expressed Spark-first, testable end-to-end against a local moto server
and pointable at real AWS by changing ``endpointUrl``.

Parity map (reference -> here):
- `getAllShards` / DescribeStream paging (src/Kinesis/Kinesis.hs:42-49)
  -> ``_list_shards``: boto3 ``list_shards`` with NextToken paging; batch
  ``partitions()`` emits one InputPartition per shard, so Spark schedules
  one task per shard exactly like the reference's one-worker-per-shard
  assignment (src/Kinesis/Coordination.hs:248-257).
- `streamRecords` iterator loop + AfterSequenceNumber resume
  (src/Kinesis/Kinesis.hs:54-77) -> ``_drain_shard`` (batch snapshot) and
  ``KinesisSimpleStreamReader.read`` (micro-batch tail); offsets are
  {shardId: last_sequence_number} dicts persisted in the checkpoint log —
  the reference's Redis ``_shardSeq`` (src/Kinesis/Types.hs:98) done by
  the engine, exactly-once instead of at-least-once.
- the retry taxonomy `kinesisH`/`httpRetryH`/`networkRetryH` +
  `awsPolicy` (src/Kinesis/Kinesis.hs:89-176: exponential backoff from
  25 ms capped at 60 s, bounded attempts, retry throttling/5xx/transport
  errors, crash on everything else) -> ``_with_retries``.

Scale posture: the BATCH reader is the high-throughput path — per-shard
tasks run ``GetRecords`` loops executor-side in parallel, yielding one
Arrow RecordBatch per fetch (never per-row pickling), so a backfill of a
large resharded stream fans out across the cluster. The STREAMING reader
uses ``SimpleDataSourceStreamReader`` (driver-side prefetch), which is the
documented-right choice for a control-plane-rate tail; Kinesis's own
per-shard caps (2 MB/s read) mean a single driver thread tails a handful
of shards fine, and a 100 TB replay should use the batch reader over an
offset range instead. Sequence numbers are kept as their native opaque
decimal STRINGS (they exceed int64); ordering comparisons go through
``int()``.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "shardId string, sequenceNumber string, partitionKey string, "
    "data binary, approximateArrivalTimestamp timestamp"
)

#: Kinesis error codes the reference retries (kinesisH,
#: src/Kinesis/Kinesis.hs:125-135) plus their modern boto3 spellings.
_RETRYABLE_CODES = {
    "ProvisionedThroughputExceededException",
    "InternalFailure",
    "InternalServerError",
    "ServiceUnavailable",
    "ServiceUnavailableException",
    "LimitExceededException",
    "ThrottlingException",
}


def _conn_opts(options) -> dict:
    """Connection params from (lowercased) DataSource options. Credentials
    fall back to the default boto3 chain when absent."""
    return {
        "stream": options.get("streamname"),
        "region": options.get("region", "us-east-1"),
        "endpoint_url": options.get("endpointurl") or None,
        "access_key": options.get("accesskeyid") or None,
        "secret_key": options.get("secretaccesskey") or None,
        "session_token": options.get("sessiontoken") or None,
        "max_fetch": int(options.get("maxrecordsperfetch", 10000)),
        "max_retries": int(options.get("maxretries", 10)),
        "starting_position": options.get(
            "startingposition", "TRIM_HORIZON"
        ).upper(),
    }


def _client(conn: dict):
    import boto3

    return boto3.client(
        "kinesis",
        region_name=conn["region"],
        endpoint_url=conn["endpoint_url"],
        aws_access_key_id=conn["access_key"],
        aws_secret_access_key=conn["secret_key"],
        aws_session_token=conn["session_token"],
    )


def _is_retryable(exc) -> bool:
    """The reference's three retry handlers collapsed: Kinesis error codes
    (kinesisH), HTTP transport faults (httpRetryH) and socket-level
    IOExceptions (networkRetryH) retry; everything else crashes."""
    from botocore.exceptions import (
        BotoCoreError,
        ClientError,
        ConnectionError as BotoConnectionError,
    )

    if isinstance(exc, ClientError):
        code = exc.response.get("Error", {}).get("Code", "")
        status = (
            exc.response.get("ResponseMetadata", {}).get("HTTPStatusCode", 0)
        )
        return code in _RETRYABLE_CODES or status >= 500
    if isinstance(exc, (BotoConnectionError, OSError)):
        return True
    return isinstance(exc, BotoCoreError) and "timeout" in str(exc).lower()


def _with_retries(fn, max_retries: int):
    """`awsPolicy n` (src/Kinesis/Kinesis.hs:139-142): exponential backoff
    from 25 ms, delay capped at 60 s, at most ``max_retries`` retries."""
    delay = 0.025
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by _is_retryable
            if attempt >= max_retries or not _is_retryable(e):
                raise
            time.sleep(min(delay, 60.0))
            delay *= 2


def _list_shards(client, stream: str, max_retries: int) -> list[dict]:
    """All shards, NextToken-paged — `getAllShards`'s awsIteratedList."""
    shards, token = [], None
    while True:
        def call(tok=token):
            if tok:
                return client.list_shards(NextToken=tok)
            return client.list_shards(StreamName=stream)

        resp = _with_retries(call, max_retries)
        shards.extend(resp["Shards"])
        token = resp.get("NextToken")
        if not token:
            return shards


def _to_utc_naive(ts) -> dt.datetime | None:
    if ts is None:
        return None
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return ts


def _records_to_rows(shard_id: str, records: list[dict]) -> list[tuple]:
    return [
        (
            shard_id,
            r["SequenceNumber"],
            r["PartitionKey"],
            bytes(r["Data"]),
            _to_utc_naive(r.get("ApproximateArrivalTimestamp")),
        )
        for r in records
    ]


def _rows_batch(rows: list[tuple]):
    import pyarrow as pa

    return pa.record_batch(
        {
            "shardId": pa.array([r[0] for r in rows], pa.string()),
            "sequenceNumber": pa.array([r[1] for r in rows], pa.string()),
            "partitionKey": pa.array([r[2] for r in rows], pa.string()),
            "data": pa.array([r[3] for r in rows], pa.binary()),
            "approximateArrivalTimestamp": pa.array(
                [r[4] for r in rows], pa.timestamp("us")
            ),
        }
    )


def _shard_iterator(
    client, conn: dict, shard_id: str, after_seq: str | None
) -> str:
    """AfterSequenceNumber resume when an offset exists, else the
    configured start position (src/Kinesis/Kinesis.hs:61-66)."""
    if after_seq:
        kwargs = {
            "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
            "StartingSequenceNumber": after_seq,
        }
    else:
        kwargs = {"ShardIteratorType": conn["starting_position"]}
    resp = _with_retries(
        lambda: client.get_shard_iterator(
            StreamName=conn["stream"], ShardId=shard_id, **kwargs
        ),
        conn["max_retries"],
    )
    return resp["ShardIterator"]


class _KShard(InputPartition):
    def __init__(self, shard_id: str, conn: dict):
        self.shard_id = shard_id
        self.conn = conn


class KinesisBotoDataSource(DataSource):
    """format("kinesis_boto"). Options: streamName (required), region,
    endpointUrl (point at moto/kinesalite/LocalStack or leave unset for
    real AWS), accessKeyId/secretAccessKey/sessionToken (else the default
    boto3 chain), startingPosition (TRIM_HORIZON default | LATEST — batch
    snapshot only supports TRIM_HORIZON), maxRecordsPerFetch (GetRecords
    Limit, default 10000), maxRetries (default 10, the reference's
    `runKinesis 10`)."""

    @classmethod
    def name(cls):
        return "kinesis_boto"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        conn = _conn_opts(self.options)
        if not conn["stream"]:
            raise ValueError("kinesis_boto: streamName option is required")
        if conn["starting_position"] != "TRIM_HORIZON":
            raise ValueError(
                "kinesis_boto batch snapshot reads the full retained "
                "stream; startingPosition must be TRIM_HORIZON"
            )
        return KinesisBotoBatchReader(conn)

    def simpleStreamReader(self, schema):
        conn = _conn_opts(self.options)
        if not conn["stream"]:
            raise ValueError("kinesis_boto: streamName option is required")
        return KinesisSimpleStreamReader(conn)


class KinesisBotoBatchReader(DataSourceReader):
    """Bounded snapshot of the retained stream: one task per shard, each
    draining its shard's GetRecords loop executor-side — the distributed
    backfill/replay path."""

    def __init__(self, conn: dict):
        self.conn = conn

    def partitions(self):
        client = _client(self.conn)
        shards = _list_shards(client, self.conn["stream"],
                              self.conn["max_retries"])
        return [_KShard(s["ShardId"], self.conn) for s in shards]

    def read(self, partition: _KShard):
        conn = partition.conn
        client = _client(conn)
        it = _shard_iterator(client, conn, partition.shard_id, None)
        while it:
            resp = _with_retries(
                lambda i=it: client.get_records(
                    ShardIterator=i, Limit=conn["max_fetch"]
                ),
                conn["max_retries"],
            )
            rows = _records_to_rows(partition.shard_id, resp["Records"])
            if rows:
                yield _rows_batch(rows)
            it = resp.get("NextShardIterator")
            # snapshot termination: caught up on an open shard (closed
            # shards end with NextShardIterator=None)
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                return


class KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail. Offsets are {shardId: last_seq} (TRIM_HORIZON
    start = ""). Each ``read`` polls every shard once (newly discovered
    shards — resharding — enter at their TRIM_HORIZON); ``readBetweenOffsets``
    replays a committed range deterministically by re-reading from
    AFTER_SEQUENCE_NUMBER and clipping at the recorded end — Spark calls it
    only for batch replay after restart, which is what makes the sink
    exactly-once over an at-least-once wire protocol."""

    def __init__(self, conn: dict):
        self.conn = conn
        self._client = None

    def _cli(self):
        if self._client is None:
            self._client = _client(self.conn)
        return self._client

    def initialOffset(self):
        client = self._cli()
        shards = _list_shards(client, self.conn["stream"],
                              self.conn["max_retries"])
        if self.conn["starting_position"] != "TRIM_HORIZON":
            raise ValueError(
                "kinesis_boto streaming starts at TRIM_HORIZON; resume "
                "from a checkpoint for AfterSequenceNumber semantics"
            )
        return {s["ShardId"]: "" for s in shards}

    def _poll_shard(self, shard_id: str, after_seq: str,
                    clip_to: str | None = None) -> list[tuple]:
        client = self._cli()
        conn = self.conn
        try:
            it = _shard_iterator(client, conn, shard_id,
                                 after_seq or None)
        except Exception as e:  # noqa: BLE001
            # a fully expired/closed shard can refuse iterators; treat as
            # drained (its records live on in committed batches)
            if "ResourceNotFound" in type(e).__name__ + str(e):
                return []
            raise
        rows: list[tuple] = []
        while it:
            resp = _with_retries(
                lambda i=it: client.get_records(
                    ShardIterator=i, Limit=conn["max_fetch"]
                ),
                conn["max_retries"],
            )
            rows.extend(_records_to_rows(shard_id, resp["Records"]))
            it = resp.get("NextShardIterator")
            if clip_to is None:
                # tail mode: one fetch round per micro-batch per shard
                # bounds batch size; the next batch continues
                break
            if rows and int(rows[-1][1]) >= int(clip_to):
                break
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                break
        if clip_to is not None:
            rows = [r for r in rows if int(r[1]) <= int(clip_to)]
        return rows

    def read(self, start: dict):
        client = self._cli()
        shards = _list_shards(client, self.conn["stream"],
                              self.conn["max_retries"])
        end = dict(start)
        out: list[tuple] = []
        for s in shards:
            sid = s["ShardId"]
            rows = self._poll_shard(sid, start.get(sid, ""))
            if rows:
                end[sid] = rows[-1][1]
                out.extend(rows)
            elif sid not in end:
                end[sid] = ""
        return iter(out), end

    def readBetweenOffsets(self, start: dict, end: dict):
        out: list[tuple] = []
        for sid, end_seq in end.items():
            if not end_seq:
                continue
            start_seq = start.get(sid, "")
            if start_seq and int(start_seq) >= int(end_seq):
                continue
            out.extend(self._poll_shard(sid, start_seq, clip_to=end_seq))
        return iter(out)

    def commit(self, end: dict):
        # offsets are durable in the checkpoint log — the engine-side
        # replacement for the reference's Redis _shardSeq writeback
        # (src/Kinesis/Coordination.hs:343-359)
        pass


def register(spark) -> None:
    spark.dataSource.register(KinesisBotoDataSource)
