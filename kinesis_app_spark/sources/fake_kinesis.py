"""A deterministic Kinesis-shaped data source built on Spark's Python
DataSource API — the reference's ingestion model re-expressed as a pluggable
source.

Parity map (reference -> here):
- shard discovery, `getAllShards` (src/Kinesis/Kinesis.hs:42-49)
  -> ``partitions()``: one InputPartition per shard, so Spark schedules one
  task per shard exactly like the reference's one-worker-per-shard loop
  (src/Kinesis/Coordination.hs:248-257).
- `streamRecords` with `AfterSequenceNumber` resume + batch limit
  (src/Kinesis/Kinesis.hs:54-77) -> ``FakeKinesisStreamReader``: offsets are
  {shard_id: next_sequence_number} dicts; each micro-batch reads at most
  ``maxRecordsPerFetch`` per shard (`configRecordBatch`,
  src/Kinesis/Types.hs:79-80); the checkpoint log stores the offsets, which
  IS the reference's Redis `_shardSeq` (src/Kinesis/Types.hs:98) done by the
  engine.
- the record shape matches schemas.STREAM_RECORD minus streamName (constant
  per source): opaque binary payload + partition key + sequence number +
  arrival timestamp (src/Kinesis/Kinesis.hs:59).

Payloads are deterministic JSON bytes derived from (shard, seq), so tests
can assert exact contents after resume — the driver-side analogue of the
reference's "restart position" guarantee, but exactly-once.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "shardId string, sequenceNumber bigint, partitionKey string, "
    "data binary, approximateArrivalTimestamp timestamp"
)

_BASE_TS = dt.datetime(2024, 1, 1)


def _record(shard: int, seq: int):
    key = hashlib.md5(f"{shard}-{seq}".encode()).hexdigest()[:8]
    payload = json.dumps(
        {"shard": shard, "seq": seq, "user": (shard * 7919 + seq) % 100}
    ).encode()
    return (
        f"shardId-{shard:012d}",
        seq,
        key,
        payload,
        _BASE_TS + dt.timedelta(seconds=seq),
    )


class _ShardSlice(InputPartition):
    def __init__(self, shard: int, start: int, end: int):
        self.shard = shard
        self.start = start
        self.end = end


class FakeKinesisDataSource(DataSource):
    """Options: numShards (default 4), recordsPerShard (default 1000),
    maxRecordsPerFetch (stream batch limit per shard, default 100)."""

    @classmethod
    def name(cls):
        return "fake_kinesis"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return FakeKinesisBatchReader(self.options)

    def streamReader(self, schema):
        return FakeKinesisStreamReader(self.options)


def _opts(options):
    return (
        int(options.get("numshards", 4)),
        int(options.get("recordspershard", 1000)),
        int(options.get("maxrecordsperfetch", 100)),
    )


class FakeKinesisBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_shards, self.per_shard, _ = _opts(options)

    def partitions(self):
        return [_ShardSlice(s, 0, self.per_shard) for s in range(self.n_shards)]

    def read(self, partition: _ShardSlice):
        for seq in range(partition.start, partition.end):
            yield _record(partition.shard, seq)


class FakeKinesisStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = {shard_id_str: next_seq}.

    ``latestOffset`` must be restart-safe: a fresh reader instance may be
    created against an old checkpoint, and reporting anything below the
    committed offset would plan a backwards batch and re-deliver records
    (exactly the reference's unsafe max-seq ack bug, inverted —
    src/Kinesis/Coordination.hs:331-332). So the available end is derived
    from the source's state (here: the bounded shard length), never from
    reader-local mutable counters. The ``maxRecordsPerFetch`` limit
    (`configRecordBatch`, src/Kinesis/Types.hs:79-80) is honored as *task*
    granularity instead: each shard's range splits into fetch-sized input
    slices, bounding per-task fetch size like the reference's per-
    GetRecords limit.
    """

    def __init__(self, options):
        self.n_shards, self.per_shard, self.max_fetch = _opts(options)

    def initialOffset(self):
        # the engine's TRIM_HORIZON; the reference defaults to Latest
        # (src/Kinesis/Kinesis.hs:63) which for a bounded test source would
        # read nothing — start-position choice is the connector option.
        return {str(s): 0 for s in range(self.n_shards)}

    def latestOffset(self):
        return {str(s): self.per_shard for s in range(self.n_shards)}

    def partitions(self, start: dict, end: dict):
        slices = []
        for s in start:
            lo, hi = int(start[s]), int(end[s])
            while lo < hi:
                step = min(self.max_fetch, hi - lo)
                slices.append(_ShardSlice(int(s), lo, lo + step))
                lo += step
        return slices

    def read(self, partition: _ShardSlice):
        for seq in range(partition.start, partition.end):
            yield _record(partition.shard, seq)

    def commit(self, end: dict):
        # offsets are durable in the checkpoint log; nothing to do —
        # this hook is where the reference wrote _shardSeq to Redis
        # (src/Kinesis/Coordination.hs:343-359).
        pass


def register(spark) -> None:
    spark.dataSource.register(FakeKinesisDataSource)
