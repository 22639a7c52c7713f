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

Resharding (the reference's known untested hole, /root/reference/README.md:8;
shard end-of-range handling at src/Kinesis/Coordination.hs:343-359): with
``splitShard=p`` and ``splitAtSeq=S``, parent shard p closes after seq S-1
(its SequenceNumberRange gets an end) and two child shards open, delivering
seqs >= S split deterministically between them (seq parity stands in for the
hash-key-range split). Child shards are NOT in ``initialOffset`` — they are
discovered via ``latestOffset`` exactly like `getAllShards` re-listing the
stream — and ``partitions()`` defaults a child's missing start offset to its
TRIM_HORIZON (= S). Record payloads stay keyed by (parent, seq), so the
delivered logical record set is identical with or without the split; only
the shardId column shows the child. Per-shard order is preserved; like real
Kinesis consumers, cross-shard (parent-vs-child) interleaving within a
micro-batch is unordered.
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


#: child shard numeric ids start here (parent p -> children 1000+2p, 1000+2p+1)
_CHILD_BASE = 1000

#: merged-shard ids start here (parents a<b -> child 2000+a); distinct from
#: split children so both reshard kinds coexist in one id namespace
_MERGE_BASE = 2000


def _child_ids(parent: int) -> tuple[int, int]:
    return _CHILD_BASE + 2 * parent, _CHILD_BASE + 2 * parent + 1


def _record(shard_label: int, parent: int, seq: int):
    """One record. Content (key/payload/ts) is keyed by the LOGICAL stream
    position (parent, seq) so a record is byte-identical whether it arrives
    via the parent or, post-split, via a child; shard_label only names the
    physical shard in the shardId column."""
    key = hashlib.md5(f"{parent}-{seq}".encode()).hexdigest()[:8]
    payload = json.dumps(
        {"shard": parent, "seq": seq, "user": (parent * 7919 + seq) % 100}
    ).encode()
    return (
        f"shardId-{shard_label:012d}",
        seq,
        key,
        payload,
        _BASE_TS + dt.timedelta(seconds=seq),
    )


class _ShardSlice(InputPartition):
    def __init__(self, shard: int, start: int, end: int,
                 parent: int | None = None, parity: int | None = None,
                 merge_parents: tuple | None = None,
                 fail_once_dir: str | None = None):
        self.shard = shard
        self.start = start
        self.end = end
        self.parent = parent  # set for split-child shards
        self.parity = parity  # split child takes seqs with seq % 2 == parity
        self.merge_parents = merge_parents  # merge child carries BOTH streams
        #: when set, the FIRST read attempt of this slice raises (transient
        #: GetRecords failure); the retry succeeds — see _maybe_fail_once
        self.fail_once_dir = fail_once_dir


class FakeKinesisDataSource(DataSource):
    """Options: numShards (default 4), recordsPerShard (default 1000),
    maxRecordsPerFetch (stream batch limit per shard, default 100),
    splitShard/splitAtSeq and mergeShards/mergeAtSeq (resharding),
    failShardOnce + failMarkerDir (inject one transient read failure per
    slice of that shard — proves task retry / restart exactly-once)."""

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
    per_shard = int(options.get("recordspershard", 1000))
    merge_raw = options.get("mergeshards", "")
    merge = tuple(sorted(int(x) for x in merge_raw.split(","))) if merge_raw else None
    split = int(options.get("splitshard", -1))
    if merge and split >= 0:
        raise ValueError(
            "fake_kinesis: configure splitShard OR mergeShards, not both"
        )
    fail_shard = int(options.get("failshardonce", -1))
    fail_dir = options.get("failmarkerdir") or None
    if fail_shard >= 0 and not fail_dir:
        raise ValueError(
            "fake_kinesis: failShardOnce requires failMarkerDir (a writable "
            "dir shared across task attempts, holding one marker per slice)"
        )
    return (
        int(options.get("numshards", 4)),
        per_shard,
        int(options.get("maxrecordsperfetch", 100)),
        split,
        int(options.get("splitatseq", per_shard // 2)),
        merge,
        int(options.get("mergeatseq", per_shard // 2)),
        fail_shard,
        fail_dir,
    )


def _maybe_fail_once(partition: _ShardSlice) -> None:
    """Injected transient failure: the FIRST attempt to read this slice
    raises (modeling a throttled/timed-out GetRecords — the reference
    retries these in `streamRecords`, src/Kinesis/Kinesis.hs:89-176); any
    later attempt finds the marker file and succeeds. The marker key is the
    slice identity (shard, start, end), so every retry granularity Spark
    uses (task re-attempt within a job, or a whole micro-batch replay after
    a query restart) sees exactly one failure per slice. O_CREAT|O_EXCL
    makes marker creation atomic under concurrent attempts."""
    import os

    marker = os.path.join(
        partition.fail_once_dir,
        f"failed-{partition.shard}-{partition.start}-{partition.end}",
    )
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return  # already failed once; this attempt succeeds
    os.close(fd)
    raise RuntimeError(
        "fake_kinesis: injected transient GetRecords failure "
        f"(shard {partition.shard}, seqs [{partition.start}, "
        f"{partition.end})); retry will succeed"
    )


def _read_slice(partition: _ShardSlice):
    """Yield ONE Arrow RecordBatch for the slice — the vectorized Python
    DataSource path (Spark 4 accepts pyarrow.RecordBatch from read()).
    Row-at-a-time tuple yields round-trip every record through the Python
    pickler; one columnar batch per fetch slice is the shape a real
    high-throughput custom source should produce."""
    import pyarrow as pa

    if partition.fail_once_dir is not None:
        _maybe_fail_once(partition)
    if partition.merge_parents is not None:
        # a merged child interleaves BOTH parents' logical streams; order
        # (seq, parent) is deterministic, per-parent seq order preserved.
        # The child's OWN sequenceNumber is 2*seq + parent_index: real
        # Kinesis guarantees per-shard sequence uniqueness, and consumers
        # dedup on (shardId, sequenceNumber) — emitting each parent's seq
        # verbatim would collide and silently halve the child under that
        # standard dedup key. Payload/partitionKey stay keyed by the
        # LOGICAL (parent, seq) so record content is split/merge-invariant.
        rows = []
        for seq in range(partition.start, partition.end):
            for i, p in enumerate(partition.merge_parents):
                r = _record(partition.shard, p, seq)
                rows.append((r[0], 2 * seq + i) + r[2:])
    else:
        parent = (
            partition.parent if partition.parent is not None else partition.shard
        )
        seqs = [
            seq
            for seq in range(partition.start, partition.end)
            if partition.parity is None or seq % 2 == partition.parity
        ]
        rows = [_record(partition.shard, parent, seq) for seq in seqs]
    yield pa.record_batch(
        {
            "shardId": pa.array([r[0] for r in rows], pa.string()),
            "sequenceNumber": pa.array([r[1] for r in rows], pa.int64()),
            "partitionKey": pa.array([r[2] for r in rows], pa.string()),
            "data": pa.array([r[3] for r in rows], pa.binary()),
            "approximateArrivalTimestamp": pa.array(
                [r[4] for r in rows], pa.timestamp("us", tz="UTC")
            ),
        }
    )


class FakeKinesisBatchReader(DataSourceReader):
    def __init__(self, options):
        (self.n_shards, self.per_shard, _,
         self.split_shard, self.split_at,
         self.merge, self.merge_at,
         self.fail_shard, self.fail_dir) = _opts(options)

    def partitions(self):
        slices = []
        for s in range(self.n_shards):
            if s == self.split_shard:
                slices.append(_ShardSlice(s, 0, self.split_at))
                ca, cb = _child_ids(s)
                slices.append(_ShardSlice(ca, self.split_at, self.per_shard, s, 0))
                slices.append(_ShardSlice(cb, self.split_at, self.per_shard, s, 1))
            elif self.merge and s in self.merge:
                # each merged parent closes at the merge point; the child
                # is appended once (for the lower parent) below
                slices.append(_ShardSlice(s, 0, self.merge_at))
            else:
                slices.append(_ShardSlice(s, 0, self.per_shard))
        if self.merge:
            slices.append(
                _ShardSlice(
                    _MERGE_BASE + self.merge[0], self.merge_at,
                    self.per_shard, merge_parents=self.merge,
                )
            )
        for sl in slices:
            if sl.shard == self.fail_shard:
                sl.fail_once_dir = self.fail_dir
        return slices

    def read(self, partition: _ShardSlice):
        return _read_slice(partition)


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
        (self.n_shards, self.per_shard, self.max_fetch,
         self.split_shard, self.split_at,
         self.merge, self.merge_at,
         self.fail_shard, self.fail_dir) = _opts(options)

    def initialOffset(self):
        # the engine's TRIM_HORIZON; the reference defaults to Latest
        # (src/Kinesis/Kinesis.hs:63) which for a bounded test source would
        # read nothing — start-position choice is the connector option.
        # Child shards are deliberately absent: they are discovered later
        # via latestOffset, like getAllShards re-listing a resharded stream.
        return {str(s): 0 for s in range(self.n_shards)}

    def latestOffset(self):
        ends = {}
        for s in range(self.n_shards):
            if s == self.split_shard:
                ends[str(s)] = self.split_at  # parent's range is closed
                ca, cb = _child_ids(s)
                ends[str(ca)] = self.per_shard
                ends[str(cb)] = self.per_shard
            elif self.merge and s in self.merge:
                ends[str(s)] = self.merge_at  # both parents closed
            else:
                ends[str(s)] = self.per_shard
        if self.merge:
            ends[str(_MERGE_BASE + self.merge[0])] = self.per_shard
        return ends

    def partitions(self, start: dict, end: dict):
        slices = []
        for k, end_seq in end.items():
            sid, hi = int(k), int(end_seq)
            is_merge_child = sid >= _MERGE_BASE
            is_child = _CHILD_BASE <= sid < _MERGE_BASE
            # a child key missing from `start` = shard discovered this
            # batch; its TRIM_HORIZON is the reshard point
            if is_merge_child:
                lo = int(start.get(k, self.merge_at))
                mp = self.merge
                parent = parity = None
            else:
                lo = int(start.get(k, self.split_at if is_child else 0))
                mp = None
                parent = (sid - _CHILD_BASE) // 2 if is_child else None
                parity = (sid - _CHILD_BASE) % 2 if is_child else None
            while lo < hi:
                step = min(self.max_fetch, hi - lo)
                slices.append(
                    _ShardSlice(
                        sid, lo, lo + step, parent, parity, mp,
                        self.fail_dir if sid == self.fail_shard else None,
                    )
                )
                lo += step
        return slices

    def read(self, partition: _ShardSlice):
        return _read_slice(partition)

    def commit(self, end: dict):
        # offsets are durable in the checkpoint log; nothing to do —
        # this hook is where the reference wrote _shardSeq to Redis
        # (src/Kinesis/Coordination.hs:343-359).
        pass


def register(spark) -> None:
    spark.dataSource.register(FakeKinesisDataSource)
