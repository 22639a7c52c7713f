"""Round-6 defect fixes (ADVICE.md):

- maxBatchSeconds must never emit a planning bound BEHIND the
  checkpointed offset of a cleanly-restarted query (regressed bounds
  become batch ends and the following batch re-reads committed arrival
  windows — duplicate delivery);
- the executor scan's stop rule must be a pure function of
  (start, end, jitter), never of GetRecords response chunking;
- unstamped records must land in exactly one batch across replays;
- the Z-order key must fit in 63 bits at any column count, with no
  partition-less global window in its plan.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators import versioned as VT
from kinesis_app_spark.sources import kinesis_boto as KB


# ---------------------------------------------------------------------
# maxBatchSeconds planner-position discipline
# ---------------------------------------------------------------------


def _conn(**extra):
    opts = {
        "streamname": "t",
        "maxbatchseconds": "1",
        "planninglagseconds": "0",
    }
    opts.update({k.lower(): v for k, v in extra.items()})
    return KB._conn_opts(opts)


def _reader(monkeypatch, backlog_head_us: int, **extra):
    rdr = KB.KinesisPartitionedStreamReader(_conn(**extra))
    monkeypatch.setattr(rdr, "_oldest_arrival_us", lambda: backlog_head_us)
    return rdr


def test_clean_restart_first_latest_offset_is_uncapped(monkeypatch):
    """A restarted planner that has learned NO position (no
    partitions/commit replay, no planner state) must not cap from the
    anchor: the checkpoint is invisible here and an anchor-capped bound
    can sit BEHIND it — the next batch would then re-read committed
    windows. The first call returns the uncapped now instead."""
    old = int((time.time() - 3600) * 1_000_000)  # hour-old backlog head
    rdr = _reader(monkeypatch, old)
    t0 = int(time.time() * 1_000_000)
    end = rdr.latestOffset()["ts_us"]
    # NOT anchor + 1s (that would be an hour behind a live checkpoint)
    assert end >= t0 - 1_000_000
    # capping resumes immediately after the first emission
    end2 = rdr.latestOffset()["ts_us"]
    assert end2 - end <= 1_000_000


def test_fresh_query_initial_offset_enables_the_cap(monkeypatch):
    """initialOffset is only ever asked for when there is NO checkpoint
    — the anchor is the query's true position, so the first capped
    advance from it is safe and bounded."""
    old = int((time.time() - 3600) * 1_000_000)
    rdr = _reader(monkeypatch, old)
    start = rdr.initialOffset()["ts_us"]
    assert start == old - 1_000_000  # anchored at the backlog head
    end = rdr.latestOffset()["ts_us"]
    assert end - start <= 1_000_000  # bounded first batch


def test_planner_state_dir_keeps_cap_bounded_across_restart(
    monkeypatch, tmp_path
):
    """With plannerStateDir, every emitted bound is persisted BEFORE it
    can reach Spark's offset log, so a restarted planner resumes capping
    from a position never behind the checkpoint — bounded AND safe."""
    old = int((time.time() - 3600) * 1_000_000)
    sd = str(tmp_path / "planner")
    a = _reader(monkeypatch, old, plannerStateDir=sd)
    # a fresh query with the state dir configured but no file yet: the
    # cap applies from the anchor (nothing was ever emitted)
    e1 = a.latestOffset()["ts_us"]
    assert e1 - (old - 1_000_000) <= 1_000_000
    e2 = a.latestOffset()["ts_us"]
    assert e2 - e1 <= 1_000_000

    # "restart": a brand-new reader in a new process would read the
    # persisted bound and resume capping from it
    b = _reader(monkeypatch, old, plannerStateDir=sd)
    assert b._last_ts_us == e2  # learned the persisted position
    e3 = b.latestOffset()["ts_us"]
    assert e3 >= e2              # never regresses behind the checkpoint
    assert e3 - e2 <= 1_000_000  # and stays bounded


# ---------------------------------------------------------------------
# chunk-independent scan boundary + unstamped-record placement
# ---------------------------------------------------------------------


def _ts(us):
    return dt.datetime.fromtimestamp(us / 1e6, tz=dt.timezone.utc)


def _rec(seq, us):
    return {
        "SequenceNumber": str(seq),
        "PartitionKey": "pk",
        "Data": f"r{seq}".encode(),
        **(
            {"ApproximateArrivalTimestamp": _ts(us)}
            if us is not None
            else {}
        ),
    }


class _FakeClient:
    """Replays a fixed record sequence under an arbitrary response
    chunking — the thing the scan must be invariant to."""

    def __init__(self, chunks):
        self.chunks = list(chunks)
        self.i = 0

    def get_shard_iterator(self, **kw):
        return {"ShardIterator": "it"}

    def get_records(self, ShardIterator, Limit):
        if self.i < len(self.chunks):
            recs = self.chunks[self.i]
            self.i += 1
            return {
                "Records": recs,
                "NextShardIterator": "it",
                "MillisBehindLatest": 1,
            }
        return {"Records": [], "NextShardIterator": "it",
                "MillisBehindLatest": 0}


def _scan(monkeypatch, chunks, start_us, end_us):
    monkeypatch.setattr(KB, "_client", lambda conn: _FakeClient(chunks))
    rdr = KB.KinesisPartitionedStreamReader(_conn())
    part = KB._KShardTsRange("s0", _conn(), start_us, end_us)
    out = []
    for batch in rdr.read(part):
        out.extend(x.decode() for x in batch.column("data").to_pylist())
    return out


def test_scan_boundary_is_chunk_independent(monkeypatch):
    """An out-of-order straddler (ts <= end) sequenced AFTER a past-end
    record is taken REGARDLESS of which GetRecords response it lands in;
    the scan stops only past end + jitter. Round 5 stopped at the end of
    the response holding the first past-end record, so replay membership
    depended on service chunking."""
    recs = [
        _rec(1, 5_000_000),    # in window
        _rec(2, 10_500_000),   # past end, within the 1s jitter allowance
        _rec(3, 9_800_000),    # straddler: belongs to THIS batch
        _rec(4, 12_000_000),   # past end + jitter: deterministic stop
        _rec(5, 9_900_000),    # beyond the stop: never scanned
    ]
    expect = ["r1", "r3"]
    one_resp = _scan(monkeypatch, [recs], 0, 10_000_000)
    split_a = _scan(monkeypatch, [recs[:2], recs[2:]], 0, 10_000_000)
    split_b = _scan(
        monkeypatch, [[r] for r in recs], 0, 10_000_000
    )
    assert one_resp == split_a == split_b == expect


def test_unstamped_record_lands_in_exactly_one_batch(monkeypatch):
    """A record with no ApproximateArrivalTimestamp inherits its
    predecessor's batch: included exactly where the predecessor is
    included, skipped as boundary tail everywhere else — across every
    batch that scans it."""
    recs = [
        _rec(1, 5_000_000),
        _rec(2, None),         # unstamped: rides with r1
        _rec(3, 15_000_000),
        _rec(4, None),         # unstamped: rides with r3
    ]
    b1 = _scan(monkeypatch, [recs], 0, 10_000_000)
    b2 = _scan(monkeypatch, [recs], 10_000_000, 20_000_000)
    assert b1 == ["r1", "r2"]
    assert b2 == ["r3", "r4"]
    # chunking does not change the placement either
    b1s = _scan(monkeypatch, [[r] for r in recs], 0, 10_000_000)
    b2s = _scan(monkeypatch, [[r] for r in recs], 10_000_000, 20_000_000)
    assert b1s == b1 and b2s == b2


def test_unstamped_head_record_belongs_to_the_first_batch(monkeypatch):
    """An unstamped record with NO stamped predecessor is taken by the
    TRIM_HORIZON (first-ever) scan and skipped by every later one."""
    recs = [_rec(1, None), _rec(2, 5_000_000)]
    first = _scan(monkeypatch, [recs], 0, 10_000_000)
    later = _scan(monkeypatch, [recs], 4_000_000, 10_000_000)
    assert first == ["r1", "r2"]
    assert later == ["r2"]  # r1 is the pre-history tail, not re-emitted


# ---------------------------------------------------------------------
# key-set (not interval) MERGE file pruning
# ---------------------------------------------------------------------


def _clustered_table(spark, tmp_path, n=100, files=4):
    table = str(tmp_path / "vt")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    VT.vt_create(df.coalesce(1), table)
    VT.vt_optimize(
        spark, table, cluster_cols=["k"], max_records_per_file=n // files
    )
    return table


def _files(table, version):
    return {f["path"]: f for f in VT.vt_files(table, version)}


def test_scattered_extreme_keys_rewrite_only_their_files(spark, tmp_path):
    """A 2-key change batch touching BOTH key extremes rewrites exactly
    the 2 files holding those keys. Round 5's interval pruning reduced
    the batch to one global [min,max] — such a batch intersected EVERY
    file and silently degraded to a full-snapshot rewrite (the common
    shape of real CDC batches)."""
    table = _clustered_table(spark, tmp_path)
    v0 = VT.vt_latest_version(table)
    base = _files(table, v0)
    assert len(base) >= 4
    ch = spark.createDataFrame(
        [(0, -1, "U"), (99, -99, "U")], "k long, v long, op string"
    )
    v1 = VT.vt_merge(spark, table, ch, keys=["k"])
    new = _files(table, v1)
    rewritten = set(base) - set(new)
    assert len(rewritten) == 2, (
        f"exactly the two extreme-range files should be replaced: "
        f"{sorted(rewritten)}"
    )
    assert len(set(base) & set(new)) == len(base) - 2  # rest carried
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, table).collect()}
    expect = {k: k * 2 for k in range(100)}
    expect[0], expect[99] = -1, -99
    assert got == expect


def test_key_set_pruning_falls_back_above_the_key_bound(spark, tmp_path):
    """Above max_prune_keys distinct keys the merge uses the interval
    test (bounded driver memory) — results identical, pruning coarser."""
    table = _clustered_table(spark, tmp_path)
    ch = spark.createDataFrame(
        [(0, -1, "U"), (99, -99, "U")], "k long, v long, op string"
    )
    v0 = VT.vt_latest_version(table)
    base = _files(table, v0)
    v1 = VT.vt_merge(spark, table, ch, keys=["k"], max_prune_keys=1)
    new = _files(table, v1)
    # interval [0, 99] spans every file: full rewrite (the r5 behavior)
    assert not (set(base) & set(new))
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, table).collect()}
    assert got[0] == -1 and got[99] == -99 and got[50] == 100


def test_multi_column_key_pruning_is_conservative(spark, tmp_path):
    """Composite keys: per-column key-set tests keep at least the files
    that could hold a matching tuple; rows always merge correctly."""
    table = str(tmp_path / "vt2")
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") / F.lit(10)).cast("long").alias("k2"),
        F.col("id").alias("v"),
    )
    VT.vt_create(df.coalesce(1), table)
    VT.vt_optimize(spark, table, cluster_cols=["k1", "k2"],
                   max_records_per_file=25)
    ch = spark.createDataFrame(
        [(3, 7, -1, "U"), (3, 8, None, "D")],
        "k1 long, k2 long, v long, op string",
    )
    VT.vt_merge(spark, table, ch, keys=["k1", "k2"])
    got = {
        (r["k1"], r["k2"]): r["v"]
        for r in VT.vt_read(spark, table).collect()
    }
    assert got[(3, 7)] == -1
    assert (3, 8) not in got
    assert len(got) == 99


# ---------------------------------------------------------------------
# incremental manifest commits + checkpoints + _last pointer
# ---------------------------------------------------------------------


def _raw_manifest(table, version):
    import json

    with open(VT._manifest_path(table, version)) as fh:
        return json.load(fh)


def test_commit_payload_is_independent_of_table_file_count(
    spark, tmp_path
):
    """A point merge into a MANY-file table commits add/remove actions
    for the touched files only — the manifest JSON does not re-list the
    table. (Round 5 serialized the complete file list per commit:
    O(total files) metadata per hourly merge at 10^5-10^6 files.)"""
    table = str(tmp_path / "vt")
    df = spark.range(4096).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    VT.vt_create(df.coalesce(1), table)
    VT.vt_optimize(spark, table, cluster_cols=["k"],
                   max_records_per_file=64)  # v1: 64 files
    n_total = len(VT.vt_files(table, 1))
    assert n_total >= 64
    ch = spark.createDataFrame([(7, -7, "U")], "k long, v long, op string")
    v2 = VT.vt_merge(spark, table, ch, keys=["k"])
    m = _raw_manifest(table, v2)
    assert "files" not in m  # incremental, not a full re-listing
    assert len(m["remove"]) == 1 and len(m["add"]) >= 1
    # the payload names ~2 files regardless of the table's 64
    assert len(m["add"]) + len(m["remove"]) <= 4
    # and the resolved view reconstructs the full set exactly
    resolved = VT.vt_files(table, v2)
    assert len(resolved) == n_total  # one removed, one added
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, table).collect()}
    assert got[7] == -7 and got[8] == 16 and len(got) == 4096


def test_checkpoint_every_n_commits_bounds_the_chain(spark, tmp_path):
    """Every _CHECKPOINT_EVERY-th version stores the full file list, so
    reconstruction reads at most N manifests; intermediate versions stay
    incremental and every version time-travels correctly."""
    table = str(tmp_path / "vt")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    VT.vt_create(df.coalesce(1), table)  # v0 (checkpoint by definition)
    for i in range(1, 13):  # v1..v12: point merges
        ch = spark.createDataFrame(
            [(int(i), -int(i), "U")], "k long, v long, op string"
        )
        VT.vt_merge(spark, table, ch, keys=["k"])
    ckpt_versions = [
        v for v in range(13) if "files" in _raw_manifest(table, v)
    ]
    assert 10 in ckpt_versions  # the periodic checkpoint landed
    assert all(
        "add" in _raw_manifest(table, v)
        for v in range(1, 13) if v % VT._CHECKPOINT_EVERY != 0
    )
    # every version still reconstructs and reads
    for v in (0, 5, 10, 12):
        assert VT.vt_read(spark, table, v).count() == 100
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, table).collect()}
    assert all(got[i] == -i for i in range(1, 13))
    # history, CDF and vacuum still work over the incremental log
    assert VT.vt_history(spark, table).count() == 13
    cdf = VT.vt_changes(spark, table, 11, 12, keys=["k"]).collect()
    assert {r["_change_type"] for r in cdf} == {
        "update_preimage", "update_postimage"
    }
    VT.vt_vacuum(table, retain_last=2)
    assert VT.vt_read(spark, table).count() == 100


def test_latest_version_pointer_heals_and_falls_back(spark, tmp_path):
    """vt_latest_version reads the _last pointer; a stale pointer is
    healed by forward probing and a missing one falls back to listing."""
    import os

    table = str(tmp_path / "vt")
    VT.vt_create(
        spark.createDataFrame([(1, 1)], "k long, v long").coalesce(1), table
    )
    ch = spark.createDataFrame([(2, 2, "U")], "k long, v long, op string")
    VT.vt_merge(spark, table, ch, keys=["k"])
    assert VT.vt_latest_version(table) == 1
    # stale pointer (writer died between commit and pointer update)
    with open(VT._last_pointer_path(table), "w") as fh:
        fh.write("0")
    assert VT.vt_latest_version(table) == 1  # forward-probe healing
    # missing pointer (pre-round-6 table): listing fallback
    os.remove(VT._last_pointer_path(table))
    assert VT.vt_latest_version(table) == 1


# ---------------------------------------------------------------------
# Z-order key: 63-bit safety + no global-order window
# ---------------------------------------------------------------------


def _table4(spark, tmp_path, n=2048):
    table = str(tmp_path / "vt4")
    df = spark.range(n).select(
        F.col("id").alias("a"),
        ((F.col("id") * 2654435761) % n).alias("b"),
        ((F.col("id") * 40503) % n).alias("c"),
        ((F.col("id") * 665327) % n).alias("d"),
        ((F.col("id") * 11939) % n).alias("e"),
    )
    VT.vt_create(df.coalesce(1), table)
    return table, df


def test_zorder_key_fits_63_bits_at_4_plus_columns(spark, tmp_path):
    """With >= 4 cluster columns the old 16-bit default pushed shifts to
    the sign bit (negative keys sorting first) and past 64 (Java masks
    the shift mod 64 — silent cross-column bit collisions). The clamped
    key stays non-negative and below 2^63 for any column count."""
    _table, df = _table4(spark, tmp_path, n=512)
    for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
        zdf, rcols = VT._zorder_key(df, cols)
        mm = zdf.agg(
            F.min("__zorder").alias("lo"), F.max("__zorder").alias("hi"),
            F.countDistinct("__zorder").alias("nz"),
        ).collect()[0]
        assert mm["lo"] >= 0, f"sign bit corrupted for {cols}"
        assert mm["nz"] > 1  # the key actually discriminates


def test_zorder_plan_has_no_global_window(spark, tmp_path):
    """The rank binning is sampled (approxQuantile / seeded sample) —
    the key expression must not contain a partition-less Window (the
    round-5 percent_rank funneled the table through one task)."""
    _table, df = _table4(spark, tmp_path, n=512)
    zdf, _ = VT._zorder_key(df, ["a", "b", "c"])
    plan = zdf._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan and "percent_rank" not in plan


def test_zorder_4col_scan_prunes_on_a_trailing_column(spark, tmp_path):
    """End-to-end at 4 columns (the ADVICE corruption case): OPTIMIZE
    ZORDER over (a,b,c,d) gives the LAST column file locality — a
    d-only filter opens a strict subset — and rows stay identical."""
    table, df = _table4(spark, tmp_path)
    VT.vt_optimize(
        spark, table, cluster_cols=["a", "b", "c", "d"],
        max_records_per_file=128, zorder=True,
    )
    v = VT.vt_latest_version(table)
    n_files = len(VT.vt_files(table, v))
    assert n_files >= 8
    d_filter = [("d", ">=", 0), ("d", "<", 128)]
    opened = len(VT.vt_scan(spark, table, d_filter).inputFiles())
    assert opened < n_files, (opened, n_files)
    got = sorted(map(tuple, VT.vt_read(spark, table).collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
