"""Round-8 tests: the timestamp frame fixes (xxh64 UTC anchor, stat
literal frames, non-UTC session equivalence) and this round's
versioned-table features.

The round-7 verdict's one finding: the sessionless xxhash64 twin
anchored timestamp hashing at a wall clock, silently skipping
bloom-indexed files in non-UTC deployments. These tests pin the fix
from every direction a literal can arrive."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# xxh64 timestamp anchor (round-7 verdict finding #1)
# ---------------------------------------------------------------------


def test_xxh64_timestamp_instant_identity():
    """Every aware representation of ONE instant must hash identically
    — the hash is of the instant's UTC epoch micros, so the offset the
    literal happens to carry is irrelevant."""
    from kinesis_app_spark.functions.xxh64 import spark_xxhash64

    utc = dt.timezone.utc
    instant = dt.datetime(2024, 6, 1, 7, 0, 0, 123456, tzinfo=utc)
    reprs = [
        instant,
        instant.astimezone(dt.timezone(dt.timedelta(hours=5))),
        instant.astimezone(dt.timezone(dt.timedelta(hours=-11, minutes=-30))),
        instant.astimezone(dt.timezone(dt.timedelta(minutes=1))),
    ]
    hashes = {spark_xxhash64(v, "timestamp") for v in reprs}
    assert len(hashes) == 1 and None not in hashes
    # and the integer-micros form agrees (the JVM internal value)
    delta = instant - dt.datetime(1970, 1, 1, tzinfo=utc)
    micros = (delta.days * 86_400_000_000 + delta.seconds * 1_000_000
              + delta.microseconds)
    assert spark_xxhash64(micros, "timestamp") == hashes.pop()


def test_xxh64_refuses_frame_ambiguous_timestamps():
    """Naive 'timestamp' values (frame unknown: OS-local? session tz?)
    and aware 'timestamp_ntz' values must return None — the caller
    drops the probe and prunes nothing, never guesses."""
    from kinesis_app_spark.functions.xxh64 import spark_xxhash64

    assert spark_xxhash64(dt.datetime(2024, 6, 1, 12, 0),
                          "timestamp") is None
    assert spark_xxhash64(
        dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone.utc),
        "timestamp_ntz",
    ) is None


def test_xxh64_far_future_micros_exact():
    """Integer timedelta arithmetic, not .timestamp() floats: a
    year-9999 instant's micros exceed float's 2^52 exact-integer range,
    so a float path would hash a rounded instant and probe the wrong
    bucket."""
    from kinesis_app_spark.functions.xxh64 import hash_long, spark_xxhash64

    utc = dt.timezone.utc
    v = dt.datetime(9999, 12, 31, 23, 59, 59, 999999, tzinfo=utc)
    delta = v - dt.datetime(1970, 1, 1, tzinfo=utc)
    micros = (delta.days * 86_400_000_000 + delta.seconds * 1_000_000
              + delta.microseconds)
    assert micros > 2**52  # the precision cliff the float path falls off
    got = spark_xxhash64(v, "timestamp")
    want = hash_long(micros)
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert got == want


# ---------------------------------------------------------------------
# stat-literal frames (the _prune_files audit the verdict asked for)
# ---------------------------------------------------------------------


def test_stat_literal_aware_converts_to_local_frame():
    """Stats are stored as OS-local wall clocks (.collect() frame); an
    aware literal must land in the SAME frame — on this UTC host the
    local wall clock of 12:00+05:00 is 07:00."""
    from kinesis_app_spark.operators.versioned import (
        _filter_may_match, _stat_literal,
    )

    aware = dt.datetime(2024, 6, 1, 12, 0,
                        tzinfo=dt.timezone(dt.timedelta(hours=5)))
    local = aware.astimezone().replace(tzinfo=None)
    assert _stat_literal(aware) == local.isoformat()
    # frame-consistent pruning: a file whose [min,max] brackets the
    # instant is kept, one that provably misses it is pruned
    inside = {"stats": {"ts": ["2024-06-01T06:00:00",
                               "2024-06-01T08:00:00"]}}
    outside = {"stats": {"ts": ["2024-06-02T00:00:00",
                                "2024-06-03T00:00:00"]}}
    assert _filter_may_match(inside, [("ts", "=", aware)])
    assert not _filter_may_match(outside, [("ts", "=", aware)])


def test_filter_may_match_keeps_disordered_and_mixed_type_stats():
    """Conservative edges: a DST-disordered [min > max] interval and a
    literal/stat type mismatch both mean 'possibly contains' — pruning
    is an optimization, never a correctness lever."""
    from kinesis_app_spark.operators.versioned import _filter_may_match

    disordered = {"stats": {"ts": ["2024-11-03T01:30:00",
                                   "2024-11-03T01:10:00"]}}
    assert _filter_may_match(
        disordered, [("ts", "=", dt.datetime(2024, 11, 3, 1, 20))]
    )
    mixed = {"stats": {"k": ["a", "z"]}}
    assert _filter_may_match(mixed, [("k", "=", 5)])


def test_pa_file_stats_timestamp_frame_matches_collect(spark, tmp_path):
    """Sink-written files (pyarrow stats) and Spark-written files
    (.collect() stats) must store timestamp min/max in ONE frame, else
    a literal prunes one family of files correctly and the other
    wrongly."""
    from kinesis_app_spark.operators.versioned import _collect_file_stats
    from kinesis_app_spark.sources.vt_writer import _pa_file_stats

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 7, 0)),
         (2, dt.datetime(2024, 6, 2, 8, 30))],
        "id long, ts timestamp",
    )
    d = str(tmp_path / "frame")
    df.coalesce(1).write.parquet(d)
    spark_stats = _collect_file_stats(spark, d, df.schema)[0]["stats"]["ts"]
    pq_file = next(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    pa_stats = _pa_file_stats(pq_file, df.schema)["stats"]["ts"]
    assert spark_stats == pa_stats


# ---------------------------------------------------------------------
# end-to-end: timestamp bloom pushdown under a NON-UTC session tz
# ---------------------------------------------------------------------


@pytest.fixture()
def ny_session(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def _build_ts_table(spark, tmp_path, n=4000, files=8):
    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / "ts_events")
    base = dt.datetime(2024, 3, 1, 0, 0, tzinfo=dt.timezone.utc)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(
            F.lit(int(base.timestamp())) + F.col("id") * 60
        ).alias("ts"),
        # shuffle key uncorrelated with ts so clustering by it defeats
        # the min/max stats and the BLOOM is what prunes
        F.xxhash64(F.col("id")).alias("shard"),
    )
    VT.vt_create(df, table)
    VT.vt_optimize(spark, table, cluster_cols=["shard"],
                   max_records_per_file=n // files)
    VT.vt_index_bloom(spark, table, ["ts"])
    return table, base


def test_timestamp_bloom_pushdown_non_utc_session(ny_session, tmp_path):
    """The full vt_table read path with a timestamp-equality scan
    restriction, under ``spark.sql.session.timeZone=America/New_York``:
    pruning must plan fewer files AND the rows must equal the unpruned
    read — the exact deployment the round-7 wall-clock anchor silently
    corrupted."""
    import json as _json

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.sources.vt_writer import (
        VersionedTableBatchReader,
    )

    spark = ny_session
    table, base = _build_ts_table(spark, tmp_path)
    probe = base + dt.timedelta(minutes=1234)
    flt = _json.dumps([["ts", "=", {"ts": probe.isoformat()}]])

    n_files = len(VT.vt_files(table, VT.vt_latest_version(table)))
    r = VersionedTableBatchReader({"path": table, "filters": flt})
    stats_only = [f for f in r.files if VT._filter_may_match(f, r.pushed)]
    assert len(stats_only) == n_files, (
        "fixture must defeat min/max stats, else the bloom hash is "
        "untested"
    )
    planned = len(r.partitions())
    assert planned < n_files, (
        f"aware-UTC probe must bloom-prune: {planned}/{n_files}"
    )

    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", flt).load()
    )
    got = src.filter(F.col("ts") == F.lit(probe)).select("k").collect()
    want = (
        VT.vt_read(spark, table)
        .filter(F.col("ts") == F.lit(probe)).select("k").collect()
    )
    assert sorted(got) == sorted(want)
    assert got and got[0]["k"] == 1234


def test_timestamp_in_list_pushdown_non_utc_session(ny_session, tmp_path):
    """IN-list shape of the same probe (the other bloom path), plus a
    range filter that exercises the stats comparison with aware
    literals under the non-UTC session."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    spark = ny_session
    table, base = _build_ts_table(spark, tmp_path)
    probes = [base + dt.timedelta(minutes=m) for m in (7, 1234, 3999)]

    import json as _json

    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _json.dumps([[
            "ts", "in",
            [{"ts": p.astimezone(dt.timezone.utc).isoformat()}
             for p in probes],
        ]]))
        .load()
    )
    got = sorted(
        r["k"] for r in src.filter(F.col("ts").isin(*probes))
        .select("k").collect()
    )
    assert got == [7, 1234, 3999]
    lo = base + dt.timedelta(minutes=100)
    hi = base + dt.timedelta(minutes=110)
    rng = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _json.dumps([
            ["ts", ">=", {"ts": lo.isoformat()}],
            ["ts", "<", {"ts": hi.isoformat()}],
        ]))
        .load()
    )
    got_rng = sorted(
        r["k"] for r in
        rng.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .select("k").collect()
    )
    assert got_rng == list(range(100, 110))


def test_relation_reuse_never_poisoned_by_filtered_query(
    spark, tmp_path
):
    """THE reason pruning is an option, pinned as a regression: Spark
    caches one readInfo per relation and only re-plans queries that
    carry translatable filters, so a pushFilters-specialized plan is
    silently reused by filter-free queries on the same DataFrame. Our
    reader must keep every query on a shared relation exact — if this
    test fails, partition specialization leaked back into a per-query
    hook."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(100).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
        ), table,
    )
    W.register(spark)
    src = spark.read.format("vt_table").option("path", table).load()
    assert src.filter(F.col("v") == 901).count() == 0
    assert src.count() == 100, "filtered query poisoned the relation"
    assert src.filter(F.col("k") < 10).count() == 10
    assert src.count() == 100
    # and a filters-option relation serves every query shape the same
    import json as _json

    pruned = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _json.dumps([["k", "<", 10]])).load()
    )
    assert pruned.filter(F.col("k") < 5).count() == 5
    assert pruned.count() == 10


# ---------------------------------------------------------------------
# ADVICE fixes: vacuum vs open transactions, checkpoint DV deltas,
# surrogate bounds, atomic lock release
# ---------------------------------------------------------------------


def _single_file_table(spark, tmp_path, name="t", n=60):
    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / name)
    df = spark.range(n).coalesce(1).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    )
    VT.vt_create(df, table)
    return table


def test_vacuum_spares_open_txn_staged_artifacts(spark, tmp_path):
    """A vacuum running while a transaction is OPEN must not sweep its
    staged data dir (TTL-aged) or its staged DV sidecar (the DV sweep
    has no TTL at all) — pre-fix, the later commit landed manifests
    referencing deleted files: a corrupted committed version."""
    import shutil as _sh

    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import vt_transaction

    a = _single_file_table(spark, tmp_path, "a")
    b = _single_file_table(spark, tmp_path, "b")
    coord = str(tmp_path / "coord")
    txn = vt_transaction(spark, coord)
    txn.stage_append(a, spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
    txn.stage_delete_dv(b, [("k", "in", [3, 5])])
    staged_dirs = [s["data_dir"] for s in txn._staged]
    assert all(os.path.isdir(d) for d in staged_dirs)
    # the hostile sweep: TTL zero ages out everything unprotected
    VT.vt_vacuum(a, retain_last=1, stage_ttl_seconds=0.0)
    VT.vt_vacuum(b, retain_last=1, stage_ttl_seconds=0.0)
    assert all(os.path.isdir(d) for d in staged_dirs), (
        "undecided txn staging swept by vacuum"
    )
    got = txn.commit()
    assert set(got) == {a, b}
    assert VT.vt_read(spark, a).count() == 70
    assert VT.vt_read(spark, b).count() == 58
    # decided: registrations dropped, artifacts now owned by the commit
    assert not os.path.exists(TX._staging_reg_path(a, txn.txn_id))
    assert not os.path.exists(TX._staging_reg_path(b, txn.txn_id))
    # ...and a post-decision vacuum leaves the committed data readable
    VT.vt_vacuum(a, retain_last=1, stage_ttl_seconds=0.0)
    assert VT.vt_read(spark, a).count() == 70

    # leaked registration (stager died pre-lock): grace-expired regs
    # stop protecting and the artifacts fall to the normal sweep
    txn2 = vt_transaction(spark, coord)
    txn2.stage_append(a, spark.range(200, 205).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
    d2 = txn2._staged[0]["data_dir"]
    reg = TX._staging_reg_path(a, txn2.txn_id)
    assert os.path.exists(reg)
    assert VT._txn_protected_paths(a, grace=0.0) == set()
    assert not os.path.exists(reg), "grace-expired reg must be dropped"
    VT.vt_vacuum(a, retain_last=1, stage_ttl_seconds=0.0)
    assert not os.path.isdir(d2), "unprotected orphan must be swept"
    # the guard converts the sweep into a CLEAN abort, not a corrupt
    # commit
    with pytest.raises(TX.TxnAbortedError, match="staged files"):
        txn2.commit()
    assert VT.vt_read(spark, a).count() == 70
    _sh.rmtree(coord, ignore_errors=True)


def test_abort_drops_staging_registration(spark, tmp_path):
    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators.txn import vt_transaction

    a = _single_file_table(spark, tmp_path, "a")
    txn = vt_transaction(spark, str(tmp_path / "coord"))
    txn.stage_append(a, spark.range(300, 305).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
    reg = TX._staging_reg_path(a, txn.txn_id)
    data_dir = txn._staged[0]["data_dir"]
    assert os.path.exists(reg)
    txn.abort()
    assert not os.path.exists(reg)
    assert not os.path.isdir(data_dir)


def test_commit_delta_checkpoint_reports_dv_change(spark, tmp_path):
    """DELETE_DV landing on a checkpoint version (full manifest, no
    add/remove actions): the snapshot-diff fallback must report the
    DV'd file as removed+added — a path-only diff reports an empty
    delta and conflict validation misses it."""
    from kinesis_app_spark.operators import versioned as VT

    def chg(lo, hi, val):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.lit(val).cast("long").alias("v"),
            F.lit("U").alias("op"),
        )

    table = _single_file_table(spark, tmp_path, "ckpt")
    for i in range(9):  # v1..v9
        VT.vt_merge(spark, table, chg(i, i + 3, 1001 + 2 * i), keys=["k"])
    assert VT.vt_latest_version(table) == 9
    v10 = VT.vt_delete_dv(spark, table, [("k", "in", [7, 9])])
    assert v10 == 10  # the checkpoint slot
    m = VT._read_manifest(table, 10)
    assert "add" not in m and "remove" not in m, (
        "fixture must land on a FULL manifest, else the fallback path "
        "is untested"
    )
    added, removed = VT._commit_delta(table, 10)
    files9 = {f["path"] for f in VT.vt_files(table, 9)}
    dvd = [f for f in VT.vt_files(table, 10) if f.get("dv")]
    assert dvd, "the DELETE_DV must have attached a deletion vector"
    assert {f["path"] for f in added} == {f["path"] for f in dvd}
    assert removed == {f["path"] for f in dvd} and removed <= files9


def test_txn_conflicts_with_dv_delete_on_checkpoint_version(
    spark, tmp_path
):
    """The full scenario the ADVICE described: a transaction stages a
    rewrite of file F at v9; a concurrent DELETE_DV lands on F at v10
    (a checkpoint). The transaction MUST abort — committing would
    resurrect the concurrently deleted rows."""
    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import vt_transaction

    def chg(lo, hi, val):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.lit(val).cast("long").alias("v"),
            F.lit("U").alias("op"),
        )

    table = _single_file_table(spark, tmp_path, "race")
    for i in range(9):  # v1..v9
        VT.vt_merge(spark, table, chg(i, i + 3, 2001 + 2 * i), keys=["k"])
    txn = vt_transaction(spark, str(tmp_path / "coord"))
    txn.stage_merge(table, chg(20, 25, 3001), keys=["k"])
    # concurrent writer: DV-delete rows out of the same (single) file,
    # landing exactly on the checkpoint version
    assert VT.vt_delete_dv(spark, table, [("k", "in", [21, 23])]) == 10
    with pytest.raises(TX.TxnAbortedError, match="removed file"):
        txn.commit()
    # the deletion survived; the txn's rewrite did not resurrect rows
    assert VT.vt_read(spark, table).filter(
        F.col("k").isin(21, 23)).count() == 0
    assert VT.vt_latest_version(table) == 10


def test_string_prefix_upper_never_emits_lone_surrogates():
    from kinesis_app_spark.sources.vt_writer import (
        _pa_safe_filters, _string_prefix_upper,
    )

    assert _string_prefix_upper("ab") == "ac"
    hi = _string_prefix_upper("a퟿")
    assert hi == "a"
    hi.encode("utf-8")  # must be encodable for the arrow boundary
    # a lone-surrogate string anywhere in a triple is excluded by the
    # backstop (the executor read would raise instead of pruning)
    assert _pa_safe_filters([("c", "<", "a\ud800")]) == []
    assert _pa_safe_filters([("c", "in", ["ok", "a\udfff"])]) == []
    assert _pa_safe_filters([("c", "<", "plain")]) == [("c", "<", "plain")]


def test_release_lock_is_atomic_against_foreign_locks(tmp_path):
    import json as _json

    from kinesis_app_spark.operators import txn as TX

    table = str(tmp_path / "t")
    os.makedirs(table)
    lp = TX._lock_path(table)
    with open(lp, "w") as fh:
        _json.dump({"id": "T2", "decision": "", "lease": 30,
                    "ts": 0}, fh)
    # a stale resolver releasing T1 must NOT delete T2's live lock
    TX._release_lock(table, "T1")
    assert os.path.exists(lp)
    with open(lp) as fh:
        assert _json.load(fh)["id"] == "T2"
    # the owner's release removes it
    TX._release_lock(table, "T2")
    assert not os.path.exists(lp)
    # and releasing when no lock exists is a no-op
    TX._release_lock(table, "T2")
    # no tombstone litter left behind
    assert not [n for n in os.listdir(table) if ".tb." in n]


# ---------------------------------------------------------------------
# cross-table consistent read snapshots (txn_snapshot)
# ---------------------------------------------------------------------


def _mk_ab(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT

    a, b = str(tmp_path / "sa"), str(tmp_path / "sb")
    VT.vt_create(
        spark.range(100).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
        ), a,
    )
    VT.vt_create(
        spark.range(50).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("w")
        ), b,
    )
    return a, b


def test_txn_snapshot_excludes_undecided_and_includes_decided(
    spark, tmp_path
):
    """A reserved-but-undecided transaction is invisible to the
    snapshot; after the decision+finalize the SAME call pins both new
    versions — never one of each."""
    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import (
        VtTransaction, txn_snapshot,
    )

    a, b = _mk_ab(spark, tmp_path)
    coord = str(tmp_path / "coord")
    va, vb = VT.vt_latest_version(a), VT.vt_latest_version(b)

    txn = VtTransaction(spark, coord, lease=60.0)
    txn.stage_append(a, spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
    txn.stage_append(b, spark.range(50, 60).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("w")))
    TX._local.txn_id = txn.txn_id
    try:
        txn._acquire_locks()
        reserved = txn._validate_and_reserve()
    finally:
        TX._local.txn_id = None
    pins = txn_snapshot([a, b])
    assert pins == {a: va, b: vb}, "undecided reservation must be out"
    # reads at the pins see the pre-txn state on BOTH tables
    assert VT.vt_read(spark, a, version=pins).count() == 100
    assert VT.vt_read(spark, b, version=pins).count() == 50
    # decide + finalize: the same call now pins both new versions
    assert TX._write_decision(txn.decision_path, "committed")
    for t in (a, b):
        TX._finish_committed(t, txn.txn_id)
    txn._done = True
    pins2 = txn_snapshot([a, b])
    assert pins2 == {a: reserved[a], b: reserved[b]}
    assert VT.vt_read(spark, a, version=pins2).count() == 110
    assert VT.vt_read(spark, b, version=pins2).count() == 60


def test_txn_snapshot_retries_past_mid_pass_decision(monkeypatch):
    """Deterministic seqlock check: a decision landing between the
    first pass's two table reads produces a TORN pin pair — the second
    pass must reject it and the stable pair must win."""
    from kinesis_app_spark.operators import txn as TX

    script = iter([1, 2,   # pass 1: A pre-decision, B post (torn!)
                   2, 2,   # pass 2: both post -> mismatch vs pass 1
                   2, 2])  # pass 3: equals pass 2 -> stable
    calls = []

    def fake_latest(table_dir):
        calls.append(table_dir)
        return next(script)

    monkeypatch.setattr(TX.VT, "vt_latest_version", fake_latest)
    pins = TX.txn_snapshot(["A", "B"], settle_sleep=0.0)
    assert pins == {"A": 2, "B": 2}
    assert len(calls) == 6, "the torn pass must cost exactly one retry"


def test_txn_snapshot_unstable_raises(monkeypatch):
    from kinesis_app_spark.operators import txn as TX

    n = iter(range(10_000))

    def always_moving(table_dir):
        return next(n)

    monkeypatch.setattr(TX.VT, "vt_latest_version", always_moving)
    with pytest.raises(TX.SnapshotUnstableError):
        TX.txn_snapshot(["A", "B"], spins=5, settle_sleep=0.0)


def test_txn_snapshot_race_is_all_or_nothing(spark, tmp_path):
    """Live race: a committing two-table transaction vs a snapshotting
    reader thread. EVERY snapshot must contain the sentinel on both
    tables or neither — the torn view two bare vt_reads can produce."""
    import threading

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import (
        txn_snapshot, vt_transaction,
    )

    a, b = _mk_ab(spark, tmp_path)
    coord = str(tmp_path / "coord")
    torn: list[tuple] = []
    stop = threading.Event()

    def snapshotter():
        while not stop.is_set():
            pins = txn_snapshot([a, b])
            has_a = pins[a] >= 1
            has_b = pins[b] >= 1
            if has_a != has_b:
                torn.append((pins[a], pins[b]))

    th = threading.Thread(target=snapshotter)
    th.start()
    try:
        with vt_transaction(spark, coord) as txn:
            txn.stage_append(a, spark.range(500, 505).select(
                F.col("id").alias("k"),
                (F.col("id") * 2 + 1).alias("v")))
            txn.stage_append(b, spark.range(500, 505).select(
                F.col("id").alias("k"),
                (F.col("id") * 3 + 1).alias("w")))
    finally:
        stop.set()
        th.join()
    assert not torn, f"torn snapshots observed: {torn[:3]}"
    assert txn_snapshot([a, b]) == {a: 1, b: 1}


def test_pin_map_readers_and_source_option(spark, tmp_path):
    """The pin map flows through every reader surface: vt_read,
    vt_scan, and the vt_table source's snapshot option; a map missing
    the table refuses rather than silently reading latest."""
    import json as _json

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.operators.txn import txn_snapshot

    a, b = _mk_ab(spark, tmp_path)
    pins = txn_snapshot([a, b])
    # advance A past the snapshot
    VT.vt_merge(spark, a, spark.range(5).select(
        F.col("id").alias("k"), F.lit(901).cast("long").alias("v"),
        F.lit("U").alias("op")), keys=["k"])
    assert VT.vt_read(spark, a, version=pins).filter(
        F.col("v") == 901).count() == 0
    assert VT.vt_scan(spark, a, [("v", "=", 901)],
                      version=pins).count() == 0
    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", a)
        .option("snapshot", _json.dumps(pins)).load()
    )
    assert src.filter(F.col("v") == 901).count() == 0
    assert src.count() == 100
    with pytest.raises(Exception, match="no entry"):
        VT.vt_read(spark, a, version={b: 0}).count()


# ---------------------------------------------------------------------
# vt_cdf composite-key component pruning (keyFilters on ANY merge key)
# ---------------------------------------------------------------------


def test_cdf_composite_key_component_pruning(spark, tmp_path):
    """A (tenant, id)-keyed change feed: components group by the FIRST
    key's range, but a filter on the SECOND key must also prune — each
    merge band's component carries per-key combined ranges and prunes
    when ANY filtered key's range provably misses (round-7 verdict
    item 3; previously only keys[0] pruned)."""
    import json as _json

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_cdf as CDF
    from kinesis_app_spark.sources.vt_cdf import VersionedCdfBatchReader

    table = str(tmp_path / "t")
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("tenant"),  # interleaved: every file
        F.col("id").alias("k"),             # spans all tenants
        (F.col("id") * 2 + 1).alias("v"),
    )
    VT.vt_create(df, table)
    VT.vt_optimize(spark, table, cluster_cols=["k"],
                   max_records_per_file=500)

    def band(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 4).alias("tenant"), F.col("id").alias("k"),
            (F.col("id") * 10 + 1).alias("v"), F.lit("U").alias("op"),
        )

    VT.vt_merge(spark, table, band(0, 50), keys=["tenant", "k"])
    VT.vt_merge(spark, table, band(3000, 3050), keys=["tenant", "k"])

    opts = {"path": table, "keys": "tenant,k", "startingversion": "2"}
    n_all = len(VersionedCdfBatchReader(opts).partitions())
    assert n_all >= 2
    # the SECOND key prunes (tenant ranges overlap on every component)
    r2 = VersionedCdfBatchReader({
        **opts, "keyfilters": _json.dumps([["k", ">=", 3000]]),
    })
    n2 = len(r2.partitions())
    assert 0 < n2 < n_all, f"second-key filter must prune: {n2}/{n_all}"
    # pruned == unfiltered-then-filtered (the done-criterion equality)
    CDF.register(spark)
    base = (
        spark.read.format("vt_cdf").option("path", table)
        .option("keys", "tenant,k").option("startingVersion", "2")
    )
    got = sorted(
        base.option("keyFilters", _json.dumps([["k", ">=", 3000]]))
        .load().filter(F.col("k") >= 3000).collect()
    )
    want = sorted(
        r for r in base.load().collect()
        if r["k"] is not None and r["k"] >= 3000
    )
    assert got == want and len(got) == 100  # 50 pre + 50 post images
    # an impossible second-key range prunes EVERY component
    r3 = VersionedCdfBatchReader({
        **opts, "keyfilters": _json.dumps([["k", "<", -1]]),
    })
    parts3 = r3.partitions()
    assert len(parts3) == 1 and parts3[0].before == [] \
        and parts3[0].after == []
