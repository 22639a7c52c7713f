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
    r = VersionedTableBatchReader({
        "path": table, "filters": flt,
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    })
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


# ---------------------------------------------------------------------
# maintenance ops inside transactions (stage_compact/cluster/optimize)
# ---------------------------------------------------------------------


def _frag_table(spark, tmp_path, name, n=400, frags=8):
    """A deliberately fragmented table: `frags` small files."""
    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / name)
    df = spark.range(n).repartition(frags).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    )
    VT.vt_create(df, table)
    return table


def test_txn_merge_and_compact_commit_atomically(spark, tmp_path):
    """The nightly-job shape: merge table A and compact table B under
    ONE decision — both land, the compaction swept B's small files,
    and rows are unchanged on B."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import vt_transaction

    a = _frag_table(spark, tmp_path, "a")
    b = _frag_table(spark, tmp_path, "b")
    n_b_files = len(VT.vt_files(b, VT.vt_latest_version(b)))
    assert n_b_files >= 4
    chg = spark.range(5).select(
        F.col("id").alias("k"), F.lit(7001).cast("long").alias("v"),
        F.lit("U").alias("op"),
    )
    with vt_transaction(spark, str(tmp_path / "coord")) as txn:
        txn.stage_merge(a, chg, keys=["k"])
        txn.stage_compact(b, min_rows_per_file=1000)
        # mid-txn: neither table moved
        assert VT.vt_latest_version(a) == 0
        assert VT.vt_latest_version(b) == 0
    assert VT.vt_latest_version(a) == 1
    assert VT.vt_latest_version(b) == 1
    m = VT._read_manifest(b, 1)
    assert m["operation"] == "COMPACT" and m.get("txn")
    files_b = VT.vt_files(b, 1)
    assert len(files_b) < n_b_files, "compaction must shrink the tail"
    assert VT.vt_read(spark, b).count() == 400
    assert VT.vt_read(spark, a).filter(F.col("v") == 7001).count() == 5


def test_txn_maintenance_abort_leaves_both_untouched(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import vt_transaction

    a = _frag_table(spark, tmp_path, "a")
    b = _frag_table(spark, tmp_path, "b")
    import glob
    with pytest.raises(RuntimeError, match="boom"):
        with vt_transaction(spark, str(tmp_path / "coord")) as txn:
            txn.stage_cluster(a, ["k"])
            txn.stage_compact(b, min_rows_per_file=1000)
            raise RuntimeError("boom")
    assert VT.vt_latest_version(a) == 0
    assert VT.vt_latest_version(b) == 0
    assert sorted(
        r["k"] for r in VT.vt_read(spark, a).collect()
    ) == list(range(400))
    # staged rewrite artifacts were cleaned up
    assert all(
        VT._read_manifest(a, 0).get("data_dir", "x") in p
        or "v00001" not in p
        for p in glob.glob(os.path.join(a, "data", "*"))
    )


def test_txn_compact_conflicts_follow_co_commit_rules(spark, tmp_path):
    """r6 rules inside the transaction: a concurrent APPEND co-commits
    with a staged compaction (always-false added-file test), while a
    concurrent rewrite of a compacted file aborts it."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators.txn import vt_transaction

    # co-commit: append lands between staging and commit
    b = _frag_table(spark, tmp_path, "b")
    txn = vt_transaction(spark, str(tmp_path / "c1"))
    txn.stage_compact(b, min_rows_per_file=1000)
    with vt_transaction(spark, str(tmp_path / "c2")) as other:
        other.stage_append(b, spark.range(400, 420).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
    got = txn.commit()
    assert got[b] == 2, "compaction must rebase over the append"
    assert VT.vt_read(spark, b).count() == 420

    # abort: a merge rewrites one of the small files being compacted
    b2 = _frag_table(spark, tmp_path, "b2")
    txn2 = vt_transaction(spark, str(tmp_path / "c3"))
    txn2.stage_compact(b2, min_rows_per_file=1000)
    VT.vt_merge(spark, b2, spark.range(3).select(
        F.col("id").alias("k"), F.lit(9001).cast("long").alias("v"),
        F.lit("U").alias("op")), keys=["k"])
    with pytest.raises(TX.TxnAbortedError, match="removed file"):
        txn2.commit()
    assert VT.vt_read(spark, b2).filter(
        F.col("v") == 9001).count() == 3


def test_txn_optimize_aborts_on_any_concurrent_commit(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators import txn as TX
    from kinesis_app_spark.operators.txn import vt_transaction

    t = _frag_table(spark, tmp_path, "t")
    txn = vt_transaction(spark, str(tmp_path / "coord"))
    txn.stage_optimize(t, ["k"], max_records_per_file=100)
    # ANY concurrent data commit invalidates a full rewrite — even a
    # pure append the relaxed ops would co-commit with
    VT.vt_merge(spark, t, spark.range(500, 510).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v"),
        F.lit("I").alias("op")), keys=["k"])
    with pytest.raises(TX.TxnAbortedError):
        txn.commit()
    assert VT.vt_read(spark, t).count() == 410

    # clean run: optimize inside a txn lands clustered
    t2 = _frag_table(spark, tmp_path, "t2")
    with vt_transaction(spark, str(tmp_path / "coord2")) as txn2:
        txn2.stage_optimize(t2, ["k"], max_records_per_file=100)
    assert VT.vt_latest_version(t2) == 1
    m = VT._read_manifest(t2, 1)
    assert m["operation"] == "OPTIMIZE"
    files = VT.vt_files(t2, 1)
    assert all(f.get("clustered") == ["k"] for f in files)
    assert VT.vt_read(spark, t2).count() == 400


def test_txn_cluster_sweeps_debt_only(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import vt_transaction

    t = _frag_table(spark, tmp_path, "t")
    VT.vt_optimize(spark, t, ["k"], max_records_per_file=100)  # v1
    VT.vt_merge(spark, t, spark.range(400, 450).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v"),
        F.lit("I").alias("op")), keys=["k"])                   # v2: debt
    clustered_before = [
        f["path"] for f in VT.vt_files(t, 2) if f.get("clustered")
    ]
    with vt_transaction(spark, str(tmp_path / "coord")) as txn:
        v = txn.stage_cluster(t, ["k"])
    assert v == 3 and VT.vt_latest_version(t) == 3
    after = VT.vt_files(t, 3)
    assert all(f.get("clustered") == ["k"] for f in after)
    kept = [f["path"] for f in after if f["path"] in clustered_before]
    assert kept, "already-clustered files must carry by reference"
    assert VT.vt_read(spark, t).count() == 450
    # no debt -> nothing staged, table not in the transaction
    with vt_transaction(spark, str(tmp_path / "coord2")) as txn2:
        v2 = txn2.stage_cluster(t, ["k"])
    assert v2 == 3 and VT.vt_latest_version(t) == 3


# ---------------------------------------------------------------------
# type widening (metadata-only, Delta's typeWidening feature)
# ---------------------------------------------------------------------


def test_widen_column_is_metadata_only_and_mixes_widths(
    spark, tmp_path
):
    import glob

    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / "t")
    df = spark.range(100).coalesce(1).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2 + 1).cast("int").alias("v"),
    )
    VT.vt_create(df, table)
    files_before = sorted(glob.glob(os.path.join(table, "data", "*", "*")))
    v = VT.vt_widen_column(table, "v", "long")
    assert v == 1
    files_after = sorted(glob.glob(os.path.join(table, "data", "*", "*")))
    assert files_before == files_after, "widening must write NO data"
    # new schema is long; old version still reads as int
    assert dict(VT.vt_read(spark, table).dtypes)["v"] == "bigint"
    assert dict(VT.vt_read(spark, table, version=0).dtypes)["v"] == "int"
    # feature stamped sticky
    m = VT._read_manifest(table, 1)
    assert "type_widening" in m["protocol"]["features"]
    # merge POST-widen values that only fit the wide type; the table
    # then mixes int32 files and int64 files under one long schema
    big = spark.range(100, 105).select(
        F.col("id").cast("int").alias("k"),  # k stays int (un-widened)
        (F.lit(2**40) + F.col("id")).alias("v"),
        F.lit("I").alias("op"),
    )
    VT.vt_merge(spark, table, big, keys=["k"])
    got = VT.vt_read(spark, table)
    assert got.count() == 105
    assert got.filter(F.col("v") > 2**39).count() == 5
    assert got.filter(F.col("k") == 7).collect()[0]["v"] == 15
    # idempotent: widening to the current type is a no-op, no commit
    assert VT.vt_widen_column(table, "v", "bigint") == 2


def test_widen_column_refuses_narrowing_and_lossy(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(10).coalesce(1).select(
            F.col("id").alias("k"),          # long
            F.col("id").cast("int").alias("v"),
            F.col("id").cast("double").alias("x"),
        ), table,
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        VT.vt_widen_column(table, "k", "int")       # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        VT.vt_widen_column(table, "v", "double")    # lossy past 2^53
    with pytest.raises(ValueError, match="not a lossless widening"):
        VT.vt_widen_column(table, "x", "float")     # narrowing
    with pytest.raises(ValueError, match="no column"):
        VT.vt_widen_column(table, "nope", "long")


def test_widen_column_strips_stale_blooms_and_keeps_pruning(
    spark, tmp_path
):
    """xxhash64 is width-sensitive: int buckets and long buckets for
    the same value differ, so the widening commit must strip the
    column's blooms (re-indexable at the new width) — and min/max
    stats pruning must keep working on the widened column."""
    import json as _json

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.sources.vt_writer import (
        VersionedTableBatchReader,
    )

    table = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id").cast("int").alias("k"),
        ((F.col("id") * 2654435761) % 100003).cast("int").alias("sk"),
    )
    VT.vt_create(df, table)
    VT.vt_optimize(spark, table, cluster_cols=["k"],
                   max_records_per_file=500)
    VT.vt_index_bloom(spark, table, ["sk"])
    assert all(
        (f.get("bloom") or {}).get("sk")
        for f in VT.vt_files(table, VT.vt_latest_version(table))
    )
    VT.vt_widen_column(table, "sk", "long")
    files = VT.vt_files(table, VT.vt_latest_version(table))
    assert not any((f.get("bloom") or {}).get("sk") for f in files), (
        "stale narrow-width blooms must be stripped"
    )
    # the OTHER machinery keeps pruning: stats range on the widened
    # column (a long literal vs int-written stats)
    n_files = len(files)
    r = VersionedTableBatchReader({
        "path": table,
        "filters": _json.dumps([["k", ">=", 3500]]),
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    })
    assert 0 < len(r.partitions()) < n_files
    # re-index at the new width: bloom pruning returns, exact results
    VT.vt_index_bloom(spark, table, ["sk"])
    probe = df.filter(F.col("k") == 1234).collect()[0]["sk"]
    r2 = VersionedTableBatchReader({
        "path": table,
        "filters": _json.dumps([["sk", "=", int(probe)]]),
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    })
    assert len(r2.partitions()) < n_files, "rebuilt bloom must prune"
    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _json.dumps([["sk", "=", int(probe)]]))
        .load()
    )
    got = sorted(r["k"] for r in
                 src.filter(F.col("sk") == int(probe)).collect())
    want = sorted(r["k"] for r in
                  df.filter(F.col("sk") == int(probe)).collect())
    assert got == want and got


def test_widen_column_through_source_and_scan(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(50).coalesce(1).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("float").alias("x"),
        ), table,
    )
    VT.vt_widen_column(table, "x", "double")
    VT.vt_widen_column(table, "k", "long")
    W.register(spark)
    src = spark.read.format("vt_table").option("path", table).load()
    assert dict(src.dtypes) == {"k": "bigint", "x": "double"}
    assert src.count() == 50
    assert src.filter(F.col("k") == 7).collect()[0]["x"] == 7.0
    # time travel through the source shows the PRE-widen types
    old = (
        spark.read.format("vt_table").option("path", table)
        .option("versionAsOf", "0").load()
    )
    assert dict(old.dtypes) == {"k": "int", "x": "float"}
    # vt_scan prunes + returns exact rows at the widened type
    got = VT.vt_scan(spark, table, [("k", ">=", 40)]).count()
    assert got == 10


def test_apply_changes_honors_insert_op(spark):
    """op='I' rows must take the CHANGE side's values — they used to
    fall outside the U/D contract and silently took the (null)
    snapshot side for new keys: the one op code every CDC feed emits,
    inserting keys with null values."""
    from kinesis_app_spark.operators.cdc import apply_changes

    snap = spark.createDataFrame([(1, 10)], "k int, v long")
    chg = spark.createDataFrame(
        [(1, 99, "U"), (2, 2**40, "I"), (3, 30, "D")],
        "k int, v long, op string",
    )
    got = sorted(
        (r["k"], r["v"])
        for r in apply_changes(snap, chg, keys=["k"]).collect()
    )
    assert got == [(1, 99), (2, 2**40)]


# ---------------------------------------------------------------------
# aggregate surface: vt_fast_stats zero-read probe + SQL composition
# ---------------------------------------------------------------------


def test_fast_stats_opens_zero_data_files(spark, tmp_path):
    """The 100 TB count(*) proof by construction: with EVERY data file
    MOVED AWAY, vt_fast_stats still answers exactly (manifest only),
    while a real scan fails — so the metadata path provably never
    opens parquet. (Renames, not chmod: the suite runs as root, which
    reads through mode 000.)"""
    import glob

    from kinesis_app_spark.operators import versioned as VT

    table = str(tmp_path / "t")
    df = spark.range(500).coalesce(2).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    )
    VT.vt_create(df, table)
    data_files = glob.glob(os.path.join(table, "data", "*", "*.parquet"))
    assert data_files
    try:
        for p in data_files:
            os.rename(p, p + ".hidden")
        s = VT.vt_fast_stats(table, ["k", "v"])
        assert s["n_rows"] == 500
        assert s["cols"]["k"] == {"min": 0, "max": 499}
        assert s["cols"]["v"] == {"min": 1, "max": 999}
        with pytest.raises(Exception):
            VT.vt_read(spark, table).count()  # the scan DOES need them
    finally:
        for p in data_files:
            os.rename(p + ".hidden", p)
    # restored: the scan agrees with the metadata answer
    assert VT.vt_read(spark, table).count() == 500


def test_fast_stats_df_and_snapshot_pins(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import txn_snapshot

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(100).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
        ), table,
    )
    pins = txn_snapshot([table])
    VT.vt_merge(spark, table, spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v"),
        F.lit("U").alias("op")), keys=["k"])
    # pin map: the metadata count answers AT the snapshot
    assert VT.vt_fast_stats(table, version=pins)["n_rows"] == 100
    assert VT.vt_fast_stats(table)["n_rows"] == 150
    row = VT.vt_fast_stats_df(spark, table, ["k"]).collect()[0]
    assert (row["n_rows"], row["min_k"], row["max_k"]) == (150, 0, 149)
    # DV fallback shows as nulls in the DataFrame form
    VT.vt_delete_dv(spark, table, [("k", "in", [0, 149])])
    row2 = VT.vt_fast_stats_df(spark, table, ["k"]).collect()[0]
    assert row2["n_rows"] == 148
    assert row2["min_k"] is None and row2["max_k"] is None


# ---------------------------------------------------------------------
# sink-side clustering (clusterBy option on the vt_table sink)
# ---------------------------------------------------------------------


def test_sink_clusterby_stamps_disjoint_runs(spark, tmp_path):
    """A clusterBy'd append whose stream is key-partitioned upstream
    lands as ONE stamped clustered run (disjoint per-file spans), so
    vt_cluster_incremental finds ZERO debt; an un-partitioned append
    stays honest debt."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    W.register(spark)
    table = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    )
    (
        df.repartitionByRange(4, "k").sortWithinPartitions("k")
        .write.format("vt_table").option("path", table)
        .option("clusterBy", "k").mode("append").save()
    )
    files = VT.vt_files(table, VT.vt_latest_version(table))
    assert len(files) == 4
    assert all(f.get("clustered") == ["k"] for f in files), (
        "disjoint sorted run must be stamped clustered"
    )
    spans = sorted(tuple(f["stats"]["k"]) for f in files)
    for (_, hi), (lo2, _) in zip(spans, spans[1:]):
        assert lo2 > hi, "per-file key spans must be disjoint"
    # zero debt: the maintenance pass has nothing to do (no commit)
    v_before = VT.vt_latest_version(table)
    assert VT.vt_cluster_incremental(spark, table, ["k"]) == v_before

    # un-partitioned second append: overlapping spans stay unstamped
    (
        df.repartition(4)
        .write.format("vt_table").option("path", table)
        .option("clusterBy", "k").mode("append").save()
    )
    latest = VT.vt_latest_version(table)
    debt = [
        f for f in VT.vt_files(table, latest)
        if f.get("clustered") != ["k"]
    ]
    assert debt, "overlapping run must stay honest clustering debt"
    # rows exact either way
    assert VT.vt_read(spark, table).count() == 8000
    got = sorted(
        r["v"] for r in
        VT.vt_read(spark, table).filter(F.col("k") == 1234).collect()
    )
    assert got == [2469, 2469]


def test_sink_clusterby_sorts_within_task_and_validates(spark, tmp_path):
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    W.register(spark)
    table = str(tmp_path / "t")
    # reversed input within one partition: the sink's task-side sort
    # must still produce a contiguous min/max span equal to the data
    df = (
        spark.range(100).coalesce(1)
        .select((99 - F.col("id")).alias("k"),
                (F.col("id") * 3 + 1).alias("v"))
    )
    (
        df.write.format("vt_table").option("path", table)
        .option("clusterBy", "k").mode("append").save()
    )
    files = VT.vt_files(table, VT.vt_latest_version(table))
    assert len(files) == 1 and files[0]["stats"]["k"] == [0, 99]
    assert files[0].get("clustered") == ["k"]
    # a clusterBy column missing from the stream refuses at plan time
    with pytest.raises(Exception, match="clusterBy"):
        (
            df.write.format("vt_table").option("path", table)
            .option("clusterBy", "nope").mode("append").save()
        )


def test_stream_sink_clusterby_epochs(spark, tmp_path):
    """Streaming epochs through the clusterBy sink: each epoch lands
    as its own stamped run; a point lookup then prunes to at most one
    file per run."""
    import json as _json

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.sources.vt_writer import (
        VersionedTableBatchReader,
    )

    W.register(spark)
    table = str(tmp_path / "t")
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        src_dir
    )
    q = (
        spark.readStream.schema("k long, v long").parquet(src_dir)
        .writeStream.format("vt_table")
        .option("path", table).option("clusterBy", "k")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = VT.vt_files(table, VT.vt_latest_version(table))
    assert files and all(f.get("clustered") == ["k"] for f in files)
    n_files = len(files)
    planned = len(VersionedTableBatchReader({
        "path": table, "filters": _json.dumps([["k", "=", 777]]),
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    }).partitions())
    assert planned <= max(1, -(-n_files // 4)), (
        f"point lookup must open ~one file per run: {planned}/{n_files}"
    )
    assert VT.vt_read(spark, table).count() == 2000


def test_cdf_stream_keyfilters_prune_per_batch(spark, tmp_path):
    """keyFilters on the STREAMING change feed (the multi-tenant tail):
    per micro-batch component pruning plans fewer slices (asserted on
    the stream reader directly) and the delivered rows equal the
    unfiltered stream filtered — offsets are version-based, so pruning
    never shifts a checkpoint."""
    import json as _json
    import uuid as _uuid

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_cdf as CDF
    from kinesis_app_spark.sources.vt_cdf import VersionedCdfStreamReader

    table = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")
    )
    VT.vt_create(df, table)
    VT.vt_optimize(spark, table, cluster_cols=["k"],
                   max_records_per_file=500)

    def band(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 10 + 1).alias("v"), F.lit("U").alias("op"),
        )

    VT.vt_merge(spark, table, band(0, 40), keys=["k"])       # v2
    VT.vt_merge(spark, table, band(3000, 3040), keys=["k"])  # v3

    # planning layer: the stream reader plans fewer slices for the
    # change versions under the key filter
    kf = _json.dumps([["k", ">=", 3000]])
    opts = {"path": table, "keys": "k", "startingversion": "2"}
    span = ({"version": 2}, {"version": 4})
    n_all = len(VersionedCdfStreamReader(opts).partitions(*span))
    n_pruned = len(
        VersionedCdfStreamReader({**opts, "keyfilters": kf})
        .partitions(*span)
    )
    assert 0 < n_pruned < n_all, f"stream pruning: {n_pruned}/{n_all}"

    # end-to-end: availableNow drain through a memory sink
    CDF.register(spark)

    def drain(extra_opts):
        name = f"cdfkf_{_uuid.uuid4().hex[:8]}"
        reader = (
            spark.readStream.format("vt_cdf").option("path", table)
            .option("keys", "k").option("startingVersion", "2")
        )
        for k_, v_ in extra_opts.items():
            reader = reader.option(k_, v_)
        q = (
            reader.load().writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", str(tmp_path / f"ck_{name}")
            )
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.table(name)

    got = sorted(
        drain({"keyFilters": kf}).filter(F.col("k") >= 3000).collect()
    )
    want = sorted(
        r for r in drain({}).collect()
        if r["k"] is not None and r["k"] >= 3000
    )
    assert got == want and len(got) == 80  # 40 pre + 40 post images


def test_spark_readinfo_cache_poisoning_canary(spark, tmp_path):
    """CANARY for the upstream Spark defect that forced option-based
    pruning: a minimal Python DataSource whose pushFilters specializes
    partitions. On this Spark, the filter-free query on the same
    DataFrame REUSES the specialized plan (PythonDataSourceV2 caches
    one readInfo per relation; the pushdown worker only runs for
    queries with translatable filters).

    WHEN THIS TEST FAILS with 'poisoning gone', upstream fixed the
    cache (readInfo keyed per scan): hook-based pushFilters pruning is
    sound again and the vt_table/vt_cdf readers may restore it — see
    sources/vt_writer.py's class docstring for the design that was
    removed."""
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition,
    )

    class CanaryReader(DataSourceReader):
        def __init__(self):
            self.specialized = False

        def pushFilters(self, filters):
            self.specialized = True  # the hook specialization
            yield from filters

        def partitions(self):
            return [InputPartition(1 if self.specialized else 0)]

        def read(self, part):
            yield (int(part.value),)

    class CanarySource(DataSource):
        @classmethod
        def name(cls):
            return "r8_readinfo_canary"

        def schema(self):
            return "v long"

        def reader(self, schema):
            return CanaryReader()

    old = spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false"
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(CanarySource)
        df = spark.read.format("r8_readinfo_canary").load()
        assert df.collect()[0]["v"] == 0, "fresh plan must be unflagged"
        df2 = spark.read.format("r8_readinfo_canary").load()
        assert df2.filter(F.col("v") >= 0).collect()[0]["v"] == 1, (
            "the filtered query must run the pushdown worker"
        )
        leaked = df2.select("v").collect()[0]["v"]
        assert leaked == 1, (
            "poisoning gone: this Spark no longer reuses a "
            "pushFilters-specialized readInfo for filter-free queries "
            "— hook-based pruning is sound again; consider restoring "
            "it in vt_writer/vt_cdf (see their docstrings)"
        )
    finally:
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", old
        )


def test_txn_snapshot_views_sql_surface(spark, tmp_path):
    """Snapshot-pinned temp views: plain SQL over several tables sees
    ONE consistent cut — a commit landing after the pin is invisible
    to the views until re-pinned."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.operators.txn import (
        txn_snapshot, txn_snapshot_views, vt_transaction,
    )

    a, b = _mk_ab(spark, tmp_path)
    pins = txn_snapshot([a, b])
    got = txn_snapshot_views(spark, pins, {"snap_a": a, "snap_b": b})
    assert got == {"snap_a": 0, "snap_b": 0}
    with vt_transaction(spark, str(tmp_path / "coord")) as txn:
        txn.stage_append(a, spark.range(100, 120).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("v")))
        txn.stage_append(b, spark.range(50, 70).select(
            F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("w")))
    row = spark.sql("""
        SELECT (SELECT COUNT(*) FROM snap_a) AS na,
               (SELECT COUNT(*) FROM snap_b) AS nb
    """).collect()[0]
    assert (row["na"], row["nb"]) == (100, 50), "views must stay pinned"
    pins2 = txn_snapshot([a, b])
    txn_snapshot_views(spark, pins2, {"snap_a": a, "snap_b": b})
    row2 = spark.sql("""
        SELECT (SELECT COUNT(*) FROM snap_a) AS na,
               (SELECT COUNT(*) FROM snap_b) AS nb
    """).collect()[0]
    assert (row2["na"], row2["nb"]) == (120, 70)


def test_cdf_tail_across_widening_boundary(spark, tmp_path):
    """A change-feed read spanning a WIDEN_COLUMN commit: pre-widen
    files are int32, post-widen files int64, and the feed presents the
    LATEST (long) schema for every version — the arrow kernels must
    upcast at the file boundary, the metadata-only widen commit itself
    must deliver no change rows, and values must survive exactly."""
    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_cdf as CDF

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(50).coalesce(1).select(
            F.col("id").alias("k"),
            (F.col("id") * 2 + 1).cast("int").alias("v"),
        ), table,
    )                                                          # v0
    VT.vt_widen_column(table, "v", "long")                     # v1
    big = spark.range(50, 55).select(
        F.col("id").alias("k"),
        (F.lit(2**40) + F.col("id")).alias("v"),
        F.lit("I").alias("op"),
    )
    VT.vt_merge(spark, table, big, keys=["k"])                 # v2
    CDF.register(spark)
    feed = (
        spark.read.format("vt_cdf").option("path", table)
        .option("keys", "k").load()
    )
    assert dict(feed.dtypes)["v"] == "bigint"
    rows = feed.collect()
    # v0 snapshot-as-inserts (50) + widen delivers nothing + 5 inserts
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r["_commit_version"], []).append(r)
    assert len(by_ver.get(0, [])) == 50
    assert 1 not in by_ver, "metadata-only widen must deliver nothing"
    v2 = by_ver[2]
    assert sorted(r["v"] for r in v2) == [2**40 + k for k in
                                          range(50, 55)]
    assert {r["_change_type"] for r in v2} == {"insert"}
    # pre-widen int values intact at the long type
    assert sorted(r["v"] for r in by_ver[0])[:3] == [1, 3, 5]


def test_stream_reader_mid_stream_schema_change_guard(spark, tmp_path):
    """A widen landing AFTER stream start must FAIL the stream loudly
    (silently casting the new int64 files down to the captured int
    schema would truncate in-range values without an error); replayed
    HISTORY under a newer schema stays fine (forward evolution), and a
    restart picks up the new schema and drains the same checkpoint."""
    import uuid as _uuid

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.sources.vt_writer import (
        VersionedTableStreamReader,
    )

    table = str(tmp_path / "t")
    VT.vt_create(
        spark.range(20).coalesce(1).select(
            F.col("id").alias("k"),
            (F.col("id") * 2 + 1).cast("int").alias("v"),
        ), table,
    )                                                          # v0
    # reader captures the INT schema at v0
    r = VersionedTableStreamReader({"path": table})
    VT.vt_widen_column(table, "v", "long")                     # v1
    VT.vt_merge(spark, table, spark.range(20, 25).select(
        F.col("id").alias("k"),
        (F.lit(2**40) + F.col("id")).alias("v"),
        F.lit("I").alias("op")), keys=["k"])                   # v2
    # the widen commit itself is non-data: planning v1 alone is fine
    assert r._plan_version(1) == []
    with pytest.raises(ValueError, match="restart the query"):
        r._plan_version(2)

    # a FRESH reader (the restarted query) replays history under the
    # NEW schema — forward evolution, no raise, values exact
    W.register(spark)
    name = f"wg_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("vt_table").option("path", table)
        .load().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table(name)
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.count() == 25
    assert got.filter(F.col("v") > 2**39).count() == 5
