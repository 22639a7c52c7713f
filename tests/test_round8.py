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
    """The full vt_table read path with a pushed timestamp equality,
    under ``spark.sql.session.timeZone=America/New_York``: pruning must
    plan fewer files AND the rows must equal the unpruned read — the
    exact deployment the round-7 wall-clock anchor silently corrupted."""
    from pyspark.sql.datasource import EqualTo

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W
    from kinesis_app_spark.sources.vt_writer import (
        VersionedTableBatchReader,
    )

    spark = ny_session
    table, base = _build_ts_table(spark, tmp_path)
    probe = base + dt.timedelta(minutes=1234)

    n_files = len(VT.vt_files(table, VT.vt_latest_version(table)))
    r = VersionedTableBatchReader({"path": table})
    list(r.pushFilters([EqualTo(("ts",), probe)]))
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
    src = spark.read.format("vt_table").option("path", table).load()
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

    W.register(spark)
    src = spark.read.format("vt_table").option("path", table).load()
    got = sorted(
        r["k"] for r in src.filter(F.col("ts").isin(*probes))
        .select("k").collect()
    )
    assert got == [7, 1234, 3999]
    lo = base + dt.timedelta(minutes=100)
    hi = base + dt.timedelta(minutes=110)
    got_rng = sorted(
        r["k"] for r in
        src.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .select("k").collect()
    )
    assert got_rng == list(range(100, 110))
