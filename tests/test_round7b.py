"""Round-7b (reworked round 8): filter pushdown for the vt_table batch
reader via the relation-scoped ``filters`` OPTION.

The option's conjunctive triples prune FILE entries through the same
per-file min/max stats test ``vt_scan`` uses, plus pyarrow row-level
filters on un-DV'd files. The scan output is a superset of the exact
predicate (compose with ``.filter(...)``), so pruning can never change
semantics — these tests pin (a) that pruning actually happens at the
planning layer, and (b) that results stay exactly ``vt_read + filter``
under column mapping, deletion vectors, and schema evolution. Round 8
moved pruning OFF the ``pushFilters`` hook: Spark's per-relation
readInfo cache let a hook-specialized plan silently drop rows from
later filter-free queries on the same DataFrame (pinned in
tests/test_round8.py).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from kinesis_app_spark.operators import versioned as VT
from kinesis_app_spark.sources import vt_writer as W
from kinesis_app_spark.sources.vt_writer import (
    VersionedTableBatchReader,
    _decode_filter_triples,
    _pa_safe_filters,
    _string_prefix_upper,
)


def _flt(*triples) -> str:
    return json.dumps([list(t) for t in triples])


def _mk_clustered(spark, path, n=4000, files=8):
    df = spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 97).cast("long").alias("grp"),
        # sparse secondary key: ~unique per row, spans every file's
        # [min,max] once clustered by k — min/max stats cannot prune
        # it, only a bloom can
        ((F.col("id") * 2654435761) % 100003).cast("long").alias("sk"),
        F.format_string("cat_%03d", (F.col("id") % 41)).alias("tag"),
        (F.col("id") * 1.5).alias("amt"),
    )
    VT.vt_create(df, path)
    VT.vt_optimize(
        spark, path, cluster_cols=["k"],
        max_records_per_file=max(1, n // files),
    )
    return df


# ---------------------------------------------------------------------
# the planning layer: the filters option -> fewer partitions
# ---------------------------------------------------------------------


def test_pushdown_prunes_file_partitions(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_clustered(spark, table)
    n_files = len(VT.vt_files(table, VT.vt_latest_version(table)))
    assert n_files >= 4, "need a multi-file table to prove pruning"

    r = VersionedTableBatchReader({
        "path": table,
        "filters": _flt(("k", ">=", 100), ("k", "<", 600)),
        # pre-packing planned counts: the pruning proof counts FILES
        # (round 9 derives a packing default when the option is absent)
        "slicetargetrows": "0",
    })
    parts = r.partitions()
    assert 0 < len(parts) < n_files, (
        f"range over a clustered key must prune: {len(parts)}/{n_files}"
    )

    # an unsatisfiable filter prunes everything -> the one empty slice
    r2 = VersionedTableBatchReader({
        "path": table, "filters": _flt(("k", "=", 10**9)),
    })
    parts2 = r2.partitions()
    assert len(parts2) == 1 and parts2[0].files == []


def test_pushdown_equality_and_in_and_prefix(spark, tmp_path):
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)
    W.register(spark)

    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(
            ("k", "in", [5, 500, 3999]),
            ("tag", "startswith", "cat_00"),
            ("amt", ">=", 7.0),
        ))
        .load()
    )
    cond = (
        F.col("k").isin(5, 500, 3999)
        & F.col("tag").startswith("cat_00")
        & (F.col("amt") >= 7.0)
    )
    got = sorted(src.filter(cond).collect())
    want = sorted(df.filter(cond).collect())
    assert got == want and got, "pushdown must not change results"


def test_pushdown_through_source_api_end_to_end(spark, tmp_path):
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)
    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(("k", ">=", 1200), ("k", "<", 1450)))
        .load()
    )
    cond = (F.col("k") >= 1200) & (F.col("k") < 1450) & (F.col("grp") != 3)
    assert sorted(src.filter(cond).collect()) == sorted(
        df.filter(cond).collect()
    )


# ---------------------------------------------------------------------
# interactions: column mapping, deletion vectors, schema evolution
# ---------------------------------------------------------------------


def test_pushdown_on_mapped_table_prunes_by_physical_stats(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)
    VT.vt_rename_column(table, "k", "key_id")
    n_files = len(VT.vt_files(table, VT.vt_latest_version(table)))

    r = VersionedTableBatchReader({
        "path": table, "filters": _flt(("key_id", ">=", 3500)),
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    })
    # pruning keys on PHYSICAL names: the renamed logical name must
    # still hit the stored per-file stats
    assert 0 < len(r.partitions()) < n_files

    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(("key_id", ">=", 3500))).load()
    )
    got = sorted(src.filter(F.col("key_id") >= 3500).collect())
    want = sorted(
        df.withColumnRenamed("k", "key_id")
        .filter(F.col("key_id") >= 3500).collect()
    )
    assert got == want


def test_pushdown_with_deletion_vectors_stays_exact(spark, tmp_path):
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)
    VT.vt_delete_dv(spark, table, [("grp", "in", [7, 11])])
    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(("k", "<", 900))).load()
    )
    cond = F.col("k") < 900
    got = sorted(src.filter(cond).collect())
    want = sorted(
        df.filter(~F.col("grp").isin(7, 11)).filter(cond).collect()
    )
    assert got == want and got


def test_pushdown_filter_on_evolved_column_skips_old_files(
    spark, tmp_path
):
    """A pushed filter on a column some files PREDATE: those files'
    rows are all null there, every pushed op is null-rejecting, so the
    executor skips the read outright — and results still equal the
    logical filter."""
    table = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    VT.vt_create(base, table)
    extra = spark.range(100, 160).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("new").alias("src"),
    ).withColumn("op", F.lit("U"))
    VT.vt_merge(spark, table, extra, keys=["k"], merge_schema=True)
    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(("src", "=", "new"))).load()
    )
    got = sorted(src.filter(F.col("src") == "new").collect())
    want = sorted(
        VT.vt_read(spark, table).filter(F.col("src") == "new").collect()
    )
    assert got == want and len(got) == 60


# ---------------------------------------------------------------------
# bloom pruning in the sessionless planner (pure-Python xxhash64 twin)
# ---------------------------------------------------------------------


def test_pushdown_bloom_prunes_secondary_key_lookup(spark, tmp_path):
    """A point lookup on a bloom-indexed SECONDARY key through the
    plain source API: min/max stats cannot prune it (every clustered
    file spans the sparse key's full range), the sidecar bitmaps —
    probed with the pure-Python xxhash64 twin in the sessionless
    planner worker — must."""
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)
    VT.vt_index_bloom(spark, table, ["sk"])
    n_files = len(VT.vt_files(table, VT.vt_latest_version(table)))
    assert n_files >= 4

    probe = df.filter(F.col("k") == 1234).select("sk").collect()[0][0]

    r = VersionedTableBatchReader({
        "path": table, "filters": _flt(("sk", "=", int(probe))),
        "slicetargetrows": "0",  # pre-packing counts (pruning proof)
    })
    stats_only = [
        f for f in r.files if VT._filter_may_match(f, r.pushed)
    ]
    assert len(stats_only) == n_files, (
        "the fixture must defeat min/max stats, else this test "
        "proves nothing"
    )
    planned = len(r.partitions())
    assert planned < n_files, (
        f"bloom probe must prune: {planned}/{n_files}"
    )

    W.register(spark)
    src = (
        spark.read.format("vt_table").option("path", table)
        .option("filters", _flt(("sk", "=", int(probe)))).load()
    )
    got = sorted(src.filter(F.col("sk") == int(probe)).collect())
    want = sorted(df.filter(F.col("sk") == int(probe)).collect())
    assert got == want and got


def test_xxh64_twin_matches_spark_bit_for_bit(spark):
    """The sessionless bloom probes stand on this equivalence: the
    pure-Python XXH64 must reproduce Spark's xxhash64 EXACTLY for
    every type the bloom index can carry — a silent mismatch would
    prune files that hold matching rows."""
    import datetime as dt

    from kinesis_app_spark.functions.xxh64 import spark_xxhash64

    cases = []
    for v in [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63),
              123456789012345]:
        cases.append((v, "long"))
    for v in [0, 1, -1, 2**31 - 1, -(2**31), 7919]:
        cases.append((v, "int"))
    cases += [(True, "boolean"), (False, "boolean")]
    strs = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi"]
    strs += ["x" * k for k in (15, 16, 17, 31, 32, 33, 40, 64, 100)]
    strs += ["héllo wörld ünïcode ✓" * 3, "日本語テキスト",
             "\x00\x7f\x80üÿ"]
    cases += [(s, "string") for s in strs]
    for v in [0.0, -0.0, 1.5, -3.25, float("inf"), float("-inf"),
              float("nan"), 1e300]:
        cases.append((v, "double"))
    for v in [0.0, -0.0, 1.5, -3.25]:
        cases.append((v, "float"))
    cases += [(dt.date(1970, 1, 1), "date"), (dt.date(2024, 6, 1), "date"),
              (dt.date(1901, 2, 3), "date")]
    # timestamps: AWARE values only — the twin hashes the instant's UTC
    # micros (what Spark's internal TimestampType long is), so any
    # offset must produce the identical hash. Naive values are frame-
    # ambiguous and the twin REFUSES them (asserted below), so they
    # cannot go through the JVM-equivalence loop.
    utc = dt.timezone.utc
    cases += [
        (dt.datetime(1970, 1, 1, tzinfo=utc), "timestamp"),
        (dt.datetime(2024, 6, 1, 12, 34, 56, 789012, tzinfo=utc),
         "timestamp"),
        (dt.datetime(2024, 6, 1, 12, 0,
                     tzinfo=dt.timezone(dt.timedelta(hours=5))),
         "timestamp"),
        (dt.datetime(2001, 2, 3, 4, 5, 6, 7,
                     tzinfo=dt.timezone(dt.timedelta(hours=-9,
                                                     minutes=-30))),
         "timestamp"),
        (dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=utc),
         "timestamp"),
    ]

    exprs = [
        F.xxhash64(F.lit(v).cast(t)).alias(f"c{i}")
        for i, (v, t) in enumerate(cases)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, (v, t) in enumerate(cases):
        assert spark_xxhash64(v, t) == row[f"c{i}"], (v, t)
    # uncovered types must return None (skip, never guess)
    assert spark_xxhash64(1, "decimal(10,2)") is None
    # frame-ambiguous timestamps REFUSE (never guess a timezone): a
    # naive 'timestamp' could be OS-local, session-tz, or UTC wall
    # clock depending on the caller — hashing any guess silently skips
    # files on the hosts where the guess is wrong (round-7 verdict).
    assert spark_xxhash64(dt.datetime(2024, 6, 1, 12, 0),
                          "timestamp") is None
    # ...and an aware value can't be an NTZ literal
    assert spark_xxhash64(
        dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone.utc),
        "timestamp_ntz") is None
    # NTZ naive wall clocks hash the frame-free wall-clock micros —
    # the JVM literal is built from a STRING so no host/session
    # timezone can touch the wall clock on either side
    ntz = dt.datetime(2024, 6, 1, 12, 34, 56, 789012)
    ntz_row = spark.range(1).select(
        F.xxhash64(
            F.to_timestamp_ntz(F.lit("2024-06-01 12:34:56.789012"))
        ).alias("h")
    ).collect()[0]
    assert spark_xxhash64(ntz, "timestamp_ntz") == ntz_row["h"]


def test_jvm_trunc_mod_matches_java_semantics():
    from kinesis_app_spark.sources.vt_writer import _jvm_trunc_mod

    assert _jvm_trunc_mod(7, 3) == 1
    assert _jvm_trunc_mod(-7, 3) == -1  # Java: sign of dividend
    assert _jvm_trunc_mod(-(2**63), 4096) == -(2**63) % -4096 or True
    # the exact JVM corner: -2^63 % 4096 in Java is -0 -> 0? compute:
    # -9223372036854775808 = 4096 * -2251799813685248 exactly -> 0
    assert _jvm_trunc_mod(-(2**63), 4096) == 0


def test_slice_target_rows_bin_packs_tasks(spark, tmp_path):
    """sliceTargetRows: a many-file table plans a bounded number of
    Python tasks (files bin-packed in sorted order), results equal the
    per-file plan."""
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table)  # 8 files x 500 rows
    W.register(spark)

    r = VersionedTableBatchReader(
        {"path": table, "slicetargetrows": "1200"}
    )
    parts = r.partitions()
    assert len(parts) == 4  # ceil(8 files / 2-per-1200-target)
    assert all(len(p.files) == 2 for p in parts)

    got = sorted(
        spark.read.format("vt_table").option("path", table)
        .option("sliceTargetRows", "1200").load().collect()
    )
    assert got == sorted(df.collect())

    # pushdown composes: pruning first, then packing
    r2 = VersionedTableBatchReader({
        "path": table, "slicetargetrows": "100000",
        "filters": _flt(("k", ">=", 100), ("k", "<", 600)),
    })
    assert len(r2.partitions()) == 1


# ---------------------------------------------------------------------
# vt_cdf batch reader: key-filter pushdown prunes diff components
# ---------------------------------------------------------------------


def test_cdf_pushdown_prunes_components_and_snapshot_files(
    spark, tmp_path
):
    from kinesis_app_spark.sources import vt_cdf as CDF
    from kinesis_app_spark.sources.vt_cdf import VersionedCdfBatchReader

    table = str(tmp_path / "t")
    _mk_clustered(spark, table)  # 8 files x 500 rows, clustered on k

    def band(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(-7).cast("long").alias("grp"),
            F.lit(0).cast("long").alias("sk"), F.lit("x").alias("tag"),
            F.lit(0.0).alias("amt"), F.lit("U").alias("op"),
        )

    # two merges on far-apart key bands -> one component per VERSION,
    # with disjoint key ranges (a single merge would rewrite both
    # bands into files spanning the whole domain = one component)
    VT.vt_merge(spark, table, band(0, 50), keys=["k"])
    VT.vt_merge(spark, table, band(3000, 3050), keys=["k"])

    opts = {"path": table, "keys": "k", "startingversion": "2"}
    n_all = len(VersionedCdfBatchReader(opts).partitions())
    assert n_all >= 2, "two key bands must form >= 2 diff components"
    r2 = VersionedCdfBatchReader(
        {**opts, "keyfilters": _flt(("k", ">=", 3000))}
    )
    assert 0 < len(r2.partitions()) < n_all, "component must prune"

    # v0 snapshot files prune individually
    n_snap = len(VersionedCdfBatchReader(
        {"path": table, "keys": "k", "endversion": "1"}
    ).partitions())
    r4 = VersionedCdfBatchReader(
        {"path": table, "keys": "k", "endversion": "1",
         "keyfilters": _flt(("k", "<", 400))}
    )
    assert 0 < len(r4.partitions()) < n_snap

    # non-merge-key filters refuse outright (they would break the
    # before/after pairing if they pruned)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="merge keys"):
        VersionedCdfBatchReader(
            {**opts, "keyfilters": _flt(("grp", "=", -7))}
        )

    # end-to-end: key-filtered results == unfiltered-then-filtered
    CDF.register(spark)
    base = (
        spark.read.format("vt_cdf").option("path", table)
        .option("keys", "k").load()
    )
    got = sorted(
        spark.read.format("vt_cdf").option("path", table)
        .option("keys", "k").option("keyFilters", _flt(("k", ">=", 3000)))
        .load().filter(F.col("k") >= 3000).collect()
    )
    want = sorted(
        [row for row in base.collect() if row["k"] is not None
         and row["k"] >= 3000]
    )
    assert got == want and got

    # non-key filters through .filter() prune nothing but stay exact:
    # only the POST side of the 100 updates carries the new grp value
    got2 = base.filter(F.col("grp") == -7).collect()
    assert len(got2) == 100
    assert all(r["_change_type"] == "update_postimage" for r in got2)


# ---------------------------------------------------------------------
# metadata-only aggregates
# ---------------------------------------------------------------------


def test_fast_stats_count_exact_through_dv(spark, tmp_path):
    table = str(tmp_path / "t")
    df = _mk_clustered(spark, table, n=1000, files=4)
    s0 = VT.vt_fast_stats(table, ["k", "amt"])
    assert s0["n_rows"] == 1000
    assert s0["cols"]["k"] == {"min": 0, "max": 999}
    assert s0["cols"]["amt"]["max"] == 999 * 1.5

    VT.vt_delete_dv(spark, table, [("grp", "in", [0, 1, 2])])
    deleted = df.filter(F.col("grp").isin(0, 1, 2)).count()
    s1 = VT.vt_fast_stats(table, ["k"])
    assert s1["n_rows"] == 1000 - deleted, "count must subtract DVs"
    assert s1["cols"]["k"] is None, (
        "min/max must refuse while a DV survives (the extreme row "
        "may be the deleted one)"
    )

    VT.vt_optimize(spark, table, cluster_cols=["k"])
    s2 = VT.vt_fast_stats(table, ["k"])
    assert s2["n_rows"] == 1000 - deleted
    assert s2["cols"]["k"] is not None, (
        "OPTIMIZE materialized every DV: min/max must be exact again"
    )
    # exactness vs a real scan (grp 0,1,2 deletes include k=0, so the
    # metadata min must have MOVED, not just echoed the old bound)
    lo, hi = (
        VT.vt_read(spark, table)
        .agg(F.min("k"), F.max("k")).collect()[0]
    )
    assert s2["cols"]["k"] == {"min": lo, "max": hi} and lo == 3


def test_fast_stats_mapping_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk_clustered(spark, table, n=500, files=2)
    v0 = VT.vt_latest_version(table)
    VT.vt_rename_column(table, "k", "key_id")
    s = VT.vt_fast_stats(table, ["key_id"])
    assert s["cols"]["key_id"] == {"min": 0, "max": 499}, (
        "mapped logical names must hit the physical stats"
    )
    old = VT.vt_fast_stats(table, ["k"], version=v0)
    assert old["cols"]["k"] == {"min": 0, "max": 499}
    assert old["n_rows"] == 500


# ---------------------------------------------------------------------
# the translation helpers
# ---------------------------------------------------------------------


def test_decode_filter_triples_translation():
    import datetime as dt

    raw = json.dumps([
        ["a", "=", 5],
        ["b", "in", [1, None, 3]],
        ["s", "startswith", "ab"],
        ["c", "=", None],          # null literal: no constraint
        ["t", ">=", {"ts": "2024-06-01T07:00:00+00:00"}],
        ["d", "<", {"d": "2024-06-01"}],
    ])
    triples = _decode_filter_triples(raw)
    assert ("a", "=", 5) in triples
    assert ("b", "in", [1, 3]) in triples
    assert ("s", ">=", "ab") in triples and ("s", "<", "ac") in triples
    assert all(not (t[0] == "c") for t in triples)
    assert ("t", ">=", dt.datetime(2024, 6, 1, 7, 0,
                                   tzinfo=dt.timezone.utc)) in triples
    assert ("d", "<", dt.date(2024, 6, 1)) in triples
    assert _decode_filter_triples(None) == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in"):
        _decode_filter_triples(json.dumps([["a", "!=", 1]]))


def test_string_prefix_upper_edges():
    assert _string_prefix_upper("ab") == "ac"
    assert _string_prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert _string_prefix_upper(chr(0x10FFFF)) is None


def test_pa_safe_filters_excludes_risky_literals():
    import datetime as dt

    triples = [
        ("a", "=", 5),
        ("b", "<", float("nan")),
        ("c", ">=", dt.datetime(2024, 1, 1)),
        ("d", "in", [1, 2]),
        ("e", "in", list(range(2000))),
        ("f", "=", "x"),
    ]
    safe = _pa_safe_filters(triples)
    cols = [t[0] for t in safe]
    assert cols == ["a", "d", "f"]
    assert all(
        not isinstance(v, float) or not math.isnan(v) for _, _, v in safe
    )
