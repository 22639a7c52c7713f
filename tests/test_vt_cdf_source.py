"""The vt_cdf Python DataSource: the versioned-table change feed as a
real batch/stream source (sources/vt_cdf.py). Ground truth throughout is
``vt_changes`` — the source must deliver byte-equal change sets through
Spark's own offset machinery."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators import versioned as VT
from kinesis_app_spark.sources import vt_cdf as SRC

ROOT = "/tmp/kinesis_vt_cdf_tests"


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    SRC.register(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    yield
    shutil.rmtree(ROOT, ignore_errors=True)


def _mk_table(spark, name: str, n: int = 600, files: int = 4) -> str:
    """v0 CREATE (clustered, `files` files) / v1 pruned MERGE (update a
    narrow key band + insert beyond the range) / v2 MERGE-delete."""
    d = os.path.join(ROOT, name)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("val"),
        F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("tag"),
    )
    VT.vt_create(df.repartition(1), d)
    VT.vt_optimize(spark, d, cluster_cols=["k"],
                   max_records_per_file=n // files)
    upd = (
        spark.range(10).select(
            (F.col("id") + 20).alias("k"),
            F.lit(99.5).alias("val"),
            F.lit("upd").alias("tag"),
        )
        .union(
            spark.range(5).select(
                (F.col("id") + n).alias("k"),
                F.lit(-1.0).alias("val"),
                F.lit("new").alias("tag"),
            )
        )
        .withColumn("op", F.lit("U"))
    )
    VT.vt_merge(spark, d, upd, keys=["k"])
    dele = spark.range(3).select(
        (F.col("id") + 100).alias("k"),
        F.lit(0.0).alias("val"),
        F.lit("x").alias("tag"),
    ).withColumn("op", F.lit("D"))
    VT.vt_merge(spark, d, dele, keys=["k"])
    return d


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _oracle_changes(spark, d: str, v: int):
    if v == 0:
        snap = VT.vt_read(spark, d, 0)
        return snap.select(
            F.lit("insert").alias("_change_type"), "k", "val", "tag"
        )
    return VT.vt_changes(spark, d, v - 1, v, ["k"])


def test_batch_read_matches_vt_changes(spark):
    d = _mk_table(spark, "batch")
    latest = VT.vt_latest_version(d)
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k")
        .load()
    )
    assert got.columns == ["_commit_version", "_change_type", "k", "val",
                           "tag"]
    for v in range(latest + 1):
        g = got.filter(F.col("_commit_version") == v).drop("_commit_version")
        assert _canon(g) == _canon(_oracle_changes(spark, d, v)), f"v{v}"


def test_snapshot_is_one_partition_per_file(spark):
    d = _mk_table(spark, "parts")
    schema_json = __import__("json").dumps(
        SRC._cdf_schema(d).jsonValue()
    )
    slices = SRC._plan_version(d, 0, ["k"], schema_json)
    assert len(slices) == len(VT.vt_files(d, 0))
    assert all(s.kind == "snapshot" for s in slices)


def test_diff_partitions_are_key_range_components(spark):
    """The pruned merge touched a narrow key band of a clustered table:
    its diff slices must read a strict subset of the table's files, and
    the version must split into >1 independent component (the updated
    band and the appended tail don't overlap in key range)."""
    d = _mk_table(spark, "ranges")
    schema_json = __import__("json").dumps(
        SRC._cdf_schema(d).jsonValue()
    )
    slices = SRC._plan_version(d, 2, ["k"], schema_json)  # the pruned merge
    n_files_before = len(VT.vt_files(d, 1))
    touched = set()
    for s in slices:
        assert s.kind == "diff"
        touched.update(s.before)
        touched.update(s.after)
    assert len(touched) < n_files_before


def test_group_by_key_range_components():
    """Unit contract of the diff partitioner: overlapping ranges merge
    into one component (same-key rows always co-locate), disjoint ranges
    split into independent tasks, missing stats collapse to one."""
    fa = [{"path": "a1", "stats": {"k": [0, 99]}},
          {"path": "a2", "stats": {"k": [500, 599]}}]
    fb = [{"path": "b1", "stats": {"k": [50, 120]}},
          {"path": "b2", "stats": {"k": [560, 700]}}]
    groups = [
        ([f["path"] for f in ga], [f["path"] for f in gb])
        for ga, gb in SRC._group_by_key_range(fa, fb, "k")
    ]
    assert groups == [(["a1"], ["b1"]), (["a2"], ["b2"])]
    # one side spanning both ranges collapses them into one component
    fb_wide = [{"path": "bw", "stats": {"k": [10, 650]}}]
    assert len(SRC._group_by_key_range(fa, fb_wide, "k")) == 1
    # a file without stats is conservative: single component
    fa_nostats = fa + [{"path": "a3", "stats": {}}]
    assert len(SRC._group_by_key_range(fa_nostats, fb, "k")) == 1


def test_metadata_only_commit_yields_no_rows(spark):
    d = _mk_table(spark, "meta")
    VT.vt_index_bloom(spark, d, ["tag"])
    v = VT.vt_latest_version(d)
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k")
        .load()
        .filter(F.col("_commit_version") == v)
    )
    assert got.count() == 0


def test_compaction_version_diffs_to_nothing(spark):
    """Compaction is layout, never semantics: the compaction commit's
    exclusive files exist on both sides but every row is identical, so
    the CDF of that version is empty."""
    d = os.path.join(ROOT, "compact")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("val")
    )
    VT.vt_create(df.repartition(8), d)
    VT.vt_compact(spark, d, min_rows_per_file=1 << 20)
    v = VT.vt_latest_version(d)
    assert v == 1
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k")
        .load()
        .filter(F.col("_commit_version") == v)
    )
    assert got.count() == 0


def test_stream_availablenow_and_incremental_restart(spark, tmp_path):
    """AvailableNow drains the full history exactly once into a memory
    sink; new upstream commits after the first drain arrive on the next
    run from the SAME checkpoint with no redelivery — Spark's offset log
    is the ledger."""
    d = _mk_table(spark, "stream")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("vt_cdf")
            .option("path", d).option("keys", "k")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    got1 = drain()
    latest = VT.vt_latest_version(d)
    exp = 0
    for v in range(latest + 1):
        exp += _oracle_changes(spark, d, v).count()
    assert got1.count() == exp
    # per-version value equality through the stream
    for v in range(latest + 1):
        g = got1.filter(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        assert _canon(g) == _canon(_oracle_changes(spark, d, v))

    # a new upstream commit lands; the SAME checkpoint delivers ONLY it
    more = spark.range(4).select(
        (F.col("id") + 5000).alias("k"),
        F.lit(7.0).alias("val"),
        F.lit("late").alias("tag"),
    ).withColumn("op", F.lit("U"))
    VT.vt_merge(spark, d, more, keys=["k"])
    got2 = drain()
    assert got2.count() == exp + 4  # only the new version was appended
    assert got2.filter(
        F.col("_commit_version") == latest + 1
    ).count() == 4


def test_stream_max_versions_per_trigger(spark, tmp_path):
    """Rate limit: each availableNow run advances at most
    maxVersionsPerTrigger versions per micro-batch; the cap activates
    only after the planner learns a position (first batch uncapped —
    the kinesis_boto round-6 restart discipline)."""
    d = _mk_table(spark, "ratelimit")
    reader = SRC.VersionedCdfStreamReader(
        {"path": d, "keys": "k", "maxversionspertrigger": "1"}
    )
    first = reader.latestOffset()
    assert first == {"version": VT.vt_latest_version(d) + 1}  # uncapped once
    reader.partitions({"version": 0}, {"version": 1})
    assert reader.latestOffset() == {"version": 2}  # now capped
    reader.commit({"version": 2})
    assert reader.latestOffset() == {"version": 3}


def test_schema_evolution_null_pads_old_files(spark):
    d = os.path.join(ROOT, "evolve")
    df = spark.range(50).select(F.col("id").alias("k"),
                                F.lit(1.0).alias("val"))
    VT.vt_create(df, d)
    evolved = spark.range(5).select(
        (F.col("id") + 100).alias("k"), F.lit(2.0).alias("val"),
        F.lit("x").alias("extra"),
    ).withColumn("op", F.lit("U"))
    VT.vt_merge(spark, d, evolved, keys=["k"], merge_schema=True)
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k")
        .load()
    )
    assert "extra" in got.columns
    v0 = got.filter(F.col("_commit_version") == 0)
    assert v0.filter(F.col("extra").isNotNull()).count() == 0
    v1 = got.filter(F.col("_commit_version") == 1)
    assert _canon(v1.drop("_commit_version")) == _canon(
        VT.vt_changes(spark, d, 0, 1, ["k"])
    )


def test_starting_version_skips_history(spark):
    d = _mk_table(spark, "startv")
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k")
        .option("startingVersion", "2")
        .load()
    )
    assert got.select(F.min("_commit_version")).first()[0] == 2


def test_missing_options_raise(spark):
    d = _mk_table(spark, "opts")
    with pytest.raises(Exception, match="keys"):
        spark.read.format("vt_cdf").option("path", d).load().count()


def test_oversized_component_sub_splits(spark, monkeypatch):
    """A commit that rewrote many mutually-overlapping files would diff
    in ONE task; above _DIFF_SPLIT_ROWS the component is split into key
    sub-ranges (pushed into the parquet read), and the result is still
    byte-equal to vt_changes."""
    monkeypatch.setattr(SRC, "_DIFF_SPLIT_ROWS", 100)
    d = os.path.join(ROOT, "subsplit")
    df = spark.range(600).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("double").alias("v")
    )
    # HASH-partitioned v0: every file spans ~the full key range, so the
    # full-range update's before+after files form ONE wide component
    VT.vt_create(df.repartition(4), d)
    VT.vt_update(spark, d, [("k", ">=", 0)], {"v": "v + 1.0"})
    schema_json = __import__("json").dumps(SRC._cdf_schema(d).jsonValue())
    slices = SRC._plan_version(d, 1, ["k"], schema_json)
    assert len(slices) > 1
    assert all(s.key_bounds is not None for s in slices)
    # half-open sub-ranges tile the key space: first open below, last
    # open above, interiors contiguous
    bounds = sorted(
        (s.key_bounds for s in slices),
        key=lambda b: (b[0] is not None, b[0] if b[0] is not None else 0),
    )
    assert bounds[0][0] is None and bounds[-1][1] is None
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k").load()
        .filter(F.col("_commit_version") == 1)
    )
    assert _canon(got.drop("_commit_version")) == _canon(
        VT.vt_changes(spark, d, 0, 1, ["k"])
    )


def test_split_component_unit(monkeypatch):
    """Unit contract of the sub-splitter: oversized components cut at
    file range-start boundaries into half-open tiles that cover the key
    line; small components and non-numeric stats stay whole."""
    monkeypatch.setattr(SRC, "_DIFF_SPLIT_ROWS", 100)
    ga = [{"path": f"a{i}", "n_rows": 60,
           "stats": {"k": [i * 10, 1000]}} for i in range(4)]
    gb = [{"path": f"b{i}", "n_rows": 60,
           "stats": {"k": [i * 10 + 5, 1000]}} for i in range(4)]
    small_a = [{"path": "sa", "n_rows": 20, "stats": {"k": [0, 9]}}]
    small_b = [{"path": "sb", "n_rows": 20, "stats": {"k": [3, 12]}}]
    subs = SRC._split_component(ga, gb, "k")
    assert len(subs) > 1
    bounds = [kb for _a, _b, kb in subs]
    assert bounds[0][0] is None and bounds[-1][1] is None
    for (l1, h1), (l2, h2) in zip(bounds, bounds[1:]):
        assert h1 == l2  # contiguous half-open tiles
    # the unbounded-lo FIRST tile owns every file (null merge keys can
    # hide in any of them — round-7 fix); every LATER sub-slice keeps
    # only files whose range intersects its tile
    for sa, sb, (lo, hi) in subs:
        if lo is None:
            assert len(sa) == len(ga) and len(sb) == len(gb)
            continue
        for f in sa + sb:
            flo, fhi = f["stats"]["k"]
            assert (hi is None or flo < hi) and fhi >= lo
    # under the threshold: untouched
    small = SRC._split_component(small_a, small_b, "k")
    assert small == [(small_a, small_b, None)]
    # non-numeric stats (ISO dates): conservative, no split
    gs = [{"path": "x", "n_rows": 500,
           "stats": {"k": ["2024-01-01", "2024-12-31"]}}]
    assert SRC._split_component(gs, gs, "k")[0][2] is None


def test_split_component_tolerates_missing_stats(monkeypatch):
    """An un-statted file inside an oversized (conservative) component
    must not crash the splitter — it stays one whole slice."""
    monkeypatch.setattr(SRC, "_DIFF_SPLIT_ROWS", 10)
    ga = [{"path": "a", "n_rows": 50, "stats": {"k": [0, 9]}},
          {"path": "a2", "n_rows": 50, "stats": {}}]
    gb = [{"path": "b", "n_rows": 50, "stats": {"k": [5, 20]}}]
    assert SRC._split_component(ga, gb, "k") == [(ga, gb, None)]


def test_diff_against_vacuumed_parent_raises(spark, tmp_path):
    d = str(tmp_path / "vt")
    VT.vt_create(spark.createDataFrame([(0, "a")], "k long, v string"), d)
    for i in range(1, 4):
        VT.vt_merge(
            spark, d,
            spark.createDataFrame([(i, "x", "U")],
                                  "k long, v string, op string"),
            keys=["k"],
        )
    VT.vt_vacuum(d, retain_last=2)  # v0, v1 vacuumed (if files died)
    schema_json = __import__("json").dumps(SRC._cdf_schema(d).jsonValue())
    vacuumed = [
        v for v in range(4) if VT._read_manifest(d, v).get("vacuumed")
    ]
    for v in vacuumed:
        with pytest.raises(FileNotFoundError):
            SRC._plan_version(d, v + 1, ["k"], schema_json)


def test_cdf_source_reports_soft_deletes(spark):
    """A DELETE_DV commit keeps every data-file path — exclusivity by
    content signature must still surface the soft-deleted rows as CDF
    deletes, with each diff side masked by its OWN deletion-vector
    state."""
    d = os.path.join(ROOT, "dv")
    df = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("double").alias("v")
    )
    VT.vt_create(df.repartitionByRange(3, "k"), d)
    v = VT.vt_delete_dv(spark, d, [("k", "in", [7, 150])])
    assert v == 1
    got = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k").load()
        .filter(F.col("_commit_version") == 1)
    )
    assert _canon(got.drop("_commit_version")) == _canon(
        VT.vt_changes(spark, d, 0, 1, ["k"])
    )
    rows = got.collect()
    assert sorted((r["_change_type"], r["k"]) for r in rows) == [
        ("delete", 7), ("delete", 150)
    ]
    # a second stacked DV on the same file diffs v1 -> v2 correctly
    VT.vt_delete_dv(spark, d, [("k", "=", 8)])
    got2 = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k").load()
        .filter(F.col("_commit_version") == 2)
    ).collect()
    assert [(r["_change_type"], r["k"]) for r in got2] == [("delete", 8)]
