"""The vt_table sink DataSource (sources/vt_writer.py): streams and
batch jobs APPEND into versioned tables through Spark's own sink
protocol — staged-parquet two-phase commit, one ledgered APPEND per
epoch; keyed MERGE stays on foreachBatch (the Delta split)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators import versioned as VT
from kinesis_app_spark.sources import vt_writer as W

ROOT = "/tmp/kinesis_vt_writer_tests"


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    W.register(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    yield
    shutil.rmtree(ROOT, ignore_errors=True)


def test_batch_write_appends_with_manifest_fidelity(spark):
    d = os.path.join(ROOT, "batch")
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("double").alias("v")
    )
    df.write.format("vt_table").option("path", d).mode("append").save()
    assert VT.vt_latest_version(d) == 1  # create (v0 empty) + append
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, d).collect()}
    assert len(got) == 50 and got[4] == 1.0
    # sink-written files carry the SAME stats shape as Spark-written
    # ones: a later keyed merge prunes against them
    files = VT.vt_files(d, 1)
    assert files and all(
        f["stats"]["k"][0] is not None for f in files
    )
    chg = spark.createDataFrame([(4, -1.0, "U")],
                                "k long, v double, op string")
    VT.vt_merge(spark, d, chg, keys=["k"])
    delta = VT._commit_delta(d, 2)
    assert delta is not None and len(delta[1]) < len(files) or len(files) == 1
    got2 = {r["k"]: r["v"] for r in VT.vt_read(spark, d).collect()}
    assert got2[4] == -1.0 and len(got2) == 50
    # staging area drained; a vt_scan prunes via the pyarrow stats
    assert not os.listdir(os.path.join(d, "_stage"))
    assert VT.vt_scan(spark, d, [("k", "=", 10)]).count() == 1


def test_stream_write_is_epoch_idempotent(spark, tmp_path):
    """One epoch = one ledgered APPEND; a second availableNow run from
    the same checkpoint delivers only new source files, and epoch
    replay is a ledgered no-op."""
    src = str(tmp_path / "src")
    d = os.path.join(ROOT, "stream")
    ckpt = str(tmp_path / "ckpt")
    spark.range(20).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    ).coalesce(1).write.parquet(src)

    def run():
        q = (
            spark.readStream.schema("k long, v double").parquet(src)
            .writeStream.format("vt_table")
            .option("path", d)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert VT.vt_read(spark, d).count() == 20
    ids_after_first = VT.vt_committed_batch_ids(d)
    assert ids_after_first  # the epoch is in the ledger
    # replaying the same epoch id is a no-op (crash-after-append model)
    hist_before = VT.vt_latest_version(d)
    writer = W.VersionedTableStreamWriter(
        W._conn({"path": d}, VT.vt_read(spark, d).schema)
    )
    writer.commit([W.VtStageMsg(None, 0)], max(ids_after_first))
    assert VT.vt_latest_version(d) == hist_before
    # new source data -> the same checkpoint delivers ONLY the delta
    spark.range(5).select(
        (F.col("id") + 100).alias("k"), F.lit(2.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got = {r["k"]: r["v"] for r in VT.vt_read(spark, d).collect()}
    assert len(got) == 25 and got[104] == 2.0
    # the CDF source tails sink-written versions like any other
    from kinesis_app_spark.sources import vt_cdf as SRC
    SRC.register(spark)
    n = (
        spark.read.format("vt_cdf")
        .option("path", d).option("keys", "k").load()
        .filter(F.col("_change_type") == "insert").count()
    )
    assert n == 25


def test_overwrite_mode_rejected(spark):
    d = os.path.join(ROOT, "ow")
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(Exception, match="append"):
        df.write.format("vt_table").option("path", d) \
            .mode("overwrite").save()
