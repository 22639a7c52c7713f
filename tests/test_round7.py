"""Round-7 features: manifest protocol/feature guards and column
mapping (rename/drop without rewriting data files)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators import versioned as VT


def _mk(spark, path, n=12):
    VT.vt_create(
        spark.range(n).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 10).cast("long").alias("v"),
            (F.col("id") % 3).cast("int").alias("grp"),
        ),
        path,
    )


def _edit_manifest(table, version, fn):
    p = VT._manifest_path(table, version)
    with open(p) as fh:
        m = json.load(fh)
    fn(m)
    with open(p, "w") as fh:
        json.dump(m, fh)


# ---------------------------------------------------------------------
# protocol / feature guards
# ---------------------------------------------------------------------


def test_unknown_required_feature_raises_everywhere(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, table)

    def poison(m):
        m["protocol"] = {
            "min_reader": 1, "min_writer": 1,
            "features": ["time_crystals"],
        }

    _edit_manifest(table, 0, poison)
    with pytest.raises(VT.ProtocolError, match="time_crystals"):
        VT.vt_read(spark, table)
    with pytest.raises(VT.ProtocolError, match="time_crystals"):
        VT.vt_scan(spark, table, [("k", "=", 1)])
    with pytest.raises(VT.ProtocolError, match="time_crystals"):
        VT.vt_changes(spark, table, 0, 0, keys=["k"])
    with pytest.raises(VT.ProtocolError, match="time_crystals"):
        VT.vt_merge(
            spark, table,
            spark.createDataFrame([(1, 1, 1, "U")],
                                  "k long, v long, grp int, op string"),
            keys=["k"],
        )
    with pytest.raises(VT.ProtocolError, match="time_crystals"):
        VT.vt_delete(spark, table, [("k", "=", 1)])
    from kinesis_app_spark.sources import vt_cdf as CDF

    CDF.register(spark)
    with pytest.raises(Exception, match="time_crystals"):
        (
            spark.read.format("vt_cdf")
            .option("path", table).option("keys", "k")
            .load().collect()
        )


def test_min_reader_version_guard(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, table)
    _edit_manifest(
        table, 0,
        lambda m: m.update(
            protocol={"min_reader": 99, "min_writer": 99, "features": []}
        ),
    )
    with pytest.raises(VT.ProtocolError, match="reader version 99"):
        VT.vt_read(spark, table)


def test_protocol_stamp_tracks_content_and_is_sticky(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, table)
    feats0 = VT._read_manifest(table, 0)["protocol"]["features"]
    assert "deletion_vectors" not in feats0
    VT.vt_delete_dv(spark, table, [("k", "=", 3)])
    v = VT.vt_latest_version(table)
    feats = VT._read_manifest(table, v)["protocol"]["features"]
    assert "deletion_vectors" in feats
    # sticky: a later plain merge still declares the feature
    VT.vt_merge(
        spark, table,
        spark.createDataFrame([(20, 200, 2, "U")],
                              "k long, v long, grp int, op string"),
        keys=["k"],
    )
    feats2 = VT._read_manifest(
        table, VT.vt_latest_version(table)
    )["protocol"]["features"]
    assert "deletion_vectors" in feats2


def test_unstamped_tables_read_unchanged(spark, tmp_path):
    """Pre-round-7 tables (no protocol key) pass the guard vacuously."""
    table = str(tmp_path / "t")
    _mk(spark, table)
    _edit_manifest(table, 0, lambda m: m.pop("protocol", None))
    assert VT.vt_read(spark, table).count() == 12
