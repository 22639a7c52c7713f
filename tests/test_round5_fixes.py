"""Regression tests for the round-5 ADVICE.md fixes (kinesis_boto
planning lag + record placement, ivf_append guards + atomic manifest,
bench flaky semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _emb(spark, n=64, d=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.col("id") * (i + 1) % 17 + F.lit(0.5)).cast("float")
                for i in range(d)
            ]
        ).alias("embedding"),
    )


def test_ivf_append_on_empty_index_raises(spark, tmp_path):
    """Appending to an index built over an EMPTY corpus must raise (the
    delta would be silently lost: no centroids to assign to, yet the
    manifest count would claim the rows are indexed)."""
    from kinesis_app_spark.operators import vectorindex as VI

    idx = str(tmp_path / "idx")
    VI.ivf_build(_emb(spark).filter(F.lit(False)), idx, n_centroids=4)
    with pytest.raises(ValueError, match="no centroids"):
        VI.ivf_append(_emb(spark, n=8), idx)
    # the manifest must still say 0 rows (the failed append changed nothing)
    assert int(VI._read_manifest(spark, idx)["n_rows"]) == 0


def test_ivf_manifest_is_atomic_file_and_counts_assigned(spark, tmp_path):
    """The IVF manifest is a plain JSON file updated via temp+rename
    (crash mid-update leaves the old manifest), and ivf_append bumps
    n_rows by the rows actually appended."""
    from kinesis_app_spark.operators import vectorindex as VI

    idx = str(tmp_path / "idx")
    VI.ivf_build(_emb(spark, n=32), idx, n_centroids=4)
    mpath = os.path.join(idx, "manifest.json")
    assert os.path.isfile(mpath)
    assert not os.path.exists(mpath + ".tmp")
    assert int(VI._read_manifest(spark, idx)["n_rows"]) == 32
    delta = _emb(spark, n=48).filter(F.col("vec_id") >= 32)
    VI.ivf_append(delta, idx)
    assert int(VI._read_manifest(spark, idx)["n_rows"]) == 48
    assert os.path.isfile(mpath)
    assert not os.path.exists(mpath + ".tmp")


def test_partitioned_planning_lag_defaults_nonzero():
    """planningLagSeconds defaults to a few seconds: with 0, clock skew
    or an in-flight put can stamp a record at-or-before an
    already-planned bound after the read drained to tip — the next
    batch then skips it forever."""
    from kinesis_app_spark.sources.kinesis_boto import _conn_opts

    conn = _conn_opts({"streamname": "s"})
    assert conn["planning_lag_s"] >= 1.0
    conn0 = _conn_opts({"streamname": "s", "planninglagseconds": "0"})
    assert conn0["planning_lag_s"] == 0.0


def test_partitioned_latest_initial_offset_is_unlagged():
    """LATEST's initial bound must NOT reach back into history by the
    planning lag (it would re-read lag-seconds of old records), and
    latestOffset must never emit end < a previously-emitted bound."""
    import time as _time

    from kinesis_app_spark.sources.kinesis_boto import (
        KinesisPartitionedStreamReader,
        _conn_opts,
    )

    rdr = KinesisPartitionedStreamReader(
        _conn_opts(
            {
                "streamname": "s",
                "startingposition": "LATEST",
                "planninglagseconds": "5",
            }
        )
    )
    t0 = int(_time.time() * 1_000_000)
    init = rdr.initialOffset()["ts_us"]
    assert init >= t0 - 1_000_000  # unlagged (within a second of now)
    nxt = rdr.latestOffset()["ts_us"]
    assert nxt >= init  # lagged "now" clamped to the emitted bound
