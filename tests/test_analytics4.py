"""Unit tests for the registry_analytics4 kernels: the Morton interleave
matches a bit-twiddling Python reference, the Misra-Gries sketch keeps
every frequent key (recall guarantee), and the z-order layout actually
beats the linear layout on both dimensions' spans."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kinesis_app_spark.registry_analytics4 import (
    _MG_CAPACITY,
    _misra_gries_partition,
    _morton,
    heavy_hitters_tokens,
    zorder_layout_audit,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(10):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (1023, 1023), (513, 257), (70, 900)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", _morton(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _py_morton(x, y), (x, y)


def test_misra_gries_keeps_frequent_keys():
    # 300 distinct rare tokens (beyond capacity) + one token at 40% share:
    # the frequent token MUST survive; the summary must stay <= capacity.
    rare = [f"tok{i}" for i in range(300)]
    stream = []
    for i, t in enumerate(rare):
        stream.append(t)
        if i % 2 == 0:
            stream.append("hot")
        if i % 3 == 0:
            stream.append("hot")
    text = " ".join(stream)
    out = list(_misra_gries_partition([pd.DataFrame({"text": [text]})]))
    assert len(out) == 1
    survivors = set(out[0]["token"])
    assert "hot" in survivors
    assert len(survivors) <= _MG_CAPACITY


def test_zorder_beats_linear_on_both_spans(spark):
    rows = {r.layout: r for r in zorder_layout_audit(spark, SF_DIR).collect()}
    z, lin = rows["zorder"], rows["linear"]
    # z-order buckets must be tighter than insertion-order buckets on the
    # partkey dimension and no worse on the suppkey dimension — that is
    # the entire point of the layout.
    assert z.avg_x_span < lin.avg_x_span
    assert z.avg_y_span <= lin.avg_y_span


def test_heavy_hitters_exactness_vs_full_groupby(spark):
    # the sketch path must equal the brute-force full GROUP BY at the
    # same 1% threshold (recall guarantee + exact recount).
    got = {
        (r.token, r.n_occurrences)
        for r in heavy_hitters_tokens(spark, SF_DIR).collect()
    }
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    total = toks.count()
    exact = {
        (r.token, r.n)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r.n * 100 > total
    }
    assert got == exact


# ---------------------------------------------------------------------
# property tests (pure Python — no Spark roundtrip needed)
# ---------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# vocabulary larger than _MG_CAPACITY so evictions genuinely occur
_tok = st.sampled_from([f"w{i}" for i in range(300)] + ["hot1", "hot2"])


@settings(max_examples=50, deadline=None)
@given(st.lists(_tok, min_size=0, max_size=600))
def test_misra_gries_survival_property(stream):
    """Any token with frequency > n/(capacity+1) must survive the sketch
    (the decrement argument) — on arbitrary streams, not just fixtures."""
    text = " ".join(stream)
    out = list(_misra_gries_partition([pd.DataFrame({"text": [text]})]))
    survivors = set(out[0]["token"]) if out else set()
    counts = Counter(stream)
    n = len(stream)
    for tok, cnt in counts.items():
        if cnt * (_MG_CAPACITY + 1) > n:
            assert tok in survivors, (tok, cnt, n)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
)
def test_morton_python_reference_bijective_prefix(x, y):
    """The Python reference interleave is consistent: equal high bits of
    x and y imply equal z-prefix (the property bucketing relies on), and
    the interleave round-trips exactly."""
    z = _py_morton(x, y)
    # de-interleave round-trip
    rx = sum(((z >> (2 * i + 1)) & 1) << i for i in range(10))
    ry = sum(((z >> (2 * i)) & 1) << i for i in range(10))
    assert (rx, ry) == (x, y)
    # bucket (z >> 12) is exactly (x >> 6, y >> 6) interleaved
    bucket = z >> 12
    expected = sum((((x >> 6) >> i & 1) << (2 * i + 1))
                   + (((y >> 6) >> i & 1) << (2 * i)) for i in range(4))
    assert bucket == expected


def test_zorder_write_prunes_row_groups(spark, tmp_path):
    """END-TO-END data-skipping proof: write lineitem once z-ordered on
    (partkey, suppkey) scrambles and once in insertion order, then count
    the row groups whose parquet footer min/max stats admit a point
    predicate on BOTH columns — the exact stats any reader prunes on.
    The z-ordered layout must let the reader skip most row groups; the
    insertion-order layout admits (nearly) all of them."""
    import glob

    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    K = 2654435761
    x = (F.col("l_partkey").cast("long") * K) % 1024
    y = (F.col("l_suppkey").cast("long") * K) % 1024
    z = _morton(x, y)
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    (
        li.withColumn("z", z)
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    (
        li.repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    # the point looked up: any (partkey, suppkey) present in the data
    pk, sk = li.select("l_partkey", "l_suppkey").first()

    def admitting_row_groups(d):
        admit = total = 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                total += 1
                g = md.row_group(rg)
                sp = g.column(idx["l_partkey"]).statistics
                ss = g.column(idx["l_suppkey"]).statistics
                if (sp.min <= pk <= sp.max) and (ss.min <= sk <= ss.max):
                    admit += 1
        return admit, total

    z_admit, z_total = admitting_row_groups(zdir)
    l_admit, l_total = admitting_row_groups(ldir)
    assert z_total >= 8 and l_total >= 8
    # insertion order: the point hides in (almost) every row group;
    # z-order: only the row groups covering its z-neighborhood admit it.
    assert z_admit * 2 <= l_admit, (z_admit, z_total, l_admit, l_total)


def test_new_entry_plan_shapes(spark):
    """Docstring shuffle claims, pinned: the interval merge runs ONE hash
    Exchange (three stacked windows + two groupBys all reuse the user_id
    partitioning); the spatial join plans zero nested-loop joins; the
    pattern match folds sequences in one user shuffle plus the tiny
    histogram aggregate."""
    from kinesis_app_spark import registry
    from kinesis_app_spark.plans.lint import plan_summary

    s = plan_summary(
        registry.REGISTRY["merge_intervals_events"].fn(spark, SF_DIR)
    )
    assert s.exchanges_hash == 1 and s.nested_loop_joins == 0

    s = plan_summary(
        registry.REGISTRY["geo_grid_radius_join"].fn(spark, SF_DIR)
    )
    assert s.nested_loop_joins == 0 and s.cartesian_products == 0

    s = plan_summary(
        registry.REGISTRY["event_pattern_match"].fn(spark, SF_DIR)
    )
    assert s.exchanges_hash == 2 and s.nested_loop_joins == 0


def test_hilbert_tighter_than_morton(spark):
    """The Hilbert curve's no-jump property, measured: at non-power-of-4
    bucket granularity its per-bucket spans are tighter than Morton's on
    both dimensions (at power-of-4 splits both tile identically — the
    entry buckets into 100 ranges precisely to avoid that vacuous
    case)."""
    from kinesis_app_spark.registry_layout import hilbert_layout_audit

    rows = {
        r.layout: r for r in hilbert_layout_audit(spark, SF_DIR).collect()
    }
    h, m = rows["hilbert"], rows["morton"]
    # combined span = the pruning cost a reader pays across both dims;
    # per-dim values can tie on sparse fixtures, the sum must not.
    assert h.avg_x_span + h.avg_y_span < m.avg_x_span + m.avg_y_span
    assert h.max_x_span <= m.max_x_span
    assert h.max_y_span <= m.max_y_span


def test_hilbert_tiers_agree(spark):
    """The three Hilbert implementations — Column runtime fold, Arrow
    numpy bulk kernel, and the bit-twiddling Python reference — must be
    element-identical (the fold feeds the oracle parity, the kernel
    feeds production writes)."""
    import numpy as np

    from kinesis_app_spark.registry_layout import (
        _hilbert_d,
        hilbert_d_numpy,
        hilbert_index_arrow,
    )

    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1024, 500)
    ys = rng.randint(0, 1024, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    )
    fold = {
        (r.x, r.y): r.d
        for r in df.select(
            "x", "y", _hilbert_d(F.col("x"), F.col("y")).alias("d")
        ).collect()
    }
    arrow = {
        (r.x, r.y): r.hilbert_d
        for r in hilbert_index_arrow(df, "x", "y").collect()
    }
    ref = hilbert_d_numpy(xs, ys)
    for (a, b), d in zip(zip(xs, ys), ref):
        assert fold[(int(a), int(b))] == int(d)
        assert arrow[(int(a), int(b))] == int(d)


def test_session_window_boundary_tie_merges(spark):
    """Events exactly gap apart MERGE into one session (verified Spark
    semantics; the session oracles use strict > on the gap for this
    reason — a >= rule is latently wrong even when tie-free data hides
    it)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 30, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sessions = df.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).count()
    assert sessions.count() == 1
    from kinesis_app_spark.operators.sessionize import sessionize

    s = sessionize(df.withColumn("event_id", F.lit(1)), gap_minutes=30.0)
    assert s.select("session_idx").distinct().count() == 1
