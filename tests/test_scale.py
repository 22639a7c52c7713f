"""Scale-hardening assertions: plan shapes and sketch accuracy.

These test the *mechanisms* the 100 TB design relies on, at test scale:
bucketed joins plan without exchanges, salting is semantically invisible,
sketches land within their error bounds, TakeOrderedAndProject replaces
global sorts.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators.scale import salted_aggregate, write_bucketed
from kinesis_app_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero shuffles."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        write_bucketed(o, "b_orders", ["o_custkey"], num_buckets=8)
        write_bucketed(c, "b_customer", ["c_custkey"], num_buckets=8)
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # sanity: same row count as the plain join
        assert joined.count() == (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_aggregate_matches_plain(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    salted = salted_aggregate(
        l,
        keys=["l_returnflag"],
        measures={
            "qty_sum": ("sum", F.col("l_quantity")),
            "n": ("count", F.lit(1)),
            "qty_avg": ("avg", F.col("l_quantity")),
            "qty_max": ("max", F.col("l_quantity")),
        },
    )
    plain = l.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
        F.avg("l_quantity").alias("qty_avg"),
        F.max("l_quantity").alias("qty_max"),
    )
    s = {r["l_returnflag"]: r for r in salted.collect()}
    p = {r["l_returnflag"]: r for r in plain.collect()}
    assert s.keys() == p.keys()
    for k in p:
        assert s[k]["n"] == p[k]["n"]
        assert s[k]["qty_max"] == p[k]["qty_max"]
        assert s[k]["qty_sum"] == pytest.approx(p[k]["qty_sum"], rel=1e-9)
        assert s[k]["qty_avg"] == pytest.approx(p[k]["qty_avg"], rel=1e-9)


def test_salted_join_matches_plain_join(spark):
    """The salted join must return exactly the plain join's multiset."""
    from kinesis_app_spark.operators.scale import salted_join

    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lk = l.withColumnRenamed("l_orderkey", "k")
    ok = o.withColumnRenamed("o_orderkey", "k")
    plain = sorted(
        (r["k"], r["l_quantity"], r["o_totalprice"])
        for r in lk.join(ok, "k").collect()
    )
    salted = sorted(
        (r["k"], r["l_quantity"], r["o_totalprice"])
        for r in salted_join(lk, ok, ["k"], salt_buckets=8).collect()
    )
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(
            l, ["l_returnflag"], {"m": ("median", F.col("l_quantity"))}
        )


def test_sketches_within_error_bounds(spark):
    e = load_table(spark, SF_DIR, "events")
    got = e.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.percentile_approx("value", 0.5, 10000).alias("p50a"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    assert abs(got["approx"] - got["exact"]) <= max(3, 0.05 * got["exact"])
    assert got["p50a"] == pytest.approx(got["p50"], rel=0.02)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join handling is the engine's first line of defense for
    hot keys (salting is the manual fallback): with one key carrying most
    rows, the adaptive plan must mark the sort-merge join skew-handled
    ('skew=true' in the final plan) and still produce exact results."""
    from pyspark.sql import functions as F

    conf_keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        # one hot key (0) with 50k rows, 99 cold keys with 50 each
        skewed = spark.range(0, 50_000).select(
            (F.when(F.col("id") < 45_000, 0).otherwise(F.col("id") % 99 + 1)).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = skewed.join(dim, "k")
        # collect() finalizes joined's own AdaptiveSparkPlan, so the skew
        # verdict is read from the plan that actually ran
        rows = joined.collect()
        total = sum(r["v"] + r["w"] for r in rows)
        exp = sum(v + 0 for v in range(45_000)) + sum(
            v + ((v % 99) + 1) * 10 for v in range(45_000, 50_000)
        )
        assert total == exp
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_global_topk_plans_take_ordered(spark):
    o = load_table(spark, SF_DIR, "orders")
    df = o.orderBy(F.col("o_totalprice").desc()).limit(100)
    assert "TakeOrderedAndProject" in _plan(df)


def test_text_chunking_is_shuffle_free(spark):
    """Chunking is embarrassingly parallel: posexplode over per-row lambdas,
    no Exchange anywhere above the (single-file test input's) repartition —
    at 100 TB the spread() repartition is a no-op and the whole op runs at
    scan speed."""
    from kinesis_app_spark.registry_funcs3 import text_chunking

    plan = _plan(text_chunking(spark, SF_DIR))
    # exactly the one spread() round-robin repartition of the narrow test
    # input (formatted output prints each node twice: tree + detail); no
    # hash exchange introduced by the operator itself
    assert plan.count("Exchange") <= 2, plan
    assert "RoundRobinPartitioning" in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_bm25_dimension_joins_broadcast(spark):
    """BM25's df/doclen/stats joins must all be broadcasts — the only hash
    exchange allowed is the (doc_id, term) tf aggregation."""
    from kinesis_app_spark.registry_funcs3 import bm25_topk

    plan = _plan(bm25_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in _plan(bm25_topk(spark, SF_DIR))


def test_bloom_semi_join_matches_plain_semi(spark):
    """bloom_semi_join is semantically a left_semi join: the Bloom filter
    has no false negatives and the residual broadcast semi removes false
    positives."""
    from kinesis_app_spark.operators.scale import bloom_semi_join

    l = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    keys = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    got = bloom_semi_join(l, keys, "l_orderkey").select("l_orderkey", "l_linenumber")
    want = l.join(keys, "l_orderkey", "left_semi").select("l_orderkey", "l_linenumber")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prefilter_prunes_most_rows(spark):
    """With a tiny key set, the Bloom pre-filter alone (before the residual
    semi join) must prune nearly everything — that reduction is the whole
    point at scale."""
    from kinesis_app_spark.operators.scale import (
        bloom_filter_build,
        bloom_might_contain,
    )

    l = load_table(spark, SF_DIR, "lineitem")
    keys = (
        load_table(spark, SF_DIR, "orders")
        .limit(10)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    bloom = bloom_filter_build(keys, "l_orderkey")
    pruned = (
        l.join(F.broadcast(bloom))
        .filter(
            bloom_might_contain(F.col("l_orderkey"), F.col("__bloom"), 1 << 16, 5)
        )
        .count()
    )
    total = l.count()
    true_matches = l.join(keys, "l_orderkey", "left_semi").count()
    assert pruned >= true_matches            # no false negatives
    assert pruned < total * 0.05, (pruned, total)  # real pruning


def test_bloom_semi_join_empty_dim(spark):
    """An empty key set yields an empty result (all bits unset -> every
    probe fails), not an error."""
    from kinesis_app_spark.operators.scale import bloom_semi_join

    l = load_table(spark, SF_DIR, "lineitem")
    keys = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.lit(False))
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    assert bloom_semi_join(l, keys, "l_orderkey").count() == 0


def test_bloom_semi_join_plan_shape(spark):
    """The fact side must not hash-shuffle: the bloom probe is a broadcast
    nested-loop against the one-row filter and the residual semi join is a
    broadcast hash join."""
    from kinesis_app_spark.registry_scale import bloom_semi_join_lineitem

    plan = _plan(bloom_semi_join_lineitem(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # only exchanges: broadcasts + the final tiny groupBy(l_returnflag)
    assert "hashpartitioning(l_returnflag" in plan or "hashpartitioning(l_returnflag".lower() in plan.lower(), plan


def _file_stats(path, col):
    """(min, max) of col per parquet file under path, from footer stats."""
    import glob
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_zorder_value_interleaves_bits(spark):
    from kinesis_app_spark.operators.scale import zorder_value

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), bits=3).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_layout_prunes_on_trailing_dim(spark, tmp_path):
    """A y-only slab predicate overlaps (by footer min/max) every file of
    an x-sorted layout but only a minority of the Z-ordered files — the
    whole point of the layout."""
    import random

    from kinesis_app_spark.operators.scale import zorder_write

    random.seed(7)
    rows = [(random.randrange(10_000), random.randrange(10_000)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, ["x", "y"])

    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(df, "x", "y", zpath, num_files=16)

    lo, hi = 4_000, 4_999  # 10% slab in y only
    lin_hit = sum(1 for mn, mx in _file_stats(linear, "y") if mn <= hi and mx >= lo)
    z_hit = sum(1 for mn, mx in _file_stats(zpath, "y") if mn <= hi and mx >= lo)
    assert lin_hit == 16, lin_hit          # linear layout: no pruning on y
    assert z_hit <= 8, z_hit               # z-order: most files pruned

    # content unchanged by the layout
    assert spark.read.parquet(zpath).count() == 40_000


def test_skew_report_plans_take_ordered(spark):
    import contextlib
    import io

    from kinesis_app_spark.registry_scale import skew_key_report_lineitem

    df = skew_key_report_lineitem(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_global_row_number_dense_and_no_global_sort(spark):
    from kinesis_app_spark.operators.scale import global_row_number

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    out = global_row_number(o, ["o_orderkey"], partitions=8)
    rows = out.orderBy("rid").collect()
    n = len(rows)
    # dense 1..N, and id order == key order
    assert [r["rid"] for r in rows] == list(range(1, n + 1))
    keys = [r["o_orderkey"] for r in rows]
    assert keys == sorted(keys)
    # the big-side window is clustered by _pid (hashpartitioning), never
    # SinglePartition; the range exchange itself is behind the pinned
    # localCheckpoint (see global_row_number docstring) so it does not
    # appear in this plan
    plan = _plan(out)
    assert "hashpartitioning(_pid" in plan
    assert "Window" in plan


def test_two_phase_group_topk_exact_vs_single_window(spark):
    from pyspark.sql import Window

    from kinesis_app_spark.operators.scale import two_phase_group_topk

    # skewed: group 'hot' has 5000 rows, others 10
    rows = [(("hot" if i < 5000 else f"g{i % 7}"), i * 37 % 9973, i)
            for i in range(5100)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = two_phase_group_topk(
        df, ["g"], "v", k=4, tiebreak_cols=["id"]
    ).select("g", "rk", "id")
    w = Window.partitionBy("g").orderBy(F.desc("v"), "id")
    want = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .select("g", "rk", "id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
