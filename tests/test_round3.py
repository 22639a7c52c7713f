"""Round-3 fixes: rankstats skew recursion, WindowExec-free scale
variants of the two global-ntile queries (round-2 verdict tasks #2/#6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark import registry
from kinesis_app_spark.operators.rankstats import values_at_ranks

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# rankstats: exact values at ranks, distributed
# ---------------------------------------------------------------------

def test_values_at_ranks_matches_sorted(spark):
    vals = [float(v) for v in (5, 1, 9, 1, 7, 3, 3, 3, 8, 2, 0, 6)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = sorted(vals)
    got = values_at_ranks(df, "x", list(range(len(vals))))
    assert got == {i: want[i] for i in range(len(vals))}


def test_values_at_ranks_skew_recursion_bounds_probe(spark):
    """Pathological skew (verdict task #6): one value at 40% frequency.
    The bucket holding the heavy value must be re-histogrammed, never
    sorted — max_probe_rows stays within the recursion bound even though
    the heavy bucket holds 40% of all rows."""
    n = 20_000
    heavy = [1000.0] * (n * 2 // 5)
    rest = [float(i % 977) for i in range(n - len(heavy))]
    vals = heavy + rest
    df = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).repartition(8)
    want = sorted(vals)
    ranks = [0, n // 4, n // 2, (3 * n) // 4, n - 1]
    stats: dict = {}
    bound = 512  # far below the 8000-row heavy bucket
    got = values_at_ranks(df, "x", ranks, probe_bound=bound, stats=stats)
    assert got == {r: want[r] for r in ranks}
    assert stats["max_probe_rows"] <= bound, stats
    assert stats["histogram_passes"] > 1  # recursion actually happened


def test_values_at_ranks_all_equal_no_sort(spark):
    """Degenerate range (min == max) returns directly with no probe."""
    df = spark.createDataFrame([(42.0,)] * 1000, "x double")
    stats: dict = {}
    got = values_at_ranks(df, "x", [0, 500, 999], stats=stats)
    assert got == {0: 42.0, 500: 42.0, 999: 42.0}
    assert stats["max_probe_rows"] == 0
    assert stats["histogram_passes"] == 0


def test_values_at_ranks_rejects_bad_rank(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    with pytest.raises(ValueError, match="rank"):
        values_at_ranks(df, "x", [2])


def test_values_at_ranks_empty(spark):
    df = spark.createDataFrame([], "x double")
    assert values_at_ranks(df, "x", []) == {}


# ---------------------------------------------------------------------
# scale variants: no partition-less WindowExec anywhere in the plan
# ---------------------------------------------------------------------

@pytest.mark.parametrize(
    "name",
    [
        "equidepth_histogram_prices_scale",
        "rfm_segmentation_scale",
        "exact_quantiles_two_pass",
    ],
)
def test_scale_variant_plan_has_no_window(name, spark):
    df = registry.REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, f"{name} plan contains a window:\n{plan}"


def test_equidepth_scale_bucket_counts_are_equi_depth(spark):
    """Boundary bucketing still yields ~equi-depth buckets on the real
    data (ties merely share a bucket): every decile within 2% of n/10."""
    df = registry.REGISTRY["equidepth_histogram_prices_scale"].fn(
        spark, SF_DIR
    )
    rows = {r["decile"]: r["n_orders"] for r in df.collect()}
    n = sum(rows.values())
    assert set(rows) == set(range(1, 11))
    for d, c in rows.items():
        assert abs(c - n / 10) <= max(2, 0.02 * n), (d, c, n)


def test_rfm_scale_quartiles_are_balanced(spark):
    df = registry.REGISTRY["rfm_segmentation_scale"].fn(spark, SF_DIR)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(c) == q).cast("int")).alias(f"{c}{q}")
            for c in ("r", "f", "m")
            for q in (1, 4)
        ],
    ).collect()[0]
    n = agg["n"]
    for c in ("r", "f", "m"):
        # freq has heavy ties (small integer counts) so its quartiles can
        # be lopsided by design; recency/monetary are near-continuous
        if c == "f":
            continue
        for q in (1, 4):
            assert abs(agg[f"{c}{q}"] - n / 4) <= max(3, 0.05 * n), (
                c,
                q,
                agg[f"{c}{q}"],
                n,
            )
