"""Round-4 operator tests: DIMSUM-sampled itemsim statistical quality
vs the exact entry, and Horvitz-Thompson exactness on unsampled items."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_dimsum_exact_on_light_items(spark, tmp_path):
    """When every item's degree is <= gamma, p=1 everywhere: every
    entry survives the Bernoulli gate, every Horvitz-Thompson weight is
    exactly 1e6, and DIMSUM must reproduce the exact entry bit-for-bit
    (n_est == n_common, cosine_est == cosine)."""
    from kinesis_app_spark.registry_round3 import itemsim_cosine_parts
    from kinesis_app_spark.registry_round4 import itemsim_dimsum_parts

    d = str(tmp_path)
    # one order per customer; baskets chosen so (100,101) co-occurs x3
    # and (100,102) x2 (>= support 2); all degrees <= 5 < gamma=16
    baskets = {
        1: [100, 101, 102],
        2: [100, 101],
        3: [100, 101, 103],
        4: [102, 103],
        5: [100, 102],
    }
    spark.createDataFrame(
        [(c, c) for c in baskets], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(c, i) for c, items in baskets.items() for i in items],
        "l_orderkey long, l_partkey long",
    ).write.parquet(f"{d}/lineitem.parquet")

    exact = {
        (r["item"], r["neighbor"]): (r["n_common"], r["cosine"])
        for r in itemsim_cosine_parts(spark, d).collect()
    }
    est = {
        (r["item"], r["neighbor"]): (r["n_est"], r["cosine_est"])
        for r in itemsim_dimsum_parts(spark, d).collect()
    }
    assert set(exact) == set(est)
    assert (100, 101) in exact
    for k, (nc, cos) in exact.items():
        n_est, cos_est = est[k]
        assert n_est == float(nc), k
        assert cos_est == cos, k


def test_dimsum_estimates_track_exact_counts(spark):
    """Across all pairs present in both top-k lists, the HT estimates
    must be unbiased enough to rank with: mean relative error bounded
    and correlation with the exact counts strongly positive."""
    from kinesis_app_spark.registry_round3 import itemsim_cosine_parts
    from kinesis_app_spark.registry_round4 import itemsim_dimsum_parts

    exact = {
        (r["item"], r["neighbor"]): r["n_common"]
        for r in itemsim_cosine_parts(spark, SF_DIR).collect()
    }
    est = {
        (r["item"], r["neighbor"]): r["n_est"]
        for r in itemsim_dimsum_parts(spark, SF_DIR).collect()
    }
    common = sorted(set(exact) & set(est))
    assert len(common) >= 50, f"only {len(common)} shared pairs"
    rel_errs = [abs(est[k] - exact[k]) / exact[k] for k in common]
    mean_rel = sum(rel_errs) / len(rel_errs)
    assert mean_rel < 0.8, f"mean relative error {mean_rel:.3f}"
    # Pearson r between est and exact over shared pairs
    xs = [float(exact[k]) for k in common]
    ys = [float(est[k]) for k in common]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    vy = math.sqrt(sum((y - my) ** 2 for y in ys))
    r = cov / (vx * vy) if vx > 0 and vy > 0 else 0.0
    assert r > 0.6, f"estimate/exact correlation too weak: {r:.3f}"
