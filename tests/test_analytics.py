"""Plan-shape + hardening tests for the analytics extensions
(co-occurrence, linkage, anomaly detection, bigram LM)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kinesis_app_spark.operators.baskets import basket_pairs
from kinesis_app_spark.operators.curation import bigram_logprob_scores
from kinesis_app_spark.operators.linkage import blocked_levenshtein_link

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_basket_pairs_small_fixture(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (2, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in basket_pairs(df, "basket", "item").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_basket_pairs_cap_drops_hot_basket(spark):
    """A basket above max_basket_size contributes NO pairs (dropped whole,
    not truncated); other baskets are unaffected."""
    rows = [(1, f"i{n}") for n in range(50)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = basket_pairs(df, "basket", "item", max_basket_size=10).collect()
    assert {(r.item_a, r.item_b) for r in got} == {("a", "b")}
    uncapped = basket_pairs(df, "basket", "item").count()
    assert uncapped == 50 * 49 // 2 + 1


def test_basket_pairs_plan_is_equi_join(spark):
    """The pair expansion must be an equi join on the basket key — never a
    cartesian/nested-loop."""
    rows = [(1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    plan = _plan(basket_pairs(df, "basket", "item"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_linkage_plan_is_equi_join(spark):
    from kinesis_app_spark.registry_analytics import record_linkage_customers

    plan = _plan(record_linkage_customers(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_linkage_distance2_records_do_not_link(spark):
    """custkey%10=7 records carry 2 edits — they must be absent from the
    dirty-side matches at max_dist=1 (true negatives), and every linked
    pair must satisfy the threshold."""
    from kinesis_app_spark.registry_analytics import record_linkage_customers

    out = record_linkage_customers(spark, SF_DIR)
    assert out.filter(F.col("dist") > 1).count() == 0
    linked_l = {r.custkey_l for r in out.collect()}
    assert not any(k % 10 == 7 for k in linked_l)
    # distance-1 records (custkey%3=0, not %10=7) must link
    assert any(k % 3 == 0 for k in linked_l)


def test_cooccur_plan_never_nested_loop(spark):
    from kinesis_app_spark.registry_analytics import cooccur_parts_in_orders

    plan = _plan(cooccur_parts_in_orders(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bigram_short_docs_no_crash(spark):
    """0/1-token documents have no bigrams: they vanish from the output
    (no rows), and nothing throws (the sequence(1, n-1) guard)."""
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words"), (4, "a b c")],
        ["doc_id", "text"],
    )
    out = bigram_logprob_scores(df).collect()
    assert {r.doc_id for r in out} == {3, 4}
    by_id = {r.doc_id: r.n_bigrams for r in out}
    assert by_id == {3: 1, 4: 2}


def test_anomaly_constant_series_flags_nothing(spark):
    """sigma=0 windows must not divide by zero or flag rows."""
    from kinesis_app_spark.registry_analytics import anomaly_event_zscores

    rows = [(i, "t", float(5)) for i in range(200)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"]).select(
        "event_id",
        F.timestamp_seconds(F.col("event_id") + 1_600_000_000).alias("ts"),
        "event_type",
        "value",
    )
    df.createOrReplaceTempView("_const_events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-100, -1)
    )
    scored = df.select(
        "event_id",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count("value").over(w).alias("n_prev"),
        "value",
    ).filter(
        (F.col("n_prev") >= 30)
        & (F.col("sigma") > 0)
        & (F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 3)
    )
    assert scored.count() == 0


def test_blocked_link_requires_block_columns(spark):
    """Non-block columns are suffixed; block column is join key."""
    a = spark.createDataFrame([(1, "abc", "k")], ["id", "name", "block"])
    b = spark.createDataFrame([(2, "abd", "k"), (3, "zzz", "k")], ["id", "name", "block"])
    out = blocked_levenshtein_link(a, b, ["block"], "name", max_dist=1).collect()
    assert len(out) == 1
    assert out[0].id_l == 1 and out[0].id_r == 2 and out[0].dist == 1


def test_interval_overlap_matches_brute_force(spark):
    """Grid-binned result == brute-force theta join on a fixture with
    multi-cell spans, touching intervals (no overlap, half-open), and
    exact-boundary ends."""
    from kinesis_app_spark.operators.intervals import interval_overlap_join

    a_rows = [(1, 0, 10), (2, 95, 205), (3, 300, 400), (4, 50, 60)]
    b_rows = [(10, 5, 15), (11, 200, 210), (12, 10, 20), (13, 400, 410)]
    a = spark.createDataFrame(a_rows, ["id", "start", "end"])
    b = spark.createDataFrame(b_rows, ["id", "start", "end"])
    got = {
        (r.id_a, r.id_b)
        for r in interval_overlap_join(a, b, cell_width=100).collect()
    }
    brute = {
        (ra[0], rb[0])
        for ra in a_rows
        for rb in b_rows
        if ra[1] < rb[2] and rb[1] < ra[2]
    }
    assert got == brute
    # pair (2, 11) overlaps across a cell boundary: emitted exactly once
    rows = interval_overlap_join(a, b, cell_width=100).collect()
    assert len(rows) == len(got)


def test_interval_overlap_plan_no_nested_loop(spark):
    from kinesis_app_spark.registry_analytics import interval_overlap_events

    plan = _plan(interval_overlap_events(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_overlap_rejects_bad_width(spark):
    import pytest
    from kinesis_app_spark.operators.intervals import interval_overlap_join

    df = spark.createDataFrame([(1, 0, 1)], ["id", "start", "end"])
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, cell_width=0)


def test_weighted_sample_favors_heavy_rows(spark):
    """The A-ES sample must overrepresent heavy rows: the sample's mean
    weight exceeds the population mean."""
    from kinesis_app_spark.operators.sampling import weighted_sample
    from kinesis_app_spark.sources.batch import load_table

    l = load_table(spark, SF_DIR, "lineitem")
    s = weighted_sample(
        l,
        id_str=F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
        weight=F.col("l_quantity"),
        k=500,
    )
    mean_sample = s.agg(F.avg("l_quantity")).first()[0]
    mean_pop = l.agg(F.avg("l_quantity")).first()[0]
    assert mean_sample > mean_pop * 1.1, (mean_sample, mean_pop)


def test_weighted_sample_plans_take_ordered(spark):
    from kinesis_app_spark.registry_analytics import weighted_sample_lineitem

    plan = _plan(weighted_sample_lineitem(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from kinesis_app_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], ["id", "w"]
    )
    got = weighted_sample(
        df, id_str=F.col("id").cast("string"), weight=F.col("w"), k=10
    ).collect()
    assert {r.id for r in got} == {3}
