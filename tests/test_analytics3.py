"""Plan-shape + invariant tests for the behavioral/training-prep wave
(session paths, gap-fill, triangles, splits, class balancing)."""

from __future__ import annotations

import contextlib
import io
from collections import defaultdict

from kinesis_app_spark.registry_analytics3 import (
    class_balance_events,
    session_paths_topk,
    timeseries_gapfill_ffill,
    train_test_split_docs,
    triangle_count_parts,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_triangle_plan_never_nested_loop(spark):
    df = triangle_count_parts(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()  # tree-only: formatted mode lists every node twice
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    # the two final 1-row combines are broadcast nested loops by design
    # (crossJoin of broadcast singletons); the wedge legs must not be
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_triangle_count_on_known_graph(spark):
    """Square 1-2-3-4 with one diagonal (1,3): exactly 2 triangles."""
    from kinesis_app_spark.operators.baskets import basket_pairs
    from pyspark.sql import functions as F

    # baskets that induce exactly the edge set of the braced square
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    rows = [(i, a) for i, (a, b) in enumerate(edges) for _ in (0,)] + [
        (i, b) for i, (a, b) in enumerate(edges)
    ]
    # repeat each basket twice so every edge passes the n_baskets >= 2 gate
    rows = rows + [(i + 100, v) for i, v in rows]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    pairs = basket_pairs(df, "l_orderkey", "l_partkey").filter(
        F.col("n_baskets") >= 2
    )
    e = pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    wedges = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedges.join(
        e.select("a", F.col("b").alias("c")), ["a", "c"]
    ).count()
    assert tri == 2


def test_session_paths_single_user_shuffle(spark):
    """sessionize's window shuffle must be the only hash exchange before
    the final aggregate: the path groupBy on (user_id, session_idx) is
    satisfied by the existing user_id partitioning."""
    plan = _plan(session_paths_topk(spark, SF_DIR))
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 2, plan  # user_id window + path-count agg


def test_gapfill_calendar_is_dense_and_filled(spark):
    rows = timeseries_gapfill_ffill(spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for evs in by_type.values():
        days = [r.day for r in evs]
        assert days == sorted(days)
        for a, b in zip(days, days[1:]):
            assert (b - a).days == 1  # no calendar gaps
        # first day is always observed; filled days carry the prior value
        assert evs[0].is_filled is False
        for prev, cur in zip(evs, evs[1:]):
            if cur.is_filled:
                assert cur.day_value == prev.day_value


def test_split_proportions_and_determinism(spark):
    rows = train_test_split_docs(spark, SF_DIR).collect()
    totals = defaultdict(int)
    for r in rows:
        totals[r.split] += r.n_docs
    assert set(totals) == {"train", "validation", "test"}
    n = sum(totals.values())
    assert totals["train"] > totals["validation"] + totals["test"]
    assert 0.6 * n < totals["train"] < 0.95 * n
    again = train_test_split_docs(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_class_balance_equalizes_counts(spark):
    rows = class_balance_events(spark, SF_DIR).collect()
    counts = defaultdict(int)
    for r in rows:
        counts[r.event_type] += 1
    assert len(set(counts.values())) == 1  # every class at minority size
    assert min(counts.values()) > 0


# ---------------------------------------------------------------------
# corpus-prep wave: sequence packing + token-weighted sampling
# ---------------------------------------------------------------------

def test_sequence_packing_matches_global_window(spark):
    """The two-phase distributed prefix sum must produce the exact same
    packs as the naive single-window formulation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kinesis_app_spark.functions.text import token_count
    from kinesis_app_spark.registry_funcs3 import sequence_packing_docs
    from kinesis_app_spark.sources.batch import load_table

    got = {
        (r.pack_id, r.n_docs, r.total_tokens)
        for r in sequence_packing_docs(spark, SF_DIR).collect()
    }
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        d.withColumn("before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .groupBy(F.floor(F.col("before") / 2048).alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    want = {(r.pack_id, r.n_docs, r.total_tokens) for r in naive.collect()}
    assert got == want


def test_sequence_packing_pack_ids_contiguous(spark):
    from kinesis_app_spark.registry_funcs3 import sequence_packing_docs

    rows = sequence_packing_docs(spark, SF_DIR).collect()
    ids = [r.pack_id for r in rows]
    assert ids == list(range(len(ids)))
    # every pack except possibly the last holds >= a budget's worth of
    # tokens minus the straddle slack (a doc is never split)
    assert all(r.total_tokens > 0 for r in rows)


def test_token_weighted_sample_prefers_long_docs(spark):
    from pyspark.sql import functions as F

    from kinesis_app_spark.functions.text import token_count
    from kinesis_app_spark.registry_funcs3 import token_weighted_doc_sample
    from kinesis_app_spark.sources.batch import load_table

    sampled = token_weighted_doc_sample(spark, SF_DIR)
    mean_sampled = sampled.agg(F.avg("n_tokens")).first()[0]
    corpus = load_table(spark, SF_DIR, "documents").select(
        token_count(F.col("text")).alias("n_tokens")
    )
    mean_corpus = corpus.agg(F.avg("n_tokens")).first()[0]
    assert mean_sampled > mean_corpus  # length-biased by construction
