"""Classifier-evaluation operators: cross-checked against independent
pure-Python reimplementations on the real sf0.001 tables (the
cross-engine value gate covers the oracle parity; these pin the MATH)."""

from __future__ import annotations

from kinesis_app_spark.registry_mleval import (
    _doc_logits,
    classifier_auc_docs,
    pr_threshold_sweep_docs,
    score_band_calibration,
)

SF_DIR = "/root/testdata/sf0.001"


def _scored(spark):
    return [
        (r["logit"], r["pos"]) for r in _doc_logits(spark, SF_DIR).collect()
    ]


def test_auc_matches_naive_rank_formula(spark):
    pairs = _scored(spark)
    # independent: average ranks over the pooled scores
    import collections

    cnt = collections.Counter(s for s, _ in pairs)
    c_less, avg_rank = 0, {}
    for s in sorted(cnt):
        avg_rank[s] = c_less + (cnt[s] + 1) / 2.0
        c_less += cnt[s]
    pos = [s for s, p in pairs if p == 1]
    neg_n = len(pairs) - len(pos)
    r_pos = sum(avg_rank[s] for s in pos)
    want = (r_pos - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * neg_n)

    r = classifier_auc_docs(spark, SF_DIR).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), neg_n)
    assert abs(r["auc"] - want) < 1e-6
    assert abs(r["gini"] - (2 * want - 1)) < 1e-6


def test_auc_perfect_separation_bounds(spark):
    """Sanity bounds: a random-ish hashed classifier on language labels
    must land strictly inside (0, 1) — 0.5-ish, never degenerate."""
    r = classifier_auc_docs(spark, SF_DIR).collect()[0]
    assert 0.0 < r["auc"] < 1.0


def test_calibration_bands_partition_the_corpus(spark):
    pairs = _scored(spark)
    rows = score_band_calibration(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == len(pairs)
    assert sum(r["n_pos"] for r in rows) == sum(p for _, p in pairs)
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        if -5 < r["band"] < 5:  # unclamped bands contain their logits
            assert 5 * r["band"] <= r["mean_logit"] < 5 * (r["band"] + 1)
    bands = [r["band"] for r in rows]
    assert bands == sorted(bands)


def test_pr_sweep_monotone_and_exact_at_zero(spark):
    pairs = _scored(spark)
    rows = {r["threshold"]: r for r in pr_threshold_sweep_docs(spark, SF_DIR).collect()}
    n_pos = sum(p for _, p in pairs)
    n = len(pairs)
    for t, r in rows.items():
        assert r["tp"] + r["fn"] == n_pos
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        want_tp = sum(1 for s, p in pairs if s > t and p == 1)
        assert r["tp"] == want_tp
    # recall is non-increasing in the threshold
    ts = sorted(rows)
    recalls = [rows[t]["recall"] for t in ts]
    assert all(
        a >= b for a, b in zip(recalls, recalls[1:]) if a is not None and b is not None
    )
