"""semantic_dedup (SemDeDup) operator contracts: the greedy lowest-id
keep rule, the fat-cluster guard, and the empty-seed failure mode."""

from __future__ import annotations

import pytest

from kinesis_app_spark.operators.dedup import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lowest_id_survives_its_semantic_copies(spark):
    # ids 0/1 are orthogonal seeds; 5 duplicates id 0's direction, 6
    # duplicates id 1's (scaled copies: cosine exactly 1), 7 is oblique
    # enough (cos ~ 0.707) to survive a 0.9 threshold
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (5, [2.0, 0.0, 0.0, 0.0]),
        (6, [0.0, 0.5, 0.0, 0.0]),
        (7, [1.0, 1.0, 0.0, 0.0]),
    ]
    out = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in semantic_dedup(
            _df(spark, rows), n_clusters=2, threshold=0.9
        ).collect()
    }
    assert out[0] == (0, True) and out[5] == (0, False)
    assert out[1] == (1, True) and out[6] == (1, False)
    assert out[7][1] is True  # oblique vector survives
    assert len(out) == 5


def test_fat_cluster_guard_raises(spark):
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(10)]
    with pytest.raises(ValueError, match="largest cluster"):
        semantic_dedup(
            _df(spark, rows), n_clusters=1, threshold=0.999,
            max_cluster_rows=4,
        ).collect()


def test_missing_seeds_raise(spark):
    rows = [(100, [1.0, 0.0]), (101, [0.0, 1.0])]
    with pytest.raises(ValueError, match="seed"):
        semantic_dedup(_df(spark, rows), n_clusters=8)
