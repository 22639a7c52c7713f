"""Perceptual image hashing (dHash) — the invariance and sensitivity
properties the registry entries rely on, proven directly: uniform
brightness shifts cancel, a single flipped cell moves exactly one bit,
distinct row-uniform patterns are >= 8 bits apart, corrupt payloads are
skipped, and the band join's completeness contract is enforced."""

from __future__ import annotations

import pytest

from kinesis_app_spark.operators import multimodal as MM


def _cells(high_cols, offset=0, flip_row=None):
    hi, lo = 160 + offset, 40 + offset
    vals = [
        [hi if cx in high_cols else lo for cx in range(9)] for _ in range(8)
    ]
    if flip_row is not None:
        vals[flip_row][1] = lo
    return vals


def _hash_of(spark, payloads: list[bytes]) -> dict[int, int]:
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(payloads)), "payload": payloads}
        ),
        "doc_id long, payload binary",
    )
    return {
        r["doc_id"]: r["dhash"] for r in MM.image_dhash(df).collect()
    }


def test_brightness_shift_is_invariant(spark):
    pat = {1, 3, 5}
    h = _hash_of(
        spark,
        [
            MM.png_bytes_cells(_cells(pat, offset=o))
            for o in (0, 10, 30, 50)
        ],
    )
    assert len(set(h.values())) == 1


def test_single_cell_flip_moves_exactly_one_bit(spark):
    pat = {1, 4, 6}  # (low, high, low) prefix on columns 0-2
    h = _hash_of(
        spark,
        [
            MM.png_bytes_cells(_cells(pat)),
            MM.png_bytes_cells(_cells(pat, flip_row=2)),
            MM.png_bytes_cells(_cells(pat, flip_row=5)),
        ],
    )
    assert bin(h[0] ^ h[1]).count("1") == 1
    assert bin(h[0] ^ h[2]).count("1") == 1
    assert bin(h[1] ^ h[2]).count("1") == 2


def test_distinct_row_uniform_patterns_are_far_apart(spark):
    pats = [{0, 2, 4, 6, 8}, {0, 1, 4, 5, 8}, {0, 3, 6}, {1, 2, 5, 6},
            {0, 1, 2, 3, 4}]
    h = _hash_of(spark, [MM.png_bytes_cells(_cells(p)) for p in pats])
    vals = list(h.values())
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            assert bin(vals[i] ^ vals[j]).count("1") >= 8


def test_corrupt_and_nonstandard_payloads(spark):
    ok = MM.png_bytes_cells(_cells({1, 3}))
    h = _hash_of(
        spark,
        [
            ok,
            b"not a png at all",
            ok[:40],  # truncated mid-chunk
            MM.png_bytes(36, 32, seed=7),  # non-72x64: crop path, no crash
        ],
    )
    assert 0 in h and 3 in h  # good + croppable images hashed
    assert 1 not in h and 2 not in h  # corrupt ones skipped, not fatal


def test_band_join_completeness_contract():
    with pytest.raises(ValueError, match="max_hamming"):
        MM.dhash_near_dup_pairs(None, max_hamming=4)
