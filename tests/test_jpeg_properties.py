"""Property tests for the baseline JPEG codec: for ARBITRARY image
content, dimensions, quality, and restart interval, the decoded pixels
must EXACTLY equal the pure-math reference path — the entropy, header,
and bit-IO layers are lossless by construction, so any counterexample
hypothesis finds is a real codec bug, not quantization noise."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_app_spark.functions.jpeg import (
    QTABLE_CHR,
    QTABLE_LUM,
    _dequant_idct,
    _fdct_quant,
    _from_blocks,
    _quality_scale,
    _to_blocks,
    jpeg_decode,
    jpeg_encode,
)


def _reference_gray(img: np.ndarray, quality: int) -> np.ndarray:
    qt = _quality_scale(QTABLE_LUM, quality)
    h, w = img.shape
    blocks, bh, bw = _to_blocks(img.astype(np.float64))
    return _from_blocks(
        _dequant_idct(_fdct_quant(blocks, qt), qt), bh, bw, h, w
    )


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(1, 100),
    seed=st.integers(0, 2**31),
    rst=st.integers(0, 5),
)
def test_gray_codec_equals_math_reference(h, w, quality, seed, rst):
    y, x = np.mgrid[0:h, 0:w]
    img = (((x * 2654435761 + y * 40503 + seed) >> 5) % 256).astype(
        np.uint8
    )
    data = jpeg_encode(img, quality=quality, restart_interval=rst)
    got = jpeg_decode(data)
    assert np.array_equal(got, _reference_gray(img, quality))


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    quality=st.integers(1, 100),
    seed=st.integers(0, 2**31),
)
def test_rgb_codec_equals_math_reference(h, w, quality, seed):
    """Color: each plane (after the exact same float color transform the
    encoder applies) must match its per-plane math reference before the
    final RGB reconstruction — pinned by re-deriving the YCbCr planes
    and comparing the decoder's internal output through the public API
    (decode, then re-derive Y from the decoded RGB is lossy; instead
    compare against the FULL math reference pipeline run on the same
    planes)."""
    y_, x_ = np.mgrid[0:h, 0:w]
    base = ((x_ * 37 + y_ * 11 + seed) % 256).astype(np.uint8)
    rgb = np.stack([base, base[::-1, :], base[:, ::-1]], axis=-1)
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        np.clip(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b, 0, 255),
        np.clip(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b, 0, 255),
    ]
    qts = [
        _quality_scale(QTABLE_LUM, quality),
        _quality_scale(QTABLE_CHR, quality),
        _quality_scale(QTABLE_CHR, quality),
    ]
    ref_planes = []
    for plane, qt in zip(planes, qts):
        blocks, bh, bw = _to_blocks(plane)
        ref_planes.append(
            _from_blocks(
                _dequant_idct(_fdct_quant(blocks, qt), qt), bh, bw, h, w
            ).astype(np.float64)
        )
    yy, cb, cr = ref_planes
    want = np.stack(
        [
            np.clip(np.round(yy + 1.402 * (cr - 128.0)), 0, 255),
            np.clip(
                np.round(
                    yy - 0.344136 * (cb - 128.0)
                    - 0.714136 * (cr - 128.0)
                ), 0, 255,
            ),
            np.clip(np.round(yy + 1.772 * (cb - 128.0)), 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    got = jpeg_decode(jpeg_encode(rgb, quality=quality))
    assert np.array_equal(got, want)
