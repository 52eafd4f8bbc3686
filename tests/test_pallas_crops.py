"""adaptive_pool_crops (Pallas, interpret mode on CPU) vs the integral-image
gather formulation it replaces on the MTCNN hot path."""

import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops.pallas_crops import (adaptive_pool_crops,
                                               bucket_limits, pad_frames_chw)
from videotofaces_tpu.ops.resize import adaptive_pool_boxes_batched, integral_image


def _normalize(x):
    return (x - 127.5) / 128.0


def _planar(frames_u8_bgr):
    rgb = frames_u8_bgr[..., ::-1]
    chw = jnp.transpose(_normalize(jnp.asarray(rgb, jnp.float32)), (0, 3, 1, 2))
    return pad_frames_chw(chw)


def test_adaptive_pool_crops_matches_gather_path(rng):
    b, h, w = 2, 40, 56
    frames_u8 = rng.integers(0, 256, size=(b, h, w, 3)).astype(np.uint8)
    ii = integral_image(jnp.asarray(frames_u8[..., ::-1]))
    frames_chw = _planar(frames_u8)

    out = 5
    sy, sx = bucket_limits((h, w), (16, 24))
    assert sy == 16 and sx == 128  # lane rounding swallows small widths
    n = 24
    wins, scal = [], []
    for k in range(n):
        ok = 0 if k % 7 == 3 else 1
        wh = int(rng.integers(1, 16 + 1))
        ww = int(rng.integers(1, 24 + 1))
        y1 = int(rng.integers(0, h - wh + 1))
        x1 = int(rng.integers(0, w - ww + 1))
        img = int(rng.integers(0, b))
        wins.append((x1, y1, x1 + ww, y1 + wh, img))
        scal.append((img, y1, x1, wh, ww, ok))
    imgidx = np.asarray([r[4] for r in wins], np.int32)
    wins = np.asarray([r[:4] for r in wins], np.int32)
    scal = np.asarray(scal, np.int32)

    got = np.asarray(adaptive_pool_crops(frames_chw, jnp.asarray(scal), out,
                                         (sy, sx), interpret=True))
    want = np.asarray(_normalize(adaptive_pool_boxes_batched(
        ii, jnp.asarray(wins), jnp.asarray(imgidx), (out, out))))
    for k in range(n):
        if scal[k, 5]:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-5)
        else:
            assert np.all(got[k] == 0.0)


def test_adaptive_pool_crops_upsampling_windows(rng):
    """Windows smaller than the output grid (tiny stage-1 boxes resampled UP
    to 24x24) replicate pixels exactly like F.adaptive_avg_pool2d."""
    b, h, w = 1, 30, 30
    frames_u8 = rng.integers(0, 256, size=(b, h, w, 3)).astype(np.uint8)
    ii = integral_image(jnp.asarray(frames_u8[..., ::-1]))
    frames_chw = _planar(frames_u8)
    sy, sx = bucket_limits((h, w), (8, 8))
    scal = np.asarray([[0, 4, 6, 3, 2, 1]], np.int32)  # 3x2 window -> 8x8
    got = np.asarray(adaptive_pool_crops(frames_chw, jnp.asarray(scal), 8,
                                         (sy, sx), interpret=True))
    want = np.asarray(_normalize(adaptive_pool_boxes_batched(
        ii, jnp.asarray([[6, 4, 8, 7]], np.int32), jnp.asarray([0], np.int32),
        (8, 8))))
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-5)


def test_adaptive_pool_crops_full_frame_windows(rng):
    """Windows as large as the whole (padded-bucket) frame still fit: the
    clamped, tile-aligned patch origin plus in-patch offset covers every
    legal window position."""
    b, h, w = 1, 37, 130
    frames_u8 = rng.integers(0, 256, size=(b, h, w, 3)).astype(np.uint8)
    ii = integral_image(jnp.asarray(frames_u8[..., ::-1]))
    frames_chw = _planar(frames_u8)
    sy, sx = bucket_limits((h, w), (h, w))
    wins = np.asarray([[0, 0, w, h], [3, 5, w, h], [1, 30, 128, 37]], np.int32)
    scal = np.asarray([[0, y1, x1, y2 - y1, x2 - x1, 1]
                       for (x1, y1, x2, y2) in wins], np.int32)
    got = np.asarray(adaptive_pool_crops(frames_chw, jnp.asarray(scal), 6,
                                         (sy, sx), interpret=True))
    want = np.asarray(_normalize(adaptive_pool_boxes_batched(
        ii, jnp.asarray(wins), jnp.zeros(3, jnp.int32), (6, 6))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
