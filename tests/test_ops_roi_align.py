import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops import roi_align as RA


def np_roi_align_single(fmap, box, stride, out=7):
    """Scalar oracle for roi_align(sampling_ratio=0, aligned=True) per the
    published algorithm (Mask R-CNN paper + torchvision docs)."""
    h, w, c = fmap.shape
    scale = 1.0 / stride
    x1 = box[0] * scale - 0.5
    y1 = box[1] * scale - 0.5
    x2 = box[2] * scale - 0.5
    y2 = box[3] * scale - 0.5
    roi_h, roi_w = y2 - y1, x2 - x1
    bin_h, bin_w = roi_h / out, roi_w / out
    kh = max(int(np.ceil(roi_h / out)), 1) if roi_h > 0 else 1
    kw = max(int(np.ceil(roi_w / out)), 1) if roi_w > 0 else 1

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y, x = max(y, 0.0), max(x, 0.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        if y0 >= h - 1:
            y0 = y1_ = h - 1
            ly = 0.0
        else:
            y1_ = y0 + 1
            ly = y - y0
        if x0 >= w - 1:
            x0 = x1_ = w - 1
            lx = 0.0
        else:
            x1_ = x0 + 1
            lx = x - x0
        return ((1 - ly) * (1 - lx) * fmap[y0, x0] + (1 - ly) * lx * fmap[y0, x1_]
                + ly * (1 - lx) * fmap[y1_, x0] + ly * lx * fmap[y1_, x1_])

    res = np.zeros((out, out, c))
    for i in range(out):
        for j in range(out):
            acc = np.zeros(c)
            for sy in range(kh):
                for sx in range(kw):
                    y = y1 + i * bin_h + (sy + 0.5) * bin_h / kh
                    x = x1 + j * bin_w + (sx + 0.5) * bin_w / kw
                    acc += bilinear(y, x)
            res[i, j] = acc / (kh * kw)
    return res


import pytest


@pytest.mark.parametrize("method,chunk", [
    ("dense", 4), ("sorted", 4), ("gather", 4), ("slice", 4),
    # chunk > n-per-level: the final padded chunk mixes levels with padding —
    # regression for the sorted variant's level-column padding (a zero pad
    # made [lvl0.., pad] chunks look homogeneous-level-0)
    ("sorted", 8),
])
def test_roi_align_matches_oracle(rng, method, chunk):
    strides = (4, 8, 16, 32)
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]  # 256x384 input
    fmaps = [rng.normal(size=(h, w, 8)).astype(np.float32) for (h, w) in sizes]

    boxes = np.asarray([
        [10.0, 12.0, 90.0, 100.0],     # sqrt(wh)~84 -> P2
        [4.0, 4.0, 180.0, 160.0],      # ~166 -> P3
        [0.0, 0.0, 256.0, 256.0],      # 256 -> P4
        [0.0, 0.0, 383.0, 255.0],      # ~313 -> P4 (clamp would need >448 for P5)
        [2.5, 3.5, 20.25, 17.75],      # small, fractional coords
        [100.0, 50.0, 101.0, 51.0],    # tiny 1px
    ], dtype=np.float32)

    got = np.asarray(RA.roi_align_multilevel(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(boxes), strides, window=56,
        chunk=chunk, method=method))

    lv = np.asarray(RA.assign_fpn_levels(jnp.asarray(boxes)))
    for i, box in enumerate(boxes):
        want = np_roi_align_single(fmaps[lv[i]], box, strides[lv[i]])
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"roi {i} level {lv[i]}")


def test_roi_align_degenerate_box():
    fmaps = [np.zeros((56, 56, 4), np.float32) for _ in range(4)]
    fmaps[0][:] = 1.0
    boxes = np.asarray([[50.0, 50.0, 50.0, 50.0]], dtype=np.float32)  # zero-size
    got = np.asarray(RA.roi_align_multilevel([jnp.asarray(f) for f in fmaps],
                                             jnp.asarray(boxes), chunk=1))
    assert got.shape == (1, 7, 7, 4)
    assert np.isfinite(got).all()


def test_roi_align_pallas_matches_oracle(rng):
    """The Pallas patch engine (interpret mode on CPU) matches the scalar
    oracle on an f32 stack: main bucket, big bucket (forced small main), and
    dead-slot skipping."""
    strides = (4, 8, 16, 32)
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    fmaps = [rng.normal(size=(2, h, w, 8)).astype(np.float32) for (h, w) in sizes]

    boxes = np.asarray([
        [10.0, 12.0, 90.0, 100.0],     # P2
        [4.0, 4.0, 180.0, 160.0],      # P3
        [0.0, 0.0, 256.0, 256.0],      # P4
        [2.5, 3.5, 20.25, 17.75],      # small fractional
        [100.0, 50.0, 101.0, 51.0],    # tiny
        [0.0, 0.0, 380.0, 250.0],      # big -> overflows a small main bucket
    ], dtype=np.float32)
    bx = jnp.asarray(np.stack([boxes, boxes[::-1]]))     # [2, 6, 4]
    valid = np.ones((2, 6), bool)
    valid[1, 2] = False                                   # dead slot skipped
    got, dropped, kept, truncated = RA.roi_align_multilevel_pallas(
        [jnp.asarray(f) for f in fmaps], bx, jnp.asarray(valid), strides,
        main_hw=(24, 24), big_hw=(40, 48), big_cap=4, interpret=True)
    got = np.asarray(got)
    assert np.asarray(dropped).tolist() == [0, 0]
    assert np.asarray(truncated).tolist() == [0, 0]
    np.testing.assert_array_equal(np.asarray(kept), valid)

    for b in range(2):
        bxi = np.asarray(bx[b])
        lv = np.asarray(RA.assign_fpn_levels(jnp.asarray(bxi)))
        for i in range(6):
            if not valid[b, i]:
                np.testing.assert_array_equal(got[b, i], 0.0)
                continue
            want = np_roi_align_single(fmaps[lv[i]][b], bxi[i], strides[lv[i]])
            np.testing.assert_allclose(got[b, i], want, rtol=1e-4, atol=1e-4,
                                       err_msg=f"img {b} roi {i} level {lv[i]}")


def test_roi_align_pallas_big_cap_drops_counted(rng):
    """Big-bucket overflow drops the lowest-priority rois and counts them."""
    strides = (4, 8, 16, 32)
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    fmaps = [rng.normal(size=(1, h, w, 4)).astype(np.float32) for (h, w) in sizes]
    # all four need the big bucket with a tiny main; cap at 2 -> 2 dropped
    boxes = np.asarray([[0.0, 0.0, 250.0, 250.0]] * 4, dtype=np.float32)
    boxes += np.arange(4)[:, None] * 2
    got, dropped, kept, truncated = RA.roi_align_multilevel_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(boxes[None]),
        jnp.ones((1, 4), bool), strides, main_hw=(8, 16), big_hw=(40, 48),
        big_cap=2, interpret=True)
    assert np.asarray(dropped).tolist() == [2]
    # dropped rois lose their kept flag (callers mask them out of validity)
    np.testing.assert_array_equal(np.asarray(kept), [[True, True, False, False]])
    got = np.asarray(got)
    lv = np.asarray(RA.assign_fpn_levels(jnp.asarray(boxes)))
    for i in range(2):   # first two slots processed (score-descending order)
        want = np_roi_align_single(fmaps[lv[i]][0], boxes[i], strides[lv[i]])
        np.testing.assert_allclose(got[0, i], want, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[0, 2:], 0.0)


def test_roi_align_pallas_truncated_windows_counted(rng):
    """Degenerate-aspect rois whose sampling window exceeds even big_hw stay
    kept but run window-TRUNCATED — the 4th return counts them per image so
    users of the opt-in engine can detect the approximation (ADVICE r4)."""
    strides = (4, 8, 16, 32)
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    fmaps = [rng.normal(size=(1, h, w, 4)).astype(np.float32) for (h, w) in sizes]
    boxes = np.asarray([
        [0.0, 0.0, 380.0, 8.0],        # ~95-col window on its level -> truncated
        [0.0, 0.0, 64.0, 64.0],        # fits the big bucket exactly
    ], dtype=np.float32)
    got, dropped, kept, truncated = RA.roi_align_multilevel_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(boxes[None]),
        jnp.ones((1, 2), bool), strides, main_hw=(8, 16), big_hw=(40, 48),
        big_cap=4, interpret=True)
    assert np.asarray(dropped).tolist() == [0]
    np.testing.assert_array_equal(np.asarray(kept), [[True, True]])
    assert np.asarray(truncated).tolist() == [1]
