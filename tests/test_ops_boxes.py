import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops import boxes as B
from videotofaces_tpu.ops import anchors as A

import oracles


def random_boxes(rng, n, lim=640.0):
    xy1 = rng.uniform(0, lim * 0.8, size=(n, 2))
    wh = rng.uniform(4, lim * 0.3, size=(n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


def test_decode_rcnn_matches_oracle(rng):
    priors = np.abs(rng.normal(100, 30, size=(64, 4))).astype(np.float32)
    pred = rng.normal(0, 0.5, size=(64, 4)).astype(np.float32)
    for mults in [(1.0, 1.0), (0.1, 0.2)]:
        for clamp in [False, True]:
            got = np.asarray(B.decode_boxes(jnp.asarray(pred), jnp.asarray(priors), mults, clamp))
            want = oracles.np_decode_rcnn(pred, priors, mults, clamp)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-4)


def test_decode_yolo_matches_oracle(rng):
    priors = np.abs(rng.normal(100, 30, size=(64, 4))).astype(np.float32)
    pred = rng.normal(0, 0.5, size=(64, 4)).astype(np.float32)
    strides = rng.choice([8.0, 16.0, 32.0], size=(64, 1)).astype(np.float32)
    got = np.asarray(B.decode_boxes(jnp.asarray(pred), jnp.asarray(priors), mode="yolo",
                                    strides=jnp.asarray(strides)))
    want = oracles.np_decode_yolo(pred, priors, strides)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-4)


def test_iou_matrix(rng):
    a = random_boxes(rng, 20)
    b = random_boxes(rng, 30)
    for plus_one in [False, True]:
        for mode in ["iou", "iom"]:
            got = np.asarray(B.box_iou_matrix(jnp.asarray(a), jnp.asarray(b), plus_one, mode))
            want = oracles.np_iou(a, b, plus_one, mode)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_clamp_scale_cwh(rng):
    b = random_boxes(rng, 16, lim=900)
    sizes = np.array([[480.0, 640.0]] * 16, dtype=np.float32)
    clamped = np.asarray(B.clamp_to_canvas(jnp.asarray(b), jnp.asarray(sizes)))
    assert clamped[:, 0].min() >= 0 and clamped[:, 2].max() <= 640 and clamped[:, 3].max() <= 480

    cwh = np.asarray(B.convert_to_cwh(jnp.asarray(b)))
    np.testing.assert_allclose(cwh[:, 2], b[:, 2] - b[:, 0], rtol=1e-6)
    np.testing.assert_allclose(cwh[:, 0], (b[:, 0] + b[:, 2]) / 2, rtol=1e-6)

    scaled = np.asarray(B.scale_boxes(jnp.asarray(b), jnp.asarray([[960.0, 1280.0]]),
                                      jnp.asarray([[480.0, 640.0]])))
    np.testing.assert_allclose(scaled, b * 2, rtol=1e-6)


def test_small_boxes_mask():
    b = np.array([[0, 0, 10, 10], [0, 0, 3, 10], [0, 0, 10, 3]], dtype=np.float32)
    m = np.asarray(B.small_boxes_mask(jnp.asarray(b), 5.0))
    assert m.tolist() == [True, False, False]


def test_make_anchors_example():
    # reference docstring example, operations/anchor.py:11-13
    got = A.make_anchors([16, 32], scales=[1, 0.5, 0.1], ratios=[1, 2])
    want0 = [(16, 16), (8, 8), (1.6, 1.6)]
    for (gw, gh), (ww, wh) in zip(got[0][:3], want0):
        assert abs(gw - ww) < 1e-6 and abs(gh - wh) < 1e-6
    assert abs(got[0][3][0] - 22.6274) < 1e-3 and abs(got[0][3][1] - 11.3137) < 1e-3


def test_get_priors_example():
    # reference docstring example, operations/anchor.py:24-29
    p = A.get_priors((90, 64), [(32, [(8, 4), (25, 15)])])
    assert p.shape == (12, 4)
    np.testing.assert_allclose(p[0], [16, 16, 8, 4])
    np.testing.assert_allclose(p[1], [16, 16, 25, 15])
    np.testing.assert_allclose(p[2], [48, 16, 8, 4])
    np.testing.assert_allclose(p[4], [16, 48, 8, 4])
    np.testing.assert_allclose(p[-1], [48, 80, 25, 15])


def test_get_priors_corner_multilevel():
    levels = A.get_priors((800, 1216), [(8, [(16, 16)]), (16, [(32, 32)])], loc="corner", concat=False)
    assert levels[0].shape == (100 * 152, 4)
    assert levels[1].shape == (50 * 76, 4)
    np.testing.assert_allclose(levels[0][0], [0, 0, 16, 16])
    np.testing.assert_allclose(levels[1][1], [16, 0, 32, 32])
