import numpy as np
import jax
import jax.numpy as jnp

from videotofaces_tpu.models import yolo as Y
from videotofaces_tpu.utils import weights as W

import oracles


def np_yolo_postprocess(maps, priors, strides, nc=1, conf_thr=0.005, score_thr=0.05,
                        iou_thr=0.45, out_topk=100):
    """Numpy oracle replicating the reference candidate/NMS semantics
    (detectors/yolo.py:151-175)."""
    b = maps[0].shape[0]
    flat = np.concatenate([m.reshape(b, -1, nc + 5) for m in maps], axis=1)
    results = []
    for i in range(b):
        reg = flat[i, :, :4]
        obj = 1 / (1 + np.exp(-flat[i, :, 4]))
        cls = 1 / (1 + np.exp(-flat[i, :, 5:]))
        loc_idx, cls_idx = np.nonzero((obj[:, None] >= conf_thr) & (cls > score_thr))
        scores = cls[loc_idx, cls_idx] * obj[loc_idx]
        boxes = oracles.np_decode_yolo(reg[loc_idx], priors[loc_idx], strides[loc_idx])
        keep = oracles.np_greedy_nms(boxes, scores, iou_thr, group_ids=cls_idx)[:out_topk]
        results.append((boxes[keep], scores[keep], cls_idx[keep]))
    return results


def test_yolo_map_shapes():
    m = Y.YOLOv3()
    x = jnp.zeros((1, 608, 608, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    maps = m.apply({"params": params}, x)
    assert [t.shape for t in maps] == [(1, 19, 19, 18), (1, 38, 38, 18), (1, 76, 76, 18)]


def test_yolo_postprocess_matches_oracle(rng):
    canvas = (96, 128)
    priors, strides = Y.flat_priors_and_strides(canvas)
    d32 = (3 * 4, 6 * 8, 12 * 16)
    maps = [rng.normal(-2.2, 1.2, size=(2, h, w, 18)).astype(np.float32)
            for (h, w) in [(3, 4), (6, 8), (12, 16)]]
    del d32
    got_b, got_s, got_c, got_v, overflow = jax.jit(
        lambda ms: Y.postprocess(ms, jnp.asarray(priors), jnp.asarray(strides), pre_topk=600)
    )([jnp.asarray(m) for m in maps])
    assert int(np.asarray(overflow).max()) == 0
    want = np_yolo_postprocess(maps, priors, strides)
    for i in range(2):
        v = np.asarray(got_v[i])
        wb, ws, wc = want[i]
        assert v.sum() == len(wb), (v.sum(), len(wb))
        np.testing.assert_allclose(np.asarray(got_s[i])[v], ws, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b[i])[v], wb, rtol=1e-3, atol=1e-2)


def test_yolo_spec_matches_param_tree():
    m = Y.YOLOv3()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)))["params"]
    spec = Y.torch_spec()

    # synthesize a torch-ordered tensor stream from the spec itself
    exp_flat = W.flatten(jax.tree.map(np.asarray, params))
    tensors = []
    for el in spec:
        kind = el[0]
        if kind == "conv":
            kern = exp_flat[f"{el[1]}/kernel"]
            tensors.append(np.transpose(kern, (3, 2, 0, 1)))
            if el[2]:
                tensors.append(exp_flat[f"{el[1]}/bias"])
        elif kind == "bn":
            for suffix in ["scale", "bias", "mean", "var"]:
                tensors.append(exp_flat[f"{el[1]}/{suffix}"])
            tensors.append(np.zeros(()))  # num_batches_tracked
        else:
            raise AssertionError(kind)

    flat = W.convert_state(spec, tensors)
    assert set(flat) == set(exp_flat)
    for k in flat:
        assert flat[k].shape == exp_flat[k].shape, k
        np.testing.assert_array_equal(flat[k], exp_flat[k])


def test_s2d_stem_matches_standard_stem(rng):
    """Space-to-depth conv1+stage0_down reformulation is tap-for-tap
    identical to the standard stem (accumulation reassociation only)."""
    m = Y.YOLOv3(1)
    x = jnp.asarray(rng.normal(0, 0.5, size=(2, 64, 96, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    want = Y.dconv(64, 3, s=2, name="stage0_down").apply(
        {"params": params["backbone"]["stage0_down"]},
        Y.dconv(32, 3, name="conv1").apply(
            {"params": params["backbone"]["conv1"]}, x))
    got = Y.s2d_stem(params["backbone"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # full graphs agree end to end
    maps_ref = m.apply({"params": params}, x)
    maps_s2d = Y.YOLOv3(1, from_stage0=True).apply({"params": params}, got)
    for a, b in zip(maps_ref, maps_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_fused_resize_s2d_matches_separate(rng):
    """bilinear_resize_matmul_s2d == resize-onto-canvas -> BGR flip -> /255
    -> 2x2 space-to-depth pack (f32-rounding-level: /255 is folded into the
    interpolation matrix)."""
    from videotofaces_tpu.ops.resize import (bilinear_resize_matmul,
                                             bilinear_resize_matmul_s2d)

    x = jnp.asarray(rng.integers(0, 255, size=(2, 108, 192, 3)).astype(np.uint8))
    out_hw, canvas = (34, 60), (64, 96)
    ref = bilinear_resize_matmul(x, out_hw, canvas_hw=canvas)
    ref = ref[..., ::-1] / 255.0
    b, ch, cw, _ = ref.shape
    want = ref.reshape(b, ch // 2, 2, cw // 2, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, ch // 2, cw // 2, 12)
    got = bilinear_resize_matmul_s2d(x, out_hw, canvas)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # the packed tensor feeds s2d_stem unchanged: same stem output either way
    m = Y.YOLOv3(1)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    np.testing.assert_allclose(
        np.asarray(Y.s2d_stem(params["backbone"], got)),
        np.asarray(Y.s2d_stem(params["backbone"], want)),
        rtol=1e-5, atol=1e-5)


def test_packed_down_matches_strided_conv(rng):
    """PackedDown (s2d pack + 2x2 unstrided conv) is tap-identical to the
    3x3 stride-2 ConvUnit on the same params, and registers the same tree."""
    x = jnp.asarray(rng.normal(0, 0.5, size=(2, 24, 40, 16)).astype(np.float32))
    ref_m = Y.dconv(32, 3, s=2)
    pk_m = Y.PackedDown(32)
    p_ref = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    p_pk = pk_m.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.map(lambda a: a.shape, p_ref) == \
        jax.tree.map(lambda a: a.shape, p_pk)
    np.testing.assert_allclose(
        np.asarray(pk_m.apply({"params": p_ref}, x)),
        np.asarray(ref_m.apply({"params": p_ref}, x)),
        rtol=1e-5, atol=1e-5)


def test_packed_downs_full_graph_agrees(rng):
    """YOLOv3(packed_downs=(1, 2, 3)) head maps match the standard graph on
    the same params."""
    m = Y.YOLOv3(1)
    x = jnp.asarray(rng.normal(0, 0.5, size=(1, 64, 96, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    maps_ref = m.apply({"params": params}, x)
    maps_pk = Y.YOLOv3(1, packed_downs=(1, 2, 3)).apply({"params": params}, x)
    for a, b in zip(maps_ref, maps_pk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_yolo_full_forward_smoke(rng):
    frames = rng.integers(0, 255, size=(2, 120, 160, 3)).astype(np.uint8)
    nh, nw = Y.resized_shape(120, 160, max_side=160)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    m = Y.YOLOv3()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *canvas, 3)))["params"]
    fn = jax.jit(lambda p, f: Y.full_forward(p, f, (nh, nw), canvas, jnp.asarray(priors),
                                             jnp.asarray(strides), out_topk=20))
    boxes, scores, classes, valid, overflow = fn(params, jnp.asarray(frames))
    assert boxes.shape == (2, 20, 4) and valid.shape == (2, 20)
