"""YOLO head fine-tuning (train/detector.py): max-IoU target assignment,
GIoU math, loss descent with a frozen trunk, and dp-sharded step parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videotofaces_tpu.models import yolo as Y
from videotofaces_tpu.parallel.mesh import make_mesh
from videotofaces_tpu.train import detector as TD


def test_iou_matrix_basics():
    a = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    m = TD.iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0)
    np.testing.assert_allclose(m[0, 1], 25.0 / 175.0, rtol=1e-6)
    np.testing.assert_allclose(m[1, 0], 0.0)


def test_assign_targets_pos_neg_forced():
    priors, _ = Y.flat_priors_and_strides((64, 64))
    corners = TD.priors_to_corners(priors)
    # gt that IS one of the prior boxes -> that prior positive, target = gt
    gt = corners[7:8].copy()
    obj_t, box_t = TD.assign_targets(gt, priors)
    assert obj_t[7] == 1.0
    np.testing.assert_allclose(box_t[7], gt[0])
    # a tiny gt overlapping nothing at >= pos_iou still gets its best prior
    tiny = np.asarray([[30.0, 30.0, 33.0, 33.0]], np.float32)
    obj_t2, box_t2 = TD.assign_targets(tiny, priors)
    assert (obj_t2 == 1.0).sum() >= 1
    got = box_t2[obj_t2 == 1.0]
    np.testing.assert_allclose(got, np.repeat(tiny, got.shape[0], axis=0))
    # no gt: all negatives
    obj_t3, _ = TD.assign_targets(np.zeros((0, 4)), priors)
    assert (obj_t3 == 0.0).all()


def test_giou_values(rng):
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(TD.giou(a, a)), [1.0], atol=1e-6)
    # disjoint boxes in a 20x10 hull: iou 0, hull penalty (200-200)/200 = 0
    b = jnp.asarray([[10.0, 0.0, 20.0, 10.0]])
    np.testing.assert_allclose(np.asarray(TD.giou(a, b)), [0.0], atol=1e-6)
    # far-apart boxes approach -1
    c = jnp.asarray([[1000.0, 0.0, 1010.0, 10.0]])
    assert float(TD.giou(a, c)[0]) < -0.9


def _synthetic_faces(rng, n, size=64):
    """Frames with one bright block each; gt = the block's box."""
    frames, gts = [], []
    for i in range(n):
        f = (rng.random((size, size, 3)) * 60).astype(np.uint8)
        x = int(rng.integers(4, size - 28))
        y = int(rng.integers(4, size - 28))
        s = int(rng.integers(16, 26))
        f[y:y + s, x:x + s] = (210, 180, 160)
        frames.append(f)
        gts.append(np.asarray([[x, y, x + s, y + s]], np.float32))
    return np.stack(frames), gts


def test_head_finetune_descends_and_freezes_trunk(rng):
    frames, gts = _synthetic_faces(rng, 8)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))["params"]
    before_trunk = jax.tree.map(np.asarray,
                                {k: v for k, v in params.items() if k != "head"})
    out, hist = TD.finetune_yolo_head(frames, gts, epochs=10, batch_size=4,
                                      learning_rate=3e-3, max_side=64,
                                      params=params, seed=0)
    assert min(hist) < hist[0] * 0.7 and hist[-1] < hist[0], hist
    # trunk untouched, head moved
    for a, b in zip(jax.tree.leaves(before_trunk),
                    jax.tree.leaves({k: v for k, v in out.items() if k != "head"})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params["head"]),
                                jax.tree.leaves(out["head"])))
    assert moved


def test_full_finetune_layerwise(rng):
    frames, gts = _synthetic_faces(rng, 8)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))["params"]
    before = jax.tree.map(np.asarray, params)
    # full fine-tuning with inference-mode BN (frozen stats) has nothing
    # renormalizing activations, so it needs a gentler lr than the
    # head-only path (3e-3 NaNs around step 5; 1e-3 descends cleanly)
    out, hist = TD.finetune_yolo_full(frames, gts, epochs=6, batch_size=4,
                                      learning_rate=1e-3, max_side=64,
                                      params=params, seed=0)
    assert hist[-1] < hist[0], hist

    def max_delta(key):
        return max(np.max(np.abs(np.asarray(a) - np.asarray(b)))
                   for a, b in zip(jax.tree.leaves(before[key]),
                                   jax.tree.leaves(out[key])))

    # every module moved; adamw step size ~ lr * scale, so the backbone's
    # largest step stays well under the head's
    assert max_delta("backbone") > 0.0
    assert max_delta("neck") > 0.0
    assert max_delta("head") > 2.0 * max_delta("backbone")

    # scale 0.0 freezes a module outright
    out2, _ = TD.finetune_yolo_full(frames, gts, epochs=1, batch_size=4,
                                    learning_rate=1e-3, max_side=64,
                                    params=params, seed=0,
                                    trunk_scales={"backbone": 0.0,
                                                  "neck": 0.3, "head": 1.0})
    for a, b in zip(jax.tree.leaves(before["backbone"]),
                    jax.tree.leaves(out2["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_trunk_scales_merge_and_head_bn_stats_frozen(rng):
    frames, gts = _synthetic_faces(rng, 4)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))["params"]

    # partial override must merge over the defaults, not replace them
    out, _ = TD.finetune_yolo_full(frames, gts, epochs=1, batch_size=4,
                                   learning_rate=1e-3, max_side=64,
                                   params=params, seed=0,
                                   trunk_scales={"backbone": 0.0})
    for a, b in zip(jax.tree.leaves(params["backbone"]),
                    jax.tree.leaves(out["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(params["head"]),
                               jax.tree.leaves(out["head"])))

    # the head-only path must freeze bn running stats too (NaN hazard)
    out2, _ = TD.finetune_yolo_head(frames, gts, epochs=1, batch_size=4,
                                    learning_rate=3e-3, max_side=64,
                                    params=params, seed=0)

    def stat_leaves(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): v for p, v in flat
                if "mean" in jax.tree_util.keystr(p)
                or "var" in jax.tree_util.keystr(p)}

    before = stat_leaves(params["head"])
    after = stat_leaves(out2["head"])
    assert before, "head should contain bn stats"
    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]),
                                      np.asarray(after[k]))


def test_sharded_full_step_matches_single_device(rng):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    frames, gts = _synthetic_faces(rng, 4)
    priors, strides = Y.flat_priors_and_strides((64, 64))
    canvas = frames[..., ::-1].astype(np.float32) / 255.0
    obj_t, box_t = TD.assign_batch(list(gts), priors)
    params = jax.jit(Y.YOLOv3(1).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"]
    tx = TD.layerwise_tx(1e-3)
    opt = tx.init(params)
    pr, st = jnp.asarray(priors), jnp.asarray(strides)

    p1, o1, loss1, _ = jax.jit(
        lambda pp, oo, x, ot, bt: TD.train_step_full(pp, oo, x, ot, bt,
                                                     pr, st, tx))(
        params, opt, jnp.asarray(canvas), jnp.asarray(obj_t), jnp.asarray(box_t))

    from videotofaces_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, devices=devs[:4])
    step, sp, so = TD.make_sharded_full_step(mesh, tx, params, opt,
                                             priors, strides)
    p2, o2, loss2, _ = step(sp, so, jnp.asarray(canvas),
                            jnp.asarray(obj_t), jnp.asarray(box_t))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_head_step_matches_single_device(rng):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    frames, gts = _synthetic_faces(rng, 4)
    priors, strides = Y.flat_priors_and_strides((64, 64))
    canvas = frames[..., ::-1].astype(np.float32) / 255.0
    obj_t, box_t = TD.assign_batch(
        [g for g in gts], priors)
    model_params = jax.jit(Y.YOLOv3(1).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"]
    trunk = {k: v for k, v in model_params.items() if k != "head"}
    head = model_params["head"]
    tx = optax.adamw(1e-3)
    opt = tx.init(head)
    pr, st = jnp.asarray(priors), jnp.asarray(strides)

    h1, o1, loss1, aux1 = jax.jit(
        lambda hh, oo, x, ot, bt: TD.train_step(hh, oo, trunk, x, ot, bt,
                                                pr, st, tx))(
        head, opt, jnp.asarray(canvas), jnp.asarray(obj_t), jnp.asarray(box_t))

    mesh = make_mesh(n_data=4, devices=devs[:4])
    step, sh, so = TD.make_sharded_head_step(mesh, tx, head, opt, trunk,
                                             priors, strides)
    h2, o2, loss2, aux2 = step(sh, so, jnp.asarray(canvas),
                               jnp.asarray(obj_t), jnp.asarray(box_t))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(h1), jax.tree.leaves(h2)):
        # tail differences = per-shard reduction order in the psums, amplified
        # through adamw's m/(sqrt(v)+eps) for near-zero grads; bound abs error
        # well under the 1e-3 lr step size instead of chasing relative noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
