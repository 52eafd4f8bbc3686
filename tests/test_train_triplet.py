"""Triplet metric-learning (train/triplet.py): batch-hard mining vs a numpy
oracle, loss descent on separable synthetic data, and dp-sharded step parity
with the single-device step on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from videotofaces_tpu.parallel.mesh import make_mesh
from videotofaces_tpu.train import triplet as T


def _np_batch_hard(emb, labels):
    b = emb.shape[0]
    d = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    d_ap, d_an, valid = np.zeros(b), np.zeros(b), np.zeros(b, bool)
    for i in range(b):
        pos = [j for j in range(b) if labels[j] == labels[i] and j != i]
        neg = [j for j in range(b) if labels[j] != labels[i]]
        valid[i] = bool(pos) and bool(neg)
        if valid[i]:
            d_ap[i] = max(d[i, j] for j in pos)
            d_an[i] = min(d[i, j] for j in neg)
    return d_ap, d_an, valid


def test_batch_hard_mining_matches_oracle(rng):
    emb = rng.normal(size=(12, 5)).astype(np.float32)
    labels = rng.integers(0, 4, size=12).astype(np.int32)
    d_ap, d_an, valid = jax.jit(T.batch_hard_mining)(jnp.asarray(emb),
                                                     jnp.asarray(labels))
    e_ap, e_an, e_valid = _np_batch_hard(emb, labels)
    np.testing.assert_array_equal(np.asarray(valid), e_valid)
    np.testing.assert_allclose(np.asarray(d_ap), e_ap, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_an), e_an, rtol=1e-5, atol=1e-6)


def test_mining_handles_all_same_and_all_distinct():
    emb = jnp.eye(4, 3)
    # all same label: no negatives -> nothing valid
    assert not np.asarray(T.batch_hard_mining(emb, jnp.zeros(4, jnp.int32))[2]).any()
    # all distinct: no positives -> nothing valid
    assert not np.asarray(
        T.batch_hard_mining(emb, jnp.arange(4, dtype=jnp.int32))[2]).any()


class TinyEnc(nn.Module):
    dim: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), strides=2)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.dim)(x)


def _class_images(rng, n_per_class, classes=3, size=12, scale=0.3, noise=0.8):
    """Class k = faint base color pattern k + heavy noise: separable but not
    already separated at random init, so the loss has room to descend."""
    xs, ys = [], []
    for k in range(classes):
        base = np.zeros((size, size, 3), np.float32)
        base[..., k % 3] = scale
        base[: size // 2, :, (k + 1) % 3] = scale * 0.7
        for _ in range(n_per_class):
            xs.append(base + rng.normal(0, noise, base.shape))
            ys.append(k)
    return np.asarray(xs, np.float32), np.asarray(ys, np.int32)


def test_triplet_training_descends(rng):
    model = TinyEnc()
    params, opt_state, tx = T.create_train_state(
        model, jax.random.PRNGKey(0), (1, 12, 12, 3), learning_rate=5e-3)
    step = jax.jit(lambda p, o, x, y: T.train_step(p, o, x, y, model, tx))
    xs, ys = _class_images(rng, n_per_class=8)
    losses, actives = [], []
    for it in range(80):
        order = np.random.default_rng(it).permutation(len(xs))[:18]
        params, opt_state, loss, active = step(
            params, opt_state, jnp.asarray(xs[order]), jnp.asarray(ys[order]))
        losses.append(float(loss))
        actives.append(float(active))
    assert np.mean(losses[-5:]) < 0.2 * np.mean(losses[:5]), losses
    # the margin ends satisfied for most batch-hard triplets
    assert np.mean(actives[-5:]) < 0.2


def test_sharded_step_matches_single_device(rng):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    model = TinyEnc()
    params, opt_state, tx = T.create_train_state(
        model, jax.random.PRNGKey(1), (1, 12, 12, 3), learning_rate=1e-3)
    xs, ys = _class_images(rng, n_per_class=4)  # batch 12, divisible by 4
    x, y = jnp.asarray(xs), jnp.asarray(ys)

    p1, o1, loss1, act1 = jax.jit(
        lambda p, o, xx, yy: T.train_step(p, o, xx, yy, model, tx))(
        params, opt_state, x, y)

    mesh = make_mesh(n_data=4, devices=devs[:4])
    step, sp, so = T.make_sharded_triplet_step(mesh, model, tx, params, opt_state)
    p2, o2, loss2, act2 = step(sp, so, x, y)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(act1), float(act2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_xbm_mining_uses_bank_negatives(rng):
    emb = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
    labels = jnp.asarray(np.asarray([0, 0, 1, 1, 2, 2], np.int32))
    # bank holds a negative RIGHT on top of anchor 0 -> its d_an must drop to ~0
    bank_emb = jnp.concatenate([emb[0:1], jnp.full((3, 5), 50.0)], axis=0)
    bank_labels = jnp.asarray(np.asarray([7, 8, 9, 10], np.int32))
    bank_valid = jnp.asarray([True, True, False, False])

    d_ap0, d_an0, v0 = T.batch_hard_mining(emb, labels)
    d_ap1, d_an1, v1 = jax.jit(T.batch_hard_mining_xbm)(
        emb, labels, bank_emb, bank_labels, bank_valid)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d_ap0), np.asarray(d_ap1),
                               rtol=1e-6)
    assert float(d_an1[0]) < 1e-6 < float(d_an0[0])
    # invalid bank rows (the far-away 50s) must not affect anyone
    assert (np.asarray(d_an1) <= np.asarray(d_an0) + 1e-6).all()

    # an all-same-label batch has no in-batch negatives; the bank provides
    # them, so anchors become valid
    same = jnp.zeros((4,), jnp.int32)
    _, _, v_batch = T.batch_hard_mining(emb[:4], same)
    _, d_an_b, v_bank = T.batch_hard_mining_xbm(emb[:4], same, bank_emb,
                                               bank_labels, bank_valid)
    assert not np.asarray(v_batch).any() and np.asarray(v_bank).all()
    assert np.isfinite(np.asarray(d_an_b)).all()


def test_memory_bank_fifo():
    bank = T.MemoryBank(4, 2)
    assert not bank.valid.any()
    bank.push(np.ones((2, 2)), [1, 2])
    assert list(bank.labels) == [1, 2, -1, -1]
    bank.push(2 * np.ones((3, 2)), [3, 4, 5])
    # ring wrapped: oldest (label 1) overwritten
    assert sorted(bank.labels[bank.valid]) == [2, 3, 4, 5]
    # oversized push keeps the newest `capacity` rows
    bank.push(np.arange(12).reshape(6, 2), [6, 7, 8, 9, 10, 11])
    assert sorted(bank.labels) == [8, 9, 10, 11]


def test_finetune_with_bank_descends(rng):
    model = TinyEnc()
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 12, 12, 3)))["params"]
    xs, ys = _class_images(rng, n_per_class=8)
    xs_u8 = np.clip((xs + 2) * 50, 0, 255).astype(np.uint8)
    out_params, hist = T.finetune_facenet(
        xs_u8, ys, epochs=8, batch_size=12, learning_rate=5e-3,
        model=model, params=params, bank_size=16)
    assert len(hist) == 8 and all(np.isfinite(h) for h in hist)
    assert hist[-1] < hist[0], hist


def test_sharded_xbm_step_matches_single_device(rng):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    model = TinyEnc()
    params, opt_state, tx = T.create_train_state(
        model, jax.random.PRNGKey(4), (1, 12, 12, 3), learning_rate=1e-3)
    xs, ys = _class_images(rng, n_per_class=4)
    x, y = jnp.asarray(xs), jnp.asarray(ys)
    bank = T.MemoryBank(8, 8)
    bank.push(rng.normal(size=(5, 8)).astype(np.float32), [9, 9, 8, 8, 7])
    be, bl, bv = bank.arrays()

    p1, o1, loss1, act1, emb1 = jax.jit(
        lambda p, o, xx, yy: T.train_step_xbm(p, o, xx, yy, be, bl, bv,
                                              model, tx))(
        params, opt_state, x, y)

    mesh = make_mesh(n_data=4, devices=devs[:4])
    step, sp, so = T.make_sharded_xbm_step(mesh, model, tx, params, opt_state)
    p2, o2, loss2, act2, emb2 = step(sp, so, x, y, be, bl, bv)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_finetune_facenet_loop_with_injected_model(rng):
    """The convenience loop: epoch shuffling, tail-batch drop, history — with
    a tiny injected model so the loop logic is what's under test."""
    model = TinyEnc()
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)))["params"]
    xs = (rng.random((20, 16, 16, 3)) * 255).astype(np.uint8)
    ys = np.repeat(np.arange(4), 5)
    out_params, history = T.finetune_facenet(
        xs, ys, epochs=2, batch_size=8, learning_rate=1e-3,
        model=model, params=params)
    assert len(history) == 2
    assert all(np.isfinite(h) for h in history)
    # params actually moved
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out_params)))
    assert moved
