import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops.select import (block_topk_indices, block_topk_select,
                                          pick_rows_onehot)
from videotofaces_tpu.ops import select as S


def naive(scores, payload, k):
    order = np.argsort(-scores, kind="stable")[:k]
    return scores[order], payload[order]


def test_block_topk_matches_exact(rng):
    b, d, p, k = 3, 2999, 6, 200
    scores = rng.uniform(0, 1, size=(b, d)).astype(np.float32)
    scores[scores < 0.7] = 0.0  # sparse candidates like a detector
    payload = rng.normal(size=(b, d, p)).astype(np.float32)
    vals, sel, overflow = block_topk_select(jnp.asarray(scores), jnp.asarray(payload),
                                            k, per_block=32)
    vals, sel, overflow = np.asarray(vals), np.asarray(sel), np.asarray(overflow)
    assert (overflow == 0).all()
    for i in range(b):
        wv, wp = naive(scores[i], payload[i], k)
        np.testing.assert_allclose(vals[i], wv, rtol=1e-6)
        # ties in scores can permute payload rows; compare as sorted sets per value
        np.testing.assert_allclose(np.sort(sel[i], axis=0), np.sort(wp, axis=0),
                                   rtol=1e-6, atol=1e-6)


def test_block_topk_exact_order_distinct_scores(rng):
    b, d, p, k = 2, 1500, 4, 100
    scores = rng.permutation(d * b).reshape(b, d).astype(np.float32) + 1.0
    payload = rng.normal(size=(b, d, p)).astype(np.float32)
    vals, sel, overflow = block_topk_select(jnp.asarray(scores), jnp.asarray(payload),
                                            k, per_block=32)
    for i in range(b):
        wv, wp = naive(scores[i], payload[i], k)
        np.testing.assert_allclose(np.asarray(vals)[i], wv)
        np.testing.assert_allclose(np.asarray(sel)[i], wp)


def test_block_topk_overflow_detection(rng):
    # cram 40 top candidates into one 128-lane block with per_block=8
    d, k = 512, 64
    scores = np.zeros((1, d), np.float32)
    scores[0, :40] = rng.uniform(10, 20, size=40)   # all in block 0
    scores[0, 200:224] = rng.uniform(1, 2, size=24)
    payload = rng.normal(size=(1, d, 3)).astype(np.float32)
    vals, sel, overflow = block_topk_select(jnp.asarray(scores), jnp.asarray(payload),
                                            k, per_block=8)
    assert int(np.asarray(overflow)[0]) >= 1  # block 0 truncated and flagged


def test_block_topk_indices_matches_lax_topk(rng):
    import jax

    b, d, k = 3, 2999, 200
    scores = rng.uniform(0, 1, size=(b, d)).astype(np.float32)
    scores[scores < 0.7] = 0.0
    vals, idx, overflow = block_topk_indices(jnp.asarray(scores), k, per_block=32)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)
    assert (np.asarray(overflow) == 0).all()
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_block_topk_indices_tie_order_matches_lax_topk(rng):
    import jax

    # heavy ties: scores drawn from 4 distinct values -> tie order (ascending
    # index among equals) must match lax.top_k exactly
    b, d, k = 2, 1600, 300
    scores = rng.choice([0.0, 0.7, 0.8, 0.9], size=(b, d)).astype(np.float32)
    vals, idx, _ = block_topk_indices(jnp.asarray(scores), k, per_block=64)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_block_topk_indices_overflow_and_bounds(rng):
    d, k = 512, 64
    scores = np.zeros((1, d), np.float32)
    scores[0, :40] = rng.uniform(10, 20, size=40)
    vals, idx, overflow = block_topk_indices(jnp.asarray(scores), k, per_block=8)
    assert int(np.asarray(overflow)[0]) >= 1
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < d).all()


def test_pick_rows_onehot_matches_take_along_axis(rng):
    # non-128-multiple D exercises the block padding; repeated indices are
    # legal (the stage-1 caller clamps padded picks to d-1)
    b, d, p, k = 2, 1931, 4, 97
    payload = rng.normal(size=(b, d, p)).astype(np.float32)
    idx = rng.integers(0, d, size=(b, k)).astype(np.int32)
    idx[0, :3] = [0, d - 1, d - 1]
    got = np.asarray(pick_rows_onehot(jnp.asarray(payload), jnp.asarray(idx)))
    want = np.take_along_axis(payload, idx[..., None], axis=1)
    np.testing.assert_array_equal(got, want)


def test_pick_rows_onehot_bf16_exact(rng):
    # bf16 payload (the production stage-1 reg map dtype in throughput mode):
    # a one-hot contraction copies the value exactly, no rounding
    b, d, p, k = 1, 640, 4, 33
    payload = jnp.asarray(rng.normal(size=(b, d, p)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, d, size=(b, k)).astype(np.int32))
    got = pick_rows_onehot(payload, idx)
    assert got.dtype == jnp.bfloat16
    want = jnp.take_along_axis(payload, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(got.astype(jnp.float32)),
                                  np.asarray(want.astype(jnp.float32)))


def test_block_top_sort_equals_argmax(rng):
    """The lane-sort per-block selection is bit-identical to the iterative
    argmax formulation (values, payload, indices, overflow) including heavy
    tie traffic (quantized scores, zero filler, -inf pads)."""
    for trial in range(3):
        d = int(rng.integers(200, 2000))
        s = np.round(rng.uniform(0, 1, (2, d)) * 20) / 20
        s[rng.uniform(size=(2, d)) < 0.6] = 0.0
        s = jnp.asarray(s.astype(np.float32))
        pay = jnp.asarray(rng.standard_normal((2, d, 4)).astype(np.float32))
        k = int(rng.integers(10, 120))
        for pb in (4, 20):
            a = S.block_topk_select(s, pay, k, pb, method="argmax")
            c = S.block_topk_select(s, pay, k, pb, method="sort")
            for x, y in zip(a, c):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            ai = S.block_topk_indices(s, k, pb, method="argmax")
            ci = S.block_topk_indices(s, k, pb, method="sort")
            for x, y in zip(ai, ci):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_block_top_sort_vs_argmax_exhausted_blocks():
    """When a block runs out of finite entries, BOTH arms return the pad
    value for the dead slots (so validity masks agree), but their
    lanes/payload legitimately differ (argmax repeats lane 0 of the
    exhausted block; sort walks the pad lanes) — the documented contract is
    that consumers never gather by a pad-valued slot's idx."""
    d, k = 130, 8
    s = np.full((1, d), -np.inf, np.float32)
    s[0, :5] = np.arange(5, 0, -1, dtype=np.float32)
    s = jnp.asarray(s)
    pay = jnp.asarray(np.arange(d, dtype=np.float32)[None, :, None])
    for method in ("argmax", "sort"):
        vals, sel, overflow = S.block_topk_select(
            s, pay, k, per_block=4, overflow_floor=-jnp.inf, method=method)
        v = np.asarray(vals)[0]
        np.testing.assert_array_equal(v[:5], [5, 4, 3, 2, 1])
        assert np.all(np.isinf(v[5:]) & (v[5:] < 0))
        # live slots carry the right payload in both arms
        np.testing.assert_array_equal(np.asarray(sel)[0, :5, 0],
                                      [0, 1, 2, 3, 4])
        assert int(np.asarray(overflow)[0]) == 0
