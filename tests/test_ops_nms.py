import numpy as np
import jax.numpy as jnp

from videotofaces_tpu.ops import nms as N

import oracles
from test_ops_boxes import random_boxes


def _pad(boxes, scores, k):
    n = len(boxes)
    b = np.zeros((k, 4), dtype=np.float32)
    s = np.zeros((k,), dtype=np.float32)
    v = np.zeros((k,), dtype=bool)
    b[:n], s[:n], v[:n] = boxes, scores, True
    return jnp.asarray(b), jnp.asarray(s), jnp.asarray(v)


def test_greedy_nms_matches_oracle(rng):
    for trial in range(5):
        n = 60
        boxes = random_boxes(rng, n, lim=200)
        scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        b, s, v = _pad(boxes, scores, 80)
        keep = np.asarray(N.nms_keep_mask(b, s, v, 0.5))
        want_idx = oracles.np_greedy_nms(boxes, scores, 0.5)
        want = np.zeros(80, dtype=bool)
        want[want_idx] = True
        np.testing.assert_array_equal(keep, want)


def test_grouped_nms_matches_oracle(rng):
    n = 80
    boxes = random_boxes(rng, n, lim=150)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    groups = rng.integers(0, 3, size=n)
    b, s, v = _pad(boxes, scores, 96)
    g = np.zeros(96, dtype=np.int32)
    g[:n] = groups
    keep = np.asarray(N.nms_keep_mask(b, s, v, 0.4, group_ids=jnp.asarray(g)))
    want_idx = oracles.np_greedy_nms(boxes, scores, 0.4, group_ids=groups)
    want = np.zeros(96, dtype=bool)
    want[want_idx] = True
    np.testing.assert_array_equal(keep, want)


def test_iom_chain_matches_oracle(rng):
    n = 50
    boxes = random_boxes(rng, n, lim=120)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    groups = rng.integers(0, 2, size=n)
    b, s, v = _pad(boxes, scores, 64)
    g = np.zeros(64, dtype=np.int32)
    g[:n] = groups
    keep = np.asarray(N.iom_chain_suppress(b, s, v, 0.7, group_ids=jnp.asarray(g)))
    want = oracles.np_iom_chain(boxes, scores, 0.7, group_ids=groups)
    np.testing.assert_array_equal(keep[:n], want)
    assert not keep[n:].any()


def test_batched_nms_topk_order(rng):
    n = 40
    boxes = random_boxes(rng, n, lim=100)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    b, s, v = _pad(boxes, scores, 64)
    out_b, out_s, idx, valid = N.batched_nms_topk(b, s, v, 0.5, topk=10)
    want_idx = oracles.np_greedy_nms(boxes, scores, 0.5)[:10]
    got_idx = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got_idx, want_idx[: len(got_idx)])
    # scores come back in descending order
    out_s = np.asarray(out_s)[np.asarray(valid)]
    assert (np.diff(out_s) <= 1e-6).all()


def test_nms_all_invalid():
    b = jnp.zeros((8, 4))
    s = jnp.zeros((8,))
    v = jnp.zeros((8,), dtype=bool)
    keep = np.asarray(N.nms_keep_mask(b, s, v, 0.5))
    assert not keep.any()


def test_bucketed_nms_exact_both_branches(rng):
    """nms_keep_mask_bucketed == per-image nms_keep_mask on [B, K] buffers,
    whether the batch-max valid count fits the bucket (small branch) or
    exceeds it (full-capacity branch)."""
    for counts in ([5, 0, 17], [5, 300, 17]):  # fits / exceeds bucket=256
        k = 512
        bs, ss, vs = [], [], []
        for n in counts:
            boxes = random_boxes(rng, max(n, 1), lim=120)[:n]
            scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
            b, s, v = _pad(boxes, scores, k)
            bs.append(b), ss.append(s), vs.append(v)
        b = jnp.stack(bs)
        s = jnp.stack(ss)
        v = jnp.stack(vs)
        got = np.asarray(N.nms_keep_mask_bucketed(b, s, v, 0.5, bucket=256))
        for i in range(len(counts)):
            want = np.asarray(N.nms_keep_mask(b[i], s[i], v[i], 0.5))
            np.testing.assert_array_equal(got[i], want)


def test_bucketed_presorted_nms_exact_both_branches(rng):
    """nms_keep_mask_bucketed_presorted == per-image nms_keep_mask on
    presorted [B, K] buffers with prefix validity, with and without group
    ids, in both the bucket and full-capacity branches."""
    for counts in ([5, 0, 17], [5, 300, 17]):  # fits / exceeds bucket=256
        k = 512
        bs, vs, gs = [], [], []
        for n in counts:
            boxes = random_boxes(rng, max(n, 1), lim=120)[:n]
            scores = -np.sort(-rng.uniform(0.1, 1.0, size=n).astype(np.float32))
            order = np.argsort(-scores)
            b, s, v = _pad(boxes[order], scores[order], k)
            g = rng.integers(0, 3, size=k).astype(np.int32)
            bs.append(b), vs.append(v), gs.append(jnp.asarray(g))
        b, v, g = jnp.stack(bs), jnp.stack(vs), jnp.stack(gs)
        for gids in (None, g):
            got = np.asarray(N.nms_keep_mask_bucketed_presorted(
                b, v, 0.5, group_ids=gids, bucket=256))
            for i in range(len(counts)):
                want = np.asarray(N.nms_keep_mask(
                    b[i], None, v[i], 0.5,
                    group_ids=None if gids is None else gids[i],
                    presorted=True))
                np.testing.assert_array_equal(got[i], want)
