import numpy as np
import jax
import jax.numpy as jnp

from videotofaces_tpu.models import rcnn as R
from videotofaces_tpu.ops.anchors import get_priors

import oracles


def test_upsample_nearest_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    for (h, w, oh, ow) in [(13, 21, 25, 42), (7, 7, 14, 14), (10, 16, 19, 33)]:
        x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        got = np.asarray(R._upsample_nearest(jnp.asarray(x), (oh, ow)))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(t, size=(oh, ow), mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(got, want)


def np_rpn_oracle(regs, logs, priors, used_hw, lvtop, out_top, iou_thr=0.7):
    """Reference RPN semantics (rcnn.py:49-82) in numpy, per image."""
    b = regs[0].shape[0]
    results = []
    for i in range(b):
        all_boxes, all_obj, all_lv = [], [], []
        for lv in range(len(regs)):
            log = logs[lv][i]
            k = min(lvtop, log.shape[0])
            top = np.argsort(-log, kind="stable")[:k]
            boxes = oracles.np_decode_rcnn(regs[lv][i][top], priors[lv][top])
            all_boxes.append(boxes)
            all_obj.append(1 / (1 + np.exp(-log[top])))
            all_lv.append(np.full(k, lv))
        boxes = np.concatenate(all_boxes)
        obj = np.concatenate(all_obj)
        lvid = np.concatenate(all_lv)
        h, w = used_hw[i]
        boxes = boxes.clip(0, [w, h, w, h])
        mask = (boxes[:, 2] - boxes[:, 0] > 0) & (boxes[:, 3] - boxes[:, 1] > 0)
        boxes, obj, lvid = boxes[mask], obj[mask], lvid[mask]
        keep = oracles.np_greedy_nms(boxes, obj, iou_thr, group_ids=lvid)[:out_top]
        results.append((boxes[keep], obj[keep]))
    return results


def test_rpn_proposals_match_oracle(rng):
    canvas = (64, 96)
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    b = 2
    regs, logs = [], []
    for p in priors:
        d = p.shape[0]
        regs.append(rng.normal(0, 0.2, size=(b, d, 4)).astype(np.float32))
        logs.append(rng.normal(-1, 1.5, size=(b, d)).astype(np.float32))
    used = np.asarray([[60.0, 96.0], [64.0, 90.0]], np.float32)

    got_boxes, got_valid, _ = jax.jit(
        lambda rg, lg: R.rpn_proposals(rg, lg, [jnp.asarray(p) for p in priors],
                                       jnp.asarray(used), lvtop=50, out_top=40)
    )([jnp.asarray(r) for r in regs], [jnp.asarray(l) for l in logs])

    want = np_rpn_oracle(regs, logs, priors, used, lvtop=50, out_top=40)
    for i in range(b):
        v = np.asarray(got_valid[i])
        wb, wo = want[i]
        assert v.sum() == len(wb)
        np.testing.assert_allclose(np.asarray(got_boxes[i])[v], wb, rtol=1e-3, atol=5e-3)


def test_rpn_block_select_matches_exact(rng):
    """Throughput-mode RPN per-level selection (lane-block top-k on big
    levels) must reproduce the exact lax.top_k proposals when no block
    overflows (overflow is counted exactly and surfaced)."""
    from videotofaces_tpu import config

    canvas = (96, 128)
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    b = 2
    regs, logs = [], []
    for p in priors:
        d = p.shape[0]
        regs.append(rng.normal(0, 0.2, size=(b, d, 4)).astype(np.float32))
        logs.append(rng.normal(-1, 1.5, size=(b, d)).astype(np.float32))
    used = np.asarray([[90.0, 128.0], [96.0, 120.0]], np.float32)
    args = ([jnp.asarray(r) for r in regs], [jnp.asarray(l) for l in logs],
            [jnp.asarray(p) for p in priors], jnp.asarray(used))

    with config.precision_scope("highest"):
        want_b, want_v, _ = R.rpn_proposals(*args, lvtop=64, out_top=48)
    with config.precision_scope("default"):
        got_b, got_v, overflow = R.rpn_proposals(*args, lvtop=64, out_top=48)
    assert int(np.asarray(overflow).max()) == 0
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    v = np.asarray(want_v)
    np.testing.assert_allclose(np.asarray(got_b)[v], np.asarray(want_b)[v],
                               rtol=1e-5, atol=1e-4)


def test_rpn_block_select_saturated_logits_match_exact(rng):
    """Regression: throughput-mode selection keys on RAW logits. Keying on
    sigmoid(logit) saturates every logit above ~17 to exactly 1.0 in f32,
    so distinct easy positives became index-order ties and the fast path
    re-ranked (and mis-suppressed) them relative to parity. Plant many
    saturating logits with DESCENDING values at ascending indices so a
    tie-broken-by-index pick would invert the order."""
    from videotofaces_tpu import config

    canvas = (96, 128)
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    b = 2
    regs, logs = [], []
    for p in priors:
        d = p.shape[0]
        regs.append(rng.normal(0, 0.2, size=(b, d, 4)).astype(np.float32))
        lg = rng.normal(-1, 1.5, size=(b, d)).astype(np.float32)
        n_hot = min(40, d // 2)
        # spread saturating logits across lane blocks, strongest at the
        # LARGEST index: index-tie-break would pick the weakest first
        pos = np.linspace(0, d - 1, n_hot).astype(np.int64)
        lg[:, pos] = 18.0 + np.arange(n_hot, dtype=np.float32)[None, :]
        logs.append(lg)
    used = np.asarray([[90.0, 128.0], [96.0, 120.0]], np.float32)
    args = ([jnp.asarray(r) for r in regs], [jnp.asarray(l) for l in logs],
            [jnp.asarray(p) for p in priors], jnp.asarray(used))

    with config.precision_scope("highest"):
        want_b, want_v, _ = R.rpn_proposals(*args, lvtop=64, out_top=48)
    with config.precision_scope("default"):
        got_b, got_v, overflow = R.rpn_proposals(*args, lvtop=64, out_top=48)
    assert int(np.asarray(overflow).max()) == 0
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    v = np.asarray(want_v)
    np.testing.assert_allclose(np.asarray(got_b)[v], np.asarray(want_b)[v],
                               rtol=1e-5, atol=1e-4)


def test_frcnn_full_forward_smoke(rng):
    from videotofaces_tpu.models.wrappers import FrcnnDetector

    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    params = {
        "body": body.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))["params"],
        "head": head.init(jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))["params"],
    }
    det = FrcnnDetector(params=params, resize_spec=(64, 96))
    frames = [rng.integers(0, 255, size=(48, 72, 3)).astype(np.uint8) for _ in range(2)]
    b, s, c = det(frames)
    assert len(b) == 2 and all(x.shape[1] == 4 for x in b)


def test_frcnn_full_forward_pallas_roi_close_to_dense(rng):
    """full_forward(roi_method='pallas-interpret') agrees with the dense
    RoIAlign path on the same params/frames (f32 stack in interpret mode;
    differences are weight-accumulation-order level)."""
    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    params = {
        "body": body.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))["params"],
        "head": head.init(jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))["params"],
    }
    frames = jnp.asarray(rng.integers(0, 255, size=(2, 64, 96, 3)).astype(np.uint8))
    canvas = (64, 96)
    priors = [jnp.asarray(p) for p in get_priors(canvas, R.frcnn_bases(),
                                                 loc="corner", concat=False)]
    kw = dict(resized_hw=(64, 96), canvas_hw=canvas, priors_per_level=priors,
              proposal_cap=64, out_top=20)
    ref = R.full_forward(params, frames, **kw)
    got = R.full_forward(params, frames, roi_method="pallas-interpret", **kw)
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-3, atol=1e-3)


def test_rcnn_spec_structure():
    from videotofaces_tpu.utils import weights as W

    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    bp = body.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))["params"]
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))["params"]
    body_spec, head_spec = R.torch_spec()

    def paths_of(spec):
        out = set()
        for el in spec:
            kind, path = el[0], el[1]
            if kind == "conv":
                out.add(f"{path}/kernel")
                if el[2]:
                    out.add(f"{path}/bias")
            elif kind == "bn":
                out |= {f"{path}/{s}" for s in ("scale", "bias", "mean", "var")}
            elif kind in ("linear", "linear_reshaped"):
                out.add(f"{path}/kernel")
                if el[-1]:
                    out.add(f"{path}/bias")
        return out

    assert paths_of(body_spec) == set(W.flatten(jax.tree.map(np.asarray, bp)))
    assert paths_of(head_spec) == set(W.flatten(jax.tree.map(np.asarray, hp)))


def test_rpn_two_pass_nms_exact_when_levels_fit(rng):
    """Throughput-mode two-pass NMS (lvtop > 256 engages it) must reproduce
    the parity-mode full NMS when every level has <= 256 candidates — the
    dropped-tail approximation only ever touches ranks >= 256."""
    from videotofaces_tpu import config

    canvas = (32, 32)  # P2 at stride 4: 8*8*3 = 192 anchors < 256
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    b = 2
    regs, logs = [], []
    for p in priors:
        d = p.shape[0]
        assert d <= 256
        regs.append(rng.normal(0, 0.2, size=(b, d, 4)).astype(np.float32))
        logs.append(rng.normal(-1, 1.5, size=(b, d)).astype(np.float32))
    used = np.asarray([[32.0, 32.0], [30.0, 28.0]], np.float32)
    args = ([jnp.asarray(r) for r in regs], [jnp.asarray(l) for l in logs],
            [jnp.asarray(p) for p in priors], jnp.asarray(used))

    with config.precision_scope("highest"):
        want_b, want_v, _ = R.rpn_proposals(*args, lvtop=300, out_top=200)
    with config.precision_scope("default"):
        got_b, got_v, overflow = R.rpn_proposals(*args, lvtop=300, out_top=200)
    assert int(np.asarray(overflow).max()) == 0
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    v = np.asarray(want_v)
    np.testing.assert_allclose(np.asarray(got_b)[v], np.asarray(want_b)[v],
                               rtol=1e-5, atol=1e-4)


def test_rpn_two_pass_nms_counts_displacement():
    """When a level holds more than 256 disjoint (never-suppressed)
    candidates, the two-pass NMS drops the tail and must count EVERY dropped
    valid candidate as displacement risk (output not full -> all dropped
    would have been appended)."""
    from videotofaces_tpu import config

    n = 400
    # disjoint 8x8 boxes on a 20-pitch grid: NMS never suppresses anything
    g = int(np.ceil(np.sqrt(n)))
    cx = (np.arange(n) % g) * 20.0 + 10.0
    cy = (np.arange(n) // g) * 20.0 + 10.0
    priors = [np.stack([cx, cy, np.full(n, 8.0), np.full(n, 8.0)],
                       axis=1).astype(np.float32)]
    regs = [jnp.zeros((1, n, 4), jnp.float32)]
    logs = [jnp.asarray(np.linspace(3.0, 1.0, n, dtype=np.float32))[None]]
    used = jnp.asarray([[1e4, 1e4]], jnp.float32)

    with config.precision_scope("default"):
        _, out_valid, overflow = R.rpn_proposals(
            regs, logs, priors, used, lvtop=n, out_top=n)
    assert int(np.asarray(out_valid).sum()) == 256   # exact head kept
    assert int(np.asarray(overflow)[0]) == n - 256   # every dropped counted

    with config.precision_scope("highest"):
        _, want_v, want_of = R.rpn_proposals(
            regs, logs, priors, used, lvtop=n, out_top=n)
    assert int(np.asarray(want_v).sum()) == n
    assert int(np.asarray(want_of)[0]) == 0
