"""Finer bisection of the RPN proposal stage on the real chip.

Stages (cumulative, on random head outputs so the backbone isn't timed):
  S1 per-level top-k (lax.top_k) + payload gather + decode
  S1b same but with ops.select.block_topk_select
  S2 S1 + clamp/small-mask
  S3 S2 + per-(image x level) NMS fixpoint
  S4 S3 + final top-1000 cap  (== rpn_proposals)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import rcnn as R  # noqa: E402
from videotofaces_tpu.ops.anchors import get_priors  # noqa: E402
from videotofaces_tpu.ops.boxes import clamp_to_canvas, decode_boxes, small_boxes_mask  # noqa: E402
from videotofaces_tpu.ops.nms import nms_keep_mask, topk_by_score  # noqa: E402
from videotofaces_tpu.ops.select import block_topk_select  # noqa: E402


def main(batch=2, h=720, w=1280):
    config.set_precision("default")
    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    rng = np.random.default_rng(0)
    regs, logs = [], []
    for p in priors:
        d = p.shape[0]
        regs.append(jnp.asarray(rng.normal(0, 0.3, size=(batch, d, 4)).astype(np.float32)))
        logs.append(jnp.asarray(rng.normal(-4, 1.2, size=(batch, d)).astype(np.float32)))
    jpriors = [jnp.asarray(p) for p in priors]
    used = jnp.tile(jnp.asarray([[nh, nw]], jnp.float32), (batch, 1))
    lvtop = 1000

    def sel_topk(regs, logs):
        out = []
        for reg, log, pri in zip(regs, logs, jpriors):
            k = min(lvtop, log.shape[1])
            vals, idx = jax.lax.top_k(log, k)
            sel_reg = jnp.take_along_axis(reg, idx[..., None], axis=1)
            sel_pri = pri[idx]
            out.append((decode_boxes(sel_reg, sel_pri), vals))
        return out

    def sel_block(regs, logs):
        out = []
        for reg, log, pri in zip(regs, logs, jpriors):
            k = min(lvtop, log.shape[1])
            payload = jnp.concatenate(
                [reg, jnp.broadcast_to(pri[None], (batch,) + pri.shape)], axis=-1)
            # raw-logit key + overflow_floor=-inf, matching production
            # (models/rcnn.py::rpn_proposals throughput branch)
            vals, sel, _of = block_topk_select(log, payload, k, per_block=8,
                                               overflow_floor=-jnp.inf)
            out.append((decode_boxes(sel[..., :4], sel[..., 4:8]), vals))
        return out

    def s1(regs, logs):
        return [b.sum() + v.sum() for b, v in sel_topk(regs, logs)]

    def s1b(regs, logs):
        return [b.sum() + v.sum() for b, v in sel_block(regs, logs)]

    def _stack(sel_fn, regs, logs):
        parts = sel_fn(regs, logs)
        boxes = jnp.stack([jnp.pad(b, ((0, 0), (0, lvtop - b.shape[1]), (0, 0)))
                           for b, _ in parts], axis=1)
        vals = jnp.stack([jnp.pad(v, ((0, 0), (0, lvtop - v.shape[1])),
                                  constant_values=-jnp.inf) for _, v in parts], axis=1)
        valid = jnp.isfinite(vals)
        boxes = clamp_to_canvas(boxes, used[:, None, None, :])
        valid = valid & small_boxes_mask(boxes, 0.0)
        return boxes, jax.nn.sigmoid(vals), valid

    def s2(regs, logs):
        boxes, obj, valid = _stack(sel_topk, regs, logs)
        return boxes.sum(), obj.sum(), valid.sum()

    def s3(regs, logs, sel_fn=sel_topk):
        boxes, obj, valid = _stack(sel_fn, regs, logs)
        b, nl = boxes.shape[:2]
        flat = lambda a: a.reshape((b * nl,) + a.shape[2:])
        keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(bb, ss, vv, 0.7))(
            flat(boxes), flat(obj), flat(valid))
        return keep.sum()

    def s4(regs, logs):
        props, pvalid, _ = R.rpn_proposals(regs, logs, jpriors, used)
        return props.sum(), pvalid.sum()

    def s4b(regs, logs):
        boxes, obj, valid = _stack(sel_block, regs, logs)
        b, nl = boxes.shape[:2]
        flat = lambda a: a.reshape((b * nl,) + a.shape[2:])
        keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(bb, ss, vv, 0.7))(
            flat(boxes), flat(obj), flat(valid))
        keep = keep.reshape(b, nl * lvtop)
        obj2 = obj.reshape(b, nl * lvtop)
        boxes2 = boxes.reshape(b, nl * lvtop, 4)
        idx, ov = jax.vmap(lambda ss, kk: topk_by_score(ss, kk, lvtop))(obj2, keep)
        return jnp.take_along_axis(boxes2, idx[..., None], axis=1).sum(), ov.sum()

    def s3c(regs, logs, t=256):
        # two-pass candidate: NMS only the per-level top-t (slots are already
        # score-descending), drop ranks >= t with a counted displacement risk
        boxes, obj, valid = _stack(sel_topk, regs, logs)
        b, nl = boxes.shape[:2]
        flat = lambda a: a.reshape((b * nl,) + a.shape[2:])
        keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(
            bb, ss, vv, 0.7, presorted=True))(
            flat(boxes)[:, :t], flat(obj)[:, :t], flat(valid)[:, :t])
        return keep.sum()

    def s4c(regs, logs, t=256):
        boxes, obj, valid = _stack(sel_topk, regs, logs)
        b, nl = boxes.shape[:2]
        flat = lambda a: a.reshape((b * nl,) + a.shape[2:])
        keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(
            bb, ss, vv, 0.7, presorted=True))(
            flat(boxes)[:, :t], flat(obj)[:, :t], flat(valid)[:, :t])
        keep = keep.reshape(b, nl, t)
        obj_c = obj[:, :, :t].reshape(b, nl * t)
        boxes_c = boxes[:, :, :t].reshape(b, nl * t, 4)
        idx, ov = jax.vmap(lambda ss, kk: topk_by_score(ss, kk, lvtop))(
            obj_c, keep.reshape(b, nl * t))
        sel = jnp.take_along_axis(obj_c, idx, axis=1)
        cutoff = jnp.min(jnp.where(ov, sel, jnp.inf), axis=1)      # [B]
        # displacement risk: valid rank>=t candidates scoring above cutoff
        risk = jnp.sum((obj[:, :, t:] > cutoff[:, None, None])
                       & valid[:, :, t:], axis=(1, 2))
        return jnp.take_along_axis(boxes_c, idx[..., None], axis=1).sum(), risk

    for name, fn in [("S1:topk+decode", s1), ("S1b:block-select", s1b),
                     ("S2:+clamp", s2), ("S3:+nms", s3),
                     ("S3b:block+nms", lambda r, l: s3(r, l, sel_block)),
                     ("S3c:+nms@256", s3c),
                     ("S4:full(topk)", s4), ("S4b:full(block)", s4b),
                     ("S4c:full(2pass)", s4c)]:
        jfn = jax.jit(fn)
        _sync(jfn(regs, logs))
        _sync(jfn(regs, logs))
        t0 = time.perf_counter()
        for _ in range(20):
            out = jfn(regs, logs)
        _sync(out)  # device_get = true barrier (axon block_until_ready is not)
        print("%-18s %8.2f ms" % (name, (time.perf_counter() - t0) / 20 * 1000))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
