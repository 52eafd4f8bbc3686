"""Bisect MTCNN's stage-1-postprocess + stages-2/3 cost (the +75 ms block
after PNet in tools/profile_mtcnn.py) on the real chip.

Cumulative stages (all include the pyramid + PNet forward):
  C   full stage 1 (per-scale select/NMS + cross-scale NMS + refine/square)
  D1  C + stage-2 crop windows + integral-image 24x24 resample
  D2  D1 + RNet forward
  D3  D2 + stage-2 NMS + top-k + refine/square
  D4  D3 + stage-3 crops (48x48 resample)
  D5  D4 + ONet forward
  D6  full graph (landmarks + IoM chain NMS + final top-k)

Usage: python tools/profile_mtcnn23.py [batch] [h] [w] [minsize]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402
from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.resize import (adaptive_pool_boxes_batched,  # noqa: E402
                                         adaptive_pool_full, integral_image)
from videotofaces_tpu.ops.select import block_topk_select  # noqa: E402


def build_stage_fns(b, h, w, minsize, caps, dtype):
    """Re-create full_forward's phases as cumulative closures (profiling
    mirror of models/mtcnn.py full_forward; keep in sync when editing it)."""
    t1, t2, t3 = 0.6, 0.7, 0.7
    scales, sizes = M.scale_pyramid(h, w, minsize)

    def stage1(params, f):
        ii = integral_image(f[..., ::-1])
        pnet = M.PNet()
        s_boxes, s_scores, s_preds, s_valid = [], [], [], []
        for sc, (sh, sw) in zip(scales, sizes):
            level = M._normalize(adaptive_pool_full(ii, (sh, sw), (h, w)))
            if dtype is not None:
                level = level.astype(dtype)
            reg, prob = pnet.apply({"params": params["pnet"]}, level)
            reg, prob = reg.astype(jnp.float32), prob.astype(jnp.float32)
            ph, pw = prob.shape[1:3]
            d = ph * pw
            flat_prob = prob.reshape(b, d)
            masked = jnp.where(flat_prob >= t1, flat_prob, 0.0)
            k1 = min(caps.pre1, d)
            if d > 4 * k1:
                payload = jnp.concatenate(
                    [reg.reshape(b, d, 4),
                     jnp.broadcast_to(jnp.arange(d, dtype=jnp.float32)[None, :, None],
                                      (b, d, 1))], axis=-1)
                scores, sel, _ = block_topk_select(masked, payload, k1, per_block=4)
                preds = sel[..., :4]
                idx = sel[..., 4].astype(jnp.int32)
                scores = jnp.maximum(scores, 0.0)
            else:
                scores, idx = jax.lax.top_k(masked, k1)
                preds = jnp.take_along_axis(reg.reshape(b, d, 4), idx[..., None], axis=1)
            valid = scores >= t1
            wi = (idx % pw).astype(jnp.float32)
            hi = (idx // pw).astype(jnp.float32)
            boxes = jnp.stack([
                jnp.floor((2.0 * wi + 1.0) / sc), jnp.floor((2.0 * hi + 1.0) / sc),
                jnp.floor((2.0 * wi + 12.0) / sc), jnp.floor((2.0 * hi + 12.0) / sc),
            ], axis=-1)
            keep = M._per_image_nms(boxes, scores, valid, 0.5)
            v, boxes, scores, preds = M._select_topk(scores, keep,
                                                     min(caps.post1, k1),
                                                     boxes, scores, preds)
            s_boxes.append(boxes)
            s_scores.append(scores)
            s_preds.append(preds)
            s_valid.append(v)
        boxes = jnp.concatenate(s_boxes, axis=1)
        scores = jnp.concatenate(s_scores, axis=1)
        preds = jnp.concatenate(s_preds, axis=1)
        valid = jnp.concatenate(s_valid, axis=1)
        if boxes.shape[1] > caps.cross:
            valid, boxes, scores, preds = M._select_topk(
                jnp.where(valid, scores, -jnp.inf), valid, caps.cross,
                boxes, scores, preds)
        keep = M._per_image_nms(boxes, scores, valid, 0.7)
        valid, boxes, scores, preds = M._select_topk(
            scores, keep, min(caps.stage2, boxes.shape[1]), boxes, scores, preds)
        boxes = M.square_bbox(M.refine_bbox(boxes, preds, plus_one=False))
        return ii, boxes, scores, valid

    def crops_for(ii, boxes, size):
        k = boxes.shape[1]
        win, ok = M._crop_windows(boxes.reshape(b * k, 4), (h, w))
        imgidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        crops = M._normalize(adaptive_pool_boxes_batched(ii, win, imgidx, (size, size)))
        return (crops.astype(dtype) if dtype is not None else crops), ok

    def d1(params, f):
        ii, boxes, scores, valid = stage1(params, f)
        crops, ok = crops_for(ii, boxes, 24)
        return crops.sum(), ok.sum()

    def d2(params, f):
        ii, boxes, scores, valid = stage1(params, f)
        crops, ok = crops_for(ii, boxes, 24)
        reg2, prob2 = M.RNet().apply({"params": params["rnet"]}, crops)
        return reg2.astype(jnp.float32).sum(), prob2.astype(jnp.float32).sum()

    def stage2(params, f):
        ii, boxes, scores, valid = stage1(params, f)
        crops, ok = crops_for(ii, boxes, 24)
        reg2, prob2 = (t.astype(jnp.float32)
                       for t in M.RNet().apply({"params": params["rnet"]}, crops))
        k2 = boxes.shape[1]
        scores = prob2.reshape(b, k2)
        valid = valid & ok.reshape(b, k2) & (scores > t2)
        keep = M._per_image_nms(boxes, scores, valid, 0.7)
        valid, boxes, scores, preds = M._select_topk(
            scores, keep, min(caps.stage3, k2), boxes, scores,
            reg2.reshape(b, k2, 4))
        boxes = M.square_bbox(M.refine_bbox(boxes, preds, plus_one=True))
        return ii, boxes, scores, valid

    def d3(params, f):
        _, boxes, scores, valid = stage2(params, f)
        return boxes.sum(), scores.sum(), valid.sum()

    def d4(params, f):
        ii, boxes, scores, valid = stage2(params, f)
        crops, ok = crops_for(ii, boxes, 48)
        return crops.sum(), ok.sum()

    def d5(params, f):
        ii, boxes, scores, valid = stage2(params, f)
        crops, ok = crops_for(ii, boxes, 48)
        out = M.ONet().apply({"params": params["onet"]}, crops)
        return tuple(t.astype(jnp.float32).sum() for t in out)

    def d6(params, f):
        out = M.full_forward(params, f, minsize, caps, compute_dtype=dtype)
        return tuple(jnp.sum(t.astype(jnp.float32)) for t in out[:4])

    def c_only(params, f):
        ii, boxes, scores, valid = stage1(params, f)
        return boxes.sum(), scores.sum(), valid.sum()

    return {"C  stage1 full": c_only, "D1 +s2 crops": d1, "D2 +RNet": d2,
            "D3 +s2 nms/refine": d3, "D4 +s3 crops": d4, "D5 +ONet": d5,
            "D6 full": d6}


def timeit(fn, params, frames, iters=5):
    def reduced(p, f):
        out = fn(p, f)
        return sum(jnp.sum(jnp.asarray(t, jnp.float32)) for t in jax.tree.leaves(out))

    g = jax.jit(reduced)
    _sync(g(params, frames))
    _sync(g(params, frames))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = g(params, frames)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    minsize = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    config.set_precision("default")
    caps = M.Caps()
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    prev = 0.0
    for name, fn in build_stage_fns(batch, h, w, minsize, caps,
                                    jnp.bfloat16).items():
        t = timeit(fn, params, frames)
        print("%-20s: %8.2f ms/batch-%d  (delta %+7.2f)" % (name, t, batch, t - prev))
        prev = t


if __name__ == "__main__":
    main()
