"""Bisect the Faster R-CNN graph cost on the real chip (docs/ROADMAP.md plan).

Times cumulative prefixes of the pipeline so the expensive stage is exposed:
  A resize+norm+backbone+FPN+RPN heads
  B A + rpn_proposals (per-level top-k, decode, NMS fixpoint, cap)
  C B + RoIAlign
  D C + RoI head (2xFC)
  E full graph (D + final decode/NMS/topk)

Usage: python tools/profile_rcnn.py [batch] [height] [width]
Optionally set V2F_PROFILE_DIR to also dump a jax.profiler trace of E.
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
from videotofaces_tpu.ops.resize import bilinear_resize_matmul  # noqa: E402


def build(batch=2, h=720, w=1280, bf16=True):
    config.set_precision("default")
    dtype = jnp.bfloat16 if bf16 else None
    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    priors = [jnp.asarray(p) for p in
              get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)]
    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    bparams = jax.jit(body.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    hparams = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))["params"]
    params = {"body": bparams, "head": hparams}
    if bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    def pre_and_body(params, f):
        x = f[..., ::-1].astype(jnp.float32)
        x = bilinear_resize_matmul(x, (nh, nw))
        x = (x - jnp.asarray(R.IMAGENET_MEAN)) / jnp.asarray(R.IMAGENET_STD)
        x = jnp.pad(x, ((0, 0), (0, canvas[0] - nh), (0, canvas[1] - nw), (0, 0)))
        if dtype is not None:
            x = x.astype(dtype)
        pyramid, regs, logs = R.FasterRCNN(1).apply({"params": params["body"]}, x)
        return pyramid, [t.astype(jnp.float32) for t in regs], \
            [t.astype(jnp.float32) for t in logs]

    used = jnp.tile(jnp.asarray([[nh, nw]], jnp.float32), (batch, 1))

    def stage_a(params, f):
        pyramid, regs, logs = pre_and_body(params, f)
        return [p.sum() for p in pyramid], [r.sum() for r in regs]

    def stage_b(params, f):
        pyramid, regs, logs = pre_and_body(params, f)
        props, pvalid, _ = R.rpn_proposals(regs, logs, priors, used)
        return props.sum(), pvalid.sum()

    def stage_c(params, f):
        from videotofaces_tpu.ops.roi_align import roi_align_multilevel

        pyramid, regs, logs = pre_and_body(params, f)
        props, pvalid, _ = R.rpn_proposals(regs, logs, priors, used)
        roi = jax.vmap(lambda bx, f0, f1, f2, f3: roi_align_multilevel(
            [f0, f1, f2, f3], bx, R.STRIDES[:4]))(props, *pyramid[:4])
        return roi.sum()

    def stage_d(params, f):
        from videotofaces_tpu.ops.roi_align import roi_align_multilevel

        pyramid, regs, logs = pre_and_body(params, f)
        props, pvalid, _ = R.rpn_proposals(regs, logs, priors, used)
        roi = jax.vmap(lambda bx, f0, f1, f2, f3: roi_align_multilevel(
            [f0, f1, f2, f3], bx, R.STRIDES[:4]))(props, *pyramid[:4])
        b, r = roi.shape[:2]
        rm = roi.reshape(b * r, *roi.shape[2:])
        if dtype is not None:
            rm = rm.astype(dtype)
        reg, cls = R.RoIHead(1).apply({"params": params["head"]}, rm)
        return reg.sum(), cls.sum()

    def stage_e(params, f):
        return R.full_forward(params, f, (nh, nw), canvas, priors,
                              compute_dtype=dtype)

    return params, frames, {"A:body+rpnhead": stage_a, "B:+proposals": stage_b,
                            "C:+roialign": stage_c, "D:+roihead": stage_d,
                            "E:full": stage_e}


def timeit(fn, params, frames, iters=10):
    jfn = jax.jit(fn)
    _sync(jfn(params, frames))
    _sync(jfn(params, frames))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(params, frames)
    _sync(out)  # device_get forces true completion (block_until_ready is NOT
    # a reliable barrier on the axon tunnel backend; see docs/ROADMAP.md)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    params, frames, stages = build(batch, h, w)
    prev = 0.0
    for name, fn in stages.items():
        ms = timeit(fn, params, frames)
        print("%-16s %8.2f ms/batch-%d   (delta %+7.2f ms)" % (name, ms, batch, ms - prev))
        prev = ms

    import os

    tdir = os.environ.get("V2F_PROFILE_DIR")
    if tdir:
        from videotofaces_tpu.utils.profiling import trace

        with trace(tdir):
            jfn = jax.jit(stages["E:full"])
            for _ in range(3):
                jax.block_until_ready(jfn(params, frames))


if __name__ == "__main__":
    main()
