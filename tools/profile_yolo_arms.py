"""Interleaved on-chip A/B of the round-4 YOLO formulation arms
(batch-8 1080p bf16, queued-amortized, detection-set equality checked):

  base      s2d stem, separate resize + pack, full-capacity NMS (round-3)
  bnms      base + bucketed presorted NMS (cond on batch-max valid count)
  fres      + fused resize->s2d (ops/resize.py::bilinear_resize_matmul_s2d)
  fres+pd1  + PackedDown stage1_down
  fres+pd12 + PackedDown stage1+2_down

Usage: python tools/profile_yolo_arms.py [batch] [h] [w] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402
from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import yolo as Y  # noqa: E402

ARMS = {
    "fres": dict(s2d=True, packed_downs=()),
    "fres+pd1": dict(s2d=True, packed_downs=(1,)),
    "fres+pd12": dict(s2d=True, packed_downs=(1, 2)),
}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    config.set_precision("default")
    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    priors, strides = jnp.asarray(priors), jnp.asarray(strides)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *canvas, 3)))["params"]
    for i in range(3):
        b = np.asarray(params["head"]["pred%d" % i]["bias"]).copy()
        b[4::6] -= 4.0
        params["head"]["pred%d" % i]["bias"] = jnp.asarray(b)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    # the 'base' arm reproduces the round-3 path: separate resize + in-stem
    # pack. The fused resize is what full_forward now does whenever s2d=True,
    # so base is reconstructed from the primitives.
    from videotofaces_tpu.ops.resize import bilinear_resize_matmul

    def make_base(nms_bucket):
        def base_fwd(p, f):
            x = bilinear_resize_matmul(f, (nh, nw), canvas_hw=canvas)
            x = (x[..., ::-1] / 255.0).astype(jnp.bfloat16)
            x = Y.s2d_stem(p["backbone"], x)
            maps = Y.YOLOv3(1, from_stage0=True).apply({"params": p}, x)
            maps = [t.astype(jnp.float32) for t in maps]
            b_, s_, c_, v_, o_ = Y.postprocess(maps, priors, strides, 1,
                                               out_topk=100,
                                               nms_bucket=nms_bucket)
            scale = jnp.asarray([w / nw, h / nh, w / nw, h / nh], jnp.float32)
            return b_ * scale, s_, c_, v_, o_
        return base_fwd

    fns = {"base": jax.jit(make_base(None)), "bnms": jax.jit(make_base(256))}
    for name, kw in ARMS.items():

        def fwd(p, f, kw=kw):
            return Y.full_forward(p, f, (nh, nw), canvas, priors, strides,
                                  compute_dtype=jnp.bfloat16, **kw)

        fns[name] = jax.jit(fwd)

    for name, fn in fns.items():
        _sync(fn(params, frames))
        _sync(fn(params, frames))

    ref = jax.device_get(fns["base"](params, frames))
    for name, fn in fns.items():
        got = jax.device_get(fn(params, frames))
        same_valid = bool(np.array_equal(ref[3], got[3]))
        worst = 0.0
        for i in range(batch):
            rb = np.asarray(sorted(map(tuple, ref[0][i][ref[3][i]])))
            gb = np.asarray(sorted(map(tuple, got[0][i][got[3][i]])))
            if len(rb) and len(rb) == len(gb):
                worst = max(worst, float(np.abs(rb - gb).max()))
            elif len(rb) != len(gb):
                worst = float("inf")
        print("%-10s: same valid set = %s, max sorted-box delta = %.2e"
              % (name, same_valid, worst))

    def reduced(fn):
        return lambda p, f: sum(jnp.sum(t.astype(jnp.float32)) for t in fn(p, f)[:4])

    timed = {k: jax.jit(reduced(fn)) for k, fn in fns.items()}
    for fn in timed.values():
        _sync(fn(params, frames))
    queue = 10
    times = {k: [] for k in timed}
    for _ in range(iters):
        for k, fn in timed.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(queue):
                out = fn(params, frames)
            _sync(out)
            times[k].append((time.perf_counter() - t0) * 1000 / queue)
    for k, ts in times.items():
        print("%-10s: median %7.2f ms/batch-%d queued-amortized (all: %s)"
              % (k, float(np.median(ts)), batch,
                 " ".join("%.1f" % t for t in ts)))


if __name__ == "__main__":
    main()
