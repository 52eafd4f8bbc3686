"""Bisect the MTCNN graph cost on the real chip (1080p, min_face_size=5).

Stages (cumulative):
  A integral image + all pyramid-level adaptive pools
  B A + PNet forward on every level
  C full stage 1 (B + mask/top-k/per-scale NMS/cross-scale NMS)
  D full graph (C + stage2/3 crops + RNet/ONet + IoM NMS)

Usage: python tools/profile_mtcnn.py [batch] [height] [width] [minsize]
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
from videotofaces_tpu.ops.resize import adaptive_pool_full, integral_image  # noqa: E402


def main(batch=2, h=1080, w=1920, minsize=5, bf16=True):
    config.set_precision("default")
    dtype = jnp.bfloat16 if bf16 else None
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    # trained-like sparsity
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    scales, sizes = M.scale_pyramid(h, w, minsize)
    print("pyramid: %d levels, largest %s" % (len(scales), sizes[0]))

    def stage_a(params, f):
        ii = integral_image(f[..., ::-1])
        return [adaptive_pool_full(ii, s, (h, w)).sum() for s in sizes]

    def stage_b(params, f):
        ii = integral_image(f[..., ::-1])
        pnet = M.PNet()
        outs = []
        for (sh, sw) in sizes:
            level = M._normalize(adaptive_pool_full(ii, (sh, sw), (h, w)))
            if dtype is not None:
                level = level.astype(dtype)
            reg, prob = pnet.apply({"params": params["pnet"]}, level)
            outs.append(reg.sum() + prob.sum())
        return outs

    def stage_d(params, f):
        return M.full_forward(params, f, minsize=minsize, compute_dtype=dtype)

    stages = [("A:ii+pyramid", stage_a), ("B:+pnet", stage_b), ("D:full", stage_d)]
    for name, fn in stages:
        jfn = jax.jit(fn)
        _sync(jfn(params, frames))
        _sync(jfn(params, frames))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = jfn(params, frames)
        _sync(out)  # device_get = true barrier (axon block_until_ready is not)
        print("%-14s %8.2f ms/batch-%d" % (name, (time.perf_counter() - t0) / iters * 1000,
                                           batch))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
