"""Bisect / micro-A/B the channel-major PNet formulation on the real chip.

The full chw cascade crashed the axon TPU worker on first contact; this tool
compiles one piece at a time (run each mode in its OWN process — a worker
crash poisons the runtime) to find the faulting op and to measure the
surviving formulation against the module path.

Modes:
  pool     CHW integral image + largest-level chw pyramid pool
  conv1dot pool + conv1 as shifted-slice [27, 10] einsum
  conv1fma pool + conv1 as 27 broadcast FMAs
  pool1    conv1fma + strided-slice ceil maxpool
  conv2    pool1 + conv2 einsum (K=90)
  net      whole pnet_chw on the largest level (conv1_mode from argv)
  pyr      whole pnet_chw over the full pyramid
  module   module-path PNet over the full pyramid (baseline)

Usage: python tools/profile_pnet_chw.py MODE [conv1_mode] [batch h w minsize]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.resize import (adaptive_pool_full,  # noqa: E402
                                         adaptive_pool_full_chw,
                                         integral_image, integral_image_chw)


def main():
    mode = sys.argv[1]
    conv1_mode = sys.argv[2] if len(sys.argv) > 2 else "dot"
    batch, h, w, minsize = (int(a) for a in (sys.argv[3:7] or [2, 1080, 1920, 5]))
    config.set_precision("default")
    params = M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    params["cls"]["bias"] = params["cls"]["bias"].at[1].add(-3.0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    scales, sizes = M.scale_pyramid(h, w, minsize)
    print("pyramid: %d levels, largest %s" % (len(scales), sizes[0]), flush=True)
    sh, sw = sizes[0]

    def level_chw(f):
        iic = integral_image_chw(f[..., ::-1])
        lv = M._normalize(adaptive_pool_full_chw(iic, (sh, sw), (h, w)))
        return lv.astype(jnp.bfloat16)

    def conv1(x, how):
        p = params
        k1 = p["conv1"]["conv"]["kernel"]
        b1 = p["conv1"]["conv"]["bias"]
        hv, wv = sh - 2, sw - 2
        if how == "fma":
            y = jnp.broadcast_to(b1[None, :, None, None], (batch, 10, hv, wv))
            for ky in range(3):
                for kx in range(3):
                    for ci in range(3):
                        y = y + (x[:, ci:ci + 1, ky:ky + hv, kx:kx + wv]
                                 * k1[ky, kx, ci][None, :, None, None])
        else:
            pat = jnp.concatenate([x[:, :, ky:ky + hv, kx:kx + wv]
                                   for ky in range(3) for kx in range(3)], axis=1)
            y = jnp.einsum("bkyx,ko->boyx", pat, k1.reshape(27, 10),
                           precision=config.get_precision()) + b1[None, :, None, None]
        al = p["conv1"]["prelu"]["alpha"][None, :, None, None]
        return jnp.maximum(y, 0) + al * jnp.minimum(y, 0)

    def pool(y):
        hv, wv = y.shape[2], y.shape[3]
        p1h, p1w = -(-hv // 2), -(-wv // 2)
        neg = jnp.asarray(-jnp.inf, y.dtype)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 2 * p1h - hv), (0, 2 * p1w - wv)),
                    constant_values=neg)
        return jnp.maximum(jnp.maximum(y[:, :, 0::2, 0::2], y[:, :, 0::2, 1::2]),
                           jnp.maximum(y[:, :, 1::2, 0::2], y[:, :, 1::2, 1::2]))

    def conv2(y):
        p = params
        oh, ow = y.shape[2] - 2, y.shape[3] - 2
        pat = jnp.concatenate([y[:, :, ky:ky + oh, kx:kx + ow]
                               for ky in range(3) for kx in range(3)], axis=1)
        out = jnp.einsum("bkyx,ko->boyx", pat,
                         p["conv2"]["conv"]["kernel"].reshape(90, 16),
                         precision=config.get_precision())
        return out + p["conv2"]["conv"]["bias"][None, :, None, None]

    fns = {
        "pool": lambda f: level_chw(f),
        "conv1dot": lambda f: conv1(level_chw(f), "dot"),
        "conv1fma": lambda f: conv1(level_chw(f), "fma"),
        "pool1": lambda f: pool(conv1(level_chw(f), "fma")),
        "conv2": lambda f: conv2(pool(conv1(level_chw(f), "fma"))),
        "net": lambda f: M.pnet_chw(params, level_chw(f), conv1_mode=conv1_mode),
    }
    if mode in fns:
        fn = jax.jit(lambda f: jax.tree.map(
            lambda t: jnp.sum(t.astype(jnp.float32)), fns[mode](f)))
    elif mode == "pyr":
        def pyr(f):
            iic = integral_image_chw(f[..., ::-1])
            outs = []
            cache = {}
            for (ph_, pw_) in sizes:
                lv = M._normalize(adaptive_pool_full_chw(iic, (ph_, pw_), (h, w)))
                reg, prob = M.pnet_chw(params, lv.astype(jnp.bfloat16),
                                       cache=cache, conv1_mode=conv1_mode)
                outs.append(reg.sum() + prob.sum())
            return sum(o.astype(jnp.float32) for o in outs)
        fn = jax.jit(pyr)
    elif mode == "module":
        def mod(f):
            ii = integral_image(f[..., ::-1])
            outs = []
            for (ph_, pw_) in sizes:
                lv = M._normalize(adaptive_pool_full(ii, (ph_, pw_), (h, w)))
                reg, prob = M.PNet().apply({"params": params},
                                           lv.astype(jnp.bfloat16))
                outs.append(reg.sum() + prob.sum())
            return sum(o.astype(jnp.float32) for o in outs)
        fn = jax.jit(mod)
    else:
        raise SystemExit("unknown mode %r" % mode)

    print("compiling", mode, flush=True)
    jax.device_get(fn(frames))
    print("compiled OK", flush=True)
    jax.device_get(fn(frames))
    q, rounds = 3, 3
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(q):
            out = fn(frames)
        jax.device_get(out)
        print("%s: %.2f ms" % (mode, (time.perf_counter() - t0) / q * 1000),
              flush=True)


if __name__ == "__main__":
    main()
