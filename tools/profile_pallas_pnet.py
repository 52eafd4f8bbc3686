"""Measure the fused Pallas PNet kernel (ops/pallas_pnet.py) on the real chip.

Run each mode in its OWN process (a Mosaic fault poisons the axon worker):

  level0   kernel alone on the largest pyramid level (pool included)
  pool0    the phase pyramid pool alone on the largest level (no kernel)
  pool0mm  the gather-free mm phase pool alone on the largest level
  pyr      chw pyramid pool + kernel over ALL levels
  pyrmm    mm phase pool (gather fallback off-regime) + kernel, ALL levels
  full     full_forward with pnet_stem='pallas' (pallas_pool default)
  fullg    full_forward with pnet_stem='pallas', pallas_pool='gather'
  ab       INTERLEAVED full mm-pool vs gather-pool (one process, the only
           trustworthy form for <2 ms deltas on the shared chip)
  module   module-path full_forward baseline (same settings)

Usage: python tools/profile_pallas_pnet.py MODE [to] [batch h w minsize]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.pallas_pnet import (pack_pnet_weights,  # noqa: E402
                                              pnet_level)
from videotofaces_tpu.ops.resize import (  # noqa: E402
    adaptive_pool_full_chw_phase, adaptive_pool_full_chw_phase_mm,
    integral_image_chw, pool_windows_le2)


def main():
    mode = sys.argv[1]
    to = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch, h, w, minsize = (int(a) for a in (sys.argv[3:7] or [2, 1080, 1920, 5]))
    config.set_precision("default")
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    scales, sizes = M.scale_pyramid(h, w, minsize)
    print("pyramid: %d levels, largest %s" % (len(scales), sizes[0]), flush=True)
    packed = pack_pnet_weights(params["pnet"], jnp.bfloat16)
    lvls = sizes if mode in ("pyr", "pyrmm") else sizes[:1]

    if mode in ("level0", "pool0", "pool0mm", "pyr", "pyrmm"):
        use_mm = mode in ("pool0mm", "pyrmm")

        def fn(p, f):
            iic = integral_image_chw(f[..., ::-1])
            fn_chw = jnp.transpose(M._normalize(
                f[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2)).astype(jnp.bfloat16)
            outs = []
            for (sh, sw) in lvls:
                if use_mm and pool_windows_le2((sh, sw), (h, w)):
                    lv = adaptive_pool_full_chw_phase_mm(fn_chw, (sh, sw), (h, w))
                else:
                    lv = M._normalize(
                        adaptive_pool_full_chw_phase(iic, (sh, sw), (h, w)))
                if mode in ("pool0", "pool0mm"):
                    outs.append(lv.astype(jnp.float32).sum())
                    continue
                reg, prob = pnet_level(p, lv.astype(jnp.bfloat16), (sh, sw), to=to)
                outs.append(reg.astype(jnp.float32).sum() + prob.sum())
            return sum(outs)
        jfns = {mode: jax.jit(fn)}
        arg = packed
    elif mode in ("full", "fullg", "fullf", "module", "ab", "ab2"):
        def mk(stem, pool, impl=None):
            return jax.jit(lambda p, f: M.full_forward(
                p, f, minsize=minsize, compute_dtype=jnp.bfloat16,
                pnet_stem=stem, pallas_pool=pool, pnet_impl=impl))
        if mode == "ab":
            jfns = {"full:mm": mk("pallas", "mm"),
                    "full:gather": mk("pallas", "gather")}
        elif mode == "ab2":
            # round-5 arm matrix: pool (mm vs fused-in-kernel) x dot
            # blocking (r1 vs r4), interleaved in one process
            jfns = {"full:mm+r1": mk("pallas", "mm", "r1"),
                    "full:mm+r4": mk("pallas", "mm", "r4"),
                    "full:fused+r1": mk("pallas", "fused", "r1"),
                    "full:fused+r4": mk("pallas", "fused", "r4")}
        elif mode == "module":
            jfns = {mode: mk("module", None)}
        elif mode == "fullf":
            jfns = {mode: mk("pallas", "fused", "r4")}
        else:
            jfns = {mode: mk("pallas", "gather" if mode == "fullg" else "mm")}
        arg = params
    else:
        raise SystemExit("unknown mode %r" % mode)

    for name, jfn in jfns.items():
        print("compiling", name, flush=True)
        jax.device_get(jfn(arg, frames))
        print("compiled OK", flush=True)
        jax.device_get(jfn(arg, frames))
    q, rounds = 3, (5 if mode == "ab" else 3)
    for _ in range(rounds):
        for name, jfn in jfns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(q):
                out = jfn(arg, frames)
            jax.device_get(out)
            print("%s(to=%d): %.2f ms"
                  % (name, to, (time.perf_counter() - t0) / q * 1000), flush=True)


if __name__ == "__main__":
    main()
