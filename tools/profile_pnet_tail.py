"""Interleaved on-chip A/B: MTCNN full forward with the module PNet tail vs
the space-to-depth-2 packed tail (models/mtcnn.py::pnet_s2d_tail), batch-2
1080p min_face_size=5 bf16 (the reference pipeline default config), plus the
PNet-only stage cost for both.

Queued-amortized timing: blocks of Q steps with one device_get sync per
block (a per-step sync pays the ~40 ms tunnel round trip).

Usage: python tools/profile_pnet_tail.py [batch] [h] [w] [minsize] [rounds] [arms]
  arms: comma list like "mod+mod,pac+s2d" (default: all six stem+tail combos)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.resize import adaptive_pool_full, integral_image  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    minsize = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    q = 3
    config.set_precision("default")
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():  # trained-like sparsity
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    # PRODUCTION trim: the wrapper casts params to bf16 in throughput mode —
    # f32 params + bf16 activations promote every conv back to f32 (and
    # materialize f32 full-res maps; the original 150 ms "module" figure in
    # this file's history was measured in that unrepresentative trim)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    scales, sizes = M.scale_pyramid(h, w, minsize)
    print("pyramid: %d levels, largest %s" % (len(scales), sizes[0]))

    from videotofaces_tpu.ops.resize import (adaptive_pool_full_s2d2,
                                             adaptive_pool_full_s2d4)

    def pnet_only(stem, tail):
        def fn(p, f):
            ii = integral_image(f[..., ::-1])
            if stem == "chw":
                from videotofaces_tpu.ops.resize import (adaptive_pool_full_chw,
                                                         integral_image_chw)
                iic = integral_image_chw(f[..., ::-1])
                outs = []
                for (sh, sw) in sizes:
                    lv = M._normalize(adaptive_pool_full_chw(iic, (sh, sw), (h, w)))
                    mode = "fma" if tail == "fma" else "dot"
                    reg, prob = M.pnet_chw(p["pnet"], lv.astype(jnp.bfloat16),
                                           conv1_mode=mode)
                    outs.append(reg.sum() + prob.sum())
                return sum(o.astype(jnp.float32) for o in outs)
            outs = []
            for (sh, sw) in sizes:
                pq = None
                if stem == "s2d4":
                    packed4 = M._normalize(adaptive_pool_full_s2d4(ii, (sh, sw), (h, w)))
                    pool1, pq = M.pnet_s2d4_stem(p["pnet"], packed4.astype(jnp.bfloat16),
                                                 (sh, sw))
                elif stem == "packed":
                    packed = M._normalize(adaptive_pool_full_s2d2(ii, (sh, sw), (h, w)))
                    pool1 = M.pnet_s2d_head(p["pnet"], packed.astype(jnp.bfloat16),
                                            packed_hw=(sh, sw))
                else:
                    level = M._normalize(adaptive_pool_full(ii, (sh, sw), (h, w)))
                    level = level.astype(jnp.bfloat16)
                    if stem == "s2d":
                        pool1 = M.pnet_s2d_head(p["pnet"], level)
                    else:
                        pool1 = M.PNet(to_pool1=True).apply({"params": p["pnet"]}, level)
                if tail == "s2d":
                    reg, prob = M.pnet_s2d_tail(p["pnet"], pool1, packed_in_hw=pq)
                else:
                    reg, prob = M.PNet(from_pool1=True).apply({"params": p["pnet"]}, pool1)
                outs.append(reg.sum() + prob.sum())
            return sum(o.astype(jnp.float32) for o in outs)
        return fn

    def full(stem, tail):
        def fn(p, f):
            out = M.full_forward(p, f, minsize=minsize,
                                 compute_dtype=jnp.bfloat16,
                                 crop_engine="pallas", pnet_stem=stem,
                                 pnet_tail="chw" if stem == "chw" else tail)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(out[:4]))
        return fn

    want = sys.argv[6].split(",") if len(sys.argv) > 6 else None
    arms = {}
    # "chw+dot"/"chw+fma" select pnet_chw's conv1 mode; full_forward always
    # runs the measured-best mode baked into its chw branch
    for stem in ("module", "s2d", "packed", "s2d4", "chw"):
        for tail in ("module", "s2d", "dot", "fma"):
            if stem == "s2d4" and tail != "s2d":
                continue
            if (tail in ("dot", "fma")) != (stem == "chw"):
                continue
            key = "%s+%s" % ({"s2d4": "s2d4"}.get(stem, stem[:3]), tail[:3])
            for scope, builder in (("pnet", pnet_only), ("full", full)):
                name = "%s:%s" % (scope, key)
                # filter accepts either "pac+s2d" (both scopes) or an exact
                # "full:pac+s2d" (compiles are minutes each on axon)
                if want is not None and key not in want and name not in want:
                    continue
                arms[name] = jax.jit(builder(stem, tail))
    for name, fn in arms.items():
        jax.device_get(fn(params, frames))  # compile
        jax.device_get(fn(params, frames))  # warm
        print("compiled", name, flush=True)

    res = {k: [] for k in arms}
    for r in range(rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(q):
                out = fn(params, frames)
            jax.device_get(out)
            res[name].append((time.perf_counter() - t0) / q * 1000)
    for name in arms:
        xs = sorted(res[name])
        print("%-12s %s  median %.1f ms" %
              (name, " ".join("%.1f" % x for x in res[name]), xs[len(xs) // 2]))


if __name__ == "__main__":
    main()
