"""Is MTCNN's 124 ms PNet cost per-dispatch overhead or per-FLOP?

Compares, on the real chip (batch 2, 1080p, minsize 5 pyramid):

  L1    PNet on the largest level alone        (~half the pyramid FLOPs)
  L1x2  PNet on a double-height largest level  (~= total pyramid FLOPs, ONE call)
  loop  PNet on all 16 levels separately       (the current formulation)

If loop >> L1x2, the 16-dispatch structure (relayouts, small-tensor
dispatch) dominates and an atlas-packed single-call PNet is worth building;
if loop ~= L1x2, PNet is FLOP/lane-bound and the atlas would win little.

Usage: python tools/profile_pnet.py [batch] [h] [w] [minsize]
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


def timeit(fn, params, x, iters=5):
    def reduced(p, f):
        out = fn(p, f)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out))

    g = jax.jit(reduced)
    _sync(g(params, x))
    _sync(g(params, x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = g(params, x)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    minsize = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    config.set_precision("default")
    scales, sizes = M.scale_pyramid(h, w, minsize)
    areas = [sh * sw for sh, sw in sizes]
    print("pyramid: %d levels, largest %s, total/largest area = %.2f"
          % (len(scales), sizes[0], sum(areas) / areas[0]))

    pnet = M.PNet()
    params = pnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)

    h1, w1 = sizes[0]
    x1 = jnp.asarray(rng.normal(size=(batch, h1, w1, 3)).astype(np.float32)
                     .astype(jnp.bfloat16))
    x2 = jnp.asarray(rng.normal(size=(batch, 2 * h1, w1, 3)).astype(np.float32)
                     .astype(jnp.bfloat16))
    levels = [jnp.asarray(rng.normal(size=(batch, sh, sw, 3)).astype(np.float32)
                          .astype(jnp.bfloat16)) for sh, sw in sizes]

    t = timeit(lambda p, f: pnet.apply({"params": p}, f), params, x1)
    print("L1   single largest level      : %8.2f ms" % t)
    t = timeit(lambda p, f: pnet.apply({"params": p}, f), params, x2)
    print("L1x2 double-height single call : %8.2f ms" % t)

    def loop(p, fs):
        return [pnet.apply({"params": p}, f) for f in fs]

    t = timeit(loop, params, levels)
    print("loop all %2d levels             : %8.2f ms" % (len(levels), t))


if __name__ == "__main__":
    main()
