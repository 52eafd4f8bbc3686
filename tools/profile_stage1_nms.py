"""Interleaved A/B: per-level vs stacked stage-1 NMS on the real chip.

The per-level arm runs 16 sequential bucketed fixpoints (one per pyramid
level); the stacked arm batches every level's padded buffer into ONE
[B*L, pre1] problem set, so the while_loop converges in max(chain depth)
iterations over all rows instead of the sum, and the sort/scatter
bookkeeping batches. Results are exact either way (unit test
test_cascade_stacked_stage1_nms_matches_level).

Usage: python tools/profile_stage1_nms.py [batch] [height] [width] [minsize]
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


def main(batch=2, h=1080, w=1920, minsize=5):
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

    arms = {}
    for mode in ("level", "stacked"):
        arms[mode] = jax.jit(lambda p, f, m=mode: M.full_forward(
            p, f, minsize=minsize, compute_dtype=jnp.bfloat16, stage1_nms=m))
    for name, fn in arms.items():
        print("compiling", name, flush=True)
        _sync(fn(params, frames))
        _sync(fn(params, frames))
    q, rounds = 3, 5
    times = {k: [] for k in arms}
    for r in range(rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(q):
                out = fn(params, frames)
            _sync(out)
            times[name].append((time.perf_counter() - t0) / q * 1000)
    for name, ts in times.items():
        print("%-8s %8.2f ms/batch-%d  (all: %s)"
              % (name, min(ts), batch, " ".join("%.1f" % t for t in ts)),
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
