"""Interleaved on-chip A/B: MTCNN full forward with the gather vs pallas
stage-2/3 crop engines (models/mtcnn.py full_forward crop_engine param).

Usage: python tools/profile_crops.py [batch] [h] [w] [minsize] [iters]

Methodology per docs/ROADMAP.md measurement notes: device_get sync, two
warmups per engine, then interleaved A/B rounds (run-to-run drift on the
shared chip is +-1-1.5 ms; only interleaved same-process deltas are
trustworthy).
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    minsize = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 7
    config.set_precision("default")
    caps = M.Caps()
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():  # realistic candidate load on random frames
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    fns = {}
    for engine in ("gather", "pallas"):
        def fwd(p, f, engine=engine):
            out = M.full_forward(p, f, minsize, caps, compute_dtype=jnp.bfloat16,
                                 crop_engine=engine)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in out[:4])

        fns[engine] = jax.jit(fwd)
        _sync(fns[engine](params, frames))
        _sync(fns[engine](params, frames))

    # queued-amortized: one device_get sync per block of 3 steps (a per-step
    # sync costs a ~40 ms tunnel round trip on top of the graph time)
    queue = 3
    times = {k: [] for k in fns}
    for _ in range(iters):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(queue):
                out = fn(params, frames)
            _sync(out)
            times[k].append((time.perf_counter() - t0) * 1000 / queue)
    for k, ts in times.items():
        print("%-8s: median %7.2f ms/batch-%d queued-amortized (all: %s)"
              % (k, float(np.median(ts)), batch,
                 " ".join("%.1f" % t for t in ts)))


if __name__ == "__main__":
    main()
