"""Interleaved on-chip A/B: YOLO full forward with the standard vs
space-to-depth stem (models/yolo.py::s2d_stem) at batch-8 1080p bf16,
plus a detection-equality check between the two graphs.

Usage: python tools/profile_s2d.py [batch] [h] [w] [iters]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 9
    config.set_precision("default")
    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    priors, strides = jnp.asarray(priors), jnp.asarray(strides)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *canvas, 3)))["params"]
    # trained-like sparsity so NMS work is realistic
    for i in range(3):
        b = np.asarray(params["head"]["pred%d" % i]["bias"]).copy()
        b[4::6] -= 4.0
        params["head"]["pred%d" % i]["bias"] = jnp.asarray(b)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    fns = {}
    for s2d in (False, True):
        def fwd(p, f, s2d=s2d):
            out = Y.full_forward(p, f, (nh, nw), canvas, priors, strides,
                                 compute_dtype=jnp.bfloat16, s2d=s2d)
            return out

        fns[s2d] = jax.jit(fwd)
        _sync(fns[s2d](params, frames))
        _sync(fns[s2d](params, frames))

    ref = jax.device_get(fns[False](params, frames))
    got = jax.device_get(fns[True](params, frames))
    same_valid = bool(np.array_equal(ref[3], got[3]))
    # detections are score-sorted; near-equal scores may swap slots between
    # numerically-reassociated graphs — compare as SETS per image
    worst = 0.0
    for i in range(batch):
        rb = np.asarray(sorted(map(tuple, ref[0][i][ref[3][i]])))
        gb = np.asarray(sorted(map(tuple, got[0][i][got[3][i]])))
        if len(rb):
            worst = max(worst, float(np.abs(rb - gb).max()))
    print("detections: same valid set =", same_valid,
          " max sorted-box delta =", worst)

    def reduced(fn):
        return lambda p, f: sum(jnp.sum(t.astype(jnp.float32)) for t in fn(p, f)[:4])

    timed = {k: jax.jit(reduced(lambda p, f, k=k: fns[k](p, f))) for k in fns}
    for k in timed:
        _sync(timed[k](params, frames))
    # amortized queued timing: per-step device_get sync costs a full tunnel
    # round trip (~40 ms) that swamps a ~10 ms graph; queue a block of steps
    # and sync once (device stream is FIFO), interleaving engine blocks
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
        print("%-8s: median %7.2f ms/batch-%d queued-amortized (all: %s)"
              % ("s2d" if k else "standard", float(np.median(ts)), batch,
                 " ".join("%.1f" % t for t in ts)))


if __name__ == "__main__":
    main()
