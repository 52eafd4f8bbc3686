"""Interleaved on-chip A/B: R-CNN full step with dense vs Pallas-patch
RoIAlign (batch-2 1080p bf16 production trim, queued-amortized).

The dense separable-matmul RoIAlign pools every roi against the whole
feature map (~9-10 ms of the 25.7 ms step, docs/ROADMAP.md); the Pallas
engine (ops/pallas_roialign.py) DMAs one size-bucketed patch per REAL roi
and pools it with one MXU dot.

Usage: python tools/profile_roi_pallas.py [batch] [iters]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    config.set_precision("default")
    h, w = 1080, 1920
    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    priors = [jnp.asarray(p) for p in get_priors(canvas, R.frcnn_bases(),
                                                 loc="corner", concat=False)]
    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    params = {
        "body": jax.jit(body.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 96, 3)))["params"],
        "head": jax.jit(head.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 7, 7, 256)))["params"],
    }
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    fns = {}
    for method in ("dense", "pallas"):
        def fwd(p, f, method=method):
            return R.full_forward(p, f, (nh, nw), canvas, priors,
                                  compute_dtype=jnp.bfloat16,
                                  roi_method=method)

        fns[method] = jax.jit(fwd)
        _sync(fns[method](params, frames))
        _sync(fns[method](params, frames))
        print(method, "compiled", flush=True)

    ref = jax.device_get(fns["dense"](params, frames))
    got = jax.device_get(fns["pallas"](params, frames))
    same_valid = bool(np.array_equal(ref[3], got[3]))
    worst = 0.0
    for i in range(batch):
        rb, gb = ref[0][i][ref[3][i]], got[0][i][got[3][i]]
        if len(rb) and len(rb) == len(gb):
            worst = max(worst, float(np.abs(np.sort(rb, 0) - np.sort(gb, 0)).max()))
        elif len(rb) != len(gb):
            worst = float("inf")
    print("same valid mask = %s, max sorted-box delta = %.2e, dropped = %s"
          % (same_valid, worst, got[5].tolist()), flush=True)

    def reduced(fn):
        return lambda p, f: sum(jnp.sum(t.astype(jnp.float32)) for t in fn(p, f)[:4])

    timed = {k: jax.jit(reduced(v)) for k, v in fns.items()}
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
        print("%-7s: median %6.2f ms/batch-%d queued-amortized (all: %s)"
              % (k, float(np.median(ts)), batch,
                 " ".join("%.1f" % t for t in ts)))


if __name__ == "__main__":
    main()
