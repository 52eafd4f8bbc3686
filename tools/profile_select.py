"""Interleaved on-chip A/B: block-top-k per-block selection as iterative
argmax (round-3) vs one stable lane sort (round 4), inside the FULL YOLO
step (batch-8 1080p bf16, production trim). The two are bit-identical
(tests/test_ops_select.py::test_block_top_sort_equals_argmax); this measures
the serialized-reduction chain the argmax form pays (~2.3 ms/step in the
per-op trace at per_block=20).

Usage: python tools/profile_select.py [batch] [iters]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402
from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import yolo as Y  # noqa: E402
from videotofaces_tpu.ops import select as S  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    config.set_precision("default")
    h, w = 1080, 1920
    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    priors, strides = jnp.asarray(priors), jnp.asarray(strides)
    params = jax.jit(Y.YOLOv3(1).init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, *canvas, 3)))["params"]
    for i in range(3):
        b = np.asarray(params["head"]["pred%d" % i]["bias"]).copy()
        b[4::6] -= 4.0
        params["head"]["pred%d" % i]["bias"] = jnp.asarray(b)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    def fwd(p, f):
        return Y.full_forward(p, f, (nh, nw), canvas, priors, strides,
                              compute_dtype=jnp.bfloat16, s2d=True)

    fns = {}
    orig = Y.block_topk_select
    # jit captures the module global at trace time, so swapping it per arm
    # builds two graphs that differ ONLY in the per-block selection form
    for method in ("argmax", "sort"):
        Y.block_topk_select = functools.partial(orig, method=method)
        fns[method] = jax.jit(fwd)
        _sync(fns[method](params, frames))
        _sync(fns[method](params, frames))
    Y.block_topk_select = orig

    ref = jax.device_get(fns["argmax"](params, frames))
    got = jax.device_get(fns["sort"](params, frames))
    print("identical outputs:",
          all(np.array_equal(a, b) for a, b in zip(ref, got)))

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
