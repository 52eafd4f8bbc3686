"""A/B the RoIAlign formulations on the real chip at production shapes.

Batch 2 x 1000 rois over the (768, 1344) R-CNN canvas pyramid
(P2 192x336 .. P5 24x42, C=256), throughput (bf16) mode, realistic
box-size mix (RPN proposals skew small -> P2-heavy level assignment).

Usage: python tools/profile_roialign.py [n_rois] [chunk ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402
from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.ops import roi_align as RA  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    chunks = [int(a) for a in sys.argv[2:]] or [4, 8, 16]
    config.set_precision("default")
    batch = 2
    sizes = [(192, 336), (96, 168), (48, 84), (24, 42)]
    rng = np.random.default_rng(0)
    fmaps = [jnp.asarray(rng.normal(size=(batch, h, w, 256)).astype(np.float32)
                         .astype(jnp.bfloat16).astype(np.float32))
             for (h, w) in sizes]

    # box mix: 60% small (<112px, P2), 25% P3, 10% P4, 5% large
    side = np.concatenate([rng.uniform(16, 112, int(n * 0.6)),
                           rng.uniform(112, 224, int(n * 0.25)),
                           rng.uniform(224, 448, int(n * 0.10))])
    side = np.concatenate([side, rng.uniform(448, 760, n - len(side))])
    ar = rng.uniform(0.5, 2.0, n)
    w_ = side * np.sqrt(ar)
    h_ = side / np.sqrt(ar)
    cx = rng.uniform(0, 1344, n)
    cy = rng.uniform(0, 768, n)
    boxes = np.stack([np.clip(cx - w_ / 2, 0, 1343), np.clip(cy - h_ / 2, 0, 767),
                      np.clip(cx + w_ / 2, 1, 1344), np.clip(cy + h_ / 2, 1, 768)],
                     axis=1).astype(np.float32)
    boxes = jnp.asarray(np.stack([boxes, boxes[::-1]]))               # [B, n, 4]

    lv = np.asarray(RA.assign_fpn_levels(boxes[0]))
    print("n=%d level histogram: %s" % (n, np.bincount(lv, minlength=4)))

    for method, batcher in (("dense", "vmap"), ("sorted", "map")):
        for chunk in chunks:
            def fn(fm, bx, method=method, batcher=batcher):
                per_image = lambda b, f0, f1, f2, f3: RA.roi_align_multilevel(
                    [f0, f1, f2, f3], b, (4, 8, 16, 32), chunk=chunk,
                    method=method)
                if batcher == "vmap":
                    out = jax.vmap(per_image)(bx, *fm)
                else:
                    out = jax.lax.map(lambda a: per_image(*a), (bx,) + tuple(fm))
                return jnp.sum(out.astype(jnp.float32))

            g = jax.jit(fn)
            _sync(g(fmaps, boxes))
            _sync(g(fmaps, boxes))
            t0 = time.perf_counter()
            out = None
            for _ in range(10):
                out = g(fmaps, boxes)
            _sync(out)
            ms = (time.perf_counter() - t0) / 10 * 1000
            print("%-7s %-4s chunk=%-3d : %7.2f ms/batch-%d"
                  % (method, batcher, chunk, ms, batch))


if __name__ == "__main__":
    main()
