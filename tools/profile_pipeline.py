"""Measure the pipeline collect path on the real chip: how much of the
~65 ms/batch detect:collect cost (vs a ~10 ms device graph) is fetch
round-trips, and whether copy_to_host_async + a deeper in-flight queue
hides it.

Strategies, interleaved for drift robustness (ms/batch, staged device
inputs so H2D is out of the picture):

  two@1   depth-1 queue, collect = device_get(outs[:4]) THEN
          device_get(outs[4]) — the wrapper's historical two-fetch collect
  one@1   depth-1 queue, single device_get over all leaves
  one@D   depth-D queue, single device_get
  pre@D   depth-D queue, copy_to_host_async on every leaf at submit time,
          then device_get at collect

Usage: python tools/profile_pipeline.py [n_iters]
"""

import sys
import time
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models.wrappers import YoloDetector  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    config.set_precision("default")
    B, H, W = 8, 1080, 1920
    det = YoloDetector(batch_size=B, bf16=True)
    rng = np.random.default_rng(0)
    staged = [jnp.asarray(rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8))
              for _ in range(4)]
    fn = det._compiled(B, H, W)
    for a in staged:
        jax.device_get(a[0, 0, 0])

    def submit(i):
        return fn(det.params, staged[i % len(staged)])

    # warm/compile
    jax.device_get(submit(0))

    def collect_two(out):
        a = jax.device_get(out[:4])
        if len(out) > 4:
            jax.device_get(out[4])
        return a

    def collect_one(out):
        return jax.device_get(out)

    def run(depth, prefetch, collect):
        q = deque()
        t0 = time.perf_counter()
        for i in range(n):
            out = submit(i)
            if prefetch:
                for leaf in jax.tree.leaves(out):
                    leaf.copy_to_host_async()
            q.append(out)
            if len(q) > depth:
                collect(q.popleft())
        while q:
            collect(q.popleft())
        return (time.perf_counter() - t0) / n * 1000

    configs = [
        ("two@1", 1, False, collect_two),
        ("one@1", 1, False, collect_one),
        ("one@4", 4, False, collect_one),
        ("pre@2", 2, True, collect_one),
        ("pre@4", 4, True, collect_one),
        ("pre@8", 8, True, collect_one),
    ]
    results = {name: [] for name, *_ in configs}
    for rep in range(3):
        for name, depth, pre, col in configs:
            results[name].append(run(depth, pre, col))
    for name, *_ in configs:
        xs = results[name]
        print("%-6s  %s  median %.2f ms/batch" %
              (name, " ".join("%.2f" % x for x in xs), sorted(xs)[1]))


if __name__ == "__main__":
    main()
