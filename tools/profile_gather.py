"""Micro A/B: the three ways to get k winners' payload rows out of a huge
candidate axis on TPU (the MTCNN stage-1 selection question, ROADMAP watch
item). Small graphs — compiles in seconds, safe to run first after a tunnel
outage.

  A  index-only block top-k (ops/select.py::block_topk_indices) + k-row
     take_along_axis from the bf16 [B, D, 4] map (current production path)
  B  f32 payload (reg + iota) carried through block_topk_select (the
     pre-round-3 path: pays a full-D f32 materialization)
  C  index-only top-k + one-hot matmul pick of the k rows (gather-free
     fallback if TPU row-gathers run at the pathological ~us/row rate)

Shapes mirror the largest 1080p minsize-5 pyramid level: D ~ 3M, k = 1024.

Usage: python tools/profile_gather.py [B] [D] [k] [rounds]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# the axon site hook overrides the env var at backend-init time; honoring
# JAX_PLATFORMS=cpu for CPU sanity runs needs the in-process config pin
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from videotofaces_tpu.ops.select import (block_topk_indices,  # noqa: E402
                                          block_topk_select, pick_rows_onehot)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2_971_600
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    q = 10

    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 1, size=(b, d)).astype(np.float32)
    scores[scores < 0.998] = 0.0          # sparse, detector-like
    reg = jnp.asarray(rng.normal(size=(b, d, 4)).astype(np.float32)).astype(jnp.bfloat16)
    scores = jnp.asarray(scores)

    def arm_a(s, r):
        vals, idx, ov = block_topk_indices(s, k, per_block=4)
        preds = jnp.take_along_axis(r, idx[..., None], axis=1).astype(jnp.float32)
        return vals.sum() + preds.sum() + ov.sum()

    def arm_b(s, r):
        payload = jnp.concatenate(
            [r.astype(jnp.float32),
             jnp.broadcast_to(jnp.arange(d, dtype=jnp.float32)[None, :, None],
                              (b, d, 1))], axis=-1)
        vals, sel, ov = block_topk_select(s, payload, k, per_block=4)
        return vals.sum() + sel.sum() + ov.sum()

    def arm_c(s, r):
        # gather-free k-row pick (ops/select.py::pick_rows_onehot — the
        # production fallback wired as full_forward(stage1_pick="onehot"))
        vals, idx, ov = block_topk_indices(s, k, per_block=4)
        preds = pick_rows_onehot(r, idx).astype(jnp.float32)
        return vals.sum() + preds.sum() + ov.sum()

    arms = {"A:idx+row-gather": jax.jit(arm_a),
            "B:f32-payload": jax.jit(arm_b),
            "C:idx+onehot-pick": jax.jit(arm_c)}
    for name, fn in arms.items():
        jax.device_get(fn(scores, reg))
        jax.device_get(fn(scores, reg))
        print("compiled", name, flush=True)

    res = {n: [] for n in arms}
    for _ in range(rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(q):
                out = fn(scores, reg)
            jax.device_get(out)
            res[name].append((time.perf_counter() - t0) / q * 1000)
    for name in arms:
        xs = sorted(res[name])
        print("%-20s %s  median %.2f ms" %
              (name, " ".join("%.2f" % x for x in res[name]), xs[len(xs) // 2]))


if __name__ == "__main__":
    main()
