"""Benchmark: sampled 1080p frames/sec through the detection path on TPU,
plus faces embedded/sec at encoder batch 128.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
primary value is detection frames/sec and vs_baseline is measured against the
>500 fps north-star target (BASELINE.md). Extra figures go to stderr.
"""

import json
import sys
import time

import numpy as np


def bench_detection(batch=8, iters=20, h=1080, w=1920):
    # batch 8 = ~50MB uint8/step; the axon dev tunnel stalls on single >~64MB transfers
    import jax
    import jax.numpy as jnp
    from videotofaces_tpu import config
    from videotofaces_tpu.models import yolo as Y

    config.set_precision("default")
    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    priors, strides = jnp.asarray(priors), jnp.asarray(strides)
    model = Y.YOLOv3(num_classes=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, *canvas, 3)))["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)  # throughput mode

    fn = jax.jit(lambda p, f: Y.full_forward(p, f, (nh, nw), canvas, priors, strides,
                                             compute_dtype=jnp.bfloat16))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    jax.block_until_ready(fn(params, frames))  # compile + warm
    jax.block_until_ready(fn(params, frames))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_embedding(batch=128, iters=20):
    import jax
    import jax.numpy as jnp
    from videotofaces_tpu import config
    from videotofaces_tpu.models import facenet as FN

    config.set_precision("default")
    model = FN.InceptionResnetV1()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))["params"]

    def fwd(p, u8):
        return model.apply({"params": p}, FN.preprocess_uint8(u8))

    fn = jax.jit(fwd)
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.integers(0, 255, size=(batch, 160, 160, 3)).astype(np.uint8))
    jax.block_until_ready(fn(params, crops))
    jax.block_until_ready(fn(params, crops))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, crops)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    det_fps = bench_detection()
    emb_fps = bench_embedding()
    print(f"detection: {det_fps:.1f} 1080p frames/s (YOLOv3@608, batch 8, single chip); "
          f"embedding: {emb_fps:.1f} faces/s (FaceNet@160, batch 128)", file=sys.stderr)
    print(json.dumps({
        "metric": "sampled 1080p frames/sec end-to-end (detector path, single v5e chip); "
                  f"faces embedded/sec at batch 128 = {emb_fps:.1f}",
        "value": round(det_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(det_fps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
