"""A/B detector-preprocess formulations on the real chip.

The YOLO bisection shows preprocess = 4.77 ms of a 12.3 ms batch-8 step;
roofline says the resize matmuls are ~0.4 ms of FLOPs and ~250 MB of
traffic (~1.3 ms) — something (relayouts? unfused casts?) eats the rest.
Candidates:

  cur    flip -> f32 -> resize(gather) -> /255 -> pad -> bf16   (yolo today)
  mm     flip -> f32 -> resize_matmul -> /255 -> pad -> bf16    (rcnn today)
  mmr    resize_matmul(u8 direct) -> flip+/255 on SMALL -> pad -> bf16
  jir    jax.image.resize (XLA native) from f32, rest as cur
  xpose  JUST a transpose of the full-res f32 tensor (relayout cost ref)
  cast   JUST u8 -> f32 of the full-res tensor (traffic cost ref)

Usage: python tools/profile_preprocess.py [batch] [h] [w] [oh] [ow]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402
from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.ops.resize import (bilinear_resize,  # noqa: E402
                                         bilinear_resize_matmul)


def timeit(fn, frames, iters=20):
    def reduced(f):
        return jnp.sum(fn(f).astype(jnp.float32))

    g = jax.jit(reduced)
    _sync(g(frames))
    _sync(g(frames))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = g(frames)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    oh = int(sys.argv[4]) if len(sys.argv) > 4 else 342
    ow = int(sys.argv[5]) if len(sys.argv) > 5 else 608
    ph, pw = -(-oh // 32) * 32, -(-ow // 32) * 32
    config.set_precision("default")
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    print("batch=%d %dx%d -> %dx%d (canvas %dx%d)" % (batch, h, w, oh, ow, ph, pw))

    def finish(x, already_small):
        x = jnp.pad(x, ((0, 0), (0, ph - x.shape[1]), (0, pw - x.shape[2]), (0, 0)))
        return x.astype(jnp.bfloat16)

    def cur(f):
        x = f[..., ::-1].astype(jnp.float32)
        x = bilinear_resize(x, (oh, ow))
        return finish(x / 255.0, True)

    def mm(f):
        x = f[..., ::-1].astype(jnp.float32)
        x = bilinear_resize_matmul(x, (oh, ow))
        return finish(x / 255.0, True)

    def mmr(f):
        x = bilinear_resize_matmul(f, (oh, ow))   # casts u8->f32 inside
        return finish(x[..., ::-1] / 255.0, True)

    def jir(f):
        x = f[..., ::-1].astype(jnp.float32)
        x = jax.image.resize(x, (f.shape[0], oh, ow, 3), "bilinear")
        return finish(x / 255.0, True)

    def xpose(f):
        return jnp.transpose(f.astype(jnp.float32), (0, 2, 1, 3))

    def cast(f):
        return f.astype(jnp.float32)

    for name, fn in [("cur (gather resize)", cur), ("mm  (matmul resize)", mm),
                     ("mmr (resize first)", mmr), ("jir (jax.image)", jir),
                     ("xpose full-res ref", xpose), ("cast full-res ref", cast)]:
        t = timeit(fn, frames)
        print("%-22s: %7.2f ms/batch-%d" % (name, t, batch))


if __name__ == "__main__":
    main()
