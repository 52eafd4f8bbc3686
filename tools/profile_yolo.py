"""Bisect the YOLO step cost on the real chip, stage by stage (honest sync:
scalar-reduced outputs + device_get — see docs/ROADMAP.md measurement notes).

  P  preprocess (BGR flip, resize, /255, pad, cast)
  B  + Darknet53 + neck + head (3 maps)
  S  + flatten/sigmoid/candidate mask
  K  + block_topk_select (payload carried)
  N  + NMS keep mask + final sort  (= full postprocess)
  F  full_forward (adds box rescale)

Usage: python tools/profile_yolo.py [batch] [height] [width] [f32]
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
from videotofaces_tpu.ops.resize import bilinear_resize  # noqa: E402
from videotofaces_tpu.ops.select import block_topk_select  # noqa: E402


def timeit(fn, params, frames, iters=10):
    def reduced(p, f):
        out = fn(p, f)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out))

    g = jax.jit(reduced)
    _sync(g(params, frames))
    _sync(g(params, frames))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = g(params, frames)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    bf16 = "f32" not in sys.argv[4:]
    config.set_precision("default")
    dtype = jnp.bfloat16 if bf16 else None

    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors_np, strides_np = Y.flat_priors_and_strides(canvas)
    priors = jnp.asarray(priors_np)
    strides = jnp.asarray(strides_np)
    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))["params"]
    if bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    print("canvas=%s batch=%d bf16=%s D=%d" % (canvas, batch, bf16, priors_np.shape[0]))

    def pre(f):
        x = f[..., ::-1].astype(jnp.float32)
        x = bilinear_resize(x, (nh, nw))
        x = x / 255.0
        x = jnp.pad(x, ((0, 0), (0, canvas[0] - nh), (0, canvas[1] - nw), (0, 0)))
        return x.astype(dtype) if dtype is not None else x

    def body(p, f):
        maps = model.apply({"params": p}, pre(f))
        return [t.astype(jnp.float32) for t in maps]

    def scores_masked(p, f):
        maps = body(p, f)
        b = maps[0].shape[0]
        flat = jnp.concatenate([m.reshape(b, -1, 6) for m in maps], axis=1)
        obj = jax.nn.sigmoid(flat[..., 4])
        cls = jax.nn.sigmoid(flat[..., 5:])
        score = cls * obj[..., None]
        ok = (obj[..., None] >= 0.005) & (cls > 0.05)
        masked = jnp.where(ok, score, 0.0).reshape(b, -1)
        return flat[..., :4], masked

    def topk(p, f):
        reg, masked = scores_masked(p, f)
        b, d = masked.shape
        payload = jnp.concatenate([
            reg,
            jnp.broadcast_to(priors[None], (b, d, 4)),
            jnp.broadcast_to(strides[None], (b, d, 1)),
            jnp.zeros((b, d, 1)),
        ], axis=-1)
        return block_topk_select(masked, payload, 1000, 32)

    def post(p, f):
        maps = body(p, f)
        return Y.postprocess(maps, priors, strides, 1)

    def full(p, f):
        return Y.full_forward(params, f, (nh, nw), canvas, priors, strides,
                              compute_dtype=dtype)

    for name, fn in [("P  preprocess", lambda p, f: pre(f)),
                     ("B  +backbone/neck/head", body),
                     ("S  +sigmoid/mask", scores_masked),
                     ("K  +block_topk", topk),
                     ("N  +nms/sort (postproc)", post),
                     ("F  full_forward", full)]:
        t = timeit(fn, params, frames)
        print("%-26s: %7.2f ms/batch-%d  (%.0f fps)" % (name, t, batch, batch / t * 1000))


if __name__ == "__main__":
    main()
