"""Bisect the Faster R-CNN *backbone* cost on the real chip, stage by stage.

profile_rcnn.py showed backbone+FPN+RPN-heads ~12 ms of the 25.6 ms batch-2
step — ~13% MXU utilization for ~300 GFLOP, so something is off. This tool
times cumulative prefixes of the body:

  P  preprocess only (BGR flip, resize matmul, normalize, pad, cast)
  C1..C5  + resnet stages (stem, layer1..layer4)
  F  + FPN
  R  + RPN heads (3x3 conv + 1x1 reg/log over all 5 levels)

Usage: python tools/profile_rcnn_backbone.py [batch] [height] [width] [f32]
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
from videotofaces_tpu.models import resnet as RN  # noqa: E402
from videotofaces_tpu.ops.resize import bilinear_resize_matmul  # noqa: E402


def timeit(fn, params, frames, iters=10):
    """fn's outputs are reduced to ONE scalar inside the jit so the final
    sync materializes bytes, not feature maps — the D2H tunnel here runs at
    tens of MB/s and would otherwise dominate the measurement."""

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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    bf16 = "f32" not in sys.argv[4:]
    config.set_precision("default")
    dtype = jnp.bfloat16 if bf16 else None

    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    body = R.FasterRCNN(1)
    params = jax.jit(body.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))["params"]
    if bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    def pre(f):
        x = f[..., ::-1].astype(jnp.float32)
        x = bilinear_resize_matmul(x, (nh, nw))
        x = (x - jnp.asarray(R.IMAGENET_MEAN)) / jnp.asarray(R.IMAGENET_STD)
        x = jnp.pad(x, ((0, 0), (0, canvas[0] - nh), (0, canvas[1] - nw), (0, 0)))
        return x.astype(dtype) if dtype is not None else x

    print("canvas=%s batch=%d bf16=%s" % (canvas, batch, bf16))
    t = timeit(lambda p, f: pre(f), params, frames)
    print("P   preprocess                 : %7.2f ms" % t)

    # cumulative resnet stages through the anonymous ResNet_0 submodule
    resnet = RN.resnet50()
    rparams = params["ResNet_0"]

    class Prefix:
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, p, f):
            x = pre(f)
            feats = resnet.apply({"params": p["ResNet_0"]}, x)
            # feats = (c2, c3, c4, c5); return progressively more
            return feats[: self.upto] if self.upto else feats

    for i, name in [(1, "C2 stem+layer1"), (2, "C3 +layer2"),
                    (3, "C4 +layer3"), (4, "C5 +layer4")]:
        t = timeit(Prefix(i), params, frames)
        print("%-31s: %7.2f ms" % (name, t))

    t = timeit(lambda p, f: body.apply({"params": p}, pre(f)), params, frames)
    print("%-31s: %7.2f ms" % ("FULL body (resnet+fpn+rpn)", t))


if __name__ == "__main__":
    main()
