"""Round-5 MTCNN micro A/Bs on the real chip.

Modes:
  topk    interleaved lax.top_k vs block_topk_indices on the MID pyramid
          levels' flat-candidate shapes (the per-op trace attributes
          ~2.0 ms/step to their full variadic sorts: sort.114 1.27 ms at
          [2, 98496], sort.127 0.49 at [2, 48256], sort.144 0.24 at
          [2, 26240]); decides the selection-routing threshold in
          models/mtcnn.py (currently d > 4*k1)
  fused0  pnet_level_fused on the LARGEST pyramid level (8.97 ms/step in
          the round-5 trace — 24%% of the whole cascade) at a given tile
          height ``to``: ``python tools/profile_mtcnn_r5.py fused0 16 32``
          sweeps to=16 vs to=32 interleaved
  ii      integral image: HWC cumsum + CHW cumsum (old) vs HWC cumsum +
          transpose (new _ii_chw form in full_forward)

Usage: python tools/profile_mtcnn_r5.py MODE [args...] [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.select import block_topk_indices  # noqa: E402
from videotofaces_tpu.ops.pallas_pnet import (  # noqa: E402
    pack_pnet_weights_r4, pad_frames_chw16, pnet_level_fused)
from videotofaces_tpu.ops.resize import (  # noqa: E402
    integral_image, integral_image_chw)


def timeit(jfns, args, rounds=5, q=3):
    for name, jfn in jfns.items():
        print("compiling", name, flush=True)
        jax.device_get(jfn(*args[name]))
    for _ in range(rounds):
        for name, jfn in jfns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(q):
                out = jfn(*args[name])
            jax.device_get(out)
            print("%s: %.3f ms" % (name, (time.perf_counter() - t0) / q * 1000),
                  flush=True)


def main():
    mode = sys.argv[1]
    config.set_precision("default")
    rng = np.random.default_rng(0)

    if mode == "topk":
        b, k = 2, 1024
        shapes = [98496, 48256, 26240, 14336]
        # trained-like sparsity: most entries zero (below threshold), a few
        # hundred positives — the masked-score distribution selection sees
        xs = []
        for d in shapes:
            a = np.zeros((b, d), np.float32)
            pos = rng.choice(d, size=400, replace=False)
            a[:, pos] = rng.uniform(0.6, 1.0, size=(b, 400))
            xs.append(jnp.asarray(a))

        def top_all(*arrs):
            return [jax.lax.top_k(a, k) for a in arrs]

        def blk_all(*arrs):
            return [block_topk_indices(a, k, per_block=4) for a in arrs]

        jfns = {"lax.top_k": jax.jit(top_all), "block_topk": jax.jit(blk_all)}
        timeit(jfns, {n: xs for n in jfns})
    elif mode == "fused0":
        tos = [int(a) for a in sys.argv[2:]] or [16, 32]
        b, h, w, minsize = 2, 1080, 1920, 5
        params = M.PNet().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 12, 12, 3)))["params"]
        packed = pack_pnet_weights_r4(params, jnp.bfloat16)
        frames = jnp.asarray(rng.integers(0, 255, size=(b, h, w, 3)).astype(np.uint8))
        fr = pad_frames_chw16(jnp.transpose(M._normalize(
            frames[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2)).astype(jnp.bfloat16))
        _, sizes = M.scale_pyramid(h, w, minsize)
        lvl = sizes[0]
        print("level0:", lvl, flush=True)

        def mk(to):
            def fn(p, f):
                reg, prob, _ = pnet_level_fused(p, f, (h, w), lvl, to=to,
                                                padded_out=True)
                return reg.astype(jnp.float32).sum() + prob.sum()
            return jax.jit(fn)

        jfns = {"to=%d" % to: mk(to) for to in tos}
        timeit(jfns, {n: (packed, fr) for n in jfns})
    elif mode == "ii":
        b, h, w = 2, 1080, 1920
        frames = jnp.asarray(rng.integers(0, 255, size=(b, h, w, 3)).astype(np.uint8))

        def old(f):
            ii = integral_image(f[..., ::-1])
            iic = integral_image_chw(f[..., ::-1])
            return ii.sum() + iic.sum()

        def new(f):
            ii = integral_image(f[..., ::-1])
            iic = jnp.transpose(ii, (0, 3, 1, 2))
            return ii.sum() + iic.sum()

        jfns = {"two-cumsums": jax.jit(old), "cumsum+transpose": jax.jit(new)}
        timeit(jfns, {n: (frames,) for n in jfns})
    else:
        raise SystemExit("unknown mode %r" % mode)


if __name__ == "__main__":
    main()
