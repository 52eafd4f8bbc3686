"""Standalone microbench of the large-spatial stride-2 conv formulations
(the stage1_down hotspot: per-op trace shows 1.9-2.8 ms vs a ~0.11 ms bf16
roofline for the [8, 176, 304, 64] -> [8, 88, 152, 128] 3x3 s2 conv).

Arms (all identical taps):
  strided   plain lax conv stride 2 (what XLA gets from flax today)
  packdown  s2d pack (reshape+transpose) + 2x2 s1 conv on phase channels
  slice4    four parity slices + per-phase convs (1x1/1x2/2x1/2x2), summed
  pool      conv at stride 1 then 2x2 stride-2 subsample (flops x4, layout?)

Also times each arm INSIDE a producer/consumer sandwich (a 1x1 conv before
and after) so fusion effects show up, not just the isolated op.

Usage: python tools/profile_down.py [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu.utils.profiling import sync as _sync  # noqa: E402


def conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def strided(x, k):
    return conv(x, k, 2, ((1, 1), (1, 1)))


def packdown(x, k):
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    p = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
    w0 = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
    for pi in (0, 1):
        for r in (0, 1):
            di = 2 * (r - 1) + pi
            if not -1 <= di <= 1:
                continue
            for pj in (0, 1):
                for s in (0, 1):
                    dj = 2 * (s - 1) + pj
                    if not -1 <= dj <= 1:
                        continue
                    c0 = (pi * 2 + pj) * cin
                    w0 = w0.at[r, s, c0:c0 + cin].set(k[di + 1, dj + 1])
    return conv(p, w0, 1, ((1, 0), (1, 0)))


def slice4(x, k):
    # y[i,j] = sum_{di,dj} k[di,dj] x[2i+di-1, 2j+dj-1]; group taps by input
    # parity: even rows (di=1) / odd rows (di=0,2), same for columns. Each
    # parity-phase of x contributes through a small unstrided conv.
    b, h, w, cin = x.shape
    out = None
    for pi in (0, 1):           # input row parity
        for pj in (0, 1):       # input col parity
            xs = x[:, pi::2, pj::2]                       # [B, h/2, w/2, cin]
            dis = [di for di in (-1, 0, 1) if (di + pi) % 2 == 0]
            djs = [dj for dj in (-1, 0, 1) if (dj + pj) % 2 == 0]
            kk = jnp.stack([jnp.stack([k[di + 1, dj + 1] for dj in djs], 0)
                            for di in dis], 0)            # [len_di, len_dj, cin, cout]
            # tap at (di, dj) reads phase row (2i+di-1-pi)/2 = i + (di-1+pi)/2
            ro = [(di - 1 + pi) // 2 for di in dis]
            co = [(dj - 1 + pj) // 2 for dj in djs]
            pad_t, pad_l = -ro[0], -co[0]
            pad_b = len(dis) - 1 + ro[0]
            pad_r = len(djs) - 1 + co[0]
            y = conv(xs, kk, 1, ((pad_t, pad_b), (pad_l, pad_r)))
            out = y if out is None else out + y
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 176, 304, 64)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 128)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    k_pre = jnp.asarray(rng.standard_normal((1, 1, 64, 64)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    k_post = jnp.asarray(rng.standard_normal((1, 1, 128, 128)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    arms = {"strided": strided, "packdown": packdown, "slice4": slice4}

    # correctness vs strided (f32, CPU, small shapes — the f32 fetch at the
    # full size reproducibly crashes the axon worker)
    cpu = jax.devices("cpu")[0]
    xf = jax.device_put(rng.standard_normal((2, 24, 40, 16)).astype(np.float32), cpu)
    kf = jax.device_put((rng.standard_normal((3, 3, 16, 32)) * 0.1).astype(np.float32), cpu)
    ref = np.asarray(jax.jit(strided, device=cpu)(xf, kf))
    for name, fn in arms.items():
        got = np.asarray(jax.jit(fn, device=cpu)(xf, kf))
        print("%-9s max|diff| vs strided: %.2e" % (name, np.abs(got - ref).max()), flush=True)

    fns = {}
    for name, fn in arms.items():
        def sandwich(xx, fn=fn):
            t = conv(xx, k_pre, 1, ((0, 0), (0, 0)))
            y = fn(t, k)
            y = conv(y, k_post, 1, ((0, 0), (0, 0)))
            return jnp.sum(y.astype(jnp.float32))
        fns[name] = jax.jit(sandwich)
        _sync(fns[name](x))
        _sync(fns[name](x))

    queue = 20
    times = {kk: [] for kk in fns}
    for _ in range(iters):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(queue):
                out = fn(x)
            _sync(out)
            times[name].append((time.perf_counter() - t0) * 1000 / queue)
    for name, ts in times.items():
        print("%-9s: median %6.2f ms (all: %s)"
              % (name, float(np.median(ts)), " ".join("%.2f" % t for t in ts)))


if __name__ == "__main__":
    main()
