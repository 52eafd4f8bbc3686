"""Minimal repro: standalone space-to-depth stride-2 conv reformulations
kill the TPU runtime worker process (docs/TPU_CRASH_ARMS.md case 2).

Self-contained (no repo imports). Run ONE arm per process on a TPU backend —
the fault is a hard worker death, not a Python exception, and it poisons the
runtime for the rest of the process:

    python tools/repro_tpu_worker_crash.py strided    # control: completes
    python tools/repro_tpu_worker_crash.py packdown   # reproducibly dies
    python tools/repro_tpu_worker_crash.py slice4     # reproducibly dies

The same packed math INSIDE a larger conv graph (YOLO backbone with
``packed_downs=(1,)``) runs fine — the standalone composition at this shape
is what faults. Numerics are not the issue: both arms are tap-identical to
``strided`` on CPU (unit-tested in tests/test_models_yolo.py).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    out = None
    for pi in (0, 1):
        for pj in (0, 1):
            xs = x[:, pi::2, pj::2]
            dis = [di for di in (-1, 0, 1) if (di + pi) % 2 == 0]
            djs = [dj for dj in (-1, 0, 1) if (dj + pj) % 2 == 0]
            kk = jnp.stack([jnp.stack([k[di + 1, dj + 1] for dj in djs], 0)
                            for di in dis], 0)
            ro = [(di - 1 + pi) // 2 for di in dis]
            co = [(dj - 1 + pj) // 2 for dj in djs]
            y = conv(xs, kk, 1, ((-ro[0], len(dis) - 1 + ro[0]),
                                 (-co[0], len(djs) - 1 + co[0])))
            out = y if out is None else out + y
    return out


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "packdown"
    fn = {"strided": strided, "packdown": packdown, "slice4": slice4}[arm]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 176, 304, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray((rng.standard_normal((3, 3, 64, 128)) * 0.05
                     ).astype(np.float32)).astype(jnp.bfloat16)
    jfn = jax.jit(lambda xx: jnp.sum(fn(xx, k).astype(jnp.float32)))
    print("devices:", jax.devices(), flush=True)
    print("compiling", arm, flush=True)
    out = jfn(x)
    print("executing / fetching (worker death happens here)", flush=True)
    print("result:", float(jax.device_get(out)), flush=True)
    print("COMPLETED WITHOUT FAULT — re-test passed on this runtime", flush=True)


if __name__ == "__main__":
    main()
