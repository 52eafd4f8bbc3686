"""Capture a jax.profiler device trace of the PNet pyramid stage (module
path, batch-2 1080p minsize-5 bf16) and rank XLA ops by total device time.

Parses the perfetto trace offline (plugins/profile/*/*.trace.json.gz): event
phase "X" durations, grouped by op-name prefix.

Usage: python tools/profile_pnet_trace.py [tail] — tail in {module, s2d}
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402
from videotofaces_tpu.models import mtcnn as M  # noqa: E402
from videotofaces_tpu.ops.resize import adaptive_pool_full, integral_image  # noqa: E402


def main():
    tail = sys.argv[1] if len(sys.argv) > 1 else "module"
    config.set_precision("default")
    batch, h, w, minsize = 2, 1080, 1920, 5
    params = {"pnet": M.PNet().init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 12, 12, 3)))["params"]}
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))
    scales, sizes = M.scale_pyramid(h, w, minsize)

    def fn(p, f):
        ii = integral_image(f[..., ::-1])
        outs = []
        for (sh, sw) in sizes:
            level = M._normalize(adaptive_pool_full(ii, (sh, sw), (h, w)))
            level = level.astype(jnp.bfloat16)
            if tail == "s2d":
                pool1 = M.PNet(to_pool1=True).apply({"params": p["pnet"]}, level)
                reg, prob = M.pnet_s2d_tail(p["pnet"], pool1)
            else:
                reg, prob = M.PNet().apply({"params": p["pnet"]}, level)
            outs.append(reg.sum() + prob.sum())
        return sum(o.astype(jnp.float32) for o in outs)

    g = jax.jit(fn)
    jax.device_get(g(params, frames))
    jax.device_get(g(params, frames))

    tdir = "/tmp/pnet_trace_" + tail
    with jax.profiler.trace(tdir):
        out = None
        for _ in range(3):
            out = g(params, frames)
        jax.device_get(out)

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    print("trace files:", files)
    agg = defaultdict(float)
    total = 0.0
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            # keep only device-lane events (XLA op names)
            if not name or dur <= 0:
                continue
            key = re.sub(r"[.\d]+$", "", name)
            agg[key] += dur
            total += dur
    ranked = sorted(agg.items(), key=lambda kv: -kv[1])
    print("total X-phase ms (3 steps, all lanes): %.1f" % total)
    for k, v in ranked[:40]:
        print("%9.2f ms  %s" % (v / 3, k))


if __name__ == "__main__":
    main()
