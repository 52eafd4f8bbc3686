"""Per-op device trace of the FULL MTCNN cascade in the PRODUCTION trim
(bf16 params + bf16 activations, pallas crop engine, measured-best
pnet_stem/pnet_tail defaults), batch-2 1080p min_face_size=5.

Ranks XLA ops by device time from the perfetto trace (see
profile_pnet_trace.py for the parsing approach).

Usage: python tools/profile_mtcnn_trace.py [stem] [tail] [minsize]
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


def main():
    stem = sys.argv[1] if len(sys.argv) > 1 else None
    tail = sys.argv[2] if len(sys.argv) > 2 else None
    minsize = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    config.set_precision("default")
    batch, h, w = 2, 1080, 1920
    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    for net in params.values():  # trained-like sparsity
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(-3.0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    def fn(p, f):
        out = M.full_forward(p, f, minsize=minsize, compute_dtype=jnp.bfloat16,
                             crop_engine="pallas", pnet_stem=stem,
                             pnet_tail=tail)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out[:4]))

    g = jax.jit(fn)
    jax.device_get(g(params, frames))
    jax.device_get(g(params, frames))

    tdir = "/tmp/mtcnn_trace_%s_%s" % (stem, tail)
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
            if not name or dur <= 0:
                continue
            key = re.sub(r"[.\d]+$", "", name)
            agg[key] += dur
            total += dur
    ranked = sorted(agg.items(), key=lambda kv: -kv[1])
    print("total X-phase ms (3 steps, all lanes): %.1f" % total)
    for k, v in ranked[:50]:
        print("%9.2f ms  %s" % (v / 3, k))

    # individual (unstripped) device ops, cross-referenced against the
    # optimized HLO so the copy/fusion shapes are visible
    print("\n---- top individual ops with HLO shapes ----")
    hlo = jax.jit(fn).lower(params, frames).compile().as_text()
    hlo_lines = {}
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("%") or ls.startswith("ROOT %"):
            name = ls.split(" ", 1)[0].lstrip("%").split("=")[0].strip().lstrip("ROOT %")
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m:
            hlo_lines[m.group(1)] = line.strip()[:200]
    indiv = defaultdict(float)
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name, dur = ev.get("name", ""), ev.get("dur", 0) / 1e3
            if name and dur > 0 and not name.startswith("$"):
                indiv[name] += dur
    for k, v in sorted(indiv.items(), key=lambda kv: -kv[1])[:35]:
        print("%9.2f ms  %s" % (v / 3, k))
        ref = hlo_lines.get(k) or hlo_lines.get(k.split("/")[-1])
        if ref:
            print("             %s" % ref)


if __name__ == "__main__":
    main()
