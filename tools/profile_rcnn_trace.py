"""Per-op device trace of the FULL Faster R-CNN step in the PRODUCTION trim
(bf16 params + bf16 activations, dense RoIAlign default), batch-2 1080p.

Same perfetto parse + by-source-line aggregation as profile_yolo_trace.py —
VERDICT r4 item 5 asked for R-CNN to get the same per-op treatment the YOLO
and MTCNN graphs already have (tools/profile_rcnn.py is stage-level only).

Usage: python tools/profile_rcnn_trace.py [batch] [roi_method]
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
from videotofaces_tpu.models import rcnn as R  # noqa: E402
from videotofaces_tpu.ops.anchors import get_priors  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    roi_method = sys.argv[2] if len(sys.argv) > 2 else "dense"
    config.set_precision("default")
    h, w = 1080, 1920
    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    priors = [jnp.asarray(p) for p in get_priors(canvas, R.frcnn_bases(),
                                                 loc="corner", concat=False)]
    body = R.FasterRCNN(1)
    head = R.RoIHead(1)
    params = {
        "body": jax.jit(body.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1,) + canvas + (3,)))["params"],
        "head": jax.jit(head.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 7, 7, 256)))["params"],
    }
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, size=(batch, h, w, 3)).astype(np.uint8))

    def fn(p, f):
        out = R.full_forward(p, f, (nh, nw), canvas, priors,
                             compute_dtype=jnp.bfloat16,
                             roi_method=roi_method)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out))

    g = jax.jit(fn)
    jax.device_get(g(params, frames))
    jax.device_get(g(params, frames))

    tdir = "/tmp/rcnn_trace_%d_%s" % (batch, roi_method)
    with jax.profiler.trace(tdir):
        out = None
        for _ in range(5):
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
    print("total X-phase ms (5 steps, all lanes): %.1f" % total)
    for k, v in ranked[:40]:
        print("%9.2f ms  %s" % (v / 5, k))

    print("\n---- top individual ops with HLO shapes ----")
    hlo = jax.jit(fn).lower(params, frames).compile().as_text()
    hlo_lines = {}
    hlo_src = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m:
            hlo_lines[m.group(1)] = line.strip()[:220]
            sm = re.search(r'op_name="([^"]*)".*?source_file="([^"]*)".*?'
                           r"source_line=(\d+)", line)
            if sm:
                hlo_src[m.group(1)] = "%s  (%s:%s)" % (
                    sm.group(1)[:80], os.path.basename(sm.group(2)), sm.group(3))
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
    for k, v in sorted(indiv.items(), key=lambda kv: -kv[1])[:40]:
        print("%9.2f ms  %s" % (v / 5, k))
        ref = hlo_lines.get(k) or hlo_lines.get(k.split("/")[-1])
        if ref:
            print("             %s" % ref)

    print("\n---- device ms/step by source line ----")
    by_src = defaultdict(float)
    unattributed = 0.0
    skip = ("np.asarray", "ParseArguments", "ArrayImpl", "jit_fn", "PjitFunction")
    for k, v in indiv.items():
        if any(k.startswith(s) for s in skip):
            continue
        src = hlo_src.get(k) or hlo_src.get(k.split("/")[-1])
        if src:
            by_src[src] += v
        else:
            unattributed += v
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print("%9.2f ms  %s" % (v / 5, k))
    print("%9.2f ms  (unattributed device ops)" % (unattributed / 5))


if __name__ == "__main__":
    main()
