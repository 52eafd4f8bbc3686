"""Compile-cost bisection: trace time, jaxpr size, and CPU compile time for
each production detector graph.

The axon remote compiler takes minutes on the Faster-RCNN graph (first run,
then the persistent cache makes it free). This tool measures the parts we
control — Python trace time and jaxpr equation count — plus the CPU backend's
compile wall time as a proxy ranking, so trace-level bloat (unrolled loops,
per-level re-tracing, giant constants) can be found and fixed offline.

Usage: python tools/profile_compile.py [yolo rcnn mtcnn ...]
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("V2F_COMPILE_CACHE", "0")  # measure COLD compiles

import jax

jax.config.update("jax_platforms", "cpu")  # the axon site hook overrides env
import jax.numpy as jnp  # noqa: E402


def _measure(name, fn, example_args):
    t0 = time.perf_counter()
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    t_trace = time.perf_counter() - t0
    neq = len(jaxpr.jaxpr.eqns)
    # count nested eqns too (scan/cond/while bodies hide most of the graph)
    def deep(jx):
        total = len(jx.eqns)
        for eq in jx.eqns:
            for v in eq.params.values():
                closed = getattr(v, "jaxpr", None)
                if closed is not None and hasattr(closed, "eqns"):
                    total += deep(closed)
                elif isinstance(v, (list, tuple)):
                    for item in v:
                        inner = getattr(item, "jaxpr", None)
                        if inner is not None and hasattr(inner, "eqns"):
                            total += deep(inner)
        return total

    ndeep = deep(jaxpr.jaxpr)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*example_args)
    t_lower = time.perf_counter() - t0
    hlo_lines = lowered.as_text().count("\n")
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print("%-28s trace %6.2fs  eqns %6d (deep %6d)  lower %6.2fs  "
          "hlo %7d ln  cpu-compile %7.2fs"
          % (name, t_trace, neq, ndeep, t_lower, hlo_lines, t_compile))


def yolo_graph(bf16=True):
    from videotofaces_tpu import config
    from videotofaces_tpu.models import yolo as Y

    config.set_precision("default")
    h, w = 1080, 1920
    nh, nw = Y.resized_shape(h, w)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    model = Y.YOLOv3(num_classes=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *canvas, 3)))["params"]
    dt = jnp.bfloat16 if bf16 else None
    if bf16:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    fn = lambda p, f: Y.full_forward(p, f, (nh, nw), canvas,
                                     jnp.asarray(priors), jnp.asarray(strides),
                                     compute_dtype=dt, s2d=bf16)
    frames = jnp.zeros((8, h, w, 3), jnp.uint8)
    return fn, (params, frames)


def rcnn_graph(bf16=True):
    from videotofaces_tpu import config
    from videotofaces_tpu.models import rcnn as R
    from videotofaces_tpu.ops.anchors import get_priors

    config.set_precision("default")
    h, w = 720, 1280
    nh, nw = R.resized_shape(h, w)
    canvas = R.canvas_shape(nh, nw)
    priors = get_priors(canvas, R.frcnn_bases(), loc="corner", concat=False)
    body = jax.jit(R.FasterRCNN(1).init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 64, 64, 3)))["params"]
    head = jax.jit(R.RoIHead(1).init)(jax.random.PRNGKey(1),
                                      jnp.zeros((1, 7, 7, 256)))["params"]
    params = {"body": body, "head": head}
    dt = jnp.bfloat16 if bf16 else None
    if bf16:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    fn = lambda p, f: R.full_forward(p, f, (nh, nw), canvas,
                                     [jnp.asarray(x) for x in priors],
                                     compute_dtype=dt)
    frames = jnp.zeros((2, h, w, 3), jnp.uint8)
    return fn, (params, frames)


def mtcnn_graph(bf16=True):
    from videotofaces_tpu import config
    from videotofaces_tpu.models import mtcnn as M

    config.set_precision("default")
    params = {
        "pnet": jax.jit(M.PNet().init)(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": jax.jit(M.RNet().init)(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": jax.jit(M.ONet().init)(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    dt = jnp.bfloat16 if bf16 else None
    if bf16:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    fn = lambda p, f: M.full_forward(p, f, minsize=5, compute_dtype=dt)
    frames = jnp.zeros((2, 1080, 1920, 3), jnp.uint8)
    return fn, (params, frames)


GRAPHS = {"yolo": yolo_graph, "rcnn": rcnn_graph, "mtcnn": mtcnn_graph}


if __name__ == "__main__":
    names = sys.argv[1:] or list(GRAPHS)
    for nm in names:
        fn, args = GRAPHS[nm]()
        _measure(nm, fn, args)
