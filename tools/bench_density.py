"""Realistic detection-density study (VERDICT r4 item 4).

Every bench perf number runs synthetic frames with bias-sparsified heads —
a degenerate, near-uniform-noise detection distribution. This tool builds
1080p frames with CONTROLLED realistic content density by compositing the
reference's checked-in real photos (/root/reference/tests/images/irl_det_*,
the images its own tests detect on — detection.py:126-158 is the contract)
onto a gray canvas at quiet/median/busy paste counts, then reports per
density and per detector:

  - pre-NMS candidate counts (mean / batch-max) from a probe graph;
  - presorted-NMS bucket hit rate (YOLO: fraction of batches whose max
    valid count fits the 256 bucket — the `nms_keep_mask_bucketed_presorted`
    routing condition at models/yolo.py::postprocess);
  - capacity-overflow counts at default Caps (MTCNN counts dict / YOLO
    block-top-k overflow counter);
  - device-graph ms/step vs the sparsified-random arm.

Random-init nets respond to local contrast, so pasted photo regions
produce spatially CLUSTERED candidates (unlike the sparsified arm's
uniform noise) — the closest offline proxy for trained-weight behavior;
with converted weights in weights/ the same tool measures the real thing.

Usage: python tools/bench_density.py [yolo|mtcnn|both] [batch]
"""

import glob
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videotofaces_tpu import config  # noqa: E402

REF_IMAGES = "/root/reference/tests/images/irl_det_*.jpg"
H, W = 1080, 1920
DENSITIES = {"quiet": 1, "median": 6, "busy": 20}


def composite_frames(n_frames, n_paste, rng):
    """[N, H, W, 3] uint8 BGR: gray canvas + n_paste random-scale crops of
    the reference photos at random positions (clipped to the canvas)."""
    import cv2

    srcs = [cv2.imread(p) for p in sorted(glob.glob(REF_IMAGES))]
    assert srcs and all(s is not None for s in srcs), "reference images missing"
    frames = np.full((n_frames, H, W, 3), 114, np.uint8)
    for f in range(n_frames):
        for _ in range(n_paste):
            src = srcs[rng.integers(len(srcs))]
            scale = rng.uniform(0.15, 0.7)
            sh, sw = max(32, int(src.shape[0] * scale)), max(32, int(src.shape[1] * scale))
            img = cv2.resize(src, (sw, sh), interpolation=cv2.INTER_AREA)
            y = rng.integers(0, max(1, H - sh))
            x = rng.integers(0, max(1, W - sw))
            frames[f, y:y + min(sh, H - y), x:x + min(sw, W - x)] = \
                img[:min(sh, H - y), :min(sw, W - x)]
    return frames


def sparsified_frames(n_frames, rng):
    return rng.integers(0, 255, size=(n_frames, H, W, 3)).astype(np.uint8)


def _time_graph(fn, params, staged, iters=6):
    from videotofaces_tpu.utils.profiling import sync

    sync(fn(params, staged[0]))
    sync(fn(params, staged[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(params, staged[i % len(staged)])
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def study_yolo(batch):
    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.pipeline.detection import get_detector_model

    sys.path.insert(0, ".")
    import bench as B

    det = get_detector_model("live", "yolo", None, batch_size=batch, bf16=True)
    B._sparsify(det, "yolo")
    params = det.params

    nh, nw = Y.resized_shape(H, W)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    priors_j, strides_j = jnp.asarray(priors), jnp.asarray(strides)

    fwd = jax.jit(lambda p, f: Y.full_forward(
        p, f, (nh, nw), canvas, priors_j, strides_j,
        compute_dtype=jnp.bfloat16))

    # probe: PRE-NMS candidate count per frame (the bucket-routing quantity:
    # maps -> (obj >= conf_thr) & (cls > score_thr), yolo.py::postprocess)
    def probe(p, f):
        maps = Y.full_forward(p, f, (nh, nw), canvas, priors_j, strides_j,
                              compute_dtype=jnp.bfloat16, raw_maps=True)
        b = maps[0].shape[0]
        flat = jnp.concatenate([m.reshape(b, -1, 6) for m in maps], axis=1)
        obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
        cls = jax.nn.sigmoid(flat[..., 5].astype(jnp.float32))
        ok = (obj >= 0.005) & (cls > 0.05)
        return jnp.sum(ok, axis=1)

    jprobe = jax.jit(probe)
    rng = np.random.default_rng(7)
    rows = []
    arms = [("sparsified", sparsified_frames(2 * batch, rng))]
    arms += [(name, composite_frames(2 * batch, k, rng))
             for name, k in DENSITIES.items()]
    for name, frames in arms:
        staged = [jnp.asarray(frames[i * batch:(i + 1) * batch])
                  for i in range(len(frames) // batch)]
        for s in staged:
            jax.device_get(s[0, 0, 0])
        cand = np.concatenate([np.asarray(jprobe(params, s)) for s in staged])
        batch_max = [int(np.asarray(jprobe(params, s)).max()) for s in staged]
        hit = float(np.mean([m <= 256 for m in batch_max]))
        out = [jax.device_get(fwd(params, s)) for s in staged]
        overflow = int(sum(np.asarray(o[4]).sum() for o in out))
        ms = _time_graph(fwd, params, staged)
        rows.append((name, float(cand.mean()), int(cand.max()), hit,
                     overflow, ms))
        print("yolo %-10s cand/frame mean=%7.1f max=%6d bucket256_hit=%.2f "
              "topk_overflow=%d  %.2f ms/batch-%d"
              % (name, cand.mean(), cand.max(), hit, overflow, ms, batch),
              flush=True)
    return rows


def study_mtcnn(batch):
    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.pipeline.detection import get_detector_model

    import bench as B

    det = get_detector_model("live", "mtcnn", None, batch_size=batch, bf16=True)
    B._sparsify(det, "mtcnn")
    params, caps = det.params, M.Caps()

    fwd = jax.jit(lambda p, f: M.full_forward(
        p, f, minsize=5, caps=caps, compute_dtype=jnp.bfloat16))

    rng = np.random.default_rng(7)
    rows = []
    arms = [("sparsified", sparsified_frames(2 * batch, rng))]
    arms += [(name, composite_frames(2 * batch, k, rng))
             for name, k in DENSITIES.items()]
    for name, frames in arms:
        staged = [jnp.asarray(frames[i * batch:(i + 1) * batch])
                  for i in range(len(frames) // batch)]
        for s in staged:
            jax.device_get(s[0, 0, 0])
        outs = [jax.device_get(fwd(params, s)) for s in staged]
        # counts dict: true per-stage survivor totals (overflow whenever a
        # count exceeds the NEXT buffer, models/wrappers.py::collect logic)
        over = {"pre1": 0, "cross": 0, "stage3": 0, "out": 0}
        peak = {"stage1_scale_max": 0, "cross_in": 0, "stage2": 0, "stage3": 0}
        for o in outs:
            c = o[4]
            for stage, cap in [("stage1_scale_max", "pre1"),
                               ("cross_in", "cross"),
                               ("stage2", "stage3"), ("stage3", "out")]:
                v = int(np.asarray(c[stage]).max())
                peak[stage] = max(peak[stage], v)
                over[cap] += int((np.asarray(c[stage]) > getattr(caps, cap)).sum())
        ms = _time_graph(fwd, params, staged)
        rows.append((name, peak, over, ms))
        print("mtcnn %-10s peak{scale1=%d cross=%d s2=%d s3=%d} "
              "overflows{pre1=%d cross=%d stage3=%d out=%d}  %.2f ms/batch-%d"
              % (name, peak["stage1_scale_max"], peak["cross_in"],
                 peak["stage2"], peak["stage3"], over["pre1"], over["cross"],
                 over["stage3"], over["out"], ms, batch), flush=True)
    return rows


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    config.set_precision("default")
    if which in ("yolo", "both"):
        study_yolo(batch)
    if which in ("mtcnn", "both"):
        study_mtcnn(2 if which == "both" else batch)


if __name__ == "__main__":
    main()
