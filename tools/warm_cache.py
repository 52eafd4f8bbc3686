"""Pre-warm the persistent XLA compilation cache for production buckets.

First compiles are the worst part of first-run UX (the Faster-RCNN and MTCNN
graphs take minutes on remote-compile TPU setups; measured trace/compile
breakdown in tools/profile_compile.py). The persistent cache
(config.py, V2F_COMPILE_CACHE) makes every later run fast — this tool
front-loads that cost at install time by AOT-compiling the exact graphs the
pipeline will request (same wrappers, same cache keys), without executing
anything.

Usage examples:
  python tools/warm_cache.py --det yolo --hw 1080x1920 --batch 8
  python tools/warm_cache.py --det mtcnn --hw 1080x1920 --batch 2 --parity
  python tools/warm_cache.py --enc facenet_vgg --enc-batch 128
  python tools/warm_cache.py --style live            # defaults for a style
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _aot(fn, *args):
    """Lower + compile without executing (writes the persistent cache)."""
    t0 = time.perf_counter()
    fn.lower(*args).compile()
    return time.perf_counter() - t0


def warm_detector(det_model, hw, batch, bf16):
    from videotofaces_tpu import config
    from videotofaces_tpu.pipeline.detection import get_detector_model

    config.set_precision("default" if bf16 else "parity")
    style = "anime" if det_model == "rcnn" else "live"
    det = get_detector_model(style, det_model, None, batch_size=batch, bf16=bf16)
    h, w = hw
    b = batch
    if det.mesh is not None:
        n = det.mesh.shape["data"]
        b = -(-b // n) * n
    frames = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    fn = det._compiled(b, h, w)
    dt = _aot(fn, det.params, frames)
    print("warmed %-6s batch %d @ %dx%d (%s): %.1fs"
          % (det_model, b, h, w, "throughput" if bf16 else "parity", dt))


def warm_encoder(enc_model, batch, bf16):
    from videotofaces_tpu import config
    from videotofaces_tpu.pipeline.grouping import get_encoder_model

    config.set_precision("default" if bf16 else "parity")
    style = "anime" if enc_model.startswith("vit") else "live"
    enc = get_encoder_model(style, enc_model, None, batch_size=batch)
    b = batch
    if enc.mesh is not None:
        n = enc.mesh.shape["data"]
        b = -(-b // n) * n
    s = enc.input_size
    blobs = jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8)
    dt = _aot(enc._compiled(b), enc.params, blobs)
    print("warmed %-12s batch %d @ %dx%d: %.1fs" % (enc_model, b, s, s, dt))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--style", choices=["live", "anime"],
                    help="warm the style's default detector + encoder")
    ap.add_argument("--det", choices=["yolo", "rcnn", "mtcnn"], action="append",
                    default=[])
    ap.add_argument("--enc", choices=["facenet_vgg", "facenet_casia",
                                      "vit_b", "vit_l"], action="append",
                    default=[])
    ap.add_argument("--hw", default="1080x1920",
                    help="frame size(s), comma-separated HxW list")
    ap.add_argument("--batch", type=int, default=4,
                    help="detection batch size (det_batch_size)")
    ap.add_argument("--enc-batch", type=int, default=16,
                    help="encoder batch size (enc_batch_size)")
    ap.add_argument("--parity", action="store_true",
                    help="warm parity-precision graphs instead of throughput")
    args = ap.parse_args()

    dets, encs = list(args.det), list(args.enc)
    if args.style:
        dets.append("rcnn" if args.style == "anime" else "yolo")
        encs.append("vit_b" if args.style == "anime" else "facenet_vgg")
    if not dets and not encs:
        ap.error("nothing to warm: pass --style, --det, or --enc")
    sizes = []
    for spec in args.hw.split(","):
        h, w = spec.lower().split("x")
        sizes.append((int(h), int(w)))
    bf16 = not args.parity
    for d in dets:
        for hw in sizes:
            warm_detector(d, hw, args.batch, bf16)
    for e in encs:
        warm_encoder(e, args.enc_batch, bf16)
    print("cache dir warmed; subsequent runs load compiled graphs from disk")


if __name__ == "__main__":
    main()
