"""Pallas TPU kernel: fused per-image bilinear resize + normalize for encoder
blobs (the cv2.blobFromImages replacement, SURVEY §2b).

Input: a batch of uint8 BGR images padded into one [N, 3, Hmax, Wmax] buffer
(channels-first so each channel is a lane-aligned 2D tile) plus their true
(h, w) sizes. Output: [N, out, out, 3] float32, resized with half-pixel
bilinear sampling (cv2 INTER_LINEAR semantics), channel-swapped to RGB and
affine-normalized — one kernel launch for the whole batch, no host resize
loop (the bottleneck on small-core hosts).

Formulation: separable resize as two matmuls per channel. The kernel builds
the per-image interpolation matrices ON CHIP from the (h, w) scalars
(scalar-prefetched SMEM), so one compiled kernel serves every input size:

    Wy[o, i] = hat(clip((o+.5)h/out - .5, 0, h-1) - i) * [i < h]
    chan_out = Wy @ chan @ Wx^T   (MXU), then affine normalize (VPU).

Grid: one program per image; a 256x256 image block is 196KB uint8 in VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(true_size, out_size, max_size):
    """[out, max] bilinear row-mixing matrix for a runtime ``true_size``."""
    o = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_size), 0).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_size), 1).astype(jnp.float32)
    hf = true_size.astype(jnp.float32)
    src = (o + 0.5) * hf / out_size - 0.5
    src = jnp.clip(src, 0.0, hf - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - i))
    return jnp.where(i < hf, w, 0.0)


def _make_kernel(out_size, scale, mean, swap_rb):
    def kernel(sizes_ref, img_ref, out_ref):
        idx = pl.program_id(0)
        h = sizes_ref[2 * idx]
        w = sizes_ref[2 * idx + 1]
        hm, wm = img_ref.shape[2], img_ref.shape[3]
        wy = _weights(h, out_size, hm)                          # [out, Hm]
        wx = _weights(w, out_size, wm)                          # [out, Wm]
        for c_out in range(3):
            c_in = (2 - c_out) if swap_rb else c_out
            # Mosaic can't cast u8 -> f32 directly; hop through int32
            chan = img_ref[0, c_in].astype(jnp.int32).astype(jnp.float32)  # [Hm, Wm]
            t = jnp.dot(wy, chan, preferred_element_type=jnp.float32)      # [out, Wm]
            r = jax.lax.dot_general(t, wx, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)    # [out, out]
            out_ref[0, c_out] = (r - mean) * scale

    return kernel


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "mean", "swap_rb",
                                             "interpret"))
def resize_normalize_chw_u8(images_u8_chw, sizes_hw, out_size, scale, mean,
                            swap_rb=True, interpret=False):
    """images_u8_chw: [N, 3, Hmax, Wmax] uint8 (top-left-anchored, zero-padded);
    sizes_hw: [N, 2] int32 true sizes. Returns [N, out, out, 3] float32
    ``(resized - mean) * scale`` with optional BGR->RGB swap."""
    n, _, hm, wm = images_u8_chw.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 3, hm, wm), lambda i, hw: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size), lambda i, hw: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_kernel(out_size, float(scale), float(mean), swap_rb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(sizes_hw.reshape(-1).astype(jnp.int32), images_u8_chw)
    return jnp.transpose(out, (0, 2, 3, 1))  # NHWC for the encoders


def resize_normalize_u8(images_u8, sizes_hw, out_size, scale, mean, swap_rb=True,
                        interpret=False):
    """NHWC convenience wrapper: [N, Hmax, Wmax, 3] uint8 -> [N, out, out, 3]."""
    chw = jnp.transpose(images_u8, (0, 3, 1, 2))
    return resize_normalize_chw_u8(chw, sizes_hw, out_size, scale, mean, swap_rb,
                                   interpret)


def pack_images(images, max_size=256):
    """Host helper: variable-size BGR uint8 images -> (padded [N, 3, S, S]
    channels-first, sizes [N, 2]). Images larger than ``max_size`` are
    pre-shrunk with cv2 (rare; encoder inputs are face crops)."""
    import cv2
    import numpy as np

    n = len(images)
    out = np.zeros((n, 3, max_size, max_size), np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    for k, img in enumerate(images):
        h, w = img.shape[:2]
        if max(h, w) > max_size:
            s = max_size / max(h, w)
            img = cv2.resize(img, (max(1, int(w * s)), max(1, int(h * s))))
            h, w = img.shape[:2]
        out[k, :, :h, :w] = img.transpose(2, 0, 1)
        sizes[k] = (h, w)
    return out, sizes
