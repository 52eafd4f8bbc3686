"""Pallas TPU kernel: MTCNN stage-2/3 crop resample as per-crop DMA + matmuls.

Replaces the integral-image corner-gather resample (ops/resize.py::
adaptive_pool_boxes_batched) on the cascade's hot path. The gather form costs
4 x (out+1)^2 random ~5.5 ns accesses per CAPACITY SLOT — ~28 ms (stage 2)
+ 27 ms (stage 3) per batch-2 1080p forward at min_face_size=5, independent
of how many candidates are real (docs/ROUND2.md bisection). Here each crop
instead:

1. DMAs a static [3, Py, Px] patch of the pre-normalized planar frame from
   HBM at the crop's offset (scalar-prefetched SMEM scalars) — contiguous
   bandwidth instead of random gathers. Mosaic requires provably-aligned
   dynamic slice origins (sublane 8 / lane 128), so the patch carries
   (+8, +128) alignment slack and origins are computed as
   ``(min(start, max_start) // tile) * tile`` — a form Mosaic's divisibility
   analysis accepts — with the true window start carried as an in-patch
   offset;
2. builds the exact ``F.adaptive_avg_pool2d`` window-average matrices ON CHIP
   from the (win_h, win_w) scalars (reference crop semantics mtcnn.py:150-163,
   same bounds as ops/resize.py::_adaptive_matrix);
3. pools with two small MXU matmuls per channel (HIGHEST precision — the
   values feed RNet/ONet score thresholds).

Invalid slots (padding, off-frame, wrong size bucket) skip the DMA and the
matmuls entirely via ``pl.when`` — cost scales with REAL candidates, not
buffer capacity. Crops larger than the bucket are handled by the caller
(models/mtcnn.py) with a bigger bucket and a capacity-bounded gather
fallback.

Numerics: window sums accumulate in f32 over pre-normalized values instead
of exact int32 integral sums; for [-1, 1] pixels and <= 1M-px windows the
difference is ~1e-6 — far inside the cascade parity tolerances (1e-4).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_frames_chw(frames_chw):
    """Zero-pad [B, 3, H, W] to sublane/lane multiples (H->8k, W->128k) so
    patch origins can be tile-aligned. Padding is never inside any crop
    window (windows live in [0, H) x [0, W)) and pooling weights are zero
    outside the window, so values there are irrelevant."""
    h, w = frames_chw.shape[2:]
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if (hp, wp) == (h, w):
        return frames_chw
    return jnp.pad(frames_chw, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))


def bucket_limits(frame_hw, want_hw):
    """Effective (sy, sx) window caps for a bucket targeting ``want_hw`` on
    ``frame_hw`` frames: rounded to tile multiples, clamped so the slack
    patch fits the padded frame. Callers must route only windows with
    win_h <= sy and win_w <= sx into this bucket."""
    h, w = frame_hw
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
    sy = min(-(-want_hw[0] // 8) * 8, hp)
    sx = min(-(-want_hw[1] // 128) * 128, wp)
    return sy, sx


def _adaptive_w(size, offset, out_size, max_size):
    """[out, max] window-average matrix for a runtime window ``size`` placed
    at ``offset`` inside the patch: row o averages patch rows
    [offset + floor(o*size/out), offset + ceil((o+1)*size/out)).
    Exact for size < 2^24 (f32 integer math; quotients can't round across
    integers for denominators <= 64)."""
    o = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_size), 0).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_size), 1).astype(jnp.float32)
    sz = size.astype(jnp.float32)
    off = offset.astype(jnp.float32)
    s_o = jnp.floor(o * sz / out_size) + off
    e_o = -jnp.floor(-(o + 1.0) * sz / out_size) + off
    w = ((r >= s_o) & (r < e_o)).astype(jnp.float32)
    return w / (e_o - s_o)


def _make_kernel(out_size, py, px, hp, wp):
    def kernel(scal_ref, frames_ref, out_ref, patch, sem):
        n = pl.program_id(0)
        imgidx = scal_ref[6 * n]
        y1 = scal_ref[6 * n + 1]
        x1 = scal_ref[6 * n + 2]
        wh = scal_ref[6 * n + 3]
        ww = scal_ref[6 * n + 4]
        ok = scal_ref[6 * n + 5]

        @pl.when(ok != 0)
        def _run():
            # tile-aligned patch origin; alignment loss (<= 7 rows /
            # <= 127 cols) is absorbed by the patch slack, the clamp bound
            # hp-py / wp-px is itself tile-aligned, and the window rides at
            # (dy, dx) inside the patch
            y0 = (jnp.minimum(y1, hp - py) // 8) * 8
            x0 = (jnp.minimum(x1, wp - px) // 128) * 128
            cp = pltpu.make_async_copy(
                frames_ref.at[imgidx, :, pl.ds(y0, py), pl.ds(x0, px)],
                patch, sem)
            cp.start()
            cp.wait()
            wy = _adaptive_w(wh, y1 - y0, out_size, py)          # [out, Py]
            wx = _adaptive_w(ww, x1 - x0, out_size, px)          # [out, Px]
            # HIGHEST precision: f32 passes even in throughput mode — the
            # pooled values feed the subnet score thresholds, and these
            # matmuls are tiny; bf16 multiplies cost ~2e-4 absolute error
            # for no measurable speedup
            hp_prec = jax.lax.Precision.HIGHEST
            for c in range(3):
                t = jnp.dot(wy, patch[c], preferred_element_type=jnp.float32,
                            precision=hp_prec)
                out_ref[0, c] = jax.lax.dot_general(
                    t, wx, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hp_prec)

        @pl.when(ok == 0)
        def _skip():
            out_ref[...] = jnp.zeros_like(out_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_size", "win_hw", "interpret"))
def adaptive_pool_crops(frames_chw, scalars, out_size, win_hw, interpret=False):
    """frames_chw: [B, 3, Hp, Wp] float32, pre-normalized planar frames,
    PADDED to Hp % 8 == 0, Wp % 128 == 0 (``pad_frames_chw``); scalars:
    [N, 6] int32 rows (imgidx, y_lo, x_lo, win_h, win_w, ok) with windows
    inside the UNPADDED frame and win_h <= win_hw[0], win_w <= win_hw[1]
    whenever ok != 0 (``bucket_limits``). Returns [N, out, out, 3] float32
    (zeros where ok == 0)."""
    n = scalars.shape[0]
    _, _, hp, wp = frames_chw.shape
    sy, sx = win_hw
    assert hp % 8 == 0 and wp % 128 == 0, (hp, wp)
    assert sy % 8 == 0 and sx % 128 == 0, win_hw  # use bucket_limits
    assert sy <= hp and sx <= wp, (win_hw, frames_chw.shape)
    py = min(sy + 8, hp)
    px = min(sx + 128, wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, py, px), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_kernel(out_size, py, px, hp, wp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(scalars.reshape(-1).astype(jnp.int32), frames_chw)
    return jnp.transpose(out, (0, 2, 3, 1))
