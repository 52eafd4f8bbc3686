"""Resampling ops, designed for the MXU instead of translated from cv2/torch.

Three families, matching the three resampling behaviors of the reference:

1. ``bilinear_resize`` — half-pixel bilinear (cv2 INTER_LINEAR / torch
   ``interpolate(align_corners=False)``), used for detector preprocessing
   (operations/prep.py:77) and encoder blobs (facenet.py:179, vit.py:141).

2. ``integral_image`` + ``adaptive_pool_boxes`` — exact adaptive average
   pooling of *dynamic* uint8 crops (MTCNN stage 2/3 candidate windows,
   mtcnn.py:153-163) via an int32 integral image. Inputs are uint8-derived, so
   window sums are exact integers (max 2^31 safe for <=8.4MP frames) and the
   result is bit-accurate up to one f32 division.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pool_bounds_1d(n_in, n_out):
    """Static adaptive-pool window boundaries along one axis.

    Window i of an adaptive average pool from ``n_in`` to ``n_out`` elements
    covers [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out)) — the torch
    ``adaptive_avg_pool2d`` contract. Returns (starts, ends) int64 arrays of
    length ``n_out``. Single source of truth: ``adaptive_pool_full*``,
    ``pool_windows_le2`` and the phase/mm variants must all agree on these
    indices for the mm-vs-integral bit-identity argument to hold.
    """
    i = np.arange(n_out, dtype=np.int64)
    starts = (i * n_in) // n_out
    ends = -((-((i + 1) * n_in)) // n_out)
    return starts, ends


def bilinear_resize(x, out_hw):
    """Half-pixel bilinear resize over the (-3, -2) spatial axes of an NHWC/HWC array."""
    shape = list(x.shape)
    shape[-3], shape[-2] = out_hw
    return jax.image.resize(x.astype(jnp.float32), shape, method="linear", antialias=False)


def integral_image(frames, dtype=jnp.int32):
    """Zero-padded 2D inclusive-prefix-sum: [B, H, W, C] -> [B, H+1, W+1, C].

    For uint8 inputs the int32 sums are exact for frames up to ~8.4 megapixels.
    """
    s = jnp.cumsum(jnp.cumsum(frames.astype(dtype), axis=-3), axis=-2)
    s = jnp.pad(s, [(0, 0)] * (s.ndim - 3) + [(1, 0), (1, 0), (0, 0)])
    return s


def adaptive_pool_boxes(ii, boxes_xyxy, out_size):
    """Adaptive-average-pool dynamic integer windows using an integral image.

    ``ii``: [H+1, W+1, C] integral image of ONE frame (see ``integral_image``).
    ``boxes_xyxy``: [N, 4] int32 pixel windows [x1:x2, y1:y2) (already clamped,
    x2 > x1, y2 > y1). ``out_size``: (oh, ow) static.

    Returns [N, oh, ow, C] float32 window averages — exactly what
    ``F.adaptive_avg_pool2d(crop, out_size)`` computes for each crop
    (mtcnn.py:150-163), without any per-box Python loop: one gather of
    (oh+1)*(ow+1) integral values per box.
    """
    oh, ow = out_size
    x1, y1, x2, y2 = (boxes_xyxy[:, i] for i in range(4))
    h = (y2 - y1)[:, None]  # [N, 1]
    w = (x2 - x1)[:, None]

    iy = jnp.arange(oh + 1, dtype=jnp.int32)[None, :]  # window boundaries per output row
    ix = jnp.arange(ow + 1, dtype=jnp.int32)[None, :]

    # adaptive pool cell i covers [floor(i*size/n), ceil((i+1)*size/n)); the end is
    # NOT the next start in general, so both boundary grids are tracked.
    def bounds(c0, size, n, grid):
        starts = c0[:, None] + (grid[:, :n] * size) // n
        ends = c0[:, None] + -((-(grid[:, 1:] * size)) // n)
        return starts, ends

    y_start, y_end = bounds(y1, h, oh, iy)  # [N, oh]
    x_start, x_end = bounds(x1, w, ow, ix)  # [N, ow]

    hh, ww_ = ii.shape[0], ii.shape[1]
    flat = ii.reshape(hh * ww_, -1)

    def corner(yy, xx):  # yy [N, oh], xx [N, ow] -> [N, oh, ow, C]
        idx = yy[:, :, None] * ww_ + xx[:, None, :]
        return flat[idx.reshape(-1)].reshape(idx.shape + (ii.shape[-1],))

    total = (
        corner(y_end, x_end)
        - corner(y_start, x_end)
        - corner(y_end, x_start)
        + corner(y_start, x_start)
    ).astype(jnp.float32)
    area = ((y_end - y_start)[:, :, None] * (x_end - x_start)[:, None, :]).astype(jnp.float32)
    return total / jnp.maximum(area, 1.0)[..., None]


def adaptive_pool_full(ii, out_hw, true_hw):
    """Full-frame adaptive average pool with STATIC boundaries — the MTCNN
    image-pyramid resample (mtcnn.py:150-151) as 4 static gathers from the
    integral image. ii: [B, H+1, W+1, C]; returns [B, oh, ow, C] float32."""
    h, w = true_hw
    oh, ow = out_hw
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)
    rows = jnp.take(ii, ye, axis=-3) - jnp.take(ii, ys, axis=-3)
    sums = jnp.take(rows, xe, axis=-2) - jnp.take(rows, xs, axis=-2)
    area = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(np.float32)
    return sums.astype(jnp.float32) / area[..., None]


def adaptive_pool_full_s2d2(ii, out_hw, true_hw):
    """``adaptive_pool_full`` emitting the space-to-depth-2 packed layout
    directly: [B, ceil(oh/2), ceil(ow/2), 4*C] with channel layout
    (phase_row*2 + phase_col)*C + c — i.e. packed[b, i, j, (pr*2+pc)*C+c]
    == pool[b, 2i+pr, 2j+pc, c].

    The point: a packed conv1 (models/mtcnn.py::pnet_s2d_head) consuming
    this never needs the unpacked full-resolution level — the pack happens
    in the GATHER INDICES, so there is no transpose between the pyramid
    pooling and the conv to break XLA's fusion (the failure mode that
    rejected the s2d head when fed from the standard pooling).

    Phantom rows/cols (odd oh/ow) repeat the last real index; consumers must
    mask phases beyond (oh, ow) — pnet_s2d_head's pool-phase masks already
    never read them for real outputs."""
    h, w = true_hw
    oh, ow = out_hw
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)

    def phase(idx, n):
        p = idx[n::2]
        if len(p) < (len(idx) + 1) // 2:
            p = np.concatenate([p, p[-1:]])
        return p

    outs = []
    for pr in (0, 1):
        yep, ysp = phase(ye, pr), phase(ys, pr)
        rows = jnp.take(ii, yep, axis=-3) - jnp.take(ii, ysp, axis=-3)
        for pc in (0, 1):
            xep, xsp = phase(xe, pc), phase(xs, pc)
            sums = jnp.take(rows, xep, axis=-2) - jnp.take(rows, xsp, axis=-2)
            area = ((yep - ysp)[:, None] * (xep - xsp)[None, :]).astype(np.float32)
            outs.append(sums.astype(jnp.float32) / jnp.maximum(area, 1.0)[..., None])
    return jnp.concatenate(outs, axis=-1)


def adaptive_pool_full_s2d4(ii, out_hw, true_hw):
    """``adaptive_pool_full`` emitting the space-to-depth-4 packed layout:
    [B, ceil(oh/4)+1, ceil(ow/4)+1, 16*C] with channel layout
    (phase_row*4 + phase_col)*C + c — packed[b, i, j, (qr*4+qc)*C+c]
    == pool[b, 4i+qr, 4j+qc, c].

    Same trick as ``adaptive_pool_full_s2d2`` (the pack lives in the GATHER
    INDICES, no transpose), one level deeper: feeds the fully-packed PNet
    stem (models/mtcnn.py::pnet_s2d4_stem) whose 2x2 ceil maxpool collapses
    to a channel-group max, so the stem's output is ALREADY in the
    s2d2-packed pool1 layout the packed tail consumes — no repack between
    stem and tail at all.

    The extra +1 row/col lets the stem's 2x2 packed conv emit every valid
    position with a VALID conv (phantom entries repeat the last real gather
    index; consumers mask by the true dims)."""
    h, w = true_hw
    oh, ow = out_hw
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)

    def phase(idx, n, rows):
        p = idx[n::4]
        if len(p) < rows:
            p = np.concatenate([p, np.repeat(p[-1:], rows - len(p))])
        return p

    nh, nw = -(-oh // 4) + 1, -(-ow // 4) + 1
    outs = []
    for qr in range(4):
        yep, ysp = phase(ye, qr, nh), phase(ys, qr, nh)
        rows = jnp.take(ii, yep, axis=-3) - jnp.take(ii, ysp, axis=-3)
        for qc in range(4):
            xep, xsp = phase(xe, qc, nw), phase(xs, qc, nw)
            sums = jnp.take(rows, xep, axis=-2) - jnp.take(rows, xsp, axis=-2)
            area = ((yep - ysp)[:, None] * (xep - xsp)[None, :]).astype(np.float32)
            outs.append(sums.astype(jnp.float32) / jnp.maximum(area, 1.0)[..., None])
    return jnp.concatenate(outs, axis=-1)


def integral_image_chw(frames, dtype=jnp.int32):
    """Channel-major ``integral_image``: [B, H, W, C] -> [B, C, H+1, W+1].

    The transpose happens on the small uint8 input (one [B, H, W, C] ->
    [B, C, H, W] relayout), after which every consumer works on channel
    plane tensors whose minor dims are spatial — the layout the CHW PNet
    formulation (models/mtcnn.py::pnet_chw) is built around: no channel-
    padding or width-in-sublane reformatting around tiny-channel maps.
    """
    x = jnp.transpose(frames.astype(dtype), (0, 3, 1, 2))
    s = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
    return jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(1, 0), (1, 0)])


def adaptive_pool_full_chw(ii_chw, out_hw, true_hw):
    """``adaptive_pool_full`` over a channel-major integral image.

    ii_chw: [B, C, H+1, W+1] (``integral_image_chw``); returns
    [B, C, oh, ow] float32 window averages — numerically identical to
    ``adaptive_pool_full`` (exact int32 sums, one f32 division), just in
    plane layout. Same static-boundary gathers along the two minor axes.
    """
    h, w = true_hw
    oh, ow = out_hw
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)
    rows = jnp.take(ii_chw, ye, axis=-2) - jnp.take(ii_chw, ys, axis=-2)
    sums = jnp.take(rows, xe, axis=-1) - jnp.take(rows, xs, axis=-1)
    area = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(np.float32)
    return sums.astype(jnp.float32) / area


def adaptive_pool_full_chw_phase(ii_chw, out_hw, true_hw):
    """``adaptive_pool_full_chw`` emitting COLUMN-PHASE-SPLIT blocks:
    [B, C, oh, 2*WB] where cols [0, WB) are the level's even columns and
    [WB, 2*WB) the odd ones (WB = ``pallas_pnet.phase_block_w(ow)``). Pad
    entries repeat column 0 (finite garbage; the consumer masks them
    statically). The split is FREE: pure reordering of the pool's column
    gather indices. This is the fused Pallas PNet's input layout — Mosaic
    has no strided slices, so the 2x2 pool's lane decimation happens here,
    in the gather; the conv taps' +1/+2 lane shifts happen inside the
    kernel as f32 partial-sum rotates (ops/pallas_pnet.py docstring).
    """
    from .pallas_pnet import phase_block_w

    h, w = true_hw
    oh, ow = out_hw
    wb = phase_block_w(ow)
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)

    def block(start):
        idx = np.arange(start, ow, 2)
        return np.concatenate([idx, np.zeros(wb - len(idx), np.int64)])

    order = np.concatenate([block(0), block(1)])
    xs, xe = xs[order], xe[order]
    rows = jnp.take(ii_chw, ye, axis=-2) - jnp.take(ii_chw, ys, axis=-2)
    sums = jnp.take(rows, xe, axis=-1) - jnp.take(rows, xs, axis=-1)
    area = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(np.float32)
    return sums.astype(jnp.float32) / area


def pool_windows_le2(out_hw, true_hw):
    """True when every adaptive-pool window of (true_hw -> out_hw) is at most
    2 wide on both axes — guaranteed for upscaled levels (out >= true per
    axis) and exactly the regime where ``adaptive_pool_full_chw_phase_mm``
    is bit-identical to the integral-image path."""
    h, w = true_hw
    oh, ow = out_hw

    def wmax(n_in, n_out):
        s, e = pool_bounds_1d(n_in, n_out)
        return int((e - s).max())

    return wmax(h, oh) <= 2 and wmax(w, ow) <= 2


def adaptive_pool_full_chw_phase_mm(frames_norm_chw, out_hw, true_hw):
    """Gather-free ``adaptive_pool_full_chw_phase``: row pooling as the
    average of two static row-takes, column pooling as a {0,1} MXU matmul
    that emits the column-phase-split layout directly.

    Input is the NORMALIZED frame planes [B, C, H, W] ((x-127.5)/128 —
    linear, so it commutes exactly with averaging); output is
    [B, C, oh, 2*WB] in the input dtype, matching the fused Pallas PNet's
    layout. Rationale: the integral-image phase pool is ~26 ms of the
    70.9 ms minsize-5 cascade (per-op trace) — int32 row/column gathers at
    far below HBM bandwidth. Here the only gather is a contiguous-row take
    of bf16 planes ((take(ys) + take(ye-1)) / 2 covers both 1- and 2-row
    windows) and the column step runs on the MXU; dead phase-pad columns
    get an all-zero matmul column (finite, masked by the kernel).

    EXACT — bit-identical to the integral path after the bf16 cast — when
    every window is <= 2 wide on both axes (``pool_windows_le2``): the
    normalized values (2k-255)/256 and their pairwise means (k+k'-255)/256
    are exactly representable in bf16, and the {0,1} dot accumulates <= 2
    such terms in f32. Callers must route bigger-window levels to the
    integral path.
    """
    from .pallas_pnet import phase_block_w

    h, w = true_hw
    oh, ow = out_hw
    assert pool_windows_le2(out_hw, true_hw), (out_hw, true_hw)
    wb = phase_block_w(ow)
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)

    def block(start):
        idx = np.arange(start, ow, 2)
        return np.concatenate([idx, np.full(wb - len(idx), -1, np.int64)])

    order = np.concatenate([block(0), block(1)])  # [2*wb]
    live = order >= 0
    o = np.maximum(order, 0)
    cs = np.where(live, xs[o], 0)
    ce = np.where(live, xe[o], 0)  # dead slots: empty window -> zero column

    rows = (jnp.take(frames_norm_chw, jnp.asarray(ys), axis=-2)
            + jnp.take(frames_norm_chw, jnp.asarray(ye - 1), axis=-2)) * 0.5
    ci = jnp.arange(w, dtype=jnp.int32)[:, None]
    cmat = ((ci >= jnp.asarray(cs)[None, :]) & (ci < jnp.asarray(ce)[None, :]))
    cmat = cmat.astype(rows.dtype)  # [W, 2*WB]
    prec = (jax.lax.Precision.HIGHEST if rows.dtype == jnp.float32 else None)
    out = jax.lax.dot_general(rows, cmat, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    invw = jnp.asarray(np.where(live, 1.0 / np.maximum(ce - cs, 1), 0.0),
                       jnp.float32)
    return (out * invw).astype(frames_norm_chw.dtype)


def adaptive_pool_full_phase_mm01(frames_u8_chw, out_hw, true_hw):
    """Matmul adaptive pool for ARBITRARY window sizes, bit-identical to the
    integral-gather path (``adaptive_pool_full_chw_phase`` before
    ``_normalize``): [B, C, H, W] RAW-u8-VALUED planes (bf16 or f32) ->
    [B, C, oh, 2*WB] f32 window averages in the column-phase-split layout.

    Both stages are {0, 1} summation matmuls and every partial sum is a
    SMALL INTEGER, so f32 accumulation is exact end to end: u8 values are
    exact in bf16, the row stage's sums are <= 255 * wmax (~4.8k at the
    1080p minsize-5 pyramid's widest 19-row window), and the f32-precision
    column stage sums integers <= ~93k << 2^24. Dividing by the exact
    window area afterwards reproduces the integral path's float values bit
    for bit (unit-tested per level; dead phase-pad columns get an all-zero
    matmul column -> finite 0, masked downstream like the gather pads).

    Rationale: the non-le2 pyramid levels (scale < ~0.5 of the frame) were
    the last integral-image consumers in the stage-1 hot path; their
    [B, C, oh, W+1] row gathers + column gathers cost ~8-10 ms/step of the
    48.7 ms round-5 cascade (per-op trace: 4x ~0.9 ms s32 gather fusions +
    the duplicate CHW cumsum) while these dense dots are ~40 GFLOP total —
    MXU work instead of serialized gather lanes. Reference semantics:
    adaptive_avg_pool2d resample at detectors/mtcnn.py:149-156.
    """
    from .pallas_pnet import phase_block_w

    h, w = true_hw
    oh, ow = out_hw
    wb = phase_block_w(ow)
    ys, ye = pool_bounds_1d(h, oh)
    xs, xe = pool_bounds_1d(w, ow)

    def block(start):
        idx = np.arange(start, ow, 2)
        return np.concatenate([idx, np.full(wb - len(idx), -1, np.int64)])

    order = np.concatenate([block(0), block(1)])  # [2*wb]
    live = order >= 0
    o = np.maximum(order, 0)
    cs = np.where(live, xs[o], 0)
    ce = np.where(live, xe[o], 0)  # dead slots: empty window -> zero column

    ri = np.arange(h)
    rmat = ((ri[None, :] >= ys[:, None])
            & (ri[None, :] < ye[:, None])).astype(np.float32)     # [oh, H]
    ci = np.arange(w)
    cmat = ((ci[:, None] >= cs[None, :])
            & (ci[:, None] < ce[None, :])).astype(np.float32)     # [W, 2*wb]
    x = frames_u8_chw
    rf = jnp.einsum("oh,bchw->bcow", jnp.asarray(rmat, x.dtype), x,
                    preferred_element_type=jnp.float32)  # exact int sums
    sums = jnp.einsum("bcow,wp->bcop", rf, jnp.asarray(cmat),
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    area = ((ye - ys)[:, None] * np.where(live, ce - cs, 1)[None, :])
    return sums / jnp.asarray(area, jnp.float32)


def adaptive_pool_boxes_batched(ii, boxes_xyxy, imgidx, out_size):
    """``adaptive_pool_boxes`` over a batch of integral images.

    ii: [B, H+1, W+1, C]; boxes_xyxy: [N, 4] int32 windows; imgidx: [N] int32.
    Returns [N, oh, ow, C] float32.
    """
    b, hh, ww_, c = ii.shape
    flat = ii.reshape(b * hh * ww_, c)
    oh, ow = out_size
    x1, y1, x2, y2 = (boxes_xyxy[:, i] for i in range(4))
    h = (y2 - y1)[:, None]
    w = (x2 - x1)[:, None]
    iy = jnp.arange(oh + 1, dtype=jnp.int32)[None, :]
    ix = jnp.arange(ow + 1, dtype=jnp.int32)[None, :]

    def bounds(c0, size, n, grid):
        starts = c0[:, None] + (grid[:, :n] * size) // n
        ends = c0[:, None] + -((-(grid[:, 1:] * size)) // n)
        return starts, ends

    y_start, y_end = bounds(y1, h, oh, iy)
    x_start, x_end = bounds(x1, w, ow, ix)
    base = (imgidx.astype(jnp.int32) * hh * ww_)[:, None, None]

    def corner(yy, xx):
        idx = base + yy[:, :, None] * ww_ + xx[:, None, :]
        return flat[idx.reshape(-1)].reshape(idx.shape + (c,))

    total = (corner(y_end, x_end) - corner(y_start, x_end)
             - corner(y_end, x_start) + corner(y_start, x_start)).astype(jnp.float32)
    area = ((y_end - y_start)[:, :, None] * (x_end - x_start)[:, None, :]).astype(jnp.float32)
    return total / jnp.maximum(area, 1.0)[..., None]


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int):
    """[out, in] half-pixel bilinear interpolation matrix (cv2 INTER_LINEAR /
    torch align_corners=False semantics, edge-clamped)."""
    src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1.0)
    i = np.arange(in_size)[None, :]
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - i))
    return w.astype(np.float32)


def bilinear_resize_matmul(x, out_hw, canvas_hw=None):
    """Half-pixel bilinear resize as two static MXU matmuls (NHWC/HWC float).

    ``canvas_hw``: if given (>= out_hw), the interpolation matrices are
    zero-padded so the output lands on a [canvas_h, canvas_w] zero canvas
    directly — the detector pad-to-/32 step comes free out of the second
    matmul instead of being a separate full-tensor copy.

    Numerically equivalent to ``bilinear_resize`` (tested), but lowers to
    dense matmuls instead of XLA's gather/select resize expansion — measured
    ~3 ms/step faster on the 1080p detector preprocess.

    MXU precision follows the global config: fp32 passes under "highest"
    (parity mode, the default — bit-comparable to the f32 oracle), single
    bf16-multiply passes under "default" (production throughput — on-chip
    bisection showed HIGHEST-precision einsums cost 5.45 ms standalone vs
    3.26 ms at configured precision for the 1080p batch-2 R-CNN preprocess;
    full-graph body+RPN stage 12.46 -> 11.77 ms A/B. Pixel-domain bf16
    rounding is ~1 LSB of uint8).
    """
    from .. import config

    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wh = _bilinear_matrix(h, oh)
    ww = _bilinear_matrix(w, ow)
    if canvas_hw is not None:
        ch, cw = canvas_hw
        wh = np.pad(wh, ((0, ch - oh), (0, 0)))
        ww = np.pad(ww, ((0, cw - ow), (0, 0)))
    wh = jnp.asarray(wh)
    ww = jnp.asarray(ww)
    x = x.astype(jnp.float32)
    prec = config.get_precision()
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision=prec)
    return jnp.einsum("pw,...owc->...opc", ww, x, precision=prec)


def bilinear_resize_matmul_s2d(frames_u8, out_hw, canvas_hw, bgr_to_rgb=True,
                               scale=1.0 / 255.0):
    """Resize-onto-canvas emitting the SPACE-TO-DEPTH phase layout directly.

    Same math as ``bilinear_resize_matmul(frames_u8, out_hw, canvas_hw)``
    followed by BGR->RGB flip, ``* scale`` and the 2x2 space-to-depth pack
    (models/yolo.py::s2d_stem's input reshape/transpose) — but the full-res
    canvas tensor never exists: the row/column interpolation matrices are
    split by output parity, so each of the four quarter-res phase canvases
    falls out of its own pair of matmuls, and the pack is a channel concat.
    The per-op trace (tools/profile_yolo_trace.py) showed the separate
    reshape+transpose pack plus the full-canvas convert/copies cost
    ~1.9 ms/batch-8 1080p — pure relayout this formulation deletes.

    ``scale`` is folded into the row matrix (f32-rounding-level difference
    from multiplying after). Returns [B, ch/2, cw/2, 12] float32 with
    channel = (out-row parity, out-col parity, rgb) — exactly s2d_stem's
    packing. Throughput-mode only (the parity path keeps the canonical
    resize); caller casts to the compute dtype.
    """
    from .. import config

    h, w = frames_u8.shape[-3], frames_u8.shape[-2]
    oh, ow = out_hw
    ch, cw = canvas_hw
    assert ch % 2 == 0 and cw % 2 == 0, canvas_hw
    wh = np.pad(_bilinear_matrix(h, oh), ((0, ch - oh), (0, 0))) * scale
    ww = np.pad(_bilinear_matrix(w, ow), ((0, cw - ow), (0, 0)))
    prec = config.get_precision()
    x = frames_u8.astype(jnp.float32)
    rows = [jnp.einsum("oh,...hwc->...owc", jnp.asarray(wh[p::2]), x,
                       precision=prec) for p in (0, 1)]
    phases = [jnp.einsum("pw,...owc->...opc", jnp.asarray(ww[q::2]), rows[p],
                         precision=prec)
              for p in (0, 1) for q in (0, 1)]
    if bgr_to_rgb:
        # channel flip on the quarter-res phases (fuses into the concat);
        # flipping the full-res uint8 input would be a real relayout
        phases = [t[..., ::-1] for t in phases]
    return jnp.concatenate(phases, axis=-1)
