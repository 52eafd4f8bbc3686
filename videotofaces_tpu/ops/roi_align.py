"""Multilevel RoIAlign as separable interpolation matmuls (MXU), exact
w.r.t. torchvision.ops.roi_align(sampling_ratio=0, aligned=True).

The reference calls the torchvision CUDA kernel per FPN level with a python
scatter (operations/roi.py:19-33). TPU redesign:

bilinear sampling averaged over the adaptive k x k grid is SEPARABLE: the
pooled value of bin (i, j) is  sum_r sum_s Wy[i, r] * Wx[j, s] * F[r, s, :],
where Wy/Wx are per-roi 1D weight vectors (average of k hat functions with
torchvision's edge-clamping rules). So each roi needs:

1. its FPN level (Eq.1 of the FPN paper, operations/roi.py:7-16),
2. a [window, window] feature patch dynamically gathered around the roi from
   that level (all levels flattened into one padded buffer),
3. two small matmuls: [7, P] @ [P, P, C] @ [P, 7] -> [7, 7, C].

The adaptive sample count k = ceil(roi_size/7) enters only the (cheap) weight
computation — gather cost is independent of k, unlike a direct translation.

``window`` bounds the roi span in feature units (56 covers every roi the
(800, 1333) canvas can produce on its assigned level, except degenerate
aspect-ratio > 4 proposals on P2/P3 whose edge weights then fall outside and
contribute zero).
"""

import jax
import jax.numpy as jnp
from jax import lax

from .. import config


def assign_fpn_levels(boxes, num_levels=4, canonical=224.0, base_level=2):
    """FPN level index in [0, num_levels): floor(4 + log2(sqrt(wh)/224)),
    clamped (operations/roi.py:7-16)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    k = 4.0 + jnp.log2(jnp.maximum(jnp.sqrt(ws * hs), 1e-6) / canonical)
    k = jnp.clip(k, base_level, base_level + num_levels - 1)
    return (k - base_level).astype(jnp.int32)


def _axis_weights(c1, c2, true_size, k, window_start, window, out_size=7, k_max=8):
    """Per-roi 1D pooling weights for one axis.

    c1/c2: roi start/end in feature coords (already * scale - 0.5, aligned).
    true_size: unpadded feature extent H (python int).
    k: [R] adaptive samples per bin. window_start: [R] first patch row.
    Returns [R, out_size, window] float32.
    """
    roi = c2 - c1                                   # [R]
    bin_size = roi / out_size
    kf = jnp.maximum(k.astype(jnp.float32), 1.0)
    j = jnp.arange(k_max, dtype=jnp.float32)        # sample index within a bin
    i = jnp.arange(out_size, dtype=jnp.float32)     # bin index
    # sample coords: y = c1 + i*bin + (j+0.5)*bin/k   -> [R, out, k_max]
    y = (c1[:, None, None] + i[None, :, None] * bin_size[:, None, None]
         + (j[None, None, :] + 0.5) * (bin_size / kf)[:, None, None])
    sample_ok = (j[None, None, :] < k[:, None, None]) & (y >= -1.0) & (y <= true_size)
    y = jnp.clip(y, 0.0, None)
    y_low = jnp.floor(y)
    at_edge = y_low >= true_size - 1
    y_low = jnp.where(at_edge, float(true_size - 1), y_low)
    frac = jnp.where(at_edge, 0.0, y - y_low)       # ly; weight 1-frac to y_low, frac to y_low+1

    r = jnp.arange(window, dtype=jnp.float32)[None, None, None, :]  # patch-local rows
    abs_r = window_start[:, None, None, None].astype(jnp.float32) + r
    w_low = jnp.where(abs_r == y_low[..., None], 1.0 - frac[..., None], 0.0)
    w_high = jnp.where(abs_r == y_low[..., None] + 1.0, frac[..., None], 0.0)
    w = (w_low + w_high) * sample_ok[..., None].astype(jnp.float32)
    # degenerate rois can need k > k_max samples per bin; only the first k_max
    # contribute, so normalize by the CONTRIBUTING count (an unbiased
    # subsample mean) instead of k — exact whenever k <= k_max
    denom = jnp.minimum(kf, float(k_max))
    return jnp.sum(w, axis=2) / denom[:, None, None]   # [R, out, window]


def roi_align_multilevel(fmaps, boxes, strides=(4, 8, 16, 32), out_size=7,
                         window=56, chunk=8, method="dense"):
    """fmaps: list of [H_l, W_l, C] (ONE image; vmap over the batch).
    boxes: [R, 4] in input-pixel coords. Returns [R, out, out, C].

    method="dense" (default): per-level separable pooling as two dense
    matmuls against the WHOLE feature map — [R,7,H] @ [H,W,C] @ [W,7] with
    per-roi level selection folded into the weights. No gathers at all: the
    feature map streams through the MXU at full HBM bandwidth. On-chip
    bisection showed the patch-gather formulation costing ~64 ms/batch-2
    (random 512B-row gathers); dense is an order of magnitude faster at a
    modest FLOP premium (the weights are mostly zeros).

    method="slice": per-roi ``lax.dynamic_slice`` of the [window, window]
    patch from a row-stacked level buffer — contiguous 28 KB row DMAs
    instead of dense's full-map matmuls (FLOP ∝ window², not H·W) or
    gather's 512 B element rows. Bandwidth-bound: ~window²·C bytes/roi.

    method="gather": the original windowed-patch formulation (kept for A/B
    and for very large R where the dense FLOP premium could flip the trade).
    """
    if method == "dense":
        return _roi_align_dense(fmaps, boxes, strides, out_size, chunk)
    if method == "sorted":
        return _roi_align_dense_sorted(fmaps, boxes, strides, out_size, chunk)
    if method == "slice":
        return _roi_align_slice(fmaps, boxes, strides, out_size, window, chunk)
    return _roi_align_gather(fmaps, boxes, strides, out_size, window, max(chunk, 64))


def _roi_align_dense(fmaps, boxes, strides, out_size=7, chunk=8):
    # chunk=8 measured fastest on v5e (12.0 ms vs 14.2@16, 19.3@32, 28.5 for
    # the gather method, batch-2 x 1000 rois): the [chunk, 7, W, C] intermediate
    # stays in VMEM between the two contractions
    num_levels = len(fmaps)
    n = boxes.shape[0]
    c = fmaps[0].shape[-1]
    fast = config.get_precision_name() == "default"
    prec = config.get_precision()
    levels = assign_fpn_levels(boxes, num_levels)
    zeros = jnp.zeros((n,), jnp.int32)

    pad_to = -(-n // chunk) * chunk
    n_chunks = pad_to // chunk
    out = jnp.zeros((pad_to, out_size, out_size, c), jnp.float32)
    for lv in range(num_levels):
        f = fmaps[lv]
        h, w = f.shape[0], f.shape[1]
        scale = 1.0 / strides[lv]
        x1 = boxes[:, 0] * scale - 0.5
        y1 = boxes[:, 1] * scale - 0.5
        x2 = boxes[:, 2] * scale - 0.5
        y2 = boxes[:, 3] * scale - 0.5
        kh = jnp.ceil(jnp.maximum(y2 - y1, 0.0) / out_size).astype(jnp.int32)
        kw = jnp.ceil(jnp.maximum(x2 - x1, 0.0) / out_size).astype(jnp.int32)
        wy = _axis_weights(y1, y2, h, kh, zeros, h, out_size)    # [R, out, H]
        wx = _axis_weights(x1, x2, w, kw, zeros, w, out_size)    # [R, out, W]
        sel = (levels == lv).astype(jnp.float32)
        wy = wy * sel[:, None, None]  # rois on other levels contribute zero
        if fast:
            wy, wx, f = (a.astype(jnp.bfloat16) for a in (wy, wx, f))

        def pad(a):
            return jnp.pad(a, [(0, pad_to - n)] + [(0, 0)] * (a.ndim - 1))

        wy_c = pad(wy).reshape(n_chunks, chunk, out_size, h)
        wx_c = pad(wx).reshape(n_chunks, chunk, out_size, w)

        def process(args, f=f):
            wy_k, wx_k = args
            t = jnp.einsum("rbh,hwc->rbwc", wy_k, f, precision=prec)
            return jnp.einsum("rdw,rbwc->rbdc", wx_k, t, precision=prec)

        out = out + lax.map(process, (wy_c, wx_c)).reshape(
            pad_to, out_size, out_size, c).astype(jnp.float32)
    return out[:n]


def _roi_align_dense_sorted(fmaps, boxes, strides, out_size=7, chunk=8):
    """Dense separable RoIAlign with rois SORTED by FPN level.

    The plain dense method pays every level's matmul for every roi (the
    off-level weights are zero). After a stable sort by level, all but the
    <= num_levels-1 boundary chunks are level-homogeneous, and a
    ``lax.switch`` computes just that level's [7, H_l] @ [H_l, W_l*C]
    contraction. Mixed boundary chunks fall through to the all-levels
    branch with per-roi level masking (exactly the plain dense math), so
    results are identical to method="dense" in any roi order; outputs are
    unsorted back at the end. FLOP cost drops from
    n * sum_l cost_l  to  sum_l n_l * cost_l  (~2x for RPN-proposal mixes).

    Measured on chip (batch-2 x 1000 rois, P2-heavy mix): 14.4 ms vs 13.0
    for plain dense — the lax.switch forces ``lax.map`` batching over
    images (vmap would flatten the switch into compute-every-branch
    selects), and twice as many, half-sized sequential chunk dispatches
    cost more than the saved FLOPs. Kept for A/B and for regimes (bigger
    batch per dispatch, more rois) where the trade could flip.
    """
    num_levels = len(fmaps)
    n = boxes.shape[0]
    c = fmaps[0].shape[-1]
    fast = config.get_precision_name() == "default"
    prec = config.get_precision()

    levels = assign_fpn_levels(boxes, num_levels)
    order = jnp.argsort(levels, stable=True)
    inv = jnp.argsort(order, stable=True)
    boxes = boxes[order]
    levels = levels[order]
    zeros = jnp.zeros((n,), jnp.int32)

    hmax = max(f.shape[0] for f in fmaps)
    wmax = max(f.shape[1] for f in fmaps)
    # per-roi weights AT THE ROI'S OWN LEVEL, zero-padded to the largest
    # level extent (rows past a level's true size get zero weight)
    wy = jnp.zeros((n, out_size, hmax), jnp.float32)
    wx = jnp.zeros((n, out_size, wmax), jnp.float32)
    sels = []
    for lv in range(num_levels):
        f = fmaps[lv]
        scale = 1.0 / strides[lv]
        x1 = boxes[:, 0] * scale - 0.5
        y1 = boxes[:, 1] * scale - 0.5
        x2 = boxes[:, 2] * scale - 0.5
        y2 = boxes[:, 3] * scale - 0.5
        kh = jnp.ceil(jnp.maximum(y2 - y1, 0.0) / out_size).astype(jnp.int32)
        kw = jnp.ceil(jnp.maximum(x2 - x1, 0.0) / out_size).astype(jnp.int32)
        sel = (levels == lv).astype(jnp.float32)
        sels.append(sel)
        wy = wy + sel[:, None, None] * _axis_weights(y1, y2, f.shape[0], kh, zeros, hmax, out_size)
        wx = wx + sel[:, None, None] * _axis_weights(x1, x2, f.shape[1], kw, zeros, wmax, out_size)
    sels = jnp.stack(sels, axis=1)                                     # [n, L]

    if fast:
        wy = wy.astype(jnp.bfloat16)
        wx = wx.astype(jnp.bfloat16)
        fmaps = [f.astype(jnp.bfloat16) for f in fmaps]

    pad_to = -(-n // chunk) * chunk
    n_chunks = pad_to // chunk

    def pad(a):
        return jnp.pad(a, [(0, pad_to - n)] + [(0, 0)] * (a.ndim - 1))

    wy_c = pad(wy).reshape(n_chunks, chunk, out_size, hmax)
    wx_c = pad(wx).reshape(n_chunks, chunk, out_size, wmax)
    sel_c = pad(sels).reshape(n_chunks, chunk, num_levels)
    # pad the level column with the out-of-range sentinel num_levels, NOT 0:
    # zero-padding would make a final chunk of [level-0 rois ... pad] look
    # homogeneous-level-0 by the endpoints check and pool every real roi in
    # it from fmaps[0]
    lvl_c = jnp.pad(levels, (0, pad_to - n),
                    constant_values=num_levels).reshape(n_chunks, chunk)

    def one_level(lv, wy_k, wx_k, mask=None):
        f = fmaps[lv]
        h, w = f.shape[0], f.shape[1]
        wy_l = wy_k[:, :, :h]
        if mask is not None:
            wy_l = wy_l * mask.astype(wy_l.dtype)[:, None, None]
        t = jnp.einsum("rbh,hwc->rbwc", wy_l, f, precision=prec)
        return jnp.einsum("rdw,rbwc->rbdc", wx_k[:, :, :w], t, precision=prec)

    branches = [
        (lambda args, lv=lv: one_level(lv, args[0], args[1]).astype(jnp.float32))
        for lv in range(num_levels)
    ]

    def mixed(args):
        wy_k, wx_k, sel_k = args
        acc = jnp.zeros((chunk, out_size, out_size, c), jnp.float32)
        for lv in range(num_levels):
            acc = acc + one_level(lv, wy_k, wx_k, sel_k[:, lv]).astype(jnp.float32)
        return acc

    branches.append(mixed)

    def process(args):
        wy_k, wx_k, sel_k, lvl_k = args
        hom = lvl_k[0] == lvl_k[-1]            # sorted => endpoints decide
        idx = jnp.where(hom, lvl_k[0], num_levels)
        return lax.switch(idx, branches, (wy_k, wx_k, sel_k))

    out = lax.map(process, (wy_c, wx_c, sel_c, lvl_c))
    return out.reshape(pad_to, out_size, out_size, c)[:n][inv]


def _roi_align_slice(fmaps, boxes, strides=(4, 8, 16, 32), out_size=7,
                     window=56, chunk=8):
    """Windowed-patch RoIAlign where each roi's [window, window, C] patch is
    one 2D ``lax.dynamic_slice`` out of a row-stacked buffer of all levels.

    Levels are padded to a common width and to >= window rows, then stacked
    on the row axis; a roi's patch start is (row_offset[level] + r0, c0).
    Slice starts are clamped inside the roi's own level rows, so a slice
    never crosses into another level; columns beyond a level's true width
    read zero padding, and the interpolation weights there are zero anyway.
    Numerics are identical to method="gather" (same weights, same patches).
    """
    c = fmaps[0].shape[-1]
    num_levels = len(fmaps)
    true_sizes = [(f.shape[0], f.shape[1]) for f in fmaps]

    fast = config.get_precision_name() == "default"
    if fast:
        fmaps = [f.astype(jnp.bfloat16) for f in fmaps]

    # stack levels on the row axis at a common padded width
    wp = max(max(f.shape[1] for f in fmaps), window)
    rows_off, padded = [], []
    off = 0
    for f in fmaps:
        ph = max(f.shape[0], window)
        padded.append(jnp.pad(f, ((0, ph - f.shape[0]), (0, wp - f.shape[1]), (0, 0))))
        rows_off.append(off)
        off += ph
    buf = jnp.concatenate(padded, axis=0)                              # [sumHp, Wp, C]

    levels = assign_fpn_levels(boxes, num_levels)                      # [R]
    stride_arr = jnp.asarray(strides, jnp.float32)[levels]
    scale = 1.0 / stride_arr
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    kh = jnp.ceil(jnp.maximum(y2 - y1, 0.0) / out_size).astype(jnp.int32)
    kw = jnp.ceil(jnp.maximum(x2 - x1, 0.0) / out_size).astype(jnp.int32)

    phs = jnp.asarray([max(s[0], window) for s in true_sizes], jnp.int32)[levels]
    pws = jnp.asarray([max(s[1], window) for s in true_sizes], jnp.int32)[levels]
    roff = jnp.asarray(rows_off, jnp.int32)[levels]

    def win_start(c1, extent_padded):
        s = jnp.floor(c1).astype(jnp.int32) - 1
        return jnp.clip(s, 0, jnp.maximum(extent_padded - window, 0))

    r0 = win_start(y1, phs)
    c0 = win_start(x1, pws)

    wy = jnp.zeros((boxes.shape[0], out_size, window), jnp.float32)
    wx = jnp.zeros_like(wy)
    for lv in range(num_levels):
        sel = (levels == lv)[:, None, None].astype(jnp.float32)
        wy = wy + sel * _axis_weights(y1, y2, true_sizes[lv][0], kh, r0, window, out_size)
        wx = wx + sel * _axis_weights(x1, x2, true_sizes[lv][1], kw, c0, window, out_size)

    prec = config.get_precision()
    if fast:
        wy = wy.astype(jnp.bfloat16)
        wx = wx.astype(jnp.bfloat16)

    def process(chunk_data):
        row_c, col_c, wy_c, wx_c = chunk_data
        patches = jnp.stack([
            lax.dynamic_slice(buf, (row_c[i], col_c[i], 0), (window, window, c))
            for i in range(row_c.shape[0])])                           # [r, P, P, C]
        t = jnp.einsum("rbp,rpqc->rbqc", wy_c, patches, precision=prec)
        return jnp.einsum("rdq,rbqc->rbdc", wx_c, t, precision=prec)

    n = boxes.shape[0]
    pad_to = -(-n // chunk) * chunk

    def pad(a):
        return jnp.pad(a, [(0, pad_to - n)] + [(0, 0)] * (a.ndim - 1))

    data = tuple(pad(a).reshape((pad_to // chunk, chunk) + a.shape[1:])
                 for a in (roff + r0, c0, wy, wx))
    out = lax.map(process, data)
    return out.reshape(pad_to, out_size, out_size, c)[:n].astype(jnp.float32)


def _roi_align_gather(fmaps, boxes, strides=(4, 8, 16, 32), out_size=7,
                      window=56, chunk=64):
    c = fmaps[0].shape[-1]
    num_levels = len(fmaps)
    true_sizes = [(f.shape[0], f.shape[1]) for f in fmaps]

    # patch gathers dominate HBM traffic; in throughput mode carry them in
    # bf16 (2x bandwidth), keeping the contraction accumulation in f32
    fast = config.get_precision_name() == "default"
    if fast:
        fmaps = [f.astype(jnp.bfloat16) for f in fmaps]

    # flatten levels into one padded row-major buffer
    padded, offsets, pad_ws = [], [], []
    off = 0
    for f in fmaps:
        ph = max(f.shape[0], window)
        pw = max(f.shape[1], window)
        padded.append(jnp.pad(f, ((0, ph - f.shape[0]), (0, pw - f.shape[1]), (0, 0)))
                      .reshape(ph * pw, c))
        offsets.append(off)
        pad_ws.append(pw)
        off += ph * pw
    flat = jnp.concatenate(padded, axis=0)

    levels = assign_fpn_levels(boxes, num_levels)                      # [R]
    stride_arr = jnp.asarray(strides, jnp.float32)[levels]             # [R]
    scale = 1.0 / stride_arr
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    kh = jnp.ceil(jnp.maximum(y2 - y1, 0.0) / out_size).astype(jnp.int32)
    kw = jnp.ceil(jnp.maximum(x2 - x1, 0.0) / out_size).astype(jnp.int32)

    hs = jnp.asarray([s[0] for s in true_sizes], jnp.float32)[levels]
    ws = jnp.asarray([s[1] for s in true_sizes], jnp.float32)[levels]
    phs = jnp.asarray([max(s[0], window) for s in true_sizes], jnp.int32)[levels]
    pws = jnp.asarray([max(s[1], window) for s in true_sizes], jnp.int32)[levels]
    off_arr = jnp.asarray(offsets, jnp.int32)[levels]
    padw_arr = jnp.asarray(pad_ws, jnp.int32)[levels]

    def win_start(c1, extent_padded):
        s = jnp.floor(c1).astype(jnp.int32) - 1
        return jnp.clip(s, 0, jnp.maximum(extent_padded - window, 0))

    r0 = win_start(y1, phs)                                            # [R]
    c0 = win_start(x1, pws)

    # weights need per-roi true sizes: compute per level then select (sizes are
    # python ints inside _axis_weights; 4 levels -> 4 cheap vectorized passes)
    wy = jnp.zeros((boxes.shape[0], out_size, window), jnp.float32)
    wx = jnp.zeros_like(wy)
    for lv in range(num_levels):
        sel = (levels == lv)[:, None, None].astype(jnp.float32)
        wy = wy + sel * _axis_weights(y1, y2, true_sizes[lv][0], kh, r0, window, out_size)
        wx = wx + sel * _axis_weights(x1, x2, true_sizes[lv][1], kw, c0, window, out_size)

    rows = jnp.arange(window, dtype=jnp.int32)
    prec = config.get_precision()

    def process(chunk_data):
        off_c, padw_c, r0_c, c0_c, wy_c, wx_c = chunk_data
        # global flat indices of the [window, window] patch
        gy = (r0_c[:, None] + rows[None, :])                            # [r, P]
        gx = (c0_c[:, None] + rows[None, :])
        idx = off_c[:, None, None] + gy[:, :, None] * padw_c[:, None, None] + gx[:, None, :]
        patch = flat[idx.reshape(-1)].reshape(idx.shape + (c,))        # [r, P, P, C]
        t = jnp.einsum("rbp,rpqc->rbqc", wy_c, patch, precision=prec)
        return jnp.einsum("rdq,rbqc->rbdc", wx_c, t, precision=prec)

    n = boxes.shape[0]
    pad_to = -(-n // chunk) * chunk
    def pad(a):
        return jnp.pad(a, [(0, pad_to - n)] + [(0, 0)] * (a.ndim - 1))

    data = tuple(pad(a).reshape((pad_to // chunk, chunk) + a.shape[1:])
                 for a in (off_arr, padw_arr, r0, c0, wy, wx))
    out = lax.map(process, data)                                       # [n_chunks, chunk, 7, 7, C]
    return out.reshape(pad_to, out_size, out_size, c)[:n]


def roi_align_multilevel_pallas(fmaps, boxes, valid, strides=(4, 8, 16, 32),
                                out_size=7, main_hw=(32, 40), big_hw=(48, 56),
                                big_cap=128, interpret=False):
    """Whole-batch multilevel RoIAlign on the Pallas patch engine
    (ops/pallas_roialign.py) — cost follows REAL rois, not capacity.

    fmaps: list of [B, H_l, W_l, C]; boxes [B, R, 4] input-pixel coords;
    valid [B, R] bool (dead slots skip their DMA + dots entirely).
    Returns (pooled [B, R, out, out, C] float32, dropped [B] int32,
    kept [B, R] bool — False for rois whose features were dropped by
    big-bucket overflow; callers MUST mask those out of validity, or the
    all-zero pooled features turn into constant bias-driven head scores,
    truncated [B] int32 — kept rois whose sampling window exceeded even
    ``big_hw`` and ran window-truncated, see below).

    Buckets: a roi needs a [ext_y, ext_x] sampling window on its assigned
    level (span + 2 for the bilinear halo). ``main_hw`` covers every
    non-P5-clamped roi by construction (level assignment keeps spans in
    [14, 28); P2-clamped tiny rois are smaller) and runs with a full-capacity
    slot per roi; P5-clamped rois route to ``big_hw`` capped at ``big_cap``
    per image (slots are score-descending, so the best keep their features).
    Degenerate aspect-ratio rois whose window exceeds ``big_hw`` run with a
    TRUNCATED window (samples outside contribute zero — the same
    approximation the window-56 slice/gather methods make; the exact dense
    method has no window). ``dropped`` counts big-bucket overflow per image.

    THROUGHPUT-mode arm (bf16 patches and weights, f32 accumulation);
    parity mode keeps the exact f32 dense method.
    """
    from .pallas_roialign import (FIX, roi_align_patches, spread_matrices,
                                  sublane_align)
    from .nms import topk_by_score

    if out_size != 7:
        raise ValueError(
            "the pallas patch engine hardcodes the 7x7 grid-row form "
            "(GRID_ROWS=56, bin (i,j) -> row i*8+j); out_size=%r is not "
            "supported — use method='dense' for other sizes" % (out_size,))
    num_levels = len(fmaps)
    b, rr = boxes.shape[:2]
    c = fmaps[0].shape[-1]
    algn = sublane_align()
    wp = -(-max(f.shape[2] for f in fmaps) // algn) * algn
    # small canvases (tests, tiny inputs): buckets can't be wider than the
    # stack; rois too wide even for the clamped big bucket run truncated
    rnd = lambda v: -(-v // algn) * algn
    main_hw = (main_hw[0], min(rnd(main_hw[1]), wp))
    big_hw = (big_hw[0], min(rnd(big_hw[1]), wp))
    stk = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, wp - f.shape[2]), (0, 0)))
         for f in fmaps], axis=1)                       # [B, HS, Wp, C]
    hs = stk.shape[1]
    stack = stk.reshape(b * hs, wp, c)
    pad_rows = max(main_hw[0], big_hw[0])
    stack = jnp.pad(stack, ((0, pad_rows), (0, 0), (0, 0)))

    import numpy as np

    roffs = np.concatenate([[0], np.cumsum([f.shape[1] for f in fmaps[:-1]])])
    hls = np.asarray([f.shape[1] for f in fmaps], np.int32)
    wls = np.asarray([f.shape[2] for f in fmaps], np.int32)
    levels = assign_fpn_levels(boxes, num_levels)       # [B, R]
    scale = jnp.asarray([1.0 / s for s in strides], jnp.float32)[levels]
    hl = jnp.asarray(hls)[levels]
    wl = jnp.asarray(wls)[levels]
    roff = jnp.asarray(roffs.astype(np.int32))[levels]

    c1x = boxes[..., 0] * scale - 0.5
    c1y = boxes[..., 1] * scale - 0.5
    c2x = boxes[..., 2] * scale - 0.5
    c2y = boxes[..., 3] * scale - 0.5
    kh = jnp.ceil(jnp.maximum(c2y - c1y, 0.0) / out_size).astype(jnp.int32)
    kw = jnp.ceil(jnp.maximum(c2x - c1x, 0.0) / out_size).astype(jnp.int32)

    def window(c1, c2, t):
        ws = jnp.clip(jnp.floor(c1).astype(jnp.int32), 0, t - 1)
        we = jnp.clip(jnp.floor(c2).astype(jnp.int32) + 1, 0, t - 1)
        return ws, we - ws + 1

    wsy, ext_y = window(c1y, c2y, hl)
    wsx, ext_x = window(c1x, c2x, wl)
    img = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, rr))
    packed_dims = (hl << 16) | wl

    def scalars_for(ok):
        # col alignment happens in-kernel (Mosaic provability), so the
        # scalar rows are bucket-independent
        y0 = img * hs + roff + wsy
        wpv = jnp.full_like(wsy, wp)
        return jnp.stack(
            [ok.astype(jnp.int32), y0, wsx, wsy, wpv,
             jnp.round(c1y * FIX).astype(jnp.int32),
             jnp.round(c2y * FIX).astype(jnp.int32),
             jnp.round(c1x * FIX).astype(jnp.int32),
             jnp.round(c2x * FIX).astype(jnp.int32),
             kh, kw, packed_dims], axis=-1).reshape(b * rr, 12)

    fits_main = (ext_y <= main_hw[0]) & (ext_x <= main_hw[1] - (algn - 1))
    ok_main = valid & fits_main
    out = roi_align_patches(stack, scalars_for(ok_main),
                            *spread_matrices((main_hw[0], main_hw[1]),
                                             stack.dtype),
                            win_hw=main_hw, interpret=interpret)  # [N, 56, C]

    want = valid & ~fits_main
    cap = min(big_cap, rr)
    # slots are score-descending per image: first-`cap` wanted picks the best
    idxb, selb = jax.vmap(lambda wv: topk_by_score(
        wv.astype(jnp.float32), wv, cap))(want)
    flatb = (idxb + (jnp.arange(b, dtype=idxb.dtype) * rr)[:, None]).reshape(-1)
    scal = scalars_for(jnp.ones((b, rr), bool))
    scal_b = scal[flatb] * selb.reshape(-1, 1).astype(jnp.int32)
    out_b = roi_align_patches(stack, scal_b,
                              *spread_matrices((big_hw[0], big_hw[1]),
                                               stack.dtype),
                              win_hw=big_hw, interpret=interpret)
    tgt = jnp.where(selb.reshape(-1), flatb, b * rr)
    out = out.at[tgt].set(out_b, mode="drop")
    dropped = (jnp.sum(want, axis=1) - jnp.sum(selb, axis=1)).astype(jnp.int32)
    placed = jnp.zeros((b * rr,), bool).at[tgt].set(True, mode="drop")
    kept = ok_main | (want & placed.reshape(b, rr))
    # degenerate-aspect rois whose window exceeds even big_hw stay kept but
    # run TRUNCATED (outside samples contribute zero) — counted so users of
    # this opt-in engine can detect the approximation, mirroring ``dropped``
    fits_big = (ext_y <= big_hw[0]) & (ext_x <= big_hw[1] - (algn - 1))
    truncated = jnp.sum(want & placed.reshape(b, rr) & ~fits_big,
                        axis=1).astype(jnp.int32)

    pooled = out.reshape(b, rr, out_size, 8, c)[:, :, :, :out_size]
    return pooled, dropped, kept, truncated
