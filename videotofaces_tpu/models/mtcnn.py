"""MTCNN 3-stage cascade face detector, compiled as ONE static-shape XLA graph
per (batch, height, width, min_face_size) bucket.

Architecture parity target: detectors/mtcnn.py (PNet/RNet/ONet from the
published facenet-pytorch weights layout; pipeline semantics at
mtcnn.py:133-252). The reference is the most dynamic model in the suite —
a data-dependent image pyramid, six filter points, and per-box Python crop
loops. TPU redesign:

- the scale pyramid is a pure function of (H, W, minsize) -> computed on host,
  baked into the graph; every pyramid level is an EXACT adaptive-average
  resample done with 4 static gathers from one int32 integral image of the
  uint8 frame (window sums are exact integers — see ops/resize.py);
- stage 2/3 candidate crops (per-box Python loop at mtcnn.py:153-163) become
  one batched integral-image gather each: dynamic integer windows ->
  24x24/48x48 adaptive averages, no loops;
- every filter/NMS point carries fixed-capacity buffers + validity masks;
  capacities are configurable (defaults sized for 1080p, minsize 5) and the
  true candidate counts are returned so the host can detect overflow;
- stage 1/2 NMS uses the exact greedy fixpoint (ops/nms.py), stage 3 uses the
  reference's IoM chain suppression, which is a pure matrix op.
"""

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import (iom_chain_suppress, nms_keep_mask,
                        nms_keep_mask_bucketed, topk_by_score)
from ..ops.select import block_topk_indices, pick_rows_onehot
from ..ops.pallas_crops import adaptive_pool_crops, bucket_limits, pad_frames_chw
from ..ops.pallas_pnet import (pack_pnet_weights, pack_pnet_weights_r4,
                                pad_frames_chw16, pnet_level, pnet_level_fused)
from ..ops.resize import (adaptive_pool_boxes_batched, adaptive_pool_full,
                          adaptive_pool_full_chw, adaptive_pool_full_chw_phase,
                          adaptive_pool_full_chw_phase_mm,
                          adaptive_pool_full_phase_mm01,
                          adaptive_pool_full_s2d2, adaptive_pool_full_s2d4,
                          integral_image, pool_windows_le2)
from .. import config
from .layers import ConvUnit, PReLU, max_pool2d


def _pconv(cout, k, name):
    return ConvUnit(cout, k, 1, 0, "prelu", None, bias=True, name=name)


class PNet(nn.Module):
    """Fully-convolutional proposal net: 12x12 receptive field, stride 2.

    ``from_pool1``: input is already the pool1 output (the space-to-depth
    stem ``pnet_s2d_head`` computed conv1+prelu1+pool1 outside the module —
    conv1's 3 input channels waste 125/128 MXU lanes at full pyramid area,
    the dominant cost at min_face_size=5).

    ``to_pool1``: stop after conv1+prelu1+pool1 and return that map (the
    throughput path runs conv2..heads via ``pnet_s2d_tail`` instead)."""

    from_pool1: bool = False
    to_pool1: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.from_pool1:
            x = _pconv(10, 3, "conv1")(x)
            x = max_pool2d(x, 2, 2, ceil_mode=True)
            if self.to_pool1:
                return x
        x = _pconv(16, 3, "conv2")(x)
        x = _pconv(32, 3, "conv3")(x)
        prec = config.get_precision()
        prob = jax.nn.softmax(nn.Conv(2, (1, 1), precision=prec, name="cls")(x), axis=-1)[..., 1]
        reg = nn.Conv(4, (1, 1), precision=prec, name="reg")(x)
        return reg, prob


def pnet_s2d_head(pnet_params, x, packed_hw=None, cache=None):
    """conv1 (3x3 VALID, 3->10) + PReLU + ceil 2x2 s2 maxpool via space-to-
    depth: the packed conv contracts 12 -> 40 channels at quarter area
    (identical taps), and the stride-2 pool collapses to a masked max over
    the 4 phase groups — the full-resolution 10-channel map is never
    materialized. Returns pool1's output [B, ceil((H-2)/2), ceil((W-2)/2), 10].

    ``packed_hw``: when given, ``x`` is ALREADY phase-packed
    [B, ceil(H/2), ceil(W/2), 12] (ops/resize.py::adaptive_pool_full_s2d2 —
    the pyramid pooling emits this layout straight from its gather indices)
    and ``packed_hw`` is the true unpacked (H, W). Phantom odd-edge phases in
    the packed input only ever feed masked outputs, so their values are
    irrelevant.

    ``cache``: optional dict shared across calls of one forward — the packed
    weight is a pure function of the params, identical for all ~16 pyramid
    levels, and its ~144 .at[].set placements would otherwise be re-emitted
    into the jaxpr per level (trace/compile bloat on the minutes-long
    dev-tunnel compiles).
    """
    prec = config.get_precision()
    k1 = pnet_params["conv1"]["conv"]["kernel"]       # [3, 3, 3, 10]
    b1 = pnet_params["conv1"]["conv"]["bias"]
    alpha = pnet_params["conv1"]["prelu"]["alpha"]
    # match flax nn.Conv's dtype promotion for mixed param/input dtypes
    dt = jnp.promote_types(x.dtype, k1.dtype)
    x, k1, b1, alpha = (t.astype(dt) for t in (x, k1, b1, alpha))
    if packed_hw is None:
        b, sh, sw, _ = x.shape
        she, swe = sh + (sh % 2), sw + (sw % 2)
        x = jnp.pad(x, ((0, 0), (0, she - sh), (0, swe - sw), (0, 0)))
        s2d = x.reshape(b, she // 2, 2, swe // 2, 2, 3)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, she // 2, swe // 2, 12)
    else:
        b, sh, sw = x.shape[0], packed_hw[0], packed_hw[1]
        s2d = x
    hv, wv = sh - 2, sw - 2                           # VALID conv1 output size

    if cache is not None and ("w2", dt) in cache:
        w2 = cache[("w2", dt)]
    else:
        w2 = jnp.zeros((2, 2, 12, 40), k1.dtype)
        for pi in (0, 1):
            for pr in (0, 1):
                for r in (0, 1):
                    di = 2 * r + pr - pi              # VALID window offset
                    if not 0 <= di <= 2:
                        continue
                    for pj in (0, 1):
                        for pc in (0, 1):
                            for s in (0, 1):
                                dj = 2 * s + pc - pj
                                if not 0 <= dj <= 2:
                                    continue
                                w2 = w2.at[r, s, pr * 6 + pc * 3:pr * 6 + pc * 3 + 3,
                                           pi * 20 + pj * 10:pi * 20 + pj * 10 + 10
                                           ].set(k1[di, dj])
        if cache is not None:
            cache[("w2", dt)] = w2
    y = jax.lax.conv_general_dilated(
        s2d, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    y = y + jnp.tile(b1, 4)
    a4 = jnp.tile(alpha, 4)
    y = jnp.maximum(y, 0) + a4 * jnp.minimum(y, 0)    # PReLU on packed phases

    # ceil-mode 2x2 s2 maxpool == max over phase groups, masking phases whose
    # full-res position falls outside the VALID conv1 output (static masks).
    # The conv's channel layout is already pool-phase-major (pi*20+pj*10+c),
    # so each phase is a LAST-AXIS slice — no 6-D reshape: the earlier
    # reshape(b,ni,nj,2,2,10) form made XLA materialize the phase tensor in a
    # tiny-minor-dim layout and copy every slice out of it (~45 ms/step of
    # pure relayout on the 1080p minsize-5 pyramid, per-op trace
    # tools/profile_mtcnn_trace.py).
    ni, nj = -(-hv // 2), -(-wv // 2)
    yc = y[:, :ni, :nj]
    neg = jnp.asarray(-jnp.inf, yc.dtype)
    rows1 = jnp.asarray((2 * np.arange(ni) + 1 < hv))[None, :, None]
    cols1 = jnp.asarray((2 * np.arange(nj) + 1 < wv))[None, None, :]
    p00 = yc[..., 0:10]
    p01 = jnp.where(cols1[..., None], yc[..., 10:20], neg)
    p10 = jnp.where(rows1[..., None], yc[..., 20:30], neg)
    p11 = jnp.where((rows1 & cols1)[..., None], yc[..., 30:40], neg)
    return jnp.maximum(jnp.maximum(p00, p01), jnp.maximum(p10, p11))


def pnet_s2d4_stem(pnet_params, packed4, level_hw, cache=None):
    """conv1 + PReLU + ceil 2x2 s2 maxpool with EVERYTHING packed: input is
    the space-to-depth-4 pyramid level (ops/resize.py::adaptive_pool_full_s2d4,
    [B, ceil(sh/4)+1, ceil(sw/4)+1, 48]), output is pool1 ALREADY in the
    s2d2-packed layout ``pnet_s2d_tail(packed_in_hw=...)`` consumes:
    ([B, ni, nj, 40] with channel (pr*2+pc)*10+c == pool1[2I+pr, 2J+pc, c],
    (P, Q)) where (P, Q) are pool1's true dims.

    Why a second packing level: the s2d2 stem's output is the UNPACKED pool1
    map, which the packed tail must re-pack with a pad+reshape+transpose that
    XLA materializes (~12 ms/step of pad-clones + copies on the 1080p
    minsize-5 pyramid, per-op trace tools/profile_mtcnn_trace.py). At s2d4,
    conv1's 16 output phase groups are ordered (pool_phase)*4 + sub_tap, so
    the 2x2 ceil maxpool collapses to a max over 4 CONTIGUOUS last-axis
    slices per pool phase and the result needs no repack at all. conv1 also
    contracts K=48 instead of 12 (4x the MXU lane use) at 1/16 area.

    Tap placement identical to the module conv1 (VALID, stride 1); phantom
    pool positions (beyond P, Q) are zeroed; phantom taps (full-res position
    beyond the VALID conv output) are -inf'd before the max — ceil-mode
    semantics exactly as ``max_pool2d(ceil_mode=True)``."""
    prec = config.get_precision()
    k1 = pnet_params["conv1"]["conv"]["kernel"]       # [3, 3, 3, 10]
    b1 = pnet_params["conv1"]["conv"]["bias"]
    alpha = pnet_params["conv1"]["prelu"]["alpha"]
    dt = jnp.promote_types(packed4.dtype, k1.dtype)
    packed4, k1, b1, alpha = (t.astype(dt) for t in (packed4, k1, b1, alpha))
    sh, sw = level_hw
    hv, wv = sh - 2, sw - 2                           # VALID conv1 output size

    # 2x2 packed conv, 48 -> 160: output group g = (pr*2+pc)*4 + (sr*2+sc)
    # holds full-res phase (qr, qc) = (2*pr+sr, 2*pc+sc). Built once per
    # forward (``cache``) — identical for every pyramid level.
    if cache is not None and ("w4", dt) in cache:
        w4 = cache[("w4", dt)]
    else:
        w4 = jnp.zeros((2, 2, 48, 160), k1.dtype)
        for qr in range(4):
            for qc in range(4):
                g = ((qr // 2) * 2 + (qc // 2)) * 4 + ((qr % 2) * 2 + (qc % 2))
                for dy in range(3):
                    for dx in range(3):
                        r, p4r = divmod(qr + dy, 4)
                        s, p4c = divmod(qc + dx, 4)
                        gi = (p4r * 4 + p4c) * 3
                        w4 = w4.at[r, s, gi:gi + 3, g * 10:g * 10 + 10].set(k1[dy, dx])
        if cache is not None:
            cache[("w4", dt)] = w4
    y = jax.lax.conv_general_dilated(
        packed4, w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    y = y + jnp.tile(b1, 16)
    a16 = jnp.tile(alpha, 16)
    y = jnp.maximum(y, 0) + a16 * jnp.minimum(y, 0)   # PReLU on packed phases

    ni, nj = y.shape[1:3]                             # ceil(sh/4), ceil(sw/4)
    P, Q = -(-hv // 2), -(-wv // 2)                   # true pool1 dims
    neg = jnp.asarray(-jnp.inf, y.dtype)
    iarr, jarr = np.arange(ni), np.arange(nj)
    outs = []
    for pr in (0, 1):
        for pc in (0, 1):
            base = (pr * 2 + pc) * 40
            acc = None
            for sr in (0, 1):
                rows_ok = (4 * iarr + 2 * pr + sr) < hv
                for sc in (0, 1):
                    cols_ok = (4 * jarr + 2 * pc + sc) < wv
                    m = jnp.asarray(rows_ok[:, None] & cols_ok[None, :])
                    o = base + (sr * 2 + sc) * 10
                    sl = jnp.where(m[None, ..., None], y[..., o:o + 10], neg)
                    acc = sl if acc is None else jnp.maximum(acc, sl)
                    if sr == 0 and sc == 0:
                        alive = m                     # pool position is real
            # phantom pool positions: every tap -inf'd above; zero them so
            # downstream convs stay finite (consumers mask by (P, Q))
            outs.append(jnp.where(alive[None, ..., None], acc,
                                  jnp.zeros((), acc.dtype)))
    return jnp.concatenate(outs, axis=-1), (P, Q)


def _pack_s2d_conv(k, cin, cout):
    """Pack a 3x3 VALID conv (cin -> cout) into its space-to-depth-2 form: a
    2x2 VALID conv over [.., 4*cin] phase-packed maps producing [.., 4*cout]
    phase-packed maps (channel layout (phase_row*2+phase_col)*C + c). Taps are
    placed, never changed — the packed conv computes the identical sums, with
    7/16 of the packed weight zero (the FLOP overhead that buys full-lane
    contraction dims: conv2 K=160/N=64, conv3 K=256/N=128, vs the unpacked
    K=90/N=16 and K=144/N=32 that run PNet at ~1.7 TFLOP/s)."""
    w = jnp.zeros((2, 2, 4 * cin, 4 * cout), k.dtype)
    for a in (0, 1):
        for bb in (0, 1):
            for dy in range(3):
                for dx in range(3):
                    r, pr = divmod(a + dy, 2)
                    s, pc = divmod(bb + dx, 2)
                    gi = (pr * 2 + pc) * cin
                    go = (a * 2 + bb) * cout
                    w = w.at[r, s, gi:gi + cin, go:go + cout].set(k[dy, dx])
    return w


def _unpack_s2d(y, ph, pw):
    """[B, nh, nw, 4*C] phase-packed -> [B, ph, pw, C] (phantom rows/cols from
    even-padding are sliced away)."""
    b, nh, nw, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, nh, nw, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * nh, 2 * nw, c)[:, :ph, :pw]


def pnet_s2d_tail(pnet_params, pool1, packed_out=False, packed_in_hw=None,
                  cache=None):
    """conv2 + conv3 (+PReLUs) + cls/reg heads in space-to-depth-2 packed
    form, from the pool1 map. Returns (reg [B, ph, pw, 4], prob [B, ph, pw])
    with ph = P-4, pw = Q-4 — same taps as the module path (unit-tested),
    different accumulation order.

    ``packed_out=True`` skips the final spatial unpack (a 6-D transpose XLA
    materializes at ~14 ms/step on the 1080p minsize-5 pyramid) and returns
    ``(reg_p [B, nh, nw, 16], prob_p [B, nh, nw, 4], (ph, pw))`` still in the
    phase-packed layout: channel group p = pr*2+pc at packed (I, J) is the
    unpacked position (2I+pr, 2J+pc); positions >= (ph, pw) are phantoms the
    consumer must mask (full_forward's packed selection does the index math
    instead of ever building the unpacked map).

    Why: PNet's 10->16 and 16->32 convs are ~82% of its FLOPs and run lane-
    starved (N=16/32 of 128). Packing AFTER pool1 keeps the integral-image
    pyramid pooling fused into conv1 (transposing conv1's input is what
    regressed the cascade when ``pnet_s2d_head`` was measured, docs/ROADMAP),
    and the transpose here touches a quarter-area 10-channel map instead."""
    prec = config.get_precision()
    p = pnet_params
    k2 = p["conv2"]["conv"]["kernel"]             # [3, 3, 10, 16]
    k3 = p["conv3"]["conv"]["kernel"]             # [3, 3, 16, 32]
    kc = p["cls"]["kernel"]                       # [1, 1, 32, 2]
    kr = p["reg"]["kernel"]                       # [1, 1, 32, 4]
    dt = jnp.promote_types(pool1.dtype, k2.dtype)
    pool1 = pool1.astype(dt)

    b = pool1.shape[0]
    if packed_in_hw is not None:
        # pool1 is ALREADY s2d2-packed [B, nh, nw, 40] (pnet_s2d4_stem);
        # packed_in_hw carries the true pool dims — the packed map may hold
        # extra phantom rows/cols whose outputs the (ph, pw) masks kill
        P, Q = packed_in_hw
        x = pool1
    else:
        _, P, Q = pool1.shape[:3]
        pe, qe = P + (P % 2), Q + (Q % 2)
        x = jnp.pad(pool1, ((0, 0), (0, pe - P), (0, qe - Q), (0, 0)))
        x = x.reshape(b, pe // 2, 2, qe // 2, 2, 10)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, pe // 2, qe // 2, 40)
    ph, pw = P - 4, Q - 4

    def cached(key, build):
        # packed weights are pure functions of the params — build once per
        # forward and reuse across all pyramid levels (see pnet_s2d_head)
        if cache is not None and (key, dt) in cache:
            return cache[(key, dt)]
        w = build()
        if cache is not None:
            cache[(key, dt)] = w
        return w

    def packed_pconv(x, name, cin, cout):
        w = cached(name, lambda: _pack_s2d_conv(
            p[name]["conv"]["kernel"].astype(dt), cin, cout))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
        y = y + jnp.tile(p[name]["conv"]["bias"].astype(dt), 4)
        al = jnp.tile(p[name]["prelu"]["alpha"].astype(dt), 4)
        return jnp.maximum(y, 0) + al * jnp.minimum(y, 0)

    x = packed_pconv(x, "conv2", 10, 16)
    x = packed_pconv(x, "conv3", 16, 32)

    # 1x1 heads on packed maps: block-diagonal weights, one matmul each
    wc = cached("wc", lambda: jax.scipy.linalg.block_diag(
        *([kc[0, 0].astype(dt)] * 4)))                              # [128, 8]
    wr = cached("wr", lambda: jax.scipy.linalg.block_diag(
        *([kr[0, 0].astype(dt)] * 4)))                              # [128, 16]
    cls = jnp.dot(x, wc, precision=prec) + jnp.tile(p["cls"]["bias"].astype(dt), 4)
    reg = jnp.dot(x, wr, precision=prec) + jnp.tile(p["reg"]["bias"].astype(dt), 4)
    nh, nw = cls.shape[1:3]
    # 2-way softmax == sigmoid of the logit difference (exact identity);
    # channel layout is p*2 + {bg, face}, so even/odd strided slices avoid a
    # [.., 4, 2] reshape that XLA would relayout
    prob = jax.nn.sigmoid(cls[..., 1::2] - cls[..., 0::2])    # [B, nh, nw, 4]
    if packed_out:
        return reg, prob, (ph, pw)
    return _unpack_s2d(reg, ph, pw), _unpack_s2d(prob, ph, pw)[..., 0]


def pnet_chw(pnet_params, x, cache=None, conv1_mode="dot"):
    """Whole PNet (conv1 .. heads) on CHANNEL-MAJOR planes: input is the
    normalized pyramid level as [B, 3, sh, sw] (``adaptive_pool_full_chw``),
    output is (reg [B, 4, ph, pw], prob [B, ph, pw]) with ph = P-4, pw = Q-4.
    Same taps as the module path (unit-tested), different accumulation order.

    Why a third formulation: the per-op trace of the module path
    (tools/profile_mtcnn_trace.py, 1080p minsize-5 bf16) shows XLA's conv
    emitter runs PNet's tiny-channel NHWC convs at ~52 GB/s / ~1 TFLOP/s
    (6% of HBM bandwidth) and spends 21 ms in the pool1 ``reduce_window``
    alone — all of it channel-minor layout handling around C in {3, 10, 16,
    32}. On channel planes the minor dims are SPATIAL, so:

    - conv1 is 9 shifted-plane slices contracted in one [27, 10] matmul
      (``conv1_mode="dot"``) or 27 broadcast FMAs fused into one elementwise
      pass (``"fma"``) — no layout reformatting either way;
    - the ceil 2x2 maxpool is a max over 4 strided plane slices;
    - conv2/conv3 are single matmuls over concatenated shifted slices
      (K = 90 / 144 in sublanes, spatial in lanes);
    - both heads are ONE [32, 6] matmul; the 2-way softmax is the exact
      sigmoid(cls1 - cls0) identity (see ``pnet_s2d_tail``).
    """
    prec = config.get_precision()
    p = pnet_params
    k1 = p["conv1"]["conv"]["kernel"]             # [3, 3, 3, 10]
    dt = jnp.promote_types(x.dtype, k1.dtype)
    x = x.astype(dt)
    b = x.shape[0]

    def cached(key, build):
        if cache is not None and (key, dt) in cache:
            return cache[(key, dt)]
        w = build()
        if cache is not None:
            cache[(key, dt)] = w
        return w

    def shifted(y, oh, ow):
        # taps ordered (ky, kx, ci) to match kernel.reshape(9*cin, cout)
        return jnp.concatenate(
            [y[:, :, ky:ky + oh, kx:kx + ow]
             for ky in range(3) for kx in range(3)], axis=1)

    def prelu(y, name):
        al = p[name]["prelu"]["alpha"].astype(dt)[None, :, None, None]
        return jnp.maximum(y, 0) + al * jnp.minimum(y, 0)

    def conv_dot(y, name, cin, cout):
        oh, ow = y.shape[2] - 2, y.shape[3] - 2
        w = cached(name, lambda: p[name]["conv"]["kernel"]
                   .astype(dt).reshape(9 * cin, cout))
        out = jnp.einsum("bkyx,ko->boyx", shifted(y, oh, ow), w,
                         precision=prec)
        return prelu(out + p[name]["conv"]["bias"].astype(dt)[None, :, None, None],
                     name)

    # conv1 (3 -> 10): K=27 is too narrow to feed the MXU well either way;
    # "fma" trades the patch-tensor traffic for a 27-term elementwise fusion
    sh, sw = x.shape[2], x.shape[3]
    hv, wv = sh - 2, sw - 2
    if conv1_mode == "fma":
        b1 = p["conv1"]["conv"]["bias"].astype(dt)
        y = jnp.broadcast_to(b1[None, :, None, None], (b, 10, hv, wv))
        for ky in range(3):
            for kx in range(3):
                for ci in range(3):
                    y = y + (x[:, ci:ci + 1, ky:ky + hv, kx:kx + wv]
                             * k1[ky, kx, ci].astype(dt)[None, :, None, None])
        y = prelu(y, "conv1")
    else:
        y = conv_dot(x, "conv1", 3, 10)

    # ceil-mode 2x2 s2 maxpool as strided plane slices (-inf edge pad)
    p1h, p1w = -(-hv // 2), -(-wv // 2)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, 2 * p1h - hv), (0, 2 * p1w - wv)),
                constant_values=neg)
    y = jnp.maximum(jnp.maximum(y[:, :, 0::2, 0::2], y[:, :, 0::2, 1::2]),
                    jnp.maximum(y[:, :, 1::2, 0::2], y[:, :, 1::2, 1::2]))

    y = conv_dot(y, "conv2", 10, 16)
    y = conv_dot(y, "conv3", 16, 32)

    wh = cached("heads", lambda: jnp.concatenate(
        [p["reg"]["kernel"][0, 0].astype(dt),
         p["cls"]["kernel"][0, 0].astype(dt)], axis=-1))            # [32, 6]
    bh = jnp.concatenate([p["reg"]["bias"], p["cls"]["bias"]]).astype(dt)
    out = (jnp.einsum("bcyx,co->boyx", y, wh, precision=prec)
           + bh[None, :, None, None])
    reg = out[:, :4]
    prob = jax.nn.sigmoid(out[:, 5] - out[:, 4])      # == softmax(cls)[..., 1]
    return reg, prob


def _flatten_whc(x):
    """torch's permute(0, 3, 2, 1)+flatten (mtcnn.py:68): (w, h, c) ordering."""
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)


class RNet(nn.Module):
    """24x24 refinement net."""

    @nn.compact
    def __call__(self, x):
        prec = config.get_precision()
        x = _pconv(28, 3, "conv1")(x)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = _pconv(48, 3, "conv2")(x)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = _pconv(64, 2, "conv3")(x)
        x = _flatten_whc(x)
        x = nn.Dense(128, precision=prec, name="dense4")(x)
        x = PReLU(128, name="prelu4")(x)
        prob = jax.nn.softmax(nn.Dense(2, precision=prec, name="cls")(x), axis=-1)[..., 1]
        reg = nn.Dense(4, precision=prec, name="reg")(x)
        return reg, prob


class ONet(nn.Module):
    """48x48 output net with landmark head."""

    @nn.compact
    def __call__(self, x):
        prec = config.get_precision()
        x = _pconv(32, 3, "conv1")(x)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = _pconv(64, 3, "conv2")(x)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = _pconv(64, 3, "conv3")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)
        x = _pconv(128, 2, "conv4")(x)
        x = _flatten_whc(x)
        x = nn.Dense(256, precision=prec, name="dense5")(x)
        x = PReLU(256, name="prelu5")(x)
        prob = jax.nn.softmax(nn.Dense(2, precision=prec, name="cls")(x), axis=-1)[..., 1]
        reg = nn.Dense(4, precision=prec, name="reg")(x)
        lmk = nn.Dense(10, precision=prec, name="lmk")(x)
        return reg, lmk, prob


@dataclass(frozen=True)
class Caps:
    """Fixed buffer capacities for the cascade (per image).

    pre1 sizes the per-scale NMS problem ([pre1, pre1] IoU matrices, one per
    scale x image) — 1024 measured 4x faster than 4096 on v5e with identical
    results on non-pathological frames; the stage-1 candidate count is
    surfaced so overflow warns. (Also avoid pre1 >= 4096 with megapixel
    pyramid levels: lax.top_k at k=4096 over ~3M elements crashes the XLA
    TPU TopkEmitter in some shapes.)"""

    pre1: int = 1024     # stage-1 pre-NMS candidates per scale
    post1: int = 512     # stage-1 post-NMS keeps per scale
    cross: int = 2048    # cross-scale NMS input
    stage2: int = 1024   # RNet candidates
    stage3: int = 256    # ONet candidates
    out: int = 128       # final detections
    # pallas crop engine size buckets (per image): candidates bigger than the
    # 128px DMA bucket but within 512px, and bigger than 512px (gather
    # fallback). Overflow drops candidates and is surfaced in counts.
    crops_mid: int = 128
    crops_big: int = 32


def scale_pyramid(h, w, minsize, factor=0.709):
    """Host: geometric scale list and resampled sizes (mtcnn.py:141-148)."""
    scales = []
    s = 12.0 / minsize
    while min(h, w) * s >= 12:
        scales.append(s)
        s *= factor
    sizes = [(int(h * sc + 1), int(w * sc + 1)) for sc in scales]
    return scales, sizes


def refine_bbox(boxes, pred, plus_one):
    off = 1.0 if plus_one else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    wh = jnp.stack([w, h, w, h], axis=-1)
    return boxes + pred * wh


def square_bbox(boxes):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    side = jnp.maximum(w, h)
    x1 = boxes[..., 0] + w * 0.5 - side * 0.5
    y1 = boxes[..., 1] + h * 0.5 - side * 0.5
    return jnp.stack([x1, y1, x1 + side, y1 + side], axis=-1)


def _normalize(avg_u8_rgb):
    return (avg_u8_rgb - 127.5) / 128.0


def _crop_windows(boxes, img_hw):
    """Integer crop windows with the reference's clamping (mtcnn.py:157-160):
    x1 = max(1, int(x1)) ... x2 = min(W, int(x2)); window spans
    [y1-1 : y2, x1-1 : x2]. Returns (windows [N, 4] int32, ok [N])."""
    h, w = img_hw
    x1 = jnp.maximum(1, boxes[..., 0].astype(jnp.int32))
    y1 = jnp.maximum(1, boxes[..., 1].astype(jnp.int32))
    x2 = jnp.minimum(w, boxes[..., 2].astype(jnp.int32))
    y2 = jnp.minimum(h, boxes[..., 3].astype(jnp.int32))
    ok = (y2 > y1 - 1) & (x2 > x1 - 1)
    win = jnp.stack([
        jnp.where(ok, x1 - 1, 0), jnp.where(ok, y1 - 1, 0),
        jnp.where(ok, x2, 1), jnp.where(ok, y2, 1)], axis=-1)
    return win, ok


def _per_image_nms(boxes, scores, valid, thr):
    # bucketed: quiet batches (the common case) run [256, 256] NMS problems
    # instead of capacity-sized ones — exact either way (ops/nms.py)
    return nms_keep_mask_bucketed(boxes, scores, valid, thr)


def _select_topk(scores, keep, k, *arrays):
    idx, valid = jax.vmap(lambda s, m: topk_by_score(s, m, k))(scores, keep)
    outs = []
    for a in arrays:
        if a.ndim == 2:
            outs.append(jnp.take_along_axis(a, idx, axis=1))
        else:
            outs.append(jnp.take_along_axis(a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1))
    return (valid, *outs)


def full_forward(params, frames_u8, minsize=20, caps=Caps(),
                 thresholds=(0.6, 0.7, 0.7), factor=0.709, compute_dtype=None,
                 crop_engine=None, pnet_s2d=False, pnet_tail=None,
                 pnet_stem=None, stage1_pick=None, stage1_nms=None,
                 pallas_pool=None, pnet_impl=None):
    """uint8 BGR frames [B, H, W, 3] -> (boxes [B, out, 4], scores, landmarks
    [B, out, 5, 2], valid, counts) — counts are true candidate totals per
    stage for host-side overflow detection.

    ``crop_engine`` selects the stage-2/3 crop resample:

    - ``"gather"``: integral-image corner gathers for every capacity slot
      (exact int32 sums, no drops) — ~28 + 27 ms/batch-2 1080p of random
      gathers regardless of real candidate counts;
    - ``"pallas"``: per-crop DMA + on-chip pooling matmuls
      (ops/pallas_crops.py), size-bucketed (<=128px DMA bucket for every
      slot, <=512px DMA bucket capped at caps.crops_mid/image, gather
      fallback capped at caps.crops_big/image) — invalid slots are skipped,
      so cost scales with real candidates; bucket overflow DROPS candidates
      and is surfaced in counts["stage{2,3}_crop_dropped"];
    - ``"pallas-interpret"``: same path in pallas interpret mode (CPU tests);
    - None: "pallas" on TPU in throughput ("default") precision mode,
      "gather" elsewhere — parity mode keeps the exact engine.

    ``pnet_stem`` / ``pnet_tail`` select how PNet runs per pyramid level
    (tap-identical alternatives, different accumulation order; unit-tested
    against the module):

    - stem "module": conv1+prelu+pool1 via the flax module (parity path);
      stem "s2d": ``pnet_s2d_head`` on the unpacked level (packed conv at
      quarter area — but the s2d transpose breaks pooling->conv1 fusion);
      stem "packed": the pyramid pooling itself emits the s2d layout
      (``adaptive_pool_full_s2d2`` — pack lives in the gather indices, no
      transpose, full-res maps never exist) feeding ``pnet_s2d_head``;
      stem "chw": the WHOLE net on channel-major planes (``pnet_chw`` —
      the pyramid pooling emits [B, 3, sh, sw], convs are shifted-slice
      matmuls, pool is a strided-slice max; pairs only with tail "chw").
    - tail "module": conv2..heads via the module; tail "s2d":
      ``pnet_s2d_tail`` packed convs; tail "chw": selection reads the
      plane-major maps the chw stem produced.

    None = measured-best for the precision mode (parity mode always runs
    module/module; throughput-mode defaults follow the on-chip A/Bs in
    docs/ROADMAP.md). ``pnet_s2d=True`` is the deprecated alias for
    ``pnet_stem="s2d"``.

    ``stage1_pick`` selects how the k winners' regression rows leave the
    full candidate axis: ``"gather"`` (``take_along_axis`` k-row gather,
    default) or ``"onehot"`` (``ops.select.pick_rows_onehot`` — gather-free
    two-stage one-hot einsum, the fallback if row-gathers on [B, ~3M, 4]
    run at the pathological rate; A/B: tools/profile_gather.py). Both are
    exact.

    ``pallas_pool`` selects the pyramid pool feeding the plane-major stems:
    ``"fused"`` — the pool runs INSIDE the PNet kernel
    (``ops/pallas_pnet.py::pnet_level_fused``: per-tile row matmul + banded
    column matmuls on the normalized frame planes; the pooled level never
    exists in HBM) on every level whose pool windows are <= 2 wide,
    integral gathers + the pre-pooled kernel for the rest; ``"mm"`` —
    gather-free ``adaptive_pool_full_chw_phase_mm`` (row take-pairs +
    {0,1} MXU column matmul) in HBM for the same levels; ``"gather"`` —
    integral-image gathers everywhere. All three bit-identical (the mm/
    fused forms are exact in bf16 for <=2-wide windows); None =
    measured-best ("fused", docs/ROUND5.md).

    ``pnet_impl`` selects the Pallas kernel's dot blocking: ``"r1"`` — one
    output row per conv dot (M in {16, 32, 48}); ``"r4"`` — four rows per
    dot (M in {64, 96, 128}; the MXU pads M to 128 per pass, so r1 wastes
    3/4+ of every pass). Ulp-equivalent, not bit-identical (the padded-K
    lowering regroups f32 accumulation, ~1 bf16 ulp) — the chosen impl
    applies to EVERY level, so within a run selections are consistent;
    None = measured-best ("r4", docs/ROUND5.md).

    ``stage1_nms`` selects how the 16 per-scale NMS problems run:
    ``"level"`` — one bucketed fixpoint per pyramid level, sequential (16
    while_loops, 16 argsorts); ``"stacked"`` — every level's padded
    candidate buffer is stacked into ONE [B*L, pre1] batched fixpoint, so
    the while_loop iteration count is the MAX suppression-chain depth over
    levels instead of the SUM, and the argsort/scatter bookkeeping runs
    once. Exact either way (per-row problems are independent; padded slots
    are invalid and can never be kept). None = measured-best
    (tools/profile_mtcnn.py A/B).
    """
    b, h, w = frames_u8.shape[:3]
    t1, t2, t3 = thresholds
    scales, sizes = scale_pyramid(h, w, minsize, factor)
    ii = integral_image(frames_u8[..., ::-1])  # RGB, int32, exact
    fast = config.get_precision_name() == "default"
    if crop_engine is None:
        # the pallas engine is a throughput-mode approximation (f32 window
        # sums, capacity-capped buckets that can DROP candidates): parity
        # mode keeps the exact int32 integral gathers, like every other
        # throughput-only shortcut in this graph
        crop_engine = "pallas" if (fast and jax.default_backend() == "tpu") else "gather"
    if crop_engine not in ("gather", "pallas", "pallas-interpret"):
        raise ValueError("unknown crop_engine %r (want 'gather', 'pallas', "
                         "'pallas-interpret', or None for auto)" % (crop_engine,))
    if crop_engine != "gather":
        frames_chw = pad_frames_chw(jnp.transpose(
            _normalize(frames_u8[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2)))
    if pnet_stem is None:
        # measured-best: the fused Pallas PNet (ops/pallas_pnet.py) runs
        # the whole cascade at 70.9 ms vs 132.6 module-path (batch-2 1080p
        # minsize-5 bf16, tools/profile_pallas_pnet.py full-vs-module) —
        # PNet pyramid alone 51.6 vs 113.9. Like the pallas crop engine,
        # it is throughput-mode-only: parity mode keeps the flax module.
        # Earlier XLA-level arms (tools/profile_pnet_tail.py, same trim):
        # module+module 133.2 < packed+s2d 161.4 < s2d4+s2d 215.1 (the
        # round-3 relayout eliminations inverted the pre-elimination
        # 156.5-vs-161.5 ranking); the chw XLA formulation lost outright
        # (conv1 alone ~32-50 ms on the largest level,
        # tools/profile_pnet_chw.py) and crashes the axon worker when
        # composed over the pyramid. All stay as tap-identical opt-ins.
        if pnet_s2d:
            pnet_stem = "s2d"
        else:
            pnet_stem = ("pallas" if (fast and jax.default_backend() == "tpu")
                         else "module")
    if (pnet_stem == "chw" and jax.default_backend() == "tpu"
            and os.environ.get("V2F_ALLOW_TPU_CRASH_ARMS") != "1"):
        # the chw XLA pyramid reproducibly KILLS the TPU runtime process
        # (Mosaic/XLA fault, docs/TPU_CRASH_ARMS.md) — refuse with an
        # actionable error instead of a dead worker; the formulation stays
        # available on CPU (tests) and under the explicit env override for
        # ever re-testing it on newer libtpu
        raise RuntimeError(
            "pnet_stem='chw' composed over the pyramid reproducibly crashes "
            "the TPU runtime worker (see docs/TPU_CRASH_ARMS.md for the "
            "minimal repro and status). Use the default pnet_stem (fused "
            "Pallas kernel) or 'module'; set V2F_ALLOW_TPU_CRASH_ARMS=1 "
            "only to re-test the arm on a newer runtime.")
    plane_stem = pnet_stem in ("chw", "pallas", "pallas-interpret")
    if pnet_tail is None:
        pnet_tail = ("chw" if plane_stem
                     else "s2d" if pnet_stem in ("s2d4", "packed") else "module")
    if pnet_stem == "s2d4" and pnet_tail != "s2d":
        raise ValueError("pnet_stem='s2d4' emits packed pool1 — only the "
                         "'s2d' tail can consume it")
    if plane_stem != (pnet_tail == "chw"):
        raise ValueError("plane-major stems ('chw'/'pallas') pair only with "
                         "pnet_tail='chw' (selection reads channel planes)")
    if pnet_tail == "chw" and stage1_pick == "onehot":
        raise ValueError("stage1_pick='onehot' expects candidate-major reg "
                         "payloads; the chw tail gathers from channel planes")
    if pallas_pool is not None and pnet_stem not in ("pallas",
                                                     "pallas-interpret"):
        raise ValueError("pallas_pool=%r only applies to the fused Pallas "
                         "stems (pnet_stem='pallas'/'pallas-interpret'); "
                         "stem %r never pools the phase-split layout"
                         % (pallas_pool, pnet_stem))
    if pnet_impl is not None and pnet_stem not in ("pallas",
                                                   "pallas-interpret"):
        raise ValueError("pnet_impl=%r only applies to the Pallas stems"
                         % (pnet_impl,))
    if pallas_pool is None:
        pallas_pool = "fused"
    if pallas_pool not in ("mm", "gather", "fused"):
        raise ValueError("unknown pallas_pool %r (want 'fused', 'mm', "
                         "'gather', or None for the default, 'fused')"
                         % (pallas_pool,))
    if pnet_impl is None:
        pnet_impl = "r4"
    if pnet_impl not in ("r1", "r4"):
        raise ValueError("unknown pnet_impl %r (want 'r1', 'r4', or None "
                         "for the default, 'r4')" % (pnet_impl,))
    # plane-stem inputs, built lazily: levels in the <=2-window regime pool
    # straight from the normalized frame planes (gather-free mm form); only
    # the remaining small levels need the channel-major integral image.
    # ii_chw is a TRANSPOSE of the HWC integral image, not a second cumsum:
    # the duplicate [B, H+1, W+1] scan costs ~2.7 ms/step at 1080p (round-5
    # per-op trace, tools/profile_mtcnn_trace.py) while the relayout of the
    # already-computed s32 plane is a fraction of that; values identical
    ii_chw = frames_norm_chw = frames_u8_chw = None

    def _ii_chw():
        return jnp.transpose(ii, (0, 3, 1, 2))

    def _frames_norm_chw():
        v = jnp.transpose(
            _normalize(frames_u8[..., ::-1].astype(jnp.float32)), (0, 3, 1, 2))
        return v.astype(compute_dtype) if compute_dtype is not None else v

    if stage1_nms is None:
        stage1_nms = "level"
    if stage1_nms not in ("level", "stacked"):
        raise ValueError("unknown stage1_nms %r (want 'level', 'stacked', "
                         "or None for auto)" % (stage1_nms,))
    counts = {}

    # ---- stage 1: proposal network over the pyramid -------------------------
    s_boxes, s_scores, s_preds, s_valid = [], [], [], []
    total_cand = jnp.zeros((b,), jnp.int32)
    scale_max = jnp.zeros((b,), jnp.int32)        # per-scale candidate peak
    select_overflow = jnp.zeros((b,), jnp.int32)  # block-select truncation risk
    wcache = {}  # packed stem/tail weights: built once, shared by all levels
    for sc, (sh, sw) in zip(scales, sizes):
        pool_hw = None
        if pnet_stem == "s2d4":
            # fully-packed stem: pyramid pooling emits s2d4 straight from its
            # gather indices, conv1 contracts K=48, the 2x2 maxpool is a
            # channel-group max whose output is ALREADY the tail's packed
            # pool1 layout — no repack anywhere (pnet_s2d4_stem docstring)
            packed4 = _normalize(adaptive_pool_full_s2d4(ii, (sh, sw), (h, w)))
            if compute_dtype is not None:
                packed4 = packed4.astype(compute_dtype)
            pool1, pool_hw = pnet_s2d4_stem(params["pnet"], packed4, (sh, sw),
                                            cache=wcache)
        elif plane_stem:
            # whole net on channel-major planes: spatial dims stay minor, so
            # nothing pays XLA's tiny-channel conv/pool layout handling
            # (pnet_chw docstring; ~52 GB/s on the module path's hot ops).
            # "pallas" runs the fused VMEM-resident kernel (ops/pallas_pnet)
            # on a column-phase-split level (free gather reordering);
            # "chw" keeps the XLA shifted-slice formulation.
            if pnet_stem == "chw":
                if ii_chw is None:
                    ii_chw = _ii_chw()
                level_chw = _normalize(adaptive_pool_full_chw(ii_chw, (sh, sw), (h, w)))
                if compute_dtype is not None:
                    level_chw = level_chw.astype(compute_dtype)
                reg_m, prob_m = pnet_chw(params["pnet"], level_chw, cache=wcache)
            else:
                interp = pnet_stem == "pallas-interpret"
                kdt = (compute_dtype if compute_dtype is not None
                       else jnp.float32)
                pack = (pack_pnet_weights_r4 if pnet_impl == "r4"
                        else pack_pnet_weights)
                if ("pnet_packed", kdt, pnet_impl) not in wcache:
                    wcache[("pnet_packed", kdt, pnet_impl)] = pack(
                        params["pnet"], kdt)
                packed_w = wcache[("pnet_packed", kdt, pnet_impl)]
                if (pallas_pool == "fused"
                        and pool_windows_le2((sh, sw), (h, w))):
                    # pool fused INTO the kernel: the pooled level never
                    # round-trips HBM (pnet_level_fused docstring)
                    if frames_norm_chw is None:
                        frames_norm_chw = _frames_norm_chw()
                    if "frames_norm_pad" not in wcache:
                        wcache["frames_norm_pad"] = pad_frames_chw16(
                            frames_norm_chw.astype(kdt))
                    # padded_out: selection runs on the PADDED plane maps
                    # (prob pads are zero-masked in-kernel) — the [:ph, :pw]
                    # crop + flatten costs ~11 ms/step of XLA while/DUS
                    # relayout on the big levels (docs/ROUND5.md trace)
                    reg_m, prob_m, _ = pnet_level_fused(
                        packed_w, wcache["frames_norm_pad"], (h, w),
                        (sh, sw), interpret=interp, padded_out=True)
                else:
                    if pallas_pool == "mm" and pool_windows_le2((sh, sw),
                                                                (h, w)):
                        if frames_norm_chw is None:
                            frames_norm_chw = _frames_norm_chw()
                        level_ph = adaptive_pool_full_chw_phase_mm(
                            frames_norm_chw, (sh, sw), (h, w))
                    elif pallas_pool in ("mm", "fused"):
                        # non-le2 (downscaled) levels: {0,1} matmul pool —
                        # bit-identical to the integral gathers but dense
                        # MXU dots instead of ~8-10 ms/step of s32 gather
                        # fusions (adaptive_pool_full_phase_mm01 docstring)
                        if frames_u8_chw is None:
                            frames_u8_chw = jnp.transpose(
                                frames_u8[..., ::-1], (0, 3, 1, 2)).astype(
                                compute_dtype if compute_dtype is not None
                                else jnp.float32)
                        level_ph = _normalize(adaptive_pool_full_phase_mm01(
                            frames_u8_chw, (sh, sw), (h, w)))
                    else:
                        if ii_chw is None:
                            ii_chw = _ii_chw()
                        level_ph = _normalize(adaptive_pool_full_chw_phase(
                            ii_chw, (sh, sw), (h, w)))
                    if compute_dtype is not None:
                        level_ph = level_ph.astype(compute_dtype)
                    reg_m, prob_m, _ = pnet_level(
                        packed_w, level_ph.astype(kdt), (sh, sw),
                        interpret=interp, padded_out=True)
        elif pnet_stem == "packed":
            packed = _normalize(adaptive_pool_full_s2d2(ii, (sh, sw), (h, w)))
            if compute_dtype is not None:
                packed = packed.astype(compute_dtype)
            pool1 = pnet_s2d_head(params["pnet"], packed, packed_hw=(sh, sw),
                                  cache=wcache)
        else:
            level = _normalize(adaptive_pool_full(ii, (sh, sw), (h, w)))
            if compute_dtype is not None:
                level = level.astype(compute_dtype)
            if pnet_stem == "s2d":
                pool1 = pnet_s2d_head(params["pnet"], level, cache=wcache)
            else:
                pool1 = PNet(to_pool1=True).apply({"params": params["pnet"]}, level)
        if pnet_tail == "chw":
            # reg_m [B, 4, ph, pw] / prob_m [B, ph, pw] already computed by
            # the chw stem branch; prob's flat index order matches the module
            # path exactly (row-major y, x), only reg is plane-major
            ph, pw = prob_m.shape[1:3]
            d = ph * pw
            xy_of = lambda idx: ((idx % pw).astype(jnp.float32),
                                 (idx // pw).astype(jnp.float32))
        elif pnet_tail == "s2d":
            # packed outputs: selection runs straight on the phase-packed
            # layout (flat index f = (I*nw + J)*4 + p, p = pr*2+pc at
            # unpacked (2I+pr, 2J+pc)) — the unpacked full-res maps are
            # never materialized (the unpack transpose + its f32 convert
            # copies cost ~22 ms/step in the per-op trace)
            reg_m, prob_m, (ph, pw) = pnet_s2d_tail(params["pnet"], pool1,
                                                    packed_out=True,
                                                    packed_in_hw=pool_hw,
                                                    cache=wcache)
            nh, nw = prob_m.shape[1:3]
            pr_ = np.array([0, 0, 1, 1])
            pc_ = np.array([0, 1, 0, 1])
            phantom = ((2 * np.arange(nh)[:, None, None] + pr_ < ph)
                       & (2 * np.arange(nw)[None, :, None] + pc_ < pw))
            prob_m = jnp.where(jnp.asarray(phantom)[None], prob_m, 0.0)
            d = nh * nw * 4
            xy_of = lambda idx: ((2 * ((idx // 4) % nw) + idx % 2).astype(jnp.float32),
                                 (2 * (idx // (4 * nw)) + (idx % 4) // 2).astype(jnp.float32))
        else:
            reg_m, prob_m = PNet(from_pool1=True).apply({"params": params["pnet"]}, pool1)
            ph, pw = prob_m.shape[1:3]
            d = ph * pw
            xy_of = lambda idx: ((idx % pw).astype(jnp.float32),
                                 (idx // pw).astype(jnp.float32))
        # reg stays in compute dtype until after selection: only the k1
        # winners' rows are ever converted (an f32 convert of the full
        # [B, 3M, 4] map is an ~8 ms copy on the largest 1080p/minsize-5
        # level, per-op trace tools/profile_mtcnn_trace.py)
        reg = reg_m.reshape(b, 4, d) if pnet_tail == "chw" else reg_m.reshape(b, d, 4)
        flat_prob = prob_m.astype(jnp.float32).reshape(b, d)
        masked = jnp.where(flat_prob >= t1, flat_prob, 0.0)
        level_cand = jnp.sum(masked > 0.0, axis=1).astype(jnp.int32)
        total_cand = total_cand + level_cand
        scale_max = jnp.maximum(scale_max, level_cand)
        k1 = min(caps.pre1, d)
        if fast and d > k1:
            # every non-trivial level: lane-block top-k, index-only (nothing
            # full-D-sized is materialized) — lax.top_k's full variadic sort
            # costs ~20 ms on megapixel levels and still ~2.0 ms/step summed
            # over the mid levels (round-5 trace: sort.114 1.27 ms at
            # [2, 98496]); the block form measured ~10% cheaper there too
            # (tools/profile_mtcnn_r5.py topk), same overflow contract
            scores, idx, overflow = block_topk_indices(masked, k1, per_block=4)
            select_overflow = select_overflow + overflow
            scores = jnp.maximum(scores, 0.0)  # -inf padding -> 0 (invalid)
        else:
            scores, idx = jax.lax.top_k(masked, k1)
        valid = scores >= t1
        wi, hi = xy_of(idx)
        boxes = jnp.stack([
            jnp.floor((2.0 * wi + 1.0) / sc), jnp.floor((2.0 * hi + 1.0) / sc),
            jnp.floor((2.0 * wi + 12.0) / sc), jnp.floor((2.0 * hi + 12.0) / sc),
        ], axis=-1)                                               # [B, k1, 4]
        if pnet_tail == "chw":
            # plane-major reg: gather the k1 winners from each of the 4
            # planes, then a tiny [B, 4, k1] -> [B, k1, 4] transpose
            preds = jnp.take_along_axis(
                reg, idx[:, None, :], axis=2).transpose(0, 2, 1).astype(jnp.float32)
        elif stage1_pick == "onehot":
            preds = pick_rows_onehot(reg, idx).astype(jnp.float32)
        else:
            preds = jnp.take_along_axis(reg, idx[..., None], axis=1).astype(jnp.float32)
        if stage1_nms == "stacked":
            # defer NMS: stack every level's buffer into one batched fixpoint
            s_boxes.append(boxes)
            s_scores.append(scores)
            s_preds.append(preds)
            s_valid.append(valid)
        else:
            keep = _per_image_nms(boxes, scores, valid, 0.5)
            k1p = min(caps.post1, k1)
            v, boxes, scores, preds = _select_topk(scores, keep, k1p, boxes, scores, preds)
            s_boxes.append(boxes)
            s_scores.append(scores)
            s_preds.append(preds)
            s_valid.append(v)
    counts["stage1"] = total_cand
    counts["stage1_scale_max"] = scale_max  # pre1 caps PER SCALE, not in total
    counts["stage1_select_overflow"] = select_overflow

    if stage1_nms == "stacked":
        # ONE [B*L, K] NMS problem set: each row is one (image, level) —
        # independent, so results are exactly the per-level fixpoints', but
        # the vmapped while_loop converges in max(chain depth) iterations
        # over ALL rows instead of running 16 sequential loops, and the
        # sort/scatter bookkeeping batches. Levels smaller than K pad with
        # invalid slots (score 0 < t1), which can never be kept.
        nl = len(s_scores)
        kmax = max(a.shape[1] for a in s_scores)

        def padk(a):
            pad = [(0, 0), (0, kmax - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad)

        bx = jnp.stack([padk(a) for a in s_boxes], axis=1).reshape(b * nl, kmax, 4)
        sc_ = jnp.stack([padk(a) for a in s_scores], axis=1).reshape(b * nl, kmax)
        pr = jnp.stack([padk(a) for a in s_preds], axis=1).reshape(b * nl, kmax, 4)
        vl = jnp.stack([padk(a) for a in s_valid], axis=1).reshape(b * nl, kmax)
        keep = _per_image_nms(bx, sc_, vl, 0.5)
        k1p = min(caps.post1, kmax)
        v, bx, sc_, pr = _select_topk(sc_, keep, k1p, bx, sc_, pr)
        boxes = bx.reshape(b, nl * k1p, 4)
        scores = sc_.reshape(b, nl * k1p)
        preds = pr.reshape(b, nl * k1p, 4)
        valid = v.reshape(b, nl * k1p)
    else:
        boxes = jnp.concatenate(s_boxes, axis=1)
        scores = jnp.concatenate(s_scores, axis=1)
        preds = jnp.concatenate(s_preds, axis=1)
        valid = jnp.concatenate(s_valid, axis=1)
    # survivors entering the cross-scale stage — caps.cross truncates HERE
    # (the reference keeps all), so the count must be surfaced like the
    # other capacity points
    counts["cross_in"] = jnp.sum(valid, axis=1)
    if boxes.shape[1] > caps.cross:
        valid, boxes, scores, preds = _select_topk(
            jnp.where(valid, scores, -jnp.inf), valid, caps.cross, boxes, scores, preds)

    keep = _per_image_nms(boxes, scores, valid, 0.7)
    valid, boxes, scores, preds = _select_topk(scores, keep, min(caps.stage2, boxes.shape[1]),
                                               boxes, scores, preds)
    boxes = square_bbox(refine_bbox(boxes, preds, plus_one=False))

    # ---- stage 2: refinement network ---------------------------------------
    def bucketed_crops(win, imgidx, okv, size):
        """Size-bucketed crop resample (pallas engine). ``okv``: [bk] slot
        validity (window ok AND candidate alive) — dead slots skip their DMA
        and matmuls entirely. Returns (crops [bk, size, size, 3] normalized,
        processed [bk], dropped [bk])."""
        interp = crop_engine == "pallas-interpret"
        bk = win.shape[0]
        wh = win[:, 3] - win[:, 1]
        ww = win[:, 2] - win[:, 0]
        s1 = bucket_limits((h, w), (128, 128))
        s2 = bucket_limits((h, w), (512, 512))
        fit1 = (wh <= s1[0]) & (ww <= s1[1])
        fit2 = (wh <= s2[0]) & (ww <= s2[1])
        ok1 = okv & fit1
        scal = jnp.stack([imgidx, win[:, 1], win[:, 0], wh, ww,
                          ok1.astype(jnp.int32)], axis=-1)
        crops = adaptive_pool_crops(frames_chw, scal, size, s1, interpret=interp)
        processed = ok1

        def per_image_pick(want, cap):
            # caps.crops_{mid,big} are PER-IMAGE budgets (Caps docstring):
            # pick up to ``cap`` per image, not cap*b image-major across the
            # flat batch (which would starve later images behind one busy
            # frame). Slots within an image are score-descending
            # (_select_topk), so the lowest-index tie-break keeps each
            # image's best-scoring candidates.
            kk = bk // b
            c = min(cap, kk)
            idx, sel = jax.vmap(lambda ww: topk_by_score(
                ww.astype(jnp.float32), ww, c))(want.reshape(b, kk))
            flat = idx + (jnp.arange(b, dtype=idx.dtype) * kk)[:, None]
            return flat.reshape(-1), sel.reshape(-1)

        if s2 != s1:
            want = okv & fit2 & ~fit1
            idx2, sel2 = per_image_pick(want, caps.crops_mid)
            scal2 = jnp.stack([imgidx[idx2], win[idx2, 1], win[idx2, 0],
                               wh[idx2], ww[idx2], sel2.astype(jnp.int32)], axis=-1)
            crops2 = adaptive_pool_crops(frames_chw, scal2, size, s2,
                                         interpret=interp)
            tgt = jnp.where(sel2, idx2, bk)
            crops = crops.at[tgt].set(crops2, mode="drop")
            processed = processed | jnp.zeros(bk, bool).at[tgt].set(True, mode="drop")
        if h > s2[0] or w > s2[1]:
            want = okv & ~fit2
            idxb, selb = per_image_pick(want, caps.crops_big)
            cb = _normalize(adaptive_pool_boxes_batched(
                ii, win[idxb], imgidx[idxb], (size, size)))
            tgt = jnp.where(selb, idxb, bk)
            crops = crops.at[tgt].set(cb, mode="drop")
            processed = processed | jnp.zeros(bk, bool).at[tgt].set(True, mode="drop")
        return crops, processed, okv & ~processed

    def run_subnet(module, mparams, boxes, valid, size):
        k = boxes.shape[1]
        win, ok = _crop_windows(boxes.reshape(b * k, 4), (h, w))
        imgidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        if crop_engine == "gather":
            crops = _normalize(adaptive_pool_boxes_batched(ii, win, imgidx,
                                                           (size, size)))
            new_valid = valid & ok.reshape(b, k)
            dropped = jnp.zeros((b, k), jnp.int32)
        else:
            okv = ok & valid.reshape(b * k)
            crops, processed, drop_mask = bucketed_crops(win, imgidx, okv, size)
            new_valid = valid & processed.reshape(b, k)
            dropped = drop_mask.reshape(b, k).astype(jnp.int32)
        if compute_dtype is not None:
            crops = crops.astype(compute_dtype)
        out = module.apply({"params": mparams}, crops)
        out = tuple(t.astype(jnp.float32) for t in out)
        return out, new_valid, jnp.sum(dropped, axis=1)

    (reg2, prob2), valid, counts["stage2_crop_dropped"] = run_subnet(
        RNet(), params["rnet"], boxes, valid, 24)
    k2 = boxes.shape[1]
    scores = prob2.reshape(b, k2)
    preds = reg2.reshape(b, k2, 4)
    valid = valid & (scores > t2)
    counts["stage2"] = jnp.sum(valid, axis=1)
    keep = _per_image_nms(boxes, scores, valid, 0.7)
    valid, boxes, scores, preds = _select_topk(scores, keep, min(caps.stage3, k2),
                                               boxes, scores, preds)
    boxes = square_bbox(refine_bbox(boxes, preds, plus_one=True))

    # ---- stage 3: output network --------------------------------------------
    (reg3, lmk3, prob3), valid, counts["stage3_crop_dropped"] = run_subnet(
        ONet(), params["onet"], boxes, valid, 48)
    k3 = boxes.shape[1]
    scores = prob3.reshape(b, k3)
    preds = reg3.reshape(b, k3, 4)
    lmk = lmk3.reshape(b, k3, 10)
    valid = valid & (scores > t3)
    counts["stage3"] = jnp.sum(valid, axis=1)

    wi = boxes[..., 2] - boxes[..., 0] + 1.0
    hi = boxes[..., 3] - boxes[..., 1] + 1.0
    lm_x = wi[..., None] * lmk[..., :5] + boxes[..., 0:1] - 1.0
    lm_y = hi[..., None] * lmk[..., 5:] + boxes[..., 1:2] - 1.0
    landmarks = jnp.stack([lm_x, lm_y], axis=-1)                  # [B, k3, 5, 2]

    boxes = refine_bbox(boxes, preds, plus_one=True)
    keep = jax.vmap(lambda bb, ss, vv: iom_chain_suppress(bb, ss, vv, 0.7))(
        boxes, scores, valid)
    out_valid, boxes, scores, landmarks = _select_topk(
        scores, keep, min(caps.out, k3), boxes, scores, landmarks)
    return boxes, scores, landmarks, out_valid, counts


def torch_spec():
    """Checkpoint spec in the reference registration order (mtcnn.py:12-130):
    PNet (conv1..3 + PReLUs, cls, reg), RNet (+dense4/prelu4, cls, reg),
    ONet (+dense5/prelu5, cls, reg, landmarks)."""
    from ..utils import weights as W

    def pconv(path):
        return [W.conv(f"{path}/conv", bias=True), W.param(f"{path}/prelu/alpha")]

    els = []
    for c in ("conv1", "conv2", "conv3"):
        els += pconv(f"pnet/{c}")
    els += [W.conv("pnet/cls", bias=True), W.conv("pnet/reg", bias=True)]
    for c in ("conv1", "conv2", "conv3"):
        els += pconv(f"rnet/{c}")
    els += [W.linear("rnet/dense4"), W.param("rnet/prelu4/alpha"),
            W.linear("rnet/cls"), W.linear("rnet/reg")]
    for c in ("conv1", "conv2", "conv3", "conv4"):
        els += pconv(f"onet/{c}")
    els += [W.linear("onet/dense5"), W.param("onet/prelu5/alpha"),
            W.linear("onet/cls"), W.linear("onet/reg"), W.linear("onet/lmk")]
    return els
