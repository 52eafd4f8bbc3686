"""Pallas TPU kernel: the ENTIRE PNet (conv1..heads) fused per pyramid level.

Why: the per-op trace of the module path (tools/profile_mtcnn_trace.py,
batch-2 1080p minsize-5 bf16) shows XLA's conv emitter runs PNet's
tiny-channel NHWC convs at ~6% of HBM bandwidth — every op round-trips
multi-hundred-MB activation maps through HBM with layout handling around
C in {3, 10, 16, 32}, ~90 ms of the 132 ms cascade. Speed of light for the
whole PNet pyramid is ~2 ms of HBM traffic (read the pooled levels once,
write the 5-plane outputs once) plus ~1-2 ms of MXU work.

This kernel keeps every intermediate in VMEM and never materializes an
activation map in HBM:

- layout is channel PLANES ([C, rows, W]: spatial in sublanes x lanes, so
  nothing pays tiny-channel tiling);
- the level arrives COLUMN-PHASE-SPLIT ([..., :WB] = even columns,
  [..., WB:] = odd — free at the pyramid pool, it is pure gather-index
  reordering in ``ops/resize.py::adaptive_pool_full_chw_phase``), so the
  2x2 stride-2 maxpool needs NO strided ops (Mosaic supports neither
  strided slices nor >2D gathers): lane pooling is ``max(even_phase,
  odd_phase)`` and row pooling happens inside the conv1 row loop (each
  pool row computes its two conv1 rows and maxes them on the spot —
  conv1's full-res output never exists anywhere);
- each grid step DMAs one row-tile (+halo) of the level from HBM;
- convs run per OUTPUT ROW as [Cout, K] x [K, W] MXU dots: the [K, W]
  slab stacks the 3 ky-tap rows of all input planes in sublanes
  (UNSHIFTED — Mosaic cannot concat mixed-lane-offset operands), one dot
  per kx tap column, and the kx lane shifts apply as rotates of the f32
  partial sums (Mosaic's rotate is 32-bit-only, so never on bf16 data;
  conv1 stacks its three kx blocks into one [48, 16] dot per phase);
- edge windows (ceil-mode pool) mask invalid conv1 rows/columns to -1e30
  before the max — same result as the module path's -inf padding
  (reference detectors/mtcnn.py:41-47), finite so 0-weight pads can
  never produce NaN;
- both heads fuse into one [8, 32] dot; the 2-way softmax collapses to
  sigmoid(cls1 - cls0).

Outputs are plane-major (reg [B, 4, PH, PW], prob [B, PH, PW] f32) — the
layout models/mtcnn.py's 'chw' stage-1 selection tail consumes directly.

Numerics: taps match ``models/mtcnn.py::pnet_chw`` (dots accumulate in f32
via preferred_element_type); the f32 path is tap-identical to the flax
module (unit-tested at 1e-5), the bf16 path differs from the module's bf16
convs only in accumulation order.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _r16(n):
    return -(-n // 16) * 16


def _r128(n):
    return -(-n // 128) * 128


def phase_block_w(sw):
    """Lane width of each column-phase block for a level of true width sw."""
    return _r128(-(-sw // 2)) + 128


def phase_split_level(level_chw):
    """XLA helper (tests / non-fused callers): [B, 3, SH, SW] -> the
    kernel's phase-split input [B, 3, SH, 2*WB] (zero-padded blocks:
    even cols, odd cols)."""
    sw = level_chw.shape[-1]
    wb = phase_block_w(sw)
    pad = lambda v: jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, wb - v.shape[-1])])
    return jnp.concatenate(
        [pad(level_chw[..., s::2]) for s in range(2)], axis=-1)


def pack_pnet_weights(pnet_params, dtype):
    """PNet params -> the kernel's 15 packed operands.

    Every conv packs ONE matrix PER kx tap column (rows (ky, c), zero-
    padded to sublane multiples) — the kernel dots each against an
    UNSHIFTED slab and lane-rotates the f32 partial sums (Mosaic's rotate
    is 32-bit-only, so shifts happen on the f32 accumulators, never on
    bf16 operands). conv1's three [10, 16] blocks stack into one [48, 16]
    so each input row's phase slab feeds a single dot whose output rows
    [0:10]/[16:26]/[32:42] are the kx0/kx1/kx2 partials. Slabs pad with
    explicit zeros, so pad rows contribute exactly 0.
    """
    p = pnet_params

    def col(v, rpad=0):
        v = jnp.asarray(v, jnp.float32).reshape(-1, 1)
        return jnp.pad(v, ((0, rpad), (0, 0))) if rpad else v

    def conv_kx(name, cin, cout, kx, kpad, rpad=0):
        w = jnp.asarray(p[name]["conv"]["kernel"], dtype)[:, kx]  # [3, cin, cout]
        w = w.reshape(3 * cin, cout).T                            # rows (ky, c)
        return jnp.pad(w, ((0, rpad), (0, kpad - 3 * cin)))

    w1 = jnp.concatenate([conv_kx("conv1", 3, 10, kx, 16, rpad=6)
                          for kx in range(3)])                # [48, 16]
    wh = jnp.concatenate([jnp.asarray(p["reg"]["kernel"][0, 0], dtype),
                          jnp.asarray(p["cls"]["kernel"][0, 0], dtype)], axis=-1)
    bh = jnp.concatenate([jnp.asarray(p["reg"]["bias"], jnp.float32),
                          jnp.asarray(p["cls"]["bias"], jnp.float32)])
    return (
        w1,
        col(p["conv1"]["conv"]["bias"]),
        col(p["conv1"]["prelu"]["alpha"]),
        conv_kx("conv2", 10, 16, 0, 32),
        conv_kx("conv2", 10, 16, 1, 32),
        conv_kx("conv2", 10, 16, 2, 32),
        col(p["conv2"]["conv"]["bias"]),
        col(p["conv2"]["prelu"]["alpha"]),
        conv_kx("conv3", 16, 32, 0, 48),
        conv_kx("conv3", 16, 32, 1, 48),
        conv_kx("conv3", 16, 32, 2, 48),
        col(p["conv3"]["conv"]["bias"]),
        col(p["conv3"]["prelu"]["alpha"]),
        jnp.pad(wh.T, ((0, 2), (0, 0))),                      # [8, 32]
        col(bh, rpad=2),                                       # [8, 1]
    )


def _make_body(cfg, dtype, prec):
    """The conv1..heads pipeline from the phase-split pooled tile in ``xin``
    to the output refs — shared by the pre-pooled and fused-pool kernels."""
    (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc) = cfg
    neg = -1e30  # finite: 0-weight pads can never turn it into NaN

    def slab(srcs, r, cin, kpad):
        """[kpad, wc] stack of each source's rows r..r+2 — every piece an
        OFFSET-0 lane slice (Mosaic cannot concat mixed-lane-offset
        operands; all lane shifting lives in the phase blocks / the f32
        partial-sum rotates)."""
        pieces = [s[:, r + ky, :wc] for ky in range(3) for s in srcs]
        if kpad > 3 * cin * len(srcs):
            pieces.append(jnp.zeros((kpad - 3 * cin * len(srcs), wc), dtype))
        return jnp.concatenate(pieces, axis=0)

    def prelu(v, bref, aref):
        v = v + bref[:]
        return jnp.maximum(v, 0.0) + aref[:] * jnp.minimum(v, 0.0)

    def conv_shift(src, r, cin, wkx, bref, aref, kpad):
        """One conv2/conv3 output row: three per-kx dots on UNSHIFTED
        slabs; the kx shifts apply as f32 lane-rotates of the partial
        sums (out[j] needs in[j+kx], so partial u_kx shifts LEFT by kx =
        right-rotate by wc-kx; wrapped cols land beyond the valid width).
        """
        s = slab((src,), r, cin, kpad)
        u = [jnp.dot(w[:], s, preferred_element_type=jnp.float32,
                     precision=prec) for w in wkx]
        acc = (u[0] + pltpu.roll(u[1], wc - 1, 1)
               + pltpu.roll(u[2], wc - 2, 1))
        return prelu(acc, bref, aref)

    def body(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
             wh, bh, reg_ref, prob_ref, xin, p1s, c2s):
        t = pl.program_id(1)
        # the 2 phase blocks (pre-gathered by the pyramid pool / the fused
        # in-kernel pool)
        ev = xin.at[:, :, 0 * wb:1 * wb]
        od = xin.at[:, :, 1 * wb:2 * wb]

        # conv1 + the ceil-mode 2x2 s2 maxpool, fused per POOL row: compute
        # the two conv1 rows in both column phases and max them on the spot.
        # Phase taps (input col 2j+kx for even out col j, 2j+1+kx for odd):
        # even = kx0(ev) + kx1(od) + roll(kx2(ev)),
        # odd  = kx0(od) + roll(kx1(ev)) + roll(kx2(od)) — one [48, 16]
        # dot per phase slab gives all three kx partials at rows
        # [0:10]/[16:26]/[32:42]; rolls are f32 left-shifts by one.
        qe, qo = -(-cw // 2), cw // 2   # valid col counts per phase
        cols = jax.lax.broadcasted_iota(jnp.int32, (10, wc), 1)
        mask_e, mask_o = cols < qe, cols < qo
        rl1 = lambda u: pltpu.roll(u, wc - 1, 1)
        for p in range(tr_p1):
            rows_v = []
            for dr in range(2):
                ue = jnp.dot(w1[:], slab((ev,), 2 * p + dr, 3, 16),
                             preferred_element_type=jnp.float32,
                             precision=prec)                    # [48, wc]
                uo = jnp.dot(w1[:], slab((od,), 2 * p + dr, 3, 16),
                             preferred_element_type=jnp.float32,
                             precision=prec)
                ve = prelu(ue[0:10] + uo[16:26] + rl1(ue[32:42]), b1, a1)
                vo = prelu(uo[0:10] + rl1(ue[16:26]) + rl1(uo[32:42]),
                           b1, a1)
                rows_v.append(jnp.maximum(jnp.where(mask_e, ve, neg),
                                          jnp.where(mask_o, vo, neg)))
            g = 2 * to * t + 2 * p   # global conv1 row of this window's top
            row1_ok = g + 1 < ch
            row0_ok = g < ch
            m = jnp.where(row1_ok, jnp.maximum(rows_v[0], rows_v[1]),
                          jnp.where(row0_ok, rows_v[0],
                                    jnp.full_like(rows_v[0], neg)))
            p1s[:, p, :wc] = m.astype(dtype)

        # conv2: 16 planes, 3 x ([16, 32] x [32, wc]) per row
        for r in range(tr_c2):
            c2s[:, r, :wc] = conv_shift(p1s, r, 10, (w2a, w2b, w2c),
                                        b2, a2, 32).astype(dtype)

        # conv3 + both heads per output row; softmax(cls)[1] == sigmoid(d).
        # prob pads (rows >= PH / cols >= PW: zero-input conv garbage whose
        # sigmoid could clear the score threshold) are masked to 0 so the
        # caller can run candidate selection on the PADDED maps — the
        # [:ph, :pw] crop + flatten otherwise costs ~11 ms/step of XLA
        # while/DUS relayout on the 1080p minsize-5 pyramid (docs/ROUND5.md)
        ph_v, pw_v = -(-ch // 2) - 4, -(-cw // 2) - 4
        okc = jax.lax.broadcasted_iota(jnp.int32, (1, wc), 1)[0] < pw_v
        for r in range(to):
            v3 = conv_shift(c2s, r, 16, (w3a, w3b, w3c),
                            b3, a3, 48).astype(dtype)
            hv = jnp.dot(wh[:], v3, preferred_element_type=jnp.float32,
                         precision=prec) + bh[:]                    # [8, wc]
            reg_ref[0, :, r, :wc] = hv[0:4].astype(dtype)
            ok = jnp.logical_and(to * t + r < ph_v, okc)
            prob_ref[0, r, :wc] = jnp.where(ok, jax.nn.sigmoid(hv[5] - hv[4]),
                                            0.0)

    return body


def pack_pnet_weights_r4(pnet_params, dtype):
    """PNet params packed for the ROW-STACKED kernel body (``impl="r4"``):
    each conv dot computes FOUR output rows at once, quadrupling the dot's
    M dimension (the MXU pads M and K to 128 per pass, so the baseline
    body's M in {16, 32, 48} wastes 3/4+ of every pass — the per-op trace
    puts the kernel at ~9 TFLOP/s, utilization-bound, not bandwidth-bound).

    Packing: output-row block p's weights sit at M rows [p*Cout, (p+1)*Cout]
    and read the SAME K axis as the baseline, shifted by p slab rows —
    extra K entries are exact zeros and nonzero entries keep their relative
    order, so each dot computes the same mathematical sums. NOT bit-
    identical to r1: the padded-K lowering regroups the f32 accumulation at
    ulp level on both MXU and XLA:CPU (measured: bf16 ~1 ulp on reg, f32
    ~1e-7 — tests/test_models_mtcnn.py, docs/ROUND5.md), which is why the
    production default uses r4 consistently on every level rather than
    mixing impls. conv1 stacks its two intra-pool-row outputs (M 48 -> 96,
    K = 4 slab rows x 3 ch); conv2 M 16 -> 64 / K 64; conv3 M 32 -> 128 /
    K 96 (a full MXU pass); heads M 8 -> 32 / K 128.
    """
    p = pnet_params

    def col(v, reps, rpad=0):
        v = jnp.tile(jnp.asarray(v, jnp.float32).reshape(-1), reps)
        v = v.reshape(-1, 1)
        return jnp.pad(v, ((0, rpad), (0, 0))) if rpad else v

    def conv_kx_dr(name, cin, cout, kx, kpad, dr):
        # [cout, kpad] with K entry (ky + dr)*cin + c  <- kernel[ky, kx, c]
        w = jnp.asarray(p[name]["conv"]["kernel"], dtype)[:, kx]  # [3, cin, cout]
        w = w.reshape(3 * cin, cout).T                            # K = (ky, c)
        return jnp.pad(w, ((0, 0), (dr * cin, kpad - (3 + dr) * cin)))

    def stack4(name, cin, cout, kx, kpad):
        return jnp.concatenate(
            [conv_kx_dr(name, cin, cout, kx, kpad, dr) for dr in range(4)])

    # conv1: two intra-pool-row outputs (dr 0/1), 3 kx blocks each padded to
    # 16 M rows -> [96, 16]; K = 4 slab rows x 3 ch = 12 (pad 16)
    w1d = jnp.concatenate(
        [jnp.pad(conv_kx_dr("conv1", 3, 10, kx, 16, dr), ((0, 6), (0, 0)))
         for dr in range(2) for kx in range(3)])                  # [96, 16]
    wh = jnp.concatenate([jnp.asarray(p["reg"]["kernel"][0, 0], dtype),
                          jnp.asarray(p["cls"]["kernel"][0, 0], dtype)],
                         axis=-1)                                 # [32, 6]
    wh8 = jnp.pad(wh.T, ((0, 2), (0, 0)))                         # [8, 32]
    wh4 = jax.scipy.linalg.block_diag(*([wh8] * 4))               # [32, 128]
    bh = jnp.concatenate([jnp.asarray(p["reg"]["bias"], jnp.float32),
                          jnp.asarray(p["cls"]["bias"], jnp.float32)])
    bh8 = jnp.pad(bh.reshape(-1, 1), ((0, 2), (0, 0)))            # [8, 1]
    return (
        w1d,
        col(p["conv1"]["conv"]["bias"], 1),
        col(p["conv1"]["prelu"]["alpha"], 1),
        stack4("conv2", 10, 16, 0, 64),
        stack4("conv2", 10, 16, 1, 64),
        stack4("conv2", 10, 16, 2, 64),
        col(p["conv2"]["conv"]["bias"], 4),
        col(p["conv2"]["prelu"]["alpha"], 4),
        stack4("conv3", 16, 32, 0, 96),
        stack4("conv3", 16, 32, 1, 96),
        stack4("conv3", 16, 32, 2, 96),
        col(p["conv3"]["conv"]["bias"], 4),
        col(p["conv3"]["prelu"]["alpha"], 4),
        wh4,
        jnp.tile(bh8, (4, 1)),                                    # [32, 1]
    )


def _make_body_r4(cfg, dtype, prec):
    """Row-stacked variant of ``_make_body``: same xin -> outputs contract,
    ulp-equivalent values (see ``pack_pnet_weights_r4``), ~4x the M per dot.
    Requires ``to % 4 == 0`` and ``tr_p1 = to + 6`` (conv2 computes to+4
    rows in chunks of 4; the 2 trailing rows are discarded slack whose p1s
    inputs must exist — finite garbage is fine, NaN is not, and the pool
    writes finite values everywhere)."""
    (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc) = cfg
    neg = -1e30
    assert to % 4 == 0 and tr_p1 == to + 6, (to, tr_p1)

    def slab(src, r, n, cin, kpad):
        pieces = [src[:, r + k, :wc] for k in range(n)]
        if kpad > n * cin:
            pieces.append(jnp.zeros((kpad - n * cin, wc), dtype))
        return jnp.concatenate(pieces, axis=0)

    def prelu(v, bref, aref):
        v = v + bref[:]
        return jnp.maximum(v, 0.0) + aref[:] * jnp.minimum(v, 0.0)

    def conv_shift4(src, r, cin, wkx, bref, aref, kpad):
        s = slab(src, r, 6, cin, kpad)
        u = [jnp.dot(w[:], s, preferred_element_type=jnp.float32,
                     precision=prec) for w in wkx]
        acc = (u[0] + pltpu.roll(u[1], wc - 1, 1)
               + pltpu.roll(u[2], wc - 2, 1))
        return prelu(acc, bref, aref)

    def body(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
             wh, bh, reg_ref, prob_ref, xin, p1s, c2s):
        t = pl.program_id(1)
        ev = xin.at[:, :, 0 * wb:1 * wb]
        od = xin.at[:, :, 1 * wb:2 * wb]

        # conv1 + pool: both conv1 rows of each pool row from ONE [96, 16]
        # dot per phase (dr 0/1 partials at M rows [0:48] / [48:96])
        qe, qo = -(-cw // 2), cw // 2
        cols = jax.lax.broadcasted_iota(jnp.int32, (10, wc), 1)
        mask_e, mask_o = cols < qe, cols < qo
        rl1 = lambda u: pltpu.roll(u, wc - 1, 1)
        for p in range(tr_p1):
            ue = jnp.dot(w1[:], slab(ev, 2 * p, 4, 3, 16),
                         preferred_element_type=jnp.float32, precision=prec)
            uo = jnp.dot(w1[:], slab(od, 2 * p, 4, 3, 16),
                         preferred_element_type=jnp.float32, precision=prec)
            rows_v = []
            for dr in range(2):
                o = 48 * dr
                ve = prelu(ue[o + 0:o + 10] + uo[o + 16:o + 26]
                           + rl1(ue[o + 32:o + 42]), b1, a1)
                vo = prelu(uo[o + 0:o + 10] + rl1(ue[o + 16:o + 26])
                           + rl1(uo[o + 32:o + 42]), b1, a1)
                rows_v.append(jnp.maximum(jnp.where(mask_e, ve, neg),
                                          jnp.where(mask_o, vo, neg)))
            g = 2 * to * t + 2 * p
            m = jnp.where(g + 1 < ch, jnp.maximum(rows_v[0], rows_v[1]),
                          jnp.where(g < ch, rows_v[0],
                                    jnp.full_like(rows_v[0], neg)))
            p1s[:, p, :wc] = m.astype(dtype)

        # conv2: 4 output rows per [64, 64] x [64, wc] dot chain; rows
        # tr_c2..to+3 are slack (never read by conv3)
        for r in range(0, to + 4, 4):
            acc = conv_shift4(p1s, r, 10, (w2a, w2b, w2c), b2, a2, 64)
            for p_ in range(4):
                c2s[:, r + p_, :wc] = acc[16 * p_:16 * p_ + 16].astype(dtype)

        # conv3 (4 rows per [128, 96] dot chain) + heads ([32, 128] dot);
        # prob pads masked to 0 (see _make_body)
        ph_v, pw_v = -(-ch // 2) - 4, -(-cw // 2) - 4
        okc = jax.lax.broadcasted_iota(jnp.int32, (1, wc), 1)[0] < pw_v
        for r in range(0, to, 4):
            v3 = conv_shift4(c2s, r, 16, (w3a, w3b, w3c), b3, a3, 96)
            hv = jnp.dot(wh[:], v3.astype(dtype),
                         preferred_element_type=jnp.float32,
                         precision=prec) + bh[:]                 # [32, wc]
            for p_ in range(4):
                o = 8 * p_
                reg_ref[0, :, r + p_, :wc] = hv[o + 0:o + 4].astype(dtype)
                ok = jnp.logical_and(to * t + r + p_ < ph_v, okc)
                prob_ref[0, r + p_, :wc] = jnp.where(
                    ok, jax.nn.sigmoid(hv[o + 5] - hv[o + 4]), 0.0)

    return body


def _make_kernel(cfg, dtype, prec, impl="r1"):
    (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc) = cfg
    body = (_make_body_r4 if impl == "r4" else _make_body)(cfg, dtype, prec)

    def kernel(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
               wh, bh, x_any, reg_ref, prob_ref, xin, p1s, c2s, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = pl.multiple_of(2 * to * t, 16)
        cp = pltpu.make_async_copy(
            x_any.at[b, :, pl.ds(row0, tr_inp), :], xin, sem)
        cp.start()
        cp.wait()
        body(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
             wh, bh, reg_ref, prob_ref, xin, p1s, c2s)

    return kernel


def _make_kernel_fused(cfg, pool_cfg, dtype, prec, impl="r1"):
    """Kernel variant with the pyramid pool FUSED IN: instead of DMAing a
    pre-pooled phase-split level tile, DMA the needed rows of the NORMALIZED
    FRAME planes and pool in VMEM — row pooling as one small matmul against
    a per-tile {0, 0.5, 1} row matrix, column pooling as per-128-lane-block
    banded matmuls against static {0, 0.5, 1} column blocks (each block's
    frame-column window is static and 128-aligned). The pooled phase-split
    level never exists in HBM: the mm pool's ~300 MB/step write + re-read on
    the 1080p minsize-5 pyramid disappears (VERDICT r5 item 1b).

    Bit-exactness: identical real values to ``adaptive_pool_full_chw_phase_mm``
    — row avg 0.5a+0.5b and column {0,1}·invw dots accumulate <= 2 exact
    bf16 terms in f32 either way (see that function's docstring), so the
    composed kernel is bit-identical to pool-then-``pnet_level``
    (unit-tested)."""
    (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc) = cfg
    (h, sh, hp, wp, span_p, kwin, u0s) = pool_cfg
    rrows = _r16(tr_inp)
    body = (_make_body_r4 if impl == "r4" else _make_body)(cfg, dtype, prec)

    def kernel(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
               wh, bh, rmat, cmat, fr_any, reg_ref, prob_ref,
               xin, p1s, c2s, fslab, prs, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        # frame row origin: SAME arithmetic as the host R-matrix build
        # (Mosaic-provable aligned form, see ops/pallas_crops.py)
        l0 = 2 * to * t
        ys_l0 = (l0 * h) // sh
        y0 = (jnp.minimum(ys_l0, hp - span_p) // 16) * 16
        cp = pltpu.make_async_copy(
            fr_any.at[b, :, pl.ds(y0, span_p), :], fslab, sem)
        cp.start()
        cp.wait()
        # row pool: [rrows, span_p] x [span_p, Wp] per channel
        for c in range(3):
            pr = jnp.dot(rmat[0], fslab[c], preferred_element_type=jnp.float32,
                         precision=prec)
            prs[rrows * c:rrows * c + rrows, :] = pr.astype(dtype)
        # column pool: per output 128-lane block, one [3*rrows, kwin] x
        # [kwin, 128] banded dot (static 128-aligned frame-column window)
        for jb, u0 in enumerate(u0s):
            v = jnp.dot(prs[:, u0:u0 + kwin], cmat[jb],
                        preferred_element_type=jnp.float32, precision=prec)
            for c in range(3):
                xin[c, :, 128 * jb:128 * jb + 128] = \
                    v[rrows * c:rrows * c + rrows].astype(dtype)
        # rest of the net: identical to the non-fused kernel
        body(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
             wh, bh, reg_ref, prob_ref, xin, p1s, c2s)

    return kernel


@functools.partial(jax.jit, static_argnames=("true_hw", "to", "interpret",
                                              "padded_out"))
def pnet_level(packed, level_phase, true_hw, to=16, interpret=False,
               padded_out=False):
    """Fused PNet over one pyramid level.

    packed: ``pack_pnet_weights`` output (its dtype decides the compute
    dtype); level_phase: [B, 3, SH, 2*WB] column-phase-split level planes
    (``adaptive_pool_full_chw_phase`` / ``phase_split_level``), WB =
    ``phase_block_w(SW)``; true_hw: the level's true (SH, SW). Returns
    (reg [B, 4, PH, PW] compute-dtype, prob [B, PH, PW] f32) where
    PH = ceil((SH-2)/2) - 4, PW = ceil((SW-2)/2) - 4 (must be >= 1).
    """
    b, _, sh_in, wtot = level_phase.shape
    sh, sw = true_hw
    wb = phase_block_w(sw)
    assert sh_in == sh and wtot == 2 * wb, (level_phase.shape, true_hw)
    dtype = packed[0].dtype
    level_phase = level_phase.astype(dtype)
    ch, cw = sh - 2, sw - 2
    qh, qw = -(-ch // 2), -(-cw // 2)
    ph, pw = qh - 4, qw - 4
    assert ph >= 1 and pw >= 1, (sh, sw)
    assert to % 8 == 0, to
    nt = -(-ph // to)
    impl = "r4" if packed[0].shape[0] == 96 else "r1"  # see pack_*_r4
    tr_in = 2 * to + 10
    tr_inp = _r16(tr_in)
    tr_p1 = to + (6 if impl == "r4" else 4)
    tr_c2 = to + 2
    tr_p1p, tr_c2p = _r16(tr_p1), _r16(tr_c2)
    wc = wb - 128                 # compute lane width (tap shifts in-bounds)
    rows_pad = 2 * to * (nt - 1) + tr_inp
    x = jnp.pad(level_phase, ((0, 0), (0, 0), (0, rows_pad - sh), (0, 0)))
    owp = _r128(wc)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    cfg = (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc)
    small = [pl.BlockSpec(w.shape, lambda bb, tt: (0, 0),
                          memory_space=pltpu.VMEM) for w in packed]
    reg, prob = pl.pallas_call(
        _make_kernel(cfg, dtype, prec, impl),
        grid=(b, nt),
        in_specs=small + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, to, owp), lambda bb, tt: (bb, 0, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, owp), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4, nt * to, owp), dtype),
            jax.ShapeDtypeStruct((b, nt * to, owp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, tr_inp, 2 * wb), dtype),
            pltpu.VMEM((10, tr_p1p, wb), dtype),
            pltpu.VMEM((16, tr_c2p, wb), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*packed, x)
    if padded_out:
        # pads are well-defined (prob zero-masked in-kernel, reg garbage at
        # prob==0 slots only): selection can run on the padded maps and skip
        # the crop+flatten relayout (see _make_body)
        return reg, prob, (ph, pw)
    return reg[:, :, :ph, :pw], prob[:, :ph, :pw]


def pad_frames_chw16(frames_chw):
    """Zero-pad [B, 3, H, W] planes to H -> 16k, W -> 128k so the fused-pool
    kernel's dynamic row DMA origins can be 16-aligned and its static column
    windows 128-aligned. Pool windows live in [0, H) x [0, W), and pad rows/
    cols only ever multiply zero weights, so the pad values are irrelevant."""
    h, w = frames_chw.shape[2:]
    hp, wp = _r16(h), _r128(w)
    if (hp, wp) == (h, w):
        return frames_chw
    return jnp.pad(frames_chw, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))


@functools.partial(jax.jit,
                   static_argnames=("frame_hw", "true_hw", "to", "interpret",
                                    "padded_out"))
def pnet_level_fused(packed, frames_norm_pad, frame_hw, true_hw, to=16,
                     interpret=False, padded_out=False):
    """Fused pyramid-pool + PNet over one pyramid level: same contract as
    ``pnet_level`` but the input is the NORMALIZED FRAME planes, not the
    pre-pooled level — the adaptive-average pool runs INSIDE the kernel
    (row matmul + banded column matmuls, ``_make_kernel_fused``), so the
    pooled level never round-trips HBM.

    packed: ``pack_pnet_weights`` output; frames_norm_pad: [B, 3, Hp, Wp]
    normalized frame planes padded by ``pad_frames_chw16``; frame_hw: the
    true (H, W); true_hw: the level's (SH, SW). Valid ONLY in the
    ``pool_windows_le2`` regime (asserted) — callers route other levels to
    the gather pool + ``pnet_level``. Bit-identical to
    ``pnet_level(packed, adaptive_pool_full_chw_phase_mm(...), ...)``.
    """
    from .resize import pool_bounds_1d

    b = frames_norm_pad.shape[0]
    hp, wp = frames_norm_pad.shape[2:]
    h, w = frame_hw
    sh, sw = true_hw
    assert hp % 16 == 0 and wp % 128 == 0, (hp, wp)
    ys, ye = pool_bounds_1d(h, sh)
    xs, xe = pool_bounds_1d(w, sw)
    assert (ye - ys).max() <= 2 and (xe - xs).max() <= 2, \
        "fused pool requires the <=2-wide-window regime (pool_windows_le2)"
    wb = phase_block_w(sw)
    dtype = packed[0].dtype
    frames_norm_pad = frames_norm_pad.astype(dtype)
    ch, cw = sh - 2, sw - 2
    qh, qw = -(-ch // 2), -(-cw // 2)
    ph, pw = qh - 4, qw - 4
    assert ph >= 1 and pw >= 1, (sh, sw)
    assert to % 8 == 0, to
    nt = -(-ph // to)
    impl = "r4" if packed[0].shape[0] == 96 else "r1"  # see pack_*_r4
    tr_in = 2 * to + 10
    tr_inp = _r16(tr_in)
    tr_p1 = to + (6 if impl == "r4" else 4)
    tr_c2 = to + 2
    tr_p1p, tr_c2p = _r16(tr_p1), _r16(tr_c2)
    wc = wb - 128
    owp = _r128(wc)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    cfg = (to, ch, cw, tr_inp, tr_p1, tr_p1p, tr_c2, tr_c2p, wb, wc)

    import numpy as np

    # --- per-tile frame-row span + row-pool matrices ----------------------
    need = 0
    for t in range(nt):
        l0 = 2 * to * t
        lmax = min(l0 + tr_in, sh) - 1
        if lmax >= l0:
            need = max(need, int(ye[lmax] - 1 - ys[l0] + 1))
    span_p = min(_r16(need + 15), hp)   # +15: 16-alignment slack of the base
    rmats = np.zeros((nt, tr_inp, span_p), np.float32)
    for t in range(nt):
        l0 = 2 * to * t
        base = (min(int(ys[l0]), hp - span_p) // 16) * 16  # == in-kernel y0
        for i in range(min(tr_in, sh - l0)):
            lo, hi = int(ys[l0 + i]) - base, int(ye[l0 + i]) - 1 - base
            assert 0 <= lo and hi < span_p, (t, i, lo, hi, span_p)
            rmats[t, i, lo] += 0.5
            rmats[t, i, hi] += 0.5
    # --- per-output-block banded column matrices --------------------------
    def block(start):
        idx = np.arange(start, sw, 2)
        return np.concatenate([idx, np.full(wb - len(idx), -1, np.int64)])

    order = np.concatenate([block(0), block(1)])           # [2*wb]
    nblk = (2 * wb) // 128
    kwin, firsts, lasts = 0, [], []
    for jb in range(nblk):
        cols = order[128 * jb:128 * jb + 128]
        live = cols >= 0
        if live.any():
            first = int(xs[cols[live]].min())
            last = int(xe[cols[live]].max())
        else:
            first, last = 0, 1
        firsts.append(first)
        lasts.append(last)
        kwin = max(kwin, last - (first // 128) * 128)
    kwin = min(_r128(kwin), wp)
    u0s, cmats = [], np.zeros((nblk, kwin, 128), np.float32)
    for jb in range(nblk):
        u0 = min((firsts[jb] // 128) * 128, wp - kwin)
        assert u0 >= 0 and u0 <= firsts[jb] and u0 + kwin >= lasts[jb]
        u0s.append(u0)
        cols = order[128 * jb:128 * jb + 128]
        for j in range(128):
            cj = cols[j]
            if cj < 0:
                continue
            s, e = int(xs[cj]), int(xe[cj])
            cmats[jb, s - u0:e - u0, j] = 1.0 / (e - s)
    rmats = jnp.asarray(rmats, dtype)
    cmats = jnp.asarray(cmats, dtype)

    pool_cfg = (h, sh, hp, wp, span_p, kwin, tuple(u0s))
    small = [pl.BlockSpec(w_.shape, lambda bb, tt: (0, 0),
                          memory_space=pltpu.VMEM) for w_ in packed]
    reg, prob = pl.pallas_call(
        _make_kernel_fused(cfg, pool_cfg, dtype, prec, impl),
        grid=(b, nt),
        in_specs=small + [
            pl.BlockSpec((1, tr_inp, span_p), lambda bb, tt: (tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, kwin, 128), lambda bb, tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, to, owp), lambda bb, tt: (bb, 0, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, owp), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4, nt * to, owp), dtype),
            jax.ShapeDtypeStruct((b, nt * to, owp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, tr_inp, 2 * wb), dtype),
            pltpu.VMEM((10, tr_p1p, wb), dtype),
            pltpu.VMEM((16, tr_c2p, wb), dtype),
            pltpu.VMEM((3, span_p, wp), dtype),
            pltpu.VMEM((3 * tr_inp, wp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*packed, rmats, cmats, frames_norm_pad)
    if padded_out:
        return reg, prob, (ph, pw)
    return reg[:, :, :ph, :pw], prob[:, :ph, :pw]
