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


def _make_kernel(cfg, dtype, prec):
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

    def kernel(w1, b1, a1, w2a, w2b, w2c, b2, a2, w3a, w3b, w3c, b3, a3,
               wh, bh, x_any, reg_ref, prob_ref, xin, p1s, c2s, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = pl.multiple_of(2 * to * t, 16)
        cp = pltpu.make_async_copy(
            x_any.at[b, :, pl.ds(row0, tr_inp), :], xin, sem)
        cp.start()
        cp.wait()

        # the 2 phase blocks (pre-gathered by the pyramid pool)
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

        # conv3 + both heads per output row; softmax(cls)[1] == sigmoid(d)
        for r in range(to):
            v3 = conv_shift(c2s, r, 16, (w3a, w3b, w3c),
                            b3, a3, 48).astype(dtype)
            hv = jnp.dot(wh[:], v3, preferred_element_type=jnp.float32,
                         precision=prec) + bh[:]                    # [8, wc]
            reg_ref[0, :, r, :wc] = hv[0:4].astype(dtype)
            prob_ref[0, r, :wc] = jax.nn.sigmoid(hv[5] - hv[4])

    return kernel


@functools.partial(jax.jit, static_argnames=("true_hw", "to", "interpret"))
def pnet_level(packed, level_phase, true_hw, to=16, interpret=False):
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
    tr_in = 2 * to + 10
    tr_inp = _r16(tr_in)
    tr_p1, tr_c2 = to + 4, to + 2
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
        _make_kernel(cfg, dtype, prec),
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
    return reg[:, :, :ph, :pw], prob[:, :ph, :pw]
