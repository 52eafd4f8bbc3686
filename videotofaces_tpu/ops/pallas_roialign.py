"""Pallas TPU kernel: multilevel RoIAlign as per-roi DMA + ONE MXU dot.

The production dense formulation (ops/roi_align.py, method="dense") pools
every roi against the WHOLE feature map of every level — exact and
gather-free, but its FLOP cost is independent of how many rois are real and
it measured ~9-10 ms of the 25.7 ms R-CNN step (docs/ROADMAP.md). This
engine makes the cost follow the rois instead, the same move the MTCNN
Pallas crop engine made (ops/pallas_crops.py):

1. all FPN levels (and the batch) are row-stacked into ONE [Hs, Wp, C]
   buffer; a roi's patch is a [py, px, C] window DMA'd from its level's
   rows at its aligned origin (scalar-prefetched SMEM scalars). Lane dim is
   C (256 — always tile-aligned, so column alignment costs only the
   8-sublane slack on px);
2. the torchvision sampling-grid weights (sampling_ratio=0, aligned=True —
   the exact math of ops/roi_align.py::_axis_weights) are built ON CHIP in
   "row-grid" form: output bin (i, j) lives at grid row i*8+j, and the
   per-axis hat-function sums are evaluated over [56, py] / [56, px] iota
   grids from the roi's (c1, c2, k) scalars;
3. the separable weights are spread into the joint [56, py*px] form with
   two constant {0,1} spread matmuls (W = (wy @ SY) * (wx @ SX)) and the
   whole 7x7xC pooled output falls out of ONE [56, py*px] x [py*px, C] MXU
   dot (the [py, px, C] patch reinterprets as [py*px, C] for free because
   px is a sublane multiple).

Invalid slots (padding, other bucket) skip the DMA and every dot via
``pl.when`` — cost scales with REAL rois. Callers size-bucket rois by their
feature-unit span (patch capacity is px - 7 columns after alignment slack)
exactly like the MTCNN crop engine's buckets.

Numerics: weights and patches run bf16 into f32 accumulation (one
multiply per tap pair) — this engine is the THROUGHPUT-mode arm; parity
mode keeps the dense f32 method. Reference contract: torchvision
roi_align via operations/roi.py:19-33, level assignment operations/
roi.py:7-16.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID_ROWS = 56          # out bin (i, j) -> grid row i*8 + j (7x7 used, 8-padded)
FIX = 65536.0           # 16.16 fixed-point for float roi coords in SMEM


def sublane_align():
    """Dynamic-slice alignment for the second-minor (W) dim of the stacked
    feature buffer: the memref tile is (8, 128) on (W, C) for both f32 and
    bf16 (bf16 packs pairs within a tile), so W slice origins must be
    PROVABLY divisible by 8 — which also means the kernel must compute the
    aligned origin itself in the ``(min(start, bound) // 8) * 8`` form
    Mosaic's divisibility analysis accepts (a pre-aligned SMEM scalar is
    not provable). The (8, 128) tile shape holds for both f32 and bf16
    stacks (bf16 packs pairs within a tile), so the alignment is 8 in
    both cases."""
    return 8


def _axis_weight_grid(sub_idx, c1, c2, k, origin, true_size, out_size=7,
                      k_max=8):
    """[GRID_ROWS, P] hat-sum weights for one axis, on a patch that starts at
    ``origin`` (level-local). ``sub_idx``: [GRID_ROWS, P] int32 — the output
    bin index each grid row pools for (i = row//8 for y, j = row%8 for x).
    Exact torchvision sampling_ratio=0 math (ops/roi_align.py::_axis_weights).
    """
    p = sub_idx.shape[1]
    roi = c2 - c1
    bin_size = roi / out_size
    kf = jnp.maximum(k.astype(jnp.float32), 1.0)
    r = jax.lax.broadcasted_iota(jnp.int32, (GRID_ROWS, p), 1).astype(jnp.float32)
    abs_r = r + origin.astype(jnp.float32)          # level-local row ids
    i = sub_idx.astype(jnp.float32)
    acc = jnp.zeros((GRID_ROWS, p), jnp.float32)
    for j in range(k_max):
        y = c1 + i * bin_size + (j + 0.5) * (bin_size / kf)
        ok = (j < k) & (y >= -1.0) & (y <= true_size)
        yc = jnp.maximum(y, 0.0)
        y_low = jnp.floor(yc)
        at_edge = y_low >= true_size - 1.0
        y_low = jnp.where(at_edge, true_size - 1.0, y_low)
        frac = jnp.where(at_edge, 0.0, yc - y_low)
        w = jnp.where(abs_r == y_low, 1.0 - frac, 0.0) \
            + jnp.where(abs_r == y_low + 1.0, frac, 0.0)
        acc = acc + jnp.where(ok, w, 0.0)
    return acc / jnp.minimum(kf, float(k_max))


def _make_kernel(py, px, c, dtype, group):
    nsc = 12

    def kernel(scal_ref, fstack_ref, sy_ref, sx_ref, out_ref, patch, sem):
        base = pl.program_id(0) * group

        def read(g):
            s = [scal_ref[nsc * (base + g) + i] for i in range(nsc)]
            # tile-aligned col origin computed IN-KERNEL: Mosaic's
            # divisibility analysis accepts the (min(start, bound)//8)*8
            # form (same trick as ops/pallas_crops.py); the <= 7-column
            # alignment loss is absorbed by the patch slack
            x0 = (jnp.minimum(s[2], s[4] - px) // 8) * 8
            return s, x0

        def copy(g, y0, x0):
            return pltpu.make_async_copy(
                fstack_ref.at[pl.ds(y0, py), pl.ds(x0, px), :],
                patch.at[g], sem.at[g])

        # read every roi's scalars ONCE (SMEM scalar loads are a real cost at
        # ~2000 slots), start all live DMAs first so they overlap, then
        # compute per roi
        vals = [read(g) for g in range(group)]
        for g, (s, x0) in enumerate(vals):
            @pl.when(s[0] != 0)
            def _start(g=g, s=s, x0=x0):
                copy(g, s[1], x0).start()

        for g, (s, x0) in enumerate(vals):
            @pl.when(s[0] != 0)
            def _run(g=g, s=s, x0=x0):
                copy(g, s[1], x0).wait()
                c1y = s[5].astype(jnp.float32) / FIX
                c2y = s[6].astype(jnp.float32) / FIX
                c1x = s[7].astype(jnp.float32) / FIX
                c2x = s[8].astype(jnp.float32) / FIX
                hl = (s[11] >> 16).astype(jnp.float32)
                wl = (s[11] & 0xFFFF).astype(jnp.float32)
                iy = jax.lax.broadcasted_iota(jnp.int32, (GRID_ROWS, py), 0) // 8
                jx = jax.lax.broadcasted_iota(jnp.int32, (GRID_ROWS, px), 0) % 8
                wy = _axis_weight_grid(iy, c1y, c2y, s[9], s[3], hl)
                wx = _axis_weight_grid(jx, c1x, c2x, s[10], x0, wl)
                # spread [56, py]/[56, px] -> [56, py*px] with constant {0,1}
                # matmuls, then one joint dot against the flattened patch
                wye = jnp.dot(wy.astype(dtype), sy_ref[...],
                              preferred_element_type=jnp.float32)
                wxe = jnp.dot(wx.astype(dtype), sx_ref[...],
                              preferred_element_type=jnp.float32)
                wj = (wye * wxe).astype(dtype)                # [56, py*px]
                flat = patch[g].reshape(py * px, c)
                out_ref[g] = jnp.dot(wj, flat,
                                     preferred_element_type=jnp.float32)

            @pl.when(s[0] == 0)
            def _skip(g=g):
                out_ref[g] = jnp.zeros((GRID_ROWS, c), jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("win_hw", "interpret", "group"))
def roi_align_patches(fstack, scalars, sy, sx, win_hw, interpret=False,
                      group=8):
    """fstack: [Hs, Wp, C] row-stacked (batch x levels) feature buffer,
    Wp % 8 == 0, with >= win_hw[0] zero rows of tail padding; scalars:
    [N, 12] int32 rows (see kernel) with, for every ok row, the sampling
    window inside [oy, oy+py) x [ox, ox+px) local / [y0, y0+py) x
    [x0, x0+px) absolute and x0 % 8 == 0; sy/sx: the constant spread
    matrices from ``spread_matrices(win_hw)``. Returns [N, 56, C] f32 grid
    rows (bin (i, j) at row i*8+j; rows with j == 7 are padding).
    """
    n = scalars.shape[0]
    hs, wp, c = fstack.shape
    py, px = win_hw
    algn = sublane_align()
    assert wp % algn == 0 and px % algn == 0 and px <= wp, (wp, px, algn)
    # ``group`` rois per grid step: the per-program floor measured ~2.2 us
    # even for skipped slots (grid bookkeeping + output block copy), so
    # single-roi programs cost ~4.5 ms at N=2000 before any work happens;
    # grouping amortizes it AND overlaps the group's patch DMAs. VMEM:
    # group * py * px * C * itemsize must fit (~5 MB at (32, 40) x8 bf16).
    group = max(1, min(group, 12 * 2 ** 20 //
                       (py * px * c * jnp.dtype(fstack.dtype).itemsize)))
    npad = -(-n // group) * group
    if npad != n:
        scalars = jnp.pad(scalars, ((0, npad - n), (0, 0)))  # ok=0 filler
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, GRID_ROWS, c), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((group, py, px, c), fstack.dtype),
                        pltpu.SemaphoreType.DMA((group,))],
    )
    out = pl.pallas_call(
        _make_kernel(py, px, c, fstack.dtype, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, GRID_ROWS, c), jnp.float32),
        interpret=interpret,
    )(scalars.reshape(-1).astype(jnp.int32), fstack, sy, sx)
    return out[:n]


@functools.lru_cache(maxsize=None)
def _spread_np(win_hw):
    import numpy as np

    py, px = win_hw
    sy = np.zeros((py, py * px), np.float32)
    sx = np.zeros((px, py * px), np.float32)
    cols = np.arange(py * px)
    sy[cols // px, cols] = 1.0
    sx[cols % px, cols] = 1.0
    return sy, sx


def spread_matrices(win_hw, dtype):
    sy, sx = _spread_np(win_hw)
    return jnp.asarray(sy, dtype), jnp.asarray(sx, dtype)
