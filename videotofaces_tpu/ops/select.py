"""Fast top-k candidate selection with payload (TPU-native).

On TPU, `lax.top_k` WITH indices lowers to a full variadic sort, and any
subsequent per-candidate payload pick (gather / take_along_axis / one-hot
matmul over the full candidate axis) costs ~1.5us per row — measured ~12 ms
of a 13.6 ms YOLO step at D=22743, regardless of formulation (docs/ROADMAP).

``block_topk_select`` restructures the problem so nothing expensive touches
the long axis:

1. reshape scores to [B, R, 128] lane blocks; take the top ``per_block``
   entries of each block by ITERATIVE ARGMAX (cheap VPU ops — per_block
   passes over 128 lanes);
2. select each winner's payload with a 128-wide one-hot contraction
   (lane-local, so the one-hot tensor is tiny);
3. run ONE short variadic sort over the ~R*per_block survivors to get the
   global top-k in descending-score order, payload carried through the sort.

Exactness: identical to exact top-k unless some 128-lane block contains more
than ``per_block`` members of the true global top-k; the returned
``overflow`` counts exactly the blocks whose first UNSELECTED candidate
would still make the global top-k, so callers can detect truncation and
raise ``per_block``.
"""

import jax
import jax.numpy as jnp
from jax import lax

BLOCK = 128


def block_topk_select(scores, payload, k, per_block=32, pad_value=-jnp.inf,
                      overflow_floor=0.0):
    """scores: [B, D] (higher = better; invalid entries must be <=
    ``overflow_floor`` or -inf); payload: [B, D, P] float32. Returns
    (vals [B, k] descending, sel [B, k, P], overflow [B] int32 — candidate
    blocks that may have been truncated).

    ``overflow_floor`` separates real candidates from invalid filler in the
    truncation test: leftovers at or below it never count as overflow. The
    0.0 default fits detector-score keys (invalid = 0); pass ``-jnp.inf``
    when every finite entry is a real candidate (e.g. raw logits, which can
    be negative).
    """
    b, d = scores.shape
    p = payload.shape[-1]
    r = -(-d // BLOCK)
    # guarantee >= 2k total capacity so k >~ D cases stay exact (per_block=BLOCK
    # degenerates to a plain full sort, which is fine at small D)
    per_block = min(BLOCK, max(per_block, -(-2 * k // r)))
    dp = r * BLOCK
    s = jnp.pad(scores, ((0, 0), (0, dp - d)), constant_values=pad_value)
    s = s.reshape(b, r, BLOCK)
    pay = jnp.pad(payload, ((0, 0), (0, dp - d), (0, 0))).reshape(b, r, BLOCK, p)

    lanes = jnp.arange(BLOCK)
    remaining = s
    vals_list, onehot_list = [], []
    for _ in range(per_block):
        v = jnp.max(remaining, axis=-1)                       # [B, R]
        am = jnp.argmax(remaining, axis=-1)                   # [B, R]
        hit = lanes[None, None, :] == am[..., None]           # [B, R, BLOCK]
        vals_list.append(v)
        onehot_list.append(hit)
        remaining = jnp.where(hit, pad_value, remaining)
    vals = jnp.stack(vals_list, axis=2)                       # [B, R, per_block]
    onehot = jnp.stack(onehot_list, axis=2)                   # [B, R, per_block, BLOCK]

    sel = jnp.einsum("brif,brfp->brip", onehot.astype(payload.dtype), pay,
                     precision=lax.Precision.HIGHEST)         # [B, R, per_block, P]

    n = r * per_block
    flat_vals = vals.reshape(b, n)
    flat_sel = sel.reshape(b, n, p)

    # one short variadic sort (descending by score) carrying the payload
    operands = (jnp.where(jnp.isfinite(flat_vals), -flat_vals, jnp.inf),) + tuple(
        flat_sel[..., i] for i in range(p))
    sorted_ops = lax.sort(operands, dimension=-1, num_keys=1)
    neg_sorted = sorted_ops[0][:, :k]
    out_vals = jnp.where(jnp.isinf(neg_sorted), pad_value, -neg_sorted)
    out_sel = jnp.stack([o[:, :k] for o in sorted_ops[1:]], axis=-1)

    # overflow detection: a block is truncated iff the (per_block+1)-th best
    # candidate it holds — the first one NOT selected — would still make the
    # global top k. ``remaining`` holds exactly those leftovers, so one more
    # max is a precise test (judging by the LAST pick instead false-fires on
    # blocks holding exactly per_block candidates).
    kth = out_vals[:, k - 1]                                   # [B]
    next_best = jnp.max(remaining, axis=-1)                    # [B, R]
    overflow = jnp.sum((next_best > kth[:, None]) & (next_best > overflow_floor)
                       & jnp.isfinite(next_best), axis=1).astype(jnp.int32)
    return out_vals, out_sel, overflow


def pick_rows_onehot(payload, idx):
    """Gather-free k-row pick: ``payload[b, idx[b, k], :]`` as two one-hot
    contractions (matmul-shaped, no gathers).

    ``payload``: [B, D, P]; ``idx``: [B, k] int32 flat indices into D.
    Returns [B, k, P] in ``payload.dtype``. Exact — a one-hot row of the
    contraction just copies the selected value (f32 accumulation).

    This is the fallback formulation for TPU stacks where row-gathers on a
    huge candidate axis run at the pathological ~1.5 us/row rate instead of
    the ~5.5 ns/element floor (ROADMAP watch item; A/B in
    tools/profile_gather.py arm C vs ``take_along_axis`` arm A): the row is
    located block-by-lane — a [B, k, R] one-hot picks the 128-row block, a
    [B, k, 128] one-hot picks the lane within it — so the expensive axis is
    only ever touched by MXU-tileable einsums.
    """
    b, d, p = payload.shape
    blk = idx // BLOCK
    lane = idx % BLOCK
    rpad = jnp.pad(payload, ((0, 0), (0, (-d) % BLOCK), (0, 0)))
    rb = rpad.reshape(b, -1, BLOCK, p)                     # [B, R, 128, P]
    nr = rb.shape[1]
    oh_blk = jax.nn.one_hot(blk, nr, dtype=rb.dtype)       # [B, k, R]
    oh_lane = jax.nn.one_hot(lane, BLOCK, dtype=rb.dtype)  # [B, k, 128]
    rows = jnp.einsum("bkr,brlp->bklp", oh_blk, rb,
                      precision=lax.Precision.HIGHEST)     # [B, k, 128, P]
    return jnp.einsum("bkl,bklp->bkp", oh_lane, rows,
                      precision=lax.Precision.HIGHEST)


def block_topk_indices(scores, k, per_block=32, pad_value=-jnp.inf):
    """Like ``block_topk_select`` but returns flat INDICES instead of a
    carried payload: (vals [B, k] descending, idx [B, k] int32, overflow [B]).

    The flat index of each block winner is ``block_id * 128 + argmax_lane`` —
    computed from values the argmax passes already produce, so NOTHING
    full-candidate-axis-sized is ever materialized (``block_topk_select``
    pads + reshapes its f32 payload at [B, D, P]; at MTCNN's 3M-candidate
    pyramid level that payload copy alone is ~8 ms/step on v5e — the caller
    gathers the k winners' payload rows afterwards instead, k*P elements at
    the ~5.5 ns/element gather floor).

    Tie order matches ``lax.top_k`` exactly (descending value, ascending
    index among equals): within a block, iterative argmax picks the lowest
    lane first; across blocks the pre-sort layout is block-major and
    ``lax.sort`` is stable.
    """
    b, d = scores.shape
    r = -(-d // BLOCK)
    per_block = min(BLOCK, max(per_block, -(-2 * k // r)))
    dp = r * BLOCK
    s = jnp.pad(scores, ((0, 0), (0, dp - d)), constant_values=pad_value)
    s = s.reshape(b, r, BLOCK)

    base = (jnp.arange(r, dtype=jnp.int32) * BLOCK)[None, :]   # [1, R]
    remaining = s
    vals_list, idx_list = [], []
    for _ in range(per_block):
        v = jnp.max(remaining, axis=-1)                        # [B, R]
        am = jnp.argmax(remaining, axis=-1)                    # [B, R]
        vals_list.append(v)
        idx_list.append(base + am.astype(jnp.int32))
        remaining = jnp.where(
            jnp.arange(BLOCK)[None, None, :] == am[..., None], pad_value,
            remaining)
    # [B, R, per_block] -> block-major flat order (ties: ascending index)
    vals = jnp.stack(vals_list, axis=2).reshape(b, r * per_block)
    idx = jnp.stack(idx_list, axis=2).reshape(b, r * per_block)

    neg = jnp.where(jnp.isfinite(vals), -vals, jnp.inf)
    neg_sorted, idx_sorted = lax.sort((neg, idx), dimension=-1, num_keys=1)
    neg_sorted, idx_sorted = neg_sorted[:, :k], idx_sorted[:, :k]
    out_vals = jnp.where(jnp.isinf(neg_sorted), pad_value, -neg_sorted)
    # padded-lane picks carry index >= d only when fewer than k finite
    # entries exist; clamp so downstream gathers stay in-bounds (their
    # scores are pad_value, so callers' validity masks already kill them)
    idx_sorted = jnp.minimum(idx_sorted, d - 1)

    kth = out_vals[:, k - 1]
    next_best = jnp.max(remaining, axis=-1)
    overflow = jnp.sum((next_best > kth[:, None]) & (next_best > 0.0)
                       & jnp.isfinite(next_best), axis=1).astype(jnp.int32)
    return out_vals, idx_sorted, overflow
