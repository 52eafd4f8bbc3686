"""Fast top-k candidate selection with payload (TPU-native).

On TPU, `lax.top_k` WITH indices lowers to a full variadic sort, and any
subsequent per-candidate payload pick (gather / take_along_axis / one-hot
matmul over the full candidate axis) costs ~1.5us per row — measured ~12 ms
of a 13.6 ms YOLO step at D=22743, regardless of formulation (docs/ROADMAP).

``block_topk_select`` restructures the problem so nothing expensive touches
the long axis:

1. reshape scores to [B, R, 128] lane blocks; take the top ``per_block``
   entries of each block by ITERATIVE ARGMAX (cheap VPU ops; a one-shot
   stable lane-sort variant exists as method="sort" — measured a wash,
   see ``_block_top``);
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


def _block_top(s, per_block, pad_value, method="argmax"):
    """Per-block top-``per_block`` of ``s`` [B, R, BLOCK].

    Returns (vals [B, R, per_block] descending, lane [B, R, per_block] int32,
    next_best [B, R] — the best UNSELECTED value per block, for exact
    overflow counting). Tie order: descending value, ascending lane.

    method="sort": ONE stable variadic lane sort per block instead of
    ``per_block`` serialized (reduce_max, argmax, compare, select) rounds.
    Identical results for every slot holding a FINITE value: lax.sort is
    stable, so equal values keep ascending lane order, exactly the first-hit
    order iterative argmax produces (bit-equality unit-tested). Slots past a
    block's finite entries (-inf pads) return ``pad_value`` in both arms but
    their lanes/payload differ: argmax keeps returning the all--inf argmax
    (lane 0, so lane-0's payload) while the sort walks the pad lanes in
    ascending order — consumers must treat returned-``pad_value`` slots as
    invalid, never gather by their idx. MEASURED A WASH in the full YOLO graph
    (tools/profile_select.py, per_block=20: argmax 12.18 vs sort 12.23
    ms/batch-8 interleaved — the per-op trace had attributed ~2.3 ms to the
    argmax reduce chain, but those passes overlap other work, another
    reminder that only interleaved A/Bs are trustworthy here). Default
    stays "argmax" (round-3 behavior; also fewer ops at MTCNN's
    per_block=4); "sort" is kept tested for shapes where the trade could
    differ.
    """
    if method == "sort":
        lanes = jnp.broadcast_to(jnp.arange(BLOCK, dtype=jnp.int32), s.shape)
        neg = jnp.where(jnp.isfinite(s), -s, jnp.inf)
        neg_sorted, lane_sorted = jax.lax.sort((neg, lanes), dimension=-1,
                                               num_keys=1)
        top_neg = neg_sorted[..., :per_block]
        vals = jnp.where(jnp.isinf(top_neg), pad_value, -top_neg)
        nb = neg_sorted[..., per_block] if per_block < BLOCK else \
            jnp.full(s.shape[:2], jnp.inf, s.dtype)
        next_best = jnp.where(jnp.isinf(nb), -jnp.inf, -nb)
        return vals, lane_sorted[..., :per_block], next_best
    lanes = jnp.arange(BLOCK)
    remaining = s
    vals_list, lane_list = [], []
    for _ in range(per_block):
        v = jnp.max(remaining, axis=-1)
        am = jnp.argmax(remaining, axis=-1)
        vals_list.append(v)
        lane_list.append(am.astype(jnp.int32))
        remaining = jnp.where(lanes[None, None, :] == am[..., None], pad_value,
                              remaining)
    return (jnp.stack(vals_list, axis=2), jnp.stack(lane_list, axis=2),
            jnp.max(remaining, axis=-1))


def block_topk_select(scores, payload, k, per_block=32, pad_value=-jnp.inf,
                      overflow_floor=0.0, method="argmax"):
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

    vals, lane, next_best = _block_top(s, per_block, pad_value, method)
    onehot = lane[..., None] == jnp.arange(BLOCK)[None, None, None, :]
    # [B, R, per_block] / [B, R, per_block, BLOCK]

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
    # candidate it holds — the first one NOT selected (``next_best``) — would
    # still make the global top k (judging by the LAST pick instead
    # false-fires on blocks holding exactly per_block candidates).
    kth = out_vals[:, k - 1]                                   # [B]
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


def block_topk_indices(scores, k, per_block=32, pad_value=-jnp.inf,
                       method="argmax"):
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

    base = (jnp.arange(r, dtype=jnp.int32) * BLOCK)[None, :, None]  # [1, R, 1]
    bvals, lane, next_best = _block_top(s, per_block, pad_value, method)
    # [B, R, per_block] -> block-major flat order (ties: ascending index)
    vals = bvals.reshape(b, r * per_block)
    idx = (base + lane).reshape(b, r * per_block)

    neg = jnp.where(jnp.isfinite(vals), -vals, jnp.inf)
    neg_sorted, idx_sorted = lax.sort((neg, idx), dimension=-1, num_keys=1)
    neg_sorted, idx_sorted = neg_sorted[:, :k], idx_sorted[:, :k]
    out_vals = jnp.where(jnp.isinf(neg_sorted), pad_value, -neg_sorted)
    # padded-lane picks carry index >= d only when fewer than k finite
    # entries exist; clamp so downstream gathers stay in-bounds (their
    # scores are pad_value, so callers' validity masks already kill them)
    idx_sorted = jnp.minimum(idx_sorted, d - 1)

    kth = out_vals[:, k - 1]
    overflow = jnp.sum((next_best > kth[:, None]) & (next_best > 0.0)
                       & jnp.isfinite(next_best), axis=1).astype(jnp.int32)
    return out_vals, idx_sorted, overflow
