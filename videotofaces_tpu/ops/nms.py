"""Fixed-capacity NMS on padded buffers.

The reference relies on ``torchvision.ops.batched_nms`` (dynamic output sizes,
C++/CUDA). On TPU every candidate set is a fixed-size buffer with a validity
mask, and NMS returns a keep *mask* (or a top-k gather) instead of a variable
index list. Greedy suppression order matches torchvision: candidates are
processed in descending score order and a candidate is suppressed iff it
overlaps an earlier *kept* candidate of the same group above the threshold.

The MTCNN "Min" NMS (detectors/mtcnn.py:273-309, chain_suppression=True) is a
different rule — a candidate is suppressed if *any* earlier candidate (kept or
not) overlaps it — which is a pure matrix expression with no sequential loop.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import box_iou_matrix


def nms_keep_mask(boxes, scores, valid, iou_thr, group_ids=None, plus_one=False, mode="iou",
                  presorted=False):
    """Greedy NMS over a padded buffer. Returns a bool keep mask in input order.

    boxes [K, 4], scores [K], valid [K] bool, group_ids [K] int (optional):
    suppression only happens within the same group (torchvision batched_nms
    semantics — equivalent to independent per-group NMS).

    Instead of a K-step sequential greedy loop, this solves the greedy
    recursion  keep[i] = valid[i] and not any(j < i: keep[j] and iou > thr)
    by FIXPOINT ITERATION: each step is one [K, K] masked reduction (VPU
    work), and after t steps the first t score-ranks are provably correct, so
    a while_loop with an equality check converges in O(suppression-chain
    depth) iterations (single digits in practice) — not O(K). The recursion
    has a unique solution, so the fixpoint IS the greedy result.
    """
    k = boxes.shape[0]
    if presorted:  # caller guarantees descending score order (e.g. ops/select.py)
        b, v, g = boxes, valid, group_ids
    else:
        masked = jnp.where(valid, scores, -jnp.inf)
        order = jnp.argsort(-masked)  # stable descending
        b = boxes[order]
        v = valid[order]
        g = group_ids[order] if group_ids is not None else None
    iou = box_iou_matrix(b, b, plus_one=plus_one, mode=mode)
    same = jnp.ones((k, k), dtype=bool)
    if g is not None:
        same = g[:, None] == g[None, :]
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    suppresses = (iou > iou_thr) & same & later  # [j, i]: j (if kept) kills i

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        killed = jnp.any(suppresses & keep[:, None], axis=0)
        return v & ~killed, keep, it + 1

    init = (v, jnp.zeros((k,), bool), jnp.int32(0))
    keep_sorted, _, _ = lax.while_loop(cond, body, init)
    if presorted:
        return keep_sorted
    return jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)


def nms_keep_mask_bucketed(boxes, scores, valid, iou_thr, bucket=256,
                           plus_one=False, mode="iou"):
    """Batched ``nms_keep_mask`` ([B, K] buffers) that routes the whole batch
    through a [bucket, bucket] problem whenever every image's valid count
    fits — EXACT results either way (identical stable sort, so identical tie
    order; sorted slots beyond the valid count are -inf and can never be
    kept).

    Why: fixed-capacity NMS pays for the [K, K] IoU matrix and fixpoint
    sweeps at CAPACITY, not at the real candidate count — e.g. MTCNN's
    per-scale stage-1 NMS runs 16 x [1024, 1024] matrices per image at
    min_face_size=5 while typical frames have a handful of candidates per
    scale. The batch-max valid count is a scalar, so one lax.cond picks the
    small graph for quiet batches (a vmapped cond would execute both
    branches)."""
    b, k = scores.shape
    masked = jnp.where(valid, scores, -jnp.inf)

    def run(bb, vv):
        return jax.vmap(lambda x, v: nms_keep_mask(
            x, None, v, iou_thr, plus_one=plus_one, mode=mode,
            presorted=True))(bb, vv)

    if k <= bucket:
        return jax.vmap(lambda x, s, v: nms_keep_mask(
            x, s, v, iou_thr, plus_one=plus_one, mode=mode))(boxes, scores, valid)
    order = jnp.argsort(-masked, axis=1)  # stable — nms_keep_mask's own sort
    sb = jnp.take_along_axis(boxes, order[..., None], axis=1)
    sv = jnp.take_along_axis(valid, order, axis=1)
    maxc = jnp.max(jnp.sum(valid, axis=1))
    keep_sorted = lax.cond(
        maxc <= bucket,
        lambda: jnp.pad(run(sb[:, :bucket], sv[:, :bucket]),
                        ((0, 0), (0, k - bucket))),
        lambda: run(sb, sv))
    return jnp.zeros_like(valid).at[
        jnp.arange(b)[:, None], order].set(keep_sorted)


def nms_keep_mask_bucketed_presorted(boxes, valid, iou_thr, group_ids=None,
                                     bucket=256, plus_one=False, mode="iou"):
    """Batched presorted ``nms_keep_mask`` with quiet-batch bucket routing.

    boxes [B, K, 4] in descending score order with the valid slots forming a
    PREFIX of each row (the ``block_topk_select`` output contract) — so when
    the batch-max valid count fits in ``bucket``, slots beyond the bucket are
    all invalid (they can neither be kept nor suppress anything) and the
    whole batch can run as a [bucket, bucket] problem. EXACT either way; one
    scalar ``lax.cond`` picks the branch (a vmapped cond would execute both).
    YOLO's postprocess NMS pays ~1.5 ms/batch-8 at K=1000 capacity in the
    per-op trace regardless of how many candidates are real; this bounds the
    cost by the batch's actual worst row.
    """
    b, k = valid.shape

    def run(bb, vv, gg):
        if gg is None:
            return jax.vmap(lambda x, v: nms_keep_mask(
                x, None, v, iou_thr, plus_one=plus_one, mode=mode,
                presorted=True))(bb, vv)
        return jax.vmap(lambda x, v, g: nms_keep_mask(
            x, None, v, iou_thr, group_ids=g, plus_one=plus_one, mode=mode,
            presorted=True))(bb, vv, gg)

    if k <= bucket:
        return run(boxes, valid, group_ids)
    maxc = jnp.max(jnp.sum(valid, axis=1))
    return lax.cond(
        maxc <= bucket,
        lambda: jnp.pad(run(boxes[:, :bucket], valid[:, :bucket],
                            None if group_ids is None else group_ids[:, :bucket]),
                        ((0, 0), (0, k - bucket))),
        lambda: run(boxes, valid, group_ids))


def iom_chain_suppress(boxes, scores, valid, iom_thr, group_ids=None, plus_one=True):
    """MTCNN final-stage 'Min' NMS with chain suppression — fully parallel.

    A candidate is dropped iff ANY candidate earlier in (stable) descending
    score order within the same group has intersection-over-minimum > thr,
    regardless of whether that earlier candidate itself survives.
    Reference: detectors/mtcnn.py:273-309 with method='Min'.
    """
    k = boxes.shape[0]
    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked)
    rank = jnp.zeros((k,), dtype=jnp.int32).at[order].set(jnp.arange(k, dtype=jnp.int32))
    iom = box_iou_matrix(boxes, boxes, plus_one=plus_one, mode="iom")
    earlier = rank[:, None] < rank[None, :]  # [j, i]: j earlier than i
    same = jnp.ones((k, k), dtype=bool)
    if group_ids is not None:
        same = group_ids[:, None] == group_ids[None, :]
    kills = (iom > iom_thr) & earlier & same & valid[:, None]
    return valid & ~jnp.any(kills, axis=0)


def topk_by_score(scores, keep, topk):
    """Indices of the top-k kept candidates by score (padded with validity).

    Returns (idx [topk], valid [topk]). Order is descending score — the same
    order torchvision batched_nms returns its keeps in, so ``[:imtop]``
    truncation semantics (operations/post.py:4-10) are preserved.
    """
    masked = jnp.where(keep, scores, -jnp.inf)
    vals, idx = lax.top_k(masked, topk)
    return idx, vals > -jnp.inf


def batched_nms_topk(boxes, scores, valid, iou_thr, topk, group_ids=None, plus_one=False):
    """Greedy NMS + top-k selection: the fixed-capacity ``final_nms`` equivalent.

    Inputs are flat padded buffers [K, ...]; output is ([topk, 4] boxes,
    [topk] scores, [topk] source indices, [topk] valid mask).
    """
    keep = nms_keep_mask(boxes, scores, valid, iou_thr, group_ids=group_ids, plus_one=plus_one)
    idx, out_valid = topk_by_score(scores, keep, topk)
    return boxes[idx], scores[idx], idx, out_valid

