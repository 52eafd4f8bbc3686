"""Faster R-CNN anime-face detector (ResNet50 + FPN + RPN + RoI head).

Architecture parity target: detectors/rcnn.py:16-151 (mmdetection-style
Faster R-CNN, num_classes=1, anime-face weights). TPU redesign:

- one jitted graph per input bucket: uint8 frames -> keep-ratio resize to
  (800, 1333) -> ImageNet norm -> backbone/FPN -> RPN -> RoIAlign -> head ->
  decode/NMS, all fixed shapes;
- RPN's dynamic filter chain (per-level top-1000, decode, clamp, per
  image-x-level NMS 0.7, per-image cap 1000; rcnn.py:49-82) becomes padded
  buffers with validity masks end-to-end;
- RoIAlign runs as separable interpolation matmuls (ops/roi_align.py), not a
  per-level CUDA-kernel scatter.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import make_anchors
from ..ops.boxes import clamp_to_canvas, convert_to_cwh, decode_boxes, small_boxes_mask
from ..ops.nms import nms_keep_mask, topk_by_score
from ..ops.select import block_topk_select
from ..ops.resize import bilinear_resize_matmul
from ..ops.roi_align import roi_align_multilevel, roi_align_multilevel_pallas
from .. import config
from .layers import ConvUnit, max_pool2d
from .resnet import resnet50, torch_spec as resnet_spec

STRIDES = (4, 8, 16, 32, 64)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def _upsample_nearest(x, out_hw):
    """torch F.interpolate(mode='nearest', size=...): src = floor(dst * in/out)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    iy = (np.arange(oh) * (h / oh)).astype(np.int32)
    ix = (np.arange(ow) * (w / ow)).astype(np.int32)
    x = jnp.take(x, iy, axis=-3)
    return jnp.take(x, ix, axis=-2)


class FPN(nn.Module):
    """1x1 laterals + top-down nearest + 3x3 smooths + extra stride-2 subsample
    level (rcnn.py:16-31)."""

    cout: int = 256

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        laterals = [ConvUnit(self.cout, 1, 1, 0, None, None, name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        for i in range(n - 2, -1, -1):
            laterals[i] = laterals[i] + _upsample_nearest(
                laterals[i + 1], laterals[i].shape[-3:-1])
        outs = [ConvUnit(self.cout, 3, 1, 1, None, None, name=f"smooth{i}")(laterals[i])
                for i in range(n)]
        outs.append(max_pool2d(outs[-1], 1, 2))
        return outs  # P2..P6


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        conv = ConvUnit(256, 3, 1, 1, "relu", None, name="conv")
        log = nn.Conv(self.num_anchors, (1, 1), use_bias=True,
                      precision=config.get_precision(), name="log")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), use_bias=True,
                      precision=config.get_precision(), name="reg")
        regs, logs = [], []
        for f in feats:
            y = conv(f)
            b = y.shape[0]
            regs.append(reg(y).reshape(b, -1, 4))
            logs.append(log(y).reshape(b, -1))
        return regs, logs


class RoIHead(nn.Module):
    num_classes: int = 1
    hidden: int = 1024

    @nn.compact
    def __call__(self, roi_maps):  # [N, 7, 7, C]
        prec = config.get_precision()
        x = roi_maps.reshape(roi_maps.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, precision=prec, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, precision=prec, name="fc1")(x))
        cls = nn.Dense(1 + self.num_classes, precision=prec, name="cls")(x)
        reg = nn.Dense(self.num_classes * 4, precision=prec, name="reg")(x)
        return reg, cls


class FasterRCNN(nn.Module):
    num_classes: int = 1

    @nn.compact
    def __call__(self, x):
        feats = resnet50()(x)  # anonymous submodule -> params under 'ResNet_0'
        pyramid = FPN(name="fpn")(feats)
        regs, logs = RPNHead(name="rpn")(pyramid)
        return pyramid, regs, logs

    # The RoI head runs separately because proposals depend on RPN outputs.


def frcnn_bases():
    anchors = make_anchors([32, 64, 128, 256, 512], [1], [2, 1, 0.5])
    return list(zip(STRIDES, anchors))


def rpn_proposals(regs, logs, priors_per_level, canvas_used_hw, lvtop=1000,
                  out_top=1000, iou_thr=0.7):
    """Fixed-capacity proposal generation (rcnn.py:49-82 semantics).

    regs/logs: per-level [B, D_l, 4] / [B, D_l]. priors_per_level: list of
    numpy [D_l, 4] (cx, cy, w, h). canvas_used_hw: [B, 2] actually-used sizes.
    Returns (proposals [B, out_top, 4], valid [B, out_top]).

    NMS groups by (image, level), so it runs as independent [lvtop]-sized
    problems — [B*L, T, T] IoU matrices instead of one [B, L*T, L*T] monster.
    In throughput mode the NMS is two-pass: exact over each level's top-256
    (slots are score-sorted), tail candidates dropped with their displacement
    risk counted into the returned overflow channel (see inline comment).
    Parity mode runs the full [lvtop]-sized NMS.
    """
    b = regs[0].shape[0]
    nl = len(regs)
    fast = config.get_precision_name() == "default"
    boxes_l, obj_l, valid_l = [], [], []
    select_overflow = jnp.zeros((b,), jnp.int32)
    for reg, log, pri in zip(regs, logs, priors_per_level):
        k = min(lvtop, log.shape[1])
        d = log.shape[1]
        if fast and d > 4 * k:
            # big FPN levels (P2 is ~200k anchors at 800x1333): lax.top_k
            # WITH payload gather lowers to a full variadic sort + long-axis
            # gathers (the same pattern that cost ~20 ms/level in MTCNN) —
            # use the lane-block selector, carrying reg + prior through.
            # Selection key = RAW logit, exactly like the parity branch:
            # keying on sigmoid(logit) instead would saturate every logit
            # above ~17 to exactly 1.0 in f32, turning distinct easy
            # positives into index-order ties and re-ranking the NMS input.
            # overflow_floor=-inf because every finite logit (negative
            # included) is a real candidate here.
            pay = jnp.concatenate(
                [reg, jnp.broadcast_to(jnp.asarray(pri, reg.dtype)[None],
                                       (b, d, 4))], axis=-1)
            vals, sel, overflow = block_topk_select(
                log, pay, k, per_block=4, overflow_floor=-jnp.inf)
            select_overflow = select_overflow + overflow
            bx = decode_boxes(sel[..., :4], sel[..., 4:])
            ob = jax.nn.sigmoid(vals)                           # -inf pad -> 0
            vmask = jnp.isfinite(vals)
        else:
            vals, idx = jax.lax.top_k(log, k)                   # raw-logit order
            sel_reg = jnp.take_along_axis(reg, idx[..., None], axis=1)
            sel_pri = jnp.asarray(pri)[idx]                     # [B, k, 4]
            bx = decode_boxes(sel_reg, sel_pri)
            ob = jax.nn.sigmoid(vals)
            vmask = jnp.ones((b, k), bool)
        pad = lvtop - k
        boxes_l.append(jnp.pad(bx, ((0, 0), (0, pad), (0, 0))))
        obj_l.append(jnp.pad(ob, ((0, 0), (0, pad))))
        valid_l.append(jnp.pad(vmask, ((0, 0), (0, pad))))
    boxes = jnp.stack(boxes_l, axis=1)                          # [B, L, T, 4]
    obj = jnp.stack(obj_l, axis=1)                              # [B, L, T]
    valid = jnp.stack(valid_l, axis=1)

    boxes = clamp_to_canvas(boxes, canvas_used_hw[:, None, None, :])
    valid = valid & small_boxes_mask(boxes, 0.0)
    flat = lambda a: a.reshape((b * nl,) + a.shape[2:])
    nms_t = 256
    if fast and lvtop > nms_t:
        # two-pass NMS (measured tools/profile_rpn.py: full chain 3.98 ->
        # 3.20 ms/batch-2 at 720p): per-level slots are score-DESCENDING
        # (lax.top_k and block_topk_select both sort), so NMS over the first
        # nms_t slots is exact for them — tail candidates are dropped, and a
        # dropped candidate can only LOSE a keeper (it can never wrongly
        # suppress an earlier one), so the displacement risk below is a
        # complete account of the approximation.
        keep_t = jax.vmap(lambda bb, ss, vv: nms_keep_mask(
            bb, ss, vv, iou_thr, presorted=True))(
            flat(boxes)[:, :nms_t], flat(obj)[:, :nms_t], flat(valid)[:, :nms_t])
        keep = jnp.pad(keep_t.reshape(b, nl, nms_t),
                       ((0, 0), (0, 0), (0, lvtop - nms_t))).reshape(b, nl * lvtop)
    else:
        keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(bb, ss, vv, iou_thr))(
            flat(boxes), flat(obj), flat(valid)).reshape(b, nl * lvtop)
    obj3, valid3 = obj, valid
    obj = obj.reshape(b, nl * lvtop)
    boxes = boxes.reshape(b, nl * lvtop, 4)
    idx, out_valid = jax.vmap(lambda ss, kk: topk_by_score(ss, kk, out_top))(obj, keep)
    out_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    if fast and lvtop > nms_t:
        # displacement risk: dropped (rank >= nms_t) valid candidates that
        # score above the final cutoff — or ALL of them when the output
        # isn't full (any kept dropped candidate would have been appended).
        # Counted into the same overflow channel the wrapper already warns on.
        sel_scores = jnp.take_along_axis(obj, idx, axis=1)
        cutoff = jnp.where(jnp.all(out_valid, axis=1),
                           jnp.min(jnp.where(out_valid, sel_scores, jnp.inf),
                                   axis=1),
                           -1.0)
        risk = jnp.sum((obj3[:, :, nms_t:] > cutoff[:, None, None])
                       & valid3[:, :, nms_t:], axis=(1, 2))
        select_overflow = select_overflow + risk.astype(jnp.int32)
    return out_boxes, out_valid, select_overflow


def roi_detections(apply_head, pyramid, proposals, pvalid, canvas_used_hw,
                   num_classes=1, score_thr=0.05, iou_thr=0.5, out_top=100,
                   roi_method="dense"):
    """RoIAlign + head + fixed-capacity final decode/NMS (rcnn.py:103-124).

    ``roi_method="sorted"`` batches images with ``lax.map`` so the
    level-sorted formulation's ``lax.switch`` stays a real branch (vmap
    would flatten it into compute-all-branches selects); other methods
    batch with vmap. On-chip A/B at batch-2 x 1000 rois: sorted 14.4 ms vs
    dense 13.0 — the serialized per-chunk dispatch outweighs the ~2x FLOP
    cut on this part, so dense stays the default.

    ``roi_method="pallas"`` routes the whole batch through the per-roi DMA
    patch engine (ops/pallas_roialign.py) — throughput-mode arm whose cost
    follows real proposals; big-bucket overflow is counted into the returned
    ``roi_dropped`` channel.
    """
    b, r = proposals.shape[:2]
    roi_dropped = jnp.zeros((b,), jnp.int32)
    roi_truncated = jnp.zeros((b,), jnp.int32)

    if roi_method in ("pallas", "pallas-interpret"):
        roi_maps, roi_dropped, roi_kept, roi_truncated = \
            roi_align_multilevel_pallas(
                list(pyramid[:4]), proposals, pvalid, STRIDES[:4],
                interpret=roi_method == "pallas-interpret")
        # rois whose features were dropped by big-bucket overflow MUST lose
        # validity too: their all-zero pooled maps would otherwise score as
        # a constant softmax over the head biases and could emit spurious
        # detections at the proposal box
        pvalid = pvalid & roi_kept
    else:
        def roi_one(bx, f0, f1, f2, f3):
            return roi_align_multilevel([f0, f1, f2, f3], bx, STRIDES[:4],
                                        method=roi_method)

        if roi_method == "sorted":
            roi_maps = jax.lax.map(lambda a: roi_one(*a),
                                   (proposals,) + tuple(pyramid[:4]))
        else:
            roi_maps = jax.vmap(roi_one)(proposals, *pyramid[:4])  # [B, R, 7, 7, C]
    reg, cls = apply_head(roi_maps.reshape(b * r, *roi_maps.shape[2:]))
    nc = num_classes
    reg = reg.reshape(b, r, nc, 4)
    scr = jax.nn.softmax(cls.reshape(b, r, nc + 1), axis=-1)[..., :-1]   # drop background

    priors = convert_to_cwh(proposals)[:, :, None, :]                     # [B, R, 1, 4]
    boxes = decode_boxes(reg, priors, mults=(0.1, 0.2))                   # [B, R, nc, 4]
    boxes = clamp_to_canvas(boxes, canvas_used_hw[:, None, None, :])
    valid = (scr > score_thr) & pvalid[:, :, None] & small_boxes_mask(boxes, 0.0)

    flat_boxes = boxes.reshape(b, r * nc, 4)
    flat_scores = scr.reshape(b, r * nc)
    flat_valid = valid.reshape(b, r * nc)
    class_ids = jnp.tile(jnp.arange(nc, dtype=jnp.int32), (r,))
    keep = jax.vmap(lambda bb, ss, vv: nms_keep_mask(bb, ss, vv, iou_thr, class_ids))(
        flat_boxes, flat_scores, flat_valid)
    idx, out_valid = jax.vmap(lambda ss, kk: topk_by_score(ss, kk, out_top))(
        flat_scores, keep)
    out_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
    out_scores = jnp.take_along_axis(flat_scores, idx, axis=1)
    out_classes = class_ids[idx]
    return out_boxes, out_scores, out_classes, out_valid, roi_dropped, roi_truncated


def resized_shape(h, w, rmin=800, rmax=1333):
    scl = min(rmin / min(h, w), rmax / max(h, w))
    return int(h * scl + 0.5), int(w * scl + 0.5)


def canvas_shape(nh, nw, mult=32):
    return (-(-nh // mult) * mult, -(-nw // mult) * mult)


def full_forward(params, frames_u8, resized_hw, canvas_hw, priors_per_level,
                 num_classes=1, out_top=100, proposal_cap=1000, orig_hw=None,
                 compute_dtype=None, roi_method="dense"):
    """uint8 BGR frames -> final detections in original-frame coordinates.
    ``params`` = {'body': FasterRCNN params, 'head': RoIHead params}.
    ``orig_hw``: set when frames were already cv2-resized on host.
    ``compute_dtype=jnp.bfloat16`` (with bf16 params) = throughput mode."""
    if orig_hw is None:
        h, w = frames_u8.shape[1:3]
    else:
        h, w = orig_hw
    nh, nw = resized_hw
    if compute_dtype is not None and orig_hw is None:
        # Throughput mode: resize straight from uint8 onto the /32 canvas
        # (zero-padded interpolation matrices make the pad free), then one
        # fused masked-normalize pass — channel flip and the per-channel
        # affine commute with the spatial resize, and the ImageNet shift
        # must not leak into the zero pad region, hence the valid-rect mask.
        x = bilinear_resize_matmul(frames_u8, (nh, nw), canvas_hw=canvas_hw)
        rows = jnp.arange(canvas_hw[0])[:, None] < nh
        cols = jnp.arange(canvas_hw[1])[None, :] < nw
        norm = (x[..., ::-1] - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = jnp.where((rows & cols)[..., None], norm, 0.0).astype(compute_dtype)
    else:
        x = frames_u8[..., ::-1].astype(jnp.float32)
        if orig_hw is None:
            x = bilinear_resize_matmul(x, (nh, nw))
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = jnp.pad(x, ((0, 0), (0, canvas_hw[0] - nh), (0, canvas_hw[1] - nw), (0, 0)))
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
    pyramid, regs, logs = FasterRCNN(num_classes).apply({"params": params["body"]}, x)
    regs = [t.astype(jnp.float32) for t in regs]
    logs = [t.astype(jnp.float32) for t in logs]
    used = jnp.tile(jnp.asarray([[nh, nw]], jnp.float32), (x.shape[0], 1))
    proposals, pvalid, select_overflow = rpn_proposals(
        regs, logs, priors_per_level, used, lvtop=proposal_cap,
        out_top=proposal_cap)

    def apply_head(roi_maps):
        if compute_dtype is not None:
            roi_maps = roi_maps.astype(compute_dtype)
        reg, cls = RoIHead(num_classes).apply({"params": params["head"]}, roi_maps)
        return reg.astype(jnp.float32), cls.astype(jnp.float32)

    boxes, scores, classes, valid, roi_dropped, roi_truncated = roi_detections(
        apply_head, pyramid, proposals, pvalid, used, num_classes,
        out_top=out_top, roi_method=roi_method)
    scale = jnp.asarray([w / nw, h / nh, w / nw, h / nh], jnp.float32)
    # 5th output: RPN block-select truncation risk (raise per_block to fix);
    # 6th: pallas-RoIAlign big-bucket drops (raise big_cap or use dense);
    # 7th: pallas-RoIAlign kept-but-window-truncated rois (degenerate aspect
    # ratios; approximation warning, not a drop). Kept SEPARATE so the
    # wrapper's warning names the right remediation. Output arity changed
    # 6 -> 7 in round 5 (was 5 -> 6 in round 4): external callers unpacking
    # the graph outputs positionally must add the new trailing leaf
    # (docs/ROUND5.md).
    return (boxes * scale, scores, classes, valid, select_overflow,
            roi_dropped, roi_truncated)


def torch_spec(num_classes=1):
    """Checkpoint spec in the reference registration order (rcnn.py:126-139
    after AnimeFRCNN.wconv): ResNet50 body, FPN laterals then smooths, RPN
    conv/log/reg, RoI fc0/fc1/cls/reg. The RoI fc0 consumes flattened 7x7x256
    maps — NCHW->NHWC reordering handled by linear_reshaped."""
    from ..utils import weights as W

    els = resnet_spec(prefix="ResNet_0/")
    for i in range(4):
        els.append(W.conv(f"fpn/lateral{i}/conv", bias=True))
    for i in range(4):
        els.append(W.conv(f"fpn/smooth{i}/conv", bias=True))
    els.append(W.conv("rpn/conv/conv", bias=True))
    els.append(W.conv("rpn/log", bias=True))
    els.append(W.conv("rpn/reg", bias=True))
    head = [W.linear_reshaped("fc0", (256, 7, 7), (1, 2, 0)),
            W.linear("fc1"),
            W.linear("cls"),
            W.linear("reg")]
    return els, head
