"""Detector fine-tuning: adapt YOLOv3 to a custom face domain.

The reference ships fixed pretrained detectors; this module adds two
adaptation paths: head-only re-fit (``finetune_yolo_head`` — Darknet trunk
frozen, the cheap default) and full fine-tuning with layerwise learning
rates (``finetune_yolo_full`` — backbone/neck/head train at 0.1/0.3/1.0x
via ``layerwise_tx``). TPU-first split of the work:

- **target assignment runs on host** (numpy, per batch): each prior gets an
  objectness target in {1 positive, 0 negative, -1 ignore} and the matched
  ground-truth box. Max-IoU rule with forced best-prior-per-gt, the standard
  anchor assignment. Host-side is the right place: it is data-dependent,
  branchy, tiny (O(D*G) per image), and produces STATIC-shaped dense targets
  the device graph consumes without any dynamic shapes;
- **the loss is one jitted graph**: trunk forward (constant w.r.t. the head
  parameters — jax differentiates only the head), per-prior BCE objectness
  with ignore masking, BCE class loss, and GIoU on decoded boxes (decoding
  reuses ops/boxes.decode_boxes mode='yolo', the inference path's math);
- a ('data',) mesh shards the batch; params replicated, XLA adds the psums.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import yolo as Y
from ..ops.boxes import decode_boxes


# -- host-side target assignment --------------------------------------------


def priors_to_corners(priors):
    """[D, 4] (cx, cy, w, h) -> (x1, y1, x2, y2), numpy."""
    p = np.asarray(priors)
    return np.concatenate([p[:, :2] - p[:, 2:] / 2, p[:, :2] + p[:, 2:] / 2], axis=1)


def iou_matrix(a, b):
    """[N, 4] x [M, 4] corner boxes -> [N, M] IoU, numpy."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def assign_targets(gt_boxes, priors, pos_iou=0.5, neg_iou=0.4):
    """One image: gt corner boxes [G, 4] (canvas coords) -> per-prior targets.

    Returns (obj_t [D] float32 in {1, 0, -1}, box_t [D, 4] matched gt corners).
    Rule: IoU >= pos_iou -> positive; IoU < neg_iou -> negative; in between
    -> ignore; additionally every gt's single best-IoU prior is FORCED
    positive so no gt goes unassigned (the classic max-IoU assigner).
    """
    d = priors.shape[0]
    obj_t = np.zeros(d, np.float32)
    box_t = np.zeros((d, 4), np.float32)
    gt = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    if gt.shape[0] == 0:
        return obj_t, box_t
    ious = iou_matrix(priors_to_corners(priors), gt)        # [D, G]
    best_gt = ious.argmax(axis=1)
    best_iou = ious[np.arange(d), best_gt]
    obj_t[(best_iou >= neg_iou) & (best_iou < pos_iou)] = -1.0
    obj_t[best_iou >= pos_iou] = 1.0
    forced = ious.argmax(axis=0)                            # [G]
    obj_t[forced] = 1.0
    best_gt[forced] = np.arange(gt.shape[0])
    box_t = gt[best_gt]
    return obj_t, box_t


def assign_batch(gt_boxes_list, priors, pos_iou=0.5, neg_iou=0.4):
    pairs = [assign_targets(g, priors, pos_iou, neg_iou) for g in gt_boxes_list]
    return (np.stack([p[0] for p in pairs]), np.stack([p[1] for p in pairs]))


# -- device-side loss ---------------------------------------------------------


def giou(pred, gt):
    """Generalized IoU of aligned corner boxes [..., 4] -> [...]."""
    inter_lt = jnp.maximum(pred[..., :2], gt[..., :2])
    inter_rb = jnp.minimum(pred[..., 2:], gt[..., 2:])
    inter = jnp.prod(jnp.maximum(inter_rb - inter_lt, 0.0), axis=-1)
    area_p = jnp.prod(jnp.maximum(pred[..., 2:] - pred[..., :2], 0.0), axis=-1)
    area_g = jnp.prod(jnp.maximum(gt[..., 2:] - gt[..., :2], 0.0), axis=-1)
    union = area_p + area_g - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hull_lt = jnp.minimum(pred[..., :2], gt[..., :2])
    hull_rb = jnp.maximum(pred[..., 2:], gt[..., 2:])
    hull = jnp.prod(jnp.maximum(hull_rb - hull_lt, 0.0), axis=-1)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def _bce_logits(logit, target):
    return optax.sigmoid_binary_cross_entropy(logit, target)


def detection_loss_full(params, images, obj_t, box_t, priors, strides,
                        num_classes=1, box_weight=2.0):
    """One batch against the FULL param tree: images [B, Hc, Wc, 3] float
    (canvas, RGB, /255); targets from assign_batch. Returns (loss, aux dict
    of components). Differentiable w.r.t. every parameter — the full
    fine-tune path; the head-only path wraps this with the trunk held
    constant."""
    if num_classes != 1:
        # the loss has no per-gt class targets: only class-0 logits are
        # trained toward 1.0 on positives, so a multi-class head would be
        # silently untrained on classes 1..nc-1 — refuse at trace time
        raise ValueError("detector fine-tuning supports num_classes=1 only "
                         "(face detection); got %d" % num_classes)
    maps = Y.YOLOv3(num_classes).apply({"params": params}, images)
    b = maps[0].shape[0]
    flat = jnp.concatenate([m.reshape(b, -1, num_classes + 5) for m in maps],
                           axis=1)                           # [B, D, 5+nc]
    reg, obj_logit = flat[..., :4], flat[..., 4]
    # training-only overflow guard: wh decode is prior * exp(reg[2:4]); an
    # unconstrained trunk can push reg past exp's f32 range, making inf
    # boxes whose GIoU is inf/inf = NaN in the FORWARD pass (the inference
    # decode stays unclamped for parity — trained nets never get there)
    reg = jnp.concatenate([reg[..., :2], jnp.clip(reg[..., 2:4], -10.0, 10.0)],
                          axis=-1)
    pos = obj_t > 0.5
    learn = obj_t > -0.5                                     # not ignored
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)

    obj_loss = jnp.sum(_bce_logits(obj_logit, pos.astype(jnp.float32)) * learn) \
        / jnp.maximum(jnp.sum(learn), 1.0)
    # single face class: the class logit of a positive prior should say "face"
    cls_loss = jnp.sum(_bce_logits(flat[..., 5], 1.0) * pos) / n_pos
    boxes = decode_boxes(reg, priors[None], mode="yolo", strides=strides[None])
    box_loss = jnp.sum((1.0 - giou(boxes, box_t)) * pos) / n_pos

    loss = obj_loss + cls_loss + box_weight * box_loss
    return loss, {"obj": obj_loss, "cls": cls_loss, "box": box_loss}


def detection_loss(head_params, trunk_params, images, obj_t, box_t,
                   priors, strides, num_classes=1, box_weight=2.0):
    """Head-only view of ``detection_loss_full``: the trunk enters as a
    constant, so jax differentiates just the head."""
    params = dict(trunk_params)
    params["head"] = head_params
    return detection_loss_full(params, images, obj_t, box_t, priors, strides,
                               num_classes, box_weight)


def train_step(head_params, opt_state, trunk_params, images, obj_t, box_t,
               priors, strides, tx, num_classes=1, box_weight=2.0):
    (loss, aux), grads = jax.value_and_grad(detection_loss, has_aux=True)(
        head_params, trunk_params, images, obj_t, box_t, priors, strides,
        num_classes, box_weight)
    updates, opt_state = tx.update(grads, opt_state, head_params)
    head_params = optax.apply_updates(head_params, updates)
    return head_params, opt_state, loss, aux


def make_sharded_head_step(mesh, tx, head_params, opt_state, trunk_params,
                           priors, strides, num_classes=1, box_weight=2.0):
    """dp-sharded jitted step: head/opt/trunk replicated, (images, obj_t,
    box_t) batch-sharded. step(head, opt, images, obj_t, box_t)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    head_params = jax.device_put(head_params, repl)
    opt_state = jax.device_put(opt_state, repl)
    trunk_params = jax.device_put(trunk_params, repl)
    pr = jax.device_put(jnp.asarray(priors), repl)
    st = jax.device_put(jnp.asarray(strides), repl)

    def step(head, opt, images, obj_t, box_t):
        return train_step(head, opt, trunk_params, images, obj_t, box_t,
                          pr, st, tx, num_classes, box_weight)

    fn = jax.jit(step, in_shardings=(repl, repl, data, data, data),
                 out_shardings=(repl, repl, repl, repl),
                 donate_argnums=(0, 1))
    return fn, head_params, opt_state


def _is_bn_stat(path):
    """BatchNormInference running statistics are flax PARAMS (so checkpoints
    load them), but they are statistics, not weights: training them lets
    adamw drive var negative and the forward NaNs on sqrt(var + eps)."""
    keys = [getattr(k, "key", None) for k in path]
    return "bn" in keys and keys[-1] in ("mean", "var")


def bn_stats_frozen(base_tx):
    """Wrap an optimizer so bn/mean and bn/var leaves never update (bn
    scale/bias stay trainable)."""

    def labels(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "_bn_stats" if _is_bn_stat(path) else "train", p)

    return optax.multi_transform(
        {"train": base_tx, "_bn_stats": optax.set_to_zero()}, labels)


def layerwise_tx(learning_rate, scales=None, clip_norm=1.0):
    """Discriminative layerwise optimizer for full fine-tuning.

    ``scales`` maps top-level module names ('backbone', 'neck', 'head') to
    learning-rate multipliers, merged over the defaults (0.1/0.3/1.0), so a
    partial override like {'backbone': 0.0} works; pretrained trunks want
    smaller steps than the re-fit head (scale 0.0 freezes a module outright
    via set_to_zero). Built on optax.multi_transform with the top-level key
    as the label (bn running stats frozen — see _is_bn_stat), behind
    global-norm gradient clipping — full fine-tuning is exposed to the
    unclamped exp in the yolo box decode (early garbage boxes produce
    exploding GIoU gradients that NaN the trunk without it).
    """
    scales = {**{"backbone": 0.1, "neck": 0.3, "head": 1.0}, **(scales or {})}
    transforms = {
        k: (optax.set_to_zero() if s == 0.0 else optax.adamw(learning_rate * s))
        for k, s in scales.items()
    }
    transforms["_bn_stats"] = optax.set_to_zero()

    def labels(p):
        def lab(path, _):
            if _is_bn_stat(path):
                return "_bn_stats"
            return getattr(path[0], "key", None)
        return jax.tree_util.tree_map_with_path(lab, p)

    layered = optax.multi_transform(transforms, labels)
    if clip_norm is None:
        return layered
    return optax.chain(optax.clip_by_global_norm(clip_norm), layered)


def train_step_full(params, opt_state, images, obj_t, box_t, priors, strides,
                    tx, num_classes=1, box_weight=2.0):
    (loss, aux), grads = jax.value_and_grad(detection_loss_full, has_aux=True)(
        params, images, obj_t, box_t, priors, strides, num_classes, box_weight)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, aux


def make_sharded_full_step(mesh, tx, params, opt_state, priors, strides,
                           num_classes=1, box_weight=2.0):
    """dp-sharded jitted full-fine-tune step: params/opt replicated, batch
    sharded; XLA inserts the gradient psums over ICI."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    pr = jax.device_put(jnp.asarray(priors), repl)
    st = jax.device_put(jnp.asarray(strides), repl)

    def step(pp, opt, images, obj_t, box_t):
        return train_step_full(pp, opt, images, obj_t, box_t, pr, st, tx,
                               num_classes, box_weight)

    fn = jax.jit(step, in_shardings=(repl, repl, data, data, data),
                 out_shardings=(repl, repl, repl, repl),
                 donate_argnums=(0, 1))
    return fn, params, opt_state


def _prepare_yolo_data(frames_u8, gt_boxes_list, priors,
                       pos_iou, neg_iou, nh, nw, ch, cw):
    """Host prep shared by the fine-tune loops: cv2 keep-ratio resize onto
    the /32 canvas (the inference wrapper's host_resize path) + per-frame
    target assignment."""
    import cv2

    n, h, w = frames_u8.shape[:3]
    sx, sy = nw / w, nh / h
    canvas = np.zeros((n, ch, cw, 3), np.float32)
    obj_ts, box_ts = [], []
    for i in range(n):
        r = cv2.resize(frames_u8[i], (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas[i, :nh, :nw] = r[..., ::-1].astype(np.float32) / 255.0
        g = np.asarray(gt_boxes_list[i], np.float32).reshape(-1, 4) \
            * np.asarray([sx, sy, sx, sy], np.float32)
        o, bt = assign_targets(g, priors, pos_iou, neg_iou)
        obj_ts.append(o)
        box_ts.append(bt)
    return canvas, np.stack(obj_ts), np.stack(box_ts)


def finetune_yolo_head(frames_u8, gt_boxes_list, epochs=5, batch_size=8,
                       learning_rate=1e-4, max_side=608, num_classes=1,
                       mesh=None, seed=0, params=None, pos_iou=0.5,
                       neg_iou=0.4, box_weight=2.0):
    """Convenience loop: uint8 BGR frames [N, H, W, 3] + per-frame gt corner
    boxes (original pixel coords) -> fine-tuned full params (trunk untouched,
    head re-fit). Preprocessing mirrors the inference wrapper's host_resize
    path (cv2 INTER_LINEAR to the keep-ratio size, /255, RGB, zero-pad to the
    /32 canvas), so the tuned head drops straight into YoloDetector(params=).

    Returns (params, history of per-epoch mean loss).
    """
    frames_u8 = np.asarray(frames_u8)
    n, h, w = frames_u8.shape[:3]
    nh, nw = Y.resized_shape(h, w, max_side)
    ch, cw = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides((ch, cw))

    if params is None:
        from ..models.wrappers import _resolve_params

        params = _resolve_params(Y.YOLOv3(num_classes),
                                 jnp.zeros((1, 64, 64, 3)), "yolov3_wider")
    trunk = {k: v for k, v in params.items() if k != "head"}
    head = params["head"]
    # head bridges are ConvUnits with bn running stats — freeze them here
    # too (same NaN hazard layerwise_tx documents for the full path)
    tx = bn_stats_frozen(optax.adamw(learning_rate))
    opt_state = tx.init(head)

    canvas, obj_ts, box_ts = _prepare_yolo_data(
        frames_u8, gt_boxes_list, priors, pos_iou, neg_iou,
        nh, nw, ch, cw)

    if mesh is not None:
        step, head, opt_state = make_sharded_head_step(
            mesh, tx, head, opt_state, trunk, priors, strides, num_classes,
            box_weight)
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
    else:
        pr, st = jnp.asarray(priors), jnp.asarray(strides)
        jitted = jax.jit(partial(train_step, tx=tx, num_classes=num_classes,
                                 box_weight=box_weight))

        def step(hh, oo, x, o_t, b_t):
            return jitted(hh, oo, trunk, x, o_t, b_t, pr, st)

    rng = np.random.default_rng(seed)
    history = []
    for _ in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            head, opt_state, loss, _ = step(head, opt_state,
                                            jnp.asarray(canvas[idx]),
                                            jnp.asarray(obj_ts[idx]),
                                            jnp.asarray(box_ts[idx]))
            losses.append(float(loss))
        history.append(sum(losses) / max(len(losses), 1))
    out = dict(trunk)
    out["head"] = head
    return out, history


def finetune_yolo_full(frames_u8, gt_boxes_list, epochs=5, batch_size=8,
                       learning_rate=1e-4, trunk_scales=None, max_side=608,
                       num_classes=1, mesh=None, seed=0, params=None,
                       pos_iou=0.5, neg_iou=0.4, box_weight=2.0):
    """Full fine-tune: every module trains, with layerwise learning rates
    (``trunk_scales`` -> ``layerwise_tx``; default backbone 0.1x / neck 0.3x /
    head 1.0x — discriminative fine-tuning so the pretrained trunk moves
    gently while the head re-fits). Same data path and return contract as
    ``finetune_yolo_head``.
    """
    frames_u8 = np.asarray(frames_u8)
    n, h, w = frames_u8.shape[:3]
    nh, nw = Y.resized_shape(h, w, max_side)
    ch, cw = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides((ch, cw))

    if params is None:
        from ..models.wrappers import _resolve_params

        params = _resolve_params(Y.YOLOv3(num_classes),
                                 jnp.zeros((1, 64, 64, 3)), "yolov3_wider")
    tx = layerwise_tx(learning_rate, trunk_scales)
    opt_state = tx.init(params)

    canvas, obj_ts, box_ts = _prepare_yolo_data(
        frames_u8, gt_boxes_list, priors, pos_iou, neg_iou,
        nh, nw, ch, cw)

    if mesh is not None:
        step, params, opt_state = make_sharded_full_step(
            mesh, tx, params, opt_state, priors, strides, num_classes,
            box_weight)
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
    else:
        pr, st = jnp.asarray(priors), jnp.asarray(strides)
        jitted = jax.jit(partial(train_step_full, tx=tx,
                                 num_classes=num_classes,
                                 box_weight=box_weight))

        def step(pp, oo, x, o_t, b_t):
            return jitted(pp, oo, x, o_t, b_t, pr, st)

    rng = np.random.default_rng(seed)
    history = []
    for _ in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            params, opt_state, loss, _ = step(params, opt_state,
                                              jnp.asarray(canvas[idx]),
                                              jnp.asarray(obj_ts[idx]),
                                              jnp.asarray(box_ts[idx]))
            losses.append(float(loss))
        history.append(sum(losses) / max(len(losses), 1))
    return jax.device_get(params), history
