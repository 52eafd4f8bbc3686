"""Box math as pure jnp functions on fixed-shape arrays.

Semantics mirror the reference ops (see /root/reference/src/videotofaces/detectors/
operations/bbox.py:6-67) but are redesigned for XLA: instead of boolean-gathering
to dynamic sizes, every function here keeps static shapes and works with
validity masks produced by the callers.
"""

import math

import jax
import jax.numpy as jnp


def decode_boxes(pred, priors, mults=(1.0, 1.0), clamp=False, mode="rcnn", strides=None):
    """Convert regression outputs to (x1, y1, x2, y2) boxes around prior boxes.

    ``pred``/``priors``: [..., 4] where priors are (cx, cy, w, h).
    ``mode='rcnn'``: R-CNN Eq.1-4 decoding with variance multipliers ``mults``.
    ``mode='yolo'``: xy = stride * (sigmoid(txy) - 0.5) + prior_xy; wh = prior_wh * exp(twh).
    ``clamp``: clamp the exp input at log(1000/16) (torchvision convention).

    Reference behavior: operations/bbox.py:6-34.
    """
    assert mode in ("rcnn", "yolo")
    mult_xy, mult_wh = mults
    if mode == "rcnn":
        xys = priors[..., 2:] * mult_xy * pred[..., :2] + priors[..., :2]
    else:
        assert strides is not None
        xys = strides * (jax.nn.sigmoid(pred[..., :2]) - 0.5) + priors[..., :2]
    twh = mult_wh * pred[..., 2:]
    if clamp:
        twh = jnp.minimum(twh, math.log(1000.0 / 16))
    whs = priors[..., 2:] * jnp.exp(twh)
    return jnp.concatenate([xys - whs / 2, xys + whs / 2], axis=-1)



def convert_to_cwh(boxes):
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Reference: operations/bbox.py:37-42."""
    wh = boxes[..., 2:] - boxes[..., :2]
    c = boxes[..., :2] + wh * 0.5
    return jnp.concatenate([c, wh], axis=-1)


def clamp_to_canvas(boxes, sizes_hw):
    """Clamp boxes into per-image canvases.

    ``boxes``: [..., 4]; ``sizes_hw``: [..., 2] (h, w) broadcastable against boxes'
    leading dims. Reference: operations/bbox.py:45-49 (which indexes per-box image
    sizes; here sizes are already aligned with the leading box dims).
    """
    wh = sizes_hw[..., ::-1]  # (w, h)
    mx = jnp.concatenate([wh, wh], axis=-1)
    return jnp.clip(boxes, 0.0, mx)


def small_boxes_mask(boxes, min_size=0.0):
    """True for boxes whose width AND height exceed ``min_size``.

    Mask-returning replacement for the reference's dynamic-size ``remove_small``
    (operations/bbox.py:52-60).
    """
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws > min_size) & (hs > min_size)


def scale_boxes(boxes, target_sizes_hw, current_sizes_hw):
    """Rescale boxes from the resized canvas back to original image coordinates.

    ``boxes``: [..., 4]; sizes: [..., 2] (h, w) aligned with leading dims.
    Reference: operations/bbox.py:63-67.
    """
    scale = target_sizes_hw / current_sizes_hw          # [..., 2] (sy, sx)
    sxy = scale[..., ::-1]                              # (sx, sy)
    return boxes * jnp.concatenate([sxy, sxy], axis=-1)


def box_iou_matrix(boxes_a, boxes_b, plus_one=False, mode="iou"):
    """Pairwise IoU (or intersection-over-minimum) matrix: [..., Na, Nb].

    ``plus_one`` adds 1px to widths/heights (legacy MTCNN convention,
    detectors/mtcnn.py:286-297).
    """
    off = 1.0 if plus_one else 0.0
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.maximum(ix2 - ix1 + off, 0.0)
    ih = jnp.maximum(iy2 - iy1 + off, 0.0)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + off) * (a[..., 3] - a[..., 1] + off)
    area_b = (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)
    if mode == "iom":
        denom = jnp.minimum(area_a, area_b)
    else:
        denom = area_a + area_b - inter
    return inter / jnp.maximum(denom, 1e-12)
