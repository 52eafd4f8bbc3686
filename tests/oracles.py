"""Independent numpy reference implementations ("oracles") used only by tests.

These re-derive the expected semantics from first principles (greedy NMS,
R-CNN box decoding, adaptive average pooling, ...) so the device ops in
videotofaces_tpu can be verified hermetically, without torchvision or network
weights.
"""

import math

import numpy as np


def np_decode_rcnn(pred, priors, mults=(1.0, 1.0), clamp=False):
    mxy, mwh = mults
    xys = priors[..., 2:] * mxy * pred[..., :2] + priors[..., :2]
    t = mwh * pred[..., 2:]
    if clamp:
        t = np.minimum(t, math.log(1000.0 / 16))
    whs = priors[..., 2:] * np.exp(t)
    return np.concatenate([xys - whs / 2, xys + whs / 2], axis=-1)


def np_decode_yolo(pred, priors, strides):
    sig = 1.0 / (1.0 + np.exp(-pred[..., :2]))
    xys = strides * (sig - 0.5) + priors[..., :2]
    whs = priors[..., 2:] * np.exp(pred[..., 2:])
    return np.concatenate([xys - whs / 2, xys + whs / 2], axis=-1)


def np_iou(a, b, plus_one=False, mode="iou"):
    off = 1.0 if plus_one else 0.0
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1 + off, 0, None) * np.clip(iy2 - iy1 + off, 0, None)
    area_a = (a[:, 2] - a[:, 0] + off) * (a[:, 3] - a[:, 1] + off)
    area_b = (b[:, 2] - b[:, 0] + off) * (b[:, 3] - b[:, 1] + off)
    if mode == "iom":
        denom = np.minimum(area_a[:, None], area_b[None, :])
    else:
        denom = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(denom, 1e-12)


def np_greedy_nms(boxes, scores, iou_thr, group_ids=None):
    """Sequential greedy NMS; returns kept indices in descending score order
    (torchvision.ops.nms / batched_nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        over = iou[i] > iou_thr
        if group_ids is not None:
            over &= group_ids == group_ids[i]
        later = np.zeros(len(boxes), dtype=bool)
        later[order] = np.arange(len(boxes)) > np.where(order == i)[0][0]
        suppressed |= over & later
    return np.asarray(keep, dtype=np.int64)


def np_iom_chain(boxes, scores, iom_thr, group_ids=None, plus_one=True):
    """MTCNN 'Min' chain suppression: drop i if ANY earlier-by-score j in the
    same group has IoM > thr. Returns keep mask in input order."""
    n = len(boxes)
    order = np.argsort(-scores, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    iom = np_iou(boxes, boxes, plus_one=plus_one, mode="iom")
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if rank[j] < rank[i] and iom[j, i] > iom_thr:
                if group_ids is None or group_ids[j] == group_ids[i]:
                    keep[i] = False
    return keep


def np_adaptive_avg_pool(x, out_hw):
    """x: [H, W, C] -> [oh, ow, C], exact adaptive average pooling."""
    h, w = x.shape[:2]
    oh, ow = out_hw
    out = np.zeros((oh, ow, x.shape[2]), dtype=np.float64)
    for i in range(oh):
        ys, ye = (i * h) // oh, -((-(i + 1) * h) // oh)
        for j in range(ow):
            xs, xe = (j * w) // ow, -((-(j + 1) * w) // ow)
            out[i, j] = x[ys:ye, xs:xe].astype(np.float64).mean(axis=(0, 1))
    return out


def np_bilinear_resize(x, out_hw):
    """Half-pixel bilinear resize, [H, W, C] float -> [oh, ow, C]."""
    h, w = x.shape[:2]
    oh, ow = out_hw
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - np.floor(ys), 0, 1)
    wy = np.where(ys < 0, 0.0, np.where(ys > h - 1, 1.0, ys - y0))
    wx = np.where(xs < 0, 0.0, np.where(xs > w - 1, 1.0, xs - x0))
    x = x.astype(np.float64)
    a = x[y0][:, x0]
    b = x[y0][:, x1]
    c = x[y1][:, x0]
    d = x[y1][:, x1]
    top = a * (1 - wx)[None, :, None] + b * wx[None, :, None]
    bot = c * (1 - wx)[None, :, None] + d * wx[None, :, None]
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def np_adjust_box_single(box, img_size, scale, square):
    """Scalar oracle for the scale+square box adjustment semantics
    (reference detection.py:226-260), written independently per the contract."""
    import math

    h_img, w_img = img_size
    sx1, sx2, sy1, sy2 = scale
    x1, y1, x2, y2 = box
    w, hh = x2 - x1, y2 - y1
    xc, yc = x1 + w / 2, y1 + hh / 2
    x1 = int(math.floor(max(0, xc - sx1 * w / 2)))
    x2 = int(math.ceil(min(w_img, xc + sx2 * w / 2)))
    y1 = int(math.floor(max(0, yc - sy1 * hh / 2)))
    y2 = int(math.ceil(min(h_img, yc + sy2 * hh / 2)))
    if not square:
        return (x1, y1, x2, y2)
    w, hh = x2 - x1, y2 - y1
    if hh > w:
        d = hh - w
        x1 -= d // 2
        x2 += d - d // 2
        if x1 < 0:
            x2 += -x1
            x1 = 0
            x2 = min(w_img, x2)
        if x2 > w_img:
            x1 -= x2 - w_img
            x2 = w_img
            x1 = max(0, x1)
    elif w > hh:
        d = w - hh
        y1 -= d // 2
        y2 += d - d // 2
        if y1 < 0:
            y2 += -y1
            y1 = 0
            y2 = min(h_img, y2)
        if y2 > h_img:
            y1 -= y2 - h_img
            y2 = h_img
            y1 = max(0, y1)
    w, hh = x2 - x1, y2 - y1
    if w > h_img:
        d = w - h_img
        x1 += d // 2
        x2 -= d - d // 2
    elif hh > w_img:
        d = hh - w_img
        y1 += d // 2
        y2 -= d - d // 2
    return (x1, y1, x2, y2)
