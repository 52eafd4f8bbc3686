"""Torch/numpy oracle for the full MTCNN cascade, used only by tests.

Re-implements the published cascade semantics (image pyramid with factor
0.709, PNet cell decoding at stride 2 / cell 12, per-scale NMS 0.5, cross-
scale NMS 0.7, refine+square, 24/48 adaptive-average crops, RNet/ONet
thresholds 0.7, landmark decode, final IoM chain NMS) so the single-graph
TPU implementation can be verified end-to-end with shared random params.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import oracles
from torch_ref import TConvUnit, load_conv, load_linear, t


class TPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TConvUnit(3, 10, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv2 = TConvUnit(10, 16, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv3 = TConvUnit(16, 32, 3, activ="prelu", bn_eps=None, bias=True)
        self.cls = tnn.Conv2d(32, 2, 1)
        self.reg = tnn.Conv2d(32, 4, 1)

    def load(self, p):
        for nm in ("conv1", "conv2", "conv3"):
            getattr(self, nm).load(p[nm])
        load_conv(self.cls, p["cls"])
        load_conv(self.reg, p["reg"])

    def forward(self, x):
        x = self.conv1(x)
        x = tF.max_pool2d(x, 2, 2, ceil_mode=True)
        x = self.conv2(x)
        x = self.conv3(x)
        prob = tF.softmax(self.cls(x), dim=1)[:, 1]
        return self.reg(x), prob


class TRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TConvUnit(3, 28, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv2 = TConvUnit(28, 48, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv3 = TConvUnit(48, 64, 2, activ="prelu", bn_eps=None, bias=True)
        self.dense4 = tnn.Linear(576, 128)
        self.prelu4 = tnn.PReLU(128)
        self.cls = tnn.Linear(128, 2)
        self.reg = tnn.Linear(128, 4)

    def load(self, p):
        for nm in ("conv1", "conv2", "conv3"):
            getattr(self, nm).load(p[nm])
        load_linear(self.dense4, p["dense4"])
        self.prelu4.weight.data = t(p["prelu4"]["alpha"])
        load_linear(self.cls, p["cls"])
        load_linear(self.reg, p["reg"])

    def forward(self, x):
        x = self.conv1(x)
        x = tF.max_pool2d(x, 3, 2, ceil_mode=True)
        x = self.conv2(x)
        x = tF.max_pool2d(x, 3, 2, ceil_mode=True)
        x = self.conv3(x)
        x = x.permute(0, 3, 2, 1).contiguous().reshape(x.shape[0], -1)
        x = self.prelu4(self.dense4(x))
        prob = tF.softmax(self.cls(x), dim=1)[:, 1]
        return self.reg(x), prob


class TONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TConvUnit(3, 32, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv2 = TConvUnit(32, 64, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv3 = TConvUnit(64, 64, 3, activ="prelu", bn_eps=None, bias=True)
        self.conv4 = TConvUnit(64, 128, 2, activ="prelu", bn_eps=None, bias=True)
        self.dense5 = tnn.Linear(1152, 256)
        self.prelu5 = tnn.PReLU(256)
        self.cls = tnn.Linear(256, 2)
        self.reg = tnn.Linear(256, 4)
        self.lmk = tnn.Linear(256, 10)

    def load(self, p):
        for nm in ("conv1", "conv2", "conv3", "conv4"):
            getattr(self, nm).load(p[nm])
        load_linear(self.dense5, p["dense5"])
        self.prelu5.weight.data = t(p["prelu5"]["alpha"])
        load_linear(self.cls, p["cls"])
        load_linear(self.reg, p["reg"])
        load_linear(self.lmk, p["lmk"])

    def forward(self, x):
        x = self.conv1(x)
        x = tF.max_pool2d(x, 3, 2, ceil_mode=True)
        x = self.conv2(x)
        x = tF.max_pool2d(x, 3, 2, ceil_mode=True)
        x = self.conv3(x)
        x = tF.max_pool2d(x, 2, 2, ceil_mode=True)
        x = self.conv4(x)
        x = x.permute(0, 3, 2, 1).contiguous().reshape(x.shape[0], -1)
        x = self.prelu5(self.dense5(x))
        prob = tF.softmax(self.cls(x), dim=1)[:, 1]
        return self.reg(x), self.lmk(x), prob


def _refine(boxes, pred, plus_one):
    off = 1.0 if plus_one else 0.0
    w = boxes[:, 2] - boxes[:, 0] + off
    h = boxes[:, 3] - boxes[:, 1] + off
    return boxes + pred * np.stack([w, h, w, h], axis=1)


def _square(boxes):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    x1 = boxes[:, 0] + w * 0.5 - side * 0.5
    y1 = boxes[:, 1] + h * 0.5 - side * 0.5
    return np.stack([x1, y1, x1 + side, y1 + side], axis=1)


def _crops(x, imgidx, boxes, size):
    hh, ww = x.shape[2:4]
    out, kept = [], []
    for k in range(len(boxes)):
        x1, y1, x2, y2 = boxes[k]
        x1, y1 = max(1, int(x1)), max(1, int(y1))
        x2, y2 = min(ww, int(x2)), min(hh, int(y2))
        if y2 > y1 - 1 and x2 > x1 - 1:
            crop = x[int(imgidx[k]), :, y1 - 1: y2, x1 - 1: x2]
            out.append(tF.adaptive_avg_pool2d(crop, size))
            kept.append(k)
    if not out:
        return torch.zeros((0, x.shape[1], size, size)), np.asarray(kept, int)
    return torch.stack(out), np.asarray(kept, int)


def run_cascade(pnet, rnet, onet, frames_bgr_u8, minsize, factor=0.709):
    """Returns per-image (boxes [n,4], scores [n], landmarks [n,5,2])."""
    x = frames_bgr_u8[..., ::-1].astype(np.float32)
    x = (x - 127.5) / 128.0
    x = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    b, _, h, w = x.shape

    scales = []
    s = 12.0 / minsize
    while min(h, w) * s >= 12:
        scales.append(s)
        s *= factor

    boxes, scores, preds, imgidx = [], [], [], []
    with torch.no_grad():
        for sc in scales:
            size = (int(h * sc + 1), int(w * sc + 1))
            xi = tF.adaptive_avg_pool2d(x, size)
            reg, prob = pnet(xi)
            prob = prob.numpy()
            reg = reg.numpy()
            for i in range(b):
                hi, wi = np.nonzero(prob[i] >= 0.6)
                if len(hi) == 0:
                    continue
                bx = np.stack([
                    np.floor((2.0 * wi + 1.0) / sc), np.floor((2.0 * hi + 1.0) / sc),
                    np.floor((2.0 * wi + 12.0) / sc), np.floor((2.0 * hi + 12.0) / sc),
                ], axis=1)
                sc_i = prob[i, hi, wi]
                keep = oracles.np_greedy_nms(bx, sc_i, 0.5)
                boxes.append(bx[keep])
                scores.append(sc_i[keep])
                preds.append(reg[i].transpose(1, 2, 0)[hi, wi][keep])
                imgidx.append(np.full(len(keep), i))
    if not boxes:
        return [(np.zeros((0, 4)), np.zeros(0), np.zeros((0, 5, 2)))] * b
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    preds = np.concatenate(preds)
    imgidx = np.concatenate(imgidx)

    keep = oracles.np_greedy_nms(boxes, scores, 0.7, group_ids=imgidx)
    boxes, scores, preds, imgidx = boxes[keep], scores[keep], preds[keep], imgidx[keep]
    boxes = _square(_refine(boxes, preds, False))

    # stage 2
    crops, kept = _crops(x, imgidx, boxes, 24)
    boxes, imgidx = boxes[kept], imgidx[kept]
    with torch.no_grad():
        reg, prob = rnet(crops)
    prob, reg = prob.numpy(), reg.numpy()
    ipass = prob > 0.7
    boxes, scores, preds, imgidx = boxes[ipass], prob[ipass], reg[ipass], imgidx[ipass]
    keep = oracles.np_greedy_nms(boxes, scores, 0.7, group_ids=imgidx)
    boxes, scores, preds, imgidx = boxes[keep], scores[keep], preds[keep], imgidx[keep]
    boxes = _square(_refine(boxes, preds, True))

    # stage 3
    crops, kept = _crops(x, imgidx, boxes, 48)
    boxes, imgidx = boxes[kept], imgidx[kept]
    with torch.no_grad():
        reg, lmk, prob = onet(crops)
    prob, reg, lmk = prob.numpy(), reg.numpy(), lmk.numpy()
    ipass = prob > 0.7
    boxes, scores, preds, imgidx = boxes[ipass], prob[ipass], reg[ipass], imgidx[ipass]
    lmk = lmk[ipass]

    wi = boxes[:, 2] - boxes[:, 0] + 1
    hi = boxes[:, 3] - boxes[:, 1] + 1
    lm_x = wi[:, None] * lmk[:, :5] + boxes[:, 0:1] - 1
    lm_y = hi[:, None] * lmk[:, 5:] + boxes[:, 1:2] - 1
    landmarks = np.stack([lm_x, lm_y], axis=-1)

    boxes = _refine(boxes, preds, True)
    keep_mask = oracles.np_iom_chain(boxes, scores, 0.7, group_ids=imgidx)

    results = []
    for i in range(b):
        sel = keep_mask & (imgidx == i)
        order = np.argsort(-scores[sel], kind="stable")
        results.append((boxes[sel][order], scores[sel][order], landmarks[sel][order]))
    return results
