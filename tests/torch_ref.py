"""Torch oracle builders + flax->torch param copying, used only by tests.

These construct torch equivalents of our flax modules and load the *same*
parameter values, so forward outputs can be compared numerically. They are
written from the published architecture definitions (InceptionResnetV1, ViT),
not copied from the reference repo.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF


def t(x):
    return torch.from_numpy(np.asarray(x))


def load_conv(conv: tnn.Conv2d, p):
    conv.weight.data = t(p["kernel"]).permute(3, 2, 0, 1).contiguous()
    if conv.bias is not None:
        conv.bias.data = t(p["bias"])


def load_bn(bn, p):
    bn.weight.data = t(p["scale"])
    bn.bias.data = t(p["bias"])
    bn.running_mean.data = t(p["mean"])
    bn.running_var.data = t(p["var"])


def load_linear(lin: tnn.Linear, p):
    lin.weight.data = t(p["kernel"]).T.contiguous()
    if lin.bias is not None:
        lin.bias.data = t(p["bias"])


class TConvUnit(tnn.Module):
    """conv -> bn -> (+add) -> activation, matching models/layers.ConvUnit."""

    def __init__(self, cin, cout, k, s=1, p=0, activ=None, bn_eps=1e-5, groups=1, bias=None):
        super().__init__()
        use_bias = bias if bias is not None else (bn_eps is None)
        self.conv = tnn.Conv2d(cin, cout, k, s, p, groups=groups, bias=use_bias)
        self.bn = tnn.BatchNorm2d(cout, eps=bn_eps) if bn_eps is not None else None
        self.activ = activ
        if activ == "prelu":
            self.prelu = tnn.PReLU(cout)

    def load(self, params):
        load_conv(self.conv, params["conv"])
        if self.bn is not None:
            load_bn(self.bn, params["bn"])
        if self.activ == "prelu":
            self.prelu.weight.data = t(params["prelu"]["alpha"])

    def forward(self, x, add=None):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        if add is not None:
            x = x + add
        if self.activ is None:
            return x
        if self.activ == "relu":
            return tF.relu(x)
        if self.activ == "relu6":
            return tF.relu6(x)
        if self.activ == "hardswish":
            return tF.hardswish(x)
        if self.activ.startswith("lrelu"):
            return tF.leaky_relu(x, float(self.activ.split("_")[1]))
        if self.activ == "prelu":
            return self.prelu(x)
        raise ValueError(self.activ)


def nhwc_to_torch(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def torch_to_nhwc(x):
    return x.detach().permute(0, 2, 3, 1).numpy()


class TViT(tnn.Module):
    """Torch oracle for models/vit.ViT (pre-LN, separate q/k/v, per-head scale)."""

    def __init__(self, img=128, patch=16, dim=768, depth=12, eps=1e-12):
        super().__init__()
        self.patch = patch
        self.dim = dim
        self.heads = dim // 64
        self.cls = tnn.Parameter(torch.zeros(1, 1, dim))
        n = img // patch
        self.pos = tnn.Parameter(torch.zeros(1, n * n + 1, dim))
        self.embed = tnn.Conv2d(3, dim, patch, patch)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.ModuleDict(dict(
                norm1=tnn.LayerNorm(dim, eps=eps),
                q=tnn.Linear(dim, dim), k=tnn.Linear(dim, dim), v=tnn.Linear(dim, dim),
                proj=tnn.Linear(dim, dim),
                norm2=tnn.LayerNorm(dim, eps=eps),
                fc1=tnn.Linear(dim, dim * 4), fc2=tnn.Linear(dim * 4, dim),
            ))
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=eps)

    def load(self, p):
        self.cls.data = t(p["class_token"])
        self.pos.data = t(p["pos_embedding"])
        load_conv(self.embed, p["patch_embedding"])
        for i, blk in enumerate(self.blocks):
            bp = p[f"block{i}"]
            for ln, src in [("norm1", "norm1"), ("norm2", "norm2")]:
                blk[ln].weight.data = t(bp[src]["scale"])
                blk[ln].bias.data = t(bp[src]["bias"])
            for nm in ["q", "k", "v"]:
                load_linear(blk[nm], bp["attn"][nm])
            load_linear(blk["proj"], bp["proj"])
            load_linear(blk["fc1"], bp["mlp"]["fc1"])
            load_linear(blk["fc2"], bp["mlp"]["fc2"])
        self.norm.weight.data = t(p["norm"]["scale"])
        self.norm.bias.data = t(p["norm"]["bias"])

    def forward(self, x):  # x: [B, 3, H, W]
        b = x.shape[0]
        x = self.embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(b, -1, -1), x], dim=1) + self.pos
        hd = self.dim // self.heads
        for blk in self.blocks:
            h = blk["norm1"](x)
            q, k, v = blk["q"](h), blk["k"](h), blk["v"](h)
            q, k, v = [e.view(b, -1, self.heads, hd).transpose(1, 2) for e in (q, k, v)]
            att = (q @ k.transpose(2, 3)) / hd ** 0.5
            att = att.softmax(dim=-1)
            h = (att @ v).transpose(1, 2).reshape(b, -1, self.dim)
            x = x + blk["proj"](h)
            h = blk["norm2"](x)
            h = blk["fc2"](tF.gelu(blk["fc1"](h)))
            x = x + h
        return self.norm(x[:, 0])


def _tcu(cin, cout, k, s=1, p=0):
    return TConvUnit(cin, cout, k, s, p, activ="relu", bn_eps=1e-3, bias=False)


class TFaceNet(tnn.Module):
    """Torch oracle for models/facenet.InceptionResnetV1 (published architecture)."""

    def __init__(self):
        super().__init__()
        self.stem = tnn.ModuleList([
            _tcu(3, 32, 3, 2), _tcu(32, 32, 3), _tcu(32, 64, 3, p=1),
            _tcu(64, 80, 1), _tcu(80, 192, 3), _tcu(192, 256, 3, 2),
        ])
        self.a = tnn.ModuleList()
        for _ in range(5):
            self.a.append(tnn.ModuleDict(dict(
                b0=_tcu(256, 32, 1), b1_0=_tcu(256, 32, 1), b1_1=_tcu(32, 32, 3, p=1),
                b2_0=_tcu(256, 32, 1), b2_1=_tcu(32, 32, 3, p=1), b2_2=_tcu(32, 32, 3, p=1),
                out=tnn.Conv2d(96, 256, 1))))
        self.ra = tnn.ModuleDict(dict(
            b0=_tcu(256, 384, 3, 2), b1_0=_tcu(256, 192, 1),
            b1_1=_tcu(192, 192, 3, p=1), b1_2=_tcu(192, 256, 3, 2)))
        self.b = tnn.ModuleList()
        for _ in range(10):
            self.b.append(tnn.ModuleDict(dict(
                b0=_tcu(896, 128, 1), b1_0=_tcu(896, 128, 1),
                b1_1=_tcu(128, 128, (1, 7), p=(0, 3)), b1_2=_tcu(128, 128, (7, 1), p=(3, 0)),
                out=tnn.Conv2d(256, 896, 1))))
        self.rb = tnn.ModuleDict(dict(
            b0_0=_tcu(896, 256, 1), b0_1=_tcu(256, 384, 3, 2),
            b1_0=_tcu(896, 256, 1), b1_1=_tcu(256, 256, 3, 2),
            b2_0=_tcu(896, 256, 1), b2_1=_tcu(256, 256, 3, p=1), b2_2=_tcu(256, 256, 3, 2)))
        self.c = tnn.ModuleList()
        for _ in range(6):
            self.c.append(tnn.ModuleDict(dict(
                b0=_tcu(1792, 192, 1), b1_0=_tcu(1792, 192, 1),
                b1_1=_tcu(192, 192, (1, 3), p=(0, 1)), b1_2=_tcu(192, 192, (3, 1), p=(1, 0)),
                out=tnn.Conv2d(384, 1792, 1))))
        self.head = tnn.Linear(1792, 512, bias=False)
        self.head_bn = tnn.BatchNorm1d(512, eps=1e-3)

    def load(self, p):
        for i, nm in enumerate(["stem0", "stem1", "stem2", "stem3", "stem4", "stem5"]):
            self.stem[i].load(p[nm])
        for i in range(5):
            for k in ["b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"]:
                self.a[i][k].load(p[f"a{i}"][k])
            load_conv(self.a[i]["out"], p[f"a{i}"]["out"])
        for k in ["b0", "b1_0", "b1_1", "b1_2"]:
            self.ra[k].load(p["red_a"][k])
        for i in range(10):
            for k in ["b0", "b1_0", "b1_1", "b1_2"]:
                self.b[i][k].load(p[f"b{i}"][k])
            load_conv(self.b[i]["out"], p[f"b{i}"]["out"])
        for k in ["b0_0", "b0_1", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"]:
            self.rb[k].load(p["red_b"][k])
        for i in range(6):
            for k in ["b0", "b1_0", "b1_1", "b1_2"]:
                self.c[i][k].load(p[f"c{i}"][k])
            load_conv(self.c[i]["out"], p[f"c{i}"]["out"])
        load_linear(self.head, p["head"])
        load_bn(self.head_bn, p["head_bn"])

    def forward(self, x):
        for i in range(3):
            x = self.stem[i](x)
        x = tF.max_pool2d(x, 3, 2)
        for i in range(3, 6):
            x = self.stem[i](x)
        for i, blk in enumerate(self.a):
            y = torch.cat([blk["b0"](x), blk["b1_1"](blk["b1_0"](x)),
                           blk["b2_2"](blk["b2_1"](blk["b2_0"](x)))], dim=1)
            x = tF.relu(blk["out"](y) * 0.17 + x)
        x = torch.cat([self.ra["b0"](x), self.ra["b1_2"](self.ra["b1_1"](self.ra["b1_0"](x))),
                       tF.max_pool2d(x, 3, 2)], dim=1)
        for blk in self.b:
            y = torch.cat([blk["b0"](x), blk["b1_2"](blk["b1_1"](blk["b1_0"](x)))], dim=1)
            x = tF.relu(blk["out"](y) * 0.1 + x)
        x = torch.cat([self.rb["b0_1"](self.rb["b0_0"](x)),
                       self.rb["b1_1"](self.rb["b1_0"](x)),
                       self.rb["b2_2"](self.rb["b2_1"](self.rb["b2_0"](x))),
                       tF.max_pool2d(x, 3, 2)], dim=1)
        for i, blk in enumerate(self.c):
            y = torch.cat([blk["b0"](x), blk["b1_2"](blk["b1_1"](blk["b1_0"](x)))], dim=1)
            y = blk["out"](y) * (0.2 if i < 5 else 1.0) + x
            x = tF.relu(y) if i < 5 else y
        x = x.mean(dim=(2, 3))
        x = self.head_bn(self.head(x))
        return tF.normalize(x, p=2, dim=1)
