"""ResNet-50/152 backbone returning C2..C5 feature maps (NHWC).

Architecture parity target: backbones/resnet.py:12-55 (torchvision-style
bottlenecks: 1x1 -> 3x3(stride) -> 1x1 with residual add before the last
ReLU; stride-2 1x1 downsample projections). Freezing is irrelevant here —
the framework is inference-first and params are plain pytrees.
"""

from typing import Sequence

from flax import linen as nn

from .layers import ConvUnit, max_pool2d


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        cout = self.width * 4
        shortcut = x
        if self.stride > 1 or x.shape[-1] != cout:
            shortcut = ConvUnit(cout, 1, self.stride, 0, activ=None,
                                bn_eps=self.bn_eps, name="downsample")(x)
        y = ConvUnit(self.width, 1, 1, 0, "relu", self.bn_eps, name="u1")(x)
        y = ConvUnit(self.width, 3, self.stride, 1, "relu", self.bn_eps, name="u2")(y)
        y = ConvUnit(cout, 1, 1, 0, None, self.bn_eps, name="u3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    block_counts: Sequence[int]
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x = ConvUnit(64, 7, 2, 3, "relu", self.bn_eps, name="stem")(x)
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        widths = [64, 128, 256, 512]
        for li, (n, w) in enumerate(zip(self.block_counts, widths)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                x = Bottleneck(w, stride if bi == 0 else 1, self.bn_eps,
                               name=f"layer{li + 1}_block{bi}")(x)
            outs.append(x)
        return outs  # C2 (1/4) .. C5 (1/32)


def resnet50(bn_eps=1e-5):
    return ResNet(block_counts=(3, 4, 6, 3), bn_eps=bn_eps)


def resnet152(bn_eps=1e-5):
    return ResNet(block_counts=(3, 8, 36, 3), bn_eps=bn_eps)


def torch_spec(block_counts=(3, 4, 6, 3), prefix=""):
    """Checkpoint spec in the reference registration order (stem, then each
    bottleneck's u1/u2/u3 followed by its downsample projection)."""
    from ..utils import weights as W

    els = W.convunit(f"{prefix}stem")
    for li, n in enumerate(block_counts):
        for bi in range(n):
            p = f"{prefix}layer{li + 1}_block{bi}"
            for u in ("u1", "u2", "u3"):
                els += W.convunit(f"{p}/{u}")
            if bi == 0:
                els += W.convunit(f"{p}/downsample")
    return els
