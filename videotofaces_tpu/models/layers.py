"""Shared flax.linen building blocks (NHWC, float32 params).

``ConvUnit`` matches the numeric semantics of the reference's conv+BN+activation
block (backbones/basic.py:5-45): conv -> batchnorm(inference) -> optional
residual add -> activation. BatchNorm here is a pure affine op on running
stats — this framework is inference-first, and XLA fuses the affine into the
convolution epilogue.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import config


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class PReLU(nn.Module):
    """Channelwise PReLU: max(0, x) + a * min(0, x)."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def apply_activation(x, activ: Optional[str], prelu_module=None):
    if activ is None:
        return x
    if activ == "relu":
        return jax.nn.relu(x)
    if activ == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if activ == "hardswish":
        return jax.nn.hard_swish(x)
    if activ.startswith("lrelu"):
        leak = float(activ.split("_")[1])
        return jnp.where(x >= 0, x, leak * x)
    if activ == "prelu":
        return prelu_module(x)
    raise ValueError(f"unknown activation {activ!r}")


class BatchNormInference(nn.Module):
    """Affine normalization with running statistics (inference mode).

    y = (x - mean) / sqrt(var + eps) * scale + bias
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


class ConvUnit(nn.Module):
    """Conv2d [+ BatchNorm] [+ residual add] [+ activation], NHWC."""

    cout: int
    k: Any
    s: Any = 1
    p: Any = 0
    activ: Optional[str] = None
    bn_eps: Optional[float] = 1e-5
    groups: int = 1
    bias: Optional[bool] = None  # default: bias iff BN is absent

    @nn.compact
    def __call__(self, x, add=None):
        use_bias = self.bias if self.bias is not None else (self.bn_eps is None)
        ph, pw = _pair(self.p)
        x = nn.Conv(
            features=self.cout,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding=((ph, ph), (pw, pw)),
            feature_group_count=self.groups,
            use_bias=use_bias,
            precision=config.get_precision(),
            name="conv",
        )(x)
        if self.bn_eps is not None:
            x = BatchNormInference(self.cout, self.bn_eps, name="bn")(x)
        if add is not None:
            x = x + add
        prelu = PReLU(self.cout, name="prelu") if self.activ == "prelu" else None
        return apply_activation(x, self.activ, prelu)


def max_pool2d(x, k, s, padding=0, ceil_mode=False):
    """torch-compatible max pooling over NHWC (-inf padding, optional ceil mode).

    With ceil_mode, windows may run off the right/bottom edge (clipped), as in
    torch ``MaxPool2d(..., ceil_mode=True)`` used by MTCNN (mtcnn.py:18,47,88).
    """
    kh, kw = _pair(k)
    sh, sw = _pair(s)
    ph, pw = _pair(padding)
    h, w = x.shape[-3], x.shape[-2]

    def out_size(size, kk, ss, pp):
        num = size + 2 * pp - kk
        o = -((-num) // ss) + 1 if ceil_mode else num // ss + 1
        if ceil_mode and (o - 1) * ss >= size + pp:
            o -= 1  # last window must start inside input-or-left-padding
        return o

    oh = out_size(h, kh, sh, ph)
    ow = out_size(w, kw, sw, pw)
    pad_b = max(0, (oh - 1) * sh + kh - h - ph)
    pad_r = max(0, (ow - 1) * sw + kw - w - pw)
    pads = [(0, 0)] * (x.ndim - 3) + [(ph, pad_b), (pw, pad_r), (0, 0)]
    # -inf (not finfo.min) for floats: jax only attaches the reverse-mode
    # rule to reduce_window(max) when the init value is -inf, and training
    # (train/triplet.py) differentiates through these pools
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    xp = jnp.pad(x, pads, constant_values=neg)
    window = (1,) * (x.ndim - 3) + (kh, kw, 1)
    strides = (1,) * (x.ndim - 3) + (sh, sw, 1)
    return jax.lax.reduce_window(xp, neg, jax.lax.max, window, strides, "VALID")


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
