"""FaceNet (InceptionResnetV1) encoder for live-action face embeddings.

Architecture parity target: encoders/facenet.py:15-155 — stem of 6 conv units,
5x Block35(0.17) -> Mixed_6a -> 10x Block17(0.1) -> Mixed_7a -> 5x Block8(0.2)
-> Block8(no relu) -> global average pool -> Linear(1792->512, no bias) ->
BatchNorm1d(eps=1e-3) -> L2 normalize. All conv units are conv+BN(1e-3)+ReLU
with no conv bias.

Inputs: [B, 160, 160, 3] float32 RGB normalized by (x - 127.5) / 128
(the cv2.blobFromImages affine at facenet.py:179).
"""

import jax.numpy as jnp
from flax import linen as nn

from .. import config
from .layers import BatchNormInference, ConvUnit, max_pool2d


def cu(cout, k, s=1, p=0, name=None):
    return ConvUnit(cout, k, s, p, activ="relu", bn_eps=1e-3, bias=False, name=name)


class Block35(nn.Module):
    """Inception-A residual block at 256 channels."""

    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = cu(32, 1, name="b0")(x)
        b1 = cu(32, 3, p=1, name="b1_1")(cu(32, 1, name="b1_0")(x))
        b2 = cu(32, 3, p=1, name="b2_2")(cu(32, 3, p=1, name="b2_1")(cu(32, 1, name="b2_0")(x)))
        y = jnp.concatenate([b0, b1, b2], axis=-1)
        y = nn.Conv(256, (1, 1), use_bias=True, precision=config.get_precision(), name="out")(y)
        return nn.relu(y * self.scale + x)


class Block17(nn.Module):
    """Inception-B residual block at 896 channels (1x7 / 7x1 factorized)."""

    scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        b0 = cu(128, 1, name="b0")(x)
        b1 = cu(128, 1, name="b1_0")(x)
        b1 = cu(128, (1, 7), p=(0, 3), name="b1_1")(b1)
        b1 = cu(128, (7, 1), p=(3, 0), name="b1_2")(b1)
        y = jnp.concatenate([b0, b1], axis=-1)
        y = nn.Conv(896, (1, 1), use_bias=True, precision=config.get_precision(), name="out")(y)
        return nn.relu(y * self.scale + x)


class Block8(nn.Module):
    """Inception-C residual block at 1792 channels (1x3 / 3x1 factorized)."""

    scale: float = 0.2
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        b0 = cu(192, 1, name="b0")(x)
        b1 = cu(192, 1, name="b1_0")(x)
        b1 = cu(192, (1, 3), p=(0, 1), name="b1_1")(b1)
        b1 = cu(192, (3, 1), p=(1, 0), name="b1_2")(b1)
        y = jnp.concatenate([b0, b1], axis=-1)
        y = nn.Conv(1792, (1, 1), use_bias=True, precision=config.get_precision(), name="out")(y)
        y = y * self.scale + x
        return nn.relu(y) if self.relu else y


class Mixed6a(nn.Module):
    """Reduction-A: 256 -> 896 channels, spatial /2."""

    @nn.compact
    def __call__(self, x):
        b0 = cu(384, 3, s=2, name="b0")(x)
        b1 = cu(256, 3, s=2, name="b1_2")(cu(192, 3, p=1, name="b1_1")(cu(192, 1, name="b1_0")(x)))
        b2 = max_pool2d(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    """Reduction-B: 896 -> 1792 channels, spatial /2."""

    @nn.compact
    def __call__(self, x):
        b0 = cu(384, 3, s=2, name="b0_1")(cu(256, 1, name="b0_0")(x))
        b1 = cu(256, 3, s=2, name="b1_1")(cu(256, 1, name="b1_0")(x))
        b2 = cu(256, 3, s=2, name="b2_2")(cu(256, 3, p=1, name="b2_1")(cu(256, 1, name="b2_0")(x)))
        b3 = max_pool2d(x, 3, 2)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """Returns L2-normalized [B, 512] embeddings."""

    @nn.compact
    def __call__(self, x):
        x = cu(32, 3, s=2, name="stem0")(x)
        x = cu(32, 3, name="stem1")(x)
        x = cu(64, 3, p=1, name="stem2")(x)
        x = max_pool2d(x, 3, 2)
        x = cu(80, 1, name="stem3")(x)
        x = cu(192, 3, name="stem4")(x)
        x = cu(256, 3, s=2, name="stem5")(x)
        for i in range(5):
            x = Block35(0.17, name=f"a{i}")(x)
        x = Mixed6a(name="red_a")(x)
        for i in range(10):
            x = Block17(0.1, name=f"b{i}")(x)
        x = Mixed7a(name="red_b")(x)
        for i in range(5):
            x = Block8(0.2, name=f"c{i}")(x)
        x = Block8(1.0, relu=False, name="c5")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 1792]
        x = nn.Dense(512, use_bias=False, precision=config.get_precision(), name="head")(x)
        x = BatchNormInference(512, eps=1e-3, name="head_bn")(x)
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
        return x / jnp.maximum(norm, 1e-12)


def preprocess_uint8(images_u8_rgb):
    """(x - 127.5) / 128 on device (facenet.py:179 blobFromImages affine)."""
    return (images_u8_rgb.astype(jnp.float32) - 127.5) / 128.0


def torch_spec():
    """Ordered checkpoint spec matching the reference InceptionResnetV1
    registration order (encoders/facenet.py:126-154, classifier head dropped):
    stem conv units, 5x Block35, Mixed_6a, 10x Block17, Mixed_7a, 6x Block8,
    Linear(1792->512, no bias), BatchNorm1d."""
    from ..utils import weights as W

    els = []
    for i in range(6):
        els += W.convunit(f"stem{i}")
    for i in range(5):  # Block35: branch0, branch1 (2 units), branch2 (3), out conv
        p = f"a{i}"
        for unit in ("b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"):
            els += W.convunit(f"{p}/{unit}")
        els.append(W.conv(f"{p}/out", bias=True))
    for unit in ("b0", "b1_0", "b1_1", "b1_2"):  # Mixed_6a
        els += W.convunit(f"red_a/{unit}")
    for i in range(10):  # Block17
        p = f"b{i}"
        for unit in ("b0", "b1_0", "b1_1", "b1_2"):
            els += W.convunit(f"{p}/{unit}")
        els.append(W.conv(f"{p}/out", bias=True))
    for unit in ("b0_0", "b0_1", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"):  # Mixed_7a
        els += W.convunit(f"red_b/{unit}")
    for i in range(6):  # 5x Block8(relu) + final Block8(no relu)
        p = f"c{i}"
        for unit in ("b0", "b1_0", "b1_1", "b1_2"):
            els += W.convunit(f"{p}/{unit}")
        els.append(W.conv(f"{p}/out", bias=True))
    els.append(W.linear("head", bias=False))
    els.append(W.bn("head_bn"))
    return els
