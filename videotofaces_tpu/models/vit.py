"""ViT encoder for anime face embeddings (B16 dim 768 depth 12 / L16 dim 1024
depth 24, 128px inputs -> 65 tokens).

Architecture parity target: encoders/vit.py:9-102 in the reference — conv
patch embedding, class token, learned positional embeddings, pre-LN blocks
with separate q/k/v projections and per-head attention scaling, exact GELU,
final LayerNorm applied to the class token only (no projection head).

TPU notes: 65-token attention is tiny; the whole model is MXU-bound dense
matmuls, so the only things that matter are batch size and precision policy.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import config
from .layers import LayerNorm


class SelfAttention(nn.Module):
    dim: int
    heads: int
    per_head_scale: bool = True

    @nn.compact
    def __call__(self, x):
        prec = config.get_precision()
        d = self.dim
        q = nn.Dense(d, name="q", precision=prec)(x)
        k = nn.Dense(d, name="k", precision=prec)(x)
        v = nn.Dense(d, name="v", precision=prec)(x)
        hd = d // self.heads

        def split(t):  # [B, N, D] -> [B, H, N, hd]
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = (hd if self.per_head_scale else d) ** -0.5
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=prec) * scale
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v, precision=prec)
        return out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], d)


class Mlp(nn.Module):
    dim: int
    hidden: int
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x):
        prec = config.get_precision()
        x = nn.Dense(self.hidden, name="fc1", precision=prec)(x)
        if self.gelu == "exact":
            x = jax.nn.gelu(x, approximate=False)
        else:  # 'quick' gelu: x * sigmoid(1.702 x)
            x = x * jax.nn.sigmoid(1.702 * x)
        return nn.Dense(self.dim, name="fc2", precision=prec)(x)


class Block(nn.Module):
    dim: int
    heads: int
    eps: float = 1e-12
    per_head_scale: bool = True
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x):
        prec = config.get_precision()
        h = SelfAttention(self.dim, self.heads, self.per_head_scale, name="attn")(
            LayerNorm(self.dim, self.eps, name="norm1")(x))
        h = nn.Dense(self.dim, name="proj", precision=prec)(h)
        x = x + h
        h = Mlp(self.dim, self.dim * 4, self.gelu, name="mlp")(
            LayerNorm(self.dim, self.eps, name="norm2")(x))
        return x + h


class ViT(nn.Module):
    """Returns the LayerNorm'd class-token embedding: [B, dim]."""

    img_size: int = 128
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    eps: float = 1e-12
    per_head_scale: bool = True
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] float32, already normalized RGB
        prec = config.get_precision()
        p = self.patch_size
        n = self.img_size // p
        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.zeros, (1, n * n + 1, self.dim))
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embedding", precision=prec)(x)      # [B, n, n, dim]
        x = x.reshape(x.shape[0], n * n, self.dim)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, self.dim)), x], axis=1)
        x = x + pos
        for i in range(self.depth):
            x = Block(self.dim, self.dim // 64, self.eps, self.per_head_scale,
                      self.gelu, name=f"block{i}")(x)
        return LayerNorm(self.dim, self.eps, name="norm")(x[:, 0])


def vit_b16():
    return ViT(img_size=128, patch_size=16, dim=768, depth=12)


def vit_l16():
    return ViT(img_size=128, patch_size=16, dim=1024, depth=24)


def preprocess_uint8(images_u8_rgb):
    """(x - 127.5) / 127.5 on device — the cv2.blobFromImages(1/127.5, 127.5)
    affine (encoders/vit.py:141). Resizing to 128x128 happens before this."""
    return (images_u8_rgb.astype(jnp.float32) - 127.5) / 127.5


def torch_spec(depth=12):
    """Ordered checkpoint spec matching the reference ViT registration order
    (encoders/vit.py:80-94 after the AnimeVIT.wconv reordering): class token,
    positional embedding, patch conv, then per block norm1 / q / k / v / proj /
    norm2 / fc1 / fc2, then the final norm."""
    from ..utils import weights as W

    els = [W.param("class_token"), W.param("pos_embedding"),
           W.conv("patch_embedding", bias=True)]
    for i in range(depth):
        b = f"block{i}"
        els.append(W.ln(f"{b}/norm1"))
        for nm in ("q", "k", "v"):
            els.append(W.linear(f"{b}/attn/{nm}"))
        els.append(W.linear(f"{b}/proj"))
        els.append(W.ln(f"{b}/norm2"))
        els.append(W.linear(f"{b}/mlp/fc1"))
        els.append(W.linear(f"{b}/mlp/fc2"))
    els.append(W.ln("norm"))
    return els
