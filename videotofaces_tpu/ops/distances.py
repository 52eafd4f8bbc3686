"""Pairwise-distance Gram matrices on device (MXU matmuls).

Replaces sklearn.metrics.pairwise_distances / cosine_distances used by the
dedup and classification stages (dupes.py:56-60, grouping.py:51). Hamming
distance over {0,1} hash vectors and cosine distance both reduce to matmuls.
"""

import jax
import jax.numpy as jnp

from .. import config


def hamming_gram(x, y=None):
    """Pairwise Hamming distances between {0,1} int vectors: [N, M] int32.

    d(a, b) = a @ (1-b) + (1-a) @ b — exact in float32 for <= 2^24 bits.
    """
    xf = x.astype(jnp.float32)
    yf = xf if y is None else y.astype(jnp.float32)
    prec = config.get_precision()
    d = (jnp.matmul(xf, (1.0 - yf).T, precision=prec)
         + jnp.matmul(1.0 - xf, yf.T, precision=prec))
    return jnp.round(d).astype(jnp.int32)


def cosine_gram(x, y=None):
    """Pairwise cosine distances (1 - cos similarity), sklearn-compatible:
    rows are L2-normalized with zero-norm rows left as zeros."""

    def normalize(a):
        n = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
        return a / jnp.where(n == 0, 1.0, n)

    xn = normalize(x.astype(jnp.float32))
    yn = xn if y is None else normalize(y.astype(jnp.float32))
    sim = jnp.matmul(xn, yn.T, precision=config.get_precision())
    return 1.0 - sim


def nearest_earlier(dist, big=10000.0):
    """For each row i: (min, argmin) of dist[i, :i] — i.e. distance to the
    nearest EARLIER element, with rows 0 getting >= ``big``.

    Mirrors the lower-triangle masking trick of dupes.py:62-64.
    """
    n = dist.shape[0]
    later = jnp.arange(n)[None, :] >= jnp.arange(n)[:, None]
    masked = dist + later.astype(dist.dtype) * big
    return jnp.min(masked, axis=1), jnp.argmin(masked, axis=1)


@jax.jit
def dedup_hash(hashes_u8):
    """All-pairs hash dedup reductions: hashes [N, 64] {0,1} ->
    (mins [N] int32, argmins [N] int32)."""
    d = hamming_gram(hashes_u8)
    mins, inds = nearest_earlier(d.astype(jnp.float32))
    return mins.astype(jnp.int32), inds.astype(jnp.int32)


@jax.jit
def _dedup_cosine_single(feats):
    d = cosine_gram(feats)
    return nearest_earlier(d)


def _dedup_rows(feats_rows, row_idx, feats_full, big=10000.0):
    """Row shard of the all-pairs dedup: [rows, N] distance block, masked to
    earlier columns by the GLOBAL row index (works under row sharding)."""
    d = cosine_gram(feats_rows, feats_full)
    later = jnp.arange(d.shape[1])[None, :] >= row_idx[:, None]
    masked = d + later.astype(d.dtype) * big
    return jnp.min(masked, axis=1), jnp.argmin(masked, axis=1)


_dedup_cache = {}


def dedup_cosine(feats, mesh=None):
    """All-pairs embedding dedup reductions: feats [N, D] -> (mins, argmins).
    With ``mesh``, the N^2 Gram matrix shards row-wise over the chips."""
    if mesh is None:
        return _dedup_cosine_single(feats)
    import numpy as np

    key = id(mesh)
    if key not in _dedup_cache:
        from ..parallel.mesh import batch_sharding, replicated

        bs, rep = batch_sharding(mesh), replicated(mesh)
        _dedup_cache[key] = jax.jit(_dedup_rows, in_shardings=(bs, bs, rep),
                                    out_shardings=(bs, bs))
    x = np.ascontiguousarray(feats, dtype=np.float32)
    n = x.shape[0]
    pad = (-n) % mesh.devices.size
    xr = np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)]) if pad else x
    row_idx = jnp.arange(n + pad, dtype=jnp.int32)
    mins, inds = _dedup_cache[key](jnp.asarray(xr), row_idx, jnp.asarray(x))
    return mins[:n], inds[:n]
