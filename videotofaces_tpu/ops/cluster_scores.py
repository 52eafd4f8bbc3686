"""Clustering quality scores as device reductions + rand index on host.

Replaces sklearn.metrics.{silhouette_score, calinski_harabasz_score,
davies_bouldin_score, rand_score} used for K selection and the grouping eval
harness (reference grouping.py:104-108, 151-152). All three geometric scores
reduce to distance matrices / centroid statistics — matmul + reductions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import config


def _pairwise_euclidean(x):
    prec = config.get_precision()
    sq = jnp.sum(jnp.square(x), axis=1)
    d2 = sq[:, None] - 2.0 * jnp.matmul(x, x.T, precision=prec) + sq[None, :]
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _silhouette_sum(xr, labr, w, xf, onehot_f, counts):
    """Weighted silhouette sum over a row shard. xr/labr/w: this shard's rows
    (w=0 marks padding); xf/onehot_f/counts: the full replicated set. The
    [rows, N] distance block is the only O(N^2) object and it shards on rows."""
    prec = config.get_precision()
    sq_r = jnp.sum(jnp.square(xr), axis=1)
    sq_f = jnp.sum(jnp.square(xf), axis=1)
    d = jnp.sqrt(jnp.maximum(
        sq_r[:, None] - 2.0 * jnp.matmul(xr, xf.T, precision=prec) + sq_f[None, :], 0.0))
    sums = jnp.matmul(d, onehot_f, precision=prec)               # [rows, K]
    own_count = counts[labr]
    own_sum = jnp.take_along_axis(sums, labr[:, None], axis=1)[:, 0]
    a = own_sum / jnp.maximum(own_count - 1.0, 1.0)
    k = onehot_f.shape[1]
    mean_other = sums / jnp.maximum(counts, 1.0)[None, :]
    mean_other = jnp.where(jax.nn.one_hot(labr, k, dtype=bool), jnp.inf, mean_other)
    mean_other = jnp.where((counts == 0)[None, :], jnp.inf, mean_other)
    b = jnp.min(mean_other, axis=1)
    sil = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
    sil = jnp.where(own_count == 1, 0.0, sil)
    return jnp.sum(sil * w)


_sil_single = jax.jit(_silhouette_sum)
_sil_cache = {}


def _sil_for(mesh):
    if mesh is None:
        return _sil_single
    key = id(mesh)
    if key not in _sil_cache:
        from ..parallel.mesh import batch_sharding, replicated

        bs, rep = batch_sharding(mesh), replicated(mesh)
        _sil_cache[key] = jax.jit(_silhouette_sum,
                                  in_shardings=(bs, bs, bs, rep, rep, rep),
                                  out_shardings=rep)
    return _sil_cache[key]


def silhouette_score(x, labels, n_clusters=None, mesh=None):
    """Mean silhouette coefficient, euclidean metric. Samples in singleton
    clusters score 0 (sklearn convention). With ``mesh``, the N^2 distance
    reduction shards row-wise over the chips."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    labels = np.asarray(labels)
    k = int(n_clusters if n_clusters is not None else labels.max() + 1)
    n = x.shape[0]

    mult = mesh.devices.size if mesh is not None else 1
    pad = (-n) % mult
    xr = np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)]) if pad else x
    labr = np.concatenate([labels, np.zeros(pad, labels.dtype)]) if pad else labels
    w = (np.arange(n + pad) < n).astype(np.float32)

    onehot_f = jax.nn.one_hot(jnp.asarray(labels), k, dtype=jnp.float32)
    counts = jnp.sum(onehot_f, axis=0)
    total = _sil_for(mesh)(jnp.asarray(xr), jnp.asarray(labr), jnp.asarray(w),
                           jnp.asarray(x), onehot_f, counts)
    return float(total) / n


def calinski_harabasz_score(x, labels, n_clusters=None):
    x = jnp.asarray(x, jnp.float32)
    labels = np.asarray(labels)
    k = int(n_clusters if n_clusters is not None else labels.max() + 1)
    n = x.shape[0]
    onehot = jax.nn.one_hot(jnp.asarray(labels), k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    centers = jnp.matmul(onehot.T, x, precision=config.get_precision()) / jnp.maximum(counts, 1.0)[:, None]
    mean = jnp.mean(x, axis=0)
    between = jnp.sum(counts * jnp.sum(jnp.square(centers - mean), axis=1))
    within = jnp.sum(jnp.square(x - centers[jnp.asarray(labels)]))
    if within == 0:
        return 1.0
    return float(between * (n - k) / (within * (k - 1)))


def davies_bouldin_score(x, labels, n_clusters=None):
    x = jnp.asarray(x, jnp.float32)
    labels = np.asarray(labels)
    k = int(n_clusters if n_clusters is not None else labels.max() + 1)
    onehot = jax.nn.one_hot(jnp.asarray(labels), k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    centers = jnp.matmul(onehot.T, x, precision=config.get_precision()) / jnp.maximum(counts, 1.0)[:, None]
    # mean intra-cluster distance to the centroid
    dist_to_own = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(x - centers[jnp.asarray(labels)]), axis=1), 0.0))
    s = jnp.matmul(dist_to_own[None, :], onehot, precision=config.get_precision())[0]
    s = s / jnp.maximum(counts, 1.0)
    m = _pairwise_euclidean(centers)
    r = (s[:, None] + s[None, :]) / jnp.where(m == 0, jnp.inf, m)
    r = jnp.where(jnp.eye(k, dtype=bool), -jnp.inf, r)
    worst = jnp.max(r, axis=1)
    worst = jnp.where(jnp.isinf(worst), 0.0, worst)
    return float(jnp.mean(worst))


def rand_score(labels_true, labels_pred):
    """Rand index from the contingency table (host; inputs are tiny)."""
    labels_true = np.asarray(labels_true)
    labels_pred = np.asarray(labels_pred)
    n = labels_true.size
    _, ti = np.unique(labels_true, return_inverse=True)
    _, pi = np.unique(labels_pred, return_inverse=True)
    cont = np.zeros((ti.max() + 1, pi.max() + 1), dtype=np.int64)
    np.add.at(cont, (ti, pi), 1)

    def comb2(a):
        return (a.astype(np.float64) * (a - 1) / 2).sum()

    same_both = comb2(cont)
    same_true = comb2(cont.sum(axis=1))
    same_pred = comb2(cont.sum(axis=0))
    total = n * (n - 1) / 2
    agreements = same_both + (total - same_true - same_pred + same_both)
    return float(agreements / total) if total else 1.0
