"""K-means as XLA reductions, with sklearn-parity k-means++ initialization.

Replaces ``sklearn.cluster.KMeans(n_clusters=k, random_state=r, n_init='auto')``
(reference grouping.py:99-101). Design:

- k-means++ seeding runs on HOST in numpy, drawing from ``np.random.RandomState``
  in exactly the published order (first center by weighted choice, then
  2+int(log(k)) local trials per center sampled against the cumulative
  potential) so seeds match sklearn for the same ``random_state``;
- Lloyd iterations run on DEVICE: the assignment step is an [N, K] squared-
  distance matrix (one matmul), the update step is a one-hot [K, N] @ [N, D]
  matmul — both MXU work; empty clusters are re-seeded from the farthest
  points (sklearn's relocation rule);
- convergence mirrors sklearn: strict stop when labels repeat, else stop when
  the summed squared center shift <= tol * mean(var(X, axis=0)).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import config


def _sq_dists(x, centers):
    """[N, K] squared euclidean distances (MXU form: x2 - 2xc + c2, clipped)."""
    prec = config.get_precision()
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    c2 = jnp.sum(jnp.square(centers), axis=1)
    d = x2 - 2.0 * jnp.matmul(x, centers.T, precision=prec) + c2
    return jnp.maximum(d, 0.0)


def kmeans_plusplus(x, n_clusters, random_state, n_local_trials=None):
    """Host k-means++ seeding with sklearn RNG parity. x: [N, D] float array.
    Returns (centers [K, D], indices [K])."""
    rs = np.random.RandomState(random_state) if not isinstance(
        random_state, np.random.RandomState) else random_state
    x = np.asarray(x)
    n = x.shape[0]
    if n_local_trials is None:
        n_local_trials = 2 + int(np.log(n_clusters))
    x_sq = np.einsum("ij,ij->i", x, x)

    def sq_dist_rows(rows):
        return np.maximum(
            x_sq[rows][:, None] - 2 * rows_dot(rows) + x_sq[None, :], 0)

    def rows_dot(rows):
        return x[rows] @ x.T

    indices = np.full(n_clusters, -1, dtype=int)
    first = rs.choice(n, p=np.full(n, 1.0 / n))
    indices[0] = first
    closest = sq_dist_rows(np.asarray([first]))[0]
    current_pot = closest.sum()

    for c in range(1, n_clusters):
        rand_vals = rs.uniform(size=n_local_trials) * current_pot
        candidate_ids = np.searchsorted(np.cumsum(closest), rand_vals)
        np.clip(candidate_ids, None, n - 1, out=candidate_ids)
        dists = sq_dist_rows(candidate_ids)
        np.minimum(closest, dists, out=dists)
        pots = dists.sum(axis=1)
        best = int(np.argmin(pots))
        current_pot = pots[best]
        closest = dists[best]
        indices[c] = candidate_ids[best]

    return x[indices].copy(), indices


def _lloyd_step(x, centers, w):
    """One Lloyd iteration on device: labels, new centers, distances-to-closest.
    ``w`` [N] masks padding rows (0 weight) so the step shards cleanly over a
    device mesh — rows split across chips, the centroid update's one-hot
    matmul reduces with an XLA all-reduce."""
    d = _sq_dists(x, centers)
    labels = jnp.argmin(d, axis=1)
    closest = jnp.where(w > 0, jnp.min(d, axis=1), -jnp.inf)  # pads never "farthest"
    k = centers.shape[0]
    onehot = jax.nn.one_hot(labels, k, dtype=x.dtype) * w[:, None]  # [N, K]
    counts = jnp.sum(onehot, axis=0)                                # [K]
    sums = jnp.matmul(onehot.T, x, precision=config.get_precision())
    new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
    # keep old center where a cluster went empty (relocation handled on host)
    new_centers = jnp.where((counts == 0)[:, None], centers, new_centers)
    return labels, new_centers, counts, closest


_lloyd_step_jit = jax.jit(_lloyd_step)
_lloyd_cache = {}


def _lloyd_for(mesh):
    """The Lloyd step, optionally SPMD: points sharded on rows over 'data',
    centers replicated; XLA inserts the psum for the centroid sums."""
    if mesh is None:
        return _lloyd_step_jit
    key = id(mesh)
    if key not in _lloyd_cache:
        from ..parallel.mesh import batch_sharding, replicated

        bs, rep = batch_sharding(mesh), replicated(mesh)
        _lloyd_cache[key] = jax.jit(_lloyd_step, in_shardings=(bs, rep, bs),
                                    out_shardings=(bs, rep, rep, bs))
    return _lloyd_cache[key]


def _pad_rows(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


def kmeans_fit(x, n_clusters, random_state=0, max_iter=300, tol=1e-4, mesh=None):
    """Full K-means fit. Returns (labels [N], centers [K, D], inertia).
    With ``mesh``, Lloyd iterations run data-parallel over the chips."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.shape[0]
    if n_clusters >= n:
        # degenerate sweep point (fewer samples than clusters): every point
        # its own cluster, higher cluster ids empty. sklearn raises here;
        # returning gracefully keeps a clusters-range sweep alive, but the
        # centers contract ([K, D]) is honored — empty clusters get zeros.
        labels = np.arange(n) % n_clusters
        centers = np.zeros((n_clusters, x.shape[1]), x.dtype)
        centers[:n] = x
        return labels, centers, 0.0
    centers, _ = kmeans_plusplus(x, n_clusters, random_state)
    centers = jnp.asarray(centers)
    step = _lloyd_for(mesh)
    xp, _ = _pad_rows(x, mesh.devices.size if mesh is not None else 1)
    w = jnp.asarray((np.arange(xp.shape[0]) < n).astype(np.float32))
    xd = jnp.asarray(xp)
    tol_abs = tol * float(np.mean(np.var(x, axis=0)))

    labels_prev = None
    strict = False
    labels = None
    for _ in range(max_iter):
        labels_d, new_centers, counts, closest = step(xd, centers, w)
        labels = np.asarray(labels_d)[:n]
        counts = np.asarray(counts)
        if (counts == 0).any():  # sklearn: reseed empties from farthest points
            new_centers = np.array(new_centers)  # writable host copy
            far = np.argsort(-np.asarray(closest))
            for slot, cid in enumerate(np.nonzero(counts == 0)[0]):
                new_centers[cid] = x[far[slot]]
            new_centers = jnp.asarray(new_centers)
        shift = float(jnp.sum(jnp.square(new_centers - centers)))
        centers = new_centers
        if labels_prev is not None and np.array_equal(labels, labels_prev):
            strict = True
            break
        labels_prev = labels
        if shift <= tol_abs:
            break

    if not strict:  # final e-step against the final centers
        d = _sq_dists(xd, centers)
        labels = np.asarray(jnp.argmin(d, axis=1))[:n]
        inertia = float(jnp.sum(jnp.where(w > 0, jnp.min(d, axis=1), 0.0)))
    else:
        closest = _lloyd_for(None)(xd, centers, w)[3]
        inertia = float(jnp.sum(jnp.where(w > 0, closest, 0.0)))
    return labels, np.asarray(centers), inertia
