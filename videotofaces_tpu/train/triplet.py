"""Triplet-loss fine-tuning for face encoders (FaceNet-style metric learning).

The reference ships inference-only encoders; personalizing them on a user's
own faces is the natural training extension (trainer.py adds the classifier
head; this module adds the metric-learning path, which needs no fixed class
count and directly improves the distance geometry the grouping stage uses).

TPU-first formulation — everything inside ONE jitted step:

- **batch-hard online mining** (hardest positive / hardest negative per
  anchor) as pure masked matrix ops over the in-batch pairwise distance
  matrix: no Python-side triplet sampling, no dynamic shapes;
- under a ``('data',)`` mesh the batch (and the embedding computation) is
  sharded per chip, while the mining Gram matrix is a GLOBAL [B, B] —
  expressed globally, XLA inserts the all-gather over ICI on its own;
- embeddings are L2-normalized inside the loss (FaceNet's contract,
  reference facenet.py:150), so squared-L2 and cosine geometry agree.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .trainer import create_train_state  # noqa: F401 — one definition, shared


def pairwise_sq_dists(emb):
    """[B, D] -> [B, B] squared L2 distances (clamped at 0 for fp safety)."""
    g = emb @ emb.T
    sq = jnp.sum(emb * emb, axis=1)
    return jnp.maximum(sq[:, None] - 2.0 * g + sq[None, :], 0.0)


def batch_hard_mining(emb, labels):
    """Hardest positive and hardest negative distance per anchor.

    Returns (d_ap [B], d_an [B], valid [B]) where valid marks anchors that
    have at least one positive (another sample of the same label) AND one
    negative in the batch. Distances are squared L2.
    """
    d = pairwise_sq_dists(emb)
    b = emb.shape[0]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    d_ap = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)
    d_an = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    valid = pos_mask.any(axis=1) & neg_mask.any(axis=1)
    return jnp.where(valid, d_ap, 0.0), jnp.where(valid, d_an, 0.0), valid


def batch_hard_mining_xbm(emb, labels, bank_emb, bank_labels, bank_valid):
    """Batch-hard mining with a cross-batch memory bank (XBM-style).

    Hardest positive comes from the batch; hardest negative is the minimum
    over the batch AND the bank (stale embeddings from recent steps — the
    bank widens the negative pool far beyond what one batch can hold, the
    standard fix for tiny per-step identity coverage). Bank entries enter
    under stop_gradient; ``bank_valid`` masks unfilled capacity, so shapes
    stay static from the first step.
    """
    b = emb.shape[0]
    d = pairwise_sq_dists(emb)
    same = labels[:, None] == labels[None, :]
    pos_mask = same & ~jnp.eye(b, dtype=bool)
    neg_mask = ~same
    d_ap = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)

    bank_emb = jax.lax.stop_gradient(bank_emb)
    g = emb @ bank_emb.T
    db = jnp.maximum(jnp.sum(emb * emb, axis=1)[:, None] - 2.0 * g
                     + jnp.sum(bank_emb * bank_emb, axis=1)[None, :], 0.0)
    neg_b = (labels[:, None] != bank_labels[None, :]) & bank_valid[None, :]
    d_an = jnp.minimum(jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1),
                       jnp.min(jnp.where(neg_b, db, jnp.inf), axis=1))

    valid = pos_mask.any(axis=1) & (neg_mask.any(axis=1) | neg_b.any(axis=1))
    return (jnp.where(valid, d_ap, 0.0),
            jnp.where(valid, d_an, 0.0),
            valid)


def triplet_loss(params, model, images, labels, margin=0.2):
    """Batch-hard triplet loss over one batch. Returns (loss, aux) where aux
    carries the active-triplet fraction (hinge > 0) — the classic convergence
    signal for metric learning."""
    emb = model.apply({"params": params}, images)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    d_ap, d_an, valid = batch_hard_mining(emb, labels)
    hinge = jnp.maximum(d_ap - d_an + margin, 0.0) * valid
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(hinge) / n
    active = jnp.sum((hinge > 0) & valid) / n
    return loss, active


def train_step(params, opt_state, images, labels, model, tx, margin=0.2):
    (loss, active), grads = jax.value_and_grad(triplet_loss, has_aux=True)(
        params, model, images, labels, margin)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, active


def triplet_loss_xbm(params, model, images, labels, bank_emb, bank_labels,
                     bank_valid, margin=0.2):
    """Batch-hard triplet loss with the memory-bank negative pool. Returns
    (loss, (active fraction, normalized batch embeddings)) — the embeddings
    come back so the caller can push them into the bank without a second
    forward pass."""
    emb = model.apply({"params": params}, images)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    d_ap, d_an, valid = batch_hard_mining_xbm(emb, labels, bank_emb,
                                              bank_labels, bank_valid)
    hinge = jnp.maximum(d_ap - d_an + margin, 0.0) * valid
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(hinge) / n
    active = jnp.sum((hinge > 0) & valid) / n
    return loss, (active, jax.lax.stop_gradient(emb))


def train_step_xbm(params, opt_state, images, labels, bank_emb, bank_labels,
                   bank_valid, model, tx, margin=0.2):
    (loss, (active, emb)), grads = jax.value_and_grad(
        triplet_loss_xbm, has_aux=True)(params, model, images, labels,
                                        bank_emb, bank_labels, bank_valid,
                                        margin)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, active, emb


class MemoryBank:
    """Host-side FIFO ring of recent (embedding, label) pairs.

    Fixed ``capacity`` keeps the device-side shapes static; ``valid`` masks
    the unfilled tail until the ring wraps. Embeddings are stored as pushed
    (already L2-normalized by the loss)."""

    def __init__(self, capacity, dim):
        import numpy as np

        self.emb = np.zeros((capacity, dim), np.float32)
        self.labels = np.full((capacity,), -1, np.int32)
        self.valid = np.zeros((capacity,), bool)
        self._ptr = 0

    def arrays(self):
        return (jnp.asarray(self.emb), jnp.asarray(self.labels),
                jnp.asarray(self.valid))

    def push(self, emb, labels):
        import numpy as np

        emb = np.asarray(emb, np.float32)
        labels = np.asarray(labels, np.int32)
        cap = self.emb.shape[0]
        n = min(len(labels), cap)
        emb, labels = emb[-n:], labels[-n:]
        idx = (self._ptr + np.arange(n)) % cap
        self.emb[idx] = emb
        self.labels[idx] = labels
        self.valid[idx] = True
        self._ptr = int((self._ptr + n) % cap)



def make_sharded_triplet_step(mesh, model, tx, params, opt_state, margin=0.2):
    """One jitted SPMD step over a ('data',)-axis mesh: params/opt replicated,
    images+labels batch-sharded; the global [B, B] mining matrix makes XLA
    all-gather the embeddings over ICI. Returns (step_fn, params, opt_state);
    step_fn(params, opt_state, images [B, H, W, 3] f32, labels [B] i32) with B
    divisible by the 'data' axis size."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    step = jax.jit(
        partial(train_step, model=model, tx=tx, margin=margin),
        in_shardings=(repl, repl, data, data),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state


def make_sharded_xbm_step(mesh, model, tx, params, opt_state, margin=0.2):
    """Sharded variant of ``train_step_xbm``: batch sharded over 'data', the
    memory bank replicated (it is read-only inside the step; the [B, M]
    distance block shards along B with no extra collectives beyond the
    in-batch Gram's all-gather)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    step = jax.jit(
        partial(train_step_xbm, model=model, tx=tx, margin=margin),
        in_shardings=(repl, repl, data, data, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state


def finetune_facenet(images, labels, epochs=5, batch_size=32, margin=0.2,
                     learning_rate=1e-5, casia=False, mesh=None, seed=0,
                     params=None, model=None, bank_size=0):
    """Convenience loop: fine-tune FaceNet (InceptionResnetV1, pretrained
    weights when converted checkpoints exist — models/wrappers._resolve_params)
    on (images [N, 160, 160, 3] uint8 BGR, labels [N] int). Shuffles each
    epoch with a fixed seed, drops the ragged tail batch (static shapes).

    ``bank_size > 0`` turns on cross-batch hard-negative mining: a FIFO
    ``MemoryBank`` of that many recent embeddings feeds the negative pool
    each step (XBM-style; positives stay in-batch, bank entries are stale
    and gradient-stopped).

    Returns (params, history list of per-epoch mean loss)."""
    import numpy as np

    from ..models import facenet as FN

    if model is None:
        model = FN.InceptionResnetV1()
    if params is None:
        from ..models.wrappers import _resolve_params

        params = _resolve_params(model, jnp.zeros((1, 160, 160, 3)),
                                 "facenet_casia" if casia else "facenet_vgg")
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    bank = None
    if bank_size:
        dim = jax.eval_shape(
            lambda p, x: model.apply({"params": p}, x), params,
            jax.ShapeDtypeStruct((1,) + np.asarray(images).shape[1:3] + (3,),
                                 jnp.float32)).shape[-1]
        bank = MemoryBank(bank_size, dim)
    if mesh is not None:
        maker = make_sharded_xbm_step if bank else make_sharded_triplet_step
        step, params, opt_state = maker(mesh, model, tx, params, opt_state,
                                        margin)
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
    elif bank:
        step = jax.jit(partial(train_step_xbm, model=model, tx=tx,
                               margin=margin))
    else:
        step = jax.jit(partial(train_step, model=model, tx=tx, margin=margin))

    images = np.asarray(images)
    labels = np.asarray(labels, np.int32)
    rng = np.random.default_rng(seed)
    history = []
    for _ in range(epochs):
        order = rng.permutation(len(images))
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            x = FN.preprocess_uint8(images[idx][..., ::-1])  # BGR -> RGB, affine
            yl = jnp.asarray(labels[idx])
            if bank is not None:
                be, bl, bv = bank.arrays()
                params, opt_state, loss, _, emb = step(params, opt_state,
                                                       jnp.asarray(x), yl,
                                                       be, bl, bv)
                bank.push(np.asarray(emb), labels[idx])
            else:
                params, opt_state, loss, _ = step(params, opt_state,
                                                  jnp.asarray(x), yl)
            losses.append(float(loss))
        history.append(sum(losses) / max(len(losses), 1))
    return params, history
