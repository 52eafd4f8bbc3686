"""Training support: fine-tune the ViT face encoder as a classifier.

The reference is inference-only; this module adds the natural training
extension (personalized face classes on top of the encoder) and is the
framework's demonstration of multi-chip SPMD training:

- mesh ('data', 'model'): batch sharded over 'data', Megatron-style tensor
  parallelism over 'model' for the transformer blocks (parallel/sharding.py);
- the full step (forward, softmax CE, backward, AdamW update) is one jitted
  graph with explicit in/out shardings — XLA inserts the ICI collectives;
- optional rematerialization of transformer blocks trades FLOPs for HBM.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.vit import ViT
from ..parallel.sharding import vit_param_spec
from .. import config


class ViTClassifier(nn.Module):
    """ViT backbone + linear classification head."""

    num_classes: int
    img_size: int = 128
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        cls = nn.remat(ViT) if self.remat else ViT
        emb = cls(self.img_size, self.patch_size, self.dim, self.depth,
                  name="backbone")(x)
        return nn.Dense(self.num_classes, precision=config.get_precision(),
                        name="head")(emb)


def create_train_state(model, rng, input_shape, learning_rate=1e-4, weight_decay=1e-4):
    # jit the init: un-jitted flax init executes the full forward eagerly
    # op-by-op (wrappers.py does the same for inference params)
    params = jax.jit(model.init)(rng, jnp.zeros(input_shape))["params"]
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)
    return params, opt_state, tx


def loss_fn(params, model, images, labels):
    logits = model.apply({"params": params}, images)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, acc


def train_step(params, opt_state, images, labels, model, tx):
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, model, images, labels)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, acc


def classifier_param_spec(path_parts):
    """Sharding rule for ViTClassifier: ViT rules under 'backbone', head replicated."""
    if path_parts and path_parts[0] == "backbone":
        return vit_param_spec(path_parts[1:])
    return P()


def make_sharded_train_step(mesh, model, tx, params, opt_state):
    """Returns (step_fn, sharded_params, sharded_opt_state). step_fn takes
    (params, opt_state, images [B, H, W, 3], labels [B]) with B divisible by
    the 'data' axis size."""

    def spec_of(tree):
        def f(path, leaf):
            # dict keys give the param path; optimizer-state wrappers (mu/nu
            # attributes, tuple indices) mirror the param tree around them
            parts = [str(p.key) for p in path if isinstance(p, jax.tree_util.DictKey)]
            spec = classifier_param_spec(parts)
            # same fallback as parallel/sharding.param_sharding_tree:
            # replication is always legal, a non-divisible shard raises
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                axes = axis if isinstance(axis, tuple) else (axis,)
                size = 1
                for a in axes:
                    size *= mesh.shape[a]
                if not hasattr(leaf, "ndim") or dim >= leaf.ndim \
                        or leaf.shape[dim] % size != 0:
                    spec = P()
                    break
            return NamedSharding(mesh, spec)

        return jax.tree_util.tree_map_with_path(f, tree)

    p_shard = spec_of(params)
    o_shard = spec_of(opt_state)
    data_shard = NamedSharding(mesh, P("data"))
    scalar = NamedSharding(mesh, P())

    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    step = jax.jit(
        partial(train_step, model=model, tx=tx),
        in_shardings=(p_shard, o_shard, data_shard, data_shard),
        out_shardings=(p_shard, o_shard, scalar, scalar),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state
