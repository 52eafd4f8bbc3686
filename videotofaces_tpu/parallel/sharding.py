"""Parameter sharding rules (tensor parallelism) for the model zoo.

Megatron-style ViT sharding: q/k/v and mlp.fc1 split their OUTPUT features
over 'model' (column parallel), proj and mlp.fc2 split their INPUT features
(row parallel) — one all-reduce per block, inserted automatically by XLA from
these sharding annotations. Everything else (embeddings, norms, heads) is
replicated.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def vit_param_spec(path_parts):
    """PartitionSpec for one ViT param, from its tree path."""
    path = "/".join(path_parts)
    if "/attn/" in path and path.endswith("kernel"):
        return P(None, "model")          # column parallel: [d, d] -> split heads
    if "/attn/" in path and path.endswith("bias"):
        return P("model")
    if "mlp/fc1" in path and path.endswith("kernel"):
        return P(None, "model")
    if "mlp/fc1" in path and path.endswith("bias"):
        return P("model")
    if "mlp/fc2" in path and path.endswith("kernel"):
        return P("model", None)          # row parallel
    if path.endswith("proj/kernel"):
        return P("model", None)
    return P()


def param_sharding_tree(params, mesh, rule=vit_param_spec):
    """Map a param pytree to NamedShardings via a path -> PartitionSpec rule."""

    def f(path, leaf):
        parts = [str(getattr(p, "key", p)) for p in path]
        spec = rule(parts)
        # drop 'model' specs that don't divide the dimension evenly —
        # replication is always legal, a non-divisible shard raises
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            axes = axis if isinstance(axis, tuple) else (axis,)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh, rule=vit_param_spec):
    shardings = param_sharding_tree(params, mesh, rule)
    return jax.tree.map(jax.device_put, params, shardings)
