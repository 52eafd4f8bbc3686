"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY §2c); here multi-chip scaling
is first-class: a 1-2 axis `jax.sharding.Mesh` ('data' for batch-parallel
inference — frames, crops, and all fixed-capacity postprocess buffers shard
on their leading batch axis; 'model' for tensor-parallel training). XLA
inserts the ICI collectives; nothing in the model code changes.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """1-axis ('data',) or 2-axis ('data', 'model') mesh over available chips."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    if n_model == 1:
        return Mesh(devs.reshape(-1), ("data",))
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(n, k):
    return -(-n // k) * k
