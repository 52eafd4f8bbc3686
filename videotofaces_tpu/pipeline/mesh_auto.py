"""Default device-mesh policy for the user-facing pipeline.

The reference picks one global torch device (main.py:38-39). The TPU-native
analogue: when the host sees more than one chip, the model factories shard
inference data-parallel over all of them by default — every wrapper already
accepts ``mesh=`` and partitions its whole uint8-in graph on the leading batch
axis (models/wrappers._jit_fwd), so this is purely a policy module.

Opt out with V2F_SINGLE_DEVICE=1 or by passing ``mesh=None`` to the factories.
"""

import os


def default_mesh():
    """A 1-axis 'data' mesh over all local devices, or None when only one
    device exists (or the user opted out)."""
    if os.environ.get("V2F_SINGLE_DEVICE", "") not in ("", "0"):
        return None
    import jax

    try:
        n = len(jax.devices())
    except Exception:
        return None
    if n < 2:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh()
