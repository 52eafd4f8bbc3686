from .mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from .sharding import vit_param_spec, shard_params  # noqa: F401
