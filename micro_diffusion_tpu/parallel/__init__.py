from .mesh import make_mesh, batch_sharding, replicated_sharding
from .sharding import param_shardings, opt_state_shardings, shard_params

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_shardings",
    "opt_state_shardings",
    "shard_params",
]
