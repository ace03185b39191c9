"""Parallelism: device meshes and sharding layouts (TP/DP over ICI)."""
from .distributed import init_distributed  # noqa: F401
from .mesh import DP_AXIS, TP_AXIS, make_mesh, named, replicated  # noqa: F401
from .sharding import (  # noqa: F401
    kv_cache_sharding,
    llama_param_shardings,
    token_sharding,
    validate_tp,
)
