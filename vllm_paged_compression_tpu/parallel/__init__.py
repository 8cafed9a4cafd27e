from .mesh import (build_mesh, kv_cache_sharding, param_shardings,
                   shard_caches, shard_params)

__all__ = ["build_mesh", "kv_cache_sharding", "param_shardings",
           "shard_caches", "shard_params"]
