"""Multi-chip parallelism: device meshes, grid shardings (see mesh.py)."""

from .mesh import (make_mesh, grid_sharding, flat_sharding, replicated,
                   batch_grid_sharding, shard_density, auto_mesh_shape)

__all__ = ["make_mesh", "grid_sharding", "flat_sharding", "replicated",
           "batch_grid_sharding", "shard_density", "auto_mesh_shape"]
