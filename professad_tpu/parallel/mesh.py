"""Device mesh + sharding layer for multi-chip OFDFT.

The reference has NO distributed code (SURVEY.md §2.7: single-device torch
tensor placement only, reference system.py:95-107).  This module is the
TPU-native scaling design that replaces it:

* ``make_mesh`` builds a 1-D or 2-D ``jax.sharding.Mesh`` over ICI with axes
  ``("batch", "grid")``:
    - **grid** — spatial slab decomposition of the 3-D real-space grid along
      its first axis (the OFDFT analogue of sequence parallelism).  XLA's
      SPMD partitioner handles the sharded 3-D FFTs by inserting all-to-all
      transposes over ICI, and the ubiquitous ``mean(integrand) * vol``
      energy quadratures become ``psum`` reductions.
    - **batch** — data parallelism over independent *systems* (EOS volume
      scans, geometry candidates, training batches for parameterized
      functionals): pure ``vmap`` + batch-axis sharding, zero communication.
* ``grid_sharding`` / ``batch_grid_sharding`` give ``NamedSharding`` specs for
  densities (3-D fields) and flat chi vectors.

No hand-written collectives are needed: we annotate shardings and let GSPMD
insert the all-to-alls/psums (cf. SURVEY.md §5.8).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "grid_sharding", "flat_sharding", "replicated",
           "batch_grid_sharding", "shard_density", "auto_mesh_shape"]


def auto_mesh_shape(n_devices, batch=1):
    """Split ``n_devices`` into (batch, grid) axes; ``batch`` divides n."""
    if n_devices % batch != 0:
        raise ValueError(f"batch axis {batch} must divide n_devices {n_devices}")
    return (batch, n_devices // batch)


def make_mesh(n_devices=None, batch=1, devices=None):
    """Build a ("batch", "grid") device mesh.

    Args:
      n_devices: number of devices (default: all available).
      batch:     size of the data-parallel axis (default 1 = pure spatial).
      devices:   explicit device list (default ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    shape = auto_mesh_shape(n_devices, batch)
    dev = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(dev, ("batch", "grid"))


def grid_sharding(mesh):
    """Sharding for a (n1, n2, n3) field: slab decomposition along axis 0."""
    return NamedSharding(mesh, P("grid", None, None))


def flat_sharding(mesh):
    """Sharding for a flat chi vector (row-major flattening of the grid):
    contiguous 1-D blocks along the same slab axis."""
    return NamedSharding(mesh, P("grid"))


def batch_grid_sharding(mesh):
    """Sharding for a (batch, n1, n2, n3) stack of fields."""
    return NamedSharding(mesh, P("batch", "grid", None, None))


def replicated(mesh):
    """Fully replicated sharding (box vectors, scalars, small tables)."""
    return NamedSharding(mesh, P())


def shard_density(den, mesh):
    """Place a 3-D density on the mesh with slab decomposition.

    The leading grid dimension must be divisible by the ``grid`` axis size.
    """
    return jax.device_put(den, grid_sharding(mesh))
