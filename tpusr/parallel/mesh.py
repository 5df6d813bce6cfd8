"""Device-mesh helpers.

The reference is single-process single-GPU (SURVEY.md §2.3); scaling here is
expressed the JAX way: a ``jax.sharding.Mesh`` + NamedSharding annotations,
with XLA inserting the collectives (all-reduce for data-parallel gradients,
ppermute for halo exchange). Collectives ride ICI within a slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (one process per host on a pod slice).

    Thin wrapper over ``jax.distributed.initialize`` — on Cloud TPU the
    arguments are auto-detected from the metadata server, so calling with no
    arguments is the normal path. After this, ``jax.devices()`` spans the
    whole slice and the meshes below lay collectives over ICI within a slice
    and DCN across slices (SURVEY.md §2.3 comm-backend row).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on a single 'data' axis.
    make_mesh({'data': 4, 'spatial': 2}) lays out an 8-device 2-axis mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n != len(devices):
        devices = devices[:n]
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
