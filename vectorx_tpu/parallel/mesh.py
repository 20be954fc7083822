"""Device mesh + sharding helpers.

The reference's parallelism is proof-level map-reduce distributed by a closed
platform (SURVEY.md §2 parallelism table); our TPU-native equivalent is an
explicit `jax.sharding.Mesh`: leaf proofs data-parallel over chips ("batch"
axis), polynomial/NTT work sharded within a proof ("poly" axis), collectives
over ICI.  Multi-host runs initialize `jax.distributed` and use the same
meshes spanning all hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, \
            f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(batch: int, poly: int) -> Mesh:
    """2-D mesh: leaf-proof data parallelism × intra-proof poly sharding."""
    devs = jax.devices()
    assert len(devs) >= batch * poly
    arr = np.array(devs[:batch * poly]).reshape(batch, poly)
    return Mesh(arr, ("batch", "poly"))


def shard_batch(mesh: Mesh, axis: str = "batch"):
    """Sharding for arrays whose leading axis is the data-parallel axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
