"""Device-mesh helpers.

The reference has no distributed backend (SURVEY §5.8): multi-machine
operation was file-sharding above the library.  Here sharding is a
first-class component: a 1-D ``jax.sharding.Mesh`` over which element
stores, graphs and query batches are partitioned with ``shard_map``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis_name: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_rows(mesh: Mesh, axis_name: str = SHARD_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))
