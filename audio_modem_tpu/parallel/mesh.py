"""Device mesh helpers for stream-batch sharding."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "streams"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over available devices; the stream/frame batch shards across
    it (ICI does the minimal cross-chip traffic this domain needs)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (STREAM_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (stream-batch) sharding."""
    return NamedSharding(mesh, P(STREAM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over its leading axis."""
    return jax.device_put(x, batch_sharding(mesh))
