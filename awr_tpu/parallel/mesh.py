"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over local devices (or the given ones)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def spatial_mesh(n_devices: Optional[int] = None,
                 devices=None) -> Mesh:
    """1-D mesh that shards the image HEIGHT axis, for latency serving.

    The data-parallel mesh leaves all but one chip idle on a batch-1
    request.  Sharding the H axis of every activation instead lets
    XLA's GSPMD partitioner split each conv spatially — halo rows move
    between neighbors via collective-permute over ICI — so a single
    frame uses the whole slice.  (No reference counterpart: the
    reference is single-GPU, SURVEY.md "Parallelism-strategy
    inventory: none".)  Throughput-bound batches should keep
    :func:`make_mesh`/DATA_AXIS.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W) depth frames sharded over the H axis."""
    return NamedSharding(mesh, P(None, SPATIAL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict as global arrays sharded on the batch axis.

    Batch sizes must divide the mesh size; callers pad the final partial
    batch (see Trainer._pad_batch).
    """
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )
