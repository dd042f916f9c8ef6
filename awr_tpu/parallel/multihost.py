"""Multi-host (DCN) scaling scaffolding (SURVEY.md section 5.8).

The reference is single-process/single-GPU; this module supplies the
TPU-pod equivalents: process-group initialization and per-host data
sharding into globally-addressed arrays.  On a single host these are
identity-shaped and unit-testable; on a pod slice the same calls wire up
DCN coordination.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """``jax.distributed.initialize`` wrapper; no-op on a single process.

    On TPU pods the arguments are auto-detected from the environment, so
    callers normally pass nothing.
    """
    if jax.distributed.is_initialized():
        return  # idempotent: a second initialize would raise
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and jax.process_count() <= 1:
        # single-process (already initialized or standalone): nothing to do
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL devices across processes."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_local_batch_to_global(batch, mesh: Mesh,
                               axis_name: str = "data"):
    """Per-process host batch dict -> globally sharded arrays.

    Each process passes its local shard of the global batch; the result
    is a global-view array sharded on the batch axis
    (``jax.make_array_from_process_local_data``).  On one process this
    equals a plain device_put with batch sharding.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def convert(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(convert, batch)
