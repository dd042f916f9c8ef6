"""Device-mesh parallelism (TPU-native addition; SURVEY.md section 5.8).

The reference is strictly single-GPU (train.py:29,58,109); this package
supplies the first-class data-parallel layer: a 1-D ``jax.sharding.Mesh``
over all chips, batch-axis ``NamedSharding``, and jit-with-shardings
train/eval steps.  Because pjit programs are written against the global
logical batch, BatchNorm statistics and gradients are automatically
*global* (XLA inserts the ICI all-reduces), so per-step math for a given
global batch is identical to the single-device reference.
"""

from awr_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_mesh,
    spatial_sharding,
)
