"""Smooth-L1 loss with the reference's nonstandard delta = 0.01.

Reference parity: model/loss.py:3-25 (``My_SmoothL1Loss``): quadratic
``0.5 z^2`` for |z| < 0.01, linear ``0.01 (|z| - 0.005)`` otherwise.  The
reference computes it as two masked means over all elements; the sum of
those equals one mean of the piecewise value, which is what we compute
(single fused select on the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DELTA = 0.01


def smooth_l1_loss(x: jax.Array, y: jax.Array,
                   sample_weight: jax.Array | None = None) -> jax.Array:
    """Mean piecewise smooth-L1 over all elements (scalar).

    ``sample_weight`` (B,) masks padded batch rows (mesh-size padding):
    the result equals the plain mean over the weight-1 rows, so padded
    duplicates contribute nothing to loss or gradients.
    """
    assert x.shape == y.shape, (x.shape, y.shape)
    z = (x - y).astype(jnp.float32)
    az = jnp.abs(z)
    val = jnp.where(az < DELTA, 0.5 * z * z, DELTA * (az - 0.5 * DELTA))
    if sample_weight is None:
        return jnp.mean(val)
    w = sample_weight.astype(jnp.float32)
    w_full = w.reshape((-1,) + (1,) * (val.ndim - 1))
    per_sample_elems = val[0].size
    # max(sum, 1): an ALL-padding (micro)batch (possible when the final
    # partial batch pads to a multiple of grad_accum*mesh) must yield
    # loss 0 with zero gradients, not 0/0 = NaN poisoning the step
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(val * w_full) / (denom * per_sample_elems)
