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


def smooth_l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean piecewise smooth-L1 over all elements (scalar)."""
    assert x.shape == y.shape, (x.shape, y.shape)
    z = (x - y).astype(jnp.float32)
    az = jnp.abs(z)
    val = jnp.where(az < DELTA, 0.5 * z * z, DELTA * (az - 0.5 * DELTA))
    return jnp.mean(val)
