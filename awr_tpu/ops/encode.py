"""Encode dispatch: fused Pallas kernel on TPU, jnp elsewhere.

The encode runs on ground-truth joints inside the train step, so no
gradient path is required (grads are taken w.r.t. params only); the
output is wrapped in stop_gradient for safety.
"""

from __future__ import annotations

import jax

from awr_tpu.ops.functional import joint2offset, on_tpu


def encode_offsets(jt_uvd, img, kernel_size, feature_size,
                   use_pallas: bool = True):
    """(B, J, 3) joints + (B, H, W) depth -> (B, F, F, 4J) GT field."""
    if use_pallas and on_tpu():
        from awr_tpu.ops.pallas_encode import encode_pallas

        out = encode_pallas(jt_uvd, img, kernel_size, feature_size)
    else:
        out = joint2offset(jt_uvd, img, kernel_size, feature_size)
    return jax.lax.stop_gradient(out)
