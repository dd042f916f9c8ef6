"""Fused Pallas TPU kernel for the AWR encode (joint -> dense offset field).

The jnp spelling (awr_tpu.ops.joint2offset) materializes several
(B, F, F, J, 3) intermediates (raw offsets, distances, unit vectors) —
about 5x the output's HBM traffic.  This kernel computes each output
value in-register from the (J, 3) joints held in VMEM: one pass, one
(4J, P) store per batch element.

Math (reference util/feature_tool.py:12-39):
  off   = joint - (x, y, depth)          per pixel, per joint
  dis   = sqrt(|off|^2 + 1e-8)
  ht    = (k - dis) / k
  mask  = (ht >= 0) & (depth < 0.99)
  out   = [unit offsets * mask (3J ch), ht * mask (J ch)]

Layout: joints on sublanes, pixels on lanes ((J, P) tiles); the
(J, P) -> (3J, P) channel interleave is three constant-matrix MXU
scatters (Mosaic cannot shape-cast across the joint/axis split).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awr_tpu.ops.functional import (
    DIS_EPS,
    FG_THRESHOLD,
    resize_nearest,
)

_HI = jax.lax.Precision.HIGHEST


def _encode_kernel(jt_ref, img_ref, ex_ref, ey_ref, ed_ref, out_ref, *,
                   J, F, kernel):
    P = F * F
    jt = jt_ref[0]  # (J, 3)
    img = img_ref[0]  # (1, P)

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xs = 2.0 * ((p_idx % F).astype(jnp.float32) + 0.5) / F - 1.0
    ys = 2.0 * ((p_idx // F).astype(jnp.float32) + 0.5) / F - 1.0

    dx = jt[:, 0:1] - xs  # (J, P)
    dy = jt[:, 1:2] - ys
    dz = jt[:, 2:3] - img
    dis = jnp.sqrt(dx * dx + dy * dy + dz * dz + DIS_EPS)
    ht = (kernel - dis) / kernel
    mask = ((ht >= 0).astype(jnp.float32)
            * (img < FG_THRESHOLD).astype(jnp.float32))  # (J, P)
    inv = mask / dis

    def scatter(mat_ref, x):  # (3J, J) @ (J, P) -> rows at channel slots
        return jax.lax.dot_general(
            mat_ref[:], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    vec = (scatter(ex_ref, dx * inv) + scatter(ey_ref, dy * inv)
           + scatter(ed_ref, dz * inv))  # (3J, P)
    out_ref[0] = jnp.concatenate([vec, ht * mask], axis=0)  # (4J, P)


@functools.partial(jax.jit, static_argnames=("kernel_size",
                                             "feature_size", "interpret"))
def encode_pallas(jt_uvd: jax.Array, img: jax.Array, kernel_size: float,
                  feature_size: int, interpret: bool = False) -> jax.Array:
    """Pallas twin of :func:`awr_tpu.ops.joint2offset`.

    Args:
      jt_uvd: (B, J, 3) normalized joints.
      img: (B, H, W) normalized depth.
    Returns:
      (B, F, F, 4J) dense map (NHWC, matching the jnp spelling).
    """
    B, J, _ = jt_uvd.shape
    F = feature_size
    P = F * F
    img_f = resize_nearest(img, F).astype(jnp.float32).reshape(B, 1, P)

    ex = np.zeros((3 * J, J), np.float32)
    ey = np.zeros((3 * J, J), np.float32)
    ed = np.zeros((3 * J, J), np.float32)
    for j in range(J):
        ex[3 * j, j] = 1.0
        ey[3 * j + 1, j] = 1.0
        ed[3 * j + 2, j] = 1.0

    kernel = functools.partial(_encode_kernel, J=J, F=F,
                               kernel=float(kernel_size))
    const_spec = pl.BlockSpec((3 * J, J), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, J, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec, const_spec, const_spec,
        ],
        out_specs=pl.BlockSpec((1, 4 * J, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4 * J, P), jnp.float32),
        interpret=interpret,
    )(jt_uvd.astype(jnp.float32), img_f, jnp.asarray(ex),
      jnp.asarray(ey), jnp.asarray(ed))
    # (B, 4J, P) -> NHWC (B, F, F, 4J)
    return jnp.transpose(out_t, (0, 2, 1)).reshape(B, F, F, 4 * J)
