"""Fused Pallas TPU kernel for the AWR adaptive weighted decode.

One VMEM pass per batch element over the (F, F, 4J) dense map: foreground
masking, the x30 softmax over all F*F pixels, distance reconstruction and
the weighted integration all happen without materializing any of the
(B, F*F, J, 3) intermediates the jnp spelling produces.

Math (reference util/feature_tool.py:41-65):
  w      = softmax_p(30 * ht_masked)                    (per joint)
  dis    = k - k * ht_masked
  out[j] = sum_p w[p,j] * (vec[p,j,:] * dis[p,j] + coords[p,:])

Mosaic layout strategy: channels on SUBLANES, the pixel axis P = F*F on
LANES ((C, P) tiles) — with channels on lanes every (P, J~14) temporary
pads to 128 lanes and the kernel blows past the 16MB VMEM budget at
production batch sizes.  Per-joint -> interleaved-channel expansions are
MXU matmuls with constant 0/1 scatter matrices (Mosaic cannot shape-cast
(J,3)<->(3J,)), pixel coordinates are rebuilt in-register from iota, and
the output leaves the kernel as (B, 3J, 1) — reshaped by XLA outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awr_tpu.ops.functional import (
    FG_THRESHOLD,
    SOFTMAX_TEMP,
    resize_nearest,
)

_HI = jax.lax.Precision.HIGHEST


def _decode_kernel(off_ref, img_ref, e3_ref, exyd_ref, out_ref, *,
                   J, F, kernel):
    P = F * F
    # NHWC-flat (P, 4J) block -> channels-first in VMEM (saves the
    # 2x full-map HBM round-trip an XLA transpose outside would cost)
    off = off_ref[0].T  # (4J, P)
    img = img_ref[0]  # (1, P)
    mask = (img < FG_THRESHOLD).astype(jnp.float32)  # (1, P)

    vec = off[: 3 * J, :] * mask  # (3J, P)
    ht = off[3 * J :, :] * mask  # (J, P)

    logits = ht * SOFTMAX_TEMP
    m = jnp.max(logits, axis=1, keepdims=True)  # (J, 1)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    w = e / s  # (J, P)

    def expand(mat_ref, x):  # (3J, J) @ (J, P) -> (3J, P)
        return jax.lax.dot_general(
            mat_ref[:], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    # offset-vector walk term: sum_p vec * dis * w  -> (3J, 1)
    dw3 = expand(e3_ref, (kernel - ht * kernel) * w)
    term_a = jnp.sum(vec * dw3, axis=1, keepdims=True)

    # coordinate term sum_p w * (x, y, depth): weighted sums of
    # in-register pixel-center coords, scattered into channel slots.
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xs = 2.0 * ((p_idx % F).astype(jnp.float32) + 0.5) / F - 1.0
    ys = 2.0 * ((p_idx // F).astype(jnp.float32) + 0.5) / F - 1.0
    mx = jnp.sum(w * xs, axis=1, keepdims=True)  # (J, 1)
    my = jnp.sum(w * ys, axis=1, keepdims=True)
    md = jnp.sum(w * img, axis=1, keepdims=True)
    mxyd = jnp.concatenate([mx, my, md], axis=1)  # (J, 3)
    # scatter (J, 3) into interleaved (3J, 1): Exyd @ flattened via matmul
    # Exyd is (3J, 3J_src) where source is column-major (j, a) pairs; we
    # use three (3J, J) scatters instead to stay 2-D:
    term_m = (
        jax.lax.dot_general(exyd_ref[0], mx, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
        + jax.lax.dot_general(exyd_ref[1], my, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_HI)
        + jax.lax.dot_general(exyd_ref[2], md, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_HI)
    )  # (3J, 1)
    del mxyd
    out_ref[0] = term_a + term_m


@functools.partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def decode_pallas(offset: jax.Array, img: jax.Array, kernel_size: float,
                  interpret: bool = False) -> jax.Array:
    """Pallas twin of :func:`awr_tpu.ops.offset2joint_softmax`.

    Args:
      offset: (B, F, F, 4J) float32 dense map (NHWC, as the models emit).
      img: (B, H, W) normalized depth.
    Returns:
      (B, J, 3) joints in normalized uvd.
    """
    B, F, _, C = offset.shape
    J = C // 4
    P = F * F
    img_f = resize_nearest(img, F).astype(jnp.float32).reshape(B, 1, P)
    off = offset.astype(jnp.float32).reshape(B, P, C)

    # E3[3j+a, j] = 1 (channel expansion); Exyd[a][3j+a, j] = 1 (scatter)
    e3 = np.zeros((3 * J, J), np.float32)
    exyd = np.zeros((3, 3 * J, J), np.float32)
    for j in range(J):
        for a in range(3):
            e3[3 * j + a, j] = 1.0
            exyd[a, 3 * j + a, j] = 1.0

    kernel = functools.partial(_decode_kernel, J=J, F=F,
                               kernel=float(kernel_size))
    out_flat = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * J, J), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * J, J), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3 * J, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3 * J, 1), jnp.float32),
        interpret=interpret,
    )(off, img_f, jnp.asarray(e3), jnp.asarray(exyd))
    return out_flat.reshape(B, J, 3)
