"""The AWR dense-representation core: joint->offset-field encode and the
adaptive softmax-weighted decode.

Reference parity: util/feature_tool.py:12-39 (joint2offset) and :41-65
(offset2joint_softmax), including the 1e-8 distance epsilon, the 0.99
foreground threshold, and the x30 softmax temperature.

TPU-first design notes:
- Channel-last (NHWC) layout: dense maps are (B, F, F, 4J) with channel
  order [j0x, j0y, j0d, j1x, ... , ht_j0 ... ht_jJ-1] matching the
  reference's NCHW channel order after transpose, so torch-trained maps
  convert with a single transpose.
- Everything is a pure function of arrays: jit/vmap/grad-safe, no state.
- ``resize_nearest`` reproduces torch ``F.interpolate(mode='nearest')``
  index semantics (src = floor(dst * H / F)) with a static gather, so the
  decode matches the reference bit-for-bit in fp32.
- These jnp versions are the semantic definition AND the measured-fastest
  hot path: the fused Pallas decode (``awr_tpu.ops.pallas_decode``) was
  retired from the default path in round 3 after XLA won all 16 sweep
  rows (BENCH_NOTES_r03.md §1; the op is HBM-bound and XLA fuses it with
  its producer convs, which an opaque ``pallas_call`` cannot).  The
  kernels remain fully tested as an alternative spelling
  (``Config.use_pallas=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Foreground threshold: normalized depth >= 0.99 is background
# (reference feature_tool.py:35,57).
FG_THRESHOLD = 0.99
# Softmax temperature over the closeness heatmap (reference feature_tool.py:60).
SOFTMAX_TEMP = 30.0
# Distance epsilon under the sqrt (reference feature_tool.py:31).
DIS_EPS = 1e-8


def resize_nearest(img: jax.Array, size: int) -> jax.Array:
    """Nearest resize of (..., H, W) to (..., size, size).

    Uses torch ``F.interpolate(mode='nearest')`` semantics:
    ``src = floor(dst * H / size)`` (NOT pixel-center alignment), to match
    the reference's resizes at feature_tool.py:20,44 exactly.
    """
    h, w = img.shape[-2], img.shape[-1]
    if h == size and w == size:
        return img
    rows = (np.arange(size) * h) // size
    cols = (np.arange(size) * w) // size
    return img[..., rows, :][..., :, cols]


@functools.lru_cache(maxsize=None)
def _pixel_mesh_np(feature_size: int):
    """Normalized pixel-center coordinates in [-1, 1].

    mesh_x varies along the last (column/u) axis, mesh_y along the row/v
    axis; value = 2*(i+0.5)/F - 1 (reference feature_tool.py:23-24).
    """
    # fp64 so downstream casts get correctly-rounded constants (the
    # fp64 train-dynamics oracle would otherwise see fp32-rounded mesh)
    r = (2.0 * (np.arange(feature_size, dtype=np.float64) + 0.5)
         / feature_size - 1.0)
    mesh_x = np.broadcast_to(r[None, :], (feature_size, feature_size))
    mesh_y = np.broadcast_to(r[:, None], (feature_size, feature_size))
    return mesh_x, mesh_y


def pixel_mesh(feature_size: int, dtype=jnp.float32):
    mesh_x, mesh_y = _pixel_mesh_np(feature_size)
    return jnp.asarray(mesh_x, dtype), jnp.asarray(mesh_y, dtype)


def joint2offset(
    jt_uvd: jax.Array,
    img: jax.Array,
    kernel_size: float,
    feature_size: int,
) -> jax.Array:
    """Encode joints into the dense GT offset field (reference feature_tool.py:12-39).

    Args:
      jt_uvd: (B, J, 3) joints in normalized uvd ([-1, 1] each axis).
      img: (B, H, W) normalized depth in [-1, 1] (background == 1).
      kernel_size: closeness kernel radius in normalized units.
      feature_size: F, side of the output map.

    Returns:
      (B, F, F, 4J): unit offset vectors (3J ch) then closeness heatmaps
      (J ch), both zeroed outside {heatmap >= 0 AND foreground}.
    """
    B, J, _ = jt_uvd.shape
    F = feature_size
    dtype = jt_uvd.dtype
    img_f = resize_nearest(img, F).astype(dtype)  # (B, F, F)
    mesh_x, mesh_y = pixel_mesh(F, dtype)
    # Per-pixel (u, v, d) coordinate triple: (B, F, F, 3).
    coords = jnp.stack(
        [jnp.broadcast_to(mesh_x, (B, F, F)),
         jnp.broadcast_to(mesh_y, (B, F, F)),
         img_f],
        axis=-1,
    )
    # offset[b, y, x, j, :] = joint_j - pixel coords (feature_tool.py:29).
    offset = jt_uvd[:, None, None, :, :] - coords[:, :, :, None, :]
    dis = jnp.sqrt(jnp.sum(offset * offset, axis=-1) + DIS_EPS)  # (B,F,F,J)
    offset_norm = offset / dis[..., None]
    heatmap = (kernel_size - dis) / kernel_size
    mask = (heatmap >= 0).astype(dtype) * (img_f < FG_THRESHOLD).astype(
        dtype
    )[..., None]  # (B, F, F, J)
    vec = (offset_norm * mask[..., None]).reshape(B, F, F, J * 3)
    ht = heatmap * mask
    return jnp.concatenate([vec, ht], axis=-1)


def offset2joint_softmax(
    offset: jax.Array,
    img: jax.Array,
    kernel_size: float,
) -> jax.Array:
    """Adaptive weighted decode: dense map -> (B, J, 3) joints.

    The AWR integration (reference feature_tool.py:41-65): reconstruct a
    distance from the predicted closeness heatmap, walk each pixel's unit
    offset vector that far from the pixel's (u, v, depth) coordinates, and
    average the per-pixel joint estimates with softmax(heatmap * 30)
    weights over all F*F pixels.

    Args:
      offset: (B, F, F, 4J) dense map (see :func:`joint2offset`).
      img: (B, H, W) normalized depth.
      kernel_size: same kernel radius used at encode time.

    Returns:
      (B, J, 3) joints in normalized uvd.
    """
    B, F, _, C = offset.shape
    J = C // 4
    P = F * F
    dtype = offset.dtype
    img_f = resize_nearest(img, F).astype(dtype)  # (B, F, F)
    mesh_x, mesh_y = pixel_mesh(F, dtype)
    coords = jnp.stack(
        [jnp.broadcast_to(mesh_x, (B, F, F)),
         jnp.broadcast_to(mesh_y, (B, F, F)),
         img_f],
        axis=-1,
    ).reshape(B, P, 3)
    mask = (img_f < FG_THRESHOLD).astype(dtype).reshape(B, P)
    off_flat = offset.reshape(B, P, C)
    v3 = off_flat[..., : 3 * J] * mask[..., None]  # (B, P, 3J)
    ht = off_flat[..., 3 * J:] * mask[..., None]  # (B, P, J)

    # Softmax over the pixel axis (feature_tool.py:60).  Masked pixels keep
    # weight exp(0): the reference zeroes the heatmap, not the logit.
    w = jax.nn.softmax(ht * SOFTMAX_TEMP, axis=1)  # (B, P, J)
    dis = kernel_size - ht * kernel_size  # (B, P, J)
    # jt[b,j,:] = sum_p w*vec*dis + sum_p w*coords, computed WITHOUT the
    # (B, P, J, 3) per-pixel-estimate tensor the naive spelling builds
    # (352 MB of HBM traffic at B=512/F=64/J=14): the offset-walk term
    # folds (w*dis) into channel space via a broadcast-reshape that XLA
    # fuses into the reduction, and the coordinate term is one MXU
    # batch-matmul.
    dw3 = jnp.broadcast_to((w * dis)[..., None],
                           (B, P, J, 3)).reshape(B, P, 3 * J)
    term_vec = jnp.sum(v3 * dw3, axis=1).reshape(B, J, 3)
    term_coord = jnp.einsum("bpj,bpa->bja", w, coords)
    return term_vec + term_coord


def on_tpu() -> bool:
    """Whether the default backend is a TPU (Pallas dispatch predicate)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def nchw_to_nhwc(x):
    """Adapter for reference-layout (B, C, H, W) dense maps."""
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))
