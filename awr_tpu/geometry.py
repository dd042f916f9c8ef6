"""Pinhole camera geometry: xyz (mm, camera frame) <-> uvd (pixels + mm depth).

Reference parity: util/util.py:3-20 (xyz2uvd / uvd2xyz with a y-axis ``flip``
argument; NYU uses flip=-1) and loader.py:242-260 (2D point rotation and
affine uv transforms).  Implemented as pure shape-polymorphic functions over
the last axis of size 3, with both a jax and a numpy spelling — the jnp
versions trace cleanly under jit/vmap, the numpy versions serve the host data
path and parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def xyz2uvd(pts, paras, flip=1):
    """Project camera-frame xyz (mm) to image-frame (u px, v px, d mm).

    u = x*fx/z + u0 ; v = flip*y*fy/z + v0 ; d = z
    (reference util/util.py:3-10: y is flipped *before* projection).
    """
    pts = jnp.asarray(pts, dtype=jnp.float32)
    fx, fy, u0, v0 = paras
    x, y, z = pts[..., 0], pts[..., 1] * flip, pts[..., 2]
    u = x * fx / z + u0
    v = y * fy / z + v0
    return jnp.stack([u, v, z], axis=-1)


def uvd2xyz(pts, paras, flip=1):
    """Back-project image-frame (u, v, d) to camera-frame xyz (mm).

    x = (u-u0)*d/fx ; y = flip*(v-v0)*d/fy ; z = d
    (reference util/util.py:13-20: y is flipped *after* back-projection).
    """
    pts = jnp.asarray(pts, dtype=jnp.float32)
    fx, fy, u0, v0 = paras
    u, v, d = pts[..., 0], pts[..., 1], pts[..., 2]
    x = (u - u0) * d / fx
    y = (v - v0) * d / fy * flip
    return jnp.stack([x, y, d], axis=-1)


def xyz2uvd_np(pts, paras, flip=1):
    """Numpy twin of :func:`xyz2uvd` for the host data path."""
    pts = np.asarray(pts, dtype=np.float32)
    fx, fy, u0, v0 = paras
    out = np.empty_like(pts)
    z = pts[..., 2]
    out[..., 0] = pts[..., 0] * fx / z + u0
    out[..., 1] = pts[..., 1] * flip * fy / z + v0
    out[..., 2] = z
    return out


def uvd2xyz_np(pts, paras, flip=1):
    """Numpy twin of :func:`uvd2xyz` for the host data path."""
    pts = np.asarray(pts, dtype=np.float32)
    fx, fy, u0, v0 = paras
    out = np.empty_like(pts)
    d = pts[..., 2]
    out[..., 0] = (pts[..., 0] - u0) * d / fx
    out[..., 1] = (pts[..., 1] - v0) * d / fy * flip
    out[..., 2] = d
    return out


def transform_uv(jt_uvd, M):
    """Apply a 3x3 homogeneous affine M to the uv part of (..., J, 3) points.

    Depth is carried through untouched (reference loader.py:254-260).
    Works for jnp or np inputs; returns the input namespace's array.
    """
    xp = jnp if isinstance(jt_uvd, jnp.ndarray) else np
    uv1 = xp.concatenate(
        [jt_uvd[..., :2], xp.ones_like(jt_uvd[..., :1])], axis=-1
    )
    uv1 = xp.einsum("ij,...kj->...ki", xp.asarray(M, dtype=uv1.dtype), uv1)
    uv = uv1[..., :2] / uv1[..., 2:]
    return xp.concatenate([uv, jt_uvd[..., 2:]], axis=-1)


def transform_uv_batched(jt_uvd, M):
    """Batched :func:`transform_uv`: jt_uvd (B, J, 3) with per-sample M (B, 3, 3)."""
    xp = jnp if isinstance(jt_uvd, jnp.ndarray) else np
    uv1 = xp.concatenate(
        [jt_uvd[..., :2], xp.ones_like(jt_uvd[..., :1])], axis=-1
    )
    uv1 = xp.einsum("bij,bkj->bki", xp.asarray(M, dtype=uv1.dtype), uv1)
    uv = uv1[..., :2] / uv1[..., 2:]
    return xp.concatenate([uv, jt_uvd[..., 2:]], axis=-1)


def rotate_pts_uv(pts, center, angle_deg):
    """Rotate (J, 3) uv points clockwise by ``angle_deg`` about ``center``.

    Depth untouched (reference loader.py:242-252: clockwise = +angle here
    because image v grows downward).
    """
    xp = jnp if isinstance(pts, jnp.ndarray) else np
    a = angle_deg * np.pi / 180.0
    ca, sa = xp.cos(a), xp.sin(a)
    du = pts[..., 0] - center[0]
    dv = pts[..., 1] - center[1]
    u = du * ca - dv * sa + center[0]
    v = du * sa + dv * ca + center[1]
    return xp.stack([u, v, pts[..., 2]], axis=-1)
