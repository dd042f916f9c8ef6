"""Geometry parity tests (reference util/util.py, loader.py:242-260)."""

import numpy as np
import pytest

from awr_tpu.config import NYU_PARAS
from awr_tpu.geometry import (
    rotate_pts_uv,
    transform_uv,
    transform_uv_batched,
    uvd2xyz,
    uvd2xyz_np,
    xyz2uvd,
    xyz2uvd_np,
)

RNG = np.random.RandomState(0)


def random_xyz(n=20):
    pts = RNG.randn(n, 3).astype(np.float32) * 100.0
    pts[:, 2] = RNG.uniform(500, 1200, n)  # plausible depths, nonzero
    return pts


@pytest.mark.parametrize("flip", [1, -1])
def test_roundtrip(flip):
    pts = random_xyz()
    uvd = np.asarray(xyz2uvd(pts, NYU_PARAS, flip))
    back = np.asarray(uvd2xyz(uvd, NYU_PARAS, flip))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-3)


def test_fixed_vector():
    # Hand-computed: x=100, y=50, z=1000, flip=-1 (NYU).
    fx, fy, u0, v0 = NYU_PARAS
    uvd = np.asarray(xyz2uvd(np.array([[100.0, 50.0, 1000.0]]), NYU_PARAS, -1))
    np.testing.assert_allclose(
        uvd[0],
        [100 * fx / 1000 + u0, -50 * fy / 1000 + v0, 1000.0],
        rtol=1e-6,
    )


def test_np_twins_match_jnp():
    pts = random_xyz()
    np.testing.assert_allclose(
        xyz2uvd_np(pts, NYU_PARAS, -1),
        np.asarray(xyz2uvd(pts, NYU_PARAS, -1)),
        rtol=1e-6,
    )
    uvd = xyz2uvd_np(pts, NYU_PARAS, -1)
    np.testing.assert_allclose(
        uvd2xyz_np(uvd, NYU_PARAS, -1),
        np.asarray(uvd2xyz(uvd, NYU_PARAS, -1)),
        rtol=1e-6,
    )


def test_transform_uv_affine():
    # Pure-affine M (last row [0,0,1]): matches direct matrix application.
    M = np.array([[2.0, 0, 5], [0, 2.0, -3], [0, 0, 1]], np.float32)
    jt = RNG.randn(14, 3).astype(np.float32)
    out = transform_uv(jt, M)
    exp_u = jt[:, 0] * 2 + 5
    exp_v = jt[:, 1] * 2 - 3
    np.testing.assert_allclose(out[:, 0], exp_u, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], exp_v, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2], jt[:, 2], rtol=1e-6)


def test_transform_uv_batched_matches_loop():
    Ms = RNG.randn(4, 3, 3).astype(np.float32)
    Ms[:, 2, :] = [0, 0, 1]
    jt = RNG.randn(4, 14, 3).astype(np.float32)
    got = transform_uv_batched(jt, Ms)
    for b in range(4):
        np.testing.assert_allclose(
            got[b], transform_uv(jt[b], Ms[b]), rtol=1e-4, atol=1e-4
        )


def test_rotate_pts_90deg():
    center = np.array([10.0, 20.0, 0.0])
    pts = np.array([[11.0, 20.0, 7.0]])  # 1 unit right of center
    out = np.asarray(rotate_pts_uv(pts, center, 90.0))
    # clockwise 90 deg in image coords: (du,dv)=(1,0) -> (0,1)
    np.testing.assert_allclose(out[0], [10.0, 21.0, 7.0], atol=1e-5)
