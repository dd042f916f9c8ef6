"""AWR encode/decode parity tests (reference util/feature_tool.py) and the
delta=0.01 smooth-L1 (reference model/loss.py).

Oracles are written independently in torch/numpy from the published AWR
equations (AAAI-2020, arXiv:2007.09590) with NCHW layout, as a cross-check
of the NHWC jax implementation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from awr_tpu.ops import (
    joint2offset,
    offset2joint_softmax,
    resize_nearest,
    smooth_l1_loss,
)
from awr_tpu.ops.functional import nchw_to_nhwc, nhwc_to_nchw

RNG = np.random.RandomState(42)


def make_batch(B=2, J=14, H=128):
    """Synthetic normalized depth + joints: bg=1, a blob of foreground."""
    img = np.ones((B, H, W_ := H), np.float32)
    yy, xx = np.mgrid[0:H, 0:W_]
    for b in range(B):
        cy, cx = RNG.randint(H // 4, 3 * H // 4, 2)
        r = H // 4
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[b][m] = RNG.uniform(-0.8, 0.5, m.sum()).astype(np.float32)
    jt = RNG.uniform(-0.6, 0.6, (B, J, 3)).astype(np.float32)
    return img, jt


# ---------------------------------------------------------------- oracles
def torch_encode(jt_uvd, img, kernel, F):
    """Torch NCHW oracle of the AWR encode equations."""
    jt = torch.from_numpy(jt_uvd)
    im = TF.interpolate(torch.from_numpy(img)[:, None], size=[F, F])
    B, J, _ = jt.shape
    r = 2.0 * (torch.arange(F).float() + 0.5) / F - 1.0
    mesh_x = r[None, :].expand(F, F)
    mesh_y = r[:, None].expand(F, F)
    coords = torch.stack([mesh_x, mesh_y])[None].expand(B, 2, F, F)
    coords = torch.cat([coords, im], 1)  # (B,3,F,F)
    off = jt[..., None, None] - coords[:, None]  # (B,J,3,F,F)
    dis = torch.sqrt((off**2).sum(2) + 1e-8)
    offn = off / dis[:, :, None]
    ht = (kernel - dis) / kernel
    mask = (ht >= 0).float() * (im < 0.99).float()
    vec = (offn * mask[:, :, None]).reshape(B, J * 3, F, F)
    return torch.cat([vec, ht * mask], 1).numpy()


def torch_decode(offset_nchw, img, kernel):
    """Torch NCHW oracle of the AWR adaptive weighted decode."""
    off = torch.from_numpy(offset_nchw)
    B, C, F, _ = off.shape
    J = C // 4
    im = TF.interpolate(torch.from_numpy(img)[:, None], size=[F, F])
    r = 2.0 * (torch.arange(F).float() + 0.5) / F - 1.0
    mesh_x = r[None, :].expand(F, F)
    mesh_y = r[:, None].expand(F, F)
    coords = torch.stack([mesh_x, mesh_y])[None].expand(B, 2, F, F)
    coords = torch.cat([coords, im], 1)[:, None].expand(B, J, 3, F, F)
    coords = coords.reshape(B, J, 3, -1)
    mask = (im < 0.99).float()
    vec = (off[:, : J * 3] * mask).reshape(B, J, 3, -1)
    ht = (off[:, J * 3 :] * mask).reshape(B, J, -1)
    w = TF.softmax(ht * 30.0, dim=-1)
    dis = kernel - ht * kernel
    jt = ((vec * dis[:, :, None] + coords) * w[:, :, None]).sum(-1)
    return jt.numpy()


# ------------------------------------------------------------------ tests
def test_resize_nearest_matches_torch():
    img = RNG.randn(2, 128, 128).astype(np.float32)
    for F in (64, 32, 128):
        got = np.asarray(resize_nearest(img, F))
        exp = TF.interpolate(torch.from_numpy(img)[:, None], size=[F, F])
        np.testing.assert_array_equal(got, exp.numpy()[:, 0])


@pytest.mark.parametrize("kernel,F", [(0.4, 64), (1.0, 64), (0.4, 32)])
def test_encode_parity(kernel, F):
    img, jt = make_batch()
    got = np.asarray(nhwc_to_nchw(joint2offset(jt, img, kernel, F)))
    exp = torch_encode(jt, img, kernel, F)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel", [0.4, 1.0])
def test_decode_parity(kernel):
    img, jt = make_batch()
    B, J = jt.shape[:2]
    F = 64
    offset = RNG.randn(B, 4 * J, F, F).astype(np.float32) * 0.3
    got = np.asarray(
        offset2joint_softmax(nchw_to_nhwc(offset), img, kernel)
    )
    exp = torch_decode(offset, img, kernel)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_encode_decode_consistency():
    """Decoding a GT-encoded field must approximately recover the joints
    (the AWR property that makes dense supervision equivalent to coordinate
    supervision)."""
    img, jt = make_batch(B=2, J=14, H=128)
    # keep joints inside the foreground blob region for recoverability
    jt[..., :2] *= 0.3
    enc = joint2offset(jt, img, 0.8, 64)
    dec = np.asarray(offset2joint_softmax(enc, img, 0.8))
    err = np.abs(dec - jt)
    # softmax integration is approximate; errors should be small
    assert np.median(err) < 0.08, np.median(err)


def test_smooth_l1_matches_piecewise_reference():
    """Reference loss.py computes two masked means whose sum equals the
    piecewise mean; verify against a literal two-masked-means torch oracle."""
    x = RNG.randn(4, 14, 3).astype(np.float32) * 0.02
    y = RNG.randn(4, 14, 3).astype(np.float32) * 0.02
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    z = tx - ty
    mse_mask = (z.abs() < 0.01).float()
    l1_mask = (z.abs() >= 0.01).float()
    mse = mse_mask * z
    l1 = l1_mask * z
    exp = (0.5 * mse.pow(2) * mse_mask).mean() + (
        0.01 * (l1.abs() - 0.005) * l1_mask
    ).mean()
    got = float(smooth_l1_loss(x, y))
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_smooth_l1_boundary():
    # exactly at |z| = 0.01 the linear branch applies: 0.01*(0.01-0.005)
    x = np.array([0.01], np.float32)
    y = np.array([0.0], np.float32)
    np.testing.assert_allclose(
        float(smooth_l1_loss(x, y)), 0.01 * 0.005, rtol=1e-6
    )
    # just inside: quadratic
    x = np.array([0.009], np.float32)
    np.testing.assert_allclose(
        float(smooth_l1_loss(x, y)), 0.5 * 0.009**2, rtol=1e-5
    )


def test_ops_are_jittable_and_differentiable():
    import jax

    img, jt = make_batch(B=1)
    enc = jax.jit(joint2offset, static_argnums=(2, 3))(jt, img, 0.4, 64)

    def f(off):
        j = offset2joint_softmax(off, img, 0.4)
        return (j**2).sum()

    g = jax.grad(f)(enc)
    assert np.isfinite(np.asarray(g)).all()
