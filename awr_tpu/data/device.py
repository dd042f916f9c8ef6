"""Fused device-side depth preprocessing under jit (static shapes).

The reference does crop -> z-clip -> NEAREST resize -> center-pad ->
normalize on host CPU inside DataLoader workers (loader.py:19-51,88-101,
nyu_loader.py:38-66).  Here the whole chain is ONE gather expression per
output pixel, jitted and vmapped over the batch, so raw (H0, W0) depth
frames stream to the device and the crop/normalize executes on the VPU —
no per-sample host image work, no dynamic shapes.

Split of labor:
- A handful of *scalar* crop parameters per sample (bounds, resize size,
  paste offsets, affine M) are computed on host in float64 by
  :func:`awr_tpu.data.transforms.crop_params_np`, because the reference's
  ``int()`` truncations (loader.py:183-188,230,237-238) sit right on
  integer boundaries that f32 can land on the wrong side of.
- All *pixel* work (the (B, H0, W0) -> (B, S, S) gather, z-threshold,
  normalize, augmentation warps) runs on device.

Semantics notes (asserted equal to the host path in tests):
- NEAREST resize uses cv2 index semantics ``src = min(floor(dst*scale), n-1)``;
- the z-threshold maps nonzero depth below zstart to zstart and above
  zend to 0 (loader.py:202-205);
- normalize maps {exact 0, exact pre-aug max} to background
  ``center_z + cube_z/2`` then clips to the cube (loader.py:88-101).

Train-time augmentation (choose-one of {trans, scale, rot, none},
loader.py:53-86) is implemented as inverse-affine bilinear gathers
(float bilinear; cv2 uses 5-bit fixed point — parity is approximate for
warped pixels, exact for all label math; augmented crops' bounds are
recomputed in f32 on device, which can differ from the reference by one
source pixel — both are random train-time jitter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from awr_tpu.data.transforms import crop_params_np
from awr_tpu.geometry import rotate_pts_uv, transform_uv, uvd2xyz, xyz2uvd


def _bounds_f32(center_uvd, cube, paras):
    """On-device trunc(x+0.5) crop bounds (reference loader.py:181-188);
    used only for augmented re-crops, see module docstring."""
    fx, fy = paras[0], paras[1]
    cz = center_uvd[2]
    half_u = (cube[0] / 2.0) / cz * fx
    half_v = (cube[1] / 2.0) / cz * fy
    ustart = jnp.trunc(center_uvd[0] - half_u + 0.5).astype(jnp.int32)
    uend = jnp.trunc(center_uvd[0] + half_u + 0.5).astype(jnp.int32)
    vstart = jnp.trunc(center_uvd[1] - half_v + 0.5).astype(jnp.int32)
    vend = jnp.trunc(center_uvd[1] + half_v + 0.5).astype(jnp.int32)
    zstart = cz - cube[2] / 2.0
    zend = cz + cube[2] / 2.0
    return ustart, uend, vstart, vend, zstart, zend


def _transmat_f32(ustart, uend, vstart, vend, dsize: int):
    """On-device crop affine M (reference loader.py:210-240)."""
    w = (uend - ustart).astype(jnp.float32)
    h = (vend - vstart).astype(jnp.float32)
    scale = jnp.minimum(dsize / w, dsize / h)
    sw = jnp.trunc(w * scale)
    sh = jnp.trunc(h * scale)
    tx = jnp.floor(dsize / 2.0 - sw / 2.0)
    ty = jnp.floor(dsize / 2.0 - sh / 2.0)
    M = jnp.eye(3, dtype=jnp.float32)
    M = M.at[0, 0].set(scale).at[1, 1].set(scale)
    M = M.at[0, 2].set(-ustart * scale + tx)
    M = M.at[1, 2].set(-vstart * scale + ty)
    return M


def _z_threshold(val, zstart, zend):
    nz = val != 0
    val = jnp.where(nz & (val < zstart), zstart, val)
    return jnp.where(nz & (val > zend), 0.0, val)


def _crop_gather(img, us, ue, vs, ve, zs, ze, sw, sh, tx, ty, dsize: int):
    """Crop one raw (H0, W0) mm frame to (dsize, dsize) mm (pre-normalize).

    Fused equivalent of reference loader.py:19-51: slice/pad crop,
    z-threshold, cv2-NEAREST resize, center pad — as one gather.
    """
    H0, W0 = img.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (dsize, dsize), 0)  # out row
    jj = jax.lax.broadcasted_iota(jnp.int32, (dsize, dsize), 1)  # out col
    in_paste = (ii >= ty) & (ii < ty + sh) & (jj >= tx) & (jj < tx + sw)

    crop_w = (ue - us).astype(jnp.float32)
    crop_h = (ve - vs).astype(jnp.float32)
    cu = jnp.minimum(
        jnp.floor((jj - tx).astype(jnp.float32) * crop_w
                  / jnp.maximum(sw, 1).astype(jnp.float32)).astype(jnp.int32),
        ue - us - 1,
    )
    cv = jnp.minimum(
        jnp.floor((ii - ty).astype(jnp.float32) * crop_h
                  / jnp.maximum(sh, 1).astype(jnp.float32)).astype(jnp.int32),
        ve - vs - 1,
    )
    su = us + cu
    sv = vs + cv
    in_img = (su >= 0) & (su < W0) & (sv >= 0) & (sv < H0)
    val = img[jnp.clip(sv, 0, H0 - 1), jnp.clip(su, 0, W0 - 1)]
    val = jnp.where(in_img, val, 0.0)
    val = _z_threshold(val, zs, ze)
    return jnp.where(in_paste, val, 0.0).astype(jnp.float32)


def normalize(img, depth_max, center_z, cube_z):
    """mm depth -> [-1, 1], bg -> +1 (reference loader.py:88-101)."""
    bg = center_z + cube_z / 2.0
    img = jnp.where((img == depth_max) | (img == 0), bg, img)
    img = jnp.clip(img, center_z - cube_z / 2.0, bg)
    return (img - center_z) / (cube_z / 2.0)


@functools.partial(jax.jit, static_argnames=("dsize",))
def _crop_normalize_kernel(imgs, p, center_z, cube_z, dsize: int):
    def one(img, us, ue, vs, ve, zs, ze, sw, sh, tx, ty, cz, cbz):
        crop = _crop_gather(img, us, ue, vs, ve, zs, ze, sw, sh, tx, ty,
                            dsize)
        return normalize(crop, crop.max(), cz, cbz)

    return jax.vmap(one)(imgs, p["us"], p["ue"], p["vs"], p["ve"], p["zs"],
                         p["ze"], p["sw"], p["sh"], p["tx"], p["ty"],
                         center_z, cube_z)


def crop_normalize_batch(imgs, centers_uvd, cubes, paras, dsize: int):
    """Eval-path preprocessing for a batch of raw frames.

    Args:
      imgs: (B, H0, W0) raw mm depth (device or host array).
      centers_uvd: (B, 3) host array; cubes: (B, 3); paras: intrinsics.
    Returns:
      (B, dsize, dsize) normalized depth in [-1, 1] (device array,
      still in flight — callers can feed it straight into a jitted
      forward without a host sync) and (B, 3, 3) M as a HOST array
      (it is fp64 host math to begin with, crop_params_np; returning
      it on device would force async callers to round-trip it back).
    """
    p_np = crop_params_np(np.asarray(centers_uvd), np.asarray(cubes),
                          np.asarray(paras), dsize)
    M = p_np.pop("M")
    p = {k: jnp.asarray(v) for k, v in p_np.items()}
    out = _crop_normalize_kernel(
        jnp.asarray(imgs), p,
        jnp.asarray(np.asarray(centers_uvd)[:, 2], jnp.float32),
        jnp.asarray(np.asarray(cubes)[:, 2], jnp.float32), dsize)
    return out, M


# --------------------------------------------------------------------------
# Train-path: choose-one augmentation on device.
# --------------------------------------------------------------------------


def _bilinear_sample(img, x, y):
    """Bilinear sample (dsize, dsize) image at float coords, border 0."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(ok, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _warp_affine_inv(img, A_inv, dsize: int):
    """dst(i,j) = bilinear(src, A_inv @ (j,i,1)); border constant 0."""
    ii = jax.lax.broadcasted_iota(jnp.float32, (dsize, dsize), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (dsize, dsize), 1)
    sx = A_inv[0, 0] * jj + A_inv[0, 1] * ii + A_inv[0, 2]
    sy = A_inv[1, 0] * jj + A_inv[1, 1] * ii + A_inv[1, 2]
    return _bilinear_sample(img, sx, sy)


def _recrop(img, center_uvd, cube, new_M, M_inv, paras, dsize: int):
    """Device twin of reference loader.py:125-138 (warp + outlier + z-clip)."""
    A = new_M @ M_inv
    A_inv = jnp.linalg.inv(A)
    pos_min = jnp.min(jnp.where(img > 0, img, jnp.inf))
    nv_val = pos_min - 1.0
    out = _warp_affine_inv(img, A_inv, dsize)
    out = jnp.where(out < nv_val, 0.0, out)
    _, _, _, _, zs, ze = _bounds_f32(center_uvd, cube, paras)
    return _z_threshold(out, zs, ze)


def augment_one(img, jt_xyz, center_uvd, cube, M, paras, flip,
                aug_op, trans, scale, rot, dsize: int):
    """Device twin of reference loader.py:75-86 on an mm-depth crop.

    ``aug_op`` is an int32 index into (trans, scale, rot, none) —
    dispatched with lax.switch so the whole thing stays jittable.
    Returns (img_normalized, jt_xyz, cube, center_uvd, M).
    """
    depth_max = img.max()

    def do_trans(_):
        center_xyz = uvd2xyz(center_uvd, paras, flip)
        new_center = xyz2uvd(center_xyz + trans, paras, flip)
        new_M = _transmat_f32(*_bounds_f32(new_center, cube, paras)[:4],
                              dsize)
        ok = jnp.logical_or(~jnp.isclose(center_uvd[2], 0.0),
                            jnp.isclose(new_center[2], 0.0))
        new_img = _recrop(img, new_center, cube, new_M,
                          jnp.linalg.inv(M), paras, dsize)
        new_jt = jt_xyz + center_xyz - uvd2xyz(new_center, paras, flip)
        return (jnp.where(ok, new_img, img), new_jt, cube, new_center,
                jnp.where(ok, new_M, M))

    def do_scale(_):
        new_cube = cube * scale
        new_M = _transmat_f32(*_bounds_f32(center_uvd, new_cube, paras)[:4],
                              dsize)
        ok = ~jnp.isclose(center_uvd[2], 0.0)
        new_img = _recrop(img, center_uvd, new_cube, new_M,
                          jnp.linalg.inv(M), paras, dsize)
        return (jnp.where(ok, new_img, img), jt_xyz, new_cube, center_uvd,
                jnp.where(ok, new_M, M))

    def do_rot(_):
        r = jnp.mod(rot, 360.0)
        a = -r * jnp.pi / 180.0  # cv2 getRotationMatrix2D(angle=-rot)
        ca, sa = jnp.cos(a), jnp.sin(a)
        cx, cy = dsize // 2, dsize // 2
        # forward 3x3 of cv2's 2x3; invert for sampling
        A = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        A = A.at[0, 0].set(ca).at[0, 1].set(sa)
        A = A.at[0, 2].set((1 - ca) * cx - sa * cy)
        A = A.at[1, 0].set(-sa).at[1, 1].set(ca)
        A = A.at[1, 2].set(sa * cx + (1 - ca) * cy)
        new_img = _warp_affine_inv(img, jnp.linalg.inv(A), dsize)
        center_xyz = uvd2xyz(center_uvd, paras, flip)
        jt_uvd = xyz2uvd(jt_xyz + center_xyz, paras, flip)
        jt_uvd = rotate_pts_uv(jt_uvd, center_uvd, r)
        new_jt = uvd2xyz(jt_uvd, paras, flip) - center_xyz
        return new_img, new_jt, cube, center_uvd, M

    def do_none(_):
        return img, jt_xyz, cube, center_uvd, M

    img, jt_xyz, cube, center_uvd, M = jax.lax.switch(
        aug_op, [do_trans, do_scale, do_rot, do_none], None
    )
    img = normalize(img, depth_max, center_uvd[2], cube[2])
    return img, jt_xyz, cube, center_uvd, M


def draw_augment_params(key, batch: int, sigma_trans=10.0, sigma_scale=0.1,
                        sigma_rot=180.0):
    """jax.random twin of reference loader.py:53-73 (different RNG stream;
    same distributions).  Returns (op (B,), trans (B,3), scale (B,), rot (B,))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    op = jax.random.randint(k1, (batch,), 0, 4)
    trans = jax.random.normal(k2, (batch, 3)) * sigma_trans
    scale = jnp.abs(1.0 + jax.random.normal(k3, (batch,)) * sigma_scale)
    rot = jax.random.uniform(k4, (batch,), minval=-sigma_rot,
                             maxval=sigma_rot)
    return op, trans, scale, rot


def train_preprocess(imgs, jt_xyz, centers_uvd, cubes, paras, p,
                     aug_params, dsize: int, flip: int):
    """Traceable train-path preprocessing (see train_preprocess_batch);
    composable into a larger jitted step (e.g. the fused raw-mode train
    step in awr_tpu.training.steps)."""
    op, trans, scale, rot = aug_params

    def one(img, jt, c_uvd, cube, us, ue, vs, ve, zs, ze, sw, sh, tx, ty,
            M0, op_i, t_i, s_i, r_i):
        # absolute joints -> center-relative (reference nyu_loader.py:50)
        jt = jt - uvd2xyz(c_uvd, paras, flip)
        crop = _crop_gather(img, us, ue, vs, ve, zs, ze, sw, sh, tx, ty,
                            dsize)
        img_n, jt, cube, c_uvd, M = augment_one(
            crop, jt, c_uvd, cube, M0, paras, flip, op_i, t_i, s_i, r_i,
            dsize)
        center_xyz = uvd2xyz(c_uvd, paras, flip)
        jt_uvd_px = transform_uv(
            xyz2uvd(jt + center_xyz, paras, flip), M)
        jt_uvd_n = jnp.stack(
            [jt_uvd_px[:, 0] / (dsize / 2.0) - 1,
             jt_uvd_px[:, 1] / (dsize / 2.0) - 1,
             (jt_uvd_px[:, 2] - center_xyz[2]) / (cube[2] / 2.0)], -1)
        jt_xyz_n = jt / (cube / 2.0)
        return img_n, jt_xyz_n, jt_uvd_n, center_xyz, M, cube

    img_n, jt_xyz_n, jt_uvd_n, center_xyz, M, cube = jax.vmap(one)(
        imgs, jt_xyz, centers_uvd, cubes, p["us"], p["ue"], p["vs"],
        p["ve"], p["zs"], p["ze"], p["sw"], p["sh"], p["tx"], p["ty"],
        p["M"], op, trans, scale, rot)
    return dict(img=img_n, jt_xyz=jt_xyz_n, jt_uvd=jt_uvd_n,
                center_xyz=center_xyz, M=M, cube=cube)


def train_preprocess_batch(imgs, jt_xyz, centers_uvd, cubes, paras,
                           aug_params, dsize: int, flip: int):
    """Full train-path device preprocessing for a batch of raw frames:
    crop -> one-of-four augment -> normalize -> label normalization
    (reference nyu_loader.py:38-66).

    Args:
      imgs: (B, H0, W0) raw mm depth; jt_xyz: (B, J, 3) ABSOLUTE mm
      joints (center subtraction happens on device); centers_uvd: (B, 3).
    Returns dict with img (B,S,S), jt_xyz/jt_uvd (B,J,3) normalized,
    center_xyz (B,3), M (B,3,3), cube (B,3).
    """
    p_np = crop_params_np(np.asarray(centers_uvd), np.asarray(cubes),
                          np.asarray(paras), dsize)
    p = {k: jnp.asarray(v) for k, v in p_np.items()}
    return jax.jit(train_preprocess,
                   static_argnames=("dsize", "flip"))(
        jnp.asarray(imgs), jnp.asarray(jt_xyz, jnp.float32),
        jnp.asarray(centers_uvd, jnp.float32),
        jnp.asarray(cubes, jnp.float32), jnp.asarray(paras),
        p, aug_params, dsize=dsize, flip=flip)
