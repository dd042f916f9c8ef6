"""Synthetic depth-hand dataset for offline tests and benchmarks.

The reference snapshot ships neither the NYU depth PNGs nor
``joint_data.mat`` (SURVEY.md section 6), so runtime verification uses
generated scenes: a cluster of spheres ("palm" + "fingertips") rendered
into a (480, 640) mm depth frame with the NYU intrinsics.  GT joints are
the sphere centers, so the full crop -> train -> decode -> mm-metric
pipeline is exercised with a learnable, geometrically consistent signal.
"""

from __future__ import annotations

import numpy as np

from awr_tpu.data.base import DepthDataset
from awr_tpu.data.nyu import NYU_FLIP, NYU_PARAS
from awr_tpu.data.transforms import CameraCrop


def render_hand_depth(center_xyz, jt_xyz, paras, shape=(480, 640),
                      radii=None, bg=0.0):
    """Render spheres at ``jt_xyz`` (absolute mm) into a depth frame.

    Nearest-surface-wins z-buffer; background pixels are ``bg`` (NYU raw
    frames use large max-depth values for background, but the reference
    maps exact 0 to background too, so 0 works for both paths).
    """
    h, w = shape
    fx, fy, u0, v0 = paras
    depth = np.full(shape, np.inf, np.float32)
    if radii is None:
        radii = [40.0] + [14.0] * (len(jt_xyz) - 1)
    for (x, y, z), r in zip(jt_xyz, radii):
        u = x * fx / z + u0
        v = y * NYU_FLIP * fy / z + v0
        pr = int(np.ceil(r * fx / z)) + 2
        uu0, uu1 = max(int(u) - pr, 0), min(int(u) + pr + 1, w)
        vv0, vv1 = max(int(v) - pr, 0), min(int(v) + pr + 1, h)
        if uu1 <= uu0 or vv1 <= vv0:
            continue
        uu, vv = np.meshgrid(np.arange(uu0, uu1), np.arange(vv0, vv1))
        # ray through pixel: direction ((u-u0)/fx, (v-v0)/fy, 1)
        dx = (uu - u0) / fx
        dy = (vv - v0) / fy
        # sphere center in "camera-pixel" frame (flip folded into dy sign)
        cy = y * NYU_FLIP
        # solve |t*(dx,dy,1) - (x,cy,z)|^2 = r^2 for smallest t > 0
        a = dx * dx + dy * dy + 1.0
        b = -2.0 * (dx * x + dy * cy + z)
        c = x * x + cy * cy + z * z - r * r
        disc = b * b - 4 * a * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a),
                     np.inf)
        patch = depth[vv0:vv1, uu0:uu1]
        depth[vv0:vv1, uu0:uu1] = np.minimum(patch, t.astype(np.float32))
    depth[~np.isfinite(depth)] = bg
    return depth


class SyntheticHandDataset(DepthDataset):
    """Same item contract as :class:`awr_tpu.data.nyu.NYUDataset`."""

    def __init__(self, num_samples: int = 64, jt_num: int = 14,
                 img_size: int = 128, cube=(300.0, 300.0, 300.0),
                 phase: str = "test", aug_para=(10.0, 0.1, 180.0),
                 seed: int = 0, mode: str = "host",
                 shape=(480, 640), cache_renders: bool = True,
                 layout: str = "random"):
        self.n = num_samples
        self.jt_num = jt_num
        self.img_size = img_size
        self.cube = np.asarray(cube, np.float64)
        self.phase = phase
        self.val = False
        self.aug_para = tuple(aug_para)
        self.mode = mode
        self.shape = shape
        self.paras = NYU_PARAS
        self.flip = NYU_FLIP
        self.cropper = CameraCrop(self.paras, self.flip, img_size)
        self.rng = np.random.RandomState(23455)

        g = np.random.RandomState(seed)
        self.layout = layout
        self.centers = np.stack(
            [g.uniform(-80, 80, num_samples),
             g.uniform(-60, 60, num_samples),
             g.uniform(650, 950, num_samples)], axis=1)
        if layout == "random":
            # joints scattered within ~70mm of the center ("fingers").
            # NOTE: rear spheres can be fully OCCLUDED by the large palm
            # sphere, so some joints are ill-posed from a single depth
            # view — this task has an irreducible error floor and is
            # meant for pipeline exercise, not convergence proofs.
            self.joints = (self.centers[:, None, :]
                           + g.uniform(-70, 70,
                                       (num_samples, jt_num, 3)))
            self.joints[..., 2] = (
                self.centers[:, None, 2]
                + g.uniform(-40, 40, (num_samples, jt_num)))
            self._radii = None  # render_hand_depth defaults (big palm)
        elif layout == "grid":
            # every joint VISIBLE: small equal spheres on a jittered
            # xy grid facing the camera, shallow z spread.  Fully
            # observable -> no error floor; use for convergence checks.
            # Disjointness by construction: min xy center distance =
            # spacing - 2*jitter must exceed 2*radius (z spread +-10 at
            # ~650-950mm depth cannot bring xy-disjoint spheres onto
            # one viewing ray).  jt_num <= 16 keeps the original 35mm/
            # +-6/r10 numbers (23 > 20; committed convergence recipes
            # depend on them); larger grids (21-joint MSRA/HANDS17
            # configs) shrink jitter and radius with the spacing so the
            # guarantee holds for every side length.
            side = int(np.ceil(np.sqrt(jt_num)))
            spacing = 140.0 / side
            if side <= 4:
                jitter, radius = 6.0, 10.0
            else:
                jitter = spacing / 7.0
                radius = 0.45 * (spacing - 2.0 * jitter)
            assert spacing - 2 * jitter > 2 * radius
            gx, gy = np.meshgrid(np.arange(side), np.arange(side))
            grid = np.stack([gx.ravel(), gy.ravel()], 1)[:jt_num]
            grid = (grid - (side - 1) / 2.0) * spacing
            off = np.zeros((num_samples, jt_num, 3))
            off[..., :2] = grid[None] + g.uniform(
                -jitter, jitter, (num_samples, jt_num, 2))
            off[..., 2] = g.uniform(-10, 10, (num_samples, jt_num))
            self.joints = self.centers[:, None, :] + off
            self._radii = [radius] * jt_num
        else:
            raise ValueError(f"unknown layout {layout!r}")
        self._render_cache = {} if cache_renders else None

    def __len__(self):
        return self.n

    def cube_for(self, index: int) -> np.ndarray:
        return self.cube

    def raw_item(self, index: int):
        jt_xyz = self.joints[index]
        center_xyz = self.centers[index]
        img = self._render_cache.get(index) if self._render_cache is not None else None
        if img is None:
            img = render_hand_depth(center_xyz, jt_xyz, self.paras,
                                    self.shape, radii=self._radii)
            if self._render_cache is not None:
                self._render_cache[index] = img
        return img.copy(), jt_xyz.copy(), center_xyz.copy()

    def __getitem__(self, index: int):
        img, jt_xyz, center_xyz = self.raw_item(index)
        cube = self.cube_for(index)
        if self.mode == "raw":
            # f64 center/cube preserve the int(x+0.5) crop truncations
            # computed host-side (see nyu.py raw mode)
            return dict(img=img, jt_xyz=jt_xyz.astype(np.float32),
                        center_xyz=np.asarray(center_xyz, np.float64),
                        cube=cube)
        return self.process(img, jt_xyz, center_xyz, cube)
