"""Shared dataset base: the reference item pipeline + host batcher.

Subclasses provide raw frames (decoded PNGs or synthetic renders) plus
``paras/flip/img_size/cube/phase/val/aug_para/rng/cropper`` attributes;
this base applies the reference's crop -> augment|normalize ->
label-normalize chain (reference nyu_loader.py:38-66).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from awr_tpu.data.transforms import normalize_labels
from awr_tpu.geometry import transform_uv, uvd2xyz_np, xyz2uvd_np


def _load_centers_or_centroids(root, phase, labels_xyz,
                               allow_centroid_centers: bool,
                               dataset_name: str) -> np.ndarray:
    """Refined-center file lookup with an EXPLICIT centroid fallback.

    The AWR family trains on refined hand centers produced by a separate
    2D CNN (reference README.md:31, nyu_loader.py:81,87).  Joint
    centroids are a *different crop distribution* and silently change
    results on real data, so substituting them requires
    ``allow_centroid_centers=True`` and still warns loudly (PARITY.md
    "Centroid-center fallback").
    """
    import os as _os
    import warnings

    cpath = _os.path.join(root, f"center_{phase}_refined.txt")
    if _os.path.exists(cpath):
        return np.loadtxt(cpath, ndmin=2)
    if not allow_centroid_centers:
        raise FileNotFoundError(
            f"{dataset_name} refined hand centers not found at {cpath}. "
            f"The AWR pipeline crops around refined centers; training on "
            f"joint centroids changes the crop distribution and the "
            f"results.  Pass allow_centroid_centers=True to explicitly "
            f"accept centroid crops.")
    warnings.warn(
        f"{dataset_name}: no refined centers at {cpath}; using joint "
        f"CENTROIDS as crop centers (allow_centroid_centers=True).  "
        f"Results are NOT comparable to refined-center runs.",
        stacklevel=3)
    return labels_xyz.mean(axis=1)


class DepthDataset:
    def process(self, img, jt_xyz, center_xyz, cube):
        """Reference item pipeline (nyu_loader.py:38-66), host numpy/cv2."""
        c = self.cropper
        center_uvd = xyz2uvd_np(center_xyz, self.paras, self.flip).astype(
            np.float64
        )
        jt_xyz = jt_xyz - center_xyz
        img, M = c.crop(img, center_uvd, cube, self.img_size)

        if self.phase == "train" and not self.val:
            aug_op, trans, scale, rot = c.random_aug(self.rng, *self.aug_para)
            img, jt_xyz, cube, center_uvd, M = c.augment(
                img, jt_xyz, center_uvd, cube, M, aug_op, trans, scale, rot
            )
            center_xyz = uvd2xyz_np(center_uvd, self.paras, self.flip)
        else:
            img = c.normalize(img.max(), img, center_xyz[2], cube[2])

        jt_uvd_px = np.asarray(transform_uv(
            xyz2uvd_np(jt_xyz + center_xyz, self.paras, self.flip), M))
        jt_xyz_n, jt_uvd_n = normalize_labels(
            jt_xyz, jt_uvd_px, center_xyz, cube, self.img_size
        )
        return dict(
            img=img.astype(np.float32),
            jt_xyz=jt_xyz_n,
            jt_uvd=jt_uvd_n,
            center_xyz=np.asarray(center_xyz, np.float32),
            M=np.asarray(M, np.float32),
            cube=np.asarray(cube, np.float32),
        )

    def batches(self, batch_size: int, shuffle: bool = False,
                drop_last: bool = False,
                rng: Optional[np.random.RandomState] = None):
        """Host batcher yielding stacked dict batches."""
        order = np.arange(len(self))
        if shuffle:
            (rng or self.rng).shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            items = [self[int(j)] for j in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
