"""ICVL hand dataset loader.

The reference supports ICVL only via config tables (config.py:1-18:
16 joints, step 10, 40 epochs) and the skeleton table
(vis_tool.py:62-68) — its Loader subclass exists only for NYU.  This
loader completes the surface using the dataset's standard public layout
(as used by the AWR-family preprocessing pipelines):

    <root>/
      Depth/<line-path>.png            16-bit depth PNGs, 320x240, mm
      labels_train.txt / labels_test.txt
          "<relative path> u1 v1 d1 ... u16 v16 d16" per line
      center_train_refined.txt / center_test_refined.txt
          xyz mm hand centers (same convention as NYU's)

Intrinsics: fx = fy = 241.42, cx = 160, cy = 120; no y flip.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from awr_tpu.data.base import DepthDataset
from awr_tpu.data.transforms import CameraCrop

ICVL_PARAS = (241.42, 241.42, 160.0, 120.0)
ICVL_FLIP = 1
ICVL_JOINTS = 16


def decode_icvl_png(path: str) -> np.ndarray:
    """ICVL ships 16-bit single-channel depth PNGs (mm).

    Native C++ decode when built (awr_tpu/_native handles 16-bit gray
    directly; parity in tests/test_native.py), else cv2."""
    from awr_tpu.data import native_decode

    def _cv2(p):
        return np.asarray(cv2.imread(p, cv2.IMREAD_ANYDEPTH), np.float32)

    return native_decode.decode_or_fallback(path, "gray16", _cv2)


class ICVLDataset(DepthDataset):
    def __init__(self, root: str, phase: str, val: bool = False,
                 img_size: int = 128, aug_para=(10.0, 0.1, 180.0),
                 cube=(250.0, 250.0, 250.0), jt_num: int = ICVL_JOINTS,
                 mode: str = "host", seed: int = 23455):
        assert phase in ("train", "test")
        self.root = root
        self.phase = phase
        self.val = val
        self.img_size = img_size
        self.aug_para = tuple(aug_para)
        self.cube = np.asarray(cube, np.float64)
        self.jt_num = jt_num
        self.mode = mode
        self.paras = ICVL_PARAS
        self.flip = ICVL_FLIP
        self.cropper = CameraCrop(self.paras, self.flip, img_size)
        self.rng = np.random.RandomState(seed)
        self._load()

    def _load(self):
        label_path = os.path.join(self.root, f"labels_{self.phase}.txt")
        center_path = os.path.join(
            self.root, f"center_{self.phase}_refined.txt")
        for p in (label_path, center_path):
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"ICVL file not found: {p} (see module docstring "
                    f"for the expected layout)")
        paths, labels = [], []
        with open(label_path) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) != 1 + self.jt_num * 3:
                    continue
                paths.append(os.path.join(self.root, "Depth", parts[0]))
                labels.append(np.asarray(parts[1:], np.float64)
                              .reshape(self.jt_num, 3))
        self.image_paths = paths
        self.labels_uvd = np.stack(labels) if labels else \
            np.zeros((0, self.jt_num, 3))
        # labels ship in uvd; convert to camera xyz once
        from awr_tpu.geometry import uvd2xyz_np

        self.labels_xyz = uvd2xyz_np(self.labels_uvd, self.paras,
                                     self.flip)
        self.centers = np.loadtxt(center_path, ndmin=2)

    def __len__(self):
        return len(self.image_paths)

    def cube_for(self, index: int) -> np.ndarray:
        return self.cube

    def __getitem__(self, index: int):
        img = decode_icvl_png(self.image_paths[index])
        jt_xyz = self.labels_xyz[index].astype(np.float64).copy()
        center_xyz = self.centers[index].astype(np.float64).copy()
        cube = self.cube_for(index)
        if self.mode == "raw":
            # f64 center/cube preserve the int(x+0.5) crop truncations
            # computed host-side (see nyu.py raw mode)
            return dict(img=img, jt_xyz=jt_xyz.astype(np.float32),
                        center_xyz=center_xyz, cube=cube)
        return self.process(img, jt_xyz, center_xyz, cube)
