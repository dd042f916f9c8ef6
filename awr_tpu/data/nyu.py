"""NYU hand dataset: file decoding, joint selection, and the per-sample
host pipeline.

Reference parity: dataloader/nyu_loader.py — depth PNGs decode as
``blue + green*256`` (ref :71-74), 36->23->14 joint selection via the
JOINT/EVAL index tables (ref :9-11,85-86), intrinsics (588.03, 587.07,
320, 240) with y-flip (ref :23,34), test cubes shrunk x5/6 from frame
2440 on (second subject, ref :32-33), refined hand centers from
``center_{split}_refined.txt`` (ref :81,87), and the crop -> augment ->
normalize -> label-normalize item pipeline (ref :38-66).

Two item modes:
- ``mode='host'``: full reference-exact pipeline on CPU (crop, one-of-four
  augmentation, normalize) -> ready-to-train normalized tensors.
- ``mode='raw'``: decode-only; returns the raw (480, 640) frame + labels
  so the fused device pipeline (:mod:`awr_tpu.data.device`) does the rest
  on-TPU.
"""

from __future__ import annotations

import os
from glob import glob

import cv2
import numpy as np

from awr_tpu.data.base import DepthDataset
from awr_tpu.data.transforms import CameraCrop

# 36 -> 23 keep list, then 23 -> 14 eval list (reference nyu_loader.py:9-11).
JOINT_SELECT = np.array(
    [0, 1, 3, 5, 6, 7, 9, 11, 12, 13, 15, 17, 18, 19, 21, 23, 24, 25, 27,
     28, 32, 30, 31]
)
EVAL_SELECT = np.array([0, 2, 4, 6, 8, 10, 12, 14, 16, 17, 18, 21, 22, 20])

NYU_PARAS = (588.03, 587.07, 320.0, 240.0)
NYU_FLIP = -1
# Frames >= this index in the test split are the second subject with a
# smaller hand: cube scaled by 5/6 (reference nyu_loader.py:32-33).
SECOND_SUBJECT_START = 2440


def decode_depth_png(path: str) -> np.ndarray:
    """NYU PNG encoding: depth mm = blue + green * 256 (reference :71-74).

    Uses the native C++ decoder (awr_tpu/_native, GIL-releasing; exact
    parity asserted in tests/test_native.py) when built, else cv2.
    (Channels widened before the arithmetic: numpy 2 rejects the
    reference's uint8 * 256 under NEP 50 promotion.)
    """
    from awr_tpu.data import native_decode

    def _cv2(p):
        img = cv2.imread(p)
        return (img[:, :, 0].astype(np.float32)
                + img[:, :, 1].astype(np.float32) * 256.0)

    return native_decode.decode_or_fallback(path, "nyu", _cv2)


class NYUDataset(DepthDataset):
    """Iterable/indexable NYU split (no torch dependency)."""

    def __init__(self, root: str, phase: str, val: bool = False,
                 img_size: int = 128,
                 aug_para=(10.0, 0.1, 180.0),
                 cube=(300.0, 300.0, 300.0),
                 jt_num: int = 14,
                 mode: str = "host",
                 seed: int = 23455):
        assert phase in ("train", "test")
        assert mode in ("host", "raw")
        self.root = root
        self.phase = phase
        self.val = val
        self.img_size = img_size
        self.aug_para = tuple(aug_para)
        self.cube = np.asarray(cube, np.float64)
        self.jt_num = jt_num
        self.mode = mode
        self.paras = NYU_PARAS
        self.flip = NYU_FLIP
        self.cropper = CameraCrop(self.paras, self.flip, img_size)
        # Reference seeds a module-level RandomState(23455) (loader.py:11).
        self.rng = np.random.RandomState(seed)

        self.image_paths, self.labels_uvd, self.labels_xyz, self.centers = (
            self._make_dataset()
        )
        n = len(self.image_paths)
        self.test_cube = np.ones((n, 3)) * self.cube
        if phase == "test":
            self.test_cube[SECOND_SUBJECT_START:] *= 5.0 / 6.0

    def _make_dataset(self):
        """File discovery + label decode (reference nyu_loader.py:76-90)."""
        import scipy.io as sio

        data_path = os.path.join(self.root, self.phase)
        label_path = os.path.join(data_path, "joint_data.mat")
        center_path = os.path.join(
            self.root, f"center_{self.phase}_refined.txt"
        )
        for p, what in ((data_path, "split directory"),
                        (label_path, "joint_data.mat ground truth"),
                        (center_path, "refined hand centers")):
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"NYU {what} not found at {p}; expected the reference "
                    f"layout <root>/{{train,test}}/depth_1*.png + "
                    f"joint_data.mat and <root>/center_{{split}}_refined"
                    f".txt (see README).  For offline runs use "
                    f"--synthetic / SyntheticHandDataset.")
        paths = sorted(glob(os.path.join(data_path, "depth_1*.png")))
        labels = sio.loadmat(label_path)
        uvd = labels["joint_uvd"][0][:, JOINT_SELECT, :][:, EVAL_SELECT, :]
        xyz = labels["joint_xyz"][0][:, JOINT_SELECT, :][:, EVAL_SELECT, :]
        centers = np.loadtxt(center_path)
        return paths, uvd, xyz, centers

    def __len__(self):
        return len(self.image_paths)

    def cube_for(self, index: int) -> np.ndarray:
        return (self.test_cube[index] if self.phase == "test"
                else self.cube).astype(np.float64)

    def __getitem__(self, index: int):
        img = decode_depth_png(self.image_paths[index])
        jt_xyz = self.labels_xyz[index].astype(np.float64).copy()
        center_xyz = self.centers[index].astype(np.float64).copy()
        cube = self.cube_for(index)
        if self.mode == "raw":
            # center/cube stay float64: the fused device path computes
            # crop params HOST-side in f64 (trainer._raw_inputs) and the
            # reference's int(x+0.5) truncations can flip under f32
            # quantization on boundary samples (ADVICE r1).
            return dict(
                img=img,
                jt_xyz=jt_xyz.astype(np.float32),
                center_xyz=center_xyz,
                cube=cube,
            )
        return self.process(img, jt_xyz, center_xyz, cube)
