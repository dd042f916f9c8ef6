"""End-to-end NYUDataset test against generated NYU-format files:
depth PNGs (blue + green*256 encoding), joint_data.mat, refined-center
txt — the full reference file contract (nyu_loader.py:71-90)."""

import os

import cv2
import numpy as np
import pytest
import scipy.io as sio

from awr_tpu.data.nyu import (
    EVAL_SELECT,
    JOINT_SELECT,
    NYU_FLIP,
    NYU_PARAS,
    NYUDataset,
    decode_depth_png,
)
from awr_tpu.data.synthetic import render_hand_depth
from awr_tpu.geometry import xyz2uvd_np


def write_fake_nyu(root, n_frames=4, seed=0):
    g = np.random.RandomState(seed)
    for phase in ("train", "test"):
        d = os.path.join(root, phase)
        os.makedirs(d, exist_ok=True)
        centers = []
        # full 36-joint label tensors; our 14 come via JOINT/EVAL selection
        xyz36 = np.zeros((n_frames, 36, 3))
        uvd36 = np.zeros((n_frames, 36, 3))
        for i in range(n_frames):
            center = np.array([g.uniform(-50, 50), g.uniform(-40, 40),
                               g.uniform(700, 900)])
            jt = center[None] + g.uniform(-60, 60, (36, 3))
            jt[:, 2] = center[2] + g.uniform(-40, 40, 36)
            # render the 14 joints the loader actually selects so the
            # labels describe visible geometry
            depth = render_hand_depth(
                center, jt[JOINT_SELECT][EVAL_SELECT], NYU_PARAS)
            # encode as NYU PNG: b = depth % 256, g = depth // 256
            dep = depth.astype(np.uint16)
            img = np.zeros((*depth.shape, 3), np.uint8)
            img[:, :, 0] = (dep % 256).astype(np.uint8)
            img[:, :, 1] = (dep // 256).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"depth_1_{i:07d}.png"), img)
            xyz36[i] = jt
            uvd36[i] = xyz2uvd_np(jt, NYU_PARAS, NYU_FLIP)
            centers.append(center)
        sio.savemat(os.path.join(d, "joint_data.mat"),
                    {"joint_uvd": uvd36[None], "joint_xyz": xyz36[None]})
        np.savetxt(os.path.join(root, f"center_{phase}_refined.txt"),
                   np.asarray(centers))
    return root


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    return write_fake_nyu(str(tmp_path_factory.mktemp("nyu")))


def test_png_roundtrip(nyu_root):
    p = os.path.join(nyu_root, "test", "depth_1_0000000.png")
    depth = decode_depth_png(p)
    assert depth.shape == (480, 640)
    assert depth.max() > 500  # mm depths survived the b+g*256 encoding


def test_dataset_items(nyu_root):
    ds = NYUDataset(nyu_root, "test", img_size=128)
    assert len(ds) == 4
    item = ds[0]
    assert item["img"].shape == (128, 128)
    assert -1 <= item["img"].min() and item["img"].max() <= 1
    assert item["jt_uvd"].shape == (14, 3)
    # foreground must exist in the crop
    assert (item["img"] < 0.99).mean() > 0.01


def test_joint_selection_tables(nyu_root):
    ds = NYUDataset(nyu_root, "test", img_size=128)
    # labels went through 36 -> 23 -> 14 selection
    assert ds.labels_xyz.shape == (4, 14, 3)
    assert len(JOINT_SELECT) == 23 and len(EVAL_SELECT) == 14


def test_second_subject_cube_rule(nyu_root):
    ds = NYUDataset(nyu_root, "test", img_size=128)
    # only 4 frames here, so all cubes full-size; check rule boundary math
    assert np.allclose(ds.test_cube[0], 300.0)
    full = np.ones((8252, 3)) * 300.0
    full[2440:] *= 5.0 / 6.0
    assert np.allclose(full[2439], 300.0) and np.allclose(full[2440], 250.0)


def test_train_mode_augments(nyu_root):
    ds = NYUDataset(nyu_root, "train", img_size=128)
    item = ds[1]
    assert np.isfinite(item["jt_uvd"]).all()
    assert item["img"].shape == (128, 128)


def test_raw_mode_and_trainer_eval(nyu_root, tmp_path):
    from awr_tpu.config import Config
    from awr_tpu.training.trainer import Trainer

    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=128,
                 batch_size=4, vis_freq=0, use_pallas=False,
                 print_freq=1000)
    ds = NYUDataset(nyu_root, "test", img_size=128)
    tr = Trainer(cfg, test_data=ds, workdir=str(tmp_path / "w"))
    mpe, auc = tr.test(epoch=1)
    assert np.isfinite(mpe)
    tr.close()
