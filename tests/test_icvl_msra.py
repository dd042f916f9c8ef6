"""ICVL/MSRA loaders against generated files in each dataset's standard
layout (the reference only configures these datasets; loaders are
additive capability — format assumptions documented in the modules)."""

import os
import struct

import cv2
import numpy as np
import pytest

from awr_tpu.data.icvl import ICVL_PARAS, ICVLDataset
from awr_tpu.data.msra import MSRA_PARAS, MSRADataset, decode_msra_bin
from awr_tpu.data.synthetic import render_hand_depth
from awr_tpu.geometry import xyz2uvd_np


def write_fake_icvl(root, n=3, seed=0):
    g = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "Depth", "seq"), exist_ok=True)
    for phase in ("train", "test"):
        lines, centers = [], []
        for i in range(n):
            center = np.array([g.uniform(-40, 40), g.uniform(-30, 30),
                               g.uniform(350, 450)])
            jt = center[None] + g.uniform(-40, 40, (16, 3))
            jt[:, 2] = center[2] + g.uniform(-25, 25, 16)
            depth = render_hand_depth(center, jt, ICVL_PARAS,
                                      shape=(240, 320), radii=None)
            rel = f"seq/{phase}_{i}.png"
            cv2.imwrite(os.path.join(root, "Depth", rel),
                        depth.astype(np.uint16))
            uvd = xyz2uvd_np(jt, ICVL_PARAS, 1)
            lines.append(rel + " " + " ".join(
                f"{v:.3f}" for v in uvd.reshape(-1)))
            centers.append(center)
        with open(os.path.join(root, f"labels_{phase}.txt"), "w") as fh:
            fh.write("\n".join(lines))
        np.savetxt(os.path.join(root, f"center_{phase}_refined.txt"),
                   np.asarray(centers))
    return root


def write_fake_msra(root, subjects=2, gestures=("1", "Y"), n=2, seed=0):
    g = np.random.RandomState(seed)
    for s in range(subjects):
        for gesture in gestures:
            gdir = os.path.join(root, f"P{s}", gesture)
            os.makedirs(gdir, exist_ok=True)
            joints = []
            for i in range(n):
                center = np.array([g.uniform(-40, 40),
                                   g.uniform(-30, 30),
                                   g.uniform(350, 450)])
                jt = center[None] + g.uniform(-35, 35, (21, 3))
                jt[:, 2] = center[2] + g.uniform(-25, 25, 21)
                depth = render_hand_depth(center, jt, MSRA_PARAS,
                                          shape=(240, 320))
                ys, xs = np.nonzero(depth > 0)
                top, bottom = ys.min(), ys.max() + 1
                left, right = xs.min(), xs.max() + 1
                with open(os.path.join(gdir, f"{i:06d}_depth.bin"),
                          "wb") as fh:
                    fh.write(struct.pack("<6i", 320, 240, left, top,
                                         right, bottom))
                    fh.write(depth[top:bottom, left:right]
                             .astype(np.float32).tobytes())
                raw = jt.copy()
                raw[:, 2] *= -1  # raw files store negative z
                joints.append(raw.reshape(-1))
            with open(os.path.join(gdir, "joint.txt"), "w") as fh:
                fh.write(f"{n}\n")
                np.savetxt(fh, np.asarray(joints))
    return root


@pytest.fixture(scope="module")
def icvl_root(tmp_path_factory):
    return write_fake_icvl(str(tmp_path_factory.mktemp("icvl")))


@pytest.fixture(scope="module")
def msra_root(tmp_path_factory):
    return write_fake_msra(str(tmp_path_factory.mktemp("msra")))


def test_icvl_items(icvl_root):
    ds = ICVLDataset(icvl_root, "test", img_size=128)
    assert len(ds) == 3
    item = ds[0]
    assert item["img"].shape == (128, 128)
    assert item["jt_uvd"].shape == (16, 3)
    assert (item["img"] < 0.99).mean() > 0.01  # hand present in crop
    assert np.abs(item["jt_uvd"]).max() < 1.5


def test_icvl_train_augments(icvl_root):
    ds = ICVLDataset(icvl_root, "train", img_size=128)
    item = ds[1]
    assert np.isfinite(item["jt_uvd"]).all()


def test_msra_bin_roundtrip(msra_root):
    p = os.path.join(msra_root, "P0", "1", "000000_depth.bin")
    img = decode_msra_bin(p)
    assert img.shape == (240, 320)
    assert img.max() > 300


def test_msra_leave_one_out_split(msra_root):
    test = MSRADataset(msra_root, "test", test_subject=0, allow_centroid_centers=True)
    train = MSRADataset(msra_root, "train", test_subject=0, allow_centroid_centers=True)
    assert len(test) == 4  # P0: 2 gestures x 2 frames
    assert len(train) == 4  # P1
    assert all("P0" in p for p in test.image_paths)
    assert all("P0" not in p for p in train.image_paths)


def test_msra_items(msra_root):
    ds = MSRADataset(msra_root, "test", test_subject=0, img_size=128, allow_centroid_centers=True)
    item = ds[0]
    assert item["img"].shape == (128, 128)
    assert item["jt_uvd"].shape == (21, 3)
    assert (item["img"] < 0.99).mean() > 0.01
    assert np.abs(item["jt_uvd"]).max() < 1.5


def write_fake_hands17(root, n=3, seed=0):
    from awr_tpu.data.hands17 import HANDS17_PARAS

    g = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    lines = []
    for i in range(n):
        center = np.array([g.uniform(-60, 60), g.uniform(-40, 40),
                           g.uniform(450, 600)])
        jt = center[None] + g.uniform(-45, 45, (21, 3))
        jt[:, 2] = center[2] + g.uniform(-30, 30, 21)
        depth = render_hand_depth(center, jt, HANDS17_PARAS,
                                  shape=(480, 640))
        name = f"image_D{i:08d}.png"
        cv2.imwrite(os.path.join(root, "images", name),
                    depth.astype(np.uint16))
        lines.append(name + "\t" + "\t".join(
            f"{v:.6f}" for v in jt.reshape(-1)))
    with open(os.path.join(root, "Training_Annotation.txt"), "w") as fh:
        fh.write("\n".join(lines))
    return root


def test_hands17_items(tmp_path_factory):
    from awr_tpu.data.hands17 import Hands17Dataset

    root = write_fake_hands17(str(tmp_path_factory.mktemp("hands17")))
    ds = Hands17Dataset(root, "train", allow_centroid_centers=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["img"].shape == (128, 128)
    assert item["jt_uvd"].shape == (21, 3)
    assert (item["img"] < 0.99).mean() > 0.01
    assert np.isfinite(item["jt_uvd"]).all()


def test_centroid_fallback_requires_flag(msra_root, tmp_path_factory):
    """Missing refined centers must be loud: error without the flag,
    warning with it (PARITY.md deviation 9)."""
    from awr_tpu.data.hands17 import Hands17Dataset

    with pytest.raises(FileNotFoundError, match="refined hand centers"):
        MSRADataset(msra_root, "test", test_subject=0)
    with pytest.warns(UserWarning, match="CENTROID"):
        ds = MSRADataset(msra_root, "test", test_subject=0,
                         allow_centroid_centers=True)
    np.testing.assert_allclose(ds.centers, ds.labels_xyz.mean(axis=1))

    h_root = write_fake_hands17(
        str(tmp_path_factory.mktemp("hands17_flag")))
    with pytest.raises(FileNotFoundError, match="refined hand centers"):
        Hands17Dataset(h_root, "train")


def test_msra_trainer_eval(msra_root, tmp_path):
    from awr_tpu.config import Config
    from awr_tpu.training.trainer import Trainer

    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=64,
                 batch_size=4, vis_freq=0, use_pallas=False,
                 print_freq=1000, jt_num=21, dataset="msra",
                 cube=(200.0, 200.0, 200.0))
    ds = MSRADataset(msra_root, "test", test_subject=0, img_size=64, allow_centroid_centers=True)
    tr = Trainer(cfg, test_data=ds, workdir=str(tmp_path / "w"))
    mpe, auc = tr.test(epoch=1)
    assert np.isfinite(mpe)
    tr.close()
