"""Data pipeline tests: host path parity against the upstream reference
implementation (used as a black-box oracle when mounted), and host vs
fused-device equality."""

import os
import sys

import numpy as np
import pytest

from awr_tpu.data.synthetic import SyntheticHandDataset, render_hand_depth
from awr_tpu.data.transforms import CameraCrop
from awr_tpu.data.nyu import NYU_FLIP, NYU_PARAS
from awr_tpu.geometry import xyz2uvd_np

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

RNG = np.random.RandomState(7)


def sample_scene(seed=0):
    g = np.random.RandomState(seed)
    center = np.array([g.uniform(-60, 60), g.uniform(-40, 40),
                       g.uniform(650, 950)])
    jt = center[None] + g.uniform(-60, 60, (14, 3))
    jt[:, 2] = center[2] + g.uniform(-40, 40, 14)
    img = render_hand_depth(center, jt, NYU_PARAS)
    return img, jt, center


def make_ref_loader():
    sys.path.insert(0, REF)
    from dataloader.loader import Loader  # reference code as oracle

    ref = Loader.__new__(Loader)
    ref.seed = np.random.RandomState(23455)
    ref.img_size = 128
    ref.paras = np.asarray(NYU_PARAS)
    ref.flip = NYU_FLIP
    ref.aug_ops = ["trans", "scale", "rot", None]
    return ref


@pytest.mark.skipif(not HAS_REF, reason="reference mount not present")
class TestAgainstReferenceOracle:
    def test_crop_and_transmat(self):
        ref = make_ref_loader()
        ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
        for seed in range(5):
            img, jt, center = sample_scene(seed)
            center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
                np.float64)
            cube = np.array([300.0, 300.0, 300.0])
            ref_img, ref_M = ref.crop(img.copy(), center_uvd, cube,
                                      np.array([128, 128]))
            our_img, our_M = ours.crop(img.copy(), center_uvd, cube, 128)
            np.testing.assert_allclose(our_M, ref_M, rtol=1e-5)
            np.testing.assert_array_equal(our_img, ref_img)

    def test_normalize(self):
        ref = make_ref_loader()
        ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
        img, jt, center = sample_scene(3)
        center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
            np.float64)
        cube = np.array([300.0, 300.0, 300.0])
        crop, _ = ours.crop(img, center_uvd, cube, 128)
        got = ours.normalize(crop.max(), crop, center_uvd[2], cube[2])
        exp = ref.normalize(crop.max(), crop.copy(), center_uvd, cube)
        np.testing.assert_allclose(got, exp, atol=1e-6)
        assert got.min() >= -1 - 1e-6 and got.max() <= 1 + 1e-6

    @pytest.mark.parametrize("op", ["trans", "scale", "rot", None])
    def test_augment_ops(self, op):
        ref = make_ref_loader()
        ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
        img, jt, center = sample_scene(11)
        center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
            np.float64)
        cube = np.array([300.0, 300.0, 300.0])
        jt_rel = jt - center
        crop, M = ours.crop(img, center_uvd, cube, 128)
        trans, scale, rot = np.array([8.0, -5.0, 6.0]), 1.07, 33.0

        r_img, r_jt, r_cube, r_center, r_M = ref.augment(
            crop.copy(), jt_rel.copy(), center_uvd.copy(), cube.copy(),
            M.copy(), op, trans, scale, rot)
        o_img, o_jt, o_cube, o_center, o_M = ours.augment(
            crop.copy(), jt_rel.copy(), center_uvd.copy(), cube.copy(),
            M.copy(), op, trans, scale, rot)
        np.testing.assert_allclose(o_jt, r_jt, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(o_cube, r_cube, rtol=1e-6)
        np.testing.assert_allclose(o_center, r_center, rtol=1e-5)
        np.testing.assert_allclose(o_M, r_M, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(o_img, r_img, atol=1e-5)

    def test_random_aug_stream_parity(self):
        """Same RandomState stream -> identical (op, trans, scale, rot)."""
        ref = make_ref_loader()
        ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
        rng = np.random.RandomState(23455)
        for _ in range(20):
            r = ref.random_aug(10.0, 0.1, 180.0)
            o = ours.random_aug(rng, 10.0, 0.1, 180.0)
            assert r[0] == o[0]
            np.testing.assert_allclose(r[1], o[1])
            np.testing.assert_allclose(r[2:], o[2:])


def border_scene(seed=0):
    """Hand centered near the image corner: crop bounds go negative /
    beyond the frame, exercising the slice-and-pad paths."""
    g = np.random.RandomState(seed)
    # NYU flip=-1: positive y projects toward small v
    center = np.array([g.uniform(-260, -220), g.uniform(120, 190),
                       g.uniform(650, 800)])
    jt = center[None] + g.uniform(-50, 50, (14, 3))
    jt[:, 2] = center[2] + g.uniform(-30, 30, 14)
    img = render_hand_depth(center, jt, NYU_PARAS)
    return img, jt, center


@pytest.mark.skipif(not HAS_REF, reason="reference mount not present")
def test_border_crop_matches_reference_oracle():
    from tests.test_data import make_ref_loader  # self-import for clarity

    ref = make_ref_loader()
    ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
    for seed in (0, 1, 2):
        img, jt, center = border_scene(seed)
        center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
            np.float64)
        assert center_uvd[0] < 150 and center_uvd[1] < 150  # near corner
        cube = np.array([300.0, 300.0, 300.0])
        ref_img, ref_M = ref.crop(img.copy(), center_uvd, cube,
                                  np.array([128, 128]))
        our_img, our_M = ours.crop(img.copy(), center_uvd, cube, 128)
        np.testing.assert_allclose(our_M, ref_M, rtol=1e-5)
        np.testing.assert_array_equal(our_img, ref_img)


def test_border_crop_device_matches_host():
    import jax.numpy as jnp
    from awr_tpu.data.device import crop_normalize_batch

    ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
    imgs, centers, cubes, host_imgs = [], [], [], []
    for seed in (0, 1, 2):
        img, jt, center = border_scene(seed)
        center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
            np.float64)
        cube = np.array([300.0, 300.0, 300.0])
        crop, _ = ours.crop(img, center_uvd, cube, 128)
        host_imgs.append(ours.normalize(crop.max(), crop, center_uvd[2],
                                        cube[2]))
        imgs.append(img)
        centers.append(center_uvd)
        cubes.append(cube)
    dev_imgs, _ = crop_normalize_batch(
        jnp.asarray(np.stack(imgs)),
        jnp.asarray(np.stack(centers), jnp.float32),
        jnp.asarray(np.stack(cubes), jnp.float32),
        jnp.asarray(NYU_PARAS), 128)
    np.testing.assert_allclose(np.asarray(dev_imgs),
                               np.stack(host_imgs), atol=1e-6)


class TestDevicePath:
    def test_crop_normalize_batch_matches_host(self):
        import jax.numpy as jnp
        from awr_tpu.data.device import crop_normalize_batch

        ours = CameraCrop(NYU_PARAS, NYU_FLIP, 128)
        imgs, centers, cubes, host_imgs, host_Ms = [], [], [], [], []
        for seed in range(4):
            img, jt, center = sample_scene(seed + 20)
            center_uvd = xyz2uvd_np(center, NYU_PARAS, NYU_FLIP).astype(
                np.float64)
            cube = np.array([300.0, 300.0, 300.0])
            crop, M = ours.crop(img, center_uvd, cube, 128)
            host_imgs.append(ours.normalize(crop.max(), crop,
                                            center_uvd[2], cube[2]))
            host_Ms.append(M)
            imgs.append(img)
            centers.append(center_uvd)
            cubes.append(cube)
        dev_imgs, dev_Ms = crop_normalize_batch(
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(centers), jnp.float32),
            jnp.asarray(np.stack(cubes), jnp.float32),
            jnp.asarray(NYU_PARAS), 128)
        np.testing.assert_allclose(np.asarray(dev_Ms), np.stack(host_Ms),
                                   rtol=1e-4)
        # NEAREST + host-exact integer bounds -> bit-identical
        np.testing.assert_allclose(np.asarray(dev_imgs),
                                   np.stack(host_imgs), atol=1e-6)

    def test_train_preprocess_noaug_matches_host_pipeline(self):
        """With aug op forced to 'none', the device train path must equal
        the host test path exactly (image and labels)."""
        import jax.numpy as jnp
        from awr_tpu.data.device import train_preprocess_batch
        from awr_tpu.data.synthetic import SyntheticHandDataset

        ds = SyntheticHandDataset(num_samples=3, phase="test", seed=7)
        imgs, jts, centers_uvd, host_items = [], [], [], []
        for i in range(len(ds)):
            img, jt, center = ds.raw_item(i)
            imgs.append(img)
            jts.append(jt)
            centers_uvd.append(
                xyz2uvd_np(center, NYU_PARAS, NYU_FLIP))
            host_items.append(ds[i])
        B = len(ds)
        params = (np.full(B, 3, np.int32), np.zeros((B, 3), np.float32),
                  np.ones(B, np.float32), np.zeros(B, np.float32))
        out = train_preprocess_batch(
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(jts), jnp.float32),
            jnp.asarray(np.stack(centers_uvd), jnp.float32),
            jnp.asarray(np.full((B, 3), 300.0), jnp.float32),
            jnp.asarray(NYU_PARAS),
            tuple(jnp.asarray(p) for p in params), 128, NYU_FLIP)
        for i, item in enumerate(host_items):
            np.testing.assert_allclose(np.asarray(out["img"])[i],
                                       item["img"], atol=1e-5)
            np.testing.assert_allclose(np.asarray(out["jt_uvd"])[i],
                                       item["jt_uvd"], rtol=2e-3,
                                       atol=2e-3)
            np.testing.assert_allclose(np.asarray(out["jt_xyz"])[i],
                                       item["jt_xyz"], rtol=2e-3,
                                       atol=2e-3)
            np.testing.assert_allclose(np.asarray(out["M"])[i],
                                       item["M"], rtol=1e-4)

    def test_train_preprocess_batch_runs_and_labels_consistent(self):
        import jax
        import jax.numpy as jnp
        from awr_tpu.data.device import (draw_augment_params,
                                         train_preprocess_batch)

        B = 4
        imgs, jts, centers, cubes = [], [], [], []
        for seed in range(B):
            img, jt, center = sample_scene(seed + 40)
            imgs.append(img)
            jts.append(jt)
            centers.append(xyz2uvd_np(center, NYU_PARAS, NYU_FLIP))
            cubes.append([300.0, 300.0, 300.0])
        params = draw_augment_params(jax.random.PRNGKey(0), B)
        out = train_preprocess_batch(
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(jts), jnp.float32),
            jnp.asarray(np.stack(centers), jnp.float32),
            jnp.asarray(np.stack(cubes), jnp.float32),
            jnp.asarray(NYU_PARAS), params, 128, NYU_FLIP)
        assert out["img"].shape == (B, 128, 128)
        img = np.asarray(out["img"])
        assert img.min() >= -1 - 1e-5 and img.max() <= 1 + 1e-5
        # normalized uv labels should mostly be inside the crop
        uv = np.asarray(out["jt_uvd"])[..., :2]
        assert (np.abs(uv) < 1.3).mean() > 0.9
        assert np.isfinite(np.asarray(out["M"])).all()


class TestSyntheticDataset:
    def test_host_items_and_batches(self):
        ds = SyntheticHandDataset(num_samples=6, phase="test")
        item = ds[0]
        assert item["img"].shape == (128, 128)
        assert item["jt_uvd"].shape == (14, 3)
        assert item["img"].min() >= -1 and item["img"].max() <= 1
        # joints should be within the normalized cube (roughly)
        assert np.abs(item["jt_uvd"]).max() < 1.5
        batches = list(ds.batches(4))
        assert batches[0]["img"].shape == (4, 128, 128)
        assert batches[1]["img"].shape == (2, 128, 128)

    def test_train_mode_augments(self):
        ds = SyntheticHandDataset(num_samples=4, phase="train")
        item = ds[0]
        assert item["img"].shape == (128, 128)
        assert np.isfinite(item["jt_uvd"]).all()

    def test_raw_mode(self):
        ds = SyntheticHandDataset(num_samples=2, mode="raw")
        item = ds[0]
        assert item["img"].shape == (480, 640)
        assert item["cube"].shape == (3,)
