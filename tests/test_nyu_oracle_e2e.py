"""Ultimate data-path parity: iterate the reference's NYU Dataset class
(imported as a black-box oracle) and our NYUDataset over the SAME
generated NYU-format files with the SAME RNG seed, and require
item-for-item equality through the full decode -> crop -> augment ->
normalize -> label pipeline."""

import os
import sys

import numpy as np
import pytest

from awr_tpu.data.nyu import NYUDataset
from tests.test_nyu_files import write_fake_nyu

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
pytestmark = pytest.mark.skipif(not HAS_REF,
                                reason="reference mount not present")

if HAS_REF:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    return write_fake_nyu(str(tmp_path_factory.mktemp("nyu_oracle")),
                          n_frames=6, seed=3)


@pytest.mark.parametrize("phase", ["test", "train"])
def test_item_pipeline_matches_reference(nyu_root, phase):
    from dataloader.nyu_loader import NYU as RefNYU  # oracle

    ref = RefNYU(nyu_root, phase, img_size=128,
                 aug_para=[10, 0.1, 180], cube=[300, 300, 300])
    # the reference's own uint8*256 decode overflows under numpy 2
    # (NEP 50); substitute the numerically identical widened decode
    from awr_tpu.data.nyu import decode_depth_png

    ref.nyu_reader = decode_depth_png
    ours = NYUDataset(nyu_root, phase, img_size=128,
                      aug_para=(10, 0.1, 180), cube=(300, 300, 300))
    assert len(ref) == len(ours) == 6
    for i in range(len(ours)):
        r_img, r_xyz, r_uvd, r_center, r_M, r_cube = ref[i]
        item = ours[i]
        # both sides consumed one augmentation draw per item in the same
        # order from RandomState(23455), so everything must match
        np.testing.assert_allclose(item["img"], np.squeeze(r_img, 0),
                                   atol=1e-5)
        np.testing.assert_allclose(item["jt_xyz"], r_xyz, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(item["jt_uvd"], r_uvd, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(item["center_xyz"], r_center,
                                   rtol=1e-5)
        np.testing.assert_allclose(item["M"], r_M, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(item["cube"], r_cube, rtol=1e-6)
