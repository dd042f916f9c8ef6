"""Evaluator parity tests (reference util/eval_tool.py) + golden-file
checks against the shipped reference prediction dumps."""

import os
import sys

import numpy as np
import pytest

from awr_tpu.config import NYU_PARAS
from awr_tpu.evaluation import Evaluator, load_prediction_txt
from awr_tpu.geometry import xyz2uvd_np

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
RNG = np.random.RandomState(3)


def synth_eval_inputs(B=16, J=14):
    """Random but geometrically consistent eval inputs."""
    center = np.stack([RNG.uniform(-50, 50, B), RNG.uniform(-40, 40, B),
                       RNG.uniform(650, 950, B)], 1).astype(np.float32)
    cube = np.full((B, 3), 300.0, np.float32)
    # affine crop matrices: scale ~0.6 + integer translations
    M = np.zeros((B, 3, 3), np.float32)
    s = RNG.uniform(0.5, 0.7, B)
    M[:, 0, 0] = s
    M[:, 1, 1] = s
    M[:, 0, 2] = RNG.randint(-150, -50, B)
    M[:, 1, 2] = RNG.randint(-120, -40, B)
    M[:, 2, 2] = 1
    gt_xyz = RNG.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32)
    pred_uvd = RNG.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32)
    return pred_uvd, gt_xyz, center, M, cube


def test_zero_error_when_pred_equals_gt():
    B, J = 8, 14
    center = np.tile(np.array([10.0, -5.0, 800.0], np.float32), (B, 1))
    cube = np.full((B, 3), 300.0, np.float32)
    M = np.tile(np.eye(3, dtype=np.float32) * 0.6, (B, 1, 1))
    M[:, 0, 2] = -100
    M[:, 1, 2] = -80
    M[:, 2, 2] = 1
    gt_xyz = RNG.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32)
    # build the normalized uvd that corresponds exactly to gt
    xyz_mm = gt_xyz * 150.0 + center[:, None, :]
    uvd = np.stack([xyz2uvd_np(x, NYU_PARAS, -1) for x in xyz_mm])
    uv1 = np.concatenate([uvd[..., :2], np.ones_like(uvd[..., :1])], -1)
    uvc = np.einsum("bij,bkj->bki", M, uv1)[..., :2]
    pred = np.concatenate(
        [uvc / (128 / 2.0) - 1,
         ((uvd[..., 2:] - center[:, None, 2:]) / 150.0)], -1
    ).astype(np.float32)

    ev = Evaluator(128, NYU_PARAS, -1, J)
    ev.feed_batch(pred, gt_xyz, center, M, cube)
    mpe, med, auc, pck, th = ev.get_measures()
    assert mpe < 1e-2, mpe
    assert auc > 0.99
    assert pck[-1] == 1.0


@pytest.mark.skipif(not HAS_REF, reason="reference mount not present")
def test_measures_match_reference_evalutil():
    sys.path.insert(0, REF)
    import matplotlib

    matplotlib.use("Agg")
    from util.eval_tool import EvalUtil  # reference code as oracle

    pred, gt, center, M, cube = synth_eval_inputs()
    ours = Evaluator(128, np.asarray(NYU_PARAS), -1, 14)
    ours.feed_batch(pred, gt, center, M, cube)

    ref = EvalUtil(128, np.asarray(NYU_PARAS), -1, 14)
    for i in range(len(pred)):
        ref.feed(pred[i].copy(), gt[i].copy(), center[i].copy(),
                 M[i].copy(), cube[i].copy())
    r_mpe, r_med, r_auc, r_pck, r_th = ref.get_measures()
    o_mpe, o_med, o_auc, o_pck, o_th = ours.get_measures()
    np.testing.assert_allclose(o_mpe, r_mpe, rtol=1e-5)
    np.testing.assert_allclose(o_med, r_med, rtol=1e-5)
    np.testing.assert_allclose(o_auc, r_auc, rtol=1e-5)
    np.testing.assert_allclose(o_pck, r_pck, rtol=1e-5)
    # camera-coordinate prediction accumulation matches too
    np.testing.assert_allclose(
        ours.predictions_uvd, np.asarray(ref.jt_uvd_pred), rtol=1e-4
    )


@pytest.mark.skipif(not HAS_REF, reason="reference mount not present")
def test_golden_prediction_files_load_and_cross_distance():
    """The two shipped dumps (8252 frames x 14 joints, camera uvd) are the
    parity targets; pin their mutual mm distance as a regression anchor."""
    r18 = load_prediction_txt(os.path.join(REF, "results/resnet_18.txt"))
    hg1 = load_prediction_txt(os.path.join(REF, "results/hourglass_1.txt"))
    assert r18.shape == (8252, 14, 3)
    assert hg1.shape == (8252, 14, 3)
    from awr_tpu.geometry import uvd2xyz_np

    a = uvd2xyz_np(r18, NYU_PARAS, -1)
    b = uvd2xyz_np(hg1, NYU_PARAS, -1)
    d = np.sqrt(((a - b) ** 2).sum(-1)).mean()
    # the two reference models agree to ~5mm on average; sanity band
    assert 1.0 < d < 15.0, d


def test_save_predictions_roundtrip(tmp_path):
    pred, gt, center, M, cube = synth_eval_inputs(B=4)
    ev = Evaluator(128, NYU_PARAS, -1, 14)
    ev.feed_batch(pred, gt, center, M, cube)
    p = tmp_path / "dump.txt"
    ev.save_predictions(str(p))
    back = load_prediction_txt(str(p))
    np.testing.assert_allclose(back, ev.predictions_uvd, atol=5e-4)


def test_plot_pck_writes_png(tmp_path):
    pred, gt, center, M, cube = synth_eval_inputs(B=4)
    ev = Evaluator(128, NYU_PARAS, -1, 14)
    ev.feed_batch(pred, gt, center, M, cube)
    p = tmp_path / "pck.png"
    ev.plot_pck(str(p))
    assert p.exists() and p.stat().st_size > 0


def test_vis_renders(tmp_path):
    from awr_tpu.vis import plot_pose, render_pose

    img = np.ones((128, 128), np.float32)
    jt = RNG.uniform(20, 100, (14, 3)).astype(np.float32)
    out = render_pose(img, jt, jt + 2, dataset="nyu")
    assert out.shape == (128, 128, 3)
    p = tmp_path / "pose.png"
    plot_pose(img, str(p), jt)
    assert p.exists() and p.stat().st_size > 0


def test_singular_transmat_per_sample_fallback():
    """One singular M in a batch must not perturb the other samples'
    distances (reference degrades per-sample, eval_tool.py:33-36;
    PARITY.md deviation 10)."""
    pred, gt, center, M, cube = synth_eval_inputs(B=6)

    ev_clean = Evaluator(128, NYU_PARAS, -1, 14)
    ev_clean.feed_batch(pred, gt, center, M, cube)
    clean = ev_clean.distances

    M_bad = M.copy()
    M_bad[2] = 0.0  # singular transmat for sample 2 only
    ev = Evaluator(128, NYU_PARAS, -1, 14)
    ev.feed_batch(pred, gt, center, M_bad, cube)
    mixed = ev.distances

    keep = np.array([0, 1, 3, 4, 5])
    np.testing.assert_array_equal(mixed[keep], clean[keep])
    assert np.isfinite(mixed[2]).all()  # pinv'd, still scores
