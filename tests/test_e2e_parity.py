"""Golden end-to-end inference parity: the reference's full test-time
math (torch net -> FeatureModule.offset2joint_softmax) vs our jitted
infer path (flax forward -> decode) under identical imported weights and
identical inputs.  Catches layout/glue regressions the per-layer parity
tests can't see."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
pytestmark = pytest.mark.skipif(not HAS_REF,
                                reason="reference mount not present")

if HAS_REF:
    sys.path.insert(0, REF)


def test_resnet18_full_inference_parity():
    import torch

    from model.resnet_deconv import get_deconv_net as ref_factory
    from util.feature_tool import FeatureModule

    import jax
    from awr_tpu.models import get_deconv_net
    from awr_tpu.models.torch_import import import_reference_weights
    from awr_tpu.ops.decode import decode_offsets
    from tests.test_torch_import import randomize_state_dict

    kernel = 1.0
    ref = ref_factory(18, 14, 2)
    ref.eval()
    sd = randomize_state_dict(ref, seed=99)
    variables = import_reference_weights("resnet_18", sd, downsample=2)
    model = get_deconv_net(18, 14, 2)

    # synthetic normalized depth batch (bg=1, blob of foreground)
    g = np.random.RandomState(5)
    img = np.ones((2, 128, 128), np.float32)
    img[:, 40:100, 30:90] = g.uniform(-0.9, 0.6,
                                      (2, 60, 60)).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(img[:, None])
        offset = ref(t_in)
        jt_ref = FeatureModule().offset2joint_softmax(offset, t_in,
                                                      kernel).numpy()

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, img[..., None], train=False)
        jt = np.asarray(decode_offsets(out, img, kernel,
                                       use_pallas=False))

    np.testing.assert_allclose(jt, jt_ref, rtol=1e-4, atol=1e-4)


def test_hourglass_full_inference_parity():
    import torch

    from model.hourglass import PoseNet as RefPoseNet
    from util.feature_tool import FeatureModule

    import jax
    from awr_tpu.models import PoseNet
    from awr_tpu.models.torch_import import import_reference_weights
    from awr_tpu.ops.decode import decode_offsets
    from tests.test_torch_import import randomize_state_dict

    kernel = 0.4
    ref = RefPoseNet("hourglass_1", 14)
    ref.eval()
    sd = randomize_state_dict(ref, seed=77)
    variables = import_reference_weights("hourglass_1", sd)
    model = PoseNet(nstack=1, joint_num=14)

    g = np.random.RandomState(6)
    img = np.ones((1, 128, 128), np.float32)
    img[:, 30:100, 40:110] = g.uniform(-0.9, 0.6,
                                       (1, 70, 70)).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(img[:, None])
        offset = ref(t_in)[-1]  # last stack (reference test.py:74-77)
        jt_ref = FeatureModule().offset2joint_softmax(offset, t_in,
                                                      kernel).numpy()

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, img[..., None], train=False)
        jt = np.asarray(decode_offsets(out[-1], img, kernel,
                                       use_pallas=False))

    np.testing.assert_allclose(jt, jt_ref, rtol=1e-4, atol=1e-4)


def test_hourglass2_eval_loss_sums_stacks_oracle():
    """Eval-loss parity for nstack=2: the reference eval loop sums the
    per-stack coord+offset losses over BOTH stacks (test.py:74-87).  Our
    eval_step (one shared forward) must report the same total under
    imported weights."""
    import torch

    from model.hourglass import PoseNet as RefPoseNet
    from model.loss import My_SmoothL1Loss
    from util.feature_tool import FeatureModule

    import jax
    from awr_tpu.config import hourglass_config
    from awr_tpu.models import PoseNet
    from awr_tpu.models.torch_import import import_reference_weights
    from awr_tpu.training.steps import make_eval_step
    from tests.test_torch_import import randomize_state_dict

    kernel, feat, B, J = 0.4, 64, 2, 14
    coord_w, dense_w = 1.0, 1.0
    ref = RefPoseNet("hourglass_2", J)
    ref.eval()
    sd = randomize_state_dict(ref, seed=31)
    variables = import_reference_weights("hourglass_2", sd)
    model = PoseNet(nstack=2, joint_num=J)

    g = np.random.RandomState(11)
    img = np.ones((B, 128, 128), np.float32)
    img[:, 30:110, 25:105] = g.uniform(-0.9, 0.7,
                                       (B, 80, 80)).astype(np.float32)
    jt_gt = g.uniform(-0.6, 0.6, (B, J, 3)).astype(np.float32)

    with torch.no_grad():
        t_img = torch.from_numpy(img[:, None])
        t_gt = torch.from_numpy(jt_gt)
        FM, crit = FeatureModule(), My_SmoothL1Loss()
        offset_gt = FM.joint2offset(t_gt, t_img, kernel, feat)
        loss_ref = 0.0
        for s in range(2):
            offset_pred = ref(t_img)[s]
            jt_pred = FM.offset2joint_softmax(offset_pred, t_img, kernel)
            loss_ref += (coord_w * crit(jt_pred, t_gt)
                         + dense_w * crit(offset_pred, offset_gt))
        loss_ref = float(loss_ref)

    cfg = hourglass_config(2, coord_weight=coord_w, dense_weight=dense_w,
                           use_pallas=False)
    eval_step = make_eval_step(model, cfg)
    with jax.default_matmul_precision("highest"):
        m = eval_step(variables["params"], variables["batch_stats"],
                      dict(img=img, jt_uvd=jt_gt))
    np.testing.assert_allclose(float(m["loss"]), loss_ref,
                               rtol=2e-4, atol=2e-4)
