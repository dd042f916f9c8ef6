"""Post-training int8 inference (awr_tpu/models/quant.py).

Beyond-reference capability (reference is fp32 CUDA only); the bar is
our own contract: identical param trees across quant modes, fp-exact
'calib' forward, a quantized forward whose decoded joints stay close to
the fp32 forward, and working calibration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from awr_tpu.models import build_model
from awr_tpu.models.quant import (
    QuantConv,
    QuantConvTranspose,
    calibrate,
)
from awr_tpu.ops.functional import offset2joint_softmax

KEY = jax.random.PRNGKey(0)


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), t)


def test_quantconv_fp_path_matches_nn_conv():
    """'calib' (fp) QuantConv == nn.Conv bit-for-bit, same params."""
    x = jax.random.normal(KEY, (2, 16, 16, 8))
    ref = nn.Conv(12, (3, 3), strides=(2, 2),
                  padding=((1, 1), (1, 1)), use_bias=False)
    qc = QuantConv(12, (3, 3), strides=(2, 2),
                   padding=((1, 1), (1, 1)), use_bias=False, mode="calib")
    vref = ref.init(KEY, x)
    vq = qc.init(KEY, x)
    y_ref = ref.apply(vref, x)
    y_q, _ = qc.apply({"params": vref["params"], "quant": vq["quant"]},
                      x, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_q))


def test_quantconvtranspose_fp_path_matches_nn_convtranspose():
    """The hand-rolled lhs-dilated deconv == flax ConvTranspose(SAME,
    transpose_kernel=True), the decoder used by models/resnet.py."""
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    ref = nn.ConvTranspose(12, (4, 4), strides=(2, 2), padding="SAME",
                           use_bias=False, transpose_kernel=True)
    qc = QuantConvTranspose(12, (4, 4), strides=(2, 2), mode="calib")
    vref = ref.init(KEY, x)
    vq = qc.init(KEY, x)
    y_ref = ref.apply(vref, x)
    y_q, _ = qc.apply({"params": vref["params"], "quant": vq["quant"]},
                      x, mutable=["quant"])
    assert y_q.shape == y_ref.shape == (2, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_q),
                               atol=1e-5, rtol=1e-5)


def test_param_tree_identical_across_modes():
    """A trained fp checkpoint loads into the int8 model unchanged."""
    img = jnp.zeros((1, 64, 64, 1))
    off = build_model("resnet_18", 14).init(KEY, img, train=False)
    q8 = build_model("resnet_18", 14, quant_mode="int8").init(
        KEY, img, train=False)
    assert tree_shapes(off["params"]) == tree_shapes(q8["params"])
    assert tree_shapes(off["batch_stats"]) == tree_shapes(q8["batch_stats"])
    assert "quant" in q8 and "quant" not in off


def test_calibration_records_positive_scales():
    model = build_model("resnet_18", 14, quant_mode="calib")
    img = jnp.zeros((1, 64, 64, 1))
    v = model.init(KEY, img, train=False)
    batches = [np.random.RandomState(i).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32) for i in range(2)]
    quant = calibrate(model, v["params"], v["batch_stats"], batches)
    scales = jax.tree_util.tree_leaves(quant)
    assert scales and all(float(s) > 0 for s in scales)


def test_int8_forward_joints_close_to_fp32():
    """Decoded joints from the int8 forward track the fp32 forward.

    Random-init net on random depth frames; joints live in the
    normalized [-1, 1] uvd cube, so atol here is in cube units."""
    jt_num = 14
    fp = build_model("resnet_18", jt_num)
    cal = build_model("resnet_18", jt_num, quant_mode="calib")
    q8 = build_model("resnet_18", jt_num, quant_mode="int8")

    img = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = fp.init(KEY, img[..., None], train=False)
    params, bs = v["params"], v["batch_stats"]

    quant = calibrate(cal, params, bs, [np.asarray(img)])

    out_fp = fp.apply({"params": params, "batch_stats": bs},
                      img[..., None], train=False)
    out_q8 = q8.apply({"params": params, "batch_stats": bs,
                       "quant": quant}, img[..., None], train=False)
    assert out_q8.shape == out_fp.shape
    assert out_q8.dtype == out_fp.dtype

    jt_fp = offset2joint_softmax(out_fp, img, 1.0)
    jt_q8 = offset2joint_softmax(out_q8, img, 1.0)
    err = float(jnp.max(jnp.abs(jt_fp - jt_q8)))
    assert err < 0.05, f"int8 joint drift {err:.4f} cube units"


def test_int8_weights_only_mode_close_to_fp():
    """'int8_w' (per-channel weight rounding, fp activations): same
    param tree as fp, no quant collection, output close to fp — the
    attribution probe benchmarks/quant_diagnose.py uses."""
    jt_num = 14
    fp = build_model("resnet_18", jt_num)
    qw = build_model("resnet_18", jt_num, quant_mode="int8_w")
    img = jnp.asarray(np.random.RandomState(1).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = fp.init(KEY, img[..., None], train=False)
    vqw = qw.init(KEY, img[..., None], train=False)
    assert "quant" not in vqw  # no activation scales in this mode
    assert tree_shapes(v["params"]) == tree_shapes(vqw["params"])
    out_fp = fp.apply(v, img[..., None], train=False)
    out_qw = qw.apply({"params": v["params"],
                       "batch_stats": v["batch_stats"]},
                      img[..., None], train=False)
    jt_fp = offset2joint_softmax(out_fp, img, 1.0)
    jt_qw = offset2joint_softmax(out_qw, img, 1.0)
    err = float(jnp.max(jnp.abs(jt_fp - jt_qw)))
    assert err < 0.05, f"weight-only int8 joint drift {err:.4f}"


def test_percentile_calibration_clips_outliers():
    """percentile < 100 must yield act scales <= the max-calibrated
    ones, strictly smaller where outliers exist."""
    model = build_model("resnet_18", 14, quant_mode="calib")
    img = jnp.zeros((1, 64, 64, 1))
    v = model.init(KEY, img, train=False)
    batch = np.random.RandomState(0).uniform(
        -1, 1, (4, 64, 64)).astype(np.float32)
    batch[0, 0, 0] = 50.0  # inject an input outlier
    q_max = calibrate(model, v["params"], v["batch_stats"], [batch])
    q_p99 = calibrate(model, v["params"], v["batch_stats"], [batch],
                      percentile=99.0)
    s_max = jax.tree_util.tree_leaves(q_max)
    s_p99 = jax.tree_util.tree_leaves(q_p99)
    assert all(float(a) <= float(b) + 1e-12
               for a, b in zip(s_p99, s_max))
    assert any(float(a) < float(b) * 0.9
               for a, b in zip(s_p99, s_max))


def test_int8_without_calibration_guards_div_by_zero():
    """Uncalibrated (zero) act scales must not produce NaNs."""
    q8 = build_model("resnet_18", 14, quant_mode="int8")
    img = jnp.asarray(np.random.RandomState(1).uniform(
        -1, 1, (1, 64, 64)).astype(np.float32))
    v = q8.init(KEY, img[..., None], train=False)
    out = q8.apply(v, img[..., None], train=False)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hourglass_param_tree_identical_across_modes():
    """A trained fp hourglass checkpoint loads into the int8 model
    unchanged (TorchConv keeps the 'Conv_0' param path in quant modes)."""
    img = jnp.zeros((1, 64, 64, 1))
    off = build_model("hourglass_1", 14).init(KEY, img, train=False)
    q8 = build_model("hourglass_1", 14, quant_mode="int8").init(
        KEY, img, train=False)
    assert tree_shapes(off["params"]) == tree_shapes(q8["params"])
    assert tree_shapes(off["batch_stats"]) == tree_shapes(q8["batch_stats"])
    assert "quant" in q8 and "quant" not in off


def test_hourglass_int8_forward_joints_close_to_fp32():
    """Decoded joints from the int8 hourglass track the fp32 forward."""
    jt_num = 14
    fp = build_model("hourglass_1", jt_num)
    cal = build_model("hourglass_1", jt_num, quant_mode="calib")
    q8 = build_model("hourglass_1", jt_num, quant_mode="int8")

    img = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = fp.init(KEY, img[..., None], train=False)
    params, bs = v["params"], v["batch_stats"]

    quant = calibrate(cal, params, bs, [np.asarray(img)])

    out_fp = fp.apply({"params": params, "batch_stats": bs},
                      img[..., None], train=False)[-1]
    out_q8 = q8.apply({"params": params, "batch_stats": bs,
                       "quant": quant}, img[..., None], train=False)[-1]
    assert out_q8.shape == out_fp.shape

    jt_fp = offset2joint_softmax(out_fp, img, 0.4)
    jt_q8 = offset2joint_softmax(out_q8, img, 0.4)
    err = float(jnp.max(jnp.abs(jt_fp - jt_q8)))
    assert err < 0.05, f"int8 joint drift {err:.4f} cube units"


# ---------------------------------------------------------------- QAT

def test_qat_forward_matches_int8_forward():
    """'qat' (fake-quant, eval) and 'int8' (integer conv) are the same
    computation: conv(xq*s_in, wq*s_w) == conv(xq, wq)*s_in*s_w up to
    fp32 accumulation rounding — single layers agree to ~1e-6.  Through
    the FULL net the paths may pick different sides of a rounding
    boundary (a +-1 int8 code flip early on cascades), so the whole-
    network bound is looser; decoded joints must still agree to well
    under the fp-vs-int8 drift tolerance (0.05 cube units)."""
    jt_num = 14
    fp = build_model("resnet_18", jt_num)
    cal = build_model("resnet_18", jt_num, quant_mode="calib")
    q8 = build_model("resnet_18", jt_num, quant_mode="int8")
    qat = build_model("resnet_18", jt_num, quant_mode="qat")

    img = jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = fp.init(KEY, img[..., None], train=False)
    params, bs = v["params"], v["batch_stats"]
    quant = calibrate(cal, params, bs, [np.asarray(img)])

    out_q8 = q8.apply({"params": params, "batch_stats": bs,
                       "quant": quant}, img[..., None], train=False)
    out_qat = qat.apply({"params": params, "batch_stats": bs,
                         "quant": quant}, img[..., None], train=False)
    scale = float(jnp.max(jnp.abs(out_q8))) + 1e-8
    err = float(jnp.max(jnp.abs(out_q8 - out_qat))) / scale
    assert err < 0.05, f"qat/int8 forward diverge: rel err {err:.2e}"

    jt_q8 = offset2joint_softmax(out_q8, img, 1.0)
    jt_qat = offset2joint_softmax(out_qat, img, 1.0)
    jt_err = float(jnp.max(jnp.abs(jt_q8 - jt_qat)))
    assert jt_err < 0.02, f"qat/int8 joint drift {jt_err:.4f} cube units"


def test_qat_gradients_flow_through_rounding():
    """The straight-through estimator must pass finite, nonzero
    gradients to every conv/deconv kernel despite round() having zero
    gradient almost everywhere."""
    jt_num = 14
    cal = build_model("resnet_18", jt_num, quant_mode="calib")
    qat = build_model("resnet_18", jt_num, quant_mode="qat")
    img = jnp.asarray(np.random.RandomState(4).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = qat.init(KEY, img[..., None], train=False)
    params, bs = v["params"], v["batch_stats"]
    quant = calibrate(cal, params, bs, [np.asarray(img)])

    def loss(p):
        out, _ = qat.apply(
            {"params": p, "batch_stats": bs, "quant": quant},
            img[..., None], train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # every kernel leaf gets signal (biases of dead ReLUs may be 0)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    kernel_norms = [float(jnp.linalg.norm(g)) for path, g in flat
                    if "kernel" in jax.tree_util.keystr(path)]
    assert kernel_norms and all(n > 0 for n in kernel_norms)


def test_qat_finetune_reduces_int8_loss():
    """training/qat.finetune: a short STE fine-tune must reduce the
    int8-serving eval loss on the tuning batch (it optimizes exactly
    that objective; scales are frozen so before/after are comparable)."""
    from awr_tpu.config import Config
    from awr_tpu.training.qat import finetune
    from awr_tpu.training.steps import make_eval_step

    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=32,
                 jt_num=14)
    fp = build_model(cfg.net, cfg.jt_num, cfg.downsample)
    cal = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                      quant_mode="calib")
    q8 = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                     quant_mode="int8")

    rs = np.random.RandomState(5)
    batch = {
        "img": rs.uniform(-1, 1, (4, 32, 32)).astype(np.float32),
        "jt_uvd": rs.uniform(-0.8, 0.8, (4, 14, 3)).astype(np.float32),
    }
    img = jnp.asarray(batch["img"])
    v = fp.init(KEY, img[..., None], train=True)
    params0, bs0 = v["params"], v["batch_stats"]
    quant = calibrate(cal, params0, bs0, [batch["img"]])

    eval_step = jax.jit(make_eval_step(q8, cfg, quant=quant))
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    loss_before = float(eval_step(params0, bs0, dev_batch)["loss"])

    params1, bs1, quant1, losses = finetune(
        cfg, params0, bs0, [batch], steps=10, lr=1e-3, quant=quant)
    loss_after = float(eval_step(params1, bs1, dev_batch)["loss"])

    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert loss_after < loss_before, (loss_before, loss_after)
    # frozen-observer contract: the scales did not move
    for a, b in zip(jax.tree_util.tree_leaves(quant),
                    jax.tree_util.tree_leaves(quant1)):
        assert float(a) == float(b)
    # param tree unchanged structurally (checkpoint-compatible)
    assert tree_shapes(params1) == tree_shapes(params0)


def test_qat_matches_int8_under_default_matmul_precision():
    """The QAT conv pins HIGHEST precision internally: under the
    backend's DEFAULT (bf16-class) matmul/conv precision the scaled
    fake-quant operands would otherwise truncate to bf16 and the QAT
    objective would drift from the exact-int32 int8 serving path.
    (conftest sets 'highest' globally, which would mask the bug — this
    test drops to 'default' for the duration.)"""
    jt_num = 14
    fp = build_model("resnet_18", jt_num)
    cal = build_model("resnet_18", jt_num, quant_mode="calib")
    q8 = build_model("resnet_18", jt_num, quant_mode="int8")
    qat = build_model("resnet_18", jt_num, quant_mode="qat")

    img = jnp.asarray(np.random.RandomState(7).uniform(
        -1, 1, (2, 64, 64)).astype(np.float32))
    v = fp.init(KEY, img[..., None], train=False)
    params, bs = v["params"], v["batch_stats"]
    quant = calibrate(cal, params, bs, [np.asarray(img)])

    jax.config.update("jax_default_matmul_precision", "default")
    try:
        out_q8 = q8.apply({"params": params, "batch_stats": bs,
                           "quant": quant}, img[..., None], train=False)
        out_qat = qat.apply({"params": params, "batch_stats": bs,
                             "quant": quant}, img[..., None],
                            train=False)
    finally:
        jax.config.update("jax_default_matmul_precision", "highest")
    jt_q8 = offset2joint_softmax(out_q8, img, 1.0)
    jt_qat = offset2joint_softmax(out_qat, img, 1.0)
    err = float(jnp.max(jnp.abs(jt_q8 - jt_qat)))
    assert err < 0.02, (
        f"qat/int8 drift {err:.4f} cube units under default precision")


def test_gap_scaled_recipe_selection():
    """The default QAT budget is the gentle recipe for EVERY gap
    (training/qat.gap_scaled_recipe; n=3 on-chip provenance in its
    docstring).  The round-3 version branched to 500 @ 1e-4 above a
    0.1 mm gap — refuted by the round-4 resnet_50 run, where the
    aggressive budget on a 0.48 mm gap made int8 +1.1 mm WORSE than
    plain PTQ while the gentle one recovered 80% of the gap
    (runs/convergence_qat_resnet50_r04{,_gentle}.json).  Gap size must
    NOT select an aggressive budget."""
    from awr_tpu.training.qat import gap_scaled_recipe

    # all measured gaps — and any other — map to the gentle recipe
    assert gap_scaled_recipe(0.129) == (100, 1e-5)   # resnet_18 r02
    assert gap_scaled_recipe(0.072) == (100, 1e-5)   # hourglass_1 r02
    assert gap_scaled_recipe(0.481) == (100, 1e-5)   # resnet_50 r04
    assert gap_scaled_recipe(-0.05) == (100, 1e-5)
    assert gap_scaled_recipe(5.0) == (100, 1e-5)


def test_validated_qat_falls_back_when_worse():
    """Predictor.quantize_qat(holdout_batches=...): if the fine-tune
    scores WORSE than plain PTQ on held-out data, the fine-tuned
    weights are discarded and the Predictor serves PTQ — the defense
    the resnet_50 misprediction showed is necessary.  Forcing the
    regression deterministically: an absurd lr wrecks the weights on
    the tuning batch."""
    from awr_tpu.config import Config
    from awr_tpu.serving import Predictor

    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=32,
                 jt_num=14, use_pallas=False)
    fp = build_model(cfg.net, cfg.jt_num, cfg.downsample)
    rs = np.random.RandomState(6)

    def mk_batch(seed):
        g = np.random.RandomState(seed)
        return {"img": g.uniform(-1, 1, (4, 32, 32)).astype(np.float32),
                "jt_uvd": g.uniform(-0.8, 0.8,
                                    (4, 14, 3)).astype(np.float32)}

    tune, holdout = mk_batch(1), mk_batch(2)
    img = jnp.asarray(tune["img"])
    v = fp.init(KEY, img[..., None], train=True)
    pred = Predictor(cfg, dict(v))
    params_before = jax.device_get(pred.params)

    pred.quantize_qat([tune], steps=5, lr=50.0,  # deliberately ruinous
                      holdout_batches=[holdout])
    assert pred.qat_validation["fell_back"] is True
    # the GATE metric is normalized joint error (the mm proxy), with
    # the loss recorded alongside for provenance
    assert (pred.qat_validation["qat_joint_err"]
            > pred.qat_validation["ptq_joint_err"])
    assert (pred.qat_validation["qat_loss"]
            > pred.qat_validation["ptq_loss"])
    # the served weights are the ORIGINAL (PTQ) ones
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(
                        jax.device_get(pred.params))):
        np.testing.assert_array_equal(a, b)
    # and the predictor still serves int8
    out = pred.predict_normalized(holdout["img"])
    assert np.isfinite(out).all()

    # a sane gentle fine-tune is KEPT (no fallback)
    pred2 = Predictor(cfg, dict(v))
    pred2.quantize_qat([tune], steps=10, lr=1e-3,
                       holdout_batches=[tune])  # validate on tune set:
    # the fine-tune optimizes exactly this objective, so it must help
    assert pred2.qat_validation["fell_back"] is False


def test_validated_qat_gates_on_joint_err_not_loss(monkeypatch):
    """Adversarial case (VERDICT r4 weak-7): a fine-tune that IMPROVES
    the smooth-L1 loss held-out while REGRESSING joint error must still
    fall back — the r02 aggressive hourglass run was loss-down/mm-up in
    character, and a loss-scored gate would have passed it.  The
    holdout scorer is stubbed to return exactly that adversarial
    outcome; the gate must key on joint_err."""
    import awr_tpu.training.qat as qat_mod
    from awr_tpu.config import Config
    from awr_tpu.serving import Predictor

    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=32,
                 jt_num=14, use_pallas=False)
    fp = build_model(cfg.net, cfg.jt_num, cfg.downsample)
    g = np.random.RandomState(7)
    tune = {"img": g.uniform(-1, 1, (4, 32, 32)).astype(np.float32),
            "jt_uvd": g.uniform(-0.8, 0.8,
                                (4, 14, 3)).astype(np.float32)}
    v = fp.init(KEY, jnp.asarray(tune["img"])[..., None], train=True)
    pred = Predictor(cfg, dict(v))
    params_before = jax.device_get(pred.params)

    monkeypatch.setattr(
        qat_mod, "int8_holdout_metrics",
        lambda *a, **k: [dict(loss=1.0, joint_err=0.10),    # PTQ
                         dict(loss=0.5, joint_err=0.20)])   # QAT:
    # loss improved 2x, joint error doubled -> must fall back
    pred.quantize_qat([tune], steps=2, lr=1e-4,
                      holdout_batches=[tune])
    assert pred.qat_validation["fell_back"] is True
    assert pred.qat_validation["qat_loss"] < \
        pred.qat_validation["ptq_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(
                        jax.device_get(pred.params))):
        np.testing.assert_array_equal(a, b)
