"""Backbone shape/grad/BN tests (reference model/resnet_deconv.py,
model/hourglass.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awr_tpu.models import PoseNet, build_model, get_deconv_net

KEY = jax.random.PRNGKey(0)


def init_and_run(model, img, train=False):
    variables = model.init(KEY, img, train=True)
    if train:
        out, mut = model.apply(
            variables, img, train=True, mutable=["batch_stats"]
        )
        return variables, out, mut
    out = model.apply(variables, img, train=False)
    return variables, out, None


@pytest.mark.parametrize("downsample", [1, 2, 4])
def test_resnet18_output_shape(downsample):
    model = get_deconv_net(18, 14, downsample)
    img = jnp.zeros((2, 64, 64, 1))
    _, out, _ = init_and_run(model, img)
    f = 64 // downsample
    assert out.shape == (2, f, f, 56)


def test_resnet_bottleneck_variant():
    model = get_deconv_net(50, 14, 2)
    img = jnp.zeros((1, 64, 64, 1))
    variables, out, _ = init_and_run(model, img)
    assert out.shape == (1, 32, 32, 56)
    # bottleneck stage-4 output channels are 512*4 before deconv
    l4 = variables["params"]["layer4_0"]["conv3"]["kernel"]
    assert l4.shape[-1] == 2048


@pytest.mark.parametrize("nstack", [1, 2])
def test_hourglass_output_shape(nstack):
    model = PoseNet(nstack=nstack, joint_num=14)
    img = jnp.zeros((1, 64, 64, 1))
    _, out, _ = init_and_run(model, img)
    assert out.shape == (nstack, 1, 32, 32, 56)


@pytest.mark.parametrize("depth", [101, 152])
def test_deep_resnets_shape_only(depth):
    """101/152 are too slow to run on the test CPU; validate the traced
    module structure and output shape without compiling."""
    import jax

    model = get_deconv_net(depth, 14, 2)
    img = jnp.zeros((1, 64, 64, 1))
    variables = jax.eval_shape(
        lambda: model.init(KEY, img, train=True))
    out = jax.eval_shape(
        lambda v: model.apply(v, img, train=False), variables)
    assert out.shape == (1, 32, 32, 56)


def test_build_model_factory():
    assert build_model("resnet_18", 14, 2).block == "basic"
    assert build_model("resnet_50", 14, 2).block == "bottleneck"
    assert build_model("hourglass_2", 14).nstack == 2
    with pytest.raises(ValueError):
        build_model("vit_tiny", 14)


def test_batch_stats_update_in_train_mode():
    model = get_deconv_net(18, 14, 2)
    img = jax.random.normal(KEY, (2, 64, 64, 1))
    variables, out, mut = init_and_run(model, img, train=True)
    before = variables["batch_stats"]["pre_bn"]["mean"]
    after = mut["batch_stats"]["pre_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # eval mode must not need mutable collections
    model.apply(variables, img, train=False)


def test_gradients_finite_resnet():
    model = get_deconv_net(18, 14, 2)
    img = jax.random.normal(KEY, (2, 64, 64, 1)) * 0.5

    variables = model.init(KEY, img, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # heads are N(0,.001)-initialized, zero bias (reference :108-115)
    f1 = variables["params"]["final1"]["kernel"]
    assert float(jnp.abs(f1).max()) < 0.01
    assert float(jnp.abs(variables["params"]["final1"]["bias"]).max()) == 0.0


def test_hourglass_stacks_differ_and_jit():
    model = PoseNet(nstack=2, joint_num=14)
    img = jax.random.normal(KEY, (1, 64, 64, 1)) * 0.5
    variables = model.init(KEY, img, train=True)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd(variables, img)
    assert out.shape == (2, 1, 32, 32, 56)
    # the two stacks carry different heads -> different predictions
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_upsample_nearest_2x_matches_repeat_spelling():
    """The single-broadcast upsample (BENCH_NOTES_r05.md §4) must stay
    bit-identical to torch nn.Upsample(scale_factor=2, mode='nearest')
    semantics, i.e. the two-``jnp.repeat`` spelling it replaced — the
    respelling is a pure HBM-traffic optimization, never a numerics
    change."""
    from awr_tpu.models.common import upsample_nearest_2x

    x = jnp.asarray(
        np.random.RandomState(7).randn(2, 3, 5, 4).astype(np.float32))
    ref = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    got = upsample_nearest_2x(x)
    assert got.shape == (2, 6, 10, 4)
    assert bool(jnp.all(got == ref))
    # odd sizes and bf16 too (the hourglass runs bf16 on chip)
    xb = x.astype(jnp.bfloat16)[:, :3, :5]
    assert bool(jnp.all(
        upsample_nearest_2x(xb)
        == jnp.repeat(jnp.repeat(xb, 2, axis=1), 2, axis=2)))


def test_conv_params_shim_matches_nn_conv_exactly():
    """The fused-head param shim (models/common.ConvParams) must stay
    byte-for-byte interchangeable with the ``nn.Conv`` it replaces:
    same param names, shapes, AND the same path-derived RNG draws —
    that is what keeps torch weight import and Orbax checkpoints
    oblivious to the fusion (BENCH_NOTES_r05.md §5).  Guards against
    a future flax change to either param naming or RNG derivation."""
    from flax import linen as nn

    from awr_tpu.models.common import (ConvParams,
                                       torch_conv_bias_init,
                                       torch_conv_kernel_init)

    class ViaConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            kshape = (1, 1, x.shape[-1], 5)
            return nn.Conv(5, (1, 1),
                           kernel_init=torch_conv_kernel_init(),
                           bias_init=torch_conv_bias_init(kshape),
                           name="head")(x)

    class ViaShim(nn.Module):
        @nn.compact
        def __call__(self, x):
            k, b = ConvParams(5, x.shape[-1], name="head")()
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    x = jnp.asarray(
        np.random.RandomState(3).randn(2, 4, 4, 7).astype(np.float32))
    vc = ViaConv().init(KEY, x)
    vs = ViaShim().init(KEY, x)
    pc = {jax.tree_util.keystr(k): v for k, v
          in jax.tree_util.tree_flatten_with_path(vc)[0]}
    ps = {jax.tree_util.keystr(k): v for k, v
          in jax.tree_util.tree_flatten_with_path(vs)[0]}
    assert set(pc) == set(ps)
    for k in pc:
        assert pc[k].shape == ps[k].shape
        assert bool(jnp.all(pc[k] == ps[k])), k  # same RNG draws
    # and identical forward under the shared params
    oc = ViaConv().apply(vc, x)
    os_ = ViaShim().apply(vc, x)
    assert float(jnp.max(jnp.abs(oc - os_))) < 1e-6
