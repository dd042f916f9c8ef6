"""Pallas kernel parity in interpreter mode (tiny shapes; the real-TPU
checks run in bench/driver).  Verified on hardware: decode 6e-7 max err
at batch 128, encode bit-exact.  Throughput: statistically tied with
the XLA-fused jnp decode in isolation, ~7% ahead end-to-end at batch 32
(benchmarks/sweep_r02_decode.jsonl, honest harness)."""

import numpy as np
import pytest

from awr_tpu.ops import joint2offset, offset2joint_softmax
from awr_tpu.ops.pallas_decode import decode_pallas
from awr_tpu.ops.pallas_encode import encode_pallas

RNG = np.random.RandomState(0)


def tiny_batch(B=1, J=14, H=16):
    img = np.ones((B, H, H), np.float32)
    img[:, 4:12, 4:12] = -0.3
    jt = RNG.uniform(-0.5, 0.5, (B, J, 3)).astype(np.float32)
    return img, jt


@pytest.mark.parametrize("F", [8, 16])
def test_decode_pallas_interpret_parity(F):
    import jax.numpy as jnp

    img, jt = tiny_batch()
    off = RNG.randn(1, F, F, 56).astype(np.float32) * 0.3
    exp = np.asarray(offset2joint_softmax(jnp.asarray(off),
                                          jnp.asarray(img), 0.4))
    got = np.asarray(decode_pallas(jnp.asarray(off), jnp.asarray(img),
                                   0.4, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_encode_pallas_interpret_parity():
    import jax.numpy as jnp

    img, jt = tiny_batch()
    F = 8
    exp = np.asarray(joint2offset(jnp.asarray(jt), jnp.asarray(img),
                                  0.8, F))
    got = np.asarray(encode_pallas(jnp.asarray(jt), jnp.asarray(img),
                                   0.8, F, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_decode_dispatch_cpu_fallback():
    from awr_tpu.ops.decode import decode_offsets

    img, jt = tiny_batch()
    off = RNG.randn(1, 8, 8, 56).astype(np.float32)
    out = decode_offsets(off, img, 0.4, use_pallas=True)  # cpu -> jnp
    exp = offset2joint_softmax(off, img, 0.4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=1e-6)


def test_encode_dispatch_cpu_fallback():
    from awr_tpu.ops.encode import encode_offsets

    img, jt = tiny_batch()
    out = encode_offsets(jt, img, 0.8, 8, use_pallas=True)
    exp = joint2offset(jt, img, 0.8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=1e-6)


def test_pallas_decode_under_multidevice_mesh_interpret():
    """decode_offsets with a >1-device mesh must shard_map the Pallas
    kernel over the batch axis (pallas_call has no GSPMD rule; without
    this the dense maps would be all-gathered per step — ADVICE r1).
    Interpret mode on the 8-device CPU mesh; exact vs the jnp twin."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from awr_tpu.ops.decode import decode_offsets
    from awr_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    B, F, J = 16, 8, 14
    img, _ = tiny_batch(B=B)
    off = RNG.randn(B, F, F, 4 * J).astype(np.float32) * 0.3

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    off_d = jax.device_put(jnp.asarray(off), sh)
    img_d = jax.device_put(jnp.asarray(img), sh)

    fn = jax.jit(lambda o, i: decode_offsets(
        o, i, 0.4, use_pallas=True, mesh=mesh, interpret=True))
    got = np.asarray(fn(off_d, img_d))
    exp = np.asarray(offset2joint_softmax(jnp.asarray(off),
                                          jnp.asarray(img), 0.4))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)

    # gradients flow through the shard_map'ed custom_vjp (jnp backward)
    def loss(o):
        return jnp.sum(decode_offsets(o, img_d, 0.4, use_pallas=True,
                                      mesh=mesh, interpret=True) ** 2)

    g_got = np.asarray(jax.jit(jax.grad(loss))(off_d))
    g_exp = np.asarray(jax.grad(
        lambda o: jnp.sum(offset2joint_softmax(o, jnp.asarray(img),
                                               0.4) ** 2))(
        jnp.asarray(off)))
    # The backward is the IDENTICAL jnp twin on both sides (custom_vjp);
    # the residual difference is the kernel-vs-jnp FORWARD f32 rounding
    # entering through g = 2*jt, amplified by the vjp's local Jacobian
    # (x30 softmax temperature) — ~1e-6 forward noise -> ~2e-5 here.
    # This asserts gradients FLOW correctly (zeros/garbage would be
    # orders of magnitude off), not bit parity.
    np.testing.assert_allclose(g_got, g_exp, rtol=1e-3, atol=1e-4)


def test_pallas_encode_under_multidevice_mesh_interpret():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from awr_tpu.ops.encode import encode_offsets
    from awr_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    B, F = 8, 8
    img, jt = tiny_batch(B=B)
    jt = RNG.uniform(-0.5, 0.5, (B, 14, 3)).astype(np.float32)

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    jt_d = jax.device_put(jnp.asarray(jt), sh)
    img_d = jax.device_put(jnp.asarray(img), sh)

    fn = jax.jit(lambda j, i: encode_offsets(
        j, i, 0.8, F, use_pallas=True, mesh=mesh, interpret=True))
    got = np.asarray(fn(jt_d, img_d))
    exp = np.asarray(joint2offset(jnp.asarray(jt), jnp.asarray(img),
                                  0.8, F))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_pallas_decode_vjp_fixed_cotangent_tight():
    """Tight backward regression check (ADVICE r3): the loss-induced
    gradient comparison above must tolerate 1e-3 because the cotangent
    g = 2*jt carries the kernel-vs-jnp FORWARD rounding into the vjp.
    With a FIXED cotangent that amplifier is gone: the custom_vjp's
    residuals are the raw inputs (ops/decode.py _fwd), so its backward
    runs the IDENTICAL jnp twin on identical operands and must agree
    near roundoff — a future backward regression (wrong residuals,
    dropped mask, transposed layout) cannot hide under forward noise."""
    import jax
    import jax.numpy as jnp

    from awr_tpu.ops.decode import decode_offsets

    B, F, J = 2, 8, 14
    img, _ = tiny_batch(B=B)
    off = RNG.randn(B, F, F, 4 * J).astype(np.float32) * 0.3
    ct = jnp.asarray(RNG.randn(B, J, 3).astype(np.float32))
    img_j, off_j = jnp.asarray(img), jnp.asarray(off)

    _, vjp_pallas = jax.vjp(
        lambda o: decode_offsets(o, img_j, 0.4, use_pallas=True,
                                 interpret=True), off_j)
    _, vjp_jnp = jax.vjp(
        lambda o: offset2joint_softmax(o, img_j, 0.4), off_j)
    (g_p,) = vjp_pallas(ct)
    (g_x,) = vjp_jnp(ct)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-6, atol=1e-7)
