"""Correctness of the Pallas int8 polyphase deconv kernel
(awr_tpu/ops/pallas_int8.py) against the XLA int8 path it replaces
(models/quant.py QuantConvTranspose mode='int8' — the lhs-dilated conv
spelling).  Interpret mode on CPU: integer arithmetic, so the
comparison is exact up to the final dtype cast."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from awr_tpu.ops.pallas_int8 import (deconv4x4s2_int8, int8_matmul,
                                     prep_deconv_weights)


def _xla_int8_deconv(xq, wq, scale, out_dtype=jnp.float32):
    """The exact spelling models/quant.py QuantConvTranspose uses for
    mode='int8' (quant.py:238-273): lhs-dilated conv of the flipped
    (kh, kw, out, in) kernel, int32 accumulation, dequant."""
    hwio = jnp.flip(wq, axis=(0, 1)).transpose(0, 1, 3, 2)
    acc = lax.conv_general_dilated(
        xq, hwio, window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * scale).astype(out_dtype)


@pytest.mark.parametrize("B,H,W,cin,cout", [
    (2, 4, 4, 8, 16),
    (1, 8, 6, 16, 8),   # non-square spatial
    (3, 5, 7, 8, 8),    # odd sizes
])
def test_deconv_matches_xla_int8_path(B, H, W, cin, cout):
    g = np.random.RandomState(B * 100 + H)
    xq = jnp.asarray(g.randint(-127, 128, (B, H, W, cin), np.int8))
    wq = jnp.asarray(g.randint(-127, 128, (4, 4, cout, cin), np.int8))
    scale = jnp.asarray(
        g.uniform(0.5, 2.0, (cout,)).astype(np.float32))

    want = _xla_int8_deconv(xq, wq, scale)
    got = deconv4x4s2_int8(xq, wq, scale, out_dtype=jnp.float32,
                           interpret=True)
    assert got.shape == (B, 2 * H, 2 * W, cout) == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deconv_bf16_output_matches_cast():
    g = np.random.RandomState(0)
    xq = jnp.asarray(g.randint(-127, 128, (2, 4, 4, 8), np.int8))
    wq = jnp.asarray(g.randint(-127, 128, (4, 4, 8, 8), np.int8))
    scale = jnp.asarray(g.uniform(0.5, 2.0, (8,)).astype(np.float32))
    want = _xla_int8_deconv(xq, wq, scale, out_dtype=jnp.bfloat16)
    got = deconv4x4s2_int8(xq, wq, scale, out_dtype=jnp.bfloat16,
                           interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_prep_weights_phase_layout():
    """Each phase operand's rows are the (di, dj)-ordered 2x2 taps of
    the (in, out)-transposed kernel slices."""
    g = np.random.RandomState(3)
    wq = g.randint(-127, 128, (4, 4, 5, 7)).astype(np.int8)
    ph = np.asarray(prep_deconv_weights(jnp.asarray(wq)))
    assert ph.shape == (4, 4 * 7, 5)
    KR = ((3, 1), (2, 0))
    for a in (0, 1):
        for c in (0, 1):
            for di in (0, 1):
                for dj in (0, 1):
                    blk = ph[a * 2 + c,
                             (di * 2 + dj) * 7:(di * 2 + dj + 1) * 7]
                    np.testing.assert_array_equal(
                        blk, wq[KR[a][di], KR[c][dj]].T)


def test_int8_matmul_probe_kernel():
    g = np.random.RandomState(1)
    a = jnp.asarray(g.randint(-127, 128, (256, 64), np.int8))
    b = jnp.asarray(g.randint(-127, 128, (64, 32), np.int8))
    got = int8_matmul(a, b, tile_m=128, interpret=True)
    want = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_deconv_matches_quantconvtranspose_module():
    """End-to-end against the REAL QuantConvTranspose int8 module:
    same fp kernel + calibrated act scale, quantization done by
    models/quant.py itself — the integration contract."""
    from awr_tpu.models.quant import (QuantConvTranspose,
                                      _quantize_acts,
                                      _quantize_weights)

    g = np.random.RandomState(5)
    x = jnp.asarray(g.uniform(-1, 1, (2, 6, 6, 8)).astype(np.float32))
    mod = QuantConvTranspose(features=8, mode="int8",
                             dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    act_scale = jnp.asarray(0.8 / 127.0, jnp.float32)
    quant = {"act_scale": act_scale}
    want = mod.apply({"params": v["params"], "quant": quant}, x)

    kernel = v["params"]["kernel"]
    xq, s_in = _quantize_acts(x, act_scale)
    wq, s_w = _quantize_weights(kernel, (0, 1, 3))
    got = deconv4x4s2_int8(xq, wq, s_in * s_w[0, 0, :, 0],
                           out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
