"""Native host IO extension (native/awr_host.cpp): exact decode parity
with the cv2 spellings each dataset loader uses.

Skips if the extension has not been built
(``python native/setup.py build_ext --inplace``).
"""

import os

import cv2
import numpy as np
import pytest

from awr_tpu.data import native_decode

pytestmark = pytest.mark.skipif(
    not native_decode.HAVE_NATIVE,
    reason="awr_tpu._native not built (python native/setup.py "
           "build_ext --inplace)")


def _nyu_ref(path):
    img = cv2.imread(path)
    return (img[:, :, 0].astype(np.float32)
            + img[:, :, 1].astype(np.float32) * 256.0)


def _write_nyu_png(path, rng, h=120, w=160):
    # cv2 writes BGR -> PNG RGB; the depth fold reads blue+256*green
    cv2.imwrite(path, rng.randint(0, 256, (h, w, 3), np.uint8))


def test_nyu_rgb8_parity_exact(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(4):
        p = str(tmp_path / f"d{i}.png")
        _write_nyu_png(p, rng)
        np.testing.assert_array_equal(
            native_decode.decode_depth_png(p), _nyu_ref(p))


def test_realistic_smooth_depth_parity(tmp_path):
    """Smooth frames exercise the Sub/Up/Average/Paeth filter paths the
    PNG encoder actually picks on real depth images."""
    yy, xx = np.mgrid[0:240, 0:320]
    d = (700 + 80 * np.sin(xx / 40.0) + 60 * np.cos(yy / 30.0)).astype(
        np.int32)
    img = np.zeros((240, 320, 3), np.uint8)
    img[:, :, 0] = (d % 256).astype(np.uint8)
    img[:, :, 1] = (d // 256).astype(np.uint8)
    p = str(tmp_path / "smooth.png")
    cv2.imwrite(p, img)
    got = native_decode.decode_depth_png(p)
    np.testing.assert_array_equal(got, _nyu_ref(p))
    np.testing.assert_array_equal(got, d.astype(np.float32))


def test_gray16_parity_exact(tmp_path):
    """ICVL/HANDS17-style 16-bit grayscale frames (IMREAD_ANYDEPTH)."""
    rng = np.random.RandomState(1)
    depth = rng.randint(0, 65536, (100, 140), np.uint16)
    p = str(tmp_path / "g16.png")
    cv2.imwrite(p, depth)
    ref = cv2.imread(p, cv2.IMREAD_ANYDEPTH).astype(np.float32)
    np.testing.assert_array_equal(native_decode.decode_depth_png(p), ref)


def test_batched_decode_matches_singles(tmp_path):
    rng = np.random.RandomState(2)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"b{i}.png")
        _write_nyu_png(p, rng)
        paths.append(p)
    batch = native_decode.decode_depth_pngs(paths)
    assert batch.shape == (5, 120, 160)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], _nyu_ref(p))


def test_batched_rejects_mixed_sizes(tmp_path):
    rng = np.random.RandomState(3)
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    _write_nyu_png(p1, rng, h=64, w=64)
    _write_nyu_png(p2, rng, h=32, w=64)
    with pytest.raises(ValueError, match="differs"):
        native_decode.decode_depth_pngs([p1, p2])


def test_clear_errors_on_bad_inputs(tmp_path):
    missing = str(tmp_path / "nope.png")
    with pytest.raises(ValueError, match="cannot open"):
        native_decode.decode_depth_png(missing)
    notpng = str(tmp_path / "notpng.png")
    with open(notpng, "wb") as fh:
        fh.write(b"hello world, definitely not a png")
    with pytest.raises(ValueError, match="signature"):
        native_decode.decode_depth_png(notpng)


def test_nyu_loader_uses_native_path(tmp_path):
    """data.nyu.decode_depth_png routes through the extension and stays
    bit-identical to the cv2 spelling (reference nyu_loader.py:71-74)."""
    from awr_tpu.data.nyu import decode_depth_png

    rng = np.random.RandomState(4)
    p = str(tmp_path / "depth_1_0000001.png")
    _write_nyu_png(p, rng, h=480, w=640)
    np.testing.assert_array_equal(decode_depth_png(p), _nyu_ref(p))


def test_kind_gate_rejects_mismatched_encoding(tmp_path):
    """kind='nyu' must refuse a 16-bit gray file (and vice versa) so
    the native path can never decode a file with different math than
    the caller's cv2 fallback spelling would."""
    rng = np.random.RandomState(5)
    p_rgb = str(tmp_path / "rgb.png")
    _write_nyu_png(p_rgb, rng)
    p_g16 = str(tmp_path / "g16.png")
    cv2.imwrite(p_g16, rng.randint(0, 65536, (32, 32), np.uint16))

    np.testing.assert_array_equal(
        native_decode.decode_depth_png(p_rgb, "nyu"), _nyu_ref(p_rgb))
    with pytest.raises(ValueError, match="expected encoding"):
        native_decode.decode_depth_png(p_g16, "nyu")
    with pytest.raises(ValueError, match="expected encoding"):
        native_decode.decode_depth_png(p_rgb, "gray16")
    with pytest.raises(ValueError, match="unknown kind"):
        native_decode.decode_depth_png(p_rgb, "bogus")


def test_per_file_cv2_fallback(tmp_path):
    """A file the native decoder rejects (kind mismatch here; palette/
    interlaced in the wild) routes through the cv2 fallback with a
    warning instead of crashing the epoch."""
    import warnings as _w

    rng = np.random.RandomState(6)
    p_g16 = str(tmp_path / "reencoded.png")
    depth = rng.randint(0, 65536, (24, 24), np.uint16)
    cv2.imwrite(p_g16, depth)

    calls = []

    def fb(path):
        calls.append(path)
        return cv2.imread(path, cv2.IMREAD_ANYDEPTH).astype(np.float32)

    native_decode._warned_fallback.discard("nyu")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = native_decode.decode_or_fallback(p_g16, "nyu", fb)
    assert calls == [p_g16]
    np.testing.assert_array_equal(out, depth.astype(np.float32))
    assert any("fell back to cv2" in str(r.message) for r in rec)


def test_loader_decoders_match_their_cv2_spelling(tmp_path):
    """icvl/hands17 wrappers pin kind='gray16': bit-equal to their
    IMREAD_ANYDEPTH cv2 spelling on the format they claim."""
    from awr_tpu.data.hands17 import decode_hands17_png
    from awr_tpu.data.icvl import decode_icvl_png

    rng = np.random.RandomState(7)
    p = str(tmp_path / "d16.png")
    depth = rng.randint(0, 32001, (60, 80), np.uint16)
    cv2.imwrite(p, depth)
    ref = cv2.imread(p, cv2.IMREAD_ANYDEPTH).astype(np.float32)
    np.testing.assert_array_equal(decode_icvl_png(p), ref)
    np.testing.assert_array_equal(decode_hands17_png(p), ref)
