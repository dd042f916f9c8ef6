"""numpy wrappers for the native host IO extension (native/awr_host.cpp).

``awr_tpu._native`` is a C++ CPython extension (built with
``python native/setup.py build_ext --inplace``) implementing the NYU
depth-PNG decode — zlib inflate, PNG unfiltering, and the
``blue + 256*green`` depth fold (reference nyu_loader.py:71-74) — in one
pass that releases the GIL, so data-loading threads genuinely overlap.
Exact bit-parity with the cv2 spelling is asserted in
tests/test_native.py.

Everything here degrades gracefully: if the extension is not built,
``HAVE_NATIVE`` is False and callers fall back to cv2.  Per-file, an
unsupported or kind-mismatched PNG (palette, interlaced, re-encoded
bit depth, ...) falls back to the caller's cv2 spelling with a
once-per-process warning instead of crashing mid-epoch — and ``kind``
pins the native path to the encoding whose semantics match that cv2
spelling ('nyu' = 8-bit RGB b+256g fold, 'gray16' = 16-bit grayscale),
so a mismatched file can never be silently decoded with different
math than the fallback would use.
"""

from __future__ import annotations

import warnings

import numpy as np

try:
    from awr_tpu import _native

    HAVE_NATIVE = True
except ImportError:  # extension not built
    _native = None
    HAVE_NATIVE = False

_warned_fallback = set()


def decode_depth_png(path: str, kind: str = "any") -> np.ndarray:
    """(H, W) float32 depth mm from one depth PNG.

    ``kind``: 'any' (dispatch on the PNG header), 'nyu' (require 8-bit
    RGB/RGBA, blue + 256*green), or 'gray16' (require 16-bit gray).
    Raises ValueError on malformed, unsupported, or kind-mismatched
    files.
    """
    buf, (h, w) = _native.decode_depth_png(path, kind)
    return np.frombuffer(buf, np.float32).reshape(h, w)


def decode_depth_pngs(paths, kind: str = "any") -> np.ndarray:
    """(N, H, W) float32 depth mm; one contiguous buffer, one GIL drop."""
    buf, (n, h, w) = _native.decode_depth_pngs(list(paths), kind)
    return np.frombuffer(buf, np.float32).reshape(n, h, w)


def decode_or_fallback(path: str, kind: str, cv2_fallback) -> np.ndarray:
    """Native decode with a per-file cv2 fallback.

    Uses the native path when the extension is built AND the file's
    encoding matches ``kind``; any native ValueError (unsupported
    format, mismatched encoding, corrupt file) routes that one file
    through ``cv2_fallback(path)`` after a once-per-process warning,
    so a stray re-encoded frame degrades instead of crashing an epoch.
    """
    if HAVE_NATIVE:
        try:
            return decode_depth_png(path, kind)
        except ValueError as e:
            if kind not in _warned_fallback:
                _warned_fallback.add(kind)
                warnings.warn(
                    f"native PNG decode fell back to cv2 for {path!r}: "
                    f"{e} (warning once per process)", RuntimeWarning)
    return cv2_fallback(path)
