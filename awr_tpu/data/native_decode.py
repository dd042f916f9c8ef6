"""numpy wrappers for the native host IO extension (native/awr_host.cpp).

``awr_tpu._native`` is a C++ CPython extension (built with
``python native/setup.py build_ext --inplace``) implementing the NYU
depth-PNG decode — zlib inflate, PNG unfiltering, and the
``blue + 256*green`` depth fold (reference nyu_loader.py:71-74) — in one
pass that releases the GIL, so loader threads genuinely overlap.  Exact
bit-parity with the cv2 spelling is asserted in tests/test_native.py.

Everything here degrades gracefully: if the extension is not built,
``HAVE_NATIVE`` is False and callers fall back to cv2.
"""

from __future__ import annotations

import numpy as np

try:
    from awr_tpu import _native

    HAVE_NATIVE = True
except ImportError:  # extension not built
    _native = None
    HAVE_NATIVE = False


def decode_depth_png(path: str) -> np.ndarray:
    """(H, W) float32 depth mm from one NYU-convention PNG."""
    buf, (h, w) = _native.decode_depth_png(path)
    return np.frombuffer(buf, np.float32).reshape(h, w)


def decode_depth_pngs(paths) -> np.ndarray:
    """(N, H, W) float32 depth mm; one contiguous buffer, one GIL drop."""
    buf, (n, h, w) = _native.decode_depth_pngs(list(paths))
    return np.frombuffer(buf, np.float32).reshape(n, h, w)
