"""Host-side NYU depth-PNG decode throughput: cv2 vs the native C++
extension (native/awr_host.cpp), single-thread and threaded.

The decode is the host half of the reference's data hot path
(reference nyu_loader.py:71-74 inside DataLoader workers,
train.py:99).  The native decoder releases the GIL for the whole
inflate+unfilter+fold pass, so Python *threads* scale it — the
reference needs 8 worker *processes* for the same effect
(reference config.py:37).

Writes N synthetic NYU-convention PNGs to a temp dir, then times:
  - cv2.imread + b+256g fold, single thread
  - native decode_depth_png, single thread
  - cv2 across a thread pool (GIL-bound)
  - native across a thread pool (GIL released)
Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("AWR_IO_BENCH_N", 256))
H, W = 480, 640  # NYU frame size
THREADS = int(os.environ.get("AWR_IO_BENCH_THREADS", 8))


def _write_frames(tmpdir: str) -> list[str]:
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    for i in range(N_IMAGES):
        # Depth in [0, 4000) mm encoded NYU-style: G=high byte, B=low.
        depth = rng.randint(0, 4000, (H, W)).astype(np.uint16)
        bgr = np.zeros((H, W, 3), np.uint8)
        bgr[:, :, 0] = (depth & 0xFF).astype(np.uint8)
        bgr[:, :, 1] = (depth >> 8).astype(np.uint8)
        p = os.path.join(tmpdir, f"depth_1_{i:07d}.png")
        cv2.imwrite(p, bgr)
        paths.append(p)
    return paths


def _cv2_decode(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    return (img[:, :, 0].astype(np.float32)
            + img[:, :, 1].astype(np.float32) * 256.0)


def _time(fn, paths) -> float:
    t0 = time.perf_counter()
    acc = 0.0
    for out in fn(paths):
        acc += float(out[0, 0])
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    return dt


def main():
    from awr_tpu.data import native_decode

    if not native_decode.HAVE_NATIVE:
        print("awr_tpu._native not built; run "
              "`python native/setup.py build_ext --inplace`",
              file=sys.stderr)
        sys.exit(1)

    with tempfile.TemporaryDirectory(prefix="awr_io_bench_") as tmp:
        paths = _write_frames(tmp)
        # warm the page cache so every row measures decode, not disk
        for p in paths:
            with open(p, "rb") as fh:
                fh.read()

        rows = []

        def serial(decoder):
            def run(paths):
                for p in paths:
                    yield decoder(p)
            return run

        def pooled(decoder):
            def run(paths):
                with ThreadPoolExecutor(THREADS) as ex:
                    yield from ex.map(decoder, paths)
            return run

        for name, fn in [
            ("cv2_serial", serial(_cv2_decode)),
            ("native_serial", serial(native_decode.decode_depth_png)),
            (f"cv2_threads{THREADS}", pooled(_cv2_decode)),
            (f"native_threads{THREADS}",
             pooled(native_decode.decode_depth_png)),
        ]:
            dt = _time(fn, paths)
            rows.append(dict(mode=name, images=N_IMAGES,
                             ms_per_image=round(dt / N_IMAGES * 1e3, 3),
                             images_per_sec=round(N_IMAGES / dt, 1)))

        # batched API: one call, one contiguous buffer, one GIL drop
        t0 = time.perf_counter()
        out = native_decode.decode_depth_pngs(paths)
        dt = time.perf_counter() - t0
        assert out.shape == (N_IMAGES, H, W) and np.isfinite(out[0, 0, 0])
        rows.append(dict(mode="native_batched", images=N_IMAGES,
                         ms_per_image=round(dt / N_IMAGES * 1e3, 3),
                         images_per_sec=round(N_IMAGES / dt, 1)))

        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
