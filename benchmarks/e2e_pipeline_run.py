"""End-to-end disk-to-chip pipeline benchmark.

Every other benchmark in this repo starts from in-memory arrays; this
one exercises the FULL production data path the reference implements
with a torch DataLoader over NYU files (nyu_loader.py:38-66 +
train.py:99):

  depth PNGs on disk -> native C++ PNG decode (awr_tpu/_native) ->
  PrefetchLoader worker threads -> [host crop/augment/normalize  |
  raw frames + fused on-device preprocessing] -> sharded jitted
  train step on the chip

It first GENERATES a synthetic NYU-format dataset on disk (PNG depth
encoding blue + green*256, joint_data.mat, center_*_refined.txt — the
exact reference file contract), then measures, per mode:

  - loader-only items/s        (host-side ceiling: decode+transform)
  - train-loop items/s         (end-to-end, async dispatch, one final
                                device sync)
  - the implied overlap        (end-to-end / min(host, device) shares)

Dispatches stay async inside an epoch (the host never blocks on a
step), so tunnel round-trips overlap with host decode the same way a
production input pipeline overlaps with device compute.

Usage:
  python benchmarks/e2e_pipeline_run.py                    # both modes
  python benchmarks/e2e_pipeline_run.py --mode raw --train-frames 4096
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def generate_nyu_on_disk(root: str, n_train: int, n_test: int,
                         seed: int = 0) -> str:
    """Write a synthetic dataset in the reference NYU layout
    (nyu_loader.py:71-90 file contract).  Cached: if the marker file
    matches the requested shape, generation is skipped."""
    import cv2
    import scipy.io as sio

    from awr_tpu.data.nyu import (EVAL_SELECT, JOINT_SELECT, NYU_FLIP,
                                  NYU_PARAS)
    from awr_tpu.data.synthetic import render_hand_depth
    from awr_tpu.geometry import xyz2uvd_np

    marker = os.path.join(root, ".generated")
    want = f"{n_train},{n_test},{seed},v2"  # v2: 14-joint render
    if os.path.exists(marker) and open(marker).read() == want:
        return root
    g = np.random.RandomState(seed)
    for phase, n in (("train", n_train), ("test", n_test)):
        d = os.path.join(root, phase)
        os.makedirs(d, exist_ok=True)
        centers = np.zeros((n, 3))
        xyz36 = np.zeros((n, 36, 3))
        uvd36 = np.zeros((n, 36, 3))
        t0 = time.time()
        for i in range(n):
            center = np.array([g.uniform(-80, 80), g.uniform(-60, 60),
                               g.uniform(650, 950)])
            jt = center[None] + g.uniform(-70, 70, (36, 3))
            jt[:, 2] = center[2] + g.uniform(-50, 50, 36)
            # render the 14 joints NYUDataset actually supervises
            # (36 -> 23 -> 14 selection, nyu.py JOINT_SELECT/EVAL_SELECT)
            # so labels correlate with the visible geometry
            jt14 = jt[JOINT_SELECT][EVAL_SELECT]
            depth = render_hand_depth(center, jt14, NYU_PARAS)
            dep = depth.astype(np.uint16)
            img = np.zeros((*depth.shape, 3), np.uint8)
            img[:, :, 0] = (dep % 256).astype(np.uint8)
            img[:, :, 1] = (dep // 256).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"depth_1_{i:07d}.png"), img)
            centers[i] = center
            xyz36[i] = jt
            uvd36[i] = xyz2uvd_np(jt, NYU_PARAS, NYU_FLIP)
        sio.savemat(os.path.join(d, "joint_data.mat"),
                    {"joint_uvd": uvd36[None], "joint_xyz": xyz36[None]})
        np.savetxt(os.path.join(root, f"center_{phase}_refined.txt"),
                   centers)
        print(f"[gen] {phase}: {n} frames in {time.time() - t0:.1f}s",
              flush=True)
    with open(marker, "w") as f:
        f.write(want)
    return root


def loader_only_pass(ds, batch_size: int, workers: int) -> dict:
    """Host-side ceiling: iterate one full epoch, device untouched."""
    from awr_tpu.data.pipeline import PrefetchLoader

    loader = PrefetchLoader(ds, batch_size, shuffle=False,
                            num_workers=workers)
    t0 = time.time()
    n = 0
    checksum = 0.0
    for b in loader:
        n += len(b["img"])
        checksum += float(b["img"].reshape(-1)[:: max(1, b["img"].size
                                                      // 64)].sum())
    dt = time.time() - t0
    assert np.isfinite(checksum)
    return dict(items=n, seconds=round(dt, 3),
                items_per_s=round(n / dt, 1))


def train_loop_pass(tr, ds, epochs: int, batch_size: int,
                    workers: int) -> dict:
    """End-to-end epochs: disk -> loader -> (host|device) preprocessing
    -> jitted train step.  Async dispatch; one device sync per epoch."""
    import jax

    from awr_tpu.data.pipeline import PrefetchLoader

    raw_mode = getattr(ds, "mode", "host") == "raw"
    cfg = tr.cfg
    # untimed warmup batch to trigger compilation
    warm = PrefetchLoader(ds, batch_size, num_workers=1)
    raw = next(iter(warm))
    if raw_mode:
        dev, p, _ = tr._raw_inputs(raw, ds)
        key = jax.random.PRNGKey(0)
        tr.state, m = tr._raw_train_step(tr.state, dev, p, key)
    else:
        b, _ = tr._pad(raw)
        tr.state, m = tr._train_step(tr.state, tr._put(b))
    float(m["loss"])

    per_epoch = []
    n_items = 0
    for ep in range(epochs):
        loader = PrefetchLoader(ds, batch_size, shuffle=True,
                                num_workers=workers,
                                rng=np.random.RandomState(ep))
        t0 = time.time()
        last = None
        for ii, raw in enumerate(loader):
            if raw_mode:
                dev, p, n = tr._raw_inputs(raw, ds)
                key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                         ep * 1_000_003 + ii)
                tr.state, m = tr._raw_train_step(tr.state, dev, p, key)
            else:
                b, n = tr._pad(raw)
                tr.state, m = tr._train_step(tr.state, tr._put(b))
            n_items += n
            last = m["loss"]
        loss = float(last)  # epoch-end sync; drains the dispatch queue
        per_epoch.append(time.time() - t0)
        assert np.isfinite(loss)
    total = sum(per_epoch)
    return dict(epochs=epochs, items=n_items,
                seconds=round(total, 3),
                items_per_s=round(n_items / total, 1),
                final_loss=loss,
                per_epoch_s=[round(t, 2) for t in per_epoch])


def run_mode(mode: str, root: str, args) -> dict:
    import tempfile

    from awr_tpu.config import Config
    from awr_tpu.data import native_decode
    from awr_tpu.data.nyu import NYUDataset
    from awr_tpu.training.trainer import Trainer

    cfg = Config(net=args.net, kernel_size=1.0 if "resnet" in args.net
                 else 0.4, img_size=128, batch_size=args.batch,
                 vis_freq=0, print_freq=10**9, num_workers=args.workers,
                 compute_dtype="bfloat16", matmul_precision="default")
    ds = NYUDataset(root, "train", img_size=128, mode=mode)
    tr = Trainer(cfg, train_data=ds,
                 workdir=tempfile.mkdtemp(prefix=f"awr_e2e_{mode}_"))
    # host mode must load single-threaded (the augmentation RandomState
    # stream is sequential, trainer.py:212-219), so BOTH passes use the
    # same effective worker count per mode — the ceiling and the loop
    # must measure the same loader configuration for the ratio to mean
    # anything
    workers = args.workers if mode == "raw" else 1
    res = dict(mode=mode, native_decode=bool(native_decode.HAVE_NATIVE),
               workers=workers, batch=args.batch, net=args.net)
    res["loader_only"] = loader_only_pass(ds, args.batch, workers)
    res["train_loop"] = train_loop_pass(tr, ds, args.epochs, args.batch,
                                        workers)
    host = res["loader_only"]["items_per_s"]
    e2e = res["train_loop"]["items_per_s"]
    res["e2e_over_host_ceiling"] = round(e2e / host, 3)
    tr.close()
    return res


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default="runs/e2e_data")
    ap.add_argument("--train-frames", type=int, default=2048)
    ap.add_argument("--test-frames", type=int, default=64)
    ap.add_argument("--net", default="resnet_18")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--mode", choices=["host", "raw", "both"],
                    default="both")
    ap.add_argument("--out", default="runs/e2e_pipeline_r02.json")
    args = ap.parse_args()

    root = generate_nyu_on_disk(args.data_root, args.train_frames,
                                args.test_frames)
    modes = ["host", "raw"] if args.mode == "both" else [args.mode]
    results = [run_mode(m, root, args) for m in modes]
    out = dict(bench="e2e_pipeline", results=results)
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
