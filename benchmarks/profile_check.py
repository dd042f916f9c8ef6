"""Profiler/latency cross-check for the headline bench (VERDICT r1-1d).

Triangulates the chained-throughput methodology of bench.py with two
independent measurements of the same jitted forward+decode:

1. SYNCED SINGLE DISPATCHES: one call per fresh random batch, fully
   host-synced (block + np.asarray) — an upper bound on per-batch wall
   time that includes a full tunnel round-trip per call.
2. A ``jax.profiler`` DEVICE TRACE of several chained calls, written to
   --trace-dir (loadable in XProf/Perfetto/TensorBoard; its on-device op
   times are the ground truth for where the microseconds go).

Consistency requirement printed + asserted: the chained per-iteration
time from bench.py's methodology must lie BELOW the synced per-call
time (chaining amortizes dispatch) and within a small factor of it
(else one of the harnesses is broken).

Usage: python benchmarks/profile_check.py [--trace-dir runs/trace_r02]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 128
IMG = 128
INNER = 8

HBM_PEAK_GBS = 819.0  # v5e datasheet HBM bandwidth


def _trace_op_agg(trace_dir: str, inner: int = INNER):
    """Parse the Perfetto JSON the profiler writes into one dict per
    distinct XLA op (device "XLA Ops" track only): summed duration,
    instance count, and the per-instance ``model_flops`` /
    ``bytes_accessed`` the trace carries.  Shared by the per-op table
    and the aggregate-floor summary; returns ``(agg, total_us)`` where
    total_us is the enclosing while/jit span if present."""
    import collections
    import glob
    import gzip

    fs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not fs:
        return {}, 0.0
    data = json.load(gzip.open(fs[-1]))
    events = data.get("traceEvents", [])
    dev_pid = {e["pid"] for e in events
               if e.get("ph") == "M" and e.get("name") == "process_name"
               and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tid = {e["tid"] for e in events
              if e.get("ph") == "M" and e.get("name") == "thread_name"
              and e.get("args", {}).get("name") == "XLA Ops"
              and e["pid"] in dev_pid}
    agg = collections.defaultdict(lambda: dict(dur=0.0, n=0, flops=0.0,
                                               bytes=0.0, cat="", op=""))
    total_us = 0.0
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in dev_pid
                or e.get("tid") not in op_tid):
            continue
        a = e.get("args", {})
        name = e["name"]
        if name.startswith(("while", "jit_")):
            total_us = max(total_us, e.get("dur", 0.0))
            continue
        row = agg[name]
        row["dur"] += e.get("dur", 0.0)
        row["n"] += 1
        row["flops"] = float(a.get("model_flops", 0) or 0)
        row["bytes"] = float(a.get("raw_bytes_accessed",
                                   a.get("bytes_accessed", 0)) or 0)
        row["cat"] = a.get("hlo_category", "")
        row["op"] = a.get("tf_op", "").split("/")[-1].rstrip(":")
    return agg, total_us


def aggregate_floors(trace_dir: str, inner: int = INNER,
                     peak_flops: float | None = None):
    """Whole-graph speed-of-light floors from a committed device trace
    (offline — no chip needed).  Three numbers per iteration:

    - ``hbm_floor_ms``: total bytes / HBM peak — the wall if every
      byte moved at full bandwidth and nothing else mattered.
    - ``mxu_floor_ms``: total FLOPs / chip peak — same for compute.
    - ``roofline_floor_ms``: sum over ops of max(op bytes / HBM peak,
      op FLOPs / chip peak) — the honest per-op lower bound, since an
      op bound by one resource cannot simultaneously saturate the
      other.  ``sum_op_ms / roofline_floor_ms`` is the remaining
      graph-level headroom factor (1.0 = every op at its own roof).

    Async-copy handling (r05 fix): ``copy-start``/``copy-done`` pairs
    are XLA's overlapped-DMA bookkeeping — the trace charges the SAME
    copy's bytes to both halves with ~zero duration, so counting them
    in the serial roofline both double-counts the bytes and charges
    serial time for a transfer that by construction overlaps compute
    (the r02_train trace 'beat' its own roofline by 3.6% that way —
    a physics violation that exposed the bug).  Their bytes count
    ONCE (the copy-done half) toward the aggregate HBM totals, and
    neither half contributes a serial roofline term.
    """
    agg, _ = _trace_op_agg(trace_dir, inner)
    peak = peak_flops or 197e12
    gb = gf = roof_s = sum_op_s = 0.0
    for name, r in agg.items():
        reps = max(r["n"] // inner, 1)
        fl = r["flops"] * reps
        by = r["bytes"] * reps
        if not name.startswith("copy-start"):
            gb += by / 1e9
        gf += fl / 1e9
        if not name.startswith(("copy-start", "copy-done")):
            roof_s += max(by / (HBM_PEAK_GBS * 1e9), fl / peak)
        sum_op_s += r["dur"] / inner * 1e-6
    if not agg:
        return {}
    return dict(
        trace_dir=trace_dir, inner=inner, n_ops=len(agg),
        gb_per_iter=round(gb, 2), gflops_per_iter=round(gf, 1),
        sum_op_ms=round(sum_op_s * 1e3, 2),
        hbm_floor_ms=round(gb / HBM_PEAK_GBS * 1e3, 2),
        mxu_floor_ms=round(gf / (peak / 1e9) * 1e3, 2),
        roofline_floor_ms=round(roof_s * 1e3, 2),
        headroom=round(sum_op_s / max(roof_s, 1e-12), 3),
    )


def per_op_table(trace_dir: str, inner: int = INNER, top: int = 12,
                 peak_flops: float | None = None):
    """Aggregate the device trace into a per-op speed-of-light table.

    Parses the Perfetto JSON the profiler writes (XLA Ops track):
    every op event carries ``model_flops`` and ``bytes_accessed``, so
    each row gets an achieved-TFLOPS / achieved-GB/s and the binding
    resource, automating the hand-built BENCH_NOTES_r02.md table.
    Durations are divided by ``inner`` (the chained-scan iteration
    count) to report per-iteration cost.
    """
    agg, total_us = _trace_op_agg(trace_dir, inner)
    peak = peak_flops or 197e12
    rows = []
    for name, r in sorted(agg.items(), key=lambda kv: -kv[1]["dur"]):
        dur_s = r["dur"] / inner * 1e-6
        reps = max(r["n"] // inner, 1)
        fl = r["flops"] * reps  # per-iteration flops of all instances
        by = r["bytes"] * reps
        rows.append(dict(
            name=name, op=r["op"], category=r["cat"],
            ms_per_iter=round(r["dur"] / inner / 1e3, 3),
            pct=round(100 * r["dur"] / max(total_us, 1e-9), 1),
            gflops=round(fl / 1e9, 1),
            mfu=round(fl / max(dur_s, 1e-12) / peak, 3),
            gbps=round(by / max(dur_s, 1e-12) / 1e9, 1),
            bw_frac=round(by / max(dur_s, 1e-12) / 1e9 / HBM_PEAK_GBS,
                          3),
        ))
    return rows[:top]


def profile_train(trace_dir: str, batch: int = 128, outer: int = 4,
                  net: str = "resnet_18"):
    """Chained-train-step trace + implied MFU (the training analog of
    the inference triangulation): INNER serial full train steps
    (encode + forward + backward + Adam) per dispatch, a device trace
    of one chained call, and the XLA-cost-model FLOPs of a single step
    so the implied MFU is printed alongside the wall number."""
    import functools
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.steps import make_train_step
    from awr_tpu.training.trainer import Trainer
    from awr_tpu.utils.profiling import flops_of

    ks = 1.0 if net.startswith("resnet") else 0.4
    cfg = Config(net=net, kernel_size=ks, img_size=IMG,
                 batch_size=batch, vis_freq=0, print_freq=10**9,
                 compute_dtype="bfloat16", matmul_precision="default")
    ds = SyntheticHandDataset(min(batch, 64), cfg.jt_num, IMG,
                              phase="train", seed=0)
    tr = Trainer(cfg, ds, workdir=tempfile.mkdtemp(prefix="awr_prof_"))
    b, _ = tr._pad(next(ds.batches(min(batch, 64))))
    reps = -(-batch // len(b["img"]))
    b = {k: np.concatenate([v] * reps)[:batch] for k, v in b.items()}
    salt = int.from_bytes(os.urandom(4), "little") / 2.0**32
    b["img"] = b["img"] + np.float32(salt * 1e-3)
    dev = tr._put(b)
    step = make_train_step(tr.model, tr.optimizer, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, batch):
        def body(carry, _):
            state, img = carry
            state, m = step(state, {**batch, "img": img})
            return (state, img * 0.999999 + m["loss"] * 1e-9), m["loss"]
        (state, _), losses = jax.lax.scan(
            body, (state, batch["img"]), None, length=INNER)
        return state, jnp.sum(losses)

    state = tr.state
    state, s = chained(state, dev)
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(outer):
        state, s = chained(state, dev)
        acc += float(s)
    ms_per_step = (time.perf_counter() - t0) / (outer * INNER) * 1e3
    assert np.isfinite(acc)

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        state, s = chained(state, dev)
        float(s)
    trace_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(trace_dir) for f in fs)

    fl = flops_of(lambda st, bt: step(st, bt), state, dev)
    mfu = None
    if fl:
        from awr_tpu.utils.profiling import chip_peak

        mfu = round(fl / (ms_per_step * 1e-3) / chip_peak(), 4)
    tr.close()
    result = dict(mode="train", net=net, batch=batch,
                  ms_per_step=round(ms_per_step, 3),
                  train_fps=round(batch / ms_per_step * 1e3, 1),
                  step_gflops=round(fl / 1e9, 1) if fl else None,
                  implied_mfu=mfu, trace_dir=trace_dir,
                  trace_bytes=trace_bytes)
    print(json.dumps(result))
    assert trace_bytes > 10_000, "profiler trace not captured"
    if mfu is not None:
        assert mfu < 1.0, result


def profile_int8(trace_dir: str, batch: int = 512, outer: int = 4):
    """Where does the int8 budget go? (VERDICT r2 weak-1)

    Chained int8 forward+decode (quant_mode='int8', calibrated scales)
    timed with bench.py's methodology, traced, and decomposed into the
    per-op speed-of-light table — per-op MFU against the v5e's 394
    TOPS int8 peak plus achieved HBM bandwidth, so each row says
    whether it is MXU-bound, bandwidth-bound, or overhead (dequant
    converts, requant rounding) that int8 added.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import resnet_config
    from awr_tpu.models import build_model
    from awr_tpu.models.quant import calibrate
    from awr_tpu.ops.decode import decode_offsets
    from awr_tpu.utils.profiling import chip_peak, flops_of

    cfg = resnet_config(18, compute_dtype="bfloat16")
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 1)),
                   train=True)
    params, batch_stats = v["params"], v["batch_stats"]

    rng = np.random.RandomState(0)
    calib_model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                              dtype=jnp.bfloat16, quant_mode="calib")
    calib = [rng.uniform(-1, 1, (32, IMG, IMG)).astype(np.float32)
             for _ in range(2)]
    quant = calibrate(calib_model, params, batch_stats, calib,
                      percentile=99.99)
    q8 = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                     dtype=jnp.bfloat16, quant_mode="int8")

    @jax.jit
    def infer(img):
        out = q8.apply({"params": params, "batch_stats": batch_stats,
                        "quant": quant}, img[..., None], train=False)
        return decode_offsets(out, img, cfg.kernel_size)

    @jax.jit
    def chained(img):
        def body(carry, _):
            jt = infer(carry)
            return carry * 0.999999 + jnp.sum(jt) * 1e-9, jnp.sum(jt)
        img_out, sums = jax.lax.scan(body, img, None, length=INNER)
        return img_out, jnp.sum(sums)

    salt = int.from_bytes(os.urandom(4), "little") / 2.0**32
    img = jnp.asarray(
        rng.uniform(-1, 1, (batch, IMG, IMG)).astype(np.float32)
        + np.float32(salt * 1e-3))
    img, s = chained(img)
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(outer):
        img, s = chained(img)
        acc += float(s)
    ms = (time.perf_counter() - t0) / (outer * INNER) * 1e3
    assert np.isfinite(acc)

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        img, s = chained(img)
        float(s)

    fl = flops_of(infer, img)
    int8_peak = 2 * chip_peak()  # v5e: 394 TOPS int8 = 2x bf16
    result = dict(mode="int8", net="resnet_18", batch=batch,
                  ms_per_batch=round(ms, 3),
                  frames_per_sec=round(batch / ms * 1e3, 1),
                  graph_gflops=round(fl / 1e9, 1) if fl else None,
                  int8_mfu=(round(fl / (ms * 1e-3) / int8_peak, 4)
                            if fl else None),
                  trace_dir=trace_dir)
    print(json.dumps(result))
    for row in per_op_table(trace_dir, peak_flops=int8_peak):
        print(json.dumps(row))
    if result["int8_mfu"] is not None:
        assert result["int8_mfu"] < 1.0, result


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace-dir", default="runs/trace_r02")
    ap.add_argument("--synced-iters", type=int, default=12)
    ap.add_argument("--chained-outer", type=int, default=6)
    ap.add_argument("--train", action="store_true",
                    help="trace + MFU-check a chained TRAIN step "
                         "instead of the inference path")
    ap.add_argument("--int8", action="store_true",
                    help="trace the int8 (quant_mode='int8') forward "
                         "and print the per-op speed-of-light table")
    ap.add_argument("--batch", type=int, default=512,
                    help="batch size for --int8")
    ap.add_argument("--table", action="store_true",
                    help="also print the per-op table for the default "
                         "bf16 inference trace")
    ap.add_argument("--net", default="resnet_18",
                    help="backbone for the inference/--train paths "
                         "(e.g. hourglass_1; --int8 stays resnet)")
    ap.add_argument("--train-batch", type=int, default=128,
                    help="batch size for --train")
    ap.add_argument("--infer-batch", type=int, default=BATCH,
                    help="batch size for the inference triangulation")
    ap.add_argument("--floors", action="store_true",
                    help="OFFLINE: print whole-graph HBM/MXU/roofline "
                         "floors from an existing --trace-dir (no chip "
                         "needed; --floors-inner sets the chained "
                         "iteration count the trace was taken with)")
    ap.add_argument("--floors-inner", type=int, default=INNER)
    args = ap.parse_args()
    if args.floors:
        print(json.dumps(aggregate_floors(args.trace_dir,
                                          inner=args.floors_inner)))
        return
    if args.train:
        profile_train(args.trace_dir, batch=args.train_batch,
                      net=args.net)
        if args.table:
            for row in per_op_table(args.trace_dir):
                print(json.dumps(row))
        return
    if args.int8:
        profile_int8(args.trace_dir, batch=args.batch)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import hourglass_config, resnet_config
    from awr_tpu.models import build_model
    from awr_tpu.ops.decode import decode_offsets

    if args.net.startswith("resnet"):
        cfg = resnet_config(int(args.net.split("_")[1]),
                            compute_dtype="bfloat16")
    else:
        cfg = hourglass_config(int(args.net.split("_")[1]),
                               compute_dtype="bfloat16")
    BATCH_N = args.infer_batch
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 1)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def infer(img):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          img[..., None], train=False)
        out = out[-1] if out.ndim == 5 else out  # last hourglass stack
        return decode_offsets(out, img, cfg.kernel_size,
                              use_pallas=cfg.use_pallas)

    @jax.jit
    def chained(img):
        def body(carry, _):
            jt = infer(carry)
            return carry * 0.999999 + jnp.sum(jt) * 1e-9, jnp.sum(jt)
        img_out, sums = jax.lax.scan(body, img, None, length=INNER)
        return img_out, jnp.sum(sums)

    salt = int.from_bytes(os.urandom(4), "little") / 2.0**32
    rng = np.random.RandomState(0)

    def fresh():
        return jnp.asarray(
            rng.uniform(-1, 1, (BATCH_N, IMG, IMG)).astype(np.float32)
            + np.float32(salt * 1e-3))

    # --- 1. synced single dispatches (fresh input per call) ---
    acc = float(np.asarray(infer(fresh())).sum())  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(args.synced_iters):
        acc += float(np.asarray(infer(fresh())).sum())
    synced_ms = (time.perf_counter() - t0) / args.synced_iters * 1e3
    assert np.isfinite(acc)

    # --- 2. chained methodology (bench.py's) ---
    img, s = chained(fresh())
    float(s)
    t0 = time.perf_counter()
    for _ in range(args.chained_outer):
        img, s = chained(img)
        acc += float(s)
    chained_ms = ((time.perf_counter() - t0)
                  / (args.chained_outer * INNER) * 1e3)

    # --- 3. device trace of chained calls ---
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        img, s = chained(img)
        float(s)
    trace_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.trace_dir) for f in fs)

    result = dict(
        net=cfg.net,
        batch=BATCH_N,
        synced_ms_per_batch=round(synced_ms, 3),
        chained_ms_per_batch=round(chained_ms, 3),
        dispatch_overhead_ms=round(synced_ms - chained_ms, 3),
        chained_fps=round(BATCH_N / chained_ms * 1e3, 1),
        synced_fps=round(BATCH_N / synced_ms * 1e3, 1),
        trace_dir=args.trace_dir,
        trace_bytes=trace_bytes,
    )
    print(json.dumps(result))
    if args.table:
        for row in per_op_table(args.trace_dir):
            print(json.dumps(row))
    # Chaining must amortize the tunnel round-trip (measured ~236 ms per
    # synced dispatch on this box — the tunnel RPC, not device compute,
    # dominates single calls; that is exactly why bench.py chains).
    assert chained_ms <= synced_ms * 1.1, result
    assert trace_bytes > 10_000, "profiler trace not captured"


if __name__ == "__main__":
    main()
