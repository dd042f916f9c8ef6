"""Inference/training throughput sweep + Pallas-vs-XLA decode comparison
(BASELINE.json config 5).

Same methodology as bench.py (see BENCH_METHODOLOGY.md): run-unique
salted inputs (defeats the tunnel's cross-run dispatch memoization),
serial on-device lax.scan chains, host-materialized checksums, and a
linearity gate on every row.

Usage: python benchmarks/sweep.py [--nets resnet_18,hourglass_1]
       [--batches 32,128,512] [--dtype bfloat16] [--train] [--decode]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python benchmarks/sweep.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# serial iterations per jitted call; deepen (e.g. AWR_SWEEP_INNER=16)
# to amortize the tunnel dispatch round-trip as bench.py's headline does
INNER = int(os.environ.get("AWR_SWEEP_INNER", 4))


def _salt() -> float:
    return int.from_bytes(os.urandom(4), "little") / 2.0**32


def _compiled_flops(jitted, *args, **kw):
    """FLOPs (XLA cost model) of an ALREADY-compiled jitted call — the
    lower/compile here hits jax's executable cache, so this is free.

    NOTE: the cost model counts a ``lax.scan`` body ONCE regardless of
    trip count (verified against the unchained spelling: the INNER=4
    chained resnet_18 forward reports exactly 1x the 7.14 GFLOP/frame
    of the plain call), so for our serial-chain benchmarks the per-CALL
    number IS the per-ITERATION number.  If a future XLA changes this,
    implied MFU over-reports by INNER and the >=100% gate trips loudly
    — a visible failure, never a silently-passed broken number."""
    try:
        analysis = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops")) if analysis else None
    except Exception:
        return None


def _mfu_gate(per_iter_s: float, iter_flops, dtype: str) -> float:
    """Implied MFU of one inner iteration vs the chip's datasheet peak.

    MANDATORY on every row (CLAUDE.md / BENCH_METHODOLOGY.md): raises —
    refusing to emit the row — if the cost model is unavailable or the
    implied MFU is >= 100% of peak (a broken-harness number, the round-1
    failure mode)."""
    # shared bf16 chip-peak table (awr_tpu/utils/profiling.py — one
    # copy for bench.py / sweep.py / profile_check.py); int8 rows use
    # 2x (the v5e MXU int8 path)
    from awr_tpu.utils.profiling import chip_peak

    if not iter_flops:
        raise RuntimeError(
            "XLA cost model returned no FLOP count; refusing to emit an "
            "MFU-ungated sweep row")
    peak = chip_peak()
    if dtype == "int8":
        peak *= 2.0
    mfu = iter_flops / per_iter_s / peak
    if mfu >= 1.0:
        raise RuntimeError(
            f"implied MFU {mfu:.1%} >= 100% of {peak / 1e12:.0f} "
            f"TFLOPS peak; timing harness is broken, row refused")
    return round(mfu, 4)


def _measure(chained, img, outer: int):
    """Time `outer` + `2*outer` host-synced calls; gate on linearity.

    Returns (seconds_per_inner_iteration, linearity_ratio).
    """
    import numpy as np

    img, s = chained(img)
    float(s)  # warmup + compile

    def run(n, img):
        acc = 0.0
        t0 = time.perf_counter()
        for _ in range(n):
            img, s = chained(img)
            acc += float(s)  # host materialization: forces execution
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return dt, img

    dt1, img = run(outer, img)
    dt2, img = run(2 * outer, img)
    ratio = dt2 / dt1
    per_iter = (dt1 + dt2) / (3 * outer * INNER)
    return per_iter, ratio


def _cfg_for(net: str):
    from awr_tpu.config import hourglass_config, resnet_config

    if net.startswith("resnet"):
        return resnet_config(int(net.split("_")[1]))
    return hourglass_config(int(net.split("_")[1]))


def run_infer(net: str, batch: int, dtype_name: str, img_size: int = 128,
              outer: int = 5, use_pallas: bool | None = None,
              quant: bool = False):
    """Forward + decode throughput (the reference eval loop's device
    math, test.py:67-97).  ``quant=True`` times the post-training int8
    path (models/quant.py; v5e int8 MXU peak is 2x bf16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.models import build_model
    from awr_tpu.ops.decode import decode_offsets

    cfg = _cfg_for(net)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample, dtype=dtype,
                        quant_mode="int8" if quant else "off")
    variables = build_model(
        cfg.net, cfg.jt_num, cfg.downsample, dtype=dtype,
    ).init(jax.random.PRNGKey(0),
           jnp.zeros((1, img_size, img_size, 1)), train=True)
    p, bs = variables["params"], variables["batch_stats"]
    if use_pallas is None:
        use_pallas = cfg.use_pallas  # follow the measured-winner default

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, img_size, img_size))
                    .astype(np.float32) + np.float32(_salt() * 1e-3))

    extra = {}
    if quant:
        from awr_tpu.models.quant import calibrate

        cal = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                          dtype=dtype, quant_mode="calib")
        extra["quant"] = calibrate(cal, p, bs, [np.asarray(x)])

    @jax.jit
    def chained(x):
        def body(carry, _):
            out = model.apply(
                {"params": p, "batch_stats": bs, **extra},
                carry[..., None], train=False)
            if out.ndim == 5:
                out = out[-1]
            jt = decode_offsets(out, carry, cfg.kernel_size,
                                use_pallas=use_pallas)
            return carry * 0.999999 + jnp.sum(jt) * 1e-9, jnp.sum(jt)
        x_out, sums = jax.lax.scan(body, x, None, length=INNER)
        return x_out, jnp.sum(sums)

    per_iter, ratio = _measure(chained, x, outer)
    dtype_row = "int8" if quant else dtype_name
    mfu = _mfu_gate(per_iter, _compiled_flops(chained, x), dtype_row)
    return dict(net=net, batch=batch,
                dtype=dtype_row, mode="infer",
                decode="pallas" if use_pallas else "xla",
                ms_per_batch=round(per_iter * 1e3, 3),
                frames_per_sec=round(batch / per_iter, 1),
                linearity=round(ratio, 2), implied_mfu=mfu)


def run_decode(batch: int, feat: int = 64, jt_num: int = 14,
               kernel: float = 1.0, img_size: int = 128, outer: int = 5,
               use_pallas: bool = True, dtype_name: str = "float32"):
    """Decode-only: the AWR adaptive weighted integration
    (offset2joint_softmax), Pallas kernel vs XLA-fused jnp twin.

    ``dtype_name`` sets the dense-map input dtype: bfloat16 matches the
    hot path (the backbones emit bf16; the Pallas kernel streams it at
    native width, the jnp twin upcasts inside the fusion)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.ops.decode import decode_offsets

    @jax.jit
    def chained(off, img):
        def body(carry, _):
            jt = decode_offsets(carry, img, kernel,
                                use_pallas=use_pallas)
            nxt = (carry * 0.999999
                   + (jnp.sum(jt) * 1e-9).astype(carry.dtype))
            return nxt, jnp.sum(jt)
        off_out, sums = jax.lax.scan(body, off, None, length=INNER)
        return off_out, jnp.sum(sums)

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    off = jnp.asarray(
        rng.uniform(-1, 1, (batch, feat, feat, 4 * jt_num))
        .astype(np.float32) + np.float32(_salt() * 1e-3)).astype(dt)
    img = jnp.asarray(rng.uniform(-1, 1, (batch, img_size, img_size))
                      .astype(np.float32))

    import functools
    per_iter, ratio = _measure(
        functools.partial(chained, img=img), off, outer)
    mfu = _mfu_gate(per_iter, _compiled_flops(chained, off, img=img),
                    "float32")
    return dict(batch=batch, feat=feat, mode="decode", dtype=dtype_name,
                decode="pallas" if use_pallas else "xla",
                ms_per_batch=round(per_iter * 1e3, 3),
                frames_per_sec=round(batch / per_iter, 1),
                linearity=round(ratio, 2), implied_mfu=mfu)


def run_train_one(net: str, batch: int, dtype_name: str,
                  img_size: int = 128, iters: int = 10):
    """Full train-step timing (encode + fwd + bwd + Adam update).

    The state chains serially through donated buffers; each step's loss
    is host-materialized, so every step provably executes.  Inputs are
    salted per run (no cross-run memoization)."""
    import tempfile

    import jax
    import numpy as np

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.trainer import Trainer

    ks = 1.0 if net.startswith("resnet") else 0.4
    cfg = Config(net=net, kernel_size=ks, img_size=img_size,
                 batch_size=batch, vis_freq=0,
                 print_freq=10**9, compute_dtype=dtype_name,
                 matmul_precision="default")
    ds = SyntheticHandDataset(min(batch, 64), cfg.jt_num, img_size,
                              phase="train", seed=0)
    tr = Trainer(cfg, ds, workdir=tempfile.mkdtemp(prefix="awr_bench_"))
    b, _ = tr._pad(next(ds.batches(min(batch, 64))))
    reps = -(-batch // len(b["img"]))
    b = {k: np.concatenate([v] * reps)[:batch] for k, v in b.items()}
    b["img"] = b["img"] + np.float32(_salt() * 1e-3)
    dev = tr._put(b)
    tr.state, m = tr._train_step(tr.state, dev)
    float(m["loss"])  # compile + warmup
    step_flops = _compiled_flops(tr._train_step, tr.state, dev)

    def run(n):
        acc = 0.0
        t0 = time.perf_counter()
        for _ in range(n):
            tr.state, m = tr._train_step(tr.state, dev)
            acc += float(m["loss"])
        assert np.isfinite(acc)
        return time.perf_counter() - t0

    dt1 = run(iters)
    dt2 = run(2 * iters)
    ratio = dt2 / dt1
    dt = (dt1 + dt2) / (3 * iters)
    tr.close()
    mfu = _mfu_gate(dt, step_flops, dtype_name)
    return dict(net=net, batch=batch, dtype=dtype_name, mode="train",
                ms_per_step=round(dt * 1e3, 3),
                frames_per_sec=round(batch / dt, 1),
                linearity=round(ratio, 2), implied_mfu=mfu)


def run_train_chained(net: str, batch: int, dtype_name: str,
                      img_size: int = 128, outer: int = 4,
                      remat: bool = False, grad_accum: int = 1):
    """Sustained train-step throughput: INNER serial train steps per
    dispatch.

    ``run_train_one`` host-syncs every step, so on this tunneled setup
    it mostly measures the ~26 ms dispatch round-trip
    (BENCH_NOTES_r02.md), not the device.  Here the optimizer state
    chains through a ``lax.scan`` of full train steps (encode + forward
    + backward + Adam, reference train.py:107-131) — no step can be
    elided because the final params depend on every step — and each
    step's input is perturbed by the previous loss, so the data also
    chains serially.  This approximates a pipelined input feed (batches
    staged on device), which is how the Trainer actually runs epochs."""
    import functools
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.steps import make_train_step
    from awr_tpu.training.trainer import Trainer

    ks = 1.0 if net.startswith("resnet") else 0.4
    cfg = Config(net=net, kernel_size=ks, img_size=img_size,
                 batch_size=batch, vis_freq=0,
                 print_freq=10**9, compute_dtype=dtype_name,
                 matmul_precision="default",
                 remat=remat, grad_accum=grad_accum)
    ds = SyntheticHandDataset(min(batch, 64), cfg.jt_num, img_size,
                              phase="train", seed=0)
    tr = Trainer(cfg, ds, workdir=tempfile.mkdtemp(prefix="awr_bench_"))
    b, _ = tr._pad(next(ds.batches(min(batch, 64))))
    reps = -(-batch // len(b["img"]))
    b = {k: np.concatenate([v] * reps)[:batch] for k, v in b.items()}
    b["img"] = b["img"] + np.float32(_salt() * 1e-3)
    dev = tr._put(b)
    step = make_train_step(tr.model, tr.optimizer, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, batch):
        def body(carry, _):
            state, img = carry
            state, m = step(state, {**batch, "img": img})
            img = img * 0.999999 + m["loss"] * 1e-9
            return (state, img), m["loss"]
        (state, _), losses = jax.lax.scan(
            body, (state, batch["img"]), None, length=INNER)
        return state, jnp.sum(losses)

    state = tr.state
    state, s = chained(state, dev)
    float(s)  # compile + warmup
    chain_flops = _compiled_flops(chained, state, dev)

    def run(n, state):
        acc = 0.0
        t0 = time.perf_counter()
        for _ in range(n):
            state, s = chained(state, dev)
            acc += float(s)  # host materialization per dispatch
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        return dt, state

    dt1, state = run(outer, state)
    dt2, state = run(2 * outer, state)
    ratio = dt2 / dt1
    per_step = (dt1 + dt2) / (3 * outer * INNER)
    tr.close()
    # scan bodies are counted once (see _compiled_flops), so chain_flops
    # is one train step's worth; a grad_accum microbatch scan inside the
    # step is likewise counted once -> scale back up to the full batch
    mfu = _mfu_gate(per_step,
                    chain_flops and chain_flops * grad_accum,
                    dtype_name)
    return dict(net=net, batch=batch, dtype=dtype_name,
                mode="train_chained", remat=remat,
                grad_accum=grad_accum,
                ms_per_step=round(per_step * 1e3, 3),
                frames_per_sec=round(batch / per_step, 1),
                linearity=round(ratio, 2), implied_mfu=mfu)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nets", default="resnet_18,hourglass_1")
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="also time full train steps (host-synced "
                         "per step: includes dispatch round-trip)")
    ap.add_argument("--train-chained", action="store_true",
                    help="also time sustained train steps (INNER "
                         "serial steps per dispatch; device-bound)")
    ap.add_argument("--decode", action="store_true",
                    help="decode-only Pallas-vs-XLA comparison")
    ap.add_argument("--decode-dtypes", default="float32",
                    help="comma list of dense-map dtypes for --decode "
                         "(bfloat16 = the hot path the backbones feed)")
    ap.add_argument("--compare-decode", action="store_true",
                    help="run infer rows with BOTH decode spellings")
    ap.add_argument("--skip-infer", action="store_true",
                    help="skip the default infer rows (train-only runs)")
    ap.add_argument("--int8", action="store_true",
                    help="also run post-training-int8 infer rows")
    ap.add_argument("--memory-levers", action="store_true",
                    help="with --train-chained: also time the remat and "
                         "grad_accum=4 variants (the recompute cost of "
                         "the memory savings in memory_r02.jsonl)")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    if args.decode:
        for b in batches:
            for dt in args.decode_dtypes.split(","):
                print(json.dumps(run_decode(b, use_pallas=True,
                                            dtype_name=dt.strip())))
                print(json.dumps(run_decode(b, use_pallas=False,
                                            dtype_name=dt.strip())))
    for net in args.nets.split(","):
        for b in batches:
            if args.compare_decode:
                print(json.dumps(run_infer(net.strip(), b, args.dtype,
                                           use_pallas=True)))
                print(json.dumps(run_infer(net.strip(), b, args.dtype,
                                           use_pallas=False)))
            elif not args.skip_infer:
                print(json.dumps(run_infer(net.strip(), b, args.dtype)))
            if args.int8:
                print(json.dumps(run_infer(net.strip(), b, args.dtype,
                                           quant=True)))
            if args.train:
                print(json.dumps(run_train_one(net.strip(), b,
                                               args.dtype)))
            if args.train_chained:
                print(json.dumps(run_train_chained(net.strip(), b,
                                                   args.dtype)))
                if args.memory_levers:
                    print(json.dumps(run_train_chained(
                        net.strip(), b, args.dtype, remat=True)))
                    print(json.dumps(run_train_chained(
                        net.strip(), b, args.dtype, grad_accum=4)))


if __name__ == "__main__":
    main()
