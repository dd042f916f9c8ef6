"""Serving throughput under concurrent load: BatchingPredictor vs a
naive sequential client.

The small-batch latency rows (sweep_r02_smallbatch.jsonl) showed
batch-8 costs the same device time as batch-1, so coalescing concurrent
requests is the serving-throughput lever.  This measures it end to end
through the real serving surface — ``awr_tpu.batching.BatchingPredictor``
over ``serving.Predictor.predict`` (device crop/normalize + forward +
adaptive decode + host de-normalization per request):

- ``sequential``: one client, one frame per call, host-synced — what a
  naive deployment gets (pays the full dispatch round-trip per frame).
- ``batched_cN``: N closed-loop client threads, each submitting one
  frame and waiting for its own result before sending the next; the
  dispatcher coalesces whatever is queued into one device call per
  drain group.

Timing honesty (BENCH_METHODOLOGY.md): every frame is unique
(os.urandom-salted), and every client host-materializes its result
before sending its next request, so the tunnel's dispatch memoization
cannot serve any request without executing and a closed loop cannot run
ahead of real completions.  No MFU gate applies: these numbers are
dispatch-bound and sit far BELOW the compute ceiling (bench.py's
chained headline is the compute-bound number; this benchmark measures
the serving stack, where request latency, not FLOPs, is the resource).

Raw frames are 160x160 mm-depth images with matched intrinsics (small
enough that the tunnel upload does not dominate; the crop path is
identical for any H0 x W0).

``--http`` routes every request through the real network stack instead
(``awr_tpu.server.AWRServer`` on a loopback ephemeral port, JSON +
base64-float32 payloads): clients become closed-loop HTTP POSTers, and
coalescing happens inside the server's own batching layer.  Rows get an
``http_`` mode prefix; the delta vs the in-process rows is the
HTTP/JSON overhead (the http_sequential row runs with max_wait_ms=0 so
lone requests do not also pay the coalescing window).

``--open-loop-qps`` adds OPEN-LOOP rows (fixed offered rate, VERDICT r2
weak-6): a pacing thread submits one frame every 1/QPS seconds through
``BatchingPredictor.submit`` regardless of completions, and latency is
measured from each request's SCHEDULED arrival time to its future
resolving — so a backed-up queue shows up as latency (no coordinated
omission), unlike the closed-loop rows where clients self-throttle.
Each offered rate runs once per ``--open-loop-knobs`` setting
(``wait_ms:max_batch`` pairs), producing the p50/p99-vs-offered-load
surface that sizes the knobs against a latency SLO (docs/DESIGN.md §9).
A scenario is ``saturated`` when it cannot keep pace with its own
schedule (arrival backlog at the end) — its latencies are still
reported (they are the honest queueing penalty), but achieved fps,
not offered, is the capacity number.

Usage: python benchmarks/serving_load.py [--net resnet_18]
       [--requests 256] [--concurrency 8 32 128] [--http]
       [--open-loop-qps 1000 4000 8000]
       [--open-loop-knobs 2.0:256 0.5:64 8.0:256]
       [--out benchmarks/serving_load_r02.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RAW = 160  # raw camera frame side (override with --raw)
PARAS = (200.0, 200.0, 80.0, 80.0)  # fx fy cx cy matched to RAW=160
FLIP = -1


def main():
    global RAW
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--net", default="resnet_18")
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--requests", type=int, default=256,
                    help="total frames per concurrent scenario")
    ap.add_argument("--sequential-requests", type=int, default=32,
                    help="frames for the (slow) sequential scenario")
    ap.add_argument("--concurrency", type=int, nargs="+",
                    default=[8, 32, 128])
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--http", action="store_true",
                    help="drive through awr_tpu.server.AWRServer on a "
                         "loopback port (JSON/base64 over HTTP) instead "
                         "of in-process BatchingPredictor calls")
    ap.add_argument("--open-loop-qps", type=float, nargs="*",
                    default=[],
                    help="offered request rates for open-loop (fixed-"
                         "QPS) scenarios; empty = closed-loop only")
    ap.add_argument("--open-loop-requests", type=int, default=512,
                    help="frames per open-loop scenario")
    ap.add_argument("--open-loop-knobs", nargs="*",
                    default=["2.0:256"],
                    help="batcher settings per open-loop scenario, "
                         "each 'max_wait_ms:max_batch' or "
                         "'max_wait_ms:max_batch:deadline_ms"
                         "[:max_queue]' (deadline enables latency-"
                         "bounded dispatch + shedding; 0 = off)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="BatchingPredictor pipeline_depth for every "
                         "scenario (recorded per row)")
    ap.add_argument("--deadline-margin", type=float, default=1.0,
                    help="BatchingPredictor deadline_margin for every "
                         "open-loop scenario (recorded per row)")
    ap.add_argument("--prime", action="store_true",
                    help="prime_service_model before each open-loop "
                         "scenario: seeds the per-bucket EWMA with "
                         "measured service so the deadline machinery "
                         "is effective from the FIRST group (the r04 "
                         "cold-model burst transient; recorded per "
                         "row)")
    ap.add_argument("--raw", type=int, default=RAW,
                    help="raw camera frame side (recorded per row; "
                         "service on this transport is upload-bound, "
                         "so capacity depends on it)")
    ap.add_argument("--skip-closed-loop", action="store_true",
                    help="run ONLY the open-loop scenarios (skips the "
                         "sequential + concurrency closed-loop rows "
                         "and their linearity gates — for re-measuring "
                         "open-loop rows on an erratic transport day "
                         "without a closed-loop stall aborting the "
                         "run; open-loop rows carry their own "
                         "saturation accounting)")
    ap.add_argument("--int8", action="store_true",
                    help="serve the int8 graph (Predictor.quantize on "
                         "synthetic calibration frames — service TIME "
                         "is what this benchmark measures, accuracy is "
                         "proven elsewhere); recorded per row")
    ap.add_argument("--out", default="benchmarks/serving_load_r02.jsonl")
    args = ap.parse_args()
    RAW = args.raw

    def parse_knob(k):
        parts = k.split(":")
        wait, batch = float(parts[0]), int(parts[1])
        deadline = (float(parts[2]) if len(parts) > 2
                    and float(parts[2]) > 0 else None)
        # 0 = off, same convention as the deadline field (max_queue=0
        # would be rejected by BatchingPredictor)
        mq = (int(parts[3]) if len(parts) > 3 and int(parts[3]) > 0
              else None)
        return wait, batch, deadline, mq

    knobs = [parse_knob(k) for k in args.open_loop_knobs]
    if args.open_loop_qps and args.http:
        ap.error("--open-loop-qps is in-process only (it paces "
                 "BatchingPredictor.submit directly)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.batching import BatchingPredictor
    from awr_tpu.config import Config
    from awr_tpu.models import build_model
    from awr_tpu.serving import Predictor

    cfg = Config(net=args.net,
                 kernel_size=1.0 if args.net.startswith("resnet") else 0.4,
                 img_size=args.img_size, compute_dtype="bfloat16",
                 use_pallas=False)
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, args.img_size, args.img_size, 1)),
                   train=True)
    pred = Predictor(cfg, {"params": v["params"],
                           "batch_stats": v["batch_stats"]},
                     paras=PARAS, flip=FLIP)
    if args.int8:
        # synthetic calibration: the int8 EXECUTABLE (and therefore its
        # service time, which is what every row here measures) does not
        # depend on the calibration values
        calib_rng = np.random.RandomState(1)
        pred.quantize(calib_rng.uniform(
            -1, 1, (64, args.img_size, args.img_size)
        ).astype(np.float32))

    # every row carries the stack it measured: the SLO surface is
    # family- and frame-shape-dependent (VERDICT r4 weak-3)
    provenance = dict(net=args.net, int8=bool(args.int8),
                      img_size=args.img_size, raw=[RAW, RAW])

    salt = int.from_bytes(os.urandom(4), "little") / 2.0**32
    rng = np.random.RandomState(0)
    center = np.array([0.0, 0.0, 500.0])  # projects to (cx, cy)

    # Pre-generate a pool of globally unique frames (RandomState is not
    # thread-safe, and every request must carry distinct bits so no
    # dispatch is memoizable): hand-depth noise around the 500mm center
    # inside the 300mm cube, salted per run and per request.
    # Exact budget: warmup (<= 2*max_batch frames over the doubling
    # ladder), sequential at n and 2n (linearity gate), and each
    # concurrency scenario at per_client and 2*per_client.
    n_total = 4 * args.max_batch + 3 * args.sequential_requests
    for conc in args.concurrency:
        n_total += 3 * conc * max(1, args.requests // conc)
    if args.open_loop_qps:
        n_total += (len(args.open_loop_qps) * len(knobs)
                    * args.open_loop_requests)
        n_total += 4 * max(b for _, b, *_ in knobs)  # extra warm ladder
    pool = rng.uniform(420.0, 580.0,
                       (n_total, RAW, RAW)).astype(np.float32)
    pool[:, 0, 0] = 500.0 + salt + np.arange(n_total) * 1e-3
    import itertools

    _cursor = itertools.count()  # next() is atomic under the GIL

    def frame(_i=None):
        i = next(_cursor)
        # run-unique guarantee: never re-serve bits within a run
        assert i < n_total, "frame pool exhausted — budget bug"
        return pool[i]

    def linearity(w1, w2, label):
        ratio = w2 / w1
        if not 1.5 <= ratio <= 2.7:
            print(f"REFUSED {label}: 2x requests -> {ratio:.2f}x wall "
                  f"(dispatch artifact, not served throughput)",
                  file=sys.stderr)
            sys.exit(1)
        return round(ratio, 2)

    srv = None
    if args.http:
        import base64
        import urllib.request

        from awr_tpu.server import AWRServer

        srv = AWRServer(pred, host="127.0.0.1", port=0,
                        max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms,
                        pipeline_depth=args.pipeline_depth).start()

        def http_predict_one(img, ctr):
            payload = json.dumps({
                "img_b64": base64.b64encode(
                    np.ascontiguousarray(img, "<f4").tobytes()).decode(),
                "shape": list(img.shape),
                "center_xyz": [float(x) for x in ctr],
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/predict", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                return np.asarray(json.loads(resp.read())["joints_uvd"])

    prefix = "http_" if args.http else ""
    rows = []

    # warm every power-of-two bucket executable this run will hit
    # (remote compiles would otherwise pollute the timings)
    b = 1
    top = min(args.max_batch, 2 * max(args.concurrency))
    if args.open_loop_qps:
        # open-loop dispatch groups can reach any knob's max_batch
        top = max(top, *(b for _, b, *_ in knobs))
    while b <= top:
        pred.predict(np.stack([frame(i) for i in range(b)]),
                     np.tile(center, (b, 1)))
        b *= 2

    # ---- sequential single-frame client (host-synced per request)
    def run_sequential(n):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n):
            if args.http:
                out = http_predict_one(frame(), center)
            else:
                out = pred.predict(frame()[None], center[None])
            acc += float(out.sum())  # host materialization per request
        assert np.isfinite(acc)
        return time.perf_counter() - t0

    n_seq = args.sequential_requests
    if not args.skip_closed_loop:
        if args.http:
            # a lone request would otherwise pay the full max_wait_ms
            # coalescing window per call, conflating batcher wait with
            # the HTTP/JSON overhead this row is meant to isolate
            # (ADVICE r2); restored before the concurrent scenarios
            srv.batcher.max_wait_s = 0.0
        w1 = run_sequential(n_seq)
        w2 = run_sequential(2 * n_seq)  # 2x-work linearity gate
        if args.http:
            srv.batcher.max_wait_s = args.max_wait_ms / 1000.0
        lin = linearity(w1, w2, "sequential")
        rows.append(dict(mode=prefix + "sequential", **provenance,
                         requests=3 * n_seq,
                         wall_s=round(w1 + w2, 3),
                         served_fps=round(3 * n_seq / (w1 + w2), 1),
                         mean_latency_ms=round(1000 * (w1 + w2)
                                               / (3 * n_seq), 2),
                         linearity=lin))
        print(json.dumps(rows[-1]))

    # ---- concurrent closed-loop clients through the batching layer
    def run_batched(conc, per_client):
        latencies = []
        lock = threading.Lock()

        def scenario(submit_one, n_dispatches, n_frames):
            d0, f0 = n_dispatches(), n_frames()
            t0 = time.perf_counter()

            def client(cid):
                for _ in range(per_client):
                    t1 = time.perf_counter()
                    r = submit_one()
                    lat = time.perf_counter() - t1
                    assert np.isfinite(np.asarray(r)).all()
                    with lock:
                        latencies.append(lat)

            threads = [threading.Thread(target=client, args=(c,))
                       for c in range(conc)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            return dt, latencies, n_dispatches() - d0, n_frames() - f0

        if args.http:
            # coalescing happens inside the server's batching layer
            return scenario(lambda: http_predict_one(frame(), center),
                            lambda: srv.batcher.n_dispatches,
                            lambda: srv.batcher.n_frames)
        with BatchingPredictor(pred, max_batch=args.max_batch,
                               max_wait_ms=args.max_wait_ms,
                               pipeline_depth=args.pipeline_depth) as bp:
            return scenario(
                lambda: bp.submit(frame(), center).result(timeout=600),
                lambda: bp.n_dispatches, lambda: bp.n_frames)

    for conc in (args.concurrency if not args.skip_closed_loop else []):
        per_client = max(1, args.requests // conc)
        w1, _, _, _ = run_batched(conc, per_client)
        # linearity gate: 2x requests per client must take ~2x wall
        w2, latencies, n_disp, n_frames = run_batched(
            conc, 2 * per_client)
        lin = linearity(w1, w2, f"{prefix}batched_c{conc}")
        served = conc * 2 * per_client
        rows.append(dict(
            mode=f"{prefix}batched_c{conc}", **provenance,
            requests=served,
            pipeline_depth=args.pipeline_depth,
            wall_s=round(w2, 3),
            served_fps=round(served / w2, 1),
            mean_latency_ms=round(
                1000 * float(np.mean(latencies)), 2),
            p99_latency_ms=round(
                1000 * float(np.percentile(latencies, 99)), 2),
            dispatches=n_disp,
            frames_per_dispatch=round(n_frames / max(n_disp, 1), 1),
            linearity=lin))
        print(json.dumps(rows[-1]))

    # ---- open-loop (fixed offered QPS) scenarios: latency vs load
    def run_open_loop(qps, wait_ms, max_batch, n, deadline_ms=None,
                      max_queue=None):
        """Submit ``n`` frames at a fixed rate; latency is measured
        from each request's SCHEDULED arrival (t0 + i/qps), so queue
        backlog counts against latency (no coordinated omission).

        With ``deadline_ms``/``max_queue`` set (the overload defenses,
        batching.py module docstring), requests may be SHED
        (DeadlineExceeded on the future) or REJECTED at admission
        (QueueFull from submit); both are counted, latency percentiles
        cover SERVED requests only, and qps_served is the capacity
        number (the r03 rows without defenses showed served throughput
        collapsing non-monotonically under overload — convoys)."""
        from awr_tpu.batching import DeadlineExceeded, QueueFull

        with BatchingPredictor(pred, max_batch=max_batch,
                               max_wait_ms=wait_ms,
                               pipeline_depth=args.pipeline_depth,
                               deadline_ms=deadline_ms,
                               max_queue=max_queue,
                               deadline_margin=args.deadline_margin
                               ) as bp:
            prime_s = None
            if args.prime:
                bp.prime_service_model((RAW, RAW))
                prime_s = bp.prime_stats["total_s"]
            # priming dispatches count in bp's counters; the row
            # reports the scenario's own dispatch stats
            d0, f0 = bp.n_dispatches, bp.n_frames
            futures = [None] * n
            sched = []
            done = [0.0] * n  # completion stamps, written by whichever
            # thread resolves each future (the completer thread runs
            # the done-callbacks) the moment it resolves — NOT after
            # the paced submission loop finishes (stamping at gather
            # time inflated every pre-saturation latency by the
            # remaining submission window; caught in the r3 run)
            t0 = time.perf_counter() + 0.05  # headroom for first tick
            behind = 0.0
            rejected = 0
            for i in range(n):
                t_sched = t0 + i / qps
                now = time.perf_counter()
                if now < t_sched:
                    time.sleep(t_sched - now)
                else:
                    behind = max(behind, now - t_sched)
                sched.append(t_sched)
                try:
                    fut = bp.submit(frame(), center)
                except QueueFull:
                    rejected += 1
                    done[i] = -1.0  # admission rejection: synchronous
                    continue
                fut.add_done_callback(
                    lambda f, i=i: done.__setitem__(
                        i, time.perf_counter()))
                futures[i] = fut
            shed = 0
            for i, fut in enumerate(futures):
                if fut is None:
                    continue
                try:
                    out = fut.result(timeout=600)
                    assert np.isfinite(np.asarray(out)).all()
                except DeadlineExceeded:
                    shed += 1
                    continue
            # result() waiters wake BEFORE done-callbacks run (CPython
            # set_result notifies, then invokes callbacks), so the last
            # stamps may still be in flight here — wait them out
            deadline = time.perf_counter() + 10.0
            while any(d == 0.0 for d in done):
                if time.perf_counter() > deadline:
                    raise RuntimeError("completion stamps missing")
                time.sleep(0.001)
            served_lat = [d - s for d, s, f in zip(done, sched, futures)
                          if f is not None and not f.exception()]
            n_served = len(served_lat)
            t_end = max(done)
            n_disp = bp.n_dispatches - d0
            n_dispatched_frames = bp.n_frames - f0
            assert shed == bp.n_shed and rejected == bp.n_rejected
        lat_ms = np.asarray(served_lat) * 1e3 if served_lat else \
            np.asarray([float("nan")])
        served_qps = n_served / (t_end - t0)
        # saturated = the pacing thread itself fell behind schedule OR
        # the stack could not serve ~all offered requests in time
        saturated = bool(behind > 0.25 / qps * n
                         or served_qps < 0.9 * qps)
        return dict(
            mode="openloop", **provenance, prime_s=prime_s,
            qps_offered=qps,
            qps_achieved=round(served_qps, 1), requests=n,
            served=n_served, shed=shed, rejected=rejected,
            max_wait_ms=wait_ms, max_batch=max_batch,
            deadline_ms=deadline_ms, max_queue=max_queue,
            pipeline_depth=args.pipeline_depth,
            deadline_margin=args.deadline_margin,
            primed=bool(args.prime),
            p50_latency_ms=round(float(np.percentile(lat_ms, 50)), 2),
            p99_latency_ms=round(float(np.percentile(lat_ms, 99)), 2),
            mean_latency_ms=round(float(np.mean(lat_ms)), 2),
            dispatches=n_disp,
            frames_per_dispatch=round(n_dispatched_frames
                                      / max(n_disp, 1), 1),
            saturated=saturated)

    for wait_ms, max_batch, deadline_ms, max_queue in (
            knobs if args.open_loop_qps else []):
        for qps in args.open_loop_qps:
            rows.append(run_open_loop(qps, wait_ms, max_batch,
                                      args.open_loop_requests,
                                      deadline_ms, max_queue))
            print(json.dumps(rows[-1]))

    if srv is not None:
        srv.close()
    with open(args.out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
