"""Dynamic request batching for serving: coalesce concurrent single-
frame requests into device batches.

The reference has no serving story at all (test.py is an offline eval
loop); serving.Predictor already gives one-call batch inference with
power-of-two executable bucketing.  This module adds the piece a
production deployment puts in front of it: a thread-safe queue that
accepts requests from many client threads, groups everything that
arrives within a small window into ONE device dispatch, and hands each
client back its own rows.  Batching is where TPU serving throughput
comes from — the measured chip numbers (benchmarks/
sweep_r02_smallbatch.jsonl) show batch-8 costs the same wall time as
batch-1 (1.06 ms/frame vs 8.4), so coalescing 8 concurrent requests is
a ~8x throughput win at ~zero latency cost.

Design notes (TPU-shaped):
- One dispatcher thread owns the device; clients never touch JAX
  state, so there is no cross-thread tracing or dispatch contention.
- Dispatch and finalize are PIPELINED: the dispatcher enqueues the
  whole device chain without blocking (``Predictor.predict_async``)
  and a single completer thread blocks on results in dispatch order,
  so group N+1's host prep + upload overlaps group N's execution +
  download.  On a transport with real round-trip latency (the serving
  case this was measured on), un-overlapped RTT — not device compute —
  is the capacity ceiling; ``pipeline_depth`` bounds dispatched-but-
  unfinalized groups so a slow consumer backpressures instead of
  queueing unbounded device work.
- The dispatcher drains WHATEVER is queued (up to ``max_batch``) the
  moment it goes idle; ``max_wait_ms`` only caps how long the FIRST
  request of a group waits for company while the device is free.
  Under load the device never sits idle waiting for a timer.
- Predictor's bucketing pads each group to a power-of-two, so the
  number of distinct compiled executables stays logarithmic in
  ``max_batch`` no matter what group sizes the traffic produces.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence, Tuple

import numpy as np


class _Request:
    __slots__ = ("imgs", "centers", "cubes", "future", "batched")

    def __init__(self, imgs, centers, cubes, future, batched=False):
        self.imgs = imgs
        self.centers = centers
        self.cubes = cubes
        self.future = future
        # batched requests resolve to (B, J, 3); single-frame to (J, 3)
        self.batched = batched


class BatchingPredictor:
    """Thread-safe dynamic-batching front end for a
    :class:`~awr_tpu.serving.Predictor`.

    Usage::

        bp = BatchingPredictor(predictor, max_batch=64, max_wait_ms=2.0)
        fut = bp.submit(frame, center_xyz)       # from any thread
        joints = fut.result()                    # (J, 3) camera uvd
        ...
        bp.close()

    ``submit`` never blocks on the device; it returns a
    ``concurrent.futures.Future``.  ``predict`` is the blocking
    convenience wrapper.  All requests in a drained group are served by
    one ``Predictor.predict`` call (one device dispatch per bucket).
    """

    def __init__(self, predictor, max_batch: int = 64,
                 max_wait_ms: float = 2.0, pipeline_depth: int = 2):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self._p = predictor
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        # serializes the closed-check-then-enqueue in submit() against
        # the flag-set-then-sentinel in close(): without it a submit
        # could land its request BEHIND the sentinel and hang forever
        self._submit_lock = threading.Lock()
        # observability: groups dispatched and frames served so far
        self.n_dispatches = 0
        self.n_frames = 0
        # dispatch/finalize pipeline: the dispatcher enqueues device
        # work via Predictor.predict_async and hands (finalize, group)
        # here; the completer thread blocks on results and resolves
        # futures.  The bounded queue is the backpressure: at most
        # ``pipeline_depth`` groups are dispatched-but-unfinalized, so
        # the next group's upload overlaps the previous group's device
        # execution + result download instead of waiting for it.
        self._cq: "queue.Queue[Optional[tuple]]" = queue.Queue(
            maxsize=int(pipeline_depth))
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="awr-batching-dispatch")
        self._completer = threading.Thread(target=self._complete,
                                           daemon=True,
                                           name="awr-batching-complete")
        self._worker.start()
        self._completer.start()

    # ------------------------------------------------------------ client
    def submit(self, img, center_xyz, cube=None) -> Future:
        """Enqueue ONE frame; returns a Future of (J, 3) camera-coord
        joints (same convention as Predictor.predict rows)."""
        img = np.asarray(img, np.float32)
        if img.ndim != 2:
            raise ValueError(f"submit takes one (H, W) frame, got "
                             f"{img.shape}")
        fut: Future = Future()
        req = _Request(img[None],
                       np.asarray(center_xyz, np.float64)[None],
                       None if cube is None
                       else np.asarray(cube, np.float64)[None],
                       fut)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchingPredictor is closed")
            self._q.put(req)
        return fut

    def submit_batch(self, imgs, centers_xyz, cubes=None) -> Future:
        """Enqueue a MULTI-frame request; returns a Future of (B, J, 3)
        camera-coord joints.

        Keeps the module invariant that ONE dispatcher thread owns the
        device: callers with pre-formed batches (e.g. the HTTP
        /predict_batch route) must come through here rather than
        calling Predictor directly from their own thread — two threads
        first-hitting a new power-of-two bucket would race duplicate
        multi-minute remote compiles, and concurrent dispatch is what
        wedges the tunneled single chip."""
        imgs = np.asarray(imgs, np.float32)
        if imgs.ndim != 3:
            raise ValueError(f"submit_batch takes (B, H, W) frames, "
                             f"got {imgs.shape}")
        centers = np.asarray(centers_xyz, np.float64)
        if centers.shape != (len(imgs), 3):
            raise ValueError("'centers_xyz' must be (B, 3)")
        if cubes is not None:
            cubes = np.asarray(cubes, np.float64)
            if cubes.shape != (len(imgs), 3):
                raise ValueError("'cubes' must be (B, 3)")
        fut: Future = Future()
        req = _Request(imgs, centers, cubes, fut, batched=True)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchingPredictor is closed")
            self._q.put(req)
        return fut

    def predict(self, img, center_xyz, cube=None, timeout=None):
        """Blocking single-frame convenience wrapper around
        :meth:`submit`."""
        return self.submit(img, center_xyz, cube).result(timeout=timeout)

    def predict_batch(self, imgs, centers_xyz, cubes=None, timeout=None):
        """Blocking multi-frame convenience wrapper around
        :meth:`submit_batch`."""
        return self.submit_batch(imgs, centers_xyz,
                                 cubes).result(timeout=timeout)

    def close(self, wait: bool = True):
        """Stop accepting requests; drain the queue, then stop the
        dispatcher.  Pending futures still complete; a request that
        races past the closed check as the sentinel lands is failed
        rather than left hanging."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # sentinel; no submit can enqueue after
        if wait:
            self._worker.join()     # dispatches the backlog, then
            self._completer.join()  # finalizes every in-flight group

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -------------------------------------------------------- dispatcher
    def _drain(self) -> Tuple[List[_Request], bool]:
        """Collect the next group: block for the first request, then
        wait at most ``max_wait_s`` for more, then sweep whatever is
        queued up to ``max_batch``.  Returns (group, sentinel_seen)."""
        first = self._q.get()
        if first is None:
            return [], True
        group = [first]
        frames = first.imgs.shape[0]
        deadline_wait = self.max_wait_s
        stop = False
        # max_batch bounds total FRAMES per group (a single submit_batch
        # larger than max_batch still dispatches alone; Predictor's
        # bucketing handles any size)
        while frames < self.max_batch:
            try:
                nxt = self._q.get(timeout=deadline_wait)
            except queue.Empty:
                break
            if nxt is None:
                stop = True
                break
            group.append(nxt)
            frames += nxt.imgs.shape[0]
            # after the grace window only sweep what is already queued
            deadline_wait = 0.0
        return group, stop

    def _run(self):
        while True:
            group, stop = self._drain()
            if group:
                self._dispatch(group)
            if stop:
                # propagate the sentinel consumed mid-drain? No: _drain
                # returns stop only after consuming it; exit after the
                # final group completes.
                break
        self._cq.put(None)  # all groups dispatched; stop the completer

    def _dispatch(self, all_requests: Sequence[_Request]):
        # clients may send different camera resolutions; frames only
        # stack per shape, so dispatch one device call per shape group
        by_shape = {}
        for r in all_requests:
            by_shape.setdefault(r.imgs.shape[1:], []).append(r)
        for group in by_shape.values():
            self._dispatch_same_shape(group)

    def _dispatch_same_shape(self, group: Sequence[_Request]):
        try:
            imgs = np.concatenate([r.imgs for r in group])
            centers = np.concatenate([r.centers for r in group])
            if any(r.cubes is not None for r in group):
                default = np.asarray(self._p.cfg.cube, np.float64)
                cubes = np.concatenate([
                    r.cubes if r.cubes is not None
                    else np.repeat(default[None], len(r.imgs), axis=0)
                    for r in group])
            else:
                cubes = None
            # per-request failures (malformed centers/cubes) surface
            # HERE, in the host-prep half of predict_async, so the
            # solo-retry isolation below still catches them; only the
            # device sync is deferred to the completer
            finalize = self._p.predict_async(imgs, centers, cubes)
            self.n_dispatches += 1
            self.n_frames += len(imgs)
            self._cq.put((finalize, list(group)))  # blocks at depth
        except BaseException as e:  # noqa: BLE001 - must fail futures
            if len(group) > 1:
                # one malformed request must not fail its co-batched
                # neighbours: retry each request alone so only the
                # offender's future carries the exception
                for r in group:
                    self._dispatch_same_shape([r])
                return
            r = group[0]
            if not r.future.done():
                r.future.set_exception(e)

    # --------------------------------------------------------- completer
    def _complete(self):
        """Resolve dispatched groups in dispatch order.

        A failure that first surfaces at finalize time (i.e. AFTER the
        device accepted the dispatch) is an infrastructure fault —
        device OOM, a wedged transport — not a malformed request, so it
        fails every future in the group rather than re-running the
        group solo through a device that is already unhealthy."""
        while True:
            item = self._cq.get()
            if item is None:
                return
            finalize, group = item
            try:
                out = finalize()
                off = 0
                for r in group:
                    n = r.imgs.shape[0]
                    r.future.set_result(out[off:off + n] if r.batched
                                        else out[off])
                    off += n
            except BaseException as e:  # noqa: BLE001 - must fail futures
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
