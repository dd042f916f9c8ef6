"""HTTP inference server (awr_tpu/server.py): network clients through
the dynamic-batching layer to the Predictor.

Beyond-reference capability (the reference has no serving surface); the
contract is ours: HTTP responses carry exactly the rows a direct
``Predictor.predict`` returns, concurrent clients coalesce into fewer
device dispatches, and malformed requests get 4xx JSON errors without
killing the server."""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awr_tpu.config import Config
from awr_tpu.data.synthetic import SyntheticHandDataset
from awr_tpu.models import build_model
from awr_tpu.server import AWRServer
from awr_tpu.serving import Predictor

IMG = 32


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(net="resnet_18", kernel_size=1.0, img_size=IMG,
                 use_pallas=False)
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 1)),
                   train=True)
    return Predictor(cfg, {"params": v["params"],
                           "batch_stats": v["batch_stats"]})


@pytest.fixture(scope="module")
def server(predictor):
    # port=0: ephemeral port, no collisions between test runs
    with AWRServer(predictor, host="127.0.0.1", port=0,
                   max_wait_ms=5.0).start() as srv:
        yield srv


@pytest.fixture(scope="module")
def frames():
    ds = SyntheticHandDataset(8, 14, IMG, phase="test", seed=3,
                              layout="grid")
    items = [ds.raw_item(i) for i in range(8)]
    return (np.stack([it[0] for it in items]),
            np.stack([it[2] for it in items]))


def _post(srv, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(srv, path, timeout=30):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=timeout) as r:
        return json.loads(r.read())


def test_healthz(server):
    h = _get(server, "/healthz")
    assert h["ok"] and h["net"] == "resnet_18" and h["jt_num"] == 14
    assert h["int8"] is False
    # per-(bucket, frame-shape) service model (ms): a dict of
    # {"bucket@HxW": {"p50", "p90", "n"}}, populated once the
    # completer has measured at least one dispatched group
    assert isinstance(h["service_model_ms"], dict)
    if server.batcher.n_dispatches:
        for st in h["service_model_ms"].values():
            assert st["p50"] > 0 and st["p90"] >= st["p50"]
            assert st["n"] >= 1


def test_predict_matches_direct(server, predictor, frames):
    imgs, centers = frames
    expected = predictor.predict(imgs[:1], centers[:1])[0]
    got = _post(server, "/predict", {
        "img": imgs[0].tolist(), "center_xyz": centers[0].tolist()})
    np.testing.assert_allclose(np.asarray(got["joints_uvd"]), expected,
                               rtol=1e-4, atol=1e-4)


def test_predict_b64_matches_json(server, frames):
    imgs, centers = frames
    a = _post(server, "/predict", {
        "img": imgs[0].tolist(), "center_xyz": centers[0].tolist()})
    b = _post(server, "/predict", {
        "img_b64": base64.b64encode(
            np.ascontiguousarray(imgs[0], "<f4").tobytes()).decode(),
        "shape": list(imgs[0].shape),
        "center_xyz": centers[0].tolist()})
    np.testing.assert_allclose(a["joints_uvd"], b["joints_uvd"],
                               rtol=1e-5, atol=1e-5)


def test_predict_batch_route(server, predictor, frames):
    imgs, centers = frames
    expected = predictor.predict(imgs, centers)
    got = _post(server, "/predict_batch", {
        "imgs": imgs.tolist(), "centers_xyz": centers.tolist()})
    np.testing.assert_allclose(np.asarray(got["joints_uvd"]), expected,
                               rtol=1e-4, atol=1e-4)


def test_concurrent_clients_coalesce(server, predictor, frames):
    imgs, centers = frames
    before = server.batcher.n_dispatches
    expected = predictor.predict(imgs, centers)
    results = [None] * len(imgs)
    errors = []

    def client(i):
        try:
            out = _post(server, "/predict", {
                "img": imgs[i].tolist(),
                "center_xyz": centers[i].tolist()})
            results[i] = np.asarray(out["joints_uvd"])
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for i in range(len(imgs)):
        np.testing.assert_allclose(results[i], expected[i],
                                   rtol=1e-4, atol=1e-4)
    # 8 concurrent requests must not cost 8 device dispatches
    assert server.batcher.n_dispatches - before < len(imgs)


def test_malformed_requests_get_4xx(server, frames):
    imgs, centers = frames
    bad = [
        ("/predict", {"center_xyz": centers[0].tolist()}),  # no img
        ("/predict", {"img": imgs[0].tolist(),
                      "center_xyz": [1.0, 2.0]}),  # bad center
        ("/predict", {"img": [1.0, 2.0],
                      "center_xyz": centers[0].tolist()}),  # 1-D img
        ("/predict_batch", {"imgs": imgs.tolist(),
                            "centers_xyz": centers[:2].tolist()}),
        ("/nope", {}),
    ]
    for path, obj in bad:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, path, obj)
        assert exc.value.code in (400, 404)
        assert "error" in json.loads(exc.value.read())
    # server still healthy afterwards
    assert _get(server, "/healthz")["ok"]


def test_predict_batch_goes_through_dispatcher(server, predictor, frames):
    """/predict_batch must not touch the Predictor from handler threads
    (ADVICE r2): its frames are accounted by the batching layer."""
    imgs, centers = frames
    before = server.batcher.n_frames
    out = _post(server, "/predict_batch",
                {"imgs": imgs[:3].tolist(),
                 "centers_xyz": centers[:3].tolist()})
    assert np.asarray(out["joints_uvd"]).shape[0] == 3
    assert server.batcher.n_frames == before + 3


def _post_status(srv, path, obj):
    """POST returning (status, parsed body) without raising on 4xx."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_oversized_body_rejected_413(server):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                      timeout=30)
    conn.putrequest("POST", "/predict")
    # claim a body far beyond max_request_bytes; send nothing
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length",
                   str(server.max_request_bytes + 1))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_absurd_shape_rejected_400(server, frames):
    imgs, centers = frames
    # 2048 tiny frames: fits the body cap but exceeds MAX_FRAMES
    b = 2048
    buf = base64.b64encode(np.zeros((b, 2, 2), "<f4").tobytes()).decode()
    status, out = _post_status(
        server, "/predict_batch",
        {"imgs_b64": buf, "shape": [b, 2, 2],
         "centers_xyz": [[0.0, 0.0, 500.0]] * b})
    assert status == 400
    assert "limit" in out.get("error", "")


def test_overload_returns_503_and_recovers(frames):
    """Admission control end to end: with max_queue bounded and the
    device gated shut, the overflow request gets 503 + Retry-After
    (retryable JSON), accepted requests still serve once the device
    frees up, and /healthz exposes the rejected counter.

    Uses a gated stub predictor — the real device path cannot be made
    deterministically 'busy' from a test."""
    import time as _time

    from tests.test_batching import _StubPredictor

    gate = threading.Event()
    stub = _StubPredictor(gate=gate)
    imgs, centers = frames

    def payload(i):
        return {"img": imgs[i].tolist(),
                "center_xyz": [float(x) for x in centers[i]]}

    with AWRServer(stub, host="127.0.0.1", port=0, max_batch=1,
                   max_wait_ms=0.0, max_queue=1,
                   pipeline_depth=1).start() as srv:
        results = {}

        def client(i):
            results[i] = _post_status(srv, "/predict", payload(i))

        # requests 0-2 saturate the depth-1 dispatch pipeline (one
        # popped by the gated completer, one in the pipeline queue, one
        # blocked in the dispatcher's put); request 3 fills the
        # 1-frame admission queue — all four accepted
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for i, t in enumerate(threads):
            t.start()
            deadline = _time.time() + 30
            while (srv.batcher.n_dispatches
                   + srv.batcher._queued_frames) < i + 1:
                assert _time.time() < deadline, (
                    i, srv.batcher.n_dispatches,
                    srv.batcher._queued_frames)
                _time.sleep(0.005)
        assert (srv.batcher.n_dispatches, srv.batcher._queued_frames) \
            == (3, 1)
        status, body = _post_status(srv, "/predict", payload(0))
        assert status == 503
        assert body.get("retryable") is True
        gate.set()
        for t in threads:
            t.join(timeout=60)
        assert all(results[i][0] == 200 for i in range(4)), results
        h = _get(srv, "/healthz")
        assert h["rejected"] == 1 and h["frames"] == 4
