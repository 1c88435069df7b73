"""HTTP serving front end: raw-bytes requests, JSON responses, loud
4xx on contract violations."""

import http.client
import json
import threading

import numpy as np
import pytest

from scat_tpu.config import Options
from scat_tpu.serving import HandPosePredictor
from scat_tpu.server import make_server

IMG = 64


@pytest.fixture(scope="module")
def served():
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent")
    predictor = HandPosePredictor.from_checkpoint(opt, image_size=IMG)
    httpd = make_server(predictor, port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield predictor, httpd.server_address[1]
    httpd.shutdown()
    httpd.server_close()


def _post(port, body, shape, dtype):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/predict", body=body, headers={
        "X-Shape": ",".join(str(s) for s in shape), "X-Dtype": dtype})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


@pytest.mark.slow
def test_predict_roundtrip(served, rng):
    predictor, port = served
    imgs = (rng.rand(3, IMG, IMG, 3) * 255).astype(np.uint8)
    status, out = _post(port, imgs.tobytes(), imgs.shape, "uint8")
    assert status == 200
    local = predictor.predict(imgs)
    np.testing.assert_allclose(np.asarray(out["joints_3d"]),
                               local["joints_3d"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["camera"]),
                               local["camera"], atol=1e-5)
    # float32 body rides the float program
    f = imgs.astype(np.float32) / 127.5 - 1.0
    status, out_f = _post(port, f.tobytes(), f.shape, "float32")
    assert status == 200
    np.testing.assert_allclose(np.asarray(out_f["joints_3d"]),
                               local["joints_3d"], atol=1e-5)


@pytest.mark.slow
def test_concurrent_clients(served, rng):
    """Parallel requests must all complete (the predictor lock
    serializes device work; the threaded server must not deadlock) and
    each client must get its own answer back."""
    predictor, port = served
    imgs = (rng.rand(4, 2, IMG, IMG, 3) * 255).astype(np.uint8)
    results = [None] * 4

    def hit(i):
        results[i] = _post(port, imgs[i].tobytes(), imgs[i].shape,
                           "uint8")

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(4):
        status, out = results[i]
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["joints_3d"]),
            predictor.predict(imgs[i])["joints_3d"], atol=1e-5)


@pytest.mark.slow
def test_micro_batching_coalesces(served, rng):
    """With a batching window, concurrent single-crop requests must
    ride fewer device batches than requests — and every client still
    gets exactly its own answer."""
    predictor, _ = served
    from scat_tpu.server import MicroBatcher, make_server
    httpd = make_server(predictor, port=0, batch_window_ms=1000.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    # reach through the handler class to the batcher for its counters
    batcher = httpd.RequestHandlerClass.predictor
    assert isinstance(batcher, MicroBatcher)

    imgs = (rng.rand(6, 1, IMG, IMG, 3) * 255).astype(np.uint8)
    results = [None] * 6

    def hit(i):
        results[i] = _post(port, imgs[i].tobytes(), imgs[i].shape,
                           "uint8")

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(6):
        status, out = results[i]
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["joints_3d"]),
            predictor.predict(imgs[i])["joints_3d"], atol=1e-5)
    assert batcher.requests_served == 6
    # a 1 s window must coalesce a simultaneous burst of 6
    assert batcher.batches_run < 6
    httpd.shutdown()
    # server_close must end the dispatcher thread (leak guard) and
    # further predicts must fail loudly, not hang
    httpd.server_close()
    assert not batcher._thread.is_alive()
    with pytest.raises(RuntimeError):
        batcher.predict(imgs[0])


@pytest.mark.slow
def test_predictor_failure_returns_500(rng):
    """A device/runtime error inside predict must come back as a 500
    JSON body, not a connection reset — including through the
    micro-batcher, where one failure fans out to every coalesced
    client."""
    class Boom:
        image_size = IMG

        def predict(self, images):
            raise RuntimeError("synthetic device OOM")

    for window in (0.0, 50.0):
        httpd = make_server(Boom(), port=0, batch_window_ms=window)
        threading.Thread(target=httpd.serve_forever,
                         daemon=True).start()
        port = httpd.server_address[1]
        imgs = (rng.rand(1, IMG, IMG, 3) * 255).astype(np.uint8)
        status, err = _post(port, imgs.tobytes(), imgs.shape, "uint8")
        assert status == 500 and "synthetic device OOM" in err["error"]
        httpd.shutdown()
        httpd.server_close()


@pytest.mark.slow
def test_healthz_and_errors(served, rng):
    _, port = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    health = json.loads(resp.read())
    assert resp.status == 200 and health["status"] == "ok"
    assert health["image_size"] == IMG

    imgs = (rng.rand(2, IMG, IMG, 3) * 255).astype(np.uint8)
    # wrong crop size
    status, err = _post(port, imgs.tobytes(), (2, 32, 32, 3), "uint8")
    assert status == 400 and "X-Shape" in err["error"]
    # body length disagrees with the declared shape
    status, err = _post(port, imgs.tobytes()[:-1], imgs.shape, "uint8")
    assert status == 400 and "bytes" in err["error"]
    # unsupported dtype
    status, err = _post(port, imgs.tobytes(), imgs.shape, "int16")
    assert status == 400 and "X-Dtype" in err["error"]
    # unknown route
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    # oversized declared batch: the body is buffered whole on the host,
    # so the server must refuse before reading it (413), not OOM
    status, err = _post(port, b"", (100000, IMG, IMG, 3), "uint8")
    assert status == 413 and "exceeds" in err["error"]
