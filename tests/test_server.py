"""HTTP inference server + micro-batcher (engine/server.py).

The reference has no serving surface at all (predictions require the full
test.py eval entry over a dataset tree); these tests pin the new
export -> serve contract: responses match the direct Predictor output
exactly, concurrent requests coalesce into batched device calls, and the
HTTP layer handles the error paths."""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from ucd_tpu import config
from ucd_tpu.engine import build_train_state
from ucd_tpu.engine.checkpoint import save_checkpoint
from ucd_tpu.engine.export import export_inference, load_inference
from ucd_tpu.engine.predictor import Predictor
from ucd_tpu.engine.server import (MicroBatcher, make_server,
                                   shutdown_server)
from ucd_tpu.models import make_model


def _small_cfg(**kw):
    return config.make_config(
        dataset="voc", task="19-1", step=0, method="FT", epochs=1,
        batch_size=2, crop_size=32, backbone="resnet50", dtype="float32",
        pretrained=False, overlap=True, pooling=4, **kw)


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    cfg = _small_cfg()
    model = make_model(cfg)
    state, _ = build_train_state(cfg, model, jax.random.key(0), 4,
                                 input_shape=(1, 32, 32, 3))
    ckpt = os.path.join(d, "ckpt")
    save_checkpoint(ckpt, state, epoch=0, best_score=0.0)
    out = os.path.join(d, "model.npz")
    export_inference(ckpt, out, cfg, export_dtype="float32")
    return out


@pytest.fixture(scope="module")
def server(npz_path):
    srv = make_server(npz_path, host="127.0.0.1", port=0, batch_size=4,
                      bucket=32, max_wait_ms=150.0, fused=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    shutdown_server(srv)


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post_image(srv, img_u8, fmt="ids"):
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    req = urllib.request.Request(_url(srv, f"/predict?format={fmt}"),
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _direct_predict(npz_path, img_u8):
    """Batch-1 prediction through the SAME padded-bucket layout the server
    uses (padding changes the ASPP global-pool context, so an unpadded
    native-size run is a different — equally valid — prediction)."""
    from ucd_tpu.engine.export import _bucket_hw
    model, variables, _ = load_inference(npz_path)
    p = Predictor(model, variables, fused=False)
    h, w = img_u8.shape[:2]
    hb, wb = _bucket_hw(h, w, 32)
    arr = np.zeros((1, hb, wb, 3), np.uint8)
    arr[0, :h, :w] = img_u8
    return np.asarray(p.predict_labels(arr))[0, :h, :w]


def test_predict_ids_matches_direct(server, npz_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    status, ctype, body = _post_image(server, img, "ids")
    assert status == 200 and ctype == "image/png"
    got = np.asarray(Image.open(io.BytesIO(body)))
    want = _direct_predict(npz_path, img).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_predict_crops_to_native_size(server):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (20, 45, 3), np.uint8)  # pads to 32x64
    status, _, body = _post_image(server, img, "ids")
    assert status == 200
    got = np.asarray(Image.open(io.BytesIO(body)))
    assert got.shape == (20, 45)


def test_predict_json_and_color(server, npz_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    status, ctype, body = _post_image(server, img, "json")
    assert status == 200 and ctype == "application/json"
    obj = json.loads(body)
    want = _direct_predict(npz_path, img)
    np.testing.assert_array_equal(np.asarray(obj["ids"]), want)
    hist = {int(k): v for k, v in obj["class_pixels"].items()}
    assert sum(hist.values()) == 32 * 32
    status, ctype, body = _post_image(server, img, "color")
    assert status == 200 and ctype == "image/png"
    # the color PNG is palettized (P mode): decoded RGB must equal the
    # dataset-palette lookup of the predicted ids exactly
    arr = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    assert arr.shape == (32, 32, 3)
    from ucd_tpu.utils.viz import Label2Color, color_map
    np.testing.assert_array_equal(arr, Label2Color(color_map("voc"))(want))


def test_healthz_and_errors(server):
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"
    assert obj["model"]["format"] == "ucd_tpu.inference.v1"
    assert "batches" in obj["stats"]

    req = urllib.request.Request(_url(server, "/predict"),
                                 data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    req = urllib.request.Request(_url(server, "/predict?format=bogus"),
                                 data=b"x", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(server, "/nope"))
    assert e.value.code == 404


@pytest.mark.slow  # re-tiered r5: keep the default selection <5 min
def test_concurrent_requests_match_serial(server, npz_path):
    """8 concurrent mixed-size posts (two buckets, more than one batch):
    every response must equal the direct batch-1 prediction."""
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (32, 32, 3), np.uint8) for _ in range(5)]
    imgs += [rng.randint(0, 255, (40, 40, 3), np.uint8) for _ in range(3)]
    results = [None] * len(imgs)

    def worker(i):
        _, _, body = _post_image(server, imgs[i], "ids")
        results[i] = np.asarray(Image.open(io.BytesIO(body)))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, img in enumerate(imgs):
        want = _direct_predict(npz_path, img).astype(np.uint8)
        np.testing.assert_array_equal(results[i], want, err_msg=f"img {i}")


class _CountingPredictor:
    """Predictor stub: argmax over nothing — records call shapes."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def predict_labels(self, arr):
        with self.lock:
            self.calls.append(arr.shape)
        return np.zeros(arr.shape[:3], np.int32)


def test_microbatcher_coalesces():
    """Concurrent submits within the wait window become ONE device call."""
    p = _CountingPredictor()
    mb = MicroBatcher(p, bucket=32, batch_size=4, max_wait_ms=400.0)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        threads = [threading.Thread(target=mb.submit, args=(img,))
                   for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = mb.stats()
        assert stats["images"] == 4
        # a full bucket dispatches immediately: exactly one batched call
        assert stats["batches"] == 1, p.calls
        assert p.calls == [(4, 32, 32, 3)]
    finally:
        mb.close()


def test_microbatcher_pads_partial_to_compiled_batch():
    p = _CountingPredictor()
    mb = MicroBatcher(p, bucket=32, batch_size=4, max_wait_ms=50.0)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        # full chunk first: compiles the batch-4 program
        threads = [threading.Thread(target=mb.submit, args=(img,))
                   for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # then a lone request: pads to the compiled batch (padded_rows=3)
        mb.submit(img)
        stats = mb.stats()
        assert stats["images"] == 5
        assert stats["padded_rows"] == 3
        assert p.calls[-1] == (4, 32, 32, 3)
    finally:
        mb.close()


class _LazyArr:
    """Mimics jax async dispatch: the value exists immediately, the fetch
    (np.asarray -> __array__) happens later and may raise (async device
    errors materialize at fetch time)."""

    def __init__(self, arr, log, idx, poison=False):
        self.arr, self.log, self.idx, self.poison = arr, log, idx, poison

    def __array__(self, dtype=None, copy=None):
        time.sleep(0.02)  # queued peers pile up while a fetch is in flight
        self.log.append(("fetch", self.idx))
        if self.poison:
            raise RuntimeError("async device error")
        return self.arr


class _LazyPredictor:
    """Dispatch returns a lazy handle; the event log records dispatch vs
    fetch ordering so tests can assert real overlap."""

    def __init__(self):
        self.log = []
        self.n = 0

    def predict_labels(self, arr):
        idx = self.n
        self.n += 1
        self.log.append(("dispatch", idx))
        return _LazyArr(np.zeros(arr.shape[:3], np.int32), self.log, idx,
                        poison=bool(arr.max() == 255))


def test_microbatcher_pipelines_chunks_under_load():
    """With traffic queued, chunk N+1 is DISPATCHED before chunk N's result
    is fetched (jax-async overlap), and every waiter still gets its
    result."""
    p = _LazyPredictor()
    mb = MicroBatcher(p, bucket=32, batch_size=1, max_wait_ms=0.0,
                      pipeline_depth=2)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        results = []
        threads = [threading.Thread(
            target=lambda: results.append(mb.submit(img)))
            for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30.0)
        assert len(results) == 6
        assert all(r.shape == (32, 32) for r in results)
        pos = {e: i for i, e in enumerate(p.log)}
        overlapped = any(
            ("dispatch", i + 1) in pos and ("fetch", i) in pos
            and pos[("dispatch", i + 1)] < pos[("fetch", i)]
            for i in range(5))
        assert overlapped, p.log
    finally:
        mb.close()


def test_microbatcher_async_error_routes_to_its_chunk():
    """A fetch-time (async) device error reaches exactly the waiters of the
    failed chunk; other in-flight chunks still succeed."""
    p = _LazyPredictor()
    mb = MicroBatcher(p, bucket=32, batch_size=1, max_wait_ms=0.0,
                      pipeline_depth=2)
    try:
        good = np.zeros((32, 32, 3), np.uint8)
        bad = np.full((32, 32, 3), 255, np.uint8)
        outcomes = {}

        def worker(name, img):
            try:
                outcomes[name] = ("ok", mb.submit(img))
            except RuntimeError as e:
                outcomes[name] = ("err", str(e))

        threads = [threading.Thread(target=worker, args=(f"g{i}", good))
                   for i in range(3)]
        threads.append(threading.Thread(target=worker, args=("bad", bad)))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30.0)
        assert outcomes["bad"][0] == "err"
        assert "async device error" in outcomes["bad"][1]
        for i in range(3):
            kind, val = outcomes[f"g{i}"]
            assert kind == "ok" and val.shape == (32, 32)
    finally:
        mb.close()


def test_microbatcher_surfaces_errors():
    class _Boom:
        def predict_labels(self, arr):
            raise RuntimeError("device on fire")

    mb = MicroBatcher(_Boom(), bucket=32, batch_size=2, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(np.zeros((32, 32, 3), np.uint8))
    finally:
        mb.close()


def test_microbatcher_close_never_strands_a_waiter():
    """submit after close raises instead of blocking forever, and requests
    in flight at close time all complete (result or error, no hang)."""
    import time as _time

    class _Slow(_CountingPredictor):
        def predict_labels(self, arr):
            _time.sleep(0.05)
            return super().predict_labels(arr)

    mb = MicroBatcher(_Slow(), bucket=32, batch_size=2, max_wait_ms=20.0)
    img = np.zeros((32, 32, 3), np.uint8)
    outcomes = []

    def worker():
        try:
            outcomes.append(("ok", mb.submit(img)))
        except RuntimeError as e:
            outcomes.append(("err", e))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    _time.sleep(0.01)
    mb.close()
    for t in threads:
        t.join(timeout=10.0)
        assert not t.is_alive(), "a waiter hung across close()"
    assert len(outcomes) == 4
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(img)


def test_keepalive_connection_survives_error_response(server):
    """Error paths must DRAIN the posted body: this is an HTTP/1.1
    keep-alive handler, so an unread multi-KB image body would be parsed
    as the next request line and poison the connection for the request
    that follows (the review bug: 404/400 returned before rfile.read)."""
    import http.client

    host, port = server.server_address[:2]
    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()

    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        # request 1: big body to a bad route -> 404, body must be drained
        conn.request("POST", "/not-a-route", body=png)
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # request 2, SAME connection: must parse cleanly and succeed
        conn.request("POST", "/predict?format=ids", body=png)
        r2 = conn.getresponse()
        assert r2.status == 200
        got = np.asarray(Image.open(io.BytesIO(r2.read())))
        assert got.shape == (32, 32)
        # request 3: bad format (error after body was readable) then reuse
        conn.request("POST", "/predict?format=bogus", body=png)
        r3 = conn.getresponse()
        assert r3.status == 400
        r3.read()
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        conn.close()
