"""Online inference server: MicroBatcher coalescing + HTTP front end.

The batcher must (a) return each caller exactly its own rows, (b) actually
coalesce concurrent requests into fewer compiled forwards, (c) keep serving
after a failed batch. The HTTP layer must round-trip both .npy and JSON
bodies and report stats."""
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from deepcv_tpu.config import load_yaml
from deepcv_tpu.spec import DeepcvModule
from deepcv_tpu.serve import Predictor
from deepcv_tpu.server import InferenceServer, MicroBatcher

MODEL = """
act_fn: relu
architecture:
  - conv2d: { kernel_size: [3, 3], out_channels: 8, padding: 1 }
  - flatten: {}
  - fully_connected: { out_features: 4, act_fn: null }
"""


@pytest.fixture(scope="module")
def predictor():
    model = DeepcvModule((8, 8, 3), load_yaml(MODEL))
    variables = model.init(jax.random.PRNGKey(0))
    return Predictor(model, variables, batch_size=16)


def test_microbatcher_coalesces_and_splits(predictor):
    rng = np.random.RandomState(0)
    reqs = [rng.rand(n, 8, 8, 3).astype(np.float32) for n in (1, 3, 1, 2)]
    mb = MicroBatcher(predictor, max_batch=16, max_wait_ms=50, start=False)
    futs = [mb.submit(x) for x in reqs]  # queued BEFORE the worker exists
    mb.start()
    outs = [f.result(timeout=60) for f in futs]
    mb.close()
    # one compiled forward served all four requests
    assert mb.stats == {"requests": 4, "items": 7, "batches": 1,
                        "max_coalesced": 4}
    # each caller got exactly its own rows: compare against the predictions
    # of the full concatenated batch
    ref = np.asarray(predictor(np.concatenate(reqs)))
    np.testing.assert_allclose(np.concatenate(outs), ref, atol=1e-6)
    for x, y in zip(reqs, outs):
        assert y.shape[0] == x.shape[0]


def test_microbatcher_respects_max_batch(predictor):
    xs = [np.zeros((3, 8, 8, 3), np.float32) for _ in range(4)]
    mb = MicroBatcher(predictor, max_batch=6, max_wait_ms=50, start=False)
    futs = [mb.submit(x) for x in xs]
    mb.start()
    for f in futs:
        f.result(timeout=60)
    mb.close()
    assert mb.stats["batches"] == 2  # 12 rows / cap 6


def test_microbatcher_error_recovery(predictor):
    mb = MicroBatcher(predictor, max_batch=8, max_wait_ms=5)
    bad = mb.submit(np.zeros((1, 4, 4, 2), np.float32))  # wrong input shape
    with pytest.raises(Exception):
        bad.result(timeout=60)
    ok = mb.infer(np.zeros((2, 8, 8, 3), np.float32), timeout=60)
    mb.close()
    assert ok.shape == (2, 4)


def test_microbatcher_poisoned_group_fallback(predictor):
    """A request with the right rank but wrong sample dims must fail ALONE:
    the coalesced batch it poisons is retried per-request, so innocent
    concurrent callers still get their rows (r3 advisor, medium)."""
    mb = MicroBatcher(predictor, max_batch=16, max_wait_ms=50, start=False)
    good_a = mb.submit(np.zeros((2, 8, 8, 3), np.float32))
    bad = mb.submit(np.zeros((1, 4, 4, 2), np.float32))
    good_b = mb.submit(np.zeros((1, 8, 8, 3), np.float32))
    mb.start()
    assert good_a.result(timeout=60).shape == (2, 4)
    assert good_b.result(timeout=60).shape == (1, 4)
    with pytest.raises(Exception):
        bad.result(timeout=60)
    mb.close()


def test_microbatcher_close_fails_pending_and_rejects_submit(predictor):
    """close() must fail queued futures (not leave callers blocking) and a
    closed batcher must reject submit() fast (r3 advisor, low)."""
    mb = MicroBatcher(predictor, max_batch=16, max_wait_ms=5, start=False)
    orphan = mb.submit(np.zeros((1, 8, 8, 3), np.float32))
    mb.close()  # worker never started: the queued future must be failed
    with pytest.raises(RuntimeError, match="closed"):
        orphan.result(timeout=5)
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.zeros((1, 8, 8, 3), np.float32))


def test_http_server_shape_validation_and_readiness(predictor):
    """input_shape= rejects right-rank/wrong-dims samples with 400 at the
    front door; /healthz ready flips only after warmup or a served row."""
    with InferenceServer(predictor, port=0, max_batch=16, max_wait_ms=2,
                         input_shape=(8, 8, 3)) as srv:
        h = json.loads(urllib.request.urlopen(srv.url + "healthz").read())
        assert h["ok"] and not h["ready"]
        req = urllib.request.Request(
            srv.url + "predict",
            data=json.dumps({"images": np.zeros((4, 4, 2)).tolist()}).encode())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        srv.warmup()
        h = json.loads(urllib.request.urlopen(srv.url + "healthz").read())
        assert h["ok"] and h["ready"]


def test_http_server_roundtrip(predictor):
    rng = np.random.RandomState(1)
    batch = rng.rand(5, 8, 8, 3).astype(np.float32)
    ref = np.asarray(predictor(batch))
    with InferenceServer(predictor, port=0, max_batch=16,
                         max_wait_ms=2) as srv:
        # JSON single image -> JSON single output row
        req = urllib.request.Request(
            srv.url + "predict",
            data=json.dumps({"images": batch[0].tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req).read())["outputs"]
        np.testing.assert_allclose(np.asarray(out), ref[0], atol=1e-5)
        # .npy batch -> .npy batch
        buf = io.BytesIO()
        np.save(buf, batch, allow_pickle=False)
        req = urllib.request.Request(srv.url + "predict", data=buf.getvalue(),
                                     headers={"Content-Type":
                                              "application/x-npy"})
        resp = urllib.request.urlopen(req).read()
        np.testing.assert_allclose(np.load(io.BytesIO(resp)), ref, atol=1e-6)
        # health + stats
        assert json.loads(urllib.request.urlopen(srv.url + "healthz").read())["ok"]
        stats = json.loads(urllib.request.urlopen(srv.url + "stats").read())
        assert stats["requests"] == 2 and stats["items"] == 6
        # malformed body -> 400, wrong rank -> 400
        for payload in (b"not json", json.dumps(
                {"images": [[1.0, 2.0]]}).encode()):
            req = urllib.request.Request(srv.url + "predict", data=payload)
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 400


def test_http_server_concurrent_requests_coalesce(predictor):
    """Threads firing simultaneously share compiled forwards and every caller
    still gets its own correct row."""
    rng = np.random.RandomState(2)
    imgs = rng.rand(8, 8, 8, 3).astype(np.float32)
    ref = np.asarray(predictor(imgs))
    results = {}
    with InferenceServer(predictor, port=0, max_batch=16,
                         max_wait_ms=100) as srv:
        barrier = threading.Barrier(8)

        def call(i):
            barrier.wait()
            req = urllib.request.Request(
                srv.url + "predict",
                data=json.dumps({"images": imgs[i].tolist()}).encode())
            results[i] = json.loads(
                urllib.request.urlopen(req).read())["outputs"]

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stats = json.loads(urllib.request.urlopen(srv.url + "stats").read())
    for i in range(8):
        np.testing.assert_allclose(np.asarray(results[i]), ref[i], atol=1e-5)
    assert stats["requests"] == 8
    assert stats["batches"] < 8  # at least some coalescing happened
