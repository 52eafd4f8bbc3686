"""Serving layer (serve.py): FaceService bucketing / extract semantics and a
full socket-daemon protocol round trip (ping/detect/embed/extract/stats/
warmup/shutdown) against an in-process server thread."""

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotofaces_tpu.serve import (FaceService, ServeClient, _bucket,
                                    make_http_server, make_server,
                                    serve_forever)
from videotofaces_tpu.specs import BoxCriteria


class FakeEncoder:
    """Deterministic stand-in implementing the _Encoder protocol: crops of any
    size in, [N, 4] features out (mean, std, h, w)."""

    input_size = 32
    batch_size = None

    def __call__(self, images):
        out = []
        for img in images:
            a = np.asarray(img, dtype=np.float32)
            out.append([a.mean(), a.std(), a.shape[0], a.shape[1]])
        return np.asarray(out, np.float32)


def _make_service(max_batch=8):
    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.models.wrappers import YoloDetector

    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)))["params"]
    det = YoloDetector(params=params, max_side=96)
    crit = BoxCriteria(min_score=0.0, min_size=1, min_border=0,
                       scale=(1.0, 1.0, 1.0, 1.0), square=False)
    return FaceService(detector=det, encoder=FakeEncoder(), criteria=crit,
                       max_batch=max_batch)


def _frames(n, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
            for _ in range(n)]


def test_ragged_out_mixed_empty_nonempty():
    """Frames with faces mixed with faces-free frames (the common case) must
    flatten without error and preserve per-frame counts."""
    from videotofaces_tpu.serve import _ragged_out

    pairs = [
        {"boxes": np.ones((2, 4), np.float32), "scores": np.ones((2,), np.float32)},
        {"boxes": np.zeros((0, 4), np.float32), "scores": np.zeros((0,), np.float32)},
        {"boxes": np.ones((1, 4), np.float32), "scores": np.ones((1,), np.float32)},
    ]
    counts, (boxes, scores) = _ragged_out(pairs, ("boxes", "scores"))
    assert counts == [2, 0, 1]
    assert boxes.shape == (3, 4) and scores.shape == (3, 1)

    counts, (boxes,) = _ragged_out(
        [{"boxes": np.zeros((0, 4), np.float32)}], ("boxes",))
    assert counts == [0] and boxes.shape[0] == 0


def test_bucket_rounding():
    assert [_bucket(n, 32) for n in (1, 2, 3, 4, 5, 9, 33)] == \
        [1, 2, 4, 4, 8, 16, 32]


def test_detect_matches_direct_wrapper_call():
    svc = _make_service()
    frames = _frames(3)
    res = svc.detect(frames)
    assert len(res) == 3
    # direct wrapper call at the same bucket must agree exactly
    svc.detector.batch_size = 4
    db, ds, _ = svc.detector(frames)
    for (boxes, scores), eb, es in zip(res, db, ds):
        np.testing.assert_array_equal(boxes, eb)
        np.testing.assert_array_equal(scores, es)
    # 3 frames rounded onto the 4-bucket: a single compiled graph
    assert len(svc.detector._cache) == 1


def test_detect_chunks_above_max_batch():
    svc = _make_service(max_batch=4)
    res = svc.detect(_frames(10))
    assert len(res) == 10
    # chunks of 4, 4, 2 -> buckets 4 and 2
    assert {k[0] for k in svc.detector._cache} == {4, 2}


def test_extract_consistency_and_crops():
    svc = _make_service()
    frames = _frames(2, seed=3)
    res = svc.extract(frames, return_crops=True)
    assert len(res) == 2
    enc = FakeEncoder()
    for frame, r in zip(frames, res):
        m = len(r["boxes"])
        assert r["scores"].shape == (m,)
        assert len(r["crops"]) == m
        if m:
            assert r["embeddings"].shape == (m, 4)
            # crops are the adjusted-box slices of the frame
            for box, crop in zip(r["boxes"], r["crops"]):
                x1, y1, x2, y2 = box
                np.testing.assert_array_equal(frame[y1:y2, x1:x2], crop)
            np.testing.assert_allclose(r["embeddings"], enc(r["crops"]),
                                       rtol=1e-6)


def test_warmup_precompiles_buckets():
    svc = _make_service()
    svc.warmup(resolutions=[(96, 128)], batches=[3], embed_batches=[2])
    assert (4, 96, 128) in svc.detector._cache
    n_compiled = len(svc.detector._cache)
    svc.detect(_frames(3))          # same bucket: no new compile
    assert len(svc.detector._cache) == n_compiled


def test_socket_daemon_round_trip(tmp_path):
    svc = _make_service()
    sock_path = str(tmp_path / "v2f.sock")
    t = threading.Thread(target=serve_forever, args=(svc, sock_path), daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock_path):
            break
        time.sleep(0.05)
    else:
        pytest.fail("daemon socket never appeared")

    client = ServeClient(sock_path)
    try:
        assert client.ping() is True

        frames = _frames(3, seed=7)
        got = client.detect(frames)
        want = svc.detect(frames)
        assert len(got) == len(want) == 3
        for (gb, gs), (wb, ws) in zip(got, want):
            np.testing.assert_allclose(gb, wb, rtol=1e-6)
            np.testing.assert_allclose(gs, ws, rtol=1e-6)

        # ragged crop sizes through the embed op
        crops = [_frames(1, h=20, w=30, seed=i)[0] for i in range(3)]
        emb = client.embed(crops)
        np.testing.assert_allclose(emb, FakeEncoder()(crops), rtol=1e-6)

        ex = client.extract(frames)
        wex = svc.extract(frames)
        for g, w in zip(ex, wex):
            np.testing.assert_array_equal(g["boxes"], w["boxes"])
            np.testing.assert_allclose(g["embeddings"],
                                       w["embeddings"].reshape(g["embeddings"].shape),
                                       rtol=1e-6)

        stats = client.stats()
        assert stats["requests"] >= 4 and stats["frames"] >= 6

        # unknown op surfaces as an error, connection stays usable
        with pytest.raises(RuntimeError, match="unknown op"):
            client._rpc({"op": "nope"})
        assert client.ping() is True

        client.shutdown()
    finally:
        client.close()
    t.join(timeout=10)
    assert not t.is_alive()


def test_http_gateway_round_trip():
    """JSON/HTTP gateway: base64 PNG frames in, JSON detections out.
    Lossless PNG makes the round trip numerically identical to a direct
    FaceService call."""
    import base64
    import json as _json
    import urllib.request

    import cv2

    svc = _make_service()
    srv = make_http_server(svc, ("127.0.0.1", 0))
    host, port = srv.server_address[:2]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = "http://%s:%d" % (host, port)

    def get(path):
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return _json.loads(r.read())

    def post(path, obj):
        req = urllib.request.Request(
            base + path, data=_json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            return _json.loads(r.read())

    try:
        assert get("/ping")["pong"] is True

        frames = _frames(2, seed=21)
        b64 = [base64.b64encode(cv2.imencode(".png", f)[1]).decode()
               for f in frames]
        got = post("/detect", {"frames": b64})["results"]
        want = svc.detect(frames)
        assert len(got) == 2
        for g, (wb, ws) in zip(got, want):
            np.testing.assert_allclose(np.asarray(g["boxes"]).reshape(-1, 4),
                                       wb, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(g["scores"]), ws, rtol=1e-6)

        crops = [_frames(1, h=20, w=30, seed=31)[0]]
        cb64 = [base64.b64encode(cv2.imencode(".png", c)[1]).decode()
                for c in crops]
        emb = post("/embed", {"crops": cb64})["embeddings"]
        np.testing.assert_allclose(np.asarray(emb), FakeEncoder()(crops),
                                   rtol=1e-5)

        ex = post("/extract", {"frames": b64})["results"]
        assert len(ex) == 2 and all("embeddings" in r for r in ex)

        assert get("/stats")["stats"]["requests"] >= 3
        # bad payload -> 400 with error, server stays up
        try:
            post("/detect", {"frames": ["!!notbase64ok"]})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert get("/ping")["pong"] is True
        post("/shutdown", {})
    finally:
        pass
    t.join(timeout=10)
    assert not t.is_alive()
    srv.server_close()


def test_tcp_daemon_round_trip():
    """Same framed protocol over TCP: port 0 -> OS-assigned, read back."""
    svc = _make_service()
    srv = make_server(svc, ("127.0.0.1", 0))
    host, port = srv.server_address[:2]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    client = ServeClient((host, port))
    try:
        assert client.ping() is True
        frames = _frames(2, seed=11)
        got = client.detect(frames)
        want = svc.detect(frames)
        for (gb, gs), (wb, ws) in zip(got, want):
            np.testing.assert_allclose(gb, wb, rtol=1e-6)
            np.testing.assert_allclose(gs, ws, rtol=1e-6)
        client.shutdown()
    finally:
        client.close()
    t.join(timeout=10)
    assert not t.is_alive()
    srv.server_close()
