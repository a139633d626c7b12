"""Tests for the recognition server (recipes/serve.py): warmup, bucketed
recognition, and the HTTP surface driven end-to-end over a real socket."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.models import init_transformer
from pytorch_kaldi_asr_tpu.recipes import serve as serve_mod
from pytorch_kaldi_asr_tpu.train import save_checkpoint
from tests.test_models import small_cfg


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp / "model"), params, cfg, epoch=0)
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3}
    for i, w in enumerate(["aa", "bb", "cc", "dd"]):
        vocab[w] = 4 + i
    with open(tmp / "vocab.txt", "w") as f:
        for w, i in vocab.items():
            f.write(f"{w} {i}\n")
    return tmp, cfg


@pytest.fixture(scope="module")
def recognizer(model_dir):
    tmp, cfg = model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=3, buckets=(8, 16))
    rec.warmup()
    return rec


def test_recognize_buckets_and_nbest(recognizer, model_dir):
    _, cfg = model_dir
    rng = np.random.default_rng(0)
    for t in (5, 12):  # maps to buckets 8 and 16
        hyps, decoded = recognizer.recognize(
            rng.normal(size=(t, cfg.src_dim)).astype(np.float32), nbest=2)
        assert decoded == t
        assert 1 <= len(hyps) <= 2
        for text, score in hyps:
            assert isinstance(text, str)
            assert np.isfinite(score)
    # longer than the largest bucket: truncated to it, not a crash
    hyps, decoded = recognizer.recognize(
        rng.normal(size=(64, cfg.src_dim)).astype(np.float32))
    assert decoded == 16
    assert hyps


def test_recognize_rejects_wrong_dim(recognizer):
    with pytest.raises(ValueError):
        recognizer.recognize(np.zeros((5, 3), np.float32))


def test_http_end_to_end(recognizer, model_dir):
    from http.server import ThreadingHTTPServer

    _, cfg = model_dir
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(recognizer))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["src_dim"] == cfg.src_dim

        feats = np.random.default_rng(1).normal(
            size=(10, cfg.src_dim)).tolist()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize",
            data=json.dumps({"features": feats, "nbest": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["frames"] == 10
        assert 1 <= len(out["nbest"]) <= 2
        assert "latency_ms" in out

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize",
            data=b"{not json", headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        httpd.shutdown()


def test_http_streaming_session(recognizer, model_dir):
    from http.server import ThreadingHTTPServer

    _, cfg = model_dir
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(recognizer))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, obj=None):
        data = json.dumps(obj).encode() if obj is not None else b""
        req = urllib.request.Request(
            base + path, data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    try:
        sid = post("/stream/start")["id"]
        rng = np.random.default_rng(2)
        r1 = post(f"/stream/{sid}/push",
                  {"features": rng.normal(size=(4, cfg.src_dim)).tolist()})
        assert r1["frames"] == 4 and "partial" not in r1
        r2 = post(f"/stream/{sid}/push",
                  {"features": rng.normal(size=(5, cfg.src_dim)).tolist(),
                   "partial": True})
        assert r2["frames"] == 9
        assert isinstance(r2["partial"], str)
        final = post(f"/stream/{sid}/finish", {"nbest": 2})
        assert final["frames"] == 9
        assert 1 <= len(final["nbest"]) <= 2
        # session is gone after finish
        req = urllib.request.Request(
            base + f"/stream/{sid}/push",
            data=json.dumps({"features": [[0.0] * cfg.src_dim]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 404
    finally:
        httpd.shutdown()


def test_session_store_expiry_and_locked_append():
    store = serve_mod.SessionStore(ttl=0.05)
    sid = store.start()
    chunk = np.zeros((3, 4), np.float32)
    assert store.append(sid, chunk) == 3
    assert store.append(sid, chunk) == 6
    assert len(store.snapshot(sid)) == 2
    import time as _time

    _time.sleep(0.1)
    store.start()  # triggers the sweep
    assert store.append(sid, chunk) is None
    assert store.snapshot(sid) is None
