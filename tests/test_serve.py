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
            health2 = json.loads(r.read())
        assert health2["status"] == "ok"
        # request counters moved: one good recognize, one error
        assert health2["stats"]["requests"] >= 2
        assert health2["stats"]["errors"] >= 1
        assert health2["stats"]["decodes"] >= 1
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


@pytest.fixture(scope="module")
def hybrid_setup(tmp_path_factory):
    """Tiny AM checkpoint + HCLG graph dir for hybrid serving."""
    from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
    from pytorch_kaldi_asr_tpu.fst.openfst_io import write_const_fst
    from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
    from pytorch_kaldi_asr_tpu.models import TransformerConfig
    from pytorch_kaldi_asr_tpu.models.am import init_am
    from pytorch_kaldi_asr_tpu.recipes.mkgraph import write_symbol_table
    from pytorch_kaldi_asr_tpu.train.checkpoint import save_checkpoint

    tmp = tmp_path_factory.mktemp("hybrid")
    phones = {p: i + 1 for i, p in enumerate("abkt")}
    lexicon = {"bat": list("bat"), "at": list("at"), "tab": list("tab")}
    lm = train_ngram_lm([s.split() for s in
                         ["bat at", "at tab", "tab bat at"]], order=2)
    word_syms = {w: i + 1 for i, w in enumerate(sorted(lexicon))}
    graph, ph_ext = mkgraph(lexicon, lm, word_syms, phones, sil_phone=None,
                            hmm_loops=True)
    gdir = tmp / "graph"
    gdir.mkdir()
    write_const_fst(graph, str(gdir / "HLG.fst"))
    write_symbol_table(str(gdir / "words.txt"), word_syms)

    cfg = TransformerConfig(
        src_dim=6, vocab_size=8, en_layers=1, de_layers=1, n_head=1,
        en_d_model=16, de_d_model=16, d_k=8, d_v=8, encoder_max_len=64,
        tdnn_contexts=((-1, 0, 1),), en_dropout=0.0, de_dropout=0.0,
    )
    params = init_am(jax.random.PRNGKey(0), cfg, n_targets=len(phones))
    save_checkpoint(str(tmp / "am"), params, cfg, epoch=1,
                    extra={"n_targets": len(phones), "model_kind": "am"})
    return tmp, cfg, phones, lexicon


def test_hybrid_server_offline_and_streaming(hybrid_setup):
    """Hybrid mode end to end over HTTP: offline /recognize (n-best via
    lattices) and TRUE streaming sessions must agree with each other."""
    from http.server import ThreadingHTTPServer

    tmp, cfg, phones, lexicon = hybrid_setup
    rec = serve_mod.HybridRecognizer(str(tmp / "am"), str(tmp / "graph"),
                                     beam=1e9)
    rec.warmup()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(rec))
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
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["mode"] == "hybrid"

        rng = np.random.default_rng(4)
        feats = rng.normal(size=(24, cfg.src_dim)).astype(np.float32)
        off = post("/recognize", {"features": feats.tolist(), "nbest": 3})
        assert off["frames"] == 24
        assert off["nbest"], "hybrid offline decode returned nothing"

        sid = post("/stream/start")["id"]
        partials = []
        for lo in range(0, 24, 6):
            r = post(f"/stream/{sid}/push",
                     {"features": feats[lo:lo + 6].tolist()})
            partials.append(r["partial"])
        assert r["frames"] == 24
        final = post(f"/stream/{sid}/finish")
        assert final["frames"] == 24
        assert final["nbest"]
        # streaming 1-best agrees with the offline decode
        assert final["nbest"][0]["text"] == off["nbest"][0]["text"]
    finally:
        httpd.shutdown()


def test_hybrid_interleaved_sessions_are_independent(hybrid_setup):
    """Two concurrent streaming sessions must keep separate AM buffers and
    decoder token sets — interleaved pushes of different audio give each
    session the same result it gets alone."""
    tmp, cfg, phones, lexicon = hybrid_setup
    rec = serve_mod.HybridRecognizer(str(tmp / "am"), str(tmp / "graph"),
                                     beam=1e9)
    rng = np.random.default_rng(9)
    a = rng.normal(size=(18, cfg.src_dim)).astype(np.float32)
    b = rng.normal(size=(18, cfg.src_dim)).astype(np.float32)

    # solo runs
    solo = {}
    for name, feats in (("a", a), ("b", b)):
        st = rec.new_stream()
        for lo in range(0, 18, 6):
            st.push(feats[lo:lo + 6])
        solo[name] = st.finish()

    # interleaved runs
    sa, sb = rec.new_stream(), rec.new_stream()
    for lo in range(0, 18, 6):
        sa.push(a[lo:lo + 6])
        sb.push(b[lo:lo + 6])
    got_a, got_b = sa.finish(), sb.finish()
    assert got_a == solo["a"]
    assert got_b == solo["b"]


def test_http_wav_input(model_dir):
    """POST raw WAV bytes: fbank features are extracted on the fly with
    num_bins = the model's src_dim."""
    import io as _io

    from http.server import ThreadingHTTPServer

    from pytorch_kaldi_asr_tpu.tools.wav import write_wav

    tmp, cfg = model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=2, buckets=(8, 16))
    rec.warmup()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(rec))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(5)
        samples = (rng.normal(size=3200) * 0.1).astype(np.float32)
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            write_wav(f.name, samples, 16000)
            wav_bytes = open(f.name, "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        # 3200 samples @16k, 25ms window / 10ms shift -> ~18 frames,
        # truncated to the largest bucket (16)
        assert out["frames"] >= 8
        assert out["nbest"]
    finally:
        httpd.shutdown()


def test_recognize_many_matches_singles(recognizer, model_dir):
    """One batched search over several utterances gives each the same
    result as decoding it alone."""
    _, cfg = model_dir
    rng = np.random.default_rng(6)
    feats = [rng.normal(size=(t, cfg.src_dim)).astype(np.float32)
             for t in (5, 12, 7)]
    singles = [recognizer.recognize(f, nbest=2) for f in feats]
    batched, decoded = recognizer.recognize_many(feats, nbest=2,
                                                 batch_pad=8)
    assert decoded == [s[1] for s in singles]
    for (s_hyps, _), b_hyps in zip(singles, batched):
        assert [t for t, _ in b_hyps] == [t for t, _ in s_hyps]


def test_micro_batcher_coalesces_and_is_correct(model_dir):
    """Concurrent requests through the MicroBatcher return per-request
    results identical to solo decoding, with fewer search invocations
    than requests (coalescing actually happened)."""
    tmp, cfg = model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=3, buckets=(8, 16))
    calls = {"n": 0}
    inner = rec.search

    def counting_search(*a, **kw):
        calls["n"] += 1
        return inner(*a, **kw)

    rec.search = counting_search
    mb = serve_mod.MicroBatcher(rec, max_batch=4, window_ms=200.0)
    mb.warmup()
    calls["n"] = 0

    rng = np.random.default_rng(7)
    feats = [rng.normal(size=(6 + i, cfg.src_dim)).astype(np.float32)
             for i in range(8)]
    solo = [rec.recognize(f) for f in feats]
    calls["n"] = 0

    results = [None] * 8

    def worker(i):
        results[i] = mb.recognize(feats[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    for got, want in zip(results, solo):
        assert got[1] == want[1]  # frames
        assert [t for t, _ in got[0]] == [t for t, _ in want[0]]
    # 8 requests coalesced into at most 4 batched searches (max_batch=4,
    # generous window); solo path would have used 8
    assert calls["n"] <= 4, calls["n"]


def test_hybrid_score_convention_and_empty_finish(hybrid_setup):
    """Scores are higher-is-better everywhere in hybrid mode, and a
    finish without any push returns the same empty contract as the
    attention mode (no spurious 'no surviving path')."""
    from http.server import ThreadingHTTPServer

    tmp, cfg, phones, lexicon = hybrid_setup
    rec = serve_mod.HybridRecognizer(str(tmp / "am"), str(tmp / "graph"),
                                     beam=1e9, buckets=(32,))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(rec))
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
        rng = np.random.default_rng(11)
        feats = rng.normal(size=(20, cfg.src_dim)).astype(np.float32)
        off = post("/recognize", {"features": feats.tolist(), "nbest": 3})
        scores = [h["score"] for h in off["nbest"]]
        # best-first means descending scores (higher is better)
        assert scores == sorted(scores, reverse=True)

        sid = post("/stream/start")["id"]
        for lo in range(0, 20, 5):
            post(f"/stream/{sid}/push",
                 {"features": feats[lo:lo + 5].tolist()})
        fin = post(f"/stream/{sid}/finish")
        # streaming score matches the offline 1-best sign and value class
        assert abs(fin["nbest"][0]["score"] - off["nbest"][0]["score"]) < 1.0

        # finish without any push: clean empty contract
        sid2 = post("/stream/start")["id"]
        empty = post(f"/stream/{sid2}/finish")
        assert empty == {"nbest": [], "frames": 0}
    finally:
        httpd.shutdown()


def test_server_stats_histogram_and_percentiles():
    """The /healthz latency histogram: bucket placement, percentile
    interpolation, and the cap at the largest observed sample."""
    st = serve_mod.ServerStats()
    assert st.summary().get("p50_ms") is None  # no samples -> no fields

    for ms in (3.0, 7.0, 15.0, 40.0, 40.0, 90.0, 150.0, 400.0, 900.0, 7000.0):
        st.record(decode_ms=ms)
    s = st.summary()
    assert s["decodes"] == 10
    assert s["max_decode_ms"] == 7000.0
    hist = s["latency_hist_ms"]
    assert hist["<=5"] == 1 and hist["<=10"] == 1
    assert hist["<=20"] == 1 and hist["<=50"] == 2
    assert hist[">5000"] == 1
    assert sum(hist.values()) == 10
    # percentiles are monotone, within range, and capped at the max seen
    assert 0 < s["p50_ms"] <= s["p95_ms"] <= s["p99_ms"] <= 7000.0
    assert s["p50_ms"] <= 100.0  # median of the sample set is <=90ms

    # one sample at 42ms: percentiles interpolate inside its (20,50]
    # bucket but never exceed the largest sample seen (cap rule)
    st2 = serve_mod.ServerStats()
    st2.record(decode_ms=42.0)
    s2 = st2.summary()
    assert 20.0 < s2["p50_ms"] <= s2["p99_ms"] <= 42.0


def test_reload_hot_swap_and_config_mismatch(model_dir):
    """Recognizer.reload swaps weights in place; a config-mismatched
    checkpoint is rejected and the old weights keep serving."""
    tmp, cfg = model_dir
    # a second checkpoint: same config, different weights, later epoch
    params2 = init_transformer(jax.random.PRNGKey(1), cfg)
    save_checkpoint(str(tmp / "model2"), params2, cfg, epoch=7, step=123)
    # and a config-mismatched one
    cfg_bad = small_cfg(en_d_model=16)
    save_checkpoint(str(tmp / "model_bad"),
                    init_transformer(jax.random.PRNGKey(2), cfg_bad),
                    cfg_bad, epoch=1)

    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=2, buckets=(8,))
    rng = np.random.default_rng(12)
    feats = rng.normal(size=(6, cfg.src_dim)).astype(np.float32)
    before = rec.recognize(feats)

    meta = rec.reload(str(tmp / "model2"))
    assert meta["epoch"] == 7 and meta["step"] == 123
    assert rec.model_file == str(tmp / "model2")
    after = rec.recognize(feats)  # same compiled program, new weights
    assert after[1] == before[1]  # frames unchanged
    leaf_old = jax.tree_util.tree_leaves(
        serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                             beam_size=2, buckets=(8,)).params)[0]
    leaf_new = jax.tree_util.tree_leaves(rec.params)[0]
    assert not np.allclose(np.asarray(leaf_old), np.asarray(leaf_new))

    with pytest.raises(ValueError, match="differs from the serving"):
        rec.reload(str(tmp / "model_bad"))
    # old (reloaded) weights keep serving after the rejected swap
    assert rec.model_file == str(tmp / "model2")
    assert rec.recognize(feats)[1] == 6


def test_http_reload_endpoint(model_dir):
    """POST /reload over a live server: success updates healthz's
    model_file; a mismatched checkpoint is a 400 and serving continues."""
    from http.server import ThreadingHTTPServer

    tmp, cfg = model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=2, buckets=(8,))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(rec))
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
        # reuses the model2/model_bad checkpoints written by the
        # reload test (module-scoped tmp dir); (re)write to be order-safe
        params2 = init_transformer(jax.random.PRNGKey(1), cfg)
        save_checkpoint(str(tmp / "model2"), params2, cfg, epoch=7, step=9)
        cfg_bad = small_cfg(en_d_model=16)
        save_checkpoint(str(tmp / "model_bad"),
                        init_transformer(jax.random.PRNGKey(2), cfg_bad),
                        cfg_bad, epoch=1)

        out = post("/reload", {"model_file": str(tmp / "model2")})
        assert out["status"] == "reloaded" and out["epoch"] == 7
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["model_file"] == str(tmp / "model2")

        bad = urllib.request.Request(
            base + "/reload",
            data=json.dumps({"model_file": str(tmp / "model_bad")}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
        # server still decodes after the rejected reload
        feats = np.random.default_rng(13).normal(
            size=(5, cfg.src_dim)).tolist()
        out = post("/recognize", {"features": feats})
        assert out["frames"] == 5 and out["nbest"]
    finally:
        httpd.shutdown()


def test_hybrid_recognize_many_matches_singles(hybrid_setup):
    """Hybrid micro-batch contract: one batched AM forward + per-utt
    graph searches gives each utterance its solo result."""
    tmp, cfg, phones, lexicon = hybrid_setup
    rec = serve_mod.HybridRecognizer(str(tmp / "am"), str(tmp / "graph"),
                                     beam=1e9, buckets=(32,))
    rng = np.random.default_rng(14)
    feats = [rng.normal(size=(t, cfg.src_dim)).astype(np.float32)
             for t in (12, 20, 16)]
    singles = [rec.recognize(f, nbest=2) for f in feats]
    batched, lens = rec.recognize_many(feats, nbest=2, batch_pad=4)
    assert lens == [s[1] for s in singles]
    for (s_hyps, _), b_hyps in zip(singles, batched):
        assert [t for t, _ in b_hyps] == [t for t, _ in s_hyps]


def test_hybrid_reload(hybrid_setup):
    """Hybrid hot reload: same-config swap succeeds, target-count or
    config mismatch is rejected."""
    from pytorch_kaldi_asr_tpu.models.am import init_am
    from pytorch_kaldi_asr_tpu.train.checkpoint import save_checkpoint as _save

    tmp, cfg, phones, lexicon = hybrid_setup
    rec = serve_mod.HybridRecognizer(str(tmp / "am"), str(tmp / "graph"),
                                     beam=1e9, buckets=(32,))
    params2 = init_am(jax.random.PRNGKey(5), cfg, n_targets=len(phones))
    _save(str(tmp / "am2"), params2, cfg, epoch=3,
          extra={"n_targets": len(phones), "model_kind": "am"})
    meta = rec.reload(str(tmp / "am2"))
    assert meta["epoch"] == 3
    assert rec.model_file == str(tmp / "am2")

    _save(str(tmp / "am_bad"), init_am(jax.random.PRNGKey(6), cfg, 2),
          cfg, epoch=1, extra={"n_targets": 2, "model_kind": "am"})
    with pytest.raises(ValueError):
        rec.reload(str(tmp / "am_bad"))


def test_hybrid_conformer_streaming_matches_offline(tmp_path):
    """Conformer-AM hybrid serving: TRUE streaming sessions (StreamingAM
    carried-cache frontend) agree with the offline decode."""
    from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
    from pytorch_kaldi_asr_tpu.fst.openfst_io import write_const_fst
    from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
    from pytorch_kaldi_asr_tpu.models import TransformerConfig
    from pytorch_kaldi_asr_tpu.models.am import init_am
    from pytorch_kaldi_asr_tpu.recipes.mkgraph import write_symbol_table
    from pytorch_kaldi_asr_tpu.train.checkpoint import save_checkpoint

    phones = {p: i + 1 for i, p in enumerate("abkt")}
    lexicon = {"bat": list("bat"), "at": list("at"), "tab": list("tab")}
    lm = train_ngram_lm([s.split() for s in
                         ["bat at", "at tab", "tab bat at"]], order=2)
    word_syms = {w: i + 1 for i, w in enumerate(sorted(lexicon))}
    graph, _ = mkgraph(lexicon, lm, word_syms, phones, sil_phone=None,
                       hmm_loops=True)
    gdir = tmp_path / "graph"
    gdir.mkdir()
    write_const_fst(graph, str(gdir / "HLG.fst"))
    write_symbol_table(str(gdir / "words.txt"), word_syms)

    cfg = TransformerConfig(
        src_dim=6, vocab_size=8, en_layers=1, de_layers=1, n_head=1,
        en_d_model=16, de_d_model=16, d_k=8, d_v=8, encoder_max_len=64,
        en_dropout=0.0, de_dropout=0.0, encoder_type="conformer",
        encoder_sub_sequence=(-8, 0), conformer_kernel=5,
        conformer_causal_conv=True,
    )
    params = init_am(jax.random.PRNGKey(0), cfg, n_targets=len(phones))
    save_checkpoint(str(tmp_path / "am"), params, cfg, epoch=1,
                    extra={"n_targets": len(phones), "model_kind": "am"})

    rec = serve_mod.HybridRecognizer(str(tmp_path / "am"),
                                     str(gdir), beam=1e9)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(18, cfg.src_dim)).astype(np.float32)
    off, _ = rec.recognize(feats, nbest=1)

    st = rec.new_stream()
    for lo in range(0, 18, 6):
        st.push(feats[lo:lo + 6])
    text, score = st.finish()
    assert text == off[0][0]


@pytest.fixture(scope="module")
def banded_model_dir(tmp_path_factory):
    """A causal banded-encoder checkpoint: the exact-streaming family
    the incremental attention-partial path serves."""
    tmp = tmp_path_factory.mktemp("serve_banded")
    cfg = small_cfg(encoder_type="banded", encoder_sub_sequence=(-8, 0))
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    save_checkpoint(str(tmp / "model"), params, cfg, epoch=0)
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3}
    for i, w in enumerate(["aa", "bb", "cc", "dd"]):
        vocab[w] = 4 + i
    with open(tmp / "vocab.txt", "w") as f:
        for w, i in vocab.items():
            f.write(f"{w} {i}\n")
    return tmp, cfg


def test_attention_stream_incremental_partials(banded_model_dir):
    """_AttentionStream grows the memory with the carried streaming
    encoder and its final partial matches the offline full decode (the
    padded memory is masked identically to the bucketed offline pad)."""
    tmp, cfg = banded_model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=3, buckets=(16,))
    astream = rec.new_attention_stream(stream_chunk=4)
    assert astream is not None
    rng = np.random.default_rng(7)
    audio = rng.normal(size=(12, cfg.src_dim)).astype(np.float32)
    chunks, partials = [], []
    for i in range(3):
        chunks.append(audio[4 * i:4 * (i + 1)])
        partials.append(astream.sync(chunks))
    assert astream.frames == 12
    assert all(isinstance(p, str) for p in partials)
    # exact-streaming encoder: the session memory equals offline encode
    from pytorch_kaldi_asr_tpu.models.transformer import encode

    # memory is device-resident in a capacity buffer; valid rows only
    mem = np.asarray(astream._mem_dev[0, :astream._mem_t])
    off, _ = encode(rec.params, cfg, audio[None],
                    np.ones((1, 12), np.uint8), train=False)
    np.testing.assert_allclose(mem, np.asarray(off[0]), atol=2e-4)
    # capacity doubles from MEM_PAD; the tail beyond _mem_t is zeros
    assert astream._mem_dev.shape[1] >= astream._mem_t
    assert float(np.abs(np.asarray(
        astream._mem_dev[0, astream._mem_t:])).max(initial=0.0)) == 0.0
    # final partial == offline recognize (prefix is 0 here: the quant
    # floor exceeds these short hypotheses, so the memory search IS the
    # full search over the same masked memory)
    hyps, _ = rec.recognize(audio, nbest=1)
    assert partials[-1] == hyps[0][0]


def test_attention_stream_prefix_restart(banded_model_dir, monkeypatch):
    """With the prefix quant floor lowered, later partials force the
    previous partial's stable prefix (exercising the restart path) and
    still return sane text."""
    tmp, cfg = banded_model_dir
    monkeypatch.setattr(serve_mod._AttentionStream, "PREFIX_QUANT", 2)
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=2, buckets=(16,))
    astream = rec.new_attention_stream(stream_chunk=4)
    rng = np.random.default_rng(9)
    audio = rng.normal(size=(16, cfg.src_dim)).astype(np.float32)
    chunks = []
    last = ""
    forced = False
    for i in range(4):
        chunks.append(audio[4 * i:4 * (i + 1)])
        last = astream.sync(chunks)
        forced = forced or len(astream._prev_ids) >= 4
    assert isinstance(last, str)
    assert forced  # at least one partial had a forcible prefix


def test_attention_stream_none_for_noncausal(model_dir):
    """Non-streamable models (tdnn with default band is fine, but a
    non-causal banded encoder is not) fall back to None."""
    tmp, cfg = model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=2, buckets=(16,))
    # the tdnn flagship streams via receptive-field overlap
    assert rec.new_attention_stream() is not None
    cfg2 = small_cfg(encoder_type="banded", encoder_sub_sequence=(-8, 2))
    params = init_transformer(jax.random.PRNGKey(2), cfg2)
    rec.cfg, rec.params = cfg2, params  # simulate a non-causal model
    rec._stream_params = None
    assert rec.new_attention_stream() is None


def test_attention_stream_partial_beam(banded_model_dir):
    """partial_beam narrows ONLY the partial decodes; finals keep
    beam_size (reference decode.py contract untouched)."""
    tmp, cfg = banded_model_dir
    rec = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                               beam_size=3, partial_beam=1, buckets=(16,))
    assert rec.partial_beam == 1 and rec.beam_size == 3
    astream = rec.new_attention_stream(stream_chunk=4)
    rng = np.random.default_rng(7)
    audio = rng.normal(size=(12, cfg.src_dim)).astype(np.float32)
    chunks = []
    for i in range(3):
        chunks.append(audio[4 * i:4 * (i + 1)])
        p = astream.sync(chunks)
    assert isinstance(p, str)
    # greedy (beam 1) partial over the identical masked memory = the
    # beam-1 offline result; the final/offline path still uses beam 3
    rec1 = serve_mod.Recognizer(str(tmp / "model"), str(tmp / "vocab.txt"),
                                beam_size=1, buckets=(16,))
    hyps1, _ = rec1.recognize(audio, nbest=1)
    assert p == hyps1[0][0]
