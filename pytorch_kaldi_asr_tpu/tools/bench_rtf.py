"""Posterior-generation / decode RTF benchmarks (BASELINE.json metric #2:
streaming chunked-attention posterior emit; plus full-utterance beam decode).

Prints one JSON line per benchmark.  Real-time factor = compute seconds per
second of audio (frames × 10 ms); the axon-tunnel timing rules apply (chained
dependent calls, host-pull sync, RTT subtracted)."""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _rtt():
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.zeros(()))
    return time.perf_counter() - t0


def bench_offline_posteriors(batch=8, frames=500, feat_dim=40,
                             n_targets=512, steps=20):
    """Full-utterance AM posterior generation (TDNN encoder)."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.models import TransformerConfig, am

    cfg = TransformerConfig(src_dim=feat_dim, vocab_size=52,
                            compute_dtype=jnp.bfloat16)
    params = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(batch, frames, feat_dim))
                      .astype(np.float32))
    mask = jnp.ones((batch, frames), jnp.uint8)

    fwd = jax.jit(lambda p, s: am.am_log_posteriors(p, cfg, s, mask)[0])
    out = fwd(params, src)
    float(out[0, 0, 0])
    base = _rtt()
    t0 = time.perf_counter()
    x = src
    for _ in range(steps):
        out = fwd(params, x)
        x = src + out[0, 0, 0] * 0.0  # chain dependency for the tunnel
    float(out[0, 0, 0])
    dt = (time.perf_counter() - t0 - base) / steps
    audio_sec = batch * frames * 0.01
    return {"metric": "posterior_rtf_offline", "value": round(dt / audio_sec, 6),
            "unit": "rtf", "ms_per_batch": round(dt * 1e3, 3)}


def bench_decode(batch=8, frames=500, feat_dim=40, beam=25, max_len=100,
                 steps=5):
    """Beam-search decode RTF with the KV-cached search."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search
    from pytorch_kaldi_asr_tpu.models import (
        TransformerConfig,
        init_transformer,
    )

    cfg = TransformerConfig(src_dim=feat_dim, vocab_size=52)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(batch, frames, feat_dim))
                      .astype(np.float32))
    mask = jnp.ones((batch, frames), jnp.uint8)

    r = fast_beam_search(params, cfg, src, mask, beam_size=beam,
                         max_len=max_len)
    float(r.scores[0, 0])
    base = _rtt()
    t0 = time.perf_counter()
    x = src
    for _ in range(steps):
        r = fast_beam_search(params, cfg, x, mask, beam_size=beam,
                             max_len=max_len)
        x = src + r.scores[0, 0] * 0.0
    float(r.scores[0, 0])
    dt = (time.perf_counter() - t0 - base) / steps
    audio_sec = batch * frames * 0.01
    return {"metric": "decode_rtf_beam25", "value": round(dt / audio_sec, 6),
            "unit": "rtf", "ms_per_batch": round(dt * 1e3, 3)}


def bench_streaming_conformer(frames=400, chunk=40, feat_dim=40,
                              n_targets=512, steps=3):
    """True-streaming Conformer AM posterior RTF: chunked pushes through
    the carried-cache StreamingConformer frontend + AM head (BASELINE.md's
    declared RTF benchmark config, 'streaming chunked-attention').  Each
    push returns host-side posteriors, so the sync is inherent — wall
    clock per push IS the serving latency."""
    import jax

    from pytorch_kaldi_asr_tpu.models import TransformerConfig, am
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingAM

    cfg = TransformerConfig(
        src_dim=feat_dim, vocab_size=52, encoder_type="conformer",
        encoder_sub_sequence=(-100, 0), conformer_causal_conv=True,
        en_dropout=0.0,
    )
    params = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, frames, feat_dim)).astype(np.float32)

    stream = StreamingAM(params, cfg)
    for lo in range(0, frames, chunk):  # warm all cache shapes
        stream.push(feats[:, lo:lo + chunk])
    lat = []
    t_total = 0.0
    for _ in range(steps):
        stream.reset()
        t0 = time.perf_counter()
        for lo in range(0, frames, chunk):
            t1 = time.perf_counter()
            stream.push(feats[:, lo:lo + chunk])
            lat.append(time.perf_counter() - t1)
        t_total += time.perf_counter() - t0
    audio_sec = steps * frames * 0.01
    lat.sort()
    return {
        "metric": "streaming_conformer_rtf",
        "value": round(t_total / audio_sec, 6),
        "unit": "rtf",
        "chunk_frames": chunk,
        "push_ms_p50": round(lat[len(lat) // 2] * 1e3, 3),
        "push_ms_p95": round(lat[int(len(lat) * 0.95)] * 1e3, 3),
    }


def hybrid_bench_setup(n_words=200, n_phones=40, n_sents=400, seed=0):
    """Synthetic lexicon + bigram LM -> compiled HLG-style graph, plus
    peaked log-posteriors along a random in-grammar phone path (the
    realistic pruning regime; uniform posteriors would defeat the beam)."""
    from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
    from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm

    rng = np.random.default_rng(seed)
    phones = {f"p{i}": i + 1 for i in range(n_phones)}
    phone_names = list(phones)
    lexicon = {
        f"w{i}": [phone_names[j] for j in
                  rng.integers(0, n_phones, size=rng.integers(3, 7))]
        for i in range(n_words)
    }
    words = sorted(lexicon)
    word_syms = {w: i + 1 for i, w in enumerate(words)}
    sents = [[words[j] for j in rng.integers(0, n_words,
                                             size=rng.integers(3, 9))]
             for _ in range(n_sents)]
    lm = train_ngram_lm(sents, order=2)
    graph, _ = mkgraph(lexicon, lm, word_syms, phones)

    # peaked posteriors along a random word sequence's phone path
    path = []
    for w in [words[j] for j in rng.integers(0, n_words, size=12)]:
        for ph in lexicon[w]:
            path.extend([phones[ph]] * int(rng.integers(2, 5)))
    T = len(path)
    logits = rng.normal(size=(T, n_phones)).astype(np.float64)
    logits[np.arange(T), np.asarray(path) - 1] += 6.0
    log_posts = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    return graph, log_posts


def bench_hybrid(beam=16.0, max_active=2000, repeats=3):
    """Hybrid-path graph-search RTF: frame-synchronous Viterbi over a
    compiled graph on the HOST (the role Kaldi's C++ decoders play for
    the reference).  Times the production path (native C++ core when
    built, decode/latgen.py make_streaming_latgen) and, if native is
    available, the pure-Python oracle for the speedup ratio.  No
    accelerator involved."""
    from pytorch_kaldi_asr_tpu import native
    from pytorch_kaldi_asr_tpu.decode.latgen import (
        StreamingLatgen,
        latgen,
    )

    if not native.available():
        # fresh checkout: build the C++ core so the production path (and
        # the native-vs-python speedup) is what gets measured, not the
        # fallback; stay graceful where there is no compiler
        try:
            native.build()
        except Exception:
            pass

    graph, log_posts = hybrid_bench_setup()
    audio_sec = log_posts.shape[0] * 0.01

    def best_of(fn):
        fn()  # warm (graph conversion, caches)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = fn()
            best = min(best, time.perf_counter() - t0)
        assert res is not None, "hybrid bench decode died"
        return best

    t_prod = best_of(lambda: latgen(graph, log_posts, beam=beam,
                                    max_active=max_active))
    out = {
        "metric": "hybrid_rtf",
        "value": round(t_prod / audio_sec, 6),
        "unit": "rtf",
        "frames_per_sec": round(log_posts.shape[0] / t_prod, 1),
        "native": native.available(),
    }
    if native.available():
        def py_run():
            dec = StreamingLatgen(graph, beam=beam, max_active=max_active)
            dec.push(log_posts)
            return dec.finish()

        t_py = best_of(py_run)
        out["native_speedup_vs_python"] = round(t_py / t_prod, 1)

        # concurrency scaling: the native core releases the GIL, so two
        # threads decoding distinct utterances over the SHARED graph
        # should scale with host cores (~2x on >=2 cores, ~1x on 1)
        from concurrent.futures import ThreadPoolExecutor

        n_jobs = 8

        def serial():
            for _ in range(n_jobs):
                latgen(graph, log_posts, beam=beam, max_active=max_active)

        def threaded():
            with ThreadPoolExecutor(max_workers=2) as pool:
                list(pool.map(
                    lambda _: latgen(graph, log_posts, beam=beam,
                                     max_active=max_active),
                    range(n_jobs)))

        serial()  # warm
        t0 = time.perf_counter()
        serial()
        t_ser = time.perf_counter() - t0
        t0 = time.perf_counter()
        threaded()
        t_thr = time.perf_counter() - t0
        out["concurrency_scaling_x2"] = round(t_ser / max(t_thr, 1e-9), 2)
    return out


def bench_hybrid_device(beam=16.0, max_active=2000, batch=8, repeats=3):
    """Batched ON-DEVICE graph-search RTF (decode/device_latgen.py): the
    whole Viterbi recursion runs as one compiled XLA program on the
    accelerator, `batch` utterances per dispatch, with only the word/
    phone buffers returning to the host.  RTF counts the full batch's
    audio; compare against bench_hybrid()'s per-utterance host search."""
    from pytorch_kaldi_asr_tpu.decode.device_latgen import DeviceLatgen

    graph, log_posts = hybrid_bench_setup()
    T, P = log_posts.shape
    rng = np.random.default_rng(1)
    posts = np.zeros((batch, T, P), np.float32)
    for b in range(batch):
        v = log_posts + rng.normal(scale=0.1, size=log_posts.shape)
        posts[b] = v - np.log(np.exp(v).sum(1, keepdims=True))
    lens = np.full(batch, T, np.int32)
    audio_sec = batch * T * 0.01

    dec = DeviceLatgen(graph, beam=beam, max_active=max_active)
    res = dec.decode_batch(posts, lens)  # warm: compile + caches
    assert all(r is not None for r in res), "device hybrid bench died"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        dec.decode_batch(posts, lens)
        best = min(best, time.perf_counter() - t0)
    return {
        "metric": "hybrid_device_rtf",
        "value": round(best / audio_sec, 6),
        "unit": "rtf",
        "batch": batch,
        "frames_per_sec": round(batch * T / best, 1),
        "graph_states": graph.num_states,
    }


def _batched_posts(log_posts, batch, seed=1):
    T, P = log_posts.shape
    rng = np.random.default_rng(seed)
    posts = np.zeros((batch, T, P), np.float32)
    for b in range(batch):
        v = log_posts + rng.normal(scale=0.1, size=log_posts.shape)
        posts[b] = v - np.log(np.exp(v).sum(1, keepdims=True))
    return posts, np.full(batch, T, np.int32)


def bench_frontier_crossover(beam=16.0, max_active=2000, batch=8,
                             repeats=3, big_words=4000, big_sents=12000):
    """Dense-device vs frontier-device vs host-native graph-search
    crossover (round-3 verdict #2): times the top-K frontier decoder
    (decode/frontier_latgen.py) on the recipe-scale graph (~4k states,
    where the dense device path and the host native path both run) AND
    on a ~114k-state graph (past the dense path's [T,S,B] memory wall —
    the scale Kaldi's C++ decoders handle for the reference), against
    the host native C++ latgen on the same batch.  Emits per-path RTF
    plus the big-graph device/host ratio the auto-dispatcher
    (decode.device_latgen.make_device_latgen) is calibrated by."""
    from pytorch_kaldi_asr_tpu.decode.frontier_latgen import FrontierLatgen
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen

    out = {}

    def time_device(dec, posts, lens):
        res = dec.decode_batch(posts, lens)  # warm: compile + caches
        if not all(r is not None for r in res):
            raise RuntimeError("frontier bench beam died")
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            dec.decode_batch(posts, lens)
            best = min(best, time.perf_counter() - t0)
        return best, res

    def time_native(graph, posts, lens):
        best = float("inf")
        ref = [latgen(graph, posts[b, :lens[b]].astype(np.float64),
                      beam=beam, max_active=max_active)
               for b in range(len(posts))]
        for _ in range(repeats):
            t0 = time.perf_counter()
            for b in range(len(posts)):
                latgen(graph, posts[b, :lens[b]].astype(np.float64),
                       beam=beam, max_active=max_active)
            best = min(best, time.perf_counter() - t0)
        return best, ref

    def agreement(dev, ref):
        hit = sum(1 for d, r in zip(dev, ref)
                  if d is not None and r is not None and d[0] == r[0])
        return round(hit / max(len(ref), 1), 3)

    # recipe-scale graph (dense comfort zone)
    graph_s, log_posts_s = hybrid_bench_setup()
    posts_s, lens_s = _batched_posts(log_posts_s, batch)
    audio_s = batch * log_posts_s.shape[0] * 0.01
    dec = FrontierLatgen(graph_s, beam=beam, max_active=max_active)
    t, res = time_device(dec, posts_s, lens_s)
    tn, ref = time_native(graph_s, posts_s, lens_s)
    out["frontier_small_rtf"] = round(t / audio_s, 6)
    out["frontier_small_agreement"] = agreement(res, ref)
    out["native_small_rtf"] = round(tn / audio_s, 6)
    out["small_graph_states"] = graph_s.num_states

    # past the dense wall: ~114k states
    graph_b, log_posts_b = hybrid_bench_setup(
        n_words=big_words, n_phones=40, n_sents=big_sents, seed=0)
    posts_b, lens_b = _batched_posts(log_posts_b, batch)
    audio_b = batch * log_posts_b.shape[0] * 0.01
    dec = FrontierLatgen(graph_b, beam=beam, max_active=max_active)
    t, res = time_device(dec, posts_b, lens_b)
    tn, ref = time_native(graph_b, posts_b, lens_b)
    out["frontier_big_rtf"] = round(t / audio_b, 6)
    out["frontier_big_agreement"] = agreement(res, ref)
    out["native_big_rtf"] = round(tn / audio_b, 6)
    out["big_graph_states"] = graph_b.num_states
    out["frontier_big_vs_native"] = round(
        out["native_big_rtf"] / max(out["frontier_big_rtf"], 1e-9), 2)

    # the frontier's best measured regime (see BASELINE.md round-4
    # analysis): realistic pruning width + batch amortization.  Matched
    # max_active on both paths so the comparison is search-equivalent.
    B2, MA2 = 4 * batch, 256
    posts_t, lens_t = _batched_posts(log_posts_b, B2)
    audio_t = B2 * log_posts_b.shape[0] * 0.01
    dec = FrontierLatgen(graph_b, beam=beam, max_active=MA2)
    t, res = time_device(dec, posts_t, lens_t)
    tn, ref = time_native(graph_b, posts_t, lens_t)
    out["frontier_tuned_rtf"] = round(t / audio_t, 6)
    out["frontier_tuned_agreement"] = agreement(res, ref)
    out["native_tuned_rtf"] = round(tn / audio_t, 6)
    out["frontier_tuned_vs_native"] = round(
        out["native_tuned_rtf"] / max(out["frontier_tuned_rtf"], 1e-9), 2)
    out["tuned_batch"] = B2
    out["tuned_max_active"] = MA2
    return out


def bench_serve_contention(n_streams=32, max_active=256, beam=16.0,
                           contention=(0, 1, 3), repeats=3,
                           big_words=4000, big_sents=12000):
    """Multi-stream serving A/B under host load (round-4 VERDICT item 3):
    the device frontier decoder's claimed niche is N concurrent serve
    sessions on a host whose cores are contended by the server's OTHER
    work (feature prep, AM dispatch, HTTP).  Measures, on the ~114k-state
    graph at the tuned width:

    - host-native leg: N streams decoded by a thread pool over the C++
      latgen (GIL released — threads timeshare whatever cores the co-load
      leaves);
    - device-frontier leg: the same N streams decoded as ONE batch on the
      chip (host only dispatches);

    each under C background busy PROCESSES (OS-level contention, not GIL
    games).  Emits aggregate RTF per leg per C and the crossover C (the
    smallest contention at which the frontier wins), i.e. the dispatch
    recommendation for recipes/serve.py hybrid mode."""
    import subprocess
    import sys as _sys
    from concurrent.futures import ThreadPoolExecutor

    from pytorch_kaldi_asr_tpu.decode.frontier_latgen import FrontierLatgen
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen

    graph, log_posts = hybrid_bench_setup(
        n_words=big_words, n_phones=40, n_sents=big_sents, seed=0)
    posts, lens = _batched_posts(log_posts, n_streams)
    audio_s = n_streams * log_posts.shape[0] * 0.01

    dec = FrontierLatgen(graph, beam=beam, max_active=max_active)
    res = dec.decode_batch(posts, lens)  # warm compile + caches
    if not all(r is not None for r in res):
        raise RuntimeError("serve-contention bench beam died")
    pool = ThreadPoolExecutor(max_workers=min(n_streams, 8))

    def native_all():
        def one(b):
            return latgen(graph, posts[b, :lens[b]].astype(np.float64),
                          beam=beam, max_active=max_active)
        return list(pool.map(one, range(n_streams)))

    ref = native_all()  # warm page caches; agreement baseline
    agree = sum(1 for d, r in zip(res, ref)
                if d is not None and r is not None and d[0] == r[0])

    def timed(fn):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    crossover = None
    for c in contention:
        burners = [
            subprocess.Popen(
                [_sys.executable, "-c",
                 "while True:\n    sum(i*i for i in range(10000))"])
            for _ in range(c)
        ]
        try:
            tn = timed(native_all)
            tf = timed(lambda: dec.decode_batch(posts, lens))
        finally:
            for p in burners:
                p.kill()
            for p in burners:
                p.wait()
        row = {"contention": c,
               "native_rtf": round(tn / audio_s, 6),
               "frontier_rtf": round(tf / audio_s, 6),
               "frontier_vs_native": round(tn / max(tf, 1e-9), 2)}
        rows.append(row)
        if crossover is None and tf < tn:
            crossover = c
    return {
        "metric": "serve_contention_frontier_vs_native",
        "value": rows[-1]["frontier_vs_native"],
        "unit": "x (native_time/frontier_time at max contention)",
        "n_streams": n_streams,
        "max_active": max_active,
        "graph_states": graph.num_states,
        "agreement": round(agree / n_streams, 3),
        "rows": rows,
        "crossover_contention": crossover,
        "host_cores": os.cpu_count(),
    }


def bench_partials(total_frames=1500, chunk=40, feat_dim=40, beam=8,
                   partial_every=4, max_len=60, seed=0, partial_beam=None,
                   **cfg_overrides):
    """Incremental attention-mode partials vs full re-decode (VERDICT r3 #7).

    One growing streaming session: every ``partial_every`` pushes, time
    (a) the incremental path — serve._AttentionStream.sync: carried
    streaming encoder + KV-cached beam restarted from the previous
    partial's stable prefix — against (b) the round-3 path: offline
    re-decode of ALL accumulated audio (Recognizer.recognize).  A full
    warmup session runs first so the timed session hits only cached
    executables (the serving warmup contract).  The headline is the
    END-of-session latency ratio: the incremental path's cost is flat in
    session age while the re-decode path grows with it."""
    import os
    import tempfile

    import jax

    from pytorch_kaldi_asr_tpu.models import (
        TransformerConfig,
        init_transformer,
    )
    from pytorch_kaldi_asr_tpu.recipes.serve import Recognizer
    from pytorch_kaldi_asr_tpu.train.checkpoint import save_checkpoint

    cfg = TransformerConfig(src_dim=feat_dim, vocab_size=52,
                            encoder_max_len=total_frames + 100,
                            decoder_max_len=max_len + 4, **cfg_overrides)
    params = init_transformer(jax.random.PRNGKey(seed), cfg)
    tmp = tempfile.mkdtemp(prefix="bench_partials_")
    ckpt = os.path.join(tmp, "model")
    save_checkpoint(ckpt, params, cfg)
    vocab = os.path.join(tmp, "vocab.txt")
    with open(vocab, "w") as f:
        for i in range(cfg.vocab_size):
            f.write(f"w{i} {i}\n")
    q = max(chunk * partial_every, 100)
    buckets = tuple(q * i for i in range(1, -(-total_frames // q) + 1))
    rec = Recognizer(ckpt, vocab, beam_size=beam, max_token_seq_len=max_len,
                     buckets=buckets, partial_beam=partial_beam)

    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(total_frames, feat_dim)).astype(np.float32)

    def run_session(timed):
        astream = rec.new_attention_stream(stream_chunk=chunk)
        assert astream is not None, "model must stream exactly"
        chunks, rows = [], []
        for i, lo in enumerate(range(0, total_frames, chunk)):
            chunks.append(feats[lo:lo + chunk])
            if (i + 1) % partial_every:
                continue
            t0 = time.perf_counter()
            astream.sync(list(chunks))
            t_inc = time.perf_counter() - t0
            acc = np.concatenate(chunks, axis=0)
            t0 = time.perf_counter()
            rec.recognize(acc)
            t_full = time.perf_counter() - t0
            if timed:
                rows.append((len(chunks) * chunk, t_inc, t_full))
        return rows

    run_session(timed=False)  # compile every memory-pad/prefix/bucket shape
    rows = run_session(timed=True)
    first, last = rows[0], rows[-1]
    mid = rows[len(rows) // 2]
    return {
        "metric": "partials_incremental_vs_redecode",
        "value": round(last[2] / max(last[1], 1e-9), 2),
        "unit": "x faster at end-of-session",
        "session_sec": round(total_frames * 0.01, 1),
        "partial_beam": partial_beam or beam,
        "partials_timed": len(rows),
        "first_ms": {"frames": first[0], "incremental": round(first[1] * 1e3, 1),
                     "redecode": round(first[2] * 1e3, 1)},
        "mid_ms": {"frames": mid[0], "incremental": round(mid[1] * 1e3, 1),
                   "redecode": round(mid[2] * 1e3, 1)},
        "last_ms": {"frames": last[0], "incremental": round(last[1] * 1e3, 1),
                    "redecode": round(last[2] * 1e3, 1)},
        "session_total_ms": {
            "incremental": round(sum(r[1] for r in rows) * 1e3, 1),
            "redecode": round(sum(r[2] for r in rows) * 1e3, 1)},
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--which",
                        choices=["posterior", "decode", "streaming",
                                 "hybrid", "hybrid_device", "frontier",
                                 "partials", "serve_contention", "all"],
                        default="all")
    parser.add_argument("--session_sec", type=float, default=15.0,
                        help="partials bench session length (the round-5 "
                             "crossover sweep runs 15/60/120 s)")
    parser.add_argument("--partial_beam", type=int, default=0,
                        help="narrow beam for the partial path only "
                             "(0 = full beam)")
    opt = parser.parse_args(argv)
    if opt.which in ("posterior", "all"):
        print(json.dumps(bench_offline_posteriors()))
    if opt.which in ("decode", "all"):
        print(json.dumps(bench_decode()))
    if opt.which in ("streaming", "all"):
        print(json.dumps(bench_streaming_conformer()))
    if opt.which in ("hybrid", "all"):
        print(json.dumps(bench_hybrid()))
    if opt.which in ("hybrid_device", "all"):
        print(json.dumps(bench_hybrid_device()))
    if opt.which in ("frontier", "all"):
        print(json.dumps(bench_frontier_crossover()))
    if opt.which in ("partials", "all"):
        print(json.dumps(bench_partials(
            total_frames=int(opt.session_sec * 100),
            partial_beam=opt.partial_beam or None)))
    if opt.which == "serve_contention":  # not in "all": ~114k-state build
        print(json.dumps(bench_serve_contention()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
