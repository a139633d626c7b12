"""Recognition server: load a trained checkpoint once, serve n-best
hypotheses over HTTP.

The reference stops at batch decoding (decode.py writes a file); this is
the deployment surface on top of the same machinery: the KV-cached beam
search (decode/fast_beam.py) behind a long-lived process with
compile-count discipline — requests are padded to a small set of static
length buckets so XLA compiles each (bucket, beam) pair exactly once, and
every bucket is warmed at startup before the port opens.

Endpoints (stdlib http.server; zero dependencies):

- ``POST /recognize``  body = JSON ``{"features": [[...frame...], ...],
  "nbest": k}`` (feature matrix, frames x dim) or raw WAV bytes with
  ``Content-Type: audio/wav`` (fbank extracted on the fly, tools/fbank).
  Response: ``{"nbest": [{"text": ..., "score": ...}], "frames": N}``.
- ``POST /stream/start``  open a streaming session -> ``{"id": ...}``.
- ``POST /stream/<id>/push``  body ``{"features": [...], "partial":
  true}`` appends frames; with ``partial`` the accumulated audio is
  re-decoded for a running hypothesis (attention models have no
  frame-synchronous decoder; for that, pair models/streaming.py with
  decode.latgen.StreamingLatgen on the hybrid path).
- ``POST /stream/<id>/finish``  final n-best, closes the session.
- ``POST /reload``  hot checkpoint reload: swap weights in place (body
  optionally ``{"model_file": path}``; config must match — no recompiles,
  no dropped requests).
- ``GET /healthz``  liveness + model/config summary + request stats with
  a decode-latency histogram and p50/p95/p99.

Two modes:

- **attention** (default): enc-dec checkpoint + vocab; /recognize and
  sessions decode with the KV-cached beam; streaming partials re-decode
  the accumulated audio on request.
- **hybrid** (``-graph_dir``): AM checkpoint (recipes/train_am.py) + HCLG
  graph dir (recipes/mkgraph.py); /recognize runs posterior -> lattice ->
  n-best, and streaming sessions are TRUE streaming — chunked AM
  posteriors (models/streaming.py) feed the carried-token graph decoder
  (decode.latgen.StreamingLatgen), so every push returns a live partial
  for free.  Clients may push ANY chunk sizes: the server re-chunks
  internally to a fixed ``-stream_chunk`` frames (one compiled AM push
  shape per config), carrying remainders across pushes and flushing the
  ragged tail padded (exact: band and conv are causal).

Usage::

    python3 -m pytorch_kaldi_asr_tpu.recipes.serve \
        -read_model_file exp/model/combined -read_vocab_file lang/vocab.txt \
        -port 8600 -beam_size 8
    python3 -m pytorch_kaldi_asr_tpu.recipes.serve \
        -read_model_file exp/am -graph_dir exp/graph -beam 16 -port 8600
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

from pytorch_kaldi_asr_tpu.utils.logging import info


DEFAULT_BUCKETS = (100, 200, 300, 500)


def _clip_buckets(buckets, max_len):
    return tuple(b for b in sorted(buckets) if b <= max_len) or (max_len,)


def _pick_bucket(buckets, t):
    for b in buckets:
        if t <= b:
            return b
    return buckets[-1]


def _check_features(feats, src_dim):
    feats = np.asarray(feats, np.float32)
    if feats.ndim != 2 or feats.shape[1] != src_dim:
        raise ValueError(
            f"expected [T, {src_dim}] features, got {feats.shape}")
    return feats


class Recognizer:
    """Model + vocab + jit-warmed bucketed beam search; thread-safe via a
    lock (jit dispatch is serialized anyway on one chip)."""

    def __init__(self, model_file, vocab_file, *, beam_size=8,
                 max_token_seq_len=None, buckets=DEFAULT_BUCKETS,
                 use_cache=True, quantize_weights=False,
                 nlm_model_dir=None, lm_weight=0.3, partial_beam=None):
        from pytorch_kaldi_asr_tpu.data import instances
        from pytorch_kaldi_asr_tpu.decode.runner import _pick_search
        from pytorch_kaldi_asr_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(model_file)
        self.params, self.cfg = ck["params"], ck["cfg"]
        self.model_file = model_file
        self.model_meta = ck.get("meta", {})
        self.word2idx = instances.read_vocab(vocab_file)
        self.idx2word = {i: w for w, i in self.word2idx.items()}
        self.beam_size = beam_size
        # partials need STABILITY, not n-best quality: a narrower beam
        # for partial-only decodes attacks the beam-bound partial-latency
        # floor (docs/SERVING.md round-4 A/B); finals keep beam_size
        self.partial_beam = partial_beam or beam_size
        self.max_len = max_token_seq_len or self.cfg.decoder_max_len
        self.buckets = _clip_buckets(buckets, self.cfg.encoder_max_len)
        self.search = _pick_search(self.cfg, use_cache)
        fused = False
        if nlm_model_dir:
            # per-step shallow fusion in serving (decode/fusion.py);
            # composes with -quantize_weights: make_fused_search traces
            # BOTH int8 trees through one jit
            from pytorch_kaldi_asr_tpu.decode.fusion import (
                make_fused_search,
            )
            from pytorch_kaldi_asr_tpu.models.nlm import load_nlm

            lm_params, lm_cfg, _ = load_nlm(nlm_model_dir)
            self.search = make_fused_search(lm_params, lm_cfg, lm_weight,
                                            quantize=quantize_weights)
            fused = True
            info("serving with shallow fusion: %s at weight %.2f",
                 nlm_model_dir, lm_weight)
        self.quantize_weights = quantize_weights
        if quantize_weights:
            # int8-weight serving: store matmul weights as int8+scale and
            # dequantize INSIDE the jitted search (ops/quant.py) — 4x less
            # parameter HBM and per-step weight traffic, no model changes
            from pytorch_kaldi_asr_tpu.ops.quant import (
                quantize_tree,
                quantized_search_fn,
                tree_bytes,
            )

            before = tree_bytes(self.params)
            self.params, nq = quantize_tree(self.params)
            if not fused:
                # make_fused_search already owns the dequantizing jit
                self.search = quantized_search_fn(self.search)
            info("int8 weights: %d matmul tensors quantized, params "
                 "%.1f -> %.1f MB", nq, before / 1e6,
                 tree_bytes(self.params) / 1e6)
        self.lock = threading.Lock()

    def reload(self, model_file=None):
        """Hot checkpoint reload: swap in new weights WITHOUT recompiling
        or dropping requests — the config must match the serving one (the
        compiled programs are specialized to it), so this serves the
        train-longer/fine-tune redeploy, not an architecture change.
        Returns the new checkpoint's meta."""
        from pytorch_kaldi_asr_tpu.train.checkpoint import load_checkpoint

        path = model_file or self.model_file
        ck = load_checkpoint(path)
        if ck["cfg"] != self.cfg:
            raise ValueError(
                f"checkpoint config at {path!r} differs from the serving "
                f"config; restart the server for architecture changes")
        new_params = ck["params"]
        if self.quantize_weights:
            from pytorch_kaldi_asr_tpu.ops.quant import quantize_tree

            new_params, _ = quantize_tree(new_params)
        with self.lock:  # swap between searches, never mid-search
            self.params = new_params
            self._stream_params = None  # re-derive for streaming sessions
            self.model_file = path
            self.model_meta = ck.get("meta", {})
        info("reloaded checkpoint %s (epoch %s, step %s)", path,
             self.model_meta.get("epoch"), self.model_meta.get("step"))
        return dict(self.model_meta)

    def warmup(self):
        """Compile every bucket before serving (first-compile latency must
        not land on a request)."""
        import jax

        for b in self.buckets:
            t0 = time.time()
            src = np.zeros((1, b, self.cfg.src_dim), np.float32)
            mask = np.zeros((1, b), np.uint8)
            mask[:, :2] = 1
            result = self.search(self.params, self.cfg, jax.numpy.asarray(src),
                                 jax.numpy.asarray(mask),
                                 beam_size=self.beam_size,
                                 max_len=self.max_len)
            jax.block_until_ready(result)
            info("warmed bucket %d in %.1fs", b, time.time() - t0)

    def warmup_batched(self, max_batch):
        """Compile the (max_batch, bucket) search shapes (MicroBatcher
        serving: every request rides a batch_pad=max_batch search)."""
        for b in self.buckets:
            t0 = time.time()
            self.recognize_many(
                [np.zeros((b, self.cfg.src_dim), np.float32)],
                batch_pad=max_batch)
            info("warmed batched bucket %d (batch %d) in %.1fs", b,
                 max_batch, time.time() - t0)

    def _bucket(self, t):
        return _pick_bucket(self.buckets, t)

    def check_features(self, feats):
        return _check_features(feats, self.cfg.src_dim)

    @property
    def stream_params(self):
        """Float parameter tree for the streaming paths (the carried
        encoders and the memory beam run outside quantized_search_fn's
        dequantizing jit); dequantized once and cached when serving
        int8.  Derived and cached under the recognizer lock so a
        concurrent reload cannot repopulate the cache with a pre-reload
        tree."""
        with self.lock:
            p = getattr(self, "_stream_params", None)
            if p is None:
                p = self.params
                if self.quantize_weights:
                    from pytorch_kaldi_asr_tpu.ops.quant import (
                        dequantize_tree,
                    )

                    p = dequantize_tree(self.params)
                self._stream_params = p
            return p

    def new_attention_stream(self, stream_chunk=40):
        """An :class:`_AttentionStream` for incremental partials, or None
        when this model cannot stream exactly (non-causal band/conv or a
        folded front end) — the handler then falls back to the
        re-decode-accumulated-audio partial path."""
        from pytorch_kaldi_asr_tpu.models.streaming import (
            FixedChunkStream,
            StreamingBandedEncoder,
            StreamingConformer,
            StreamingTDNN,
        )

        cfg = self.cfg
        if cfg.src_fold != 1:
            return None
        params = self.stream_params  # one generation for the whole session
        try:
            if cfg.encoder_type == "conformer":
                frontend = FixedChunkStream(
                    StreamingConformer(params["encoder"], cfg),
                    chunk=stream_chunk)
            elif cfg.encoder_type == "banded":
                frontend = FixedChunkStream(
                    StreamingBandedEncoder(params["encoder"], cfg),
                    chunk=stream_chunk)
            elif cfg.encoder_type in ("tdnn", "tdnnf"):
                from pytorch_kaldi_asr_tpu.models.transformer import encode

                frontend = StreamingTDNN(params, cfg, encode)
            else:
                return None
        except ValueError:
            return None  # non-causal band / non-causal conv
        return _AttentionStream(self, frontend, params)

    def recognize_many(self, feats_list, nbest=1, batch_pad=None):
        """Decode several utterances in ONE fixed-shape batched search
        (the request-coalescing fast path).  ``batch_pad`` fixes the
        static batch dimension (defaults to len(feats_list)); extra rows
        are masked out.  Returns ([hyps per utt], [frames decoded])."""
        from pytorch_kaldi_asr_tpu.decode.runner import (
            ids_to_words,
            nbest_from_result,
        )

        feats_list = [self.check_features(f) for f in feats_list]
        n = len(feats_list)
        bp = batch_pad or n
        b = max(self._bucket(min(f.shape[0], self.cfg.encoder_max_len))
                for f in feats_list)
        src = np.zeros((bp, b, self.cfg.src_dim), np.float32)
        mask = np.zeros((bp, b), np.uint8)
        decoded = []
        for i, f in enumerate(feats_list):
            t = min(f.shape[0], b)
            src[i, :t] = f[:t]
            mask[i, :t] = 1
            decoded.append(t)
        with self.lock:
            result = self.search(self.params, self.cfg, src, mask,
                                 beam_size=self.beam_size,
                                 max_len=self.max_len)
            batch_nbest = nbest_from_result(result,
                                            min(nbest, self.beam_size))
        outs = []
        for hyps in batch_nbest[:n]:
            out = []
            for seq, score in hyps:
                words = ids_to_words(seq[1:-1], self.idx2word)
                out.append((" ".join(words), float(score)))
            outs.append(out)
        return outs, decoded

    def recognize(self, feats, nbest=1):
        """feats: [T, D] float matrix -> ([(text, score)] best-first,
        frames_decoded).  Inputs longer than the largest bucket are
        truncated to it (frames_decoded < T tells the caller)."""
        outs, decoded = self.recognize_many([feats], nbest=nbest)
        return outs[0], decoded[0]


class MicroBatcher:
    """Request coalescing: concurrent /recognize calls within a short
    window ride ONE batched search of static batch size ``max_batch``
    (padded rows masked), instead of queueing behind each other one by
    one — the standard serving amortization for accelerator backends.
    Compile-count discipline holds: shapes are (max_batch, bucket), one
    per bucket, warmed like the singles."""

    def __init__(self, recognizer, *, max_batch=8, window_ms=5.0):
        import queue

        self.rec = recognizer
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self._q = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def warmup(self):
        # only the (max_batch, bucket) shapes: every request through the
        # batcher uses batch_pad=max_batch, so the batch-1 shapes the
        # plain recognizer warms would be dead compilations here
        self.rec.warmup_batched(self.max_batch)

    def _run(self):
        import queue

        while True:
            first = self._q.get()
            group = [first]
            deadline = time.time() + self.window_s
            while len(group) < self.max_batch:
                timeout = deadline - time.time()
                if timeout <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                feats = [g["feats"] for g in group]
                nbest = max(g["nbest"] for g in group)
                outs, decoded = self.rec.recognize_many(
                    feats, nbest=nbest, batch_pad=self.max_batch)
                for g, out, d in zip(group, outs, decoded):
                    g["result"] = (out[:g["nbest"]], d)
                    g["event"].set()
            except Exception as e:  # noqa: BLE001 — fail the whole group
                for g in group:
                    g["error"] = e
                    g["event"].set()

    def recognize(self, feats, nbest=1):
        """Same contract as Recognizer.recognize; blocks until the batch
        containing this request completes."""
        # validate HERE, in the request thread: a malformed request must
        # raise to its own caller, never fail the whole coalesced group
        # inside the worker
        entry = {"feats": self.rec.check_features(feats), "nbest": nbest,
                 "event": threading.Event()}
        self._q.put(entry)
        entry["event"].wait()
        if "error" in entry:
            raise entry["error"]
        return entry["result"]

    def reload(self, model_file=None):
        # in-flight batches finish on the old params (the recognizer lock
        # orders the swap); queued ones pick up the new ones
        return self.rec.reload(model_file)

    def __getattr__(self, name):
        # transparent delegation of everything else the HTTP layer probes
        # (cfg, buckets, beam/beam_size, check_features, new_stream for
        # hybrid true streaming) — the batcher only intercepts the
        # offline recognize path
        rec = self.__dict__.get("rec")
        if rec is None:
            raise AttributeError(name)
        return getattr(rec, name)


class HybridRecognizer:
    """Hybrid AM + HCLG graph recognition with TRUE streaming: chunked AM
    posteriors (models.streaming.StreamingTDNN) feed the carried-state
    graph decoder (decode.latgen.StreamingLatgen) — partial hypotheses
    come from the live token set, no re-decoding.  Offline requests run
    the same posteriors through latgen_lattice for n-best."""

    def __init__(self, model_file, graph_dir, *, beam=16.0, max_active=2000,
                 priors_file=None, acoustic_scale=1.0,
                 buckets=DEFAULT_BUCKETS, quantize_weights=False,
                 decode_workers=None, stream_chunk=40):
        import jax

        from pytorch_kaldi_asr_tpu.fst.openfst_io import read_fst
        from pytorch_kaldi_asr_tpu.models import am
        from pytorch_kaldi_asr_tpu.recipes.mkgraph import read_symbol_table
        from pytorch_kaldi_asr_tpu.train.checkpoint import (
            load_checkpoint,
            read_checkpoint_config,
        )

        cfg, meta = read_checkpoint_config(model_file)
        template = am.init_am(jax.random.PRNGKey(0), cfg,
                              meta.get("n_targets"))
        ck = load_checkpoint(model_file, template_params=template)
        self.params, self.cfg = ck["params"], cfg
        self.model_file = model_file
        self.model_meta = dict(meta)
        self.graph = read_fst(os.path.join(graph_dir, "HLG.fst"))
        word_syms = read_symbol_table(os.path.join(graph_dir, "words.txt"))
        self.id2word = {v: k for k, v in word_syms.items()}
        self.beam = beam
        self.max_active = max_active
        self.acoustic_scale = acoustic_scale
        self.log_priors = (np.load(priors_file)
                           if priors_file else None)
        self.buckets = _clip_buckets(buckets, cfg.encoder_max_len)
        self.lock = threading.Lock()
        # host graph searches parallelize across a thread pool: the
        # native decoder (decode/latgen.py NativeStreamingLatgen) releases
        # the GIL for the whole C++ token-passing call, so batch decodes
        # scale with host cores — the role the reference hands to
        # multi-process Kaldi decode jobs (queue.pl JOB=1:N)
        self.decode_workers = decode_workers or min(8, os.cpu_count() or 1)
        self.stream_chunk = int(stream_chunk)
        # created eagerly: lazy creation from recognize_many would race
        # when two threads batch concurrently (duplicate executors, one
        # leaking its idle workers for the process lifetime)
        self._decode_pool = None
        if self.decode_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._decode_pool = ThreadPoolExecutor(
                max_workers=self.decode_workers,
                thread_name_prefix="graph-decode")
        self._search_lock = threading.Lock()
        self.graph_searches = 0
        self.graph_search_ms_total = 0.0

        from pytorch_kaldi_asr_tpu.models.am import am_log_posteriors

        self.quantize_weights = quantize_weights
        if quantize_weights:
            from pytorch_kaldi_asr_tpu.ops.quant import (
                quantize_tree,
                tree_bytes,
            )

            before = tree_bytes(self.params)
            self.params, nq = quantize_tree(self.params)
            info("hybrid: int8 weights, %d tensors quantized, params "
                 "%.1f -> %.1f MB", nq, before / 1e6,
                 tree_bytes(self.params) / 1e6)

        def fwd(params, src, mask):
            if self.quantize_weights:
                from pytorch_kaldi_asr_tpu.ops.quant import dequantize_tree

                params = dequantize_tree(params)
            logp, _ = am_log_posteriors(params, self.cfg, src, mask)
            return logp

        self._jit_fwd = jax.jit(fwd)

    def warmup(self):
        """Compile the jitted AM forward per bucket.  The graph Viterbi is
        pure Python (nothing to compile) — decoding zeros at full length
        here would cost minutes of pointless CPU, not warmup."""
        for b in self.buckets:
            t0 = time.time()
            src = np.zeros((1, b, self.cfg.src_dim), np.float32)
            mask = np.zeros((1, b), np.uint8)
            mask[0, :2] = 1
            np.asarray(self._jit_fwd(self.params, src, mask))
            info("hybrid: warmed AM bucket %d in %.1fs", b,
                 time.time() - t0)

    def warmup_batched(self, max_batch):
        """Compile the (max_batch, bucket) AM shapes only — the graph
        Viterbi is host-side Python, so (unlike the attention path)
        there is nothing else to warm, and running it over bucket-length
        zero posteriors would burn minutes of CPU for nothing."""
        for b in self.buckets:
            t0 = time.time()
            self._posteriors_many(
                [np.zeros((b, self.cfg.src_dim), np.float32)],
                batch_pad=max_batch)
            info("hybrid: warmed AM bucket %d (batch %d) in %.1fs", b,
                 max_batch, time.time() - t0)

    def reload(self, model_file=None):
        """Hot AM checkpoint reload (same contract as Recognizer.reload:
        config and target count must match the serving ones)."""
        import jax

        from pytorch_kaldi_asr_tpu.models import am
        from pytorch_kaldi_asr_tpu.train.checkpoint import (
            load_checkpoint,
            read_checkpoint_config,
        )

        path = model_file or self.model_file
        cfg, meta = read_checkpoint_config(path)
        if cfg != self.cfg or (meta.get("n_targets")
                               != self.model_meta.get("n_targets")):
            raise ValueError(
                f"checkpoint config at {path!r} differs from the serving "
                f"config; restart the server for architecture changes")
        template = am.init_am(jax.random.PRNGKey(0), cfg,
                              meta.get("n_targets"))
        ck = load_checkpoint(path, template_params=template)
        new_params = ck["params"]
        if self.quantize_weights:
            from pytorch_kaldi_asr_tpu.ops.quant import quantize_tree

            new_params, _ = quantize_tree(new_params)
        with self.lock:
            self.params = new_params
            self.model_file = path
            self.model_meta = dict(meta)
        info("hybrid: reloaded checkpoint %s (epoch %s, step %s)", path,
             meta.get("epoch"), meta.get("step"))
        return dict(meta)

    def check_features(self, feats):
        return _check_features(feats, self.cfg.src_dim)

    def _bucket(self, t):
        return _pick_bucket(self.buckets, t)

    def _posteriors_many(self, feats_list, batch_pad=None):
        """ONE jitted + length-bucketed AM forward over several
        utterances (padded rows masked out): one compiled program per
        (batch, bucket) shape — the compile-count discipline the
        attention path keeps.  Returns ([posteriors per utt], [frames])."""
        n = len(feats_list)
        bp = batch_pad or n
        b = max(self._bucket(min(f.shape[0], self.cfg.encoder_max_len))
                for f in feats_list)
        src = np.zeros((bp, b, self.cfg.src_dim), np.float32)
        mask = np.zeros((bp, b), np.uint8)
        lens = []
        for i, f in enumerate(feats_list):
            t = min(f.shape[0], b)
            src[i, :t] = f[:t]
            mask[i, :t] = 1
            lens.append(t)
        with self.lock:
            logp = np.asarray(self._jit_fwd(self.params, src, mask),
                              np.float64)
        outs = []
        for i, t in enumerate(lens):
            out = logp[i, :t]
            if self.log_priors is not None:
                out = out - self.log_priors
            outs.append(out)
        return outs, lens

    def _graph_decode(self, posts, nbest):
        """Host-side graph search over one utterance's posteriors."""
        from pytorch_kaldi_asr_tpu.decode.latgen import (
            latgen,
            latgen_lattice,
        )
        from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest as nb_op

        if nbest > 1:
            lat = latgen_lattice(self.graph, posts, beam=self.beam,
                                 acoustic_scale=self.acoustic_scale,
                                 max_active=self.max_active,
                                 id2word=self.id2word)
            if lat is None:
                return []
            return [(" ".join(w), -c) for w, c in nb_op(lat, nbest)]
        res = latgen(self.graph, posts, beam=self.beam,
                     acoustic_scale=self.acoustic_scale,
                     max_active=self.max_active)
        if res is None:
            return []
        words, _phones, cost = res
        text = " ".join(self.id2word.get(w, "<unk>") for w in words)
        return [(text, -float(cost))]

    def _timed_decode(self, posts, nbest):
        t0 = time.time()
        out = self._graph_decode(posts, nbest)
        ms = (time.time() - t0) * 1e3
        with self._search_lock:
            self.graph_searches += 1
            self.graph_search_ms_total += ms
        return out

    def recognize_many(self, feats_list, nbest=1, batch_pad=None):
        """Batched recognition (the MicroBatcher contract): the AM runs
        once for the whole group; the graph searches fan out over the
        host thread pool, outside the device lock (the native decoder
        releases the GIL, so they run truly concurrently)."""
        feats_list = [self.check_features(f) for f in feats_list]
        posts_list, lens = self._posteriors_many(feats_list,
                                                 batch_pad=batch_pad)
        if self._decode_pool is not None and len(posts_list) > 1:
            outs = list(self._decode_pool.map(
                lambda p: self._timed_decode(p, nbest), posts_list))
        else:
            outs = [self._timed_decode(p, nbest) for p in posts_list]
        return outs, lens

    def recognize(self, feats, nbest=1):
        """([(text, score)], frames_decoded); score = NEGATED graph cost,
        so higher is better — the same convention as the attention mode's
        log-prob scores on every endpoint."""
        outs, lens = self.recognize_many([feats], nbest=nbest)
        return outs[0], lens[0]

    # -- streaming ---------------------------------------------------------

    def new_stream(self):
        from pytorch_kaldi_asr_tpu.decode.latgen import (
            make_streaming_latgen,
        )
        from pytorch_kaldi_asr_tpu.models.am import am_log_posteriors
        from pytorch_kaldi_asr_tpu.models.streaming import (
            FixedChunkStream,
            StreamingAM,
            StreamingTDNN,
        )

        # am_log_posteriors is passed as-is: StreamingTDNN memo-keys its
        # compiled push on (cfg, apply), so a module-level function lets
        # every session share one executable (a per-stream lambda would
        # recompile per session).  Dequantize ONCE per stream here rather
        # than rebuilding the float tree on every chunk.
        stream_params = self.params
        if self.quantize_weights:
            from pytorch_kaldi_asr_tpu.ops.quant import dequantize_tree

            stream_params = dequantize_tree(self.params)

        # frontend by encoder family: carried-cache attention/conv
        # streamers for conformer/banded, receptive-field overlap for
        # tdnn/tdnnf (all equality-pinned vs their offline encoders)
        if self.cfg.encoder_type in ("conformer", "banded"):
            # FixedChunkStream decouples client push sizes from the jitted
            # push shape: without it every distinct client chunk length
            # compiles a fresh executable (multi-second mid-session stall,
            # unbounded jit cache in a long-lived server)
            frontend = FixedChunkStream(StreamingAM(stream_params, self.cfg),
                                        chunk=self.stream_chunk)
        else:
            frontend = StreamingTDNN(stream_params, self.cfg,
                                     am_log_posteriors)

        return _HybridStream(
            frontend,
            make_streaming_latgen(self.graph, beam=self.beam,
                                  acoustic_scale=self.acoustic_scale,
                                  max_active=self.max_active,
                                  log_priors=self.log_priors),
            self.id2word, self.lock)


class _AttentionStream:
    """Incremental partials for attention-mode streaming sessions.

    The round-3 partial path re-decoded ALL accumulated audio on every
    ``partial: true`` push — O(T^2) per session.  Here a carried
    streaming encoder (models/streaming.py — exact vs the offline
    encoder) grows the cross-attention memory chunk by chunk, and each
    partial restarts the KV-cached beam from the previous partial's
    STABLE prefix via decode/fast_beam.fast_beam_search_memory: encoding
    cost is paid once per frame, and the forced prefix skips the beam
    bookkeeping for tokens that already converged.  ``finish`` is NOT
    routed here — the handler still runs the offline Recognizer on the
    full audio, preserving the reference decode.py result contract
    exactly (partials are a serving-side extra; the reference has none).

    Compile discipline AND transfer discipline: client chunks are
    re-chunked server-side (FixedChunkStream), the encoder memory is
    DEVICE-RESIDENT in a capacity buffer that doubles from MEM_PAD (so a
    session compiles O(log(audio)) search shapes), and forced-prefix
    lengths are quantized down to PREFIX_QUANT multiples.  Keeping the
    memory on device means each partial uploads only the NEW emit
    (O(chunk)) instead of re-uploading the whole accumulated memory
    (O(T)) — on a networked transport the old host-side memory made
    per-partial latency GROW with session age (measured 293→726 ms
    across a 60 s session, docs/SERVING.md round-5 sweep)."""

    PREFIX_QUANT = 32   # forced-prefix lengths: multiples of this
    STABLE_TAIL = 2     # a partial's last tokens may flip; never force them
    MEM_PAD = 128       # memory capacity quantum (doubles from here)

    def __init__(self, recognizer, frontend, params):
        # params are PINNED at creation: a mid-session /reload must not
        # mix old-encoder memory (and an old-model forced prefix) with
        # new decoder weights — the session finishes on the model it
        # started with, like the hybrid path's new_stream
        self.rec = recognizer
        self.frontend = frontend
        self.params = params
        self.lock = recognizer.lock
        self.frames = 0          # frames already fed to the frontend
        self._mem_dev = None     # [1, cap, d] device-resident memory
        self._mem_t = 0          # valid frames in _mem_dev
        self._prev_ids = []      # previous partial's token ids (no BOS/EOS)

    def _append_mem(self, emit):
        """Append an emitted encoder chunk [1, t, d] to the
        device-resident memory, doubling capacity from MEM_PAD as needed
        (O(log) distinct shapes per session; the copy on growth is
        device-to-device)."""
        import jax
        import jax.numpy as jnp

        t_new = self._mem_t + emit.shape[1]
        cap = 0 if self._mem_dev is None else self._mem_dev.shape[1]
        if t_new > cap:
            new_cap = self.MEM_PAD
            while new_cap < t_new:
                new_cap *= 2
            buf = jnp.zeros((1, new_cap, emit.shape[2]), jnp.float32)
            if self._mem_dev is not None:
                buf = jax.lax.dynamic_update_slice(
                    buf, self._mem_dev, (0, 0, 0))
            self._mem_dev = buf
        self._mem_dev = jax.lax.dynamic_update_slice(
            self._mem_dev, emit, (0, self._mem_t, 0))
        self._mem_t = t_new

    def sync(self, chunks):
        """Feed any accumulated-audio frames the frontend has not seen
        (``chunks`` = the session's full chunk list) and decode a
        partial.  Called ONLY on partial-requesting pushes — plain
        push/finish sessions never pay the streaming encoder.  Returns
        the partial text, or None when no encoder output is available
        yet (the caller then falls back to the offline re-decode).  The
        text lags the pushed audio by up to the server re-chunk size
        (the carried remainder cannot be flushed mid-stream)."""
        from pytorch_kaldi_asr_tpu.decode.fast_beam import (
            fast_beam_search_memory,
        )
        from pytorch_kaldi_asr_tpu.decode.runner import (
            ids_to_words,
            nbest_from_result,
        )

        import jax
        import jax.numpy as jnp

        with self.lock:
            acc = np.concatenate(chunks, axis=0).astype(np.float32)
            if acc.shape[0] > self.frames:
                emit = self.frontend.push(acc[None, self.frames:])
                self.frames = acc.shape[0]
                if emit is not None:
                    self._append_mem(jnp.asarray(emit, jnp.float32))
            if self._mem_t == 0:
                return None
            enc = self._mem_dev
            t, cap = self._mem_t, enc.shape[1]
            # tiny [1, cap] host->device mask; the memory itself stays
            # on device (the O(chunk)-per-partial transfer contract)
            mask = np.zeros((1, cap), np.float32)
            mask[0, :t] = 1.0
            max_len = self.rec.max_len
            p = len(self._prev_ids) - self.STABLE_TAIL
            p = max(0, min(p, max_len - self.PREFIX_QUANT))
            p -= p % self.PREFIX_QUANT
            prefix = np.asarray([self._prev_ids[:p]], np.int32)
            result = fast_beam_search_memory(
                self.params, self.rec.cfg, enc, mask, prefix,
                beam_size=self.rec.partial_beam, max_len=max_len)
            hyps = nbest_from_result(result, 1)[0]
            if not hyps:
                self._prev_ids = []
                return ""
            seq, _score = hyps[0]
            self._prev_ids = [int(x) for x in seq[1:-1]]
            words = ids_to_words(self._prev_ids, self.rec.idx2word)
            return " ".join(words)


class _HybridStream:
    """Per-session state: chunked AM frontend + carried-token decoder."""

    def __init__(self, frontend, decoder, id2word, lock):
        self.frontend = frontend
        self.decoder = decoder
        self.id2word = id2word
        self.lock = lock
        self.frames = 0

    def _words(self, ids):
        return " ".join(self.id2word.get(w, "<unk>") for w in ids)

    def push(self, feats):
        """Feed [T, D] frames; returns (total_frames, partial_text).
        All decoder/frontend state access stays under the lock — the
        threading HTTP server may run pipelined pushes to the same
        session on different threads, and partial() walks structures
        that push()/_compact() mutate."""
        with self.lock:
            self.frames += feats.shape[0]
            emit = self.frontend.push(feats[None])
            if emit is not None:
                self.decoder.push(emit[0])
            p = self.decoder.partial()
            return self.frames, (self._words(p[0]) if p else "")

    def finish(self):
        """(text, score) of the final hypothesis with score = -cost
        (higher is better, matching /recognize); None if the beam died."""
        with self.lock:
            tail = self.frontend.flush()
            if tail is not None:
                self.decoder.push(tail[0])
            res = self.decoder.finish()
        if res is None:
            return None
        words, _phones, cost = res
        return self._words(words), -float(cost)


def _features_from_request(body, content_type, src_dim):
    """JSON feature matrix or WAV bytes -> ([T, D] features, payload)."""
    if content_type.startswith("audio/"):
        import tempfile

        from pytorch_kaldi_asr_tpu.tools.fbank import (
            FbankConfig,
            compute_fbank,
        )
        from pytorch_kaldi_asr_tpu.tools.wav import read_wav

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(body)
            f.flush()
            samples, rate = read_wav(f.name)
        if samples.ndim > 1:
            samples = samples[:, 0]
        cfg = FbankConfig(sample_rate=rate, num_bins=src_dim)
        return np.asarray(compute_fbank(samples, cfg)), {}
    payload = json.loads(body.decode("utf-8"))
    return np.asarray(payload["features"], np.float32), payload


class SessionStore:
    """Streaming sessions: accumulated feature chunks keyed by id, with
    TTL-based expiry swept on access.  All chunk mutation happens under
    the store lock — a concurrent sweep/finish can never lose a chunk a
    push already acknowledged."""

    def __init__(self, ttl=600.0):
        self.ttl = ttl
        self._sessions = {}
        self._lock = threading.Lock()
        self._counter = 0

    def _sweep(self, now):
        dead = [k for k, s in self._sessions.items()
                if now - s["touched"] > self.ttl]
        for k in dead:
            del self._sessions[k]

    def start(self):
        with self._lock:
            now = time.time()
            self._sweep(now)
            self._counter += 1
            sid = f"s{self._counter:06d}"
            self._sessions[sid] = {"chunks": [], "touched": now}
            return sid

    def append(self, sid, feats):
        """Append a chunk; returns the total frame count, or None if the
        session does not exist (expired/finished)."""
        with self._lock:
            self._sweep(time.time())
            s = self._sessions.get(sid)
            if s is None:
                return None
            s["touched"] = time.time()
            s["chunks"].append(feats)
            return sum(c.shape[0] for c in s["chunks"])

    def snapshot(self, sid):
        """A stable copy of the accumulated chunks (or None)."""
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                return None
            s["touched"] = time.time()
            return list(s["chunks"])

    def get_stream(self, sid, recognizer):
        """Hybrid mode: the session's _HybridStream, created on first use
        (or None for an unknown/expired session)."""
        with self._lock:
            self._sweep(time.time())
            s = self._sessions.get(sid)
            if s is None:
                return None
            s["touched"] = time.time()
            if "stream" not in s:
                s["stream"] = recognizer.new_stream()
            return s["stream"]

    def get_astream(self, sid, factory):
        """Attention mode: the session's incremental-partial stream
        (_AttentionStream), created on first use; ``factory`` may return
        None (model cannot stream exactly), which is cached so the probe
        runs once per session.  The factory runs OUTSIDE the store lock
        (it may dequantize a whole int8 tree); a same-session race keeps
        the first stream stored."""
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                return None
            s["touched"] = time.time()
            if "astream" in s:
                return s["astream"]
        built = factory()
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                return None
            if "astream" not in s:
                s["astream"] = built
            return s["astream"]

    def peek_stream(self, sid):
        """(exists, stream-or-None) without creating a stream — finish
        must not build per-session state just to tear it down."""
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                return False, None
            s["touched"] = time.time()
            return True, s.get("stream")

    def touch(self, sid):
        """True if the session still exists (refreshes its TTL)."""
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                return False
            s["touched"] = time.time()
            return True

    def finish(self, sid):
        with self._lock:
            return self._sessions.pop(sid, None)


class ServerStats:
    """Cheap request counters + latency aggregates for /healthz."""

    #: fixed log-scale bucket upper edges (ms); the last bucket is open
    HIST_EDGES = (5, 10, 20, 50, 100, 200, 500, 1000, 2000, 5000)

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.decode_ms_total = 0.0
        self.decodes = 0
        self.inflight = 0
        self.started = time.time()
        self.hist = [0] * (len(self.HIST_EDGES) + 1)
        self.max_decode_ms = 0.0

    def enter(self):
        with self._lock:
            self.inflight += 1

    def leave(self):
        with self._lock:
            self.inflight -= 1

    def wait_idle(self, timeout=30.0):
        """Block until no requests are in flight (or timeout); True if
        idle was reached — the drain barrier SIGTERM waits on."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                if self.inflight == 0:
                    return True
            time.sleep(0.05)
        return False

    def record(self, error=False, decode_ms=None):
        with self._lock:
            self.requests += 1
            if error:
                self.errors += 1
            if decode_ms is not None:
                self.decodes += 1
                self.decode_ms_total += decode_ms
                self.max_decode_ms = max(self.max_decode_ms, decode_ms)
                i = 0
                while (i < len(self.HIST_EDGES)
                       and decode_ms > self.HIST_EDGES[i]):
                    i += 1
                self.hist[i] += 1

    def _percentile(self, q):
        """Latency percentile estimated from the histogram (linear
        interpolation inside the containing bucket; the open last bucket
        interpolates toward the max seen).  None with no samples."""
        total = sum(self.hist)
        if not total:
            return None
        target = q * total
        seen = 0.0
        for i, count in enumerate(self.hist):
            if seen + count >= target and count:
                lo = self.HIST_EDGES[i - 1] if i else 0.0
                hi = (self.HIST_EDGES[i] if i < len(self.HIST_EDGES)
                      else max(self.max_decode_ms, lo))
                frac = (target - seen) / count
                # an estimate must not exceed the largest sample seen
                return min(lo + frac * (hi - lo), self.max_decode_ms)
            seen += count
        return self.max_decode_ms

    def summary(self):
        with self._lock:
            avg = (self.decode_ms_total / self.decodes
                   if self.decodes else None)
            out = {
                "requests": self.requests,
                "errors": self.errors,
                "decodes": self.decodes,
                "avg_decode_ms": round(avg, 1) if avg is not None else None,
                "uptime_s": round(time.time() - self.started, 1),
            }
            if self.decodes:
                out["max_decode_ms"] = round(self.max_decode_ms, 1)
                for name, q in (("p50_ms", 0.5), ("p95_ms", 0.95),
                                ("p99_ms", 0.99)):
                    p = self._percentile(q)
                    out[name] = round(p, 1) if p is not None else None
                # {"<=5": n, ..., "<=5000": n, ">5000": n}, zero buckets
                # skipped so small servers stay readable
                hist = {}
                for i, count in enumerate(self.hist):
                    if not count:
                        continue
                    key = (f"<={self.HIST_EDGES[i]}"
                           if i < len(self.HIST_EDGES)
                           else f">{self.HIST_EDGES[-1]}")
                    hist[key] = count
                out["latency_hist_ms"] = hist
            return out


def make_handler(recognizer, sessions=None, stats=None):
    from http.server import BaseHTTPRequestHandler

    sessions = sessions if sessions is not None else SessionStore()
    stats = stats if stats is not None else ServerStats()

    class Handler(BaseHTTPRequestHandler):
        def handle(self):
            # inflight covers the WHOLE connection (header parsing, GETs,
            # decode) so the SIGTERM drain barrier cannot exit while any
            # accepted request is being served
            stats.enter()
            try:
                super().handle()
            finally:
                stats.leave()

        def _send(self, code, obj):
            data = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # route through our logger
            info("http: " + fmt, *args)

        def do_GET(self):
            if self.path == "/healthz":
                out = {
                    "status": "ok",
                    "mode": ("hybrid"
                             if hasattr(recognizer, "new_stream")
                             else "attention"),
                    "encoder_type": recognizer.cfg.encoder_type,
                    "src_dim": recognizer.cfg.src_dim,
                    "model_file": recognizer.model_file,
                }
                out["buckets"] = list(recognizer.buckets)
                if hasattr(recognizer, "new_stream"):  # hybrid
                    out["beam"] = recognizer.beam
                    from pytorch_kaldi_asr_tpu import native as _native

                    with recognizer._search_lock:
                        n = recognizer.graph_searches
                        ms = recognizer.graph_search_ms_total
                    out["graph_search"] = {
                        "native": _native.available(),
                        "decode_workers": recognizer.decode_workers,
                        "searches": n,
                        "mean_ms": round(ms / n, 3) if n else None,
                    }
                else:
                    out["beam_size"] = recognizer.beam_size
                    out["vocab_size"] = recognizer.cfg.vocab_size
                out["stats"] = stats.summary()
                self._send(200, out)
            else:
                self._send(404, {"error": "unknown path"})

        def _read_body(self):
            length = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(length)

        def do_POST(self):
            # handlers RETURN (code, payload, verdict); stats are recorded
            # BEFORE the response is sent so a client that fires its next
            # request immediately observes up-to-date counters
            t0 = time.time()
            try:
                if self.path == "/recognize":
                    code, out, verdict = self._recognize()
                elif self.path == "/reload":
                    code, out, verdict = self._reload()
                elif self.path == "/stream/start":
                    code, out, verdict = 200, {"id": sessions.start()}, "ok"
                elif self.path.startswith("/stream/"):
                    code, out, verdict = self._stream()
                else:
                    code, out, verdict = 404, {"error": "unknown path"}, None
            except Exception as e:  # noqa: BLE001 — server must not die
                code, out, verdict = 400, {"error": repr(e)[:500]}, None
            # verdicts: "decode" = latency sample, "ok" = plain request,
            # None = error (404/410/exception)
            if verdict == "decode":
                stats.record(decode_ms=(time.time() - t0) * 1e3)
            elif verdict == "ok":
                stats.record()
            else:
                stats.record(error=True)
            self._send(code, out)

        def _recognize(self):
            body = self._read_body()
            ctype = self.headers.get("Content-Type", "application/json")
            feats, payload = _features_from_request(
                body, ctype, recognizer.cfg.src_dim)
            nbest = int(payload.get("nbest", 1))
            t0 = time.time()
            hyps, decoded = recognizer.recognize(feats, nbest=nbest)
            out = {
                "nbest": [{"text": t, "score": s} for t, s in hyps],
                "frames": decoded,
                "latency_ms": round((time.time() - t0) * 1e3, 1),
            }
            if decoded < np.asarray(feats).shape[0]:
                out["truncated"] = True  # input exceeded the largest bucket
            return 200, out, "decode"

        def _reload(self):
            """Hot checkpoint reload: body optionally names a new model
            path ``{"model_file": ...}``; default re-reads the serving
            one (the fine-tune-in-place redeploy).  A config mismatch is
            a 400 and the old weights keep serving."""
            body = self._read_body()
            payload = json.loads(body.decode("utf-8")) if body else {}
            try:
                meta = recognizer.reload(payload.get("model_file"))
            except (ValueError, OSError) as e:
                return 400, {"error": str(e)[:500]}, None
            return 200, {"status": "reloaded",
                         "model_file": recognizer.model_file,
                         "epoch": meta.get("epoch"),
                         "step": meta.get("step")}, "ok"

        def _stream(self):
            """Returns (code, payload, verdict): verdict "decode" for
            calls that ran a model, "ok" for served non-decoding calls,
            None for unknown/expired sessions — do_POST uses this to
            keep the stats honest."""
            parts = self.path.split("/")  # ['', 'stream', sid, verb]
            if len(parts) != 4 or parts[3] not in ("push", "finish"):
                return 404, {"error": "unknown stream path"}, None
            sid, verb = parts[2], parts[3]
            if hasattr(recognizer, "new_stream"):
                return self._stream_hybrid(sid, verb)
            if verb == "push":
                body = self._read_body()
                ctype = self.headers.get("Content-Type",
                                         "application/json")
                feats, payload = _features_from_request(
                    body, ctype, recognizer.cfg.src_dim)
                # validate BEFORE appending: a bad chunk must not poison
                # the session's accumulated audio
                feats = recognizer.check_features(feats)
                frames = sessions.append(sid, feats)
                if frames is None:
                    return 404, {"error": f"no session {sid}"}, None
                out = {"frames": frames}
                decoded = False
                if payload.get("partial"):
                    # Measured dispatch (docs/SERVING.md round-5 sweep):
                    # the bucketed full re-decode is FLAT in session age
                    # and <= the incremental path at every measured
                    # length (15/60/120 s), so it is the default while
                    # the audio fits the decode buckets.  Beyond the
                    # largest bucket re-decode TRUNCATES, so the
                    # incremental stream (also flat: device-resident
                    # memory, O(chunk) transfer per partial) takes over
                    # — its streaming encoder catches up from the
                    # accumulated chunks on first use.  finish() below
                    # stays a full offline decode either way (reference
                    # decode.py result contract).
                    partial = None
                    chunks = sessions.snapshot(sid)
                    total = sum(c.shape[0] for c in chunks) if chunks else 0
                    if chunks and total > max(recognizer.buckets):
                        astream = sessions.get_astream(
                            sid, recognizer.new_attention_stream)
                        if astream is not None:
                            partial = astream.sync(chunks)
                    if partial is None and chunks:
                        acc = np.concatenate(chunks, axis=0)
                        hyps, _ = recognizer.recognize(acc, nbest=1)
                        partial = hyps[0][0] if hyps else ""
                    if partial is not None:
                        out["partial"] = partial
                        decoded = True
                return 200, out, ("decode" if decoded else "ok")
            else:  # finish: decode from a snapshot FIRST, pop only after
                # success so a failed decode leaves the session retryable
                chunks = sessions.snapshot(sid)
                if chunks is None:
                    return 404, {"error": f"no session {sid}"}, None
                if not chunks:
                    sessions.finish(sid)
                    return 200, {"nbest": [], "frames": 0}, "ok"
                payload = {}
                body = self._read_body()
                if body:
                    payload = json.loads(body.decode("utf-8"))
                acc = np.concatenate(chunks, axis=0)
                t0 = time.time()
                hyps, decoded = recognizer.recognize(
                    acc, nbest=int(payload.get("nbest", 1)))
                sessions.finish(sid)
                out = {
                    "nbest": [{"text": t, "score": s} for t, s in hyps],
                    "frames": decoded,
                    "latency_ms": round((time.time() - t0) * 1e3, 1),
                }
                if decoded < acc.shape[0]:
                    out["truncated"] = True
                return 200, out, "decode"

        def _stream_hybrid(self, sid, verb):
            """True streaming for the hybrid recognizer: per-session
            chunked AM frontend + carried-token graph decoder; partials
            come from the live token set for free."""
            if verb == "push":
                body = self._read_body()
                ctype = self.headers.get("Content-Type",
                                         "application/json")
                feats, _payload = _features_from_request(
                    body, ctype, recognizer.cfg.src_dim)
                feats = recognizer.check_features(feats)
                stream = sessions.get_stream(sid, recognizer)
                if stream is None:
                    return 404, {"error": f"no session {sid}"}, None
                frames, partial = stream.push(feats)
                if not sessions.touch(sid):  # swept mid-push
                    return 410, {"error": f"session {sid} expired"}, None
                return 200, {"frames": frames, "partial": partial}, "decode"
            else:  # finish
                exists, stream = sessions.peek_stream(sid)
                if not exists:
                    return 404, {"error": f"no session {sid}"}, None
                if stream is None or stream.frames == 0:
                    # nothing was pushed: same empty contract as the
                    # attention mode, no spurious "no surviving path"
                    sessions.finish(sid)
                    return 200, {"nbest": [], "frames": 0}, "ok"
                t0 = time.time()
                res = stream.finish()
                sessions.finish(sid)
                if res is None:
                    return 200, {
                        "nbest": [], "frames": stream.frames,
                        "error": "no surviving path"}, "decode"
                text, score = res
                return 200, {
                    "nbest": [{"text": text, "score": score}],
                    "frames": stream.frames,
                    "latency_ms": round((time.time() - t0) * 1e3, 1),
                }, "decode"

    return Handler


def serve(recognizer, port, *, host="127.0.0.1"):
    """Blocking server loop (ThreadingHTTPServer; recognition itself is
    serialized by the recognizer lock)."""
    from http.server import ThreadingHTTPServer

    import signal

    stats = ServerStats()
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(recognizer, stats=stats))
    if hasattr(recognizer, "new_stream"):
        info("serving on %s:%d (hybrid, buckets %s, graph beam %.1f)",
             host, port, recognizer.buckets, recognizer.beam)
    else:
        info("serving on %s:%d (buckets %s, beam %d)", host, port,
             recognizer.buckets, recognizer.beam_size)

    def _term(_sig, _frame):
        info("SIGTERM: stop accepting, draining in-flight requests")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:  # not the main thread (tests)
        pass
    httpd.serve_forever()
    # serve_forever returned: the accept loop is closed, but handler
    # threads may still be mid-decode — wait for them before exiting so
    # no client gets a connection reset.  The brief sleep lets threads
    # spawned for just-accepted connections reach their enter() call.
    time.sleep(0.2)
    if stats.wait_idle(timeout=30.0):
        info("server drained and stopped")
    else:
        info("server stopped with requests still in flight after 30s")
    httpd.server_close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_model_file", required=True)
    parser.add_argument("-read_vocab_file", default=None,
                        help="vocab (attention mode)")
    parser.add_argument("-graph_dir", default=None,
                        help="HCLG graph dir -> hybrid AM mode with true "
                             "streaming (the model file must be an AM "
                             "checkpoint from recipes/train_am.py)")
    parser.add_argument("-priors_file", default=None,
                        help="hybrid mode: .npy log-priors to divide out")
    parser.add_argument("-acoustic_scale", type=float, default=1.0)
    parser.add_argument("-port", type=int, default=8600)
    parser.add_argument("-host", default="127.0.0.1")
    parser.add_argument("-beam_size", type=int, default=8)
    parser.add_argument("-partial_beam", type=int, default=0,
                        help="narrower beam for streaming PARTIAL decodes "
                             "only (0 = use -beam_size); finals are "
                             "unaffected — partials need stability, not "
                             "n-best quality")
    parser.add_argument("-beam", type=float, default=16.0,
                        help="hybrid graph beam")
    parser.add_argument("-max_token_seq_len", type=int, default=None)
    parser.add_argument("-buckets", default=None,
                        help="comma-separated frame-length buckets "
                             "(default 100,200,300,500 clipped to the "
                             "encoder max length)")
    parser.add_argument("-max_batch", type=int, default=1,
                        help=">1 coalesces concurrent requests into one "
                             "batched search of this static size "
                             "(both modes; in hybrid mode the AM forward "
                             "batches, the graph searches stay per-utt)")
    parser.add_argument("-batch_window_ms", type=float, default=5.0)
    parser.add_argument("-quantize_weights", action="store_true",
                        help="serve int8 matmul weights (ops/quant.py): "
                             "4x less parameter HBM/traffic, dequantized "
                             "inside the jitted step")
    parser.add_argument("-nlm_model_dir", default=None,
                        help="neural LM for per-step shallow fusion "
                             "(attention mode only)")
    parser.add_argument("-lm_weight", type=float, default=0.3)
    parser.add_argument("-no_warmup", action="store_true")
    parser.add_argument("-stream_chunk", type=int, default=40,
                        help="internal streaming push size in frames "
                             "(hybrid mode): client chunks are re-chunked "
                             "to this fixed shape so the jitted AM push "
                             "compiles once per config")
    opt = parser.parse_args(argv)

    buckets = (tuple(int(b) for b in opt.buckets.split(","))
               if opt.buckets else DEFAULT_BUCKETS)
    if opt.graph_dir:
        if opt.nlm_model_dir:
            parser.error("-nlm_model_dir applies to the attention search; "
                         "hybrid mode rescores via lattice tools instead")
        rec = HybridRecognizer(opt.read_model_file, opt.graph_dir,
                               beam=opt.beam, priors_file=opt.priors_file,
                               acoustic_scale=opt.acoustic_scale,
                               buckets=buckets,
                               quantize_weights=opt.quantize_weights,
                               stream_chunk=opt.stream_chunk)
    else:
        if not opt.read_vocab_file:
            parser.error("-read_vocab_file is required without -graph_dir")
        rec = Recognizer(opt.read_model_file, opt.read_vocab_file,
                         beam_size=opt.beam_size,
                         max_token_seq_len=opt.max_token_seq_len,
                         buckets=buckets,
                         quantize_weights=opt.quantize_weights,
                         nlm_model_dir=opt.nlm_model_dir,
                         lm_weight=opt.lm_weight,
                         partial_beam=opt.partial_beam or None)
    if opt.max_batch > 1:
        rec = MicroBatcher(rec, max_batch=opt.max_batch,
                           window_ms=opt.batch_window_ms)
    if not opt.no_warmup:
        rec.warmup()
    serve(rec, opt.port, host=opt.host)
    return 0


if __name__ == "__main__":
    sys.exit(main())
