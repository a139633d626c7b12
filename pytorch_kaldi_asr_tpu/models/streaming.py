"""Streaming chunked-attention inference with carried state.

The BASELINE RTF benchmark config: emit posteriors chunk by chunk with
bounded latency instead of waiting for the full utterance.  No reference
implementation exists (SURVEY.md §7 hard part 6); the design here:

- ``banded`` encoder: exact streaming.  Each attention layer's window is
  ``[t+start, t]`` (causal band), so a per-layer rolling cache of the last
  ``-start`` input frames makes chunked outputs IDENTICAL to full-utterance
  outputs (pinned by tests).  Position ids saturate at ``encoder_max_len-1``
  for audio longer than the table (deviation from the offline model, which
  simply cannot exceed the cap).
- ``tdnn``/``tdnnf`` encoders: exact streaming via receptive-field overlap —
  the frontend is a finite FIR stack, so re-processing ``left_rf`` carried
  frames plus waiting for ``right_rf`` lookahead frames reproduces offline
  outputs exactly with algorithmic latency ``right_rf`` frames.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_asr_tpu.models.common import (
    position_encoding_rows,
)
from pytorch_kaldi_asr_tpu.models.transformer import (
    _Rngs,
    feed_forward,
    multi_head_attention,
)


def receptive_field(cfg):
    """(left, right) context frames the tdnn/tdnnf encoders need per output
    frame (every tdnn context, plus the lda splice for the flagship tdnn
    encoder only — the tdnnf encoder has no lda splice)."""
    if cfg.encoder_type == "tdnn":
        left = -min(min(cfg.lda_context), 0)
        right = max(max(cfg.lda_context), 0)
    else:
        left = right = 0
    for ctx in cfg.tdnn_contexts:
        left += -min(min(ctx), 0)
        right += max(max(ctx), 0)
    return left, right


class StreamingTDNN:
    """Chunked driver for the tdnn/tdnnf encoders via overlap recompute.

    Each push runs at most ONE jitted forward over the carried buffer —
    an eager forward costs one tunnel round-trip per op, measured at
    ~500 ms vs ~RTT per partial on the axon transport (BASELINE.md
    round-4 partials A/B).  Compile discipline without breaking
    exactness: the buffer is NEVER padded (the TDNN's symmetric context
    means trailing pad frames would leak f(bias) values back into the
    last real frames at depth — zero-pad equality is impossible), so
    instead the EMISSION is quantized: a forward runs only when at least
    :data:`QUANT` frames are ready, over a window of exactly
    ``hist + k*QUANT + right_rf`` real frames.  Under a fixed push
    cadence (serving re-chunks clients server-side) the window shape set
    is tiny and steady; ragged session tails compile their own exact
    shape once, at session end only."""

    QUANT = 32  # emit-granularity (bounds compiled window shapes)

    def __init__(self, params, cfg, apply_fn):
        if cfg.encoder_type not in ("tdnn", "tdnnf"):
            raise ValueError("StreamingTDNN serves tdnn/tdnnf encoders")
        self.params = params
        self.cfg = cfg
        self.apply = apply_fn
        self.left_rf, self.right_rf = receptive_field(cfg)
        # buffer = [hist (<= left_rf frames already emitted) | pending]
        self._buf = None
        self._hist_len = 0
        self._global0 = 0  # global frame index of buf[:, 0]

    def reset(self):
        self._buf = None
        self._hist_len = 0
        self._global0 = 0

    def _fwd(self, win_len):
        """One compiled forward over ``buf[:, :win_len]`` (exact length,
        no padding); memo-keyed on (cfg, apply) so every session of one
        server shares executables.  params/pos_offset are traced (hot
        reload does not recompile)."""
        cfg, apply = self.cfg, self.apply

        def build():
            import jax

            def f(p, buf, off):
                mask = jnp.ones(buf.shape[:2], jnp.uint8)
                out, _ = apply(p, cfg, buf, mask, pos_offset=off)
                return out

            return jax.jit(f)

        fn = _memo_jit(("tdnn_push", cfg, apply), build)
        return fn(self.params, self._buf[:, :win_len],
                  jnp.int32(self._global0))

    def _emit(self, n_emit, win_len):
        """Forward over the first ``win_len`` buffer frames, emit
        ``n_emit`` frames starting at the first un-emitted one, advance
        the buffer."""
        p0 = self._hist_len
        out = self._fwd(win_len)
        emit = np.asarray(out[:, p0 : p0 + n_emit])
        # drop frames no longer needed as left context
        new_first_pending = p0 + n_emit
        drop = max(0, new_first_pending - self.left_rf)
        self._buf = self._buf[:, drop:]
        self._hist_len = new_first_pending - drop
        self._global0 += drop
        return emit

    def push(self, chunk):
        """Feed [B, T, D] new frames; returns outputs for ready frames in
        QUANT multiples (a frame is ready when its full receptive field
        is available — the emission lags the input by ``right_rf`` plus
        up to QUANT-1 carried frames), or None if nothing is ready."""
        chunk = np.asarray(chunk)
        if self._buf is None:
            self._buf = chunk
            self._hist_len = 0
        else:
            self._buf = np.concatenate([self._buf, chunk], axis=1)
        n_ready = self._buf.shape[1] - self._hist_len - self.right_rf
        k = n_ready // self.QUANT
        if k <= 0:
            return None
        n_emit = k * self.QUANT
        return self._emit(n_emit, self._hist_len + n_emit + self.right_rf)

    def flush(self):
        """End of stream: emit every remaining frame (the final right_rf
        frames see zero right-context, exactly as the offline encoder
        sees past the utterance end)."""
        if self._buf is None or self._buf.shape[1] <= self._hist_len:
            return None
        emit = self._emit(self._buf.shape[1] - self._hist_len,
                          self._buf.shape[1])
        self.reset()
        return emit


# jitted per-push forwards, shared across streaming instances (serving
# creates one streamer per session; cfg is a frozen dataclass, so keying
# on it lets every session reuse the same compiled push).  On networked
# accelerator transports (the axon tunnel) an EAGER push costs one
# round-trip per op — ~dozens per chunk — so fusing the whole push into
# one jitted call is the difference between ~300 ms and ~RTT per chunk.
_JIT_PUSH = {}


def _memo_jit(key, builder):
    """Get-or-build the shared compiled push for ``key`` — the single
    memoization point for every jitted streaming entry (conformer push,
    banded push, AM head), so cache keying/eviction policy lives in one
    place."""
    fn = _JIT_PUSH.get(key)
    if fn is None:
        fn = _JIT_PUSH[key] = builder()
    return fn


def _conformer_mhsa_chunk(p, x, keys, n_cache, cfg, window):
    """Chunk MHSA against cached+current keys; numerics mirror
    encoders._conformer_mhsa (post-LN, 1/sqrt(d_model) scale)."""
    from pytorch_kaldi_asr_tpu.models.common import (
        layer_norm,
        masked_softmax,
    )

    dtype = cfg.compute_dtype
    b, t, d_model = x.shape
    residual = x
    qs = jnp.einsum("bld,hdk->bhlk", x.astype(dtype),
                    p["w_qs"].astype(dtype))
    ks = jnp.einsum("bld,hdk->bhlk", keys.astype(dtype),
                    p["w_ks"].astype(dtype))
    vs = jnp.einsum("bld,hdv->bhlv", keys.astype(dtype),
                    p["w_vs"].astype(dtype))
    logits = jnp.einsum("bhqk,bhlk->bhql", qs, ks) / jnp.sqrt(
        jnp.array(d_model, dtype=dtype))
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(keys.shape[1])[None, :]
    rel = kj - (qi + n_cache)
    blocked = ~((rel >= -window) & (rel <= 0))
    attn = masked_softmax(logits.astype(jnp.float32),
                          blocked[None, None]).astype(dtype)
    out = jnp.einsum("bhql,bhlv->bhqv", attn, vs)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, -1)
    out = out @ p["proj"]["w"].astype(dtype) + p["proj"]["b"].astype(dtype)
    out = (out + residual).astype(cfg.conformer_stream_dtype)
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=False)


def _conformer_conv_chunk(p, x, conv_cache, cfg):
    """Causal conv module over [cached GLU frames | chunk].  Returns
    (chunk outputs, new cache)."""
    import jax

    from pytorch_kaldi_asr_tpu.models.common import layer_norm

    dtype = cfg.compute_dtype
    residual = x
    h = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"], skip_len1=False)
    h = h.astype(dtype) @ p["pw1"]["w"].astype(dtype) + p["pw1"][
        "b"].astype(dtype)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU
    kernel = p["dw"]["w"].astype(dtype)  # [K, D]
    k = kernel.shape[0]
    conv_in = jnp.concatenate([conv_cache.astype(h.dtype), h], axis=1)
    new_cache = conv_in[:, -(k - 1):] if k > 1 else conv_in[:, :0]
    y = jax.lax.conv_general_dilated(
        conv_in.transpose(0, 2, 1), kernel.T[:, None, :],
        window_strides=(1,), padding=[(0, 0)],  # cache IS the padding
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=conv_in.shape[-1],
    ).transpose(0, 2, 1) + p["dw"]["b"].astype(dtype)
    y = y.astype(cfg.conformer_stream_dtype)
    y = layer_norm(y, p["norm"]["gamma"], p["norm"]["beta"],
                   skip_len1=False)
    y = jax.nn.swish(y)
    y = y.astype(dtype) @ p["pw2"]["w"].astype(dtype) + p["pw2"][
        "b"].astype(dtype)
    return residual + y.astype(cfg.conformer_stream_dtype), new_cache


def _conformer_push_jit(cfg):
    """One fused jitted device call per push: src_proj + positions + all
    layers (half-FFN / cached MHSA / cached causal conv / half-FFN), with
    the carried caches as pytree inputs/outputs that stay on device."""
    def build():
        import jax

        return jax.jit(_conformer_push_fn(cfg))

    return _memo_jit(("conformer", cfg), build)


def _conformer_push_fn(cfg):
    from pytorch_kaldi_asr_tpu.models.encoders import _half_ffn

    window = -cfg.encoder_sub_sequence[0]

    def push_fn(params, chunk, pos, attn_caches, conv_caches):
        dtype = cfg.compute_dtype
        sd = cfg.conformer_stream_dtype
        rngs = _Rngs(None)
        x = chunk.astype(dtype) @ params["src_proj"]["w"].astype(dtype)
        x = x.astype(sd) + pos[None].astype(sd)
        new_attn, new_conv = [], []
        for li, layer in enumerate(params["layers"]):
            x = _half_ffn(layer["ffn1"], x, cfg, 0.0, rngs, False)
            cache = attn_caches[li]
            keys = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            n_cache = cache.shape[1]  # static under jit
            new_attn.append(keys[:, -window:] if window else keys[:, :0])
            x = _conformer_mhsa_chunk(layer["mhsa"], x, keys, n_cache,
                                      cfg, window)
            x, nc = _conformer_conv_chunk(layer["conv"], x,
                                          conv_caches[li], cfg)
            new_conv.append(nc)
            x = _half_ffn(layer["ffn2"], x, cfg, 0.0, rngs, False)
        return x, tuple(new_attn), tuple(new_conv)

    return push_fn


class StreamingConformer:
    """Exact chunked inference for the Conformer encoder.

    Requirements (both checked): a CAUSAL attention band
    (``encoder_sub_sequence`` end == 0) and a CAUSAL depthwise conv
    (``conformer_causal_conv=True``) — with those, per-layer carried
    state makes chunked outputs IDENTICAL to the offline
    ``conformer_encode`` (pinned by tests), with zero algorithmic
    latency.  Carried state per layer:

    - attention: the last ``-start`` frames of the MHSA input (keys and
      values are recomputed from them — same trick as
      :class:`StreamingBandedEncoder`);
    - conv: the last ``kernel-1`` frames of the post-GLU activation
      (zeros initially, exactly the causal conv's left padding).

    The macaron half-FFNs and layer norms are position-wise and need no
    state.  The streaming RTF benchmark config (BASELINE.md)."""

    def __init__(self, params, cfg):
        if cfg.encoder_type != "conformer":
            raise ValueError("StreamingConformer serves the conformer "
                             "encoder")
        start, end = cfg.encoder_sub_sequence
        if end != 0:
            raise ValueError("streaming needs a causal band (end == 0)")
        if not cfg.conformer_causal_conv:
            raise ValueError(
                "streaming needs conformer_causal_conv=True (a centered "
                "depthwise conv reads future frames)")
        self.params = params
        # LN must apply even on length-1 chunks (see StreamingBandedEncoder)
        self.cfg = cfg.replace(ln_skip_len1=False)
        self.window = -start
        self._attn_caches = None  # per layer [B, <=window, D] MHSA inputs
        self._conv_caches = None  # per layer [B, k-1, D] post-GLU frames
        self._offset = 0

    def reset(self):
        self._attn_caches = None
        self._conv_caches = None
        self._offset = 0

    def push_device(self, chunk):
        """Feed [B, T, D] frames; returns [B, T, en_d_model] outputs as a
        DEVICE array (no host sync — composable with a downstream jitted
        head without paying a transfer round-trip).  The whole push is
        ONE jitted device call (see _conformer_push_jit); caches live on
        device between pushes."""
        cfg = self.cfg
        chunk = jnp.asarray(chunk)
        b, t, _ = chunk.shape
        if self._attn_caches is None:
            layers = self.params["layers"]
            self._attn_caches = tuple(
                jnp.zeros((b, 0, cfg.en_d_model), cfg.conformer_stream_dtype)
                for _ in layers)
            # conv caches hold post-GLU activations (compute dtype), width
            # kernel-1 — zeros are exactly the causal conv's left padding
            self._conv_caches = tuple(
                jnp.zeros((b, lay["conv"]["dw"]["w"].shape[0] - 1,
                           lay["conv"]["pw1"]["w"].shape[1] // 2),
                          cfg.compute_dtype)
                for lay in layers)

        # closed-form rows at the global offsets: O(T*D) per push even
        # hours into a stream (a full table rebuild would grow linearly
        # with stream age), same values as the offline encoder's table
        pos = position_encoding_rows(self._offset + np.arange(t),
                                     cfg.en_d_model)
        out, self._attn_caches, self._conv_caches = _conformer_push_jit(cfg)(
            self.params, chunk, pos, self._attn_caches, self._conv_caches)
        self._offset += t
        return out

    def push(self, chunk):
        """Feed [B, T, D] frames; returns [B, T, en_d_model] host outputs
        (latency = 0 frames: band and conv are both causal)."""
        return np.asarray(self.push_device(chunk))

    def flush(self):
        """Causal model: nothing is pending at end of stream."""
        return None


class StreamingAM:
    """Chunked AM posteriors from a streaming ENCODER: applies the AM
    output head to each emitted encoder chunk.  Gives conformer/banded
    AMs the same push/flush contract recipes/serve.py's hybrid streaming
    sessions use with StreamingTDNN."""

    def __init__(self, params, cfg, *, log_priors=None):
        from pytorch_kaldi_asr_tpu.models.encoders import ENCODER_APPLYS

        if cfg.encoder_type == "conformer":
            self.encoder = StreamingConformer(params["encoder"], cfg)
        elif cfg.encoder_type == "banded":
            self.encoder = StreamingBandedEncoder(params["encoder"], cfg)
        else:
            raise ValueError(
                f"StreamingAM serves conformer/banded encoders, not "
                f"{cfg.encoder_type!r} (use StreamingTDNN)")
        assert cfg.encoder_type in ENCODER_APPLYS
        self.params = params
        self.cfg = cfg
        if log_priors is None:
            self.log_priors = None
        else:
            # one host->device transfer at construction; a host array here
            # would re-transfer on EVERY push (the latency path)
            import jax

            self.log_priors = jax.device_put(jnp.asarray(log_priors))

    def reset(self):
        self.encoder.reset()

    def _head(self, enc):
        cfg = self.cfg
        with_priors = self.log_priors is not None

        def build():
            import jax

            from pytorch_kaldi_asr_tpu.models.am import head_log_posteriors

            if not with_priors:
                return jax.jit(lambda p, e: head_log_posteriors(p, cfg, e))
            return jax.jit(lambda p, e, lp: head_log_posteriors(
                p, cfg, e, log_priors=lp))

        fn = _memo_jit(("am_head", cfg, not with_priors), build)
        args = (self.params, jnp.asarray(enc))
        if with_priors:
            args += (self.log_priors,)
        return np.asarray(fn(*args))

    def push(self, chunk):
        # push_device keeps the encoder chunk on device so encoder + head
        # cost ONE host sync per push, not two (the two jitted calls
        # dispatch asynchronously; only the final np.asarray blocks)
        enc = self.encoder.push_device(chunk)
        return None if enc is None else self._head(enc)

    def flush(self):
        enc = self.encoder.flush()
        out = None if enc is None else self._head(enc)
        self.encoder.reset()
        return out


class FixedChunkStream:
    """Decouples CLIENT push sizes from the jitted push shape.

    The fused streaming pushes (``_conformer_push_jit`` /
    ``_banded_push_jit``) compile once per (chunk length, cache width);
    a client that streams arbitrary chunk sizes (nothing in the HTTP
    contract enforces one) would trigger a fresh XLA compile per new
    length — multi-second stalls mid-session and an unboundedly growing
    executable cache in a long-lived server.  This adapter buffers
    incoming frames and forwards fixed ``chunk``-frame pushes, so the
    whole server compiles exactly ONE push shape per config.

    The ragged tail is pushed at :meth:`flush` padded up to ``chunk``
    frames with the padded outputs sliced off — EXACT for these
    frontends: their attention band and conv are causal, so padding sits
    strictly in the future of every valid frame, and the stream ends
    (and resets) immediately after.

    Wraps any push/flush/reset frontend taking [B, T, D] and returning
    [B, T, ...] (:class:`StreamingAM`, :class:`StreamingConformer`,
    :class:`StreamingBandedEncoder`)."""

    def __init__(self, inner, chunk=40):
        if int(chunk) <= 0:
            raise ValueError(f"chunk must be positive, got {chunk}")
        self.inner = inner
        self.chunk = int(chunk)
        self._buf = None  # [B, <chunk, D] carried remainder

    def reset(self):
        self._buf = None
        self.inner.reset()

    def push(self, feats):
        feats = np.asarray(feats)
        buf = (feats if self._buf is None
               else np.concatenate([self._buf, feats], axis=1))
        outs, lo, t = [], 0, buf.shape[1]
        while t - lo >= self.chunk:
            out = self.inner.push(buf[:, lo:lo + self.chunk])
            lo += self.chunk
            if out is not None:
                outs.append(np.asarray(out))
        self._buf = buf[:, lo:] if lo < t else None
        return np.concatenate(outs, axis=1) if outs else None

    def flush(self):
        outs = []
        if self._buf is not None and self._buf.shape[1]:
            t_valid = self._buf.shape[1]
            pad = np.zeros(
                (self._buf.shape[0], self.chunk - t_valid)
                + self._buf.shape[2:], self._buf.dtype)
            out = self.inner.push(np.concatenate([self._buf, pad], axis=1))
            if out is not None:
                outs.append(np.asarray(out)[:, :t_valid])
            self._buf = None
        tail = self.inner.flush()
        if tail is not None:
            outs.append(np.asarray(tail))
        return np.concatenate(outs, axis=1) if outs else None


def _banded_push_jit(cfg):
    """Fused jitted push for the banded encoder: src_proj + positions +
    every (cached banded MHSA, FFN) layer in one device call."""
    def build():
        import jax

        return jax.jit(_banded_push_fn(cfg))

    return _memo_jit(("banded", cfg), build)


def _banded_push_fn(cfg):
    window = -cfg.encoder_sub_sequence[0]

    def push_fn(params, chunk, pos, caches):
        dtype = cfg.compute_dtype
        rngs = _Rngs(None)
        b, t = chunk.shape[0], chunk.shape[1]
        x = chunk.astype(dtype) @ params["src_proj"]["w"].astype(dtype)
        x = x.astype(jnp.float32) + pos[None]
        new_caches = []
        for li, layer in enumerate(params["layers"]):
            cache = caches[li]
            keys = jnp.concatenate([cache, x], axis=1)
            n_cache = cache.shape[1]  # static under jit
            # blocked mask over [T, n_cache+T]: query i (global q = i) may
            # attend key j when 0 <= (i + n_cache - j) <= window
            qi = jnp.arange(t)[:, None]
            kj = jnp.arange(n_cache + t)[None, :]
            rel = kj - (qi + n_cache)
            blocked = ~((rel >= -window) & (rel <= 0))
            blocked = jnp.broadcast_to(blocked[None], (b,) + blocked.shape)
            new_caches.append(keys[:, -window:] if window else keys[:, :0])
            x = multi_head_attention(
                layer["slf"], x, keys, keys, blocked, cfg, 0.0, rngs, False
            )
            x = feed_forward(layer["ffn"], x, cfg, 0.0, rngs, False)
        return x + pos[None], tuple(new_caches)

    return push_fn


class StreamingBandedEncoder:
    """Exact chunked inference for the banded self-attention encoder with
    per-layer K/V input caches (window must be causal: end == 0)."""

    def __init__(self, params, cfg):
        if cfg.encoder_type != "banded":
            raise ValueError("serves the 'banded' encoder")
        start, end = cfg.encoder_sub_sequence
        if end != 0:
            raise ValueError("streaming needs a causal band (end == 0)")
        self.params = params
        # layer norm must apply even on length-1 chunks: the offline encoder
        # runs LN at every position of the full utterance, so the
        # length-1-skip quirk would break streaming/offline equality for
        # frame-by-frame streaming
        self.cfg = cfg.replace(ln_skip_len1=False)
        self.window = -start
        self._caches = None  # per layer: [B, window, D] of layer INPUT
        self._offset = 0

    def reset(self):
        self._caches = None
        self._offset = 0

    def push_device(self, chunk):
        """Feed [B, T, D] frames; returns [B, T, en_d_model] outputs as a
        DEVICE array (latency = 0 frames: the band is causal).  One jitted
        device call per push (see _banded_push_jit); K/V input caches stay
        on device."""
        cfg = self.cfg
        chunk = jnp.asarray(chunk)
        b, t, _ = chunk.shape
        if self._caches is None:
            self._caches = tuple(
                jnp.zeros((b, 0, cfg.en_d_model), jnp.float32)
                for _ in self.params["layers"])

        # closed-form global-offset rows: matches the offline encoder,
        # which EXTRAPOLATES past encoder_max_len (encoders.py:140) — a
        # clipped fixed table would diverge on streams longer than
        # encoder_max_len and grow per-push cost with stream age
        pos = position_encoding_rows(self._offset + np.arange(t),
                                     cfg.en_d_model)
        out, self._caches = _banded_push_jit(cfg)(
            self.params, chunk, pos, self._caches)
        self._offset += t
        return out

    def push(self, chunk):
        """Feed [B, T, D] frames; returns host outputs (see push_device)."""
        return np.asarray(self.push_device(chunk))

    def flush(self):
        """Causal band: nothing is pending at end of stream."""
        return None
