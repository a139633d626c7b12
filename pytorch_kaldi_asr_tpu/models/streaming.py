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
    position_encoding_table,
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
    """Chunked driver for the tdnn/tdnnf encoders via overlap recompute."""

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

    def push(self, chunk):
        """Feed [B, T, D] new frames; returns outputs for every frame whose
        full receptive field is now available (lags the input by
        ``right_rf`` frames), or None if nothing is ready yet."""
        chunk = np.asarray(chunk)
        if self._buf is None:
            self._buf = chunk
            self._hist_len = 0
        else:
            self._buf = np.concatenate([self._buf, chunk], axis=1)
        p0 = self._hist_len  # first un-emitted frame
        n_pending = self._buf.shape[1] - p0
        n_ready = n_pending - self.right_rf
        if n_ready <= 0:
            return None
        mask = jnp.ones(self._buf.shape[:2], jnp.uint8)
        out, _ = self.apply(self.params, self.cfg, jnp.asarray(self._buf),
                            mask, pos_offset=self._global0)
        emit = np.asarray(out[:, p0 : p0 + n_ready])
        # drop frames no longer needed as left context
        new_first_pending = p0 + n_ready
        drop = max(0, new_first_pending - self.left_rf)
        self._buf = self._buf[:, drop:]
        self._hist_len = new_first_pending - drop
        self._global0 += drop
        return emit

    def flush(self):
        """End of stream: emit the final right_rf-lagged frames (their right
        context is padding-zero, exactly as the offline encoder sees)."""
        if self._buf is None or self._buf.shape[1] <= self._hist_len:
            return None
        mask = jnp.ones(self._buf.shape[:2], jnp.uint8)
        out, _ = self.apply(self.params, self.cfg, jnp.asarray(self._buf),
                            mask, pos_offset=self._global0)
        emit = np.asarray(out[:, self._hist_len:])
        self.reset()
        return emit


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
        self.pos_table = position_encoding_table(cfg.encoder_max_len,
                                                 cfg.en_d_model)
        self._caches = None  # per layer: [B, window, D] of layer INPUT
        self._offset = 0

    def reset(self):
        self._caches = None
        self._offset = 0

    def push(self, chunk):
        """Feed [B, T, D] frames; returns [B, T, en_d_model] outputs
        (latency = 0 frames: the band is causal)."""
        cfg = self.cfg
        b, t, _ = chunk.shape
        rngs = _Rngs(None)
        dtype = cfg.compute_dtype

        pos_idx = jnp.clip(
            self._offset + jnp.arange(t), 0, cfg.encoder_max_len - 1
        )
        x = jnp.asarray(chunk).astype(dtype) @ self.params["src_proj"][
            "w"
        ].astype(dtype)
        x = x.astype(jnp.float32) + self.pos_table[pos_idx][None]

        new_caches = []
        for li, layer in enumerate(self.params["layers"]):
            cache = None if self._caches is None else self._caches[li]
            if cache is None:
                keys = x
                n_cache = 0
            else:
                keys = jnp.concatenate([cache, x], axis=1)
                n_cache = cache.shape[1]
            # blocked mask over [T, n_cache+T]: query i (global q = i) may
            # attend key j when 0 <= (i + n_cache - j) <= window
            qi = jnp.arange(t)[:, None]
            kj = jnp.arange(n_cache + t)[None, :]
            rel = kj - (qi + n_cache)
            blocked = ~((rel >= -self.window) & (rel <= 0))
            blocked = jnp.broadcast_to(blocked[None], (b,) + blocked.shape)
            new_caches.append(
                np.asarray(keys[:, -self.window:]) if self.window else None
            )
            x = multi_head_attention(
                layer["slf"], x, keys, keys, blocked, cfg, 0.0, rngs, False
            )
            x = feed_forward(layer["ffn"], x, cfg, 0.0, rngs, False)

        out = x + self.pos_table[pos_idx][None]
        self._caches = new_caches
        self._offset += t
        return np.asarray(out)
