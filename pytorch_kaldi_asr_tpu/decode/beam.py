"""On-device batched beam search with fixed-shape lanes.

TPU-first redesign of the reference's host-side decode loop
(decode.py:22-107 + Lattice.py): instead of gathering a variable number of
active partial sequences to the host every step (decode.py:57-98, with a
device→host transfer per step), the whole search runs as one compiled XLA
program over ``[batch × beam]`` lanes:

- hypotheses live in a static ``[B·beam, T]`` token buffer; each step decodes
  the buffer and reads the logits at the current position (the banded causal
  self-attention window guarantees positions > t cannot influence position t);
- the reference's competition rule — finished hypotheses stay in the pool and
  compete with all extensions of active ones (Lattice.py:50-56) — becomes a
  ``top_k`` over ``beam·V`` extension candidates concatenated with ``beam``
  keep-finished candidates;
- lanes are always sorted by score (top_k is descending), matching the
  reference's beam ordering, so n-best extraction is just the first rows.

The first step is decoded separately on a length-1 buffer so the reference's
layer-norm length-1 skip (Modules.py:43-44) fires exactly as it does in the
original; subsequent steps use the full buffer.

Exactness vs the host Lattice oracle is pinned in tests/test_decode.py."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.models.transformer import decode_logits, encode
from pytorch_kaldi_asr_tpu.utils import constants


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, beam, T+1] int32 (BOS at column 0)
    scores: jnp.ndarray  # [B, beam] float32, sorted descending
    lengths: jnp.ndarray  # [B, beam] int32 tokens incl BOS+EOS (T+1 if unfinished)
    finished: jnp.ndarray  # [B, beam] bool


def _advance(state, word_lk, t, beam_size, vocab):
    """One beam step: pool = extensions ∪ kept-finished, global top-k.

    When every lane is finished this is an exact no-op (all extension
    candidates are -inf; top_k returns the finished lanes in their existing
    sorted order), so the fixed-trip-count scan needs no early exit."""
    tokens, scores, finished, lengths = state
    b = scores.shape[0]
    word_lk = word_lk.reshape(b, beam_size, vocab)

    neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
    ext = jnp.where(finished[..., None], neg_inf, scores[..., None] + word_lk)
    keep = jnp.where(finished, scores, neg_inf)
    pool = jnp.concatenate([ext.reshape(b, beam_size * vocab), keep], axis=1)

    top_scores, top_idx = jax.lax.top_k(pool, beam_size)
    is_ext = top_idx < beam_size * vocab
    parent = jnp.where(is_ext, top_idx // vocab, top_idx - beam_size * vocab)
    word = jnp.where(is_ext, top_idx % vocab, constants.PAD).astype(jnp.int32)

    flat_parent = (jnp.arange(b)[:, None] * beam_size + parent).reshape(-1)
    tokens = tokens[flat_parent]
    new_word = jnp.where(is_ext.reshape(-1), word.reshape(-1),
                         tokens[:, t + 1])
    tokens = tokens.at[:, t + 1].set(new_word)

    now_eos = is_ext & (word == constants.EOS)
    parent_finished = jnp.take_along_axis(finished, parent, axis=1)
    parent_lengths = jnp.take_along_axis(lengths, parent, axis=1)
    new_finished = jnp.where(is_ext, now_eos, parent_finished)
    new_lengths = jnp.where(now_eos, t + 2, parent_lengths)

    return (tokens, top_scores, new_finished, new_lengths), parent


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_len"))
def beam_search(params, cfg, src, src_mask, *, beam_size, max_len):
    """Decode a batch.  ``max_len`` = reference ``max_token_seq_len``
    (run.sh:159): at most that many advance steps; the decoder itself never
    sees sequences longer than ``max_len`` (≤ cfg.decoder_max_len)."""
    if max_len > cfg.decoder_max_len:
        raise ValueError("max_len exceeds the decoder position table")
    b = src.shape[0]
    vocab = cfg.vocab_size

    enc_output, src_mask_f = encode(params, cfg, src, src_mask, train=False)
    enc_rep = jnp.repeat(enc_output, beam_size, axis=0)
    srcm_rep = jnp.repeat(src_mask_f, beam_size, axis=0)

    n = b * beam_size
    tokens = jnp.zeros((n, max_len + 1), jnp.int32).at[:, 0].set(constants.BOS)
    scores = jnp.full((b, beam_size), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
    finished = jnp.zeros((b, beam_size), bool)
    lengths = jnp.full((b, beam_size), max_len + 1, jnp.int32)

    ones_mask = jnp.ones((n, max_len), jnp.uint8)

    # Step 0 decodes the length-1 buffer [BOS]: the reference runs the
    # decoder on a seq-len-1 batch here, where layer norm is skipped.
    logits0 = decode_logits(
        params, cfg, tokens[:, :1], ones_mask[:, :1], srcm_rep, enc_rep
    )
    word_lk0 = jax.nn.log_softmax(logits0[:, 0, :], axis=-1)
    state, _ = _advance((tokens, scores, finished, lengths), word_lk0, 0,
                        beam_size, vocab)

    def step(state, t):
        tokens = state[0]
        logits = decode_logits(
            params, cfg, tokens[:, :max_len], ones_mask, srcm_rep, enc_rep
        )
        pos_logits = jnp.take_along_axis(
            logits,
            jnp.full((n, 1, 1), 0, jnp.int32) + t.astype(jnp.int32),
            axis=1,
        )[:, 0, :]
        word_lk = jax.nn.log_softmax(pos_logits, axis=-1)
        new_state, _ = _advance(state, word_lk, t, beam_size, vocab)
        return new_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(1, max_len))

    tokens, scores, finished, lengths = state
    return BeamResult(
        tokens=tokens.reshape(b, beam_size, max_len + 1),
        scores=scores,
        lengths=lengths,
        finished=finished,
    )
