"""Shallow fusion: the neural LM inside the on-device beam search.

The reference can only apply its LM AFTER decoding (n-best rescoring,
rescore.py) — hypotheses the AM pruned are gone before the LM ever sees
them.  Shallow fusion scores every candidate DURING the search:

    score(w | prefix) = log p_AM(w | prefix, x) + lm_weight * log p_LM(w | prefix)

This module mirrors decode/fast_beam.py's KV-cached incremental search and
adds a second rolling cache for the causal-transformer LM (models/nlm.py).
The LM layers are the decoder's self-attention/FFN steps without
cross-attention, so the per-step kernels (_mha_step/_ffn_step) are reused
verbatim; the whole fused step stays one compiled scan on device.

Requires an NLM trained with ln_skip_len1=False (recipes/train_nlm.py
default): the length-1 LN skip would make one-token-at-a-time evaluation
diverge from batch scoring.  With ``lm_weight == 0`` the result equals
fast_beam_search exactly (pinned by tests/test_fusion.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.decode.beam import BeamResult, _advance
from pytorch_kaldi_asr_tpu.decode.fast_beam import (
    _decode_one,
    _ffn_step,
    _mha_step,
    _project_heads,
    empty_caches,
    gather_beam_lanes,
    project_cross_kv,
    roll_caches,
)
from pytorch_kaldi_asr_tpu.models.common import position_encoding_table
from pytorch_kaldi_asr_tpu.models.transformer import encode
from pytorch_kaldi_asr_tpu.utils import constants


def make_fused_search(lm_params, lm_cfg, lm_weight, *, quantize=False):
    """Build a ``(params, cfg, src, src_mask, *, beam_size, max_len)``
    search running :func:`fused_beam_search` — the one wiring point for
    recipes/serve.py and decode/runner.py.

    ``quantize=True`` composes with int8 serving: BOTH trees ride the jit
    as TRACED arguments (the caller passes its quantized AM tree), so the
    int8 weights live in HBM once and dequantize inside the step.
    Closure-capturing a quantized tree instead would bake it into every
    compiled (bucket, beam) executable as constants, which XLA constant-
    folds into full float copies — more HBM than not quantizing."""
    if not quantize:
        def search(p, c, src, src_mask, *, beam_size, max_len):
            return fused_beam_search(p, c, lm_params, lm_cfg, lm_weight,
                                     src, src_mask, beam_size=beam_size,
                                     max_len=max_len)

        return search

    from pytorch_kaldi_asr_tpu.ops.quant import (
        dequantize_tree,
        quantize_tree,
    )

    lm_q, _ = quantize_tree(lm_params)
    lm_q = jax.tree_util.tree_map(jnp.asarray, lm_q)  # device-resident

    @partial(jax.jit, static_argnames=("cfg", "beam_size", "max_len"))
    def _jit(params_q, lm_arg, cfg, src, src_mask, *, beam_size, max_len):
        return fused_beam_search(
            dequantize_tree(params_q), cfg, dequantize_tree(lm_arg),
            lm_cfg, lm_weight, src, src_mask, beam_size=beam_size,
            max_len=max_len)

    def search(p, c, src, src_mask, *, beam_size, max_len):
        return _jit(p, lm_q, c, src, src_mask, beam_size=beam_size,
                    max_len=max_len)

    return search


def nlm_step(lm_params, tokens_t, t, caches, pos_table):
    """One causal-LM step for all lanes: tokens_t [N] → (log-probs [N, V],
    new per-layer (k_t, v_t)).  ``caches``: per layer dict(k, v
    [N, H, W, d], valid [N, W]).  Matches models/nlm.py nlm_logits
    position-for-position when the cache holds the true history
    (ln_skip_len1=False models only)."""
    x = lm_params["embed"][tokens_t] + pos_table[t][None, :]
    d_model = x.shape[-1]
    n = tokens_t.shape[0]
    new_kv = []
    for li, layer in enumerate(lm_params["layers"]):
        cache = caches[li]
        k_t = _project_heads(x, layer["slf"]["w_ks"])
        v_t = _project_heads(x, layer["slf"]["w_vs"])
        new_kv.append((k_t, v_t))
        k_ctx = jnp.concatenate([cache["k"], k_t[:, :, None, :]], axis=2)
        v_ctx = jnp.concatenate([cache["v"], v_t[:, :, None, :]], axis=2)
        ctx_valid = jnp.concatenate(
            [cache["valid"], jnp.ones((n, 1), bool)], axis=1)
        x = _mha_step(layer["slf"], x, k_ctx, v_ctx, ctx_valid, d_model,
                      ln_skip=False)
        x = _ffn_step(layer["ffn"], x, ln_skip=False)
    logits = x @ lm_params["word_proj"]["w"]
    return jax.nn.log_softmax(logits, axis=-1), new_kv


@partial(jax.jit, static_argnames=("cfg", "lm_cfg", "beam_size", "max_len"))
def fused_beam_search(params, cfg, lm_params, lm_cfg, lm_weight, src,
                      src_mask, *, beam_size, max_len):
    """fast_beam_search with per-step shallow fusion.  ``lm_weight`` is a
    scalar (traced, so one compile serves a weight sweep).  The LM must
    share the recipe vocabulary (ids identical; its vocab may be larger —
    extra rows are ignored)."""
    if max_len > cfg.decoder_max_len:
        raise ValueError("max_len exceeds the decoder position table")
    if cfg.decoder_sub_sequence[1] != 0:
        raise ValueError("incremental decoding needs a causal band (end=0)")
    if lm_cfg.ln_skip_len1:
        raise ValueError(
            "shallow fusion needs an NLM trained with ln_skip_len1=False "
            "(recipes/train_nlm.py default)")
    if lm_cfg.decoder_sub_sequence[1] != 0:
        raise ValueError(
            "shallow fusion needs a CAUSAL LM band (decoder_sub_sequence "
            "end=0): incremental scoring cannot see future tokens, so a "
            "lookahead LM would silently diverge from its batch scores")
    if lm_cfg.vocab_size < cfg.vocab_size:
        raise ValueError("the LM vocabulary is smaller than the AM's")
    window = -cfg.decoder_sub_sequence[0]
    lm_window = min(-lm_cfg.decoder_sub_sequence[0], max_len)
    b = src.shape[0]
    vocab = cfg.vocab_size
    dec = params["decoder"]
    n = b * beam_size
    lm_weight = jnp.asarray(lm_weight, jnp.float32)

    enc_output, src_mask_f = encode(params, cfg, src, src_mask, train=False)
    enc_proj = enc_output @ dec["enc_dec_proj"]["w"]
    cross_k, cross_v = project_cross_kv(dec, enc_proj, beam_size)
    src_valid = jnp.repeat(src_mask_f > 0, beam_size, axis=0)

    pos_table = position_encoding_table(cfg.decoder_max_len, cfg.de_d_model)
    lm_pos = position_encoding_table(
        max(lm_cfg.decoder_max_len, max_len), lm_cfg.de_d_model)

    self_caches = empty_caches(len(dec["layers"]), n, cfg.n_head, window,
                               cfg.d_k, cfg.d_v)
    lm_caches = empty_caches(len(lm_params["layers"]), n, lm_cfg.n_head,
                             lm_window, lm_cfg.d_k, lm_cfg.d_v)

    tokens = jnp.zeros((n, max_len + 1), jnp.int32).at[:, 0].set(
        constants.BOS)
    scores = jnp.full((b, beam_size), -jnp.inf, jnp.float32).at[:, 0].set(
        0.0)
    finished = jnp.zeros((b, beam_size), bool)
    lengths = jnp.full((b, beam_size), max_len + 1, jnp.int32)

    roll_in = roll_caches

    def gather_lanes(caches, parent):
        return gather_beam_lanes(caches, parent, b, beam_size)

    def fused_word_lk(am_logits, lm_lp):
        am_lp = jax.nn.log_softmax(am_logits, axis=-1)
        return am_lp + lm_weight * lm_lp[:, :vocab]

    # step 0 (see fast_beam.py for the ln_skip quirk on the AM side)
    logits0, new_kv = _decode_one(
        dec, cfg, tokens[:, 0], 0, self_caches, cross_k, cross_v,
        src_valid, pos_table, ln_skip=False)
    if cfg.ln_skip_len1:
        logits0, _ = _decode_one(
            dec, cfg, tokens[:, 0], 0, self_caches, cross_k, cross_v,
            src_valid, pos_table, ln_skip=True)
    lm_lp0, lm_new_kv = nlm_step(lm_params, tokens[:, 0], 0, lm_caches,
                                 lm_pos)
    state, parent = _advance((tokens, scores, finished, lengths),
                             fused_word_lk(logits0, lm_lp0), 0, beam_size,
                             vocab)
    self_caches = gather_lanes(roll_in(self_caches, new_kv, window), parent)
    lm_caches = gather_lanes(roll_in(lm_caches, lm_new_kv, lm_window),
                             parent)

    def step(carry, t):
        state, caches, lmc = carry
        tokens = state[0]
        tok_t = jnp.take_along_axis(
            tokens, t[None, None].astype(jnp.int32).repeat(n, 0), axis=1
        )[:, 0]
        logits, new_kv = _decode_one(
            dec, cfg, tok_t, t, caches, cross_k, cross_v, src_valid,
            pos_table, ln_skip=False)
        lm_lp, lm_new_kv = nlm_step(lm_params, tok_t, t, lmc, lm_pos)
        new_state, parent = _advance(state, fused_word_lk(logits, lm_lp),
                                     t, beam_size, vocab)
        caches = gather_lanes(roll_in(caches, new_kv, window), parent)
        lmc = gather_lanes(roll_in(lmc, lm_new_kv, lm_window), parent)
        return (new_state, caches, lmc), None

    (state, _, _), _ = jax.lax.scan(step, (state, self_caches, lm_caches),
                                    jnp.arange(1, max_len))
    tokens, scores, finished, lengths = state
    return BeamResult(
        tokens=tokens.reshape(b, beam_size, max_len + 1),
        scores=scores,
        lengths=lengths,
        finished=finished,
    )
