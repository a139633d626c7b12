"""Neural language model for n-best rescoring.

The reference's vendored layer ships ``rnnlm_compute_scores.sh``
(/root/reference/kaldi/utils/rnnlm_compute_scores.sh) — per-sentence
scores from a neural LM, line-aligned with an n-best list, consumed by the
same AM+LM/weight rescoring combine as the SRILM scores.  This is the
TPU-native realization: a causal transformer LM (the decoder half of the
recipe's model family — same post-LN/banded-mask/1-over-sqrt(d_model)
machinery from models/transformer.py, minus cross-attention), trained with
teacher-forced CE on the recipe's transcripts and scored in bucketed
static-shape batches under jit.

The configuration rides TransformerConfig's decoder fields (de_d_model,
de_layers, n_head, d_k/d_v, decoder_max_len, de_dropout,
decoder_sub_sequence), so train/checkpoint.py serves it unchanged
(``model_kind: "nlm"`` in the checkpoint meta; ``src_dim`` is unused).

Scoring contract: log10 p(sentence) including the EOS event, matching
``ngram -ppl`` semantics (lm/ngram.py sentence_logprob), so
recipes/rescore.py combines neural and n-gram scores identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_asr_tpu.models.common import (
    banded_attn_mask,
    dropout,
    padding_attn_mask,
    position_encoding_table,
)
from pytorch_kaldi_asr_tpu.models.transformer import (
    _init_ffn,
    _init_mha,
    _Rngs,
    feed_forward,
    multi_head_attention,
)
from pytorch_kaldi_asr_tpu.utils import constants

LOG10_E = float(np.log10(np.e))


def init_nlm(rng, cfg):
    """Causal-LM parameter tree: embedding + de_layers x [self-attn, ffn]
    + output projection (the decoder subtree without enc_dec/cross)."""
    keys = iter(jax.random.split(rng, 2 + cfg.de_layers * 2))
    embed = jax.random.normal(next(keys), (cfg.vocab_size, cfg.de_d_model))
    embed = embed.at[0].set(0.0)  # padding_idx=0 row stays zero
    layers = []
    for _ in range(cfg.de_layers):
        layers.append({
            "slf": _init_mha(next(keys), cfg.de_d_model, cfg.n_head,
                             cfg.d_k, cfg.d_v),
            "ffn": _init_ffn(next(keys), cfg.de_d_model, cfg.de_d_model),
        })
    from pytorch_kaldi_asr_tpu.models.common import xavier_normal

    word_proj = xavier_normal(next(keys),
                              (cfg.de_d_model, cfg.vocab_size),
                              cfg.de_d_model, cfg.vocab_size)
    return {"embed": embed, "layers": layers,
            "word_proj": {"w": word_proj}}


def nlm_logits(params, cfg, tokens, mask, *, train=False, rng=None):
    """[B, T, vocab] next-token logits.  ``tokens``/``mask`` [B, T]; the
    self-attention band is decoder_sub_sequence (causal when end == 0 —
    pass (-decoder_max_len, 0) for full lookback)."""
    rngs = _Rngs(rng)
    t = tokens.shape[1]
    pos = position_encoding_table(max(cfg.decoder_max_len, t),
                                  cfg.de_d_model)[:t]
    x = params["embed"][tokens] + pos[None]
    blocked = padding_attn_mask(mask, mask) | banded_attn_mask(
        t, cfg.decoder_sub_sequence[0], cfg.decoder_sub_sequence[1]
    )[None]
    rate = cfg.de_dropout if train else 0.0
    x = dropout(x, rate, rngs.next(), train)
    for layer in params["layers"]:
        x = multi_head_attention(layer["slf"], x, x, x, blocked, cfg,
                                 rate, rngs, train)
        x = feed_forward(layer["ffn"], x, cfg, rate, rngs, train)
    x = dropout(x, rate, rngs.next(), train)
    dtype = cfg.compute_dtype
    logits = x.astype(dtype) @ params["word_proj"]["w"].astype(dtype)
    return logits.astype(jnp.float32)


def nlm_loss(params, cfg, tokens, mask, *, train=False, rng=None):
    """Teacher-forced CE over [BOS w1 ... wn EOS] sequences: inputs are
    tokens[:, :-1], goals tokens[:, 1:], PAD goals excluded.  Returns
    (loss_sum, n_correct, n_tokens)."""
    inp, goal = tokens[:, :-1], tokens[:, 1:]
    logits = nlm_logits(params, cfg, inp, mask[:, :-1], train=train,
                        rng=rng)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = (goal != constants.PAD).astype(jnp.float32)
    nll = -jnp.take_along_axis(logp, goal[..., None], axis=-1).squeeze(-1)
    loss = jnp.sum(nll * valid)
    n_correct = jnp.sum((jnp.argmax(logp, -1) == goal) * valid)
    return loss, n_correct, jnp.sum(valid)


def sentence_logprobs(params, cfg, tokens, mask):
    """[B] log10 p(sentence) for [BOS ... EOS PAD*] rows — every non-PAD
    transition scored, including the EOS event (``ngram -ppl`` contract)."""
    inp, goal = tokens[:, :-1], tokens[:, 1:]
    logits = nlm_logits(params, cfg, inp, mask[:, :-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = (goal != constants.PAD).astype(jnp.float32)
    ll = jnp.take_along_axis(logp, goal[..., None], -1).squeeze(-1)
    return jnp.sum(ll * valid, axis=1) * LOG10_E


def load_nlm(model_dir):
    """Load-and-validate a neural-LM checkpoint (recipes/train_nlm.py):
    returns (params, cfg, meta).  The single loading path for every CLI
    (decode/serve/score_lm) so validation stays in one place."""
    from pytorch_kaldi_asr_tpu.train.checkpoint import (
        load_checkpoint,
        read_checkpoint_config,
    )

    cfg, meta = read_checkpoint_config(model_dir)
    if meta.get("model_kind") != "nlm":
        raise ValueError(
            f"{model_dir} is not a neural-LM checkpoint "
            f"(model_kind={meta.get('model_kind')!r}); train one with "
            "recipes/train_nlm.py")
    params = load_checkpoint(
        model_dir, template_params=init_nlm(jax.random.PRNGKey(0), cfg)
    )["params"]
    return params, cfg, meta


def encode_sentences(sentences, word2idx, max_len):
    """[N, max_len] int32 [BOS ids EOS PAD*] + uint8 mask; sentences longer
    than max_len - 2 are truncated (UNK fallback for OOVs)."""
    toks = np.full((len(sentences), max_len), constants.PAD, np.int32)
    mask = np.zeros((len(sentences), max_len), np.uint8)
    for i, words in enumerate(sentences):
        ids = [constants.BOS] + [
            word2idx.get(w, constants.UNK) for w in words
        ][: max_len - 2] + [constants.EOS]
        toks[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1
    return toks, mask


def score_sentences(params, cfg, sentences, word2idx, *, batch_size=64):
    """log10 scores for a list of word-lists, order-preserving, in
    fixed-shape batches (one compile).

    The static width covers the LONGEST sentence, never truncating:
    scoring a prefix and calling it p(sentence) would make long
    hypotheses artificially cheap next to full-text n-gram scores in the
    AM+LM rescoring combine.  Beyond decoder_max_len the sinusoid
    positions extrapolate (closed-form) and the causal band still caps
    attention reach — out-of-distribution but well-defined; a warning
    flags it once."""
    if not sentences:
        return []
    width = max(cfg.decoder_max_len, max(len(s) for s in sentences) + 2)
    if width > cfg.decoder_max_len:
        from pytorch_kaldi_asr_tpu.utils.logging import warning

        warning(
            "score_sentences: longest hypothesis (%d words) exceeds the "
            "LM's trained length %d; positions extrapolate — consider "
            "train_nlm -max_len >= decode max_token_seq_len",
            width - 2, cfg.decoder_max_len)
    fn = jax.jit(lambda p, t, m: sentence_logprobs(p, cfg, t, m))
    out = []
    for i in range(0, len(sentences), batch_size):
        chunk = sentences[i : i + batch_size]
        toks, mask = encode_sentences(chunk, word2idx, width)
        if len(chunk) < batch_size:  # pad the tail batch to the same shape
            pad = batch_size - len(chunk)
            toks = np.concatenate([toks, np.zeros((pad, toks.shape[1]),
                                                  np.int32)])
            mask = np.concatenate([mask, np.zeros((pad, mask.shape[1]),
                                                  np.uint8)])
        scores = np.asarray(fn(params, toks, mask))
        out.extend(float(s) for s in scores[: len(chunk)])
    return out
