"""The flagship acoustic model: LDA/TDNN frontend encoder + windowed-attention
transformer decoder, as a functional JAX model (pytree params + pure apply).

Re-designs the reference model family (Models.py / SubLayers.py / Modules.py /
TDNN.py) TPU-first:

- heads are an einsum axis (one batched matmul per projection) instead of the
  reference's repeat+bmm head fold (SubLayers.py:49-62) — XLA tiles these
  straight onto the MXU;
- masks are computed once per forward as boolean tensors and fused into the
  attention softmax; fully-masked rows produce exact zeros (the reference's
  softmax-then-re-zero trick, Modules.py:86-90) without NaN traffic;
- all shapes are static; the same apply function serves training (teacher
  forcing) and fixed-buffer autoregressive decoding.

Numerical contract preserved from the reference (verified by the torch parity
tests in tests/test_parity_torch.py):

- attention scale is 1/sqrt(d_model), NOT 1/sqrt(d_k) (Modules.py:73);
- post-LN residuals with the eps=1e-3 unbiased-std layer norm
  (Modules.py:32-51, SubLayers.py:68,86);
- banded self-attention windows (encoder (-100,0) unused by the live
  EncoderTest; decoder (-10,0)) (Models.py:38-49, run.sh:80-81);
- the live encoder is splice(-2..2) → frozen LDA affine → src_projection →
  TDNN stack → +sinusoid positions (Models.py:127-166);
- decoder: word+position embeddings → [self-attn, cross-attn, FFN]×N →
  vocab projection, with enc_dec_projection 256→128 (Models.py:169-231).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_kaldi_asr_tpu.models import common
from pytorch_kaldi_asr_tpu.models.common import (
    banded_attn_mask,
    dropout,
    fold_seq_and_mask,
    layer_norm,
    masked_softmax,
    padding_attn_mask,
    position_encoding_table,
    torch_default_uniform,
    xavier_normal,
)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Model hyperparameters; defaults mirror the TIMIT recipe
    (reference run.sh:67-92)."""

    src_dim: int
    vocab_size: int
    encoder_max_len: int = 500
    decoder_max_len: int = 100
    src_fold: int = 1
    encoder_sub_sequence: tuple = (-100, 0)
    decoder_sub_sequence: tuple = (-10, 0)
    en_layers: int = 3
    de_layers: int = 3
    n_head: int = 2
    en_d_model: int = 256
    de_d_model: int = 128
    d_k: int = 64
    d_v: int = 64
    en_dropout: float = 0.35
    de_dropout: float = 0.35
    lda_context: tuple = (-2, -1, 0, 1, 2)
    tdnn_contexts: tuple = (
        (-1, 0, 1),
        (-1, 0, 1),
        (-3, 0, 3),
        (-3, 0, 3),
        (-3, 0, 3),
        (-3, 0, 3),
    )
    # Parity quirk (reference Modules.py:43-44): layer norm is the identity
    # when the sequence axis has length 1 — matters on the first decode step.
    ln_skip_len1: bool = True
    compute_dtype: Any = jnp.float32
    # Encoder family: 'tdnn' (flagship LDA/TDNN frontend, EncoderTest),
    # 'banded' (the reference's windowed-attention Encoder), 'blstm',
    # 'conformer', 'tdnnf' (see models/encoders.py).
    encoder_type: str = "tdnn"
    conformer_kernel: int = 15
    # Conformer residual-stream dtype.  float32 (default) keeps the
    # pinned semantics; bfloat16 halves the stream's HBM traffic and the
    # f32 VPU elementwise mix between matmuls (LN statistics stay f32
    # inside layer_norm either way).  Training-quality-neutral at recipe
    # scale (see tests/test_encoders.py bf16-stream test).
    conformer_stream_dtype: Any = jnp.float32
    # Causal depthwise conv in the Conformer conv module (pad left k-1
    # instead of centered SAME padding).  Required for exact streaming
    # inference (models/streaming.py StreamingConformer): a centered conv
    # needs future frames, a causal one doesn't.  Train with this on when
    # the model will serve streaming sessions.
    conformer_causal_conv: bool = False
    tdnnf_bottleneck: int = 64
    # banded-encoder attention dispatch: None = auto (Pallas kernel on TPU
    # for S >= 1024), True = always kernel, False = always the masked XLA
    # path.  Applies to training and inference (see encoders.py).
    use_banded_kernel: Any = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class _Rngs:
    """Deterministic per-site dropout rng splitter (trace-time counter)."""

    def __init__(self, rng):
        self._rng = rng
        self._i = 0

    def next(self):
        if self._rng is None:
            return None
        self._i += 1
        return jax.random.fold_in(self._rng, self._i)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_mha(rng, d_model, n_head, d_k, d_v, init_compat="native"):
    ks = jax.random.split(rng, 5)
    # Per-head projection tensors, like the reference's w_qs/w_ks/w_vs
    # (SubLayers.py:23-25); fans follow torch xavier on [H, D, K].
    if init_compat == "torch":
        # nn.Linear's default bias U(+-1/sqrt(fan_in)) — the reference
        # re-inits only the proj WEIGHT (Modules.py:13)
        proj_b = torch_default_uniform(ks[4], (d_model,), n_head * d_v)
    else:
        proj_b = jnp.zeros((d_model,))
    return {
        "w_qs": xavier_normal(ks[0], (n_head, d_model, d_k), d_model * d_k, n_head * d_k),
        "w_ks": xavier_normal(ks[1], (n_head, d_model, d_k), d_model * d_k, n_head * d_k),
        "w_vs": xavier_normal(ks[2], (n_head, d_model, d_v), d_model * d_v, n_head * d_v),
        "proj": {
            "w": xavier_normal(ks[3], (n_head * d_v, d_model), n_head * d_v, d_model),
            "b": proj_b,
        },
        "ln": {"gamma": jnp.ones((d_model,)), "beta": jnp.zeros((d_model,))},
    }


def _init_ffn(rng, d_model, d_inner, init_compat="native"):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if init_compat == "torch":
        # The reference's FFN is two nn.Conv1d's with NO explicit re-init
        # (SubLayers.py:75-76): torch-default kaiming-uniform(a=sqrt(5))
        # weights + uniform biases — std ~1.7x SMALLER than xavier here.
        return {
            "w1": {
                "w": torch_default_uniform(k1, (d_model, d_inner), d_model),
                "b": torch_default_uniform(k3, (d_inner,), d_model),
            },
            "w2": {
                "w": torch_default_uniform(k2, (d_inner, d_model), d_inner),
                "b": torch_default_uniform(k4, (d_model,), d_inner),
            },
            "ln": {"gamma": jnp.ones((d_model,)), "beta": jnp.zeros((d_model,))},
        }
    return {
        "w1": {
            "w": xavier_normal(k1, (d_model, d_inner), d_model, d_inner),
            "b": jnp.zeros((d_inner,)),
        },
        "w2": {
            "w": xavier_normal(k2, (d_inner, d_model), d_inner, d_model),
            "b": jnp.zeros((d_model,)),
        },
        "ln": {"gamma": jnp.ones((d_model,)), "beta": jnp.zeros((d_model,))},
    }


def init_transformer(rng, cfg: TransformerConfig, lda_mat=None,
                     init_compat="native"):
    """Build the parameter pytree.

    ``lda_mat`` is the Kaldi LDA/MLLT affine as stored in ``lda.mat``
    (last column = bias; reference TDNN.py:51-52, initialize_model.py:69).
    If None, an identity frontend of matching width is used (useful for
    synthetic runs without a Kaldi LDA estimation).

    ``init_compat='torch'`` reproduces the reference's EXACT init
    distributions where they differ from ours (decoder FFN convs keep
    torch's kaiming-uniform default + every Linear/Conv bias is
    torch-default uniform instead of zero) — a causal lever for
    plateau-escape-timing studies (docs/PARITY_RUN.md seed variance)."""
    if cfg.encoder_type != "tdnn":
        from pytorch_kaldi_asr_tpu.models.encoders import ENCODER_INITS

        enc_rng, dec_rng = jax.random.split(rng)
        return {
            "encoder": ENCODER_INITS[cfg.encoder_type](enc_rng, cfg),
            "decoder": _init_decoder(dec_rng, cfg, init_compat),
        }

    spliced_dim = cfg.src_dim * cfg.src_fold * len(cfg.lda_context)
    if lda_mat is None:
        lda_w = jnp.eye(spliced_dim, dtype=jnp.float32)
        lda_b = jnp.zeros((spliced_dim,), dtype=jnp.float32)
    else:
        lda_mat = np.asarray(lda_mat, dtype=np.float32)
        lda_w = jnp.asarray(lda_mat[:, :-1].T)  # [in, out]
        lda_b = jnp.asarray(lda_mat[:, -1])
    lda_out_dim = lda_w.shape[1]

    enc_rng, dec_rng = jax.random.split(rng)
    n_rngs = 1 + len(cfg.tdnn_contexts)
    keys = iter(jax.random.split(enc_rng, n_rngs))

    encoder = {
        "lda": {"w": lda_w, "b": lda_b},  # frozen (see train.param_labels)
        "src_proj": {
            "w": xavier_normal(next(keys), (lda_out_dim, cfg.en_d_model),
                               lda_out_dim, cfg.en_d_model)
        },
        "tdnn": [],
    }
    d = cfg.en_d_model
    for ctx in cfg.tdnn_contexts:
        k_w = next(keys)
        if init_compat == "torch":
            # TDNNLayer.proj bias keeps nn.Linear's default (TDNN.py:36-37
            # re-inits the weight only)
            k_w, k_b = jax.random.split(k_w)
            b = torch_default_uniform(k_b, (d,), d * len(ctx))
        else:
            b = jnp.zeros((d,))
        encoder["tdnn"].append(
            {
                "w": xavier_normal(k_w, (d * len(ctx), d), d * len(ctx), d),
                "b": b,
            }
        )

    return {"encoder": encoder,
            "decoder": _init_decoder(dec_rng, cfg, init_compat)}


def _init_decoder(rng, cfg: TransformerConfig, init_compat="native"):
    """Decoder parameter subtree (shared by every encoder family)."""
    keys = iter(jax.random.split(rng, 3 + cfg.de_layers * 3))
    # nn.Embedding's default init is N(0,1) (what the reference trains from);
    # match it so from-scratch dynamics are comparable
    embed = jax.random.normal(next(keys), (cfg.vocab_size, cfg.de_d_model))
    embed = embed.at[0].set(0.0)  # padding_idx=0 row is zero
    decoder = {
        "embed": embed,
        "enc_dec_proj": {
            "w": xavier_normal(next(keys), (cfg.en_d_model, cfg.de_d_model),
                               cfg.en_d_model, cfg.de_d_model)
        },
        "layers": [],
        "word_proj": {
            "w": xavier_normal(next(keys), (cfg.de_d_model, cfg.vocab_size),
                               cfg.de_d_model, cfg.vocab_size)
        },
    }
    for _ in range(cfg.de_layers):
        decoder["layers"].append(
            {
                "slf": _init_mha(next(keys), cfg.de_d_model, cfg.n_head,
                                 cfg.d_k, cfg.d_v, init_compat),
                "enc": _init_mha(next(keys), cfg.de_d_model, cfg.n_head,
                                 cfg.d_k, cfg.d_v, init_compat),
                "ffn": _init_ffn(next(keys), cfg.de_d_model, cfg.de_d_model,
                                 init_compat),
            }
        )
    return decoder


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------




def multi_head_attention(p, q, k, v, blocked, cfg, rate, rngs, train):
    """Post-LN multi-head attention.  ``blocked`` is [B, Lq, Lk] bool.

    Scale divisor is sqrt(d_model) — the reference's ``temper``
    (Modules.py:73) — not sqrt(d_k)."""
    dtype = cfg.compute_dtype
    scale = q.shape[-1]
    residual = q
    qs = jnp.einsum("bld,hdk->bhlk", q.astype(dtype), p["w_qs"].astype(dtype))
    ks = jnp.einsum("bld,hdk->bhlk", k.astype(dtype), p["w_ks"].astype(dtype))
    vs = jnp.einsum("bld,hdv->bhlv", v.astype(dtype), p["w_vs"].astype(dtype))
    logits = jnp.einsum("bhqk,bhlk->bhql", qs, ks) / jnp.sqrt(
        jnp.array(scale, dtype=dtype)
    )
    attn = masked_softmax(logits.astype(jnp.float32), blocked[:, None, :, :])
    # drop AFTER the compute-dtype cast: the [B,h,Lq,Lk] probs are the
    # largest activation in the step, and dropout materializes them — in
    # bf16 that halves the dominant HBM traffic (exact no-op in f32 mode)
    attn = dropout(attn.astype(dtype), rate, rngs.next(), train)
    out = jnp.einsum("bhql,bhlv->bhqv", attn, vs)
    b, h, lq, dv = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * dv)
    out = out @ p["proj"]["w"].astype(dtype) + p["proj"]["b"].astype(dtype)
    out = dropout(out, rate, rngs.next(), train)
    out = (out + residual).astype(jnp.float32)
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=cfg.ln_skip_len1)


def feed_forward(p, x, cfg, rate, rngs, train):
    """Position-wise FFN with ReLU and post-LN residual (SubLayers.py:70-86)."""
    dtype = cfg.compute_dtype
    residual = x
    h = jax.nn.relu(x.astype(dtype) @ p["w1"]["w"].astype(dtype) + p["w1"]["b"].astype(dtype))
    out = h @ p["w2"]["w"].astype(dtype) + p["w2"]["b"].astype(dtype)
    out = dropout(out, rate, rngs.next(), train)
    out = (out + residual).astype(jnp.float32)
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=cfg.ln_skip_len1)


def encode(params, cfg: TransformerConfig, src_seq, src_mask, *, train=False,
           rng=None, pos_offset=0):
    """EncoderTest equivalent (Models.py:127-166): splice → frozen LDA →
    projection → TDNN stack → +positions.  Expects UNfolded input; returns
    (enc_output, folded src_mask).

    ``pos_offset`` shifts the positional table index (used by chunked
    streaming, where a buffer's frame 0 is mid-utterance); indices saturate
    at the table end."""
    src_seq, src_mask = fold_seq_and_mask(src_seq, src_mask, cfg.src_fold)
    if cfg.encoder_type != "tdnn":
        from pytorch_kaldi_asr_tpu.models.encoders import ENCODER_APPLYS

        return ENCODER_APPLYS[cfg.encoder_type](
            params["encoder"], cfg, src_seq, src_mask, train=train, rng=rng
        )

    p = params["encoder"]
    rngs = _Rngs(rng)
    dtype = cfg.compute_dtype

    x = common.spliced_linear(
        src_seq, p["lda"]["w"], p["lda"]["b"], cfg.lda_context, dtype=dtype
    )
    x = x @ p["src_proj"]["w"].astype(dtype)
    x = dropout(x, cfg.en_dropout, rngs.next(), train)
    for ctx, layer in zip(cfg.tdnn_contexts, p["tdnn"]):
        h = common.spliced_linear(x, layer["w"], layer["b"], ctx, dtype=dtype)
        x = jax.nn.relu(h)
        x = dropout(x, cfg.en_dropout, rngs.next(), train)

    pos_table = position_encoding_table(cfg.encoder_max_len, cfg.en_d_model)
    pos_idx = jnp.clip(pos_offset + jnp.arange(x.shape[1]), 0,
                       cfg.encoder_max_len - 1)
    x = x.astype(jnp.float32) + pos_table[pos_idx][None, :, :]
    x = dropout(x, cfg.en_dropout, rngs.next(), train)
    return x, src_mask


def decode_logits(params, cfg: TransformerConfig, tgt_seq, tgt_mask, src_mask,
                  enc_output, *, train=False, rng=None):
    """Decoder equivalent (Models.py:194-231): returns [B, T, vocab] logits."""
    p = params["decoder"]
    rngs = _Rngs(rng)
    dtype = cfg.compute_dtype
    t = tgt_seq.shape[1]

    pos_table = position_encoding_table(cfg.decoder_max_len, cfg.de_d_model)
    enc = enc_output.astype(dtype) @ p["enc_dec_proj"]["w"].astype(dtype)
    enc = enc.astype(jnp.float32)

    x = p["embed"][tgt_seq] + pos_table[:t][None, :, :]

    slf_blocked = padding_attn_mask(tgt_mask, tgt_mask) | banded_attn_mask(
        t, cfg.decoder_sub_sequence[0], cfg.decoder_sub_sequence[1]
    )[None, :, :]
    cross_blocked = padding_attn_mask(tgt_mask, src_mask)

    x = dropout(x, cfg.de_dropout, rngs.next(), train)
    for layer in p["layers"]:
        x = multi_head_attention(
            layer["slf"], x, x, x, slf_blocked, cfg, cfg.de_dropout, rngs, train
        )
        x = multi_head_attention(
            layer["enc"], x, enc, enc, cross_blocked, cfg, cfg.de_dropout, rngs,
            train,
        )
        x = feed_forward(layer["ffn"], x, cfg, cfg.de_dropout, rngs, train)
    x = dropout(x, cfg.de_dropout, rngs.next(), train)
    logits = x.astype(dtype) @ p["word_proj"]["w"].astype(dtype)
    return logits.astype(jnp.float32)


def transformer_forward(params, cfg: TransformerConfig, src_seq, src_mask,
                        tgt_seq, tgt_mask, *, train=False, rng=None):
    """Full teacher-forced forward (Transformer.forward, Models.py:253-261):
    fold → encode → decode; returns [B, T, vocab] logits."""
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    enc_output, folded_src_mask = encode(
        params, cfg, src_seq, src_mask, train=train, rng=enc_rng
    )
    return decode_logits(
        params, cfg, tgt_seq, tgt_mask, folded_src_mask, enc_output,
        train=train, rng=dec_rng,
    )
