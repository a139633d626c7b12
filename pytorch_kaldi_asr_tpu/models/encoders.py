"""Encoder zoo beyond the flagship TDNN/LDA frontend.

Families (BASELINE.json configs; each plugs into the same decoder through
the ``(enc_output [B,S,D], src_mask [B,S])`` interface):

- ``banded``    self-attention encoder with a banded window — the reference's
  dead ``Encoder`` class (Models.py:67-124, commented out of the model at
  Models.py:242-246) made alive: src projection, dual sinusoid position
  tables (one added before the layer stack, one after), post-LN MHA + FFN
  layers, band (start, end) from ``encoder_sub_sequence``.  Inference-time
  attention can run through the Pallas banded kernel.
- ``blstm``     bidirectional LSTM with masked recurrence over padded
  frames (lax.scan; pads at the tail are carried through, so valid outputs
  are pad-invariant).
- ``conformer`` macaron FFN + MHSA + depthwise-conv blocks (conv module uses
  layer norm rather than batch norm — deliberate TPU-friendly deviation,
  noted here).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.models.common import (
    banded_attn_mask,
    dropout,
    layer_norm,
    padding_attn_mask,
    position_encoding_table,
    xavier_normal,
)
from pytorch_kaldi_asr_tpu.models.transformer import (
    _Rngs,
    _init_ffn,
    _init_mha,
    feed_forward,
    multi_head_attention,
)


# ---------------------------------------------------------------------------
# banded self-attention encoder (the reference's Encoder, alive)
# ---------------------------------------------------------------------------


def init_banded_encoder(rng, cfg):
    keys = iter(jax.random.split(rng, 1 + 2 * cfg.en_layers))
    params = {
        "src_proj": {
            "w": xavier_normal(next(keys), (cfg.src_dim * cfg.src_fold,
                                            cfg.en_d_model),
                               cfg.src_dim * cfg.src_fold, cfg.en_d_model)
        },
        "layers": [
            {
                "slf": _init_mha(next(keys), cfg.en_d_model, cfg.n_head,
                                 cfg.d_k, cfg.d_v),
                "ffn": _init_ffn(next(keys), cfg.en_d_model, cfg.en_d_model),
            }
            for _ in range(cfg.en_layers)
        ],
    }
    return params


def _banded_self_attention(p, x, src_mask, cfg, rate, rngs, train):
    """Banded self-attention block (post-LN).

    Inference routes through ops.banded_attention (Pallas blockwise kernel
    on TPU for long sequences — no [S, S] score tensor).  TRAINING on long
    sequences uses the differentiable kernel (custom VJP + in-kernel
    attention-prob dropout, ops.banded_attention_trainable); short
    sequences fall back to the general masked XLA path where full
    attention is cheaper than the band bookkeeping."""
    s = x.shape[1]
    start, end = cfg.encoder_sub_sequence
    if getattr(cfg, "use_banded_kernel", None) is None:
        kernel_ok = (jax.default_backend() == "tpu" and s % 128 == 0
                     and s >= 1024)
    else:
        kernel_ok = bool(cfg.use_banded_kernel) and s % 128 == 0
    if train and rate > 0 and not kernel_ok:
        blocked = padding_attn_mask(src_mask, src_mask) | banded_attn_mask(
            s, start, end
        )[None]
        return multi_head_attention(p, x, x, x, blocked, cfg, rate, rngs,
                                    train)

    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention,
        banded_attention_trainable,
    )
    from pytorch_kaldi_asr_tpu.models.common import layer_norm

    b = x.shape[0]
    h = p["w_qs"].shape[0]
    d_model = x.shape[-1]
    qs = jnp.einsum("bld,hdk->bhlk", x, p["w_qs"]).reshape(b * h, s, -1)
    ks = jnp.einsum("bld,hdk->bhlk", x, p["w_ks"]).reshape(b * h, s, -1)
    vs = jnp.einsum("bld,hdv->bhlv", x, p["w_vs"]).reshape(b * h, s, -1)
    key_valid = jnp.repeat(src_mask.astype(jnp.int32), h, axis=0)
    scale = 1.0 / float(d_model) ** 0.5
    if train and kernel_ok:
        # rng=None means "no dropout" everywhere else (models.common.dropout
        # no-ops) — honor the same contract here rather than substituting a
        # fixed seed, which would apply the identical mask every step
        key = rngs.next()
        seed = (jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
                if key is not None else jnp.int32(0))
        out = banded_attention_trainable(
            qs, ks, vs, key_valid, seed, start, end, scale,
            float(rate) if key is not None else 0.0,
        )
    else:
        if train:
            force = "reference"  # plain pallas forward is not differentiable
        elif getattr(cfg, "use_banded_kernel", None) is None:
            force = None
        else:
            force = "pallas" if kernel_ok else "reference"
        out = banded_attention(
            qs, ks, vs, key_valid, start=start, end=end, scale=scale,
            force=force,
        )
    out = out.reshape(b, h, s, -1).transpose(0, 2, 1, 3).reshape(b, s, -1)
    out = out @ p["proj"]["w"] + p["proj"]["b"]
    out = dropout(out, rate, rngs.next(), train)
    out = out + x
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=cfg.ln_skip_len1)


def banded_encode(params, cfg, src_seq, src_mask, *, train=False, rng=None):
    rngs = _Rngs(rng)
    s = src_seq.shape[1]
    # the sinusoid table is closed-form, so sequences longer than
    # encoder_max_len extrapolate exactly (no learned rows to run out of)
    pos = position_encoding_table(max(cfg.encoder_max_len, s),
                                  cfg.en_d_model)[:s]

    x = src_seq.astype(cfg.compute_dtype) @ params["src_proj"]["w"].astype(
        cfg.compute_dtype
    )
    x = x.astype(jnp.float32) + pos[None]
    x = dropout(x, cfg.en_dropout, rngs.next(), train)

    for layer in params["layers"]:
        x = _banded_self_attention(
            layer["slf"], x, src_mask, cfg, cfg.en_dropout, rngs, train
        )
        x = feed_forward(layer["ffn"], x, cfg, cfg.en_dropout, rngs, train)

    x = x + pos[None]  # trans_pos_enc applied post-stack (Models.py:119)
    x = dropout(x, cfg.en_dropout, rngs.next(), train)
    return x, src_mask


# ---------------------------------------------------------------------------
# BLSTM encoder
# ---------------------------------------------------------------------------


def _init_lstm(rng, d_in, d_hidden):
    k1, k2 = jax.random.split(rng)
    return {
        "wx": xavier_normal(k1, (d_in, 4 * d_hidden), d_in, 4 * d_hidden),
        "wh": xavier_normal(k2, (d_hidden, 4 * d_hidden), d_hidden,
                            4 * d_hidden),
        "b": jnp.zeros((4 * d_hidden,)),
    }


def init_blstm_encoder(rng, cfg):
    d_hidden = cfg.en_d_model // 2  # concat of both directions = en_d_model
    keys = iter(jax.random.split(rng, 2 * cfg.en_layers + 1))
    layers = []
    d_in = cfg.src_dim * cfg.src_fold
    for _ in range(cfg.en_layers):
        layers.append(
            {
                "fwd": _init_lstm(next(keys), d_in, d_hidden),
                "bwd": _init_lstm(next(keys), d_in, d_hidden),
            }
        )
        d_in = cfg.en_d_model
    return {"layers": layers}


def _lstm_scan(p, x, mask, reverse=False):
    """Masked LSTM over [B, S, D]; state freezes on padded frames."""
    b, s, _ = x.shape
    d_hidden = p["wh"].shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # [S, B, D]
    ms = jnp.swapaxes(mask, 0, 1).astype(jnp.float32)[..., None]
    if reverse:
        xs, ms = xs[::-1], ms[::-1]

    gates_x = xs @ p["wx"] + p["b"]  # hoist the input projection out of scan

    def step(carry, inp):
        h, c = carry
        gx, m = inp
        z = gx + h @ p["wh"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        return (h, c), h

    init = (jnp.zeros((b, d_hidden)), jnp.zeros((b, d_hidden)))
    _, hs = jax.lax.scan(step, init, (gates_x, ms))
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)  # [B, S, H]


def blstm_encode(params, cfg, src_seq, src_mask, *, train=False, rng=None):
    rngs = _Rngs(rng)
    x = src_seq.astype(jnp.float32)
    for layer in params["layers"]:
        fwd = _lstm_scan(layer["fwd"], x, src_mask)
        bwd = _lstm_scan(layer["bwd"], x, src_mask, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        x = dropout(x, cfg.en_dropout, rngs.next(), train)
    return x, src_mask


# ---------------------------------------------------------------------------
# Conformer encoder
# ---------------------------------------------------------------------------


def _init_conv_module(rng, d, kernel):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "ln": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
        "pw1": {"w": xavier_normal(k1, (d, 2 * d), d, 2 * d),
                "b": jnp.zeros((2 * d,))},
        "dw": {"w": xavier_normal(k2, (kernel, d), kernel, d),
               "b": jnp.zeros((d,))},
        "norm": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
        "pw2": {"w": xavier_normal(k3, (d, d), d, d), "b": jnp.zeros((d,))},
    }


def init_conformer_encoder(rng, cfg):
    keys = iter(jax.random.split(rng, 1 + 4 * cfg.en_layers))
    d = cfg.en_d_model
    params = {
        "src_proj": {
            "w": xavier_normal(next(keys), (cfg.src_dim * cfg.src_fold, d),
                               cfg.src_dim * cfg.src_fold, d)
        },
        "layers": [],
    }
    for _ in range(cfg.en_layers):
        params["layers"].append(
            {
                "ffn1": _init_ffn(next(keys), d, 4 * d),
                "mhsa": _init_mha(next(keys), d, cfg.n_head, cfg.d_k,
                                  cfg.d_v),
                "conv": _init_conv_module(next(keys), d,
                                          cfg.conformer_kernel),
                "ffn2": _init_ffn(next(keys), d, 4 * d),
            }
        )
    return params


def _conformer_mhsa(p, x, src_mask, cfg, rate, rngs, train):
    """Banded self-attention for the Conformer through the blocked-XLA
    banded op (ops/banded_attention.banded_attention_blocked): scores are
    computed only for the key blocks overlapping the band, never [S, S].
    Same post-LN + 1/sqrt(d_model)-scale semantics as
    ``multi_head_attention`` (pinned by tests at f32)."""
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
        banded_attention_trainable,
    )

    b, s, d_model = x.shape
    start, end = cfg.encoder_sub_sequence
    dtype = cfg.compute_dtype
    residual = x
    block_q = int(os.environ.get("PKA_CONF_BLOCK_Q", "128"))
    sp = -(-s // block_q) * block_q
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))).astype(dtype)
    h = p["w_qs"].shape[0]
    qs = jnp.einsum("bld,hdk->bhlk", xp, p["w_qs"].astype(dtype))
    ks = jnp.einsum("bld,hdk->bhlk", xp, p["w_ks"].astype(dtype))
    vs = jnp.einsum("bld,hdv->bhlv", xp, p["w_vs"].astype(dtype))
    d_k, d_v = qs.shape[-1], vs.shape[-1]
    kv = jnp.repeat(
        jnp.pad(src_mask, ((0, 0), (0, sp - s))).astype(jnp.int32), h, axis=0
    )
    scale = 1.0 / float(d_model) ** 0.5
    attn_key = rngs.next()
    if os.environ.get("PKA_CONF_ATTN", "blocked") == "pallas":
        # A/B knob (profile-guided kernel work): the flash-style Pallas
        # kernel with dtype-native dots instead of the blocked-XLA path.
        drop = train and rate > 0 and attn_key is not None
        seed = (jax.random.randint(attn_key, (), 0, 2**31 - 1,
                                   dtype=jnp.int32) if drop else jnp.int32(0))
        out = banded_attention_trainable(
            qs.reshape(b * h, sp, d_k), ks.reshape(b * h, sp, d_k),
            vs.reshape(b * h, sp, d_v), kv, seed, start, end, scale,
            float(rate) if drop else 0.0, block_q,
            jax.default_backend() != "tpu",  # interpret off-TPU (CPU tests)
        )
    else:
        out = banded_attention_blocked(
            qs.reshape(b * h, sp, d_k), ks.reshape(b * h, sp, d_k),
            vs.reshape(b * h, sp, d_v), kv,
            start=start, end=end, scale=scale,
            dropout_rate=rate if train else 0.0, rng=attn_key,
            block_q=block_q,
        )
    out = out.reshape(b, h, sp, d_v)[:, :, :s].transpose(0, 2, 1, 3)
    out = out.reshape(b, s, h * d_v)
    out = out @ p["proj"]["w"].astype(dtype) + p["proj"]["b"].astype(dtype)
    out = dropout(out, rate, rngs.next(), train)
    out = (out + residual).astype(cfg.conformer_stream_dtype)
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=cfg.ln_skip_len1)


def _half_ffn(p, x, cfg, rate, rngs, train):
    """Macaron half-step FFN: x + 0.5·FFN(LN(x)) (pre-LN, swish)."""
    h = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"], skip_len1=False)
    dtype = cfg.compute_dtype
    h = jax.nn.swish(h.astype(dtype) @ p["w1"]["w"].astype(dtype)
                     + p["w1"]["b"].astype(dtype))
    h = dropout(h, rate, rngs.next(), train)
    h = h @ p["w2"]["w"].astype(dtype) + p["w2"]["b"].astype(dtype)
    h = dropout(h.astype(cfg.conformer_stream_dtype), rate, rngs.next(),
                train)
    return x + 0.5 * h


def _conv_module(p, x, mask, cfg, rate, rngs, train):
    """Pointwise-GLU → causal-free depthwise conv → LN → swish → pointwise.
    Padded frames are zeroed before the conv so outputs at valid frames are
    pad-invariant."""
    dtype = cfg.compute_dtype
    h = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"], skip_len1=False)
    h = h.astype(dtype) @ p["pw1"]["w"].astype(dtype) + p["pw1"]["b"].astype(dtype)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    # single pre-conv mask: everything above is position-wise, so zeroing
    # here is sufficient for pad-invariance of the depthwise conv below
    h = h * mask[..., None].astype(h.dtype)
    # depthwise conv along time, SAME padding — one grouped XLA conv in
    # NCW layout (bit-identical to the NWC form but ~50x faster through
    # XLA:TPU's conv emitter, which lays grouped channels on the minor
    # dim; measured 1.5 ms vs 86 ms fwd+bwd at B=100, S=500, C=512)
    kernel = p["dw"]["w"].astype(dtype)  # [K, D]
    k = kernel.shape[0]
    if cfg.conformer_causal_conv:
        pad = k - 1  # causal: only past frames (streaming-exact)
    else:
        pad = (k - 1) // 2  # centered SAME padding
    h = jax.lax.conv_general_dilated(
        h.transpose(0, 2, 1), kernel.T[:, None, :],  # rhs [O=D, I/g=1, K]
        window_strides=(1,), padding=[(pad, k - 1 - pad)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=h.shape[-1],
    ).transpose(0, 2, 1) + p["dw"]["b"].astype(dtype)
    h = h.astype(cfg.conformer_stream_dtype)
    h = layer_norm(h, p["norm"]["gamma"], p["norm"]["beta"], skip_len1=False)
    h = jax.nn.swish(h)
    h = h.astype(dtype) @ p["pw2"]["w"].astype(dtype) + p["pw2"]["b"].astype(dtype)
    h = dropout(h.astype(cfg.conformer_stream_dtype), rate, rngs.next(),
                train)
    return x + h


def conformer_encode(params, cfg, src_seq, src_mask, *, train=False,
                     rng=None):
    rngs = _Rngs(rng)
    s = src_seq.shape[1]
    # closed-form sinusoids: extrapolate past encoder_max_len (long-form)
    pos = position_encoding_table(max(cfg.encoder_max_len, s),
                                  cfg.en_d_model)[:s]
    dtype = cfg.compute_dtype

    x = src_seq.astype(dtype) @ params["src_proj"]["w"].astype(dtype)
    sd = cfg.conformer_stream_dtype
    x = x.astype(sd) + pos[None].astype(sd)
    x = dropout(x, cfg.en_dropout, rngs.next(), train)

    def layer_fwd(layer, x, key):
        lrngs = _Rngs(key)
        x = _half_ffn(layer["ffn1"], x, cfg, cfg.en_dropout, lrngs, train)
        x = _conformer_mhsa(layer["mhsa"], x, src_mask, cfg, cfg.en_dropout,
                            lrngs, train)
        x = _conv_module(layer["conv"], x, src_mask, cfg, cfg.en_dropout,
                         lrngs, train)
        x = _half_ffn(layer["ffn2"], x, cfg, cfg.en_dropout, lrngs, train)
        return x

    # optional per-layer remat (PKA_CONFORMER_REMAT=1 enables).  With the
    # blocked banded attention the [B,h,S,S] probs no longer exist, so
    # saving activations beats recomputing them: measured 34 ms vs 47 ms
    # per full-model grad step at B=100, S=500 on v5e.  Remat remains
    # available for memory-limited configs (longer S or deeper stacks).
    remat = train and os.environ.get("PKA_CONFORMER_REMAT", "0") == "1"
    fwd = jax.checkpoint(layer_fwd) if remat else layer_fwd
    for layer in params["layers"]:
        x = fwd(layer, x, rngs.next())
    return x, src_mask


# ---------------------------------------------------------------------------
# TDNN-F encoder (factorized TDNN with semi-orthogonal bottlenecks)
# ---------------------------------------------------------------------------


def init_tdnnf_encoder(rng, cfg):
    """Factorized TDNN: each layer = splice → linear to a bottleneck (kept
    semi-orthogonal during training via :func:`semi_orthogonal_step`) →
    linear back up → ReLU → scaled residual."""
    from pytorch_kaldi_asr_tpu.models.common import xavier_normal as xn

    d = cfg.en_d_model
    bottleneck = cfg.tdnnf_bottleneck
    keys = iter(jax.random.split(rng, 1 + 2 * len(cfg.tdnn_contexts)))
    params = {
        "src_proj": {
            "w": xn(next(keys), (cfg.src_dim * cfg.src_fold, d),
                    cfg.src_dim * cfg.src_fold, d)
        },
        "layers": [],
    }
    for ctx in cfg.tdnn_contexts:
        params["layers"].append(
            {
                "factor": xn(next(keys), (d * len(ctx), bottleneck),
                             d * len(ctx), bottleneck),
                "up": {
                    "w": xn(next(keys), (bottleneck, d), bottleneck, d),
                    "b": jnp.zeros((d,)),
                },
            }
        )
    return params


def tdnnf_encode(params, cfg, src_seq, src_mask, *, train=False, rng=None):
    from pytorch_kaldi_asr_tpu.models.common import splice_frames

    rngs = _Rngs(rng)
    dtype = cfg.compute_dtype
    x = src_seq.astype(dtype) @ params["src_proj"]["w"].astype(dtype)
    x = x.astype(jnp.float32)
    for ctx, layer in zip(cfg.tdnn_contexts, params["layers"]):
        h = splice_frames(x, ctx).astype(dtype)
        h = h @ layer["factor"].astype(dtype)
        h = h @ layer["up"]["w"].astype(dtype) + layer["up"]["b"].astype(dtype)
        h = jax.nn.relu(h.astype(jnp.float32))
        h = dropout(h, cfg.en_dropout, rngs.next(), train)
        x = 0.66 * x + h  # Kaldi-style scaled skip connection
    return x, src_mask


def semi_orthogonal_step(params, alpha=0.125):
    """One step of Povey-style semi-orthogonality enforcement on every
    TDNN-F factor matrix: M ← M − α·(M Mᵀ − s·I) M, applied periodically by
    the training loop (mirrors Kaldi's constrain-orthonormal)."""

    def fix(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if "factor" not in keys:
            return leaf
        m = leaf
        transpose = m.shape[0] < m.shape[1]
        w = m.T if transpose else m  # rows >= cols: constrain w.T @ w ≈ s·I
        p = w.T @ w
        scale = jnp.trace(p @ p) / jnp.trace(p)
        update = p - scale * jnp.eye(p.shape[0], dtype=p.dtype)
        w = w - (alpha / scale) * (w @ update)
        return w.T if transpose else w

    return jax.tree_util.tree_map_with_path(fix, params)


ENCODER_INITS = {
    "banded": init_banded_encoder,
    "blstm": init_blstm_encoder,
    "conformer": init_conformer_encoder,
    "tdnnf": init_tdnnf_encoder,
}

ENCODER_APPLYS = {
    "banded": banded_encode,
    "blstm": blstm_encode,
    "conformer": conformer_encode,
    "tdnnf": tdnnf_encode,
}
