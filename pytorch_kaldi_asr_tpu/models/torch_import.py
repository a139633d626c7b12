"""Import reference-format torch weights into the JAX parameter pytree.

The reference checkpoints (reference initialize_model.py:90-95,
train.py:253-260) pickle the whole ``Transformer`` module; its
``state_dict()`` key schema is fixed by Models.py / SubLayers.py /
Modules.py / TDNN.py:

- ``encoder_test.lda_layer.weight`` is stored already transposed to
  [in, out] (TDNN.py:51-52);
- every ``Linear`` is the Modules.py ``BottleLinear`` wrapper, so weights
  live under ``<name>.linear.weight`` with torch's [out, in] layout;
- attention per-head tensors ``w_qs/w_ks/w_vs`` are [H, d_model, d_k]
  (SubLayers.py:23-25) — the same layout this framework uses natively;
- layer norms are ``a_2``/``b_2`` (Modules.py:36-38);
- the FFN is two 1x1 Conv1d's, weight [out, in, 1] (SubLayers.py:75-78).

``state_dict_to_params`` converts a {key: numpy array} mapping of that
schema into the pytree produced by ``models.transformer.init_transformer``,
so a model trained by the reference can be decoded (or fine-tuned) by this
framework, and reference-code activations can be pinned as golden parity
tests (tests/test_parity_reference.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig


def _lin(sd, name):
    """BottleLinear weights -> {w: [in,out], b?} dict."""
    out = {"w": jnp.asarray(np.asarray(sd[name + ".linear.weight"]).T)}
    if name + ".linear.bias" in sd:
        out["b"] = jnp.asarray(np.asarray(sd[name + ".linear.bias"]))
    return out


def _mha(sd, prefix):
    return {
        "w_qs": jnp.asarray(np.asarray(sd[prefix + ".w_qs"])),
        "w_ks": jnp.asarray(np.asarray(sd[prefix + ".w_ks"])),
        "w_vs": jnp.asarray(np.asarray(sd[prefix + ".w_vs"])),
        "proj": _lin(sd, prefix + ".proj"),
        "ln": {
            "gamma": jnp.asarray(np.asarray(sd[prefix + ".layer_norm.a_2"])),
            "beta": jnp.asarray(np.asarray(sd[prefix + ".layer_norm.b_2"])),
        },
    }


def _ffn(sd, prefix):
    def conv1x1(name):
        w = np.asarray(sd[name + ".weight"])[:, :, 0].T  # [in, out]
        return {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(sd[name + ".bias"]))}

    return {
        "w1": conv1x1(prefix + ".w_1"),
        "w2": conv1x1(prefix + ".w_2"),
        "ln": {
            "gamma": jnp.asarray(np.asarray(sd[prefix + ".layer_norm.a_2"])),
            "beta": jnp.asarray(np.asarray(sd[prefix + ".layer_norm.b_2"])),
        },
    }


def state_dict_to_params(sd, cfg: TransformerConfig):
    """Convert a reference-schema state dict (numpy or torch tensors) into
    this framework's parameter pytree for the flagship TDNN-encoder model."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    encoder = {
        "lda": {
            # LDALayer stores weight already as [in, out] (TDNN.py:51-52).
            "w": jnp.asarray(sd["encoder_test.lda_layer.weight"]),
            "b": jnp.asarray(sd["encoder_test.lda_layer.bias"]),
        },
        "src_proj": _lin(sd, "encoder_test.src_projection"),
        "tdnn": [],
    }
    i = 0
    while f"encoder_test.tdnn_stack.{i}.proj.weight" in sd:
        encoder["tdnn"].append(
            {
                "w": jnp.asarray(sd[f"encoder_test.tdnn_stack.{i}.proj.weight"].T),
                "b": jnp.asarray(sd[f"encoder_test.tdnn_stack.{i}.proj.bias"]),
            }
        )
        i += 1
    if len(encoder["tdnn"]) != len(cfg.tdnn_contexts):
        raise ValueError(
            f"state dict has {len(encoder['tdnn'])} TDNN layers but the config "
            f"declares {len(cfg.tdnn_contexts)} contexts"
        )

    decoder = {
        "embed": jnp.asarray(sd["decoder.tgt_word_emb.weight"]),
        "enc_dec_proj": _lin(sd, "decoder.enc_dec_projection"),
        "word_proj": _lin(sd, "decoder.tgt_word_proj"),
        "layers": [],
    }
    i = 0
    while f"decoder.layer_stack.{i}.slf_attn.w_qs" in sd:
        decoder["layers"].append(
            {
                "slf": _mha(sd, f"decoder.layer_stack.{i}.slf_attn"),
                "enc": _mha(sd, f"decoder.layer_stack.{i}.enc_attn"),
                "ffn": _ffn(sd, f"decoder.layer_stack.{i}.pos_ffn"),
            }
        )
        i += 1
    if len(decoder["layers"]) != cfg.de_layers:
        raise ValueError(
            f"state dict has {len(decoder['layers'])} decoder layers but the "
            f"config declares {cfg.de_layers}"
        )

    return {"encoder": encoder, "decoder": decoder}


def config_from_model_options(opts: dict) -> TransformerConfig:
    """Build a TransformerConfig from the reference checkpoint's
    ``model_options`` dict (reference initialize_model.py:73-88)."""

    def _pair(v):
        if isinstance(v, str):
            v = v.strip("() ").split(",")
        a, b = (int(x) for x in v)
        return (a, b)

    return TransformerConfig(
        src_dim=int(opts["n_src_dim"]),
        vocab_size=int(opts["n_tgt_vocab"]),
        encoder_max_len=int(opts["encoder_max_len"]),
        decoder_max_len=int(opts["decoder_max_len"]),
        src_fold=int(opts.get("src_fold", 1)),
        encoder_sub_sequence=_pair(opts.get("encoder_sub_sequence", (-100, 0))),
        decoder_sub_sequence=_pair(opts.get("decoder_sub_sequence", (-10, 0))),
        en_layers=int(opts.get("en_layers", 3)),
        de_layers=int(opts.get("de_layers", 3)),
        n_head=int(opts.get("n_head", 2)),
        en_d_model=int(opts.get("en_d_model", 256)),
        de_d_model=int(opts.get("de_d_model", 128)),
        d_k=int(opts.get("d_k", 64)),
        d_v=int(opts.get("d_v", 64)),
        en_dropout=float(opts.get("en_dropout", 0.35)),
        de_dropout=float(opts.get("de_dropout", 0.35)),
        tdnn_contexts=tuple(tuple(c) for c in opts["tdnn_contexts"])
        if "tdnn_contexts" in opts
        else TransformerConfig.tdnn_contexts,
    )
