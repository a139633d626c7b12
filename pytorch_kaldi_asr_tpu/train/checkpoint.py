"""Checkpointing: explicit params/config/step trees instead of the
reference's whole-module pickle (initialize_model.py:90-95, train.py:253-260).

A checkpoint is a directory::

    <name>/
      config.json       # TransformerConfig fields (+ model_kind)
      meta.json         # epoch, step, train options, user extras
      params.msgpack    # flax-serialized parameter pytree
      opt_state.msgpack # optional optimizer state

The config inside the checkpoint is authoritative on load (the reference
reloads ``model_options`` from the checkpoint rather than re-specifying,
train.py:366-367).  ``average_params`` provides the state-dict arithmetic
behind checkpoint combining (train.py:284-322)."""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np
from flax import serialization

from pytorch_kaldi_asr_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
)


def _config_to_json(cfg):
    d = dataclasses.asdict(cfg)
    d["compute_dtype"] = np.dtype(cfg.compute_dtype).name
    d["conformer_stream_dtype"] = np.dtype(cfg.conformer_stream_dtype).name
    return d


def _config_from_json(d):
    import jax.numpy as jnp

    d = dict(d)
    d["compute_dtype"] = jnp.dtype(d.get("compute_dtype", "float32"))
    d["conformer_stream_dtype"] = jnp.dtype(
        d.get("conformer_stream_dtype", "float32"))
    for key in ("encoder_sub_sequence", "decoder_sub_sequence", "lda_context"):
        if key in d:
            d[key] = tuple(d[key])
    if "tdnn_contexts" in d:
        d["tdnn_contexts"] = tuple(tuple(c) for c in d["tdnn_contexts"])
    return TransformerConfig(**d)


def save_checkpoint(path, params, cfg, *, epoch=0, step=0, opt_state=None,
                    extra=None):
    """Write a checkpoint directory (created if needed)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_config_to_json(cfg), f, indent=1)
    meta = {"epoch": int(epoch), "step": int(step)}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(opt_state)))
    return path


def read_checkpoint_config(path):
    """Just the (cfg, meta) of a checkpoint — no parameter parsing (used
    when the caller must build a non-default parameter template first,
    e.g. AM checkpoints whose tree is encoder+head rather than
    encoder+decoder)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = _config_from_json(json.load(f))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return cfg, meta


def load_checkpoint(path, *, template_params=None, template_opt_state=None):
    """Load a checkpoint directory.

    Returns dict with keys: params, cfg, epoch, step, meta, opt_state (None
    if absent or no template given)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = _config_from_json(json.load(f))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if template_params is None:
        # the config is sufficient to rebuild the tree structure
        template_params = init_transformer(jax.random.PRNGKey(0), cfg)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template_params, f.read())
    opt_state = None
    opt_path = os.path.join(path, "opt_state.msgpack")
    if template_opt_state is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(template_opt_state, f.read())
    return {
        "params": params,
        "cfg": cfg,
        "epoch": meta.get("epoch", 0),
        "step": meta.get("step", 0),
        "meta": meta,
        "opt_state": opt_state,
    }


def average_params(params_list=None, *, running=None, new=None, count=None):
    """Parameter averaging.

    Two modes:
    - ``average_params([p1, p2, ...])`` — arithmetic mean of a list;
    - ``average_params(running=r, new=p, count=i)`` — progressive update
      ``r·(1 − 1/(i+1)) + p·(1/(i+1))`` (the reference's scale_dict/add_dict
      arithmetic, train.py:276-322), where ``count`` is the number of models
      already in ``running``.
    """
    if params_list is not None:
        n = len(params_list)
        return jax.tree_util.tree_map(
            lambda *xs: sum(xs) / n, *params_list
        )
    factor = 1.0 / (count + 1)
    return jax.tree_util.tree_map(
        lambda r, p: r * (1.0 - factor) + p * factor, running, new
    )
