"""Build a JAX model from an nnet1-style network prototype.

The reference's proto generators (reference kaldi/utils/nnet/
make_nnet_proto.py) emit artifacts only an external Kaldi binary can
materialize; here the artifact is consumable in-framework: parse_proto
reads the <NnetProto> text (tools/make_nnet_proto.py output) and
init_proto/apply_proto realize it as a pytree + pure function — a
declarative path to frame-level acoustic models alongside the hand-written
encoder zoo (models/encoders.py).

Supported components: <AffineTransform>, <LinearTransform>, <Sigmoid>,
<Tanh>, <ReLU>, <Softmax>, <Dropout>, <Splice>.  Recurrent/conv protos
(LSTM/CNN) are generated for artifact parity but must be realized via the
encoder zoo; init_proto raises a clear error for them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.models.common import dropout as _dropout

SUPPORTED = {"<AffineTransform>", "<LinearTransform>", "<Sigmoid>",
             "<Tanh>", "<ReLU>", "<Softmax>", "<Dropout>", "<Splice>"}


def parse_proto(text):
    """<NnetProto> text -> [ {type, attrs...} ] component dicts."""
    comps = []
    for line in text.splitlines():
        toks = line.split()
        if not toks or toks[0] in ("<NnetProto>", "</NnetProto>"):
            continue
        comp = {"type": toks[0]}
        i = 1
        while i + 1 < len(toks) + 1 and i < len(toks):
            key = toks[i]
            if key.startswith("<") and i + 1 < len(toks):
                comp[key[1:-1]] = toks[i + 1]
                i += 2
            else:
                i += 1
        comps.append(comp)
    return comps


def init_proto(rng, comps):
    """Parameter pytree for a parsed proto (list aligned with comps)."""
    params = []
    for comp in comps:
        t = comp["type"]
        if t not in SUPPORTED:
            raise ValueError(
                f"component {t} is generated for artifact parity but must "
                f"be realized via the encoder zoo (models/encoders.py)")
        if t in ("<AffineTransform>", "<LinearTransform>"):
            din = int(comp["InputDim"])
            dout = int(comp["OutputDim"])
            std = float(comp.get("ParamStddev", 0.1))
            rng, k = jax.random.split(rng)
            p = {"w": std * jax.random.normal(k, (din, dout))}
            if t == "<AffineTransform>":
                bias_mean = float(comp.get("BiasMean", 0.0))
                bias_range = float(comp.get("BiasRange", 0.0))
                rng, k = jax.random.split(rng)
                p["b"] = bias_mean + bias_range * (
                    jax.random.uniform(k, (dout,)) - 0.5)
            params.append(p)
        else:
            params.append({})
    return params


def apply_proto(params, comps, x, *, train=False, rng=None):
    """Pure forward over [B, T, D] (or [N, D]) inputs."""
    site = 0
    for p, comp in zip(params, comps):
        t = comp["type"]
        if t in ("<AffineTransform>", "<LinearTransform>"):
            x = x @ p["w"]
            if "b" in p:
                x = x + p["b"]
        elif t == "<Sigmoid>":
            x = jax.nn.sigmoid(x)
        elif t == "<Tanh>":
            x = jnp.tanh(x)
        elif t == "<ReLU>":
            x = jax.nn.relu(x)
        elif t == "<Softmax>":
            x = jax.nn.softmax(x, axis=-1)
        elif t == "<Dropout>":
            keep = float(comp.get("DropoutRetention", 0.5))
            site += 1
            r = (jax.random.fold_in(rng, site)
                 if rng is not None else None)
            x = _dropout(x, 1.0 - keep, r, train)
        elif t == "<Splice>":
            # nnet1 splice semantics: context frames clamp (repeat) at the
            # utterance edges — NOT a circular shift, which would leak the
            # other end of the utterance into edge frames
            ctx = [int(c) for c in comp.get("Context", "0").split(":")]
            n = x.shape[-2]
            idx = jnp.arange(n)
            parts = [
                jnp.take(x, jnp.clip(idx + off, 0, n - 1), axis=-2)
                for off in ctx
            ]
            x = jnp.concatenate(parts, axis=-1)
    return x


def proto_output_dim(comps):
    for comp in reversed(comps):
        if "OutputDim" in comp:
            return int(comp["OutputDim"])
    raise ValueError("proto has no OutputDim")
