"""Device meshes and sharding rules.

The reference has NO in-process parallelism (single GPU bind,
train.py:352-359; cluster story = file-based SGE job arrays, SURVEY.md §2d).
Here distribution is first-class and TPU-native: a ``jax.sharding.Mesh`` with
``data`` (batch) and ``model`` (tensor) axes; pjit/GSPMD inserts the gradient
psum over ICI.  The same train step runs unchanged on 1 chip or a slice.

Sharding layout for the flagship transformer:
- batch arrays: sharded on ``data``;
- per-head attention projections ``w_qs/w_ks/w_vs [H, D, K]``: heads on
  ``model`` (Megatron-style head parallelism — each chip computes its local
  heads; the output projection contracts the head axis, inserting one
  reduce-scatter/all-reduce per attention block);
- attention output proj ``[H·dv, D]``: input (head) dim on ``model``;
- FFN ``w1 [D, inner]`` / ``w2 [inner, D]``: inner dim on ``model``;
- embeddings/vocab projection: vocab dim on ``model``;
- everything else (LN, LDA, TDNN) replicated — they are tiny.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data=None, model=1, devices=None):
    """Create a ('data', 'model') mesh.  ``data`` defaults to
    n_devices/model."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def param_sharding_rules(path, leaf):
    """PartitionSpec for one parameter leaf, keyed on its tree path."""
    keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
    name = "/".join(keys)
    ndim = getattr(leaf, "ndim", 0)
    if "w_qs" in keys or "w_ks" in keys or "w_vs" in keys:
        return P("model", None, None)  # heads
    if "proj" in keys and keys[-1] == "w":
        return P("model", None)  # contract the head-major input dim
    if "ffn" in name or "w1" in keys or "w2" in keys:
        if keys[-1] == "w" and ndim == 2:
            if "w1" in keys:
                return P(None, "model")
            if "w2" in keys:
                return P("model", None)
    if "embed" in keys and ndim == 2:
        return P(None, "model")  # shard d_model of the embedding
    if "word_proj" in keys and keys[-1] == "w":
        return P(None, "model")  # vocab dim
    return P()  # replicated


def _effective_spec(mesh, spec, leaf):
    """Replicate instead of sharding any dimension the mesh axis doesn't
    divide (e.g. an odd vocab size over a 2-way model axis)."""
    shape = getattr(leaf, "shape", ())
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for i, axis in enumerate(spec):
        if axis is None:
            continue
        if i >= len(shape) or shape[i] % axis_sizes[axis] != 0:
            return P()
    return spec


def shard_params(params, mesh):
    """Place a parameter pytree onto the mesh per the rules above."""

    def place(path, leaf):
        spec = _effective_spec(mesh, param_sharding_rules(path, leaf), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh):
    """The NamedSharding pytree matching ``shard_params`` placement."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            _effective_spec(mesh, param_sharding_rules(path, leaf), leaf),
        ),
        params,
    )


def shard_batch_arrays(mesh, *arrays):
    """Place batch-major arrays with the batch axis split over 'data'."""
    sharding = batch_sharding(mesh)
    return tuple(jax.device_put(a, sharding) for a in arrays)
