"""Weight-only int8 quantization for serving.

The reference has no quantized inference; this is the TPU-native serving
upgrade (docs/ROADMAP.md item 4): matmul weights are stored in HBM as
int8 with a per-output-channel float scale (symmetric, scale = max|w| /
127 over all axes but the last), cutting the parameter footprint and the
per-step weight traffic 4x vs float32.  Dequantization happens INSIDE the
jitted forward (``q.astype(compute) * scale``) — an elementwise op XLA
schedules right before the matmul — so no model code changes: callers
dequantize the whole tree at jit entry and run the unchanged model.

A quantized leaf is the two-array dict ``{"q8": int8[...], "scale":
f32[out]}`` — the marker is the KEY SET (structure, not a string leaf, so
the tree stays jit-traceable and msgpack/checkpoint friendly).  Only
floating-point leaves with ndim >= 2 and size >= ``min_size`` are
quantized (matmul weights); biases, layer-norm gains, and tiny tables
stay exact.

Used by recipes/serve.py -quantize_weights (decode-path inference);
training always runs on the float tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _is_quant(leaf):
    return isinstance(leaf, dict) and set(leaf) == {"q8", "scale"}


def quantize_array(w):
    """Symmetric per-output-channel (last axis) int8 quantization.
    Returns the quantized-leaf dict."""
    w = np.asarray(w)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = np.max(np.abs(w), axis=reduce_axes)
    # exact-zero channels quantize to all-zero q with scale 1 (no inf/nan)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"q8": q, "scale": scale}


def dequantize_array(leaf, dtype=jnp.float32):
    """Inverse of :func:`quantize_array`; jit-traceable."""
    return leaf["q8"].astype(dtype) * leaf["scale"].astype(dtype)


def quantize_tree(params, *, min_size=1024):
    """Quantize every float leaf with ndim >= 2 and size >= min_size.
    Returns (quantized_tree, n_quantized_leaves)."""
    n = 0

    def visit(leaf):
        nonlocal n
        arr = np.asarray(leaf)
        if (np.issubdtype(arr.dtype, np.floating) and arr.ndim >= 2
                and arr.size >= min_size):
            n += 1
            return quantize_array(arr)
        return leaf

    out = jax.tree_util.tree_map(visit, params)
    return out, n


def dequantize_tree(params, dtype=jnp.float32):
    """Materialize the float tree from a (possibly partially) quantized
    one.  Call INSIDE jit so the stored weights stay int8 in HBM and the
    dequant fuses into the step."""
    return jax.tree_util.tree_map(
        lambda leaf: dequantize_array(leaf, dtype) if _is_quant(leaf)
        else leaf,
        params,
        is_leaf=_is_quant,
    )


def quantized_search_fn(search):
    """Wrap a beam-search function with the ``(params, cfg, src, src_mask,
    *, beam_size, max_len)`` signature so it accepts a QUANTIZED tree,
    dequantizing inside a fresh jit (the one place that owns the
    static-argname contract — decode/runner.py and recipes/serve.py both
    use this)."""
    import functools

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "beam_size", "max_len"))
    def wrapped(params, cfg, src, src_mask, *, beam_size, max_len):
        return search(dequantize_tree(params), cfg, src, src_mask,
                      beam_size=beam_size, max_len=max_len)

    return wrapped


def tree_bytes(params):
    """Total parameter bytes (quantized leaves count their int8 + scale)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += np.asarray(leaf).nbytes
    return total
