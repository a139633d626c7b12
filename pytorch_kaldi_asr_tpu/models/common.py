"""Shared model building blocks: positional tables, attention masks, frame
folding, layer norm, splicing, dropout.

Numerical contracts follow the reference model family so that posteriors (and
hence WER) match:

- sinusoid table with a zeroed row 0 (reference Models.py:16-25 — the
  ``padding_idx=0`` quirk means position 0 always contributes a zero vector);
- banded ("time-restricted") attention masks: query t may attend keys in
  ``[t+start, t+end]`` inclusive (Models.py:38-49);
- layer norm with ``eps`` added to the *unbiased* std (torch ``std`` divides
  by N-1), and the reference's skip-when-length-1 quirk exposed as a flag
  (Modules.py:32-51);
- frame folding: stack ``fold`` consecutive frames, subsample the mask at
  ``[fold-1::fold]`` (Models.py:51-65).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def position_encoding_table(n_position, d_model):
    """Sinusoid position table [n_position, d_model]; row 0 is zeros."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_model)
    table = np.zeros((n_position, d_model), dtype=np.float64)
    table[1:, 0::2] = np.sin(angle[1:, 0::2])
    table[1:, 1::2] = np.cos(angle[1:, 1::2])
    return jnp.asarray(table, dtype=jnp.float32)


def position_encoding_rows(positions, d_model):
    """Closed-form rows of :func:`position_encoding_table` at arbitrary
    integer ``positions`` [T] (position 0 is zeros, matching the table).
    O(T*D) regardless of how large the positions are — streaming encoders
    use this to fetch global-offset rows without materializing a table
    that grows with stream age."""
    pos = np.asarray(positions, dtype=np.float64)[:, None]
    j = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_model)
    rows = np.zeros((pos.shape[0], d_model), dtype=np.float64)
    nz = pos[:, 0] != 0
    rows[nz, 0::2] = np.sin(angle[nz, 0::2])
    rows[nz, 1::2] = np.cos(angle[nz, 1::2])
    return jnp.asarray(rows, dtype=jnp.float32)


def padding_attn_mask(mask_q, mask_k):
    """True where attention must be BLOCKED because the key is padding.

    ``mask_q``/``mask_k`` are [B, L] validity masks (1 = real).  Matches
    reference ``get_attn_padding_mask`` (Models.py:27-36): block depends only
    on the key being PAD; returns [B, Lq, Lk] bool."""
    blocked = (mask_k == 0)[:, None, :]
    return jnp.broadcast_to(blocked, (mask_q.shape[0], mask_q.shape[1], mask_k.shape[1]))


def banded_attn_mask(length, start, end, dtype=jnp.bool_):
    """True where attention must be BLOCKED by the (start, end) band.

    Position t may attend positions ``[t+start, t+end]`` inclusive; everything
    else is blocked (reference ``get_attn_subsequent_mask``, Models.py:38-49).
    Returns [L, L] bool (broadcastable over batch)."""
    q = jnp.arange(length)[:, None]
    k = jnp.arange(length)[None, :]
    rel = k - q
    allowed = (rel >= start) & (rel <= end)
    return (~allowed).astype(dtype)


def fold_seq_and_mask(seq, pad_mask, fold):
    """Stack ``fold`` consecutive frames: [B, L, D] → [B, L//fold, D*fold];
    the validity mask is subsampled at ``[fold-1::fold]``."""
    if fold == 1:
        return seq, pad_mask
    if fold < 1:
        raise ValueError("invalid data fold parameter")
    b, l, d = seq.shape
    l_trim = l - l % fold
    seq = seq[:, :l_trim].reshape(b, l_trim // fold, d * fold)
    pad_mask = pad_mask[:, fold - 1 :: fold][:, : l_trim // fold]
    return seq, pad_mask


def masked_softmax(logits, blocked):
    """Exact softmax over unblocked entries of the last axis; fully-blocked
    rows → all zeros (the reference's masked_fill(-inf) → softmax → re-zero,
    Modules.py:86-90, without NaNs).  The single implementation shared by
    the transformer, the incremental decoder, and the banded-attention
    oracle — they are pinned equal by tests and must stay in lockstep."""
    neg_inf = jnp.array(-jnp.inf, dtype=logits.dtype)
    logits = jnp.where(blocked, neg_inf, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / jnp.where(s == 0.0, 1.0, s)
    return jnp.where(blocked, 0.0, attn)


def layer_norm(z, gamma, beta, eps=1e-3, skip_len1=True):
    """Reference-style layer norm (Modules.py:42-51).

    Differences from standard LN, preserved deliberately:
    - normalizes by the UNBIASED std (÷(N-1)) with ``eps`` added to the std
      itself rather than the variance;
    - when the sequence axis (axis 1) has length 1, the op is the identity
      (``skip_len1``) — this fires on the first step of autoregressive
      decoding in the reference.
    """
    if skip_len1 and z.shape[1] == 1:
        return z
    # statistics always in f32 (bit-identical for f32 inputs; for a bf16
    # residual stream the casts fuse into the LN fusion, halving the HBM
    # traffic of the stream without touching the normalization math)
    zf = z.astype(jnp.float32)
    n = z.shape[-1]
    if z.dtype == jnp.bfloat16:
        # one-pass moments for the bf16 stream: E[x], E[x^2] come out of a
        # single read of z (the two-pass centered form reads z twice before
        # the normalize pass).  The cancellation risk of the sum-of-squares
        # form is negligible at activation scale in f32.
        s1 = jnp.sum(zf, axis=-1, keepdims=True)
        s2 = jnp.sum(zf * zf, axis=-1, keepdims=True)
        mu = s1 / n
        var = jnp.maximum(s2 - n * mu * mu, 0.0) / (n - 1)
    else:
        mu = jnp.mean(zf, axis=-1, keepdims=True)
        var = jnp.sum((zf - mu) ** 2, axis=-1, keepdims=True) / (n - 1)
    # safe sqrt: d/dvar sqrt(var) is infinite at var == 0, which REAL rows
    # hit whenever a row is constant (e.g. the all-zero padded frames the
    # Conformer conv module produces) — inf * 0 cotangent = NaN poisoning
    # every upstream gradient.  The double-where keeps the forward value
    # bit-identical (sqrt(var) when var > 0, else 0) and zeroes the
    # backward at var == 0.
    safe = var > 0
    sigma = jnp.where(safe, jnp.sqrt(jnp.where(safe, var, 1.0)), 0.0)
    out = (zf - mu) / (sigma + eps)
    return (out * gamma + beta).astype(z.dtype)


def splice_frames(x, context):
    """Frame splicing over a context index list: concatenate zero-padded
    shifted copies along the feature axis (reference TDNN.py ConcatLayer:6-28).

    x: [B, L, D] → [B, L, D*len(context)], feature blocks in context order."""
    context = list(context)
    pad_head = max(0, -context[0])
    pad_end = max(0, context[-1])
    l = x.shape[1]
    padded = jnp.pad(x, ((0, 0), (pad_head, pad_end), (0, 0)))
    pieces = [
        jax.lax.dynamic_slice_in_dim(padded, c + pad_head, l, axis=1)
        for c in context
    ]
    return jnp.concatenate(pieces, axis=2)


def spliced_linear(x, w, b, context, dtype=None):
    """``splice_frames(x, context) @ w + b`` without materializing the
    spliced tensor: evenly-spaced contexts (all the recipe's are) become a
    dilated 1-D convolution, which XLA maps straight onto the MXU.

    x: [B, T, D]; w: [D·K, D_out] with row blocks in context order;
    context: K offsets.  Equivalent to the splice+matmul formulation
    (zero padding at the edges) to float tolerance."""
    context = list(context)
    k = len(context)
    if dtype is None:
        dtype = x.dtype
    x = x.astype(dtype)
    w = w.astype(dtype)
    steps = [context[i + 1] - context[i] for i in range(k - 1)]
    if k > 1 and len(set(steps)) == 1 and steps[0] > 0:
        dilation = steps[0]
        d_in = x.shape[-1]
        kernel = w.reshape(k, d_in, -1)  # [K, D, D_out] in context order
        pad_lo = -context[0]
        pad_hi = context[-1]
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad_lo, pad_hi)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=dtype,
        )
    else:
        out = splice_frames(x, context) @ w
    if b is not None:
        out = out + b.astype(dtype)
    return out


def dropout(x, rate, rng, train):
    """Inverted dropout; identity when not training or rate == 0.

    Uses jax.random directly: with the train state's hardware-RNG ('rbg')
    keys XLA fuses bit generation + mask + scale into neighboring ops.  (A
    Pallas fused-dropout kernel exists in ops/fused_dropout.py but measured
    ~20% slower end-to-end at recipe shapes — eight pallas_call sites act as
    fusion barriers — so it is opt-in, not the default.)"""
    if not train or rate == 0.0 or rng is None:
        return x
    # 8-bit threshold draw: 4x less generated RNG traffic than bernoulli's
    # 32-bit uniform (the step's dropout cost is HBM-bound mask material).
    # Keep probability is quantized to q/256 and the inverse scale uses the
    # quantized value, so the estimator stays exactly unbiased; for the
    # recipe rates (0.1-0.35) the quantization moves the rate by < 0.002.
    q = round((1.0 - rate) * 256)
    if q >= 256:
        return x  # keep-everything after quantization
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    keep = bits < jnp.uint8(max(q, 1))  # P(keep) = q/256
    return jnp.where(keep, x * (256.0 / max(q, 1)), 0.0).astype(x.dtype)


def xavier_normal(rng, shape, fan_in, fan_out, dtype=jnp.float32):
    """Xavier/Glorot normal with explicit fans (matches torch
    ``init.xavier_normal_`` when given the same fans)."""
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(rng, shape, dtype=dtype)


def torch_default_uniform(rng, shape, fan_in, dtype=jnp.float32):
    """torch's nn.Linear/nn.Conv1d DEFAULT weight/bias init: kaiming-uniform
    with a=sqrt(5), which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) —
    the distribution the reference's FFN convs (SubLayers.py:75-76, no
    explicit re-init) and every Linear/Conv bias train from."""
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(
        rng, shape, dtype=dtype, minval=-bound, maxval=bound)
