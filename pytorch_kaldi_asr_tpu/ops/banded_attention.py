"""Blockwise banded (time-restricted) attention as a Pallas TPU kernel.

The reference's scaling mechanism is a banded attention mask: position t
attends to ``[t+start, t+end]`` (encoder (-100, 0), decoder (-10, 0);
Models.py:38-49, run.sh:80-81) — but it still materializes the full [S, S]
score matrix and masks it.  On TPU the band IS the algorithm: a
flash-attention-style kernel visits only the key blocks overlapping each
query block's band, so work and VMEM traffic scale with S·window instead of
S² and no [S, S] tensor ever exists.

Semantics match the reference attention exactly (tests pin this):
- scores scaled by a caller-provided ``scale`` (the reference uses
  1/sqrt(d_model), Modules.py:73);
- keys outside the band or marked invalid contribute nothing;
- fully-masked query rows output exact zeros (the reference's
  softmax-then-re-zero, Modules.py:86-90) — in flash form, a zero running
  denominator.

Layout: q, k, v are [BH, S, D] (batch×heads folded), key_valid is [BH, S].
S must be a multiple of the block size (pad with key_valid=0); D should be a
multiple of 128 lanes for MXU efficiency but any size compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def banded_attention_reference(q, k, v, key_valid, start, end, scale):
    """Pure-XLA oracle: full scores + mask (reference semantics; shares
    models.common.masked_softmax with the transformer paths)."""
    from pytorch_kaldi_asr_tpu.models.common import masked_softmax

    s = q.shape[1]
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    qpos = jnp.arange(s)[:, None]
    kpos = jnp.arange(s)[None, :]
    rel = kpos - qpos
    band = (rel >= start) & (rel <= end)
    mask = band[None, :, :] & (key_valid[:, None, :] > 0)
    p = masked_softmax(logits, ~mask)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def _kernel(q_ref, k_ref, v_ref, kv_ref, out_ref, m_ref, l_ref, acc_ref, *,
            start, end, scale, block_q, n_back, n_kblocks):
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_block = qi - n_back + kj
    in_range = (k_block >= 0) & (k_block < n_kblocks)

    @pl.when(in_range)
    def _accumulate():
        # dots run in the INPUT dtype with f32 accumulation
        # (preferred_element_type): bf16xbf16->f32 uses the MXU at full
        # rate, ~4x the f32xf32 rate; softmax statistics stay in f32.
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BQ] f32

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 0
        )
        k_pos = k_block * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 1
        )
        rel = k_pos - q_pos
        kv = kv_ref[0][:, 0]  # [BQ] key validity of this k block
        mask = (rel >= start) & (rel <= end) & (kv[None, :] > 0)
        s = jnp.where(mask, s, -jnp.inf)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        alpha = jnp.where(
            jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0
        )
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finalize():
        denom = l_ref[:]
        out = acc_ref[:] / jnp.where(denom == 0.0, 1.0, denom)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("start", "end", "scale", "block_q", "interpret")
)
def banded_attention_pallas(q, k, v, key_valid, *, start, end, scale,
                            block_q=128, interpret=False):
    """Flash-style banded attention.  q/k/v: [BH, S, D]; key_valid: [BH, S].

    ``start <= 0 <= end`` (window relative to the query position); S must be
    a multiple of block_q.  v (and the output) may have a different head
    dim than q/k (d_v vs d_k are independent config fields)."""
    bh, s, d = q.shape
    dv = v.shape[-1]
    if s % block_q != 0:
        raise ValueError(f"S={s} not a multiple of block_q={block_q}")
    if not (start <= 0 <= end):
        raise ValueError("band must satisfy start <= 0 <= end")
    n_qblocks = s // block_q
    n_back = -(-(-start) // block_q) if start < 0 else 0  # cdiv(-start, BQ)
    n_fwd = -(-end // block_q) if end > 0 else 0
    n_visit = n_back + n_fwd + 1
    n_kblocks = n_qblocks

    kernel = functools.partial(
        _kernel, start=start, end=end, scale=scale, block_q=block_q,
        n_back=n_back, n_kblocks=n_kblocks,
    )

    def k_index(b, qi, kj):
        return (b, jnp.clip(qi - n_back + kj, 0, n_kblocks - 1), 0)

    grid = (bh, n_qblocks, n_visit)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, block_q, d), k_index),
            pl.BlockSpec((1, block_q, dv), k_index),
            pl.BlockSpec((1, block_q, 1), k_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv),
                               lambda b, qi, kj: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, key_valid.reshape(bh, s, 1))


# ---------------------------------------------------------------------------
# trainable path: forward with LSE + attention-prob dropout, custom VJP with
# blockwise backward kernels (flash-attention backward over the band)
# ---------------------------------------------------------------------------


def _dropout_keep(seed, bh, q_pos, k_pos, rate):
    """Deterministic keep mask as a pure function of (seed, batch-head,
    GLOBAL q/k position) — a counter-based lowbias32-style integer hash.
    Because it keys on global coordinates, the forward and both backward
    kernels regenerate the identical mask regardless of how their grids
    block the computation (and it works in interpret mode, unlike the
    hardware PRNG primitives)."""
    x = (q_pos.astype(jnp.uint32) * jnp.uint32(2654435761)
         + k_pos.astype(jnp.uint32) * jnp.uint32(2246822519)
         + jnp.uint32(bh) * jnp.uint32(3266489917)
         + seed.astype(jnp.uint32))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(int(rate * 0xFFFFFFFF))
    return x >= thresh


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, kv_ref, out_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, start, end, scale, block_q,
                n_back, n_kblocks, dropout_rate):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_block = qi - n_back + kj
    in_range = (k_block >= 0) & (k_block < n_kblocks)

    @pl.when(in_range)
    def _accumulate():
        # dots in the input dtype, f32 accumulation (see _kernel)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 0)
        k_pos = k_block * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 1)
        rel = k_pos - q_pos
        kv = kv_ref[0][:, 0]
        mask = (rel >= start) & (rel <= end) & (kv[None, :] > 0)
        s = jnp.where(mask, s, -jnp.inf)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        # denominator uses the FULL p (softmax normalizer); dropout applies
        # only to the value accumulation — exactly dropout(softmax(s)) @ v
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref[0], b, q_pos, k_pos, dropout_rate)
            p_acc = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
        else:
            p_acc = p
        acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
            p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finalize():
        denom = l_ref[:]
        out = acc_ref[:] / jnp.where(denom == 0.0, 1.0, denom)
        out_ref[0] = out.astype(out_ref.dtype)
        # logsumexp per query row (finite rows only; -inf rows stay -inf)
        lse = jnp.where(
            denom[:, 0] > 0.0,
            m_ref[:][:, 0] + jnp.log(jnp.where(denom[:, 0] > 0.0,
                                               denom[:, 0], 1.0)),
            -jnp.inf,
        )
        lse_ref[0] = lse[:, None]


def _dq_kernel(seed_ref, q_ref, k_ref, do_ref, lse_ref, delta_ref, kv_ref,
               v_ref, dq_ref, acc_ref, *, start, end, scale, block_q,
               n_back, n_kblocks, dropout_rate):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_block = qi - n_back + kj
    in_range = (k_block >= 0) & (k_block < n_kblocks)

    @pl.when(in_range)
    def _accumulate():
        # dots in the input dtype, f32 accumulation (see _kernel); the
        # probability reconstruction exp(s - lse) matches the forward
        # bit-for-bit because both compute s with the same-dtype dot
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, 0]
        delta = delta_ref[0][:, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 0)
        k_pos = k_block * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 1)
        rel = k_pos - q_pos
        kv = kv_ref[0][:, 0]
        mask = (rel >= start) & (rel <= end) & (kv[None, :] > 0)
        lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
        a = jnp.where(mask, jnp.exp(s - lse_safe[:, None]), 0.0)
        a = jnp.where(jnp.isfinite(lse)[:, None], a, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref[0], b, q_pos, k_pos, dropout_rate)
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = a * (dp - delta[:, None])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                kv_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, start, end,
                scale, block_q, n_fwd, n_qblocks, dropout_rate):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    qj = pl.program_id(2)

    @pl.when(qj == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # queries whose band [q+start, q+end] covers this k block:
    # q in [k - end, k - start]  ->  q blocks from ki - n_fwd upward
    q_block = ki - n_fwd + qj
    in_range = (q_block >= 0) & (q_block < n_qblocks)

    @pl.when(in_range)
    def _accumulate():
        # dots in the input dtype, f32 accumulation (see _kernel)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, 0]
        delta = delta_ref[0][:, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        q_pos = q_block * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 0)
        k_pos = ki * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_q), 1)
        rel = k_pos - q_pos
        kv = kv_ref[0][:, 0]
        mask = (rel >= start) & (rel <= end) & (kv[None, :] > 0)
        lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
        a = jnp.where(mask, jnp.exp(s - lse_safe[:, None]), 0.0)
        a = jnp.where(jnp.isfinite(lse)[:, None], a, 0.0)

        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref[0], b, q_pos, k_pos, dropout_rate)
            a_drop = jnp.where(keep, a, 0.0) / (1.0 - dropout_rate)
        else:
            keep = None
            a_drop = a
        # dv += (A∘D)^T dO
        dv_acc[:] += jax.lax.dot_general(
            a_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = a * (dp - delta[:, None])
        # dk += dS^T q * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(qj == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _band_blocks(s, start, end, block_q):
    n_qblocks = s // block_q
    n_back = -(-(-start) // block_q) if start < 0 else 0
    n_fwd = -(-end // block_q) if end > 0 else 0
    return n_qblocks, n_back, n_fwd


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(5, 6, 7, 8, 9, 10),
)
def banded_attention_trainable(q, k, v, key_valid, seed, start, end, scale,
                               dropout_rate=0.0, block_q=128,
                               interpret=False):
    """Differentiable flash banded attention with attention-prob dropout.

    Semantics: ``dropout(softmax(banded_mask(q kᵀ scale))) @ v`` — the
    reference's ScaledDotProductAttention with its attn dropout
    (Modules.py:75-97) in blockwise form.  ``seed`` is an int32 scalar
    array; the dropout mask is a pure function of (seed, block indices), so
    forward and backward regenerate it identically without materializing
    [S, S] anything."""
    out, _ = _trainable_fwd(q, k, v, key_valid, seed, start, end, scale,
                            dropout_rate, block_q, interpret)
    return out


def _trainable_fwd(q, k, v, key_valid, seed, start, end, scale,
                   dropout_rate, block_q, interpret):
    bh, s, d = q.shape
    dv = v.shape[-1]
    if s % block_q != 0:
        raise ValueError(f"S={s} not a multiple of block_q={block_q}")
    n_qblocks, n_back, n_fwd = _band_blocks(s, start, end, block_q)
    n_visit = n_back + n_fwd + 1
    kernel = functools.partial(
        _fwd_kernel, start=start, end=end, scale=scale, block_q=block_q,
        n_back=n_back, n_kblocks=n_qblocks, dropout_rate=dropout_rate,
    )

    def k_index(b, qi, kj):
        return (b, jnp.clip(qi - n_back + kj, 0, n_qblocks - 1), 0)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_qblocks, n_visit),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, block_q, d), k_index),
            pl.BlockSpec((1, block_q, dv), k_index),
            pl.BlockSpec((1, block_q, 1), k_index),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, kj: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, dv), q.dtype),
            jax.ShapeDtypeStruct((bh, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), q, k, v,
      key_valid.reshape(bh, s, 1))
    return out, (q, k, v, key_valid, seed, out, lse)


def _trainable_bwd(start, end, scale, dropout_rate, block_q, interpret,
                   res, dout):
    q, k, v, key_valid, seed, out, lse = res
    bh, s, d = q.shape
    dv = v.shape[-1]
    n_qblocks, n_back, n_fwd = _band_blocks(s, start, end, block_q)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kv3 = key_valid.reshape(bh, s, 1)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)

    def q_fixed(b, qi, kj):
        return (b, qi, 0)

    def k_index(b, qi, kj):
        return (b, jnp.clip(qi - n_back + kj, 0, n_qblocks - 1), 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, start=start, end=end, scale=scale, block_q=block_q,
            n_back=n_back, n_kblocks=n_qblocks, dropout_rate=dropout_rate,
        ),
        grid=(bh, n_qblocks, n_back + n_fwd + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), q_fixed),
            pl.BlockSpec((1, block_q, d), k_index),
            pl.BlockSpec((1, block_q, dv), q_fixed),     # dout
            pl.BlockSpec((1, block_q, 1), q_fixed),      # lse
            pl.BlockSpec((1, block_q, 1), q_fixed),      # delta
            pl.BlockSpec((1, block_q, 1), k_index),      # key_valid
            pl.BlockSpec((1, block_q, dv), k_index),     # v
        ],
        out_specs=pl.BlockSpec((1, block_q, d), q_fixed),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(seed_arr, q, k, dout, lse, delta, kv3, v)

    def k_fixed(b, ki, qj):
        return (b, ki, 0)

    def q_index(b, ki, qj):
        return (b, jnp.clip(ki - n_fwd + qj, 0, n_qblocks - 1), 0)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, start=start, end=end, scale=scale, block_q=block_q,
            n_fwd=n_fwd, n_qblocks=n_qblocks, dropout_rate=dropout_rate,
        ),
        grid=(bh, n_qblocks, n_back + n_fwd + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), q_index),      # q
            pl.BlockSpec((1, block_q, d), k_fixed),      # k
            pl.BlockSpec((1, block_q, dv), k_fixed),     # v
            pl.BlockSpec((1, block_q, dv), q_index),     # dout
            pl.BlockSpec((1, block_q, 1), q_index),      # lse
            pl.BlockSpec((1, block_q, 1), q_index),      # delta
            pl.BlockSpec((1, block_q, 1), k_fixed),      # key_valid
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), k_fixed),
            pl.BlockSpec((1, block_q, dv), k_fixed),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, q, k, v, dout, lse, delta, kv3)

    return dq, dk, dv, None, None


def _trainable_fwd_rule(q, k, v, key_valid, seed, start, end, scale,
                        dropout_rate, block_q, interpret):
    return _trainable_fwd(q, k, v, key_valid, seed, start, end, scale,
                          dropout_rate, block_q, interpret)


banded_attention_trainable.defvjp(_trainable_fwd_rule, _trainable_bwd)


def banded_attention(q, k, v, key_valid, *, start, end, scale,
                     block_q=128, force=None):
    """Dispatch: Pallas kernel on TPU when the sequence is long enough for
    the band to beat XLA's fused full attention (measured crossover ~1k
    frames on v5e: 2.5x at S=2048), XLA oracle otherwise.
    ``force`` ∈ {None, 'pallas', 'reference'}."""
    s = q.shape[1]
    use_pallas = (
        force == "pallas"
        or (
            force is None
            and jax.default_backend() == "tpu"
            and s % block_q == 0
            and s >= 1024
        )
    )
    if use_pallas:
        return banded_attention_pallas(
            q, k, v, key_valid, start=start, end=end, scale=scale,
            block_q=block_q,
        )
    return banded_attention_reference(q, k, v, key_valid, start, end, scale)


def banded_attention_blocked(q, k, v, key_valid, *, start, end, scale,
                             dropout_rate=0.0, rng=None, block_q=128):
    """Pure-XLA blockwise banded attention (differentiable for free).

    Same semantics as :func:`banded_attention_reference` (masked softmax
    with fully-masked rows re-zeroed, Modules.py:86-90) plus optional
    attention-prob dropout, but computed per query block against only the
    key blocks overlapping the band — scores are [BH, nb, block_q, W]
    with W = (n_back+1+n_fwd)·block_q instead of [BH, S, S].  For the
    recipe band (-100, 0) at S=512 that is 2x fewer score FLOPs and ~4x
    less score traffic than the masked full-attention path, with none of
    the Pallas kernel's launch overhead — the right tool for moderate S
    where flash-style blocking loses (BASELINE.md: 0.54x at S=512).

    ``q``/``k``/``v`` are [BH, S, D] with S % block_q == 0 (pad with
    key_valid=0).  Softmax runs in f32; probs are cast back to q.dtype
    before dropout so the largest tensors move at compute precision.
    """
    bh, s, d = q.shape
    if s % block_q != 0:
        raise ValueError(f"S={s} not a multiple of block_q={block_q}")
    nb, n_back, n_fwd = _band_blocks(s, start, end, block_q)
    w = (n_back + 1 + n_fwd) * block_q

    pad = ((0, 0), (n_back * block_q, n_fwd * block_q), (0, 0))
    k_pad = jnp.pad(k, pad)
    v_pad = jnp.pad(v, pad)
    valid_pad = jnp.pad(key_valid, (pad[0], pad[1]))

    # [BH, nb, W, D] sliding key/value windows (static slices, cheap: K/V
    # are band-sized already)
    k_win = jnp.stack([k_pad[:, j * block_q : j * block_q + w] for j in range(nb)], axis=1)
    v_win = jnp.stack([v_pad[:, j * block_q : j * block_q + w] for j in range(nb)], axis=1)
    valid_win = jnp.stack(
        [valid_pad[:, j * block_q : j * block_q + w] for j in range(nb)], axis=1
    )  # [BH, nb, W]

    # relative offset of window column kj from query row qi is constant
    # across blocks: rel = kj - n_back*block_q - qi
    qi = jnp.arange(block_q)[:, None]
    kj = jnp.arange(w)[None, :]
    rel = kj - n_back * block_q - qi
    band = (rel >= start) & (rel <= end)  # [block_q, W]

    q_blk = q.reshape(bh, nb, block_q, d)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q_blk, k_win) * scale
    allowed = band[None, None] & (valid_win[:, :, None, :] > 0)
    if q.dtype == jnp.bfloat16:
        # low-traffic softmax for the bf16 path: exp on bf16 (the [BH, nb,
        # block_q, W] tensors stay at 2 bytes), row max/sum reduced in f32.
        # Masked cells get exp(-inf) = 0 so the re-zero rule is automatic;
        # fully-masked rows divide by the epsilon and stay all-zero.
        neg = jnp.float32(jnp.finfo(jnp.float32).min)
        lf = jnp.where(allowed, logits.astype(jnp.float32), neg)
        m = jax.lax.stop_gradient(jnp.max(lf, axis=-1, keepdims=True))
        m = jnp.maximum(m, neg / 2)  # fully-masked rows: avoid -inf - -inf
        e = jnp.exp((lf - m).astype(jnp.bfloat16).astype(jnp.float32)
                    ).astype(jnp.bfloat16)
        ssum = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        probs = (e / jnp.maximum(ssum, 1e-30).astype(jnp.bfloat16)
                 ).astype(q.dtype)
    else:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(allowed, logits.astype(jnp.float32), neg)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(allowed, probs, 0.0).astype(q.dtype)  # re-zero
    if dropout_rate > 0.0 and rng is not None:
        # same 8-bit quantized-threshold draw as models.common.dropout
        q8 = round((1.0 - dropout_rate) * 256)
        if q8 < 256:
            q8 = max(q8, 1)
            bits = jax.random.bits(rng, probs.shape, dtype=jnp.uint8)
            probs = jnp.where(bits < jnp.uint8(q8),
                              probs * (256.0 / q8), 0).astype(q.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, v_win)
    return out.reshape(bh, s, v.shape[-1])
