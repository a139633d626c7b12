"""Fused dropout as a Pallas TPU kernel.

Dropout dominated the recipe train step (SURVEY hot loop #1 territory:
eight dropout sites over [B, 500, 256] activations at rate 0.35).  This
kernel draws mask bits from the on-core PRNG and applies keep/scale in one
VMEM pass — no materialized random tensor in HBM, no separate mask/select
ops.  The backward pass re-seeds the same PRNG stream and regenerates the
identical mask (dropout's VJP is the same masked scaling applied to the
cotangent), so nothing is saved between passes.

Dispatch: TPU → kernel; other backends → the plain jax.random formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, x_ref, out_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    # keep when bits >= rate·2^32 (uniform uint32 threshold test)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    scale = jnp.float32(1.0 / (1.0 - rate))
    out_ref[:] = jnp.where(keep, x_ref[:] * scale, 0.0).astype(out_ref.dtype)


def _run_kernel(x2d, seed, rate, block_rows):
    n, d = x2d.shape
    grid = (pl.cdiv(n, block_rows),)
    return pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_dropout_2d(x2d, seed, rate):
    return _run_kernel(x2d, seed, rate, block_rows=min(512, x2d.shape[0]))


def _fwd(x2d, seed, rate):
    return _fused_dropout_2d(x2d, seed, rate), seed


def _bwd(rate, seed, g):
    # same seed → same mask: the cotangent goes through the same kernel
    return _fused_dropout_2d(g, seed, rate), None


_fused_dropout_2d.defvjp(_fwd, _bwd)


def fused_dropout(x, rate, rng, train):
    """Drop-in replacement for models.common.dropout.  On TPU the mask is
    generated in-kernel from a seed derived from ``rng``; elsewhere falls
    back to the jax.random path."""
    if not train or rate == 0.0 or rng is None:
        return x
    if jax.default_backend() != "tpu":
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    seed = jax.random.randint(
        rng, (1,), minval=jnp.iinfo(jnp.int32).min,
        maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
    )
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_dropout_2d(x2d, seed, float(rate))
    return out.reshape(shape)
