"""Pallas banded-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.ops.banded_attention import (
    banded_attention_pallas,
    banded_attention_reference,
)


def _inputs(bh=4, s=256, d=32, seed=0, pad_tail=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(bh, s, d)).astype(np.float32)
    k = rng.normal(size=(bh, s, d)).astype(np.float32)
    v = rng.normal(size=(bh, s, d)).astype(np.float32)
    valid = np.ones((bh, s), np.int32)
    if pad_tail:
        valid[:, -pad_tail:] = 0
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(valid))


@pytest.mark.parametrize("start,end", [(-100, 0), (-10, 0), (-64, 32),
                                       (-300, 0)])
def test_kernel_matches_oracle(start, end):
    q, k, v, valid = _inputs()
    scale = 1.0 / np.sqrt(256.0)
    ours = banded_attention_pallas(
        q, k, v, valid, start=start, end=end, scale=scale, block_q=128,
        interpret=True,
    )
    oracle = banded_attention_reference(q, k, v, valid, start, end, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               atol=2e-5)


def test_kernel_handles_padding_and_fully_masked_rows():
    # pad most of the tail: queries there have no valid keys in band
    q, k, v, valid = _inputs(bh=2, s=256, d=16, pad_tail=128)
    ours = banded_attention_pallas(
        q, k, v, valid, start=-10, end=0, scale=0.1, block_q=128,
        interpret=True,
    )
    oracle = banded_attention_reference(q, k, v, valid, -10, 0, 0.1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               atol=2e-5)
    # queries past valid keys by more than the window: output exactly zero
    np.testing.assert_array_equal(np.asarray(ours[:, 140:, :]), 0.0)


def test_kernel_rejects_bad_shapes():
    q, k, v, valid = _inputs(s=200)
    with pytest.raises(ValueError):
        banded_attention_pallas(q, k, v, valid, start=-10, end=0, scale=1.0,
                                block_q=128, interpret=True)
