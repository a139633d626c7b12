"""Fused dropout op tests.

The in-kernel PRNG (pltpu.prng_*) has no CPU interpret-mode support, so the
kernel body itself is exercised on real TPU only (skipped here); the CPU
fallback path and the dispatch contract are tested everywhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.ops import fused_dropout as fd


def test_fallback_path_on_cpu():
    rng = jax.random.key(0)
    x = jnp.ones((64, 32), jnp.float32)
    out = fd.fused_dropout(x, 0.4, rng, True)
    assert out.shape == x.shape
    kept = np.asarray(out) != 0
    np.testing.assert_allclose(np.asarray(out)[kept], 1 / 0.6, rtol=1e-5)
    assert abs((~kept).mean() - 0.4) < 0.12
    # eval mode identity
    np.testing.assert_array_equal(
        np.asarray(fd.fused_dropout(x, 0.4, rng, False)), np.asarray(x)
    )


def test_rate_zero_and_no_rng_identity():
    x = jnp.ones((8, 8))
    np.testing.assert_array_equal(
        np.asarray(fd.fused_dropout(x, 0.0, jax.random.key(0), True)),
        np.asarray(x),
    )
    np.testing.assert_array_equal(
        np.asarray(fd.fused_dropout(x, 0.5, None, True)), np.asarray(x)
    )


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG needs real TPU")
def test_kernel_statistics_on_tpu():
    x = jnp.ones((512, 128), jnp.float32)
    rng = jax.random.key(3)
    out = np.asarray(fd.fused_dropout(x, 0.35, rng, True))
    kept = out != 0
    np.testing.assert_allclose(out[kept], 1 / 0.65, rtol=1e-5)
    assert abs((~kept).mean() - 0.35) < 0.03
    # determinism per rng; variation across rngs
    out2 = np.asarray(fd.fused_dropout(x, 0.35, rng, True))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(fd.fused_dropout(x, 0.35, jax.random.key(4), True))
    assert (out != out3).any()
    # gradient regenerates the same mask
    g = jax.grad(lambda y: jnp.sum(fd.fused_dropout(y, 0.35, rng, True)))(x)
    np.testing.assert_array_equal(np.asarray(g) != 0, kept)
