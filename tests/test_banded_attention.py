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


# ---------------------------------------------------------------------------
# trainable kernel: custom VJP + in-kernel attention-prob dropout
# ---------------------------------------------------------------------------

from pytorch_kaldi_asr_tpu.ops.banded_attention import (  # noqa: E402
    banded_attention_trainable,
)


def _tr(q, k, v, valid, seed, start=-100, end=0, scale=0.125, rate=0.0):
    return banded_attention_trainable(q, k, v, valid, seed, start, end,
                                      scale, rate, 128, True)


@pytest.mark.parametrize("start,end", [(-100, 0), (-10, 0), (-64, 32)])
def test_trainable_forward_matches_oracle(start, end):
    q, k, v, valid = _inputs(pad_tail=40)
    out = _tr(q, k, v, valid, jnp.int32(3), start, end)
    ref = banded_attention_reference(q, k, v, valid, start, end, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_trainable_grads_match_oracle_autodiff():
    q, k, v, valid = _inputs(bh=2, s=256, d=16, pad_tail=56)
    w = jnp.asarray(
        np.random.default_rng(5).normal(size=q.shape).astype(np.float32))

    def loss_tr(q, k, v):
        return (_tr(q, k, v, valid, jnp.int32(3)) * w).sum()

    def loss_ref(q, k, v):
        return (banded_attention_reference(q, k, v, valid, -100, 0, 0.125)
                * w).sum()

    g_tr = jax.grad(loss_tr, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_tr, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name} mismatch")


def test_kernels_support_dv_not_equal_dk():
    # d_k and d_v are independent config fields (reference run.sh:84-85
    # passes -d_k and -d_v separately); the kernels must size v/out/do
    # blocks from d_v, not q's head dim
    rng = np.random.default_rng(11)
    bh, s, dk, dv = 2, 256, 16, 8
    q = jnp.asarray(rng.normal(size=(bh, s, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bh, s, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, s, dv)).astype(np.float32))
    valid = np.ones((bh, s), np.int32)
    valid[:, -40:] = 0
    valid = jnp.asarray(valid)
    ref = banded_attention_reference(q, k, v, valid, -100, 0, 0.125)
    assert ref.shape == (bh, s, dv)

    out_inf = banded_attention_pallas(
        q, k, v, valid, start=-100, end=0, scale=0.125, block_q=128,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_inf), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    out_tr = _tr(q, k, v, valid, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(out_tr), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    w = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    g_tr = jax.grad(
        lambda q, k, v: (_tr(q, k, v, valid, jnp.int32(3)) * w).sum(),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (banded_attention_reference(
            q, k, v, valid, -100, 0, 0.125) * w).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_tr, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name} mismatch (dv != dk)")


def test_trainable_bf16_dots_match_f32_oracle():
    # the kernels keep bf16 inputs in bf16 for the MXU dots (f32
    # accumulation); forward and grads must track the f32 oracle within
    # bf16 tolerance
    q, k, v, valid = _inputs(bh=2, s=256, d=16, pad_tail=40)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = _tr(qb, kb, vb, valid, jnp.int32(3))
    assert out.dtype == jnp.bfloat16
    ref = banded_attention_reference(q, k, v, valid, -100, 0, 0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)

    w = jnp.asarray(
        np.random.default_rng(5).normal(size=q.shape).astype(np.float32))

    def loss_tr(q, k, v):
        return (_tr(q, k, v, valid, jnp.int32(3)).astype(jnp.float32)
                * w).sum()

    def loss_ref(q, k, v):
        return (banded_attention_reference(q, k, v, valid, -100, 0, 0.125)
                * w).sum()

    g_tr = jax.grad(loss_tr, argnums=(0, 1, 2))(qb, kb, vb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_tr, g_ref):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / scale, np.asarray(b) / scale,
            atol=0.06, err_msg=f"d{name} mismatch (bf16)")


def test_trainable_dropout_deterministic_and_unbiased():
    q, k, v, valid = _inputs(bh=2, s=256, d=16)
    out1 = _tr(q, k, v, valid, jnp.int32(11), rate=0.3)
    out2 = _tr(q, k, v, valid, jnp.int32(11), rate=0.3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = _tr(q, k, v, valid, jnp.int32(12), rate=0.3)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # expectation over seeds approximates the no-dropout output
    outs = [np.asarray(_tr(q, k, v, valid, jnp.int32(s), rate=0.3))
            for s in range(20)]
    mean = np.mean(outs, axis=0)
    base = np.asarray(_tr(q, k, v, valid, jnp.int32(0), rate=0.0))
    err = np.abs(mean - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.2, err


def test_trainable_dropout_grad_directional_derivative():
    """With a fixed seed the dropout mask is deterministic, so the VJP must
    match a central finite difference along random directions."""
    rng = np.random.default_rng(7)
    q, k, v, valid = _inputs(bh=1, s=128, d=8, seed=2)
    w = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss(q):
        return (_tr(q, k, v, valid, jnp.int32(5), rate=0.25) * w).sum()

    g = jax.grad(loss)(q)
    for i in range(2):
        d = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
        eps = 1e-2
        fd = (float(loss(q + eps * d)) - float(loss(q - eps * d))) / (2 * eps)
        an = float((g * d).sum())
        assert abs(fd - an) < 3e-2 * max(abs(fd), abs(an), 1.0), (fd, an)


def test_trainable_fully_masked_rows_zero_grad():
    q, k, v, valid = _inputs(bh=1, s=128, d=8)
    valid = valid.at[0, :].set(0)  # everything masked
    out = _tr(q, k, v, valid, jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    g = jax.grad(lambda q: _tr(q, k, v, valid, jnp.int32(1)).sum())(q)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


# ---------------------------------------------------------------------------
# blocked-XLA variant (the moderate-S path used by the Conformer MHSA)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("start,end", [(-100, 0), (-10, 0), (-64, 32),
                                       (-300, 0)])
def test_blocked_matches_oracle(start, end):
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
    )

    q, k, v, valid = _inputs()
    scale = 1.0 / np.sqrt(256.0)
    ours = banded_attention_blocked(q, k, v, valid, start=start, end=end,
                                    scale=scale)
    oracle = banded_attention_reference(q, k, v, valid, start, end, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               atol=2e-5)


def test_blocked_padding_and_masked_rows():
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
    )

    q, k, v, valid = _inputs(bh=2, s=256, d=16, pad_tail=128)
    ours = banded_attention_blocked(q, k, v, valid, start=-10, end=0,
                                    scale=0.1)
    oracle = banded_attention_reference(q, k, v, valid, -10, 0, 0.1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ours[:, 140:, :]), 0.0)


def test_blocked_grads_match_oracle_autodiff():
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
    )

    q, k, v, valid = _inputs(bh=2, s=256, d=16, seed=3, pad_tail=17)

    def loss_blocked(q, k, v):
        out = banded_attention_blocked(q, k, v, valid, start=-64, end=0,
                                       scale=0.2)
        return jnp.sum(out * out)

    def loss_oracle(q, k, v):
        out = banded_attention_reference(q, k, v, valid, -64, 0, 0.2)
        return jnp.sum(out * out)

    g1 = jax.grad(loss_blocked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_blocked_dropout_unbiased():
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
    )

    q, k, v, valid = _inputs(bh=2, s=128, d=16, seed=5)
    base = banded_attention_blocked(q, k, v, valid, start=-32, end=0,
                                    scale=0.2)
    acc = np.zeros(np.asarray(base).shape, np.float64)
    n = 200
    for i in range(n):
        out = banded_attention_blocked(
            q, k, v, valid, start=-32, end=0, scale=0.2,
            dropout_rate=0.35, rng=jax.random.PRNGKey(i),
        )
        acc += np.asarray(out, np.float64)
    err = np.abs(acc / n - np.asarray(base))
    # 200 Monte-Carlo draws: bound the mean deviation tightly and the
    # worst element loosely (early rows have tiny in-band support and
    # correspondingly high estimator variance)
    assert err.mean() < 0.05
    np.testing.assert_allclose(acc / n, np.asarray(base), atol=0.3)


def test_blocked_bf16_low_traffic_softmax():
    """The bf16 input path uses the low-traffic softmax (bf16 exp, f32
    row sums): it must track the f32 oracle within bf16 tolerance and
    keep fully-masked rows exactly zero."""
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
        banded_attention_reference,
    )

    rng = np.random.default_rng(5)
    bh, s, d = 4, 128, 16
    q = rng.normal(size=(bh, s, d)).astype(np.float32)
    k = rng.normal(size=(bh, s, d)).astype(np.float32)
    v = rng.normal(size=(bh, s, d)).astype(np.float32)
    valid = np.ones((bh, s), np.int32)
    valid[1, 64:] = 0
    valid[2, :] = 0  # every key invalid -> all rows fully masked
    ref = banded_attention_reference(q, k, v, valid, -16, 0, 0.25)
    got = banded_attention_blocked(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(valid),
        start=-16, end=0, scale=0.25, block_q=32,
    ).astype(jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.06)
    # fully-masked rows are exactly zero (the re-zero rule)
    assert np.abs(np.asarray(got)[2]).max() == 0.0

    # gradients flow and are finite on the bf16 path
    def loss(q16, k16, v16):
        out = banded_attention_blocked(q16, k16, v16, jnp.asarray(valid),
                                       start=-16, end=0, scale=0.25,
                                       block_q=32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16))
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()
    assert max(float(jnp.abs(g).max()) for g in grads) > 0
