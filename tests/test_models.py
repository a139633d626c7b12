"""Unit tests of model building blocks against numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.models import common
from pytorch_kaldi_asr_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
    transformer_forward,
    encode,
    decode_logits,
)


def small_cfg(**kw):
    base = dict(
        src_dim=13,
        vocab_size=11,
        encoder_max_len=32,
        decoder_max_len=16,
        decoder_sub_sequence=(-3, 0),
        en_layers=2,
        de_layers=2,
        n_head=2,
        en_d_model=32,
        de_d_model=16,
        d_k=8,
        d_v=8,
        en_dropout=0.0,
        de_dropout=0.0,
        tdnn_contexts=((-1, 0, 1), (-3, 0, 3)),
    )
    base.update(kw)
    return TransformerConfig(**base)


def test_position_table_row0_zero_and_sinusoid():
    table = np.asarray(common.position_encoding_table(8, 6))
    assert (table[0] == 0).all()
    # row 1, even dims are sin(1/10000^(2i/6))
    expect = np.sin(1.0 / np.power(10000.0, 0.0))
    np.testing.assert_allclose(table[1, 0], expect, rtol=1e-6)
    np.testing.assert_allclose(table[1, 1], np.cos(1.0), rtol=1e-6)


def test_banded_mask_window():
    blocked = np.asarray(common.banded_attn_mask(5, -2, 0))
    # query 3 may attend keys 1,2,3
    assert not blocked[3, 1] and not blocked[3, 3]
    assert blocked[3, 0] and blocked[3, 4]
    # query 0 attends only key 0
    assert not blocked[0, 0] and blocked[0, 1]


def test_padding_mask_blocks_pad_keys():
    mask_k = jnp.array([[1, 1, 0]], dtype=jnp.uint8)
    mask_q = jnp.array([[1, 1, 1]], dtype=jnp.uint8)
    blocked = np.asarray(common.padding_attn_mask(mask_q, mask_k))
    assert blocked.shape == (1, 3, 3)
    assert (blocked[0, :, 2] == True).all()  # noqa: E712
    assert (blocked[0, :, :2] == False).all()  # noqa: E712


def test_fold_seq_and_mask():
    seq = jnp.arange(2 * 6 * 2, dtype=jnp.float32).reshape(2, 6, 2)
    mask = jnp.ones((2, 6), dtype=jnp.uint8).at[0, 4:].set(0)
    folded, fmask = common.fold_seq_and_mask(seq, mask, 2)
    assert folded.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(folded[0, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(fmask[0]), [1, 1, 0])


def test_layer_norm_unbiased_std_and_skip():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 3, 8)).astype(np.float32)
    gamma, beta = np.ones(8, np.float32), np.zeros(8, np.float32)
    out = np.asarray(common.layer_norm(jnp.asarray(z), gamma, beta))
    mu = z.mean(-1, keepdims=True)
    sigma = z.std(-1, ddof=1, keepdims=True)
    np.testing.assert_allclose(out, (z - mu) / (sigma + 1e-3), rtol=1e-5)
    # skip when seq axis is length 1
    z1 = jnp.asarray(z[:, :1])
    np.testing.assert_array_equal(
        np.asarray(common.layer_norm(z1, gamma, beta)), np.asarray(z1)
    )


def test_splice_frames_zero_pad_and_order():
    x = jnp.arange(1, 5, dtype=jnp.float32).reshape(1, 4, 1)
    out = np.asarray(common.splice_frames(x, (-1, 0, 1)))
    assert out.shape == (1, 4, 3)
    np.testing.assert_array_equal(out[0, 0], [0, 1, 2])  # left edge zero-padded
    np.testing.assert_array_equal(out[0, 3], [3, 4, 0])  # right edge
    np.testing.assert_array_equal(out[0, 1], [1, 2, 3])


def test_forward_shapes_and_finite():
    cfg = small_cfg()
    rng = jax.random.PRNGKey(0)
    lda_in = cfg.src_dim * len(cfg.lda_context)
    lda_mat = np.random.default_rng(0).normal(size=(20, lda_in + 1)) * 0.1
    params = init_transformer(rng, cfg, lda_mat)
    src = np.random.default_rng(1).normal(size=(3, 12, 13)).astype(np.float32)
    src_mask = np.ones((3, 12), np.uint8)
    src_mask[1, 8:] = 0
    tgt = np.array([[2, 4, 5, 3], [2, 6, 3, 0], [2, 3, 0, 0]], np.int32)
    tgt_mask = (tgt != 0).astype(np.uint8)
    logits = transformer_forward(
        params, cfg, jnp.asarray(src), jnp.asarray(src_mask),
        jnp.asarray(tgt), jnp.asarray(tgt_mask),
    )
    assert logits.shape == (3, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_dropout_active_only_in_train():
    cfg = small_cfg(en_dropout=0.5, de_dropout=0.5)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    src = np.random.default_rng(1).normal(size=(2, 8, 13)).astype(np.float32)
    src_mask = np.ones((2, 8), np.uint8)
    tgt = np.array([[2, 4, 3], [2, 5, 3]], np.int32)
    tgt_mask = np.ones_like(tgt, np.uint8)
    args = (jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(tgt),
            jnp.asarray(tgt_mask))
    eval1 = transformer_forward(params, cfg, *args, train=False)
    eval2 = transformer_forward(params, cfg, *args, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1 = transformer_forward(params, cfg, *args, train=True,
                              rng=jax.random.PRNGKey(1))
    tr2 = transformer_forward(params, cfg, *args, train=True,
                              rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(tr1) - np.asarray(tr2)).max() > 1e-6


def test_fully_masked_attention_row_is_zero_not_nan():
    """An utterance whose band+padding leaves a query with no keys must not
    produce NaNs (reference Modules.py:86-90 re-zero trick)."""
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    src = np.zeros((1, 6, 13), np.float32)
    src_mask = np.zeros((1, 6), np.uint8)  # ALL src frames padding
    tgt = np.array([[2, 4, 3]], np.int32)
    tgt_mask = np.ones_like(tgt, np.uint8)
    logits = transformer_forward(
        params, cfg, jnp.asarray(src), jnp.asarray(src_mask),
        jnp.asarray(tgt), jnp.asarray(tgt_mask),
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_init_compat_torch_matches_reference_distributions():
    """init_compat='torch' reproduces the reference's init where it differs
    from native: FFN convs keep torch's kaiming-uniform(a=sqrt(5)) default
    (SubLayers.py:75-76 — no explicit re-init) and Linear/Conv biases are
    U(+-1/sqrt(fan_in)) instead of zero.  Verified against torch itself."""
    torch = pytest.importorskip("torch")
    cfg = small_cfg(de_d_model=64, d_k=16, d_v=16, de_layers=1)
    params = init_transformer(jax.random.PRNGKey(0), cfg, None,
                              init_compat="torch")
    ffn = params["decoder"]["layers"][0]["ffn"]
    mha = params["decoder"]["layers"][0]["slf"]
    d = cfg.de_d_model

    # torch oracle: Conv1d(d, d, 1) default init, many draws for stable stats
    w = torch.nn.Conv1d(d, d, 1).weight.detach().numpy()
    bound = 1.0 / np.sqrt(d)
    assert np.abs(w).max() <= bound + 1e-6

    for leaf, fan_in in ((ffn["w1"]["w"], d), (ffn["w2"]["w"], d),
                         (ffn["w1"]["b"], d), (ffn["w2"]["b"], d),
                         (mha["proj"]["b"], cfg.n_head * cfg.d_v)):
        arr = np.asarray(leaf)
        b = 1.0 / np.sqrt(fan_in)
        assert np.abs(arr).max() <= b, "exceeds torch-default bound"
        if arr.size >= d * d:  # weights: check it fills the range (uniform)
            assert np.abs(arr).max() > 0.9 * b
            assert abs(arr.std() - b / np.sqrt(3)) < 0.05 * b

    # TDNN biases are torch-default too
    tdnn0 = params["encoder"]["tdnn"][0]
    fan = cfg.en_d_model * 3
    assert np.abs(np.asarray(tdnn0["b"])).max() <= 1.0 / np.sqrt(fan)
    assert np.asarray(tdnn0["b"]).std() > 0

    # native mode is unchanged: zero biases, xavier FFN
    nat = init_transformer(jax.random.PRNGKey(0), cfg, None)
    assert np.all(np.asarray(nat["decoder"]["layers"][0]["ffn"]["w1"]["b"]) == 0)
    nat_std = np.asarray(nat["decoder"]["layers"][0]["ffn"]["w1"]["w"]).std()
    assert abs(nat_std - np.sqrt(2.0 / (d + d))) < 0.1 * nat_std
