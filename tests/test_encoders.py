"""Tests for the encoder zoo (banded/blstm/conformer/tdnnf), streaming
chunked inference exactness, and the frame-level AM head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.models.transformer import (
    encode,
    init_transformer,
    transformer_forward,
)
from pytorch_kaldi_asr_tpu.models.encoders import semi_orthogonal_step
from pytorch_kaldi_asr_tpu.models.streaming import (
    StreamingBandedEncoder,
    StreamingTDNN,
    receptive_field,
)
from pytorch_kaldi_asr_tpu.models import am
from tests.test_models import small_cfg

ENCODER_TYPES = ["banded", "blstm", "conformer", "tdnnf"]


def _cfg(encoder_type, **kw):
    return small_cfg(
        encoder_type=encoder_type,
        encoder_sub_sequence=(-8, 0),
        conformer_kernel=7,
        tdnnf_bottleneck=8,
        **kw,
    )


def _batch(cfg, b=2, s=12, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(b, s, cfg.src_dim)).astype(np.float32)
    mask = np.ones((b, s), np.uint8)
    mask[1, 9:] = 0
    return jnp.asarray(src), jnp.asarray(mask)


@pytest.mark.parametrize("enc_type", ENCODER_TYPES)
def test_encoder_forward_and_full_model(enc_type):
    cfg = _cfg(enc_type)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    src, mask = _batch(cfg)
    out, out_mask = encode(params, cfg, src, mask)
    assert out.shape == (2, 12, cfg.en_d_model)
    assert np.isfinite(np.asarray(out)).all()
    tgt = jnp.asarray(np.array([[2, 4, 3], [2, 5, 3]], np.int32))
    tgt_mask = jnp.ones_like(tgt, dtype=jnp.uint8)
    logits = transformer_forward(params, cfg, src, mask, tgt, tgt_mask)
    assert logits.shape == (2, 3, cfg.vocab_size)


@pytest.mark.parametrize("enc_type", ENCODER_TYPES)
def test_encoder_gradients_flow(enc_type):
    cfg = _cfg(enc_type)
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    src, mask = _batch(cfg)

    def loss(p):
        out, _ = encode(p, cfg, src, mask)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = [
        float(jnp.abs(g).max())
        for g in jax.tree_util.tree_leaves(grads["encoder"])
    ]
    assert max(leaves) > 0


@pytest.mark.parametrize("enc_type", ["blstm", "conformer"])
def test_pad_invariance(enc_type):
    """Garbage in padded frames must not change outputs at valid frames."""
    cfg = _cfg(enc_type)
    params = init_transformer(jax.random.PRNGKey(2), cfg)
    src, mask = _batch(cfg)
    out1, _ = encode(params, cfg, src, mask)
    src2 = np.asarray(src).copy()
    src2[1, 9:] = 1e3  # scribble on padding
    out2, _ = encode(params, cfg, jnp.asarray(src2), mask)
    np.testing.assert_allclose(
        np.asarray(out1[1, :9]), np.asarray(out2[1, :9]), atol=1e-4
    )


def test_semi_orthogonal_step_reduces_deviation():
    cfg = _cfg("tdnnf")
    params = init_transformer(jax.random.PRNGKey(3), cfg)

    def deviation(p):
        total = 0.0
        for layer in p["encoder"]["layers"]:
            m = np.asarray(layer["factor"])
            w = m.T if m.shape[0] < m.shape[1] else m
            gram = w.T @ w
            scale = np.trace(gram @ gram) / np.trace(gram)
            total += float(
                np.linalg.norm(gram - scale * np.eye(gram.shape[0]))
            )
        return total

    before = deviation(params)
    p = params
    for _ in range(12):
        p = semi_orthogonal_step(p)
    after = deviation(p)
    assert after < before * 0.5, (before, after)


def test_streaming_tdnn_matches_offline():
    cfg = small_cfg()  # flagship tdnn encoder
    params = init_transformer(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    src = rng.normal(size=(2, 30, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((2, 30), jnp.uint8)
    offline, _ = encode(params, cfg, jnp.asarray(src), mask)

    stream = StreamingTDNN(params, cfg, encode)
    outs = []
    for start in range(0, 30, 7):
        emit = stream.push(src[:, start : start + 7])
        if emit is not None:
            outs.append(emit)
    tail = stream.flush()
    if tail is not None:
        outs.append(tail)
    got = np.concatenate(outs, axis=1)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, np.asarray(offline), atol=1e-4)


def test_streaming_banded_matches_offline():
    cfg = _cfg("banded")
    params = init_transformer(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(7)
    src = rng.normal(size=(2, 24, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((2, 24), jnp.uint8)
    offline, _ = encode(params, cfg, jnp.asarray(src), mask)

    stream = StreamingBandedEncoder(params["encoder"], cfg)
    outs = [stream.push(src[:, s : s + 6]) for s in range(0, 24, 6)]
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(offline), atol=1e-4)


def test_receptive_field():
    cfg = small_cfg()  # lda (-2..2), tdnn (-1,0,1) and (-3,0,3)
    assert receptive_field(cfg) == (2 + 1 + 3, 2 + 1 + 3)


def test_am_trains_and_writes_posteriors(tmp_path):
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.io import kaldi_io
    import optax

    cfg = _cfg("tdnnf", src_dim=8)
    n_targets = 6
    params = am.init_am(jax.random.PRNGKey(8), cfg, n_targets)
    rng = np.random.default_rng(9)
    src = rng.normal(size=(4, 16, 8)).astype(np.float32)
    mask = np.ones((4, 16), np.uint8)
    targets = rng.integers(0, n_targets, size=(4, 16)).astype(np.int32)

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss, _, n = am.frame_ce_loss(
                p, cfg, jnp.asarray(src), jnp.asarray(mask),
                jnp.asarray(targets),
            )
            return loss / n

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8

    # posterior ark round trip
    triples = [
        (f"u{i}", src[i], np.array([2, 4, 3], np.int32)) for i in range(4)
    ]
    loader = BatchLoader(triples, batch_size=2, mode="all", shuffle=False)
    out = tmp_path / "post"
    n = am.write_posteriors(
        params, cfg, loader, f"ark,scp:{out}.ark,{out}.scp"
    )
    assert n == 4
    mats = dict(kaldi_io.read_mat_scp(f"{out}.scp"))
    assert mats["u0"].shape == (16, n_targets)
    # rows are log-probabilities
    np.testing.assert_allclose(np.exp(mats["u0"]).sum(-1), 1.0, atol=1e-4)


def test_banded_encoder_inference_path_matches_training_math():
    """The inference route through ops.banded_attention must equal the
    masked multi_head_attention path (same params, dropout off)."""
    from pytorch_kaldi_asr_tpu.models.common import (
        banded_attn_mask,
        padding_attn_mask,
    )
    from pytorch_kaldi_asr_tpu.models.encoders import banded_encode
    from pytorch_kaldi_asr_tpu.models.transformer import (
        _Rngs,
        feed_forward,
        multi_head_attention,
    )
    from pytorch_kaldi_asr_tpu.models.common import (
        dropout,
        position_encoding_table,
    )

    cfg = _cfg("banded", en_dropout=0.0)
    params = init_transformer(jax.random.PRNGKey(31), cfg)
    src, mask = _batch(cfg)

    got, _ = encode(params, cfg, src, mask)

    # masked-path oracle (what training uses)
    p = params["encoder"]
    s = src.shape[1]
    pos = position_encoding_table(cfg.encoder_max_len, cfg.en_d_model)[:s]
    x = src @ p["src_proj"]["w"] + 0.0
    x = x + pos[None]
    start, end = cfg.encoder_sub_sequence
    blocked = padding_attn_mask(mask, mask) | banded_attn_mask(
        s, start, end
    )[None]
    rngs = _Rngs(None)
    for layer in p["layers"]:
        x = multi_head_attention(layer["slf"], x, x, x, blocked, cfg, 0.0,
                                 rngs, False)
        x = feed_forward(layer["ffn"], x, cfg, 0.0, rngs, False)
    x = x + pos[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=2e-5)


@pytest.mark.slow  # numerics-closeness A/B (35 s of compiles); the bf16
# stream's plumbing is covered by the sp/streaming equality tests
def test_conformer_bf16_stream_close_to_f32_stream():
    """conformer_stream_dtype=bfloat16 (the HBM/VPU-saving fast path) must
    track the f32-stream output closely and keep gradients finite."""
    cfg32 = _cfg("conformer")
    cfg16 = cfg32.replace(conformer_stream_dtype=jnp.bfloat16,
                          compute_dtype=jnp.bfloat16)
    params = init_transformer(jax.random.PRNGKey(4), cfg32)
    src, mask = _batch(cfg32)
    out32, _ = encode(params, cfg32, src, mask)
    out16, _ = encode(params, cfg16, src, mask)
    assert out16.dtype == jnp.bfloat16
    scale = float(jnp.abs(out32).max())
    err = float(jnp.abs(out32 - out16.astype(jnp.float32)).max())
    assert err < 0.05 * scale, (err, scale)

    def loss(p):
        out, _ = encode(p, cfg16, src, mask, train=True,
                        rng=jax.random.PRNGKey(0))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert max(float(jnp.abs(g).max()) for g in leaves) > 0


def test_conformer_pallas_attn_matches_blocked(monkeypatch):
    """The PKA_CONF_ATTN=pallas A/B route (flash kernel, interpret mode on
    CPU) must match the default blocked-XLA attention at inference."""
    cfg = _cfg("conformer")
    params = init_transformer(jax.random.PRNGKey(7), cfg)
    src, mask = _batch(cfg)
    base, _ = encode(params, cfg, src, mask)
    monkeypatch.setenv("PKA_CONF_ATTN", "pallas")
    alt, _ = encode(params, cfg, src, mask)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_conformer_grads_finite_with_padded_frames():
    """Regression: the conv module emits exactly-zero rows at padded
    frames (zero-init biases); layer_norm's sqrt backward at var==0 used
    to turn those into NaN gradients poisoning the whole model."""
    from pytorch_kaldi_asr_tpu.models import transformer_forward

    cfg = _cfg("conformer")
    params = init_transformer(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(8)
    src = rng.normal(size=(2, 12, cfg.src_dim)).astype(np.float32)
    mask = np.ones((2, 12), np.uint8)
    mask[0, 5:] = 0  # long padded tail -> all-zero conv rows
    mask[1, 9:] = 0
    tgt = jnp.asarray(np.array([[2, 4, 5, 3], [2, 5, 4, 3]], np.int32))
    tgt_mask = jnp.ones_like(tgt, dtype=jnp.uint8)

    def loss(p):
        logits = transformer_forward(p, cfg, jnp.asarray(src),
                                     jnp.asarray(mask), tgt[:, :-1],
                                     tgt_mask[:, :-1], train=True,
                                     rng=jax.random.PRNGKey(1))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.sum(jnp.take_along_axis(
            logp, tgt[:, 1:][..., None], axis=-1))

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", "")))
                        for p in path)
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad {name}"


def test_streaming_conformer_matches_offline():
    """Chunked StreamingConformer == offline conformer_encode when the
    band and the depthwise conv are causal, including ragged chunk sizes
    and a length-1 chunk."""
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingConformer

    cfg = _cfg("conformer", conformer_causal_conv=True)
    params = init_transformer(jax.random.PRNGKey(10), cfg)
    rng = np.random.default_rng(11)
    src = rng.normal(size=(2, 24, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((2, 24), jnp.uint8)
    offline, _ = encode(params, cfg, jnp.asarray(src), mask)

    stream = StreamingConformer(params["encoder"], cfg)
    outs = []
    for a, b in [(0, 5), (5, 6), (6, 7), (7, 20), (20, 24)]:
        outs.append(stream.push(src[:, a:b]))
    assert stream.flush() is None
    got = np.concatenate(outs, axis=1)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, np.asarray(offline), atol=2e-4)


def test_streaming_conformer_rejects_noncausal():
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingConformer

    params = init_transformer(jax.random.PRNGKey(0),
                              _cfg("conformer", conformer_causal_conv=True))
    with pytest.raises(ValueError, match="causal"):
        StreamingConformer(params["encoder"], _cfg("conformer"))
    with pytest.raises(ValueError, match="band"):
        StreamingConformer(
            params["encoder"],
            _cfg("conformer", conformer_causal_conv=True).replace(
                encoder_sub_sequence=(-8, 2)))


def test_streaming_am_conformer_posteriors_match_offline():
    """StreamingAM(conformer) == offline am_log_posteriors chunk by
    chunk (the serve.py hybrid streaming frontend contract)."""
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingAM

    cfg = _cfg("conformer", conformer_causal_conv=True)
    n_targets = 6
    params = am.init_am(jax.random.PRNGKey(12), cfg, n_targets)
    rng = np.random.default_rng(13)
    src = rng.normal(size=(1, 18, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((1, 18), jnp.uint8)
    offline, _ = am.am_log_posteriors(params, cfg, jnp.asarray(src), mask)

    stream = StreamingAM(params, cfg)
    outs = [stream.push(src[:, s : s + 6]) for s in range(0, 18, 6)]
    assert stream.flush() is None
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(offline), atol=2e-4)


def test_fixed_chunk_stream_matches_offline_and_bounds_compiles():
    """FixedChunkStream over RAGGED client chunks == offline posteriors,
    and the jitted push compiles for exactly ONE chunk shape (the serve.py
    recompile-per-client-chunk-length fix)."""
    from pytorch_kaldi_asr_tpu.models import streaming
    from pytorch_kaldi_asr_tpu.models.streaming import (
        FixedChunkStream,
        StreamingAM,
    )

    cfg = _cfg("conformer", conformer_causal_conv=True)
    n_targets = 6
    params = am.init_am(jax.random.PRNGKey(12), cfg, n_targets)
    rng = np.random.default_rng(14)
    src = rng.normal(size=(1, 23, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((1, 23), jnp.uint8)
    offline, _ = am.am_log_posteriors(params, cfg, jnp.asarray(src), mask)

    del streaming  # the adapter is the unit under test here
    inner = StreamingAM(params, cfg)
    pushed_sizes = []
    real_push = inner.push
    inner.push = lambda c: (pushed_sizes.append(c.shape[1]),
                            real_push(c))[1]
    stream = FixedChunkStream(inner, chunk=8)
    outs = []
    # ragged client pushes: 3, 9, 1, 10 frames (23 total; tail of 7)
    for a, b in [(0, 3), (3, 12), (12, 13), (13, 23)]:
        out = stream.push(src[:, a:b])
        if out is not None:
            outs.append(out)
    tail = stream.flush()
    if tail is not None:
        outs.append(tail)
    got = np.concatenate(outs, axis=1)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, np.asarray(offline), atol=2e-4)
    # the model NEVER sees a ragged shape: one compiled push shape total
    # (the flush tail is padded up to the chunk and sliced back)
    assert pushed_sizes == [8, 8, 8]


def test_position_encoding_rows_match_table():
    from pytorch_kaldi_asr_tpu.models.common import (
        position_encoding_rows,
        position_encoding_table,
    )

    table = np.asarray(position_encoding_table(50, 16))
    idx = np.array([0, 1, 2, 7, 31, 49])
    rows = np.asarray(position_encoding_rows(idx, 16))
    np.testing.assert_array_equal(rows, table[idx])


@pytest.mark.parametrize("enc", ["banded", "conformer"])
def test_streaming_matches_offline_past_max_len(enc):
    """Streams LONGER than encoder_max_len: the streaming encoders must
    extrapolate positions closed-form exactly like the offline encoders
    (encoders.py builds the table to max(encoder_max_len, S)); a clipped
    fixed-size table would silently diverge past the cap."""
    from pytorch_kaldi_asr_tpu.models.streaming import (
        StreamingBandedEncoder,
        StreamingConformer,
    )

    kw = dict(encoder_max_len=16)
    if enc == "conformer":
        kw["conformer_causal_conv"] = True
    cfg = _cfg(enc, **kw)
    params = init_transformer(jax.random.PRNGKey(12), cfg)
    rng = np.random.default_rng(13)
    s = 40  # well past encoder_max_len=16
    src = rng.normal(size=(2, s, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((2, s), jnp.uint8)
    offline, _ = encode(params, cfg, jnp.asarray(src), mask)

    cls = StreamingConformer if enc == "conformer" else StreamingBandedEncoder
    stream = cls(params["encoder"], cfg)
    outs = [stream.push(src[:, a : a + 8]) for a in range(0, s, 8)]
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(offline), atol=3e-4)
