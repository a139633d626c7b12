"""Tests for sequence (context) parallelism (parallel/sequence.py): the
time axis sharded over a mesh with halo exchange for the banded attention
window — numerical equality against the single-device banded encoder on
the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.models import init_transformer
from pytorch_kaldi_asr_tpu.models.encoders import banded_encode
from pytorch_kaldi_asr_tpu.parallel.sequence import (
    make_seq_mesh,
    sp_banded_encode,
)
from tests.test_models import small_cfg


def _setup(band, s=64, b=2, seed=0):
    cfg = small_cfg(encoder_type="banded", encoder_sub_sequence=band,
                    encoder_max_len=s)
    params = init_transformer(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(b, s, cfg.src_dim)).astype(np.float32)
    mask = np.ones((b, s), np.uint8)
    mask[1, s - 10:] = 0  # padded tail crossing the last shard
    return cfg, params["encoder"], jnp.asarray(src), jnp.asarray(mask)


@pytest.mark.parametrize("band", [(-8, 0), (-8, 2), (-5, 5)])
def test_sp_matches_single_device(band):
    cfg, enc_params, src, mask = _setup(band)
    ref, _ = banded_encode(enc_params, cfg, src, mask)
    mesh = make_seq_mesh(8)
    got = sp_banded_encode(enc_params, cfg, src, mask, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_band_wider_than_shard_rejected():
    """The halo pulls only the immediate neighbor, so a band reaching
    further than one shard's length is rejected loudly (use fewer
    shards), never silently truncated."""
    cfg, enc_params, src, mask = _setup((-12, 0))  # S_local=8 < reach 12
    mesh = make_seq_mesh(8)
    with pytest.raises(ValueError, match="band reach"):
        sp_banded_encode(enc_params, cfg, src, mask, mesh)


def test_sp_requires_divisible_length():
    cfg, enc_params, src, mask = _setup((-8, 0), s=60)
    mesh = make_seq_mesh(8)
    with pytest.raises(ValueError):
        sp_banded_encode(enc_params, cfg, src, mask, mesh)


def test_halo_exchange_contents():
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from pytorch_kaldi_asr_tpu.parallel.sequence import halo_exchange

    mesh = make_seq_mesh(8)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 32, 1)

    def f(x):
        left, right = halo_exchange(x, 2, 1, "seq")
        return jnp.concatenate([left, right], axis=1)

    got = shard_map(f, mesh=mesh, in_specs=P(None, "seq", None),
                    out_specs=P(None, "seq", None))(x)
    got = np.asarray(got).reshape(8, 3)
    for i in range(8):
        if i == 0:
            assert (got[0, :2] == 0).all()  # boundary: zero left halo
        else:
            # last 2 frames of shard i-1: values 4i-2, 4i-1
            assert got[i, 0] == 4 * i - 2 and got[i, 1] == 4 * i - 1
        if i == 7:
            assert got[7, 2] == 0  # boundary: zero right halo
        else:
            assert got[i, 2] == 4 * (i + 1)  # first frame of shard i+1


def test_sp_conformer_matches_single_device():
    """Sequence-parallel Conformer inference (attention band halo + conv
    kernel halo) equals the single-device forward."""
    from pytorch_kaldi_asr_tpu.models.encoders import conformer_encode
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_conformer_encode

    cfg = small_cfg(encoder_type="conformer", encoder_sub_sequence=(-8, 0),
                    conformer_kernel=7, encoder_max_len=64)
    params = init_transformer(jax.random.PRNGKey(3), cfg)["encoder"]
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = np.ones((2, 64), np.uint8)
    mask[1, 54:] = 0
    mask = jnp.asarray(mask)
    ref, _ = conformer_encode(params, cfg, src, mask)
    mesh = make_seq_mesh(8)
    got = sp_conformer_encode(params, cfg, src, mask, mesh)
    # valid frames must match; the conv smears pad-frame content inside
    # its kernel reach, so compare only where mask == 1 (downstream
    # consumers mask pads anyway)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=3e-5, rtol=3e-5)


def test_sp_conformer_bf16_stream_matches_single_device():
    """The bf16-stream config (compute + stream bfloat16) must also match
    the single-device forward — sp_banded_attention carries the Conformer
    dtype contract."""
    from pytorch_kaldi_asr_tpu.models.encoders import conformer_encode
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_conformer_encode

    cfg = small_cfg(encoder_type="conformer", encoder_sub_sequence=(-8, 0),
                    conformer_kernel=7, encoder_max_len=64,
                    compute_dtype=jnp.bfloat16,
                    conformer_stream_dtype=jnp.bfloat16)
    params = init_transformer(jax.random.PRNGKey(5), cfg)["encoder"]
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 64), np.uint8))
    ref, _ = conformer_encode(params, cfg, src, mask)
    got = sp_conformer_encode(params, cfg, src, mask, make_seq_mesh(8))
    assert got.dtype == ref.dtype == jnp.bfloat16
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    err = float(jnp.abs(ref.astype(jnp.float32)
                        - got.astype(jnp.float32)).max())
    # bf16 rounding differs slightly between the padded/sharded and the
    # monolithic execution; must stay within a few ulps of the range
    assert err < 0.05 * scale, (err, scale)


def test_sp_gradients_match_single_device():
    """shard_map + ppermute are differentiable: gradients through the
    sequence-parallel forward equal the single-device gradients, so SP
    can train (dropout-free path), not just infer."""
    from pytorch_kaldi_asr_tpu.models.encoders import banded_encode
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_banded_encode

    cfg = small_cfg(encoder_type="banded", encoder_sub_sequence=(-8, 0),
                    encoder_max_len=64)
    params = init_transformer(jax.random.PRNGKey(0), cfg)["encoder"]
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 64), np.uint8))
    mesh = make_seq_mesh(8)

    def loss_sp(p):
        return jnp.sum(sp_banded_encode(p, cfg, src, mask, mesh) ** 2)

    def loss_ref(p):
        return jnp.sum(banded_encode(p, cfg, src, mask)[0] ** 2)

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.grad(loss_ref)(params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_sp)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-5, (path, rel)


def test_per_shard_rng_streams_differ():
    """Every time shard folds its mesh position into the dropout key —
    identical keys would correlate masks across shards."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from pytorch_kaldi_asr_tpu.parallel.sequence import per_shard_rng

    assert per_shard_rng(None, "seq") is None
    mesh = make_seq_mesh(8)
    key = jax.random.PRNGKey(0)

    def f(x):
        k = per_shard_rng(key, "seq")
        return x + jax.random.bits(k, x.shape, dtype=jnp.uint32)

    x = jnp.zeros((1, 8 * 4, 1), jnp.uint32)
    got = np.asarray(shard_map(
        f, mesh=mesh, in_specs=P(None, "seq", None),
        out_specs=P(None, "seq", None))(x)).reshape(8, 4)
    # all shards drew distinct streams
    assert len({tuple(row) for row in got}) == 8


@pytest.mark.parametrize("enc", ["banded", "conformer"])
def test_sp_train_rng_none_matches_inference(enc):
    """train=True with rng=None must be bit-identical to the inference
    forward (the rng-None no-dropout contract, models.common.dropout)."""
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_encode

    kw = dict(conformer_kernel=7) if enc == "conformer" else {}
    cfg = small_cfg(encoder_type=enc, encoder_sub_sequence=(-8, 0),
                    encoder_max_len=64, en_dropout=0.3, **kw)
    params = init_transformer(jax.random.PRNGKey(1), cfg)["encoder"]
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 64), np.uint8))
    mesh = make_seq_mesh(8)
    ref = sp_encode(params, cfg, src, mask, mesh)
    got = sp_encode(params, cfg, src, mask, mesh, train=True, rng=None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("enc", ["banded", "conformer"])
def test_sp_train_dropout_applies_and_reproduces(enc):
    """With a key, SP training dropout perturbs the output (vs inference),
    is deterministic per key, and differs between keys."""
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_encode

    kw = dict(conformer_kernel=7) if enc == "conformer" else {}
    cfg = small_cfg(encoder_type=enc, encoder_sub_sequence=(-8, 0),
                    encoder_max_len=64, en_dropout=0.3, **kw)
    params = init_transformer(jax.random.PRNGKey(2), cfg)["encoder"]
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 64), np.uint8))
    mesh = make_seq_mesh(8)
    infer = np.asarray(sp_encode(params, cfg, src, mask, mesh))
    a = np.asarray(sp_encode(params, cfg, src, mask, mesh, train=True,
                             rng=jax.random.PRNGKey(7)))
    a2 = np.asarray(sp_encode(params, cfg, src, mask, mesh, train=True,
                              rng=jax.random.PRNGKey(7)))
    b = np.asarray(sp_encode(params, cfg, src, mask, mesh, train=True,
                             rng=jax.random.PRNGKey(8)))
    assert np.isfinite(a).all()
    assert not np.array_equal(a, infer)   # dropout actually applied
    np.testing.assert_array_equal(a, a2)  # per-key deterministic
    assert not np.array_equal(a, b)       # key-dependent


def test_sp_train_gradients_finite_with_dropout():
    """SP + dropout is differentiable end to end: gradients are finite and
    nonzero, and at rate 0 they equal the dropout-free gradients."""
    from pytorch_kaldi_asr_tpu.parallel.sequence import sp_banded_encode

    cfg = small_cfg(encoder_type="banded", encoder_sub_sequence=(-8, 0),
                    encoder_max_len=64, en_dropout=0.3)
    params = init_transformer(jax.random.PRNGKey(4), cfg)["encoder"]
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.normal(size=(2, 64, cfg.src_dim)
                                 ).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 64), np.uint8))
    mesh = make_seq_mesh(8)

    def loss(p):
        out = sp_banded_encode(p, cfg, src, mask, mesh, train=True,
                               rng=jax.random.PRNGKey(9))
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
