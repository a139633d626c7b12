"""Multi-device tests on the 8-way virtual CPU mesh: sharded training must
match single-device training numerically, and the launcher/mesh helpers must
hold their contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
from pytorch_kaldi_asr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_batch_arrays,
    shard_params,
)
from pytorch_kaldi_asr_tpu.train import create_train_state, make_train_step
from tests.test_models import small_cfg


def _data(cfg, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(batch, 10, cfg.src_dim)).astype(np.float32)
    src_mask = np.ones((batch, 10), np.uint8)
    tgt = np.tile(np.array([2, 4, 5, 6, 3, 0], np.int32), (batch, 1))
    tgt_mask = (tgt != 0).astype(np.uint8)
    return src, src_mask, tgt, tgt_mask


def test_mesh_construction():
    mesh = make_mesh(model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_sharding_rules_cover_attention_and_ffn():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(model=2)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: param_sharding_rules(p, l), params
    )
    layer = specs["decoder"]["layers"][0]
    assert layer["slf"]["w_qs"] == jax.sharding.PartitionSpec("model", None,
                                                              None)
    assert layer["ffn"]["w1"]["w"] == jax.sharding.PartitionSpec(None,
                                                                 "model")
    assert specs["encoder"]["lda"]["w"] == jax.sharding.PartitionSpec()


def test_sharded_training_matches_single_device():
    """Same global batch, same init → same loss trajectory on a dp×tp mesh
    as on one device."""
    cfg = small_cfg(en_dropout=0.0, de_dropout=0.0)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    data = _data(cfg)

    # single device
    state1, tx1 = create_train_state(params)
    step1 = make_train_step(cfg, tx1, donate=False)
    losses1 = []
    s = state1
    for _ in range(3):
        s, m = step1(s, *data)
        losses1.append(float(m["loss"]))

    # 4x2 mesh
    mesh = make_mesh(model=2)
    sharded = shard_params(params, mesh)
    state2, tx2 = create_train_state(sharded)
    step2 = make_train_step(cfg, tx2, donate=False, mesh=mesh)
    arrays = shard_batch_arrays(mesh, *data)
    losses2 = []
    s2 = state2
    with mesh:
        for _ in range(3):
            s2, m2 = step2(s2, *arrays)
            losses2.append(float(m2["loss"]))

    np.testing.assert_allclose(losses1, losses2, rtol=2e-4)
    # final params agree
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        s.params, jax.device_get(s2.params),
    )


def test_batch_sharding_spreads_rows():
    mesh = make_mesh(model=1)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    (placed,) = shard_batch_arrays(mesh, x)
    assert placed.sharding == batch_sharding(mesh)
    assert len(placed.addressable_shards) == 8


def test_prefetch_to_device_preserves_batches():
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader, \
        prefetch_to_device

    rng = np.random.default_rng(1)
    triples = [
        (f"u{i}", rng.normal(size=(6, 4)).astype(np.float32),
         np.array([2, 5, 3]))
        for i in range(6)
    ]
    loader = BatchLoader(triples, batch_size=2, mode="all", shuffle=False)
    direct = list(loader)
    loader2 = BatchLoader(triples, batch_size=2, mode="all", shuffle=False)
    prefetched = list(prefetch_to_device(loader2, size=2))
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        assert a.keys == b.keys
        np.testing.assert_array_equal(a.src, np.asarray(b.src))


def test_fast_beam_on_data_parallel_mesh():
    """Beam search over a batch sharded across the mesh must match the
    unsharded result (GSPMD handles the decode scan)."""
    from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search

    cfg = small_cfg(decoder_sub_sequence=(-3, 0))
    params = init_transformer(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    src = rng.normal(size=(8, 10, cfg.src_dim)).astype(np.float32)
    src_mask = np.ones((8, 10), np.uint8)

    plain = fast_beam_search(params, cfg, jnp.asarray(src),
                             jnp.asarray(src_mask), beam_size=3, max_len=8)

    mesh = make_mesh(model=1)
    src_s, mask_s = shard_batch_arrays(mesh, src, src_mask)
    with mesh:
        sharded = fast_beam_search(params, cfg, src_s, mask_s, beam_size=3,
                                   max_len=8)
    np.testing.assert_array_equal(np.asarray(plain.tokens),
                                  np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(plain.scores),
                               np.asarray(sharded.scores), atol=1e-4)
